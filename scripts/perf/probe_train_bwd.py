"""Training-step backward breakdown: where do the ~scatter-bound ms go?

Times on the real TPU: full train-step fwd vs fwd+bwd, encode-only
fwd+bwd, and scatter-add microbenches (XLA native vs sort+segment_sum,
ray-coherent vs random indices, current default L8F4 shapes).
"""
from __future__ import annotations

import json
import time

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/dregnerf_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from dregnerf_tpu.models import ngp
from dregnerf_tpu.ops.packed_grid import PackedGridConfig, pack_table, packed_encode

N = 1 << 18


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(json.dumps({"stage": name, "ms": round(dt * 1e3, 2)}), flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    cfg = ngp.NGPConfig()  # L8F4 default
    params = ngp.init_ngp(key, cfg)
    aabb = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])
    pos = jax.random.uniform(key, (N, 3), minval=-1.2, maxval=1.2)
    dirs = jax.random.normal(jax.random.PRNGKey(1), (N, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    # field fwd vs fwd+bwd (gradients to the table — the training shape)
    @jax.jit
    def fwd(params, pos, dirs):
        rgb, sig = ngp.forward(params, pos, dirs, aabb, cfg)
        return rgb.sum() + sig.sum()

    @jax.jit
    def fwdbwd(params, pos, dirs):
        def loss(p):
            rgb, sig = ngp.forward(p, pos, dirs, aabb, cfg)
            return rgb.sum() + sig.sum()

        l, g = jax.value_and_grad(loss)(params)
        return l, g["table"].sum()

    timeit("field_fwd", fwd, params, pos, dirs)
    timeit("field_fwdbwd", fwdbwd, params, pos, dirs)

    # encode-only fwd+bwd
    u = jax.random.uniform(jax.random.PRNGKey(2), (N, 3))

    @jax.jit
    def enc_fwdbwd(table, u):
        def loss(t):
            p = pack_table(t, cfg.grid)
            return packed_encode(p, u, cfg.grid).sum()

        l, g = jax.value_and_grad(loss)(table)
        return l, g.sum()

    timeit("encode_fwdbwd", enc_fwdbwd, params["table"], u)

    # scatter-add microbench: one wrapped level's backward shape
    T = 1 << 19
    F8 = 8 * cfg.grid.n_features  # packed row width
    g_rows = jax.random.normal(jax.random.PRNGKey(3), (N, F8))
    idx_rand = jax.random.randint(jax.random.PRNGKey(4), (N,), 0, T)
    # ray-coherent: sorted-ish blocks of nearby slots (marching order)
    base = jnp.repeat(jax.random.randint(jax.random.PRNGKey(5), (N // 64,), 0, T - 64), 64)
    idx_coh = jnp.clip(base + jnp.tile(jnp.arange(64), N // 64), 0, T - 1)

    @jax.jit
    def scat(idx, g_rows):
        out = jnp.zeros((T, F8), jnp.float32)
        return out.at[idx].add(g_rows).sum()

    timeit("scatter_random_1lvl", scat, idx_rand, g_rows)
    timeit("scatter_coherent_1lvl", scat, idx_coh, g_rows)

    @jax.jit
    def scat_sorted(idx, g_rows):
        order = jnp.argsort(idx)
        out = jax.ops.segment_sum(g_rows[order], idx[order], num_segments=T)
        return out.sum()

    timeit("sortsegsum_random_1lvl", scat_sorted, idx_rand, g_rows)

    # bf16 rows variant (accumulate f32? XLA scatter dtype = operand dtype)
    @jax.jit
    def scat_bf16(idx, g_rows):
        out = jnp.zeros((T, F8), jnp.bfloat16)
        return out.at[idx].add(g_rows.astype(jnp.bfloat16)).sum()

    timeit("scatter_random_bf16", scat_bf16, idx_rand, g_rows)


if __name__ == "__main__":
    main()
