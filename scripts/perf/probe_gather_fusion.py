"""Why are encode gathers 30x slower than a standalone XLA gather?

probe_pallas_gather measured table[idx] alone at ~0.07 ms for [2^18] rows
of 32 f32 from [2^19, 32] — yet the same gathers inside packed_encode cost
~2 ms each. Hypothesis: fusing the gather into its consumer (einsum/sum)
kills the fast gather path. Measure gather+consumer with and without
jax.lax.optimization_barrier between them, and the full packed_encode
with barriers inserted.
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

T = 1 << 19
N = 1 << 18
F = 4  # features; packed row = 8*F = 32


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(json.dumps({"stage": name, "ms": round(dt * 1e3, 3)}), flush=True)
    return dt


def main():
    table = jax.random.normal(jax.random.PRNGKey(0), (T, 8 * F), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T)
    w = jax.random.uniform(jax.random.PRNGKey(2), (N, 8))

    @jax.jit
    def gather_only(table, idx):
        return table[idx]

    timeit("gather_only", gather_only, table, idx)

    @jax.jit
    def gather_einsum_fused(table, idx, w):
        rows = table[idx].reshape(N, 8, F)
        return jnp.einsum("nc,ncf->nf", w, rows)

    timeit("gather_einsum_fused", gather_einsum_fused, table, idx, w)

    @jax.jit
    def gather_einsum_barrier(table, idx, w):
        rows = jax.lax.optimization_barrier(table[idx])
        rows = rows.reshape(N, 8, F)
        return jnp.einsum("nc,ncf->nf", w, rows)

    timeit("gather_einsum_barrier", gather_einsum_barrier, table, idx, w)

    @jax.jit
    def gather_sum_fused(table, idx):
        return table[idx].sum()

    timeit("gather_sum_fused", gather_sum_fused, table, idx)

    @jax.jit
    def gather_sum_barrier(table, idx):
        return jax.lax.optimization_barrier(table[idx]).sum()

    timeit("gather_sum_barrier", gather_sum_barrier, table, idx)

    # index computation feeding the gather (the encode's slot math)
    cell = jax.random.randint(jax.random.PRNGKey(3), (N, 3), 0, 1024)

    @jax.jit
    def slotmath_gather_barrier(table, cell, w):
        lin = (
            cell[:, 0].astype(jnp.uint32) * jnp.uint32(1024 * 1024)
            + cell[:, 1].astype(jnp.uint32) * jnp.uint32(1024)
            + cell[:, 2].astype(jnp.uint32)
        )
        slot = (lin & jnp.uint32(T - 1)).astype(jnp.int32)
        rows = jax.lax.optimization_barrier(table[slot])
        return jnp.einsum("nc,ncf->nf", w, rows.reshape(N, 8, F))

    timeit("slotmath_gather_barrier", slotmath_gather_barrier, table, cell, w)

    # full encode with/without barrier
    from dregnerf_tpu.models import ngp
    from dregnerf_tpu.ops.packed_grid import packed_encode

    cfg = ngp.NGPConfig()
    params = ngp.init_ngp(jax.random.PRNGKey(4), cfg)
    params = jax.jit(lambda p: ngp.prepare_params(p, cfg))(params)
    u = jax.random.uniform(jax.random.PRNGKey(5), (N, 3))

    @jax.jit
    def enc(tabs, u):
        return packed_encode(tabs, u, cfg.grid).sum()

    timeit("packed_encode_current", enc, params["packed_table"], u)


if __name__ == "__main__":
    main()
