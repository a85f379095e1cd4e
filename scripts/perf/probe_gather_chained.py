"""Gather timings with CHAINED iterations (output feeds the next input).

probe_gather_fusion's same-args repeat loop produced impossible numbers
(24 us for a 33MB gather — beyond HBM bandwidth), confirming CLAUDE.md's
warning: identical repeated executions get short-circuited somewhere in
the remote-execution path. Chain every iteration through a data dependency
instead and re-measure gather vs gather+consumer vs full encode.
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
F = 4

ITERS = 20


def chain_time(name, step, init):
    """step: carry -> carry with the measured op inside; chained."""
    jitted = jax.jit(step)
    carry = jitted(init)
    jax.block_until_ready(carry)
    t0 = time.time()
    for _ in range(ITERS):
        carry = jitted(carry)
    jax.block_until_ready(carry)
    dt = (time.time() - t0) / ITERS
    print(json.dumps({"stage": name, "ms": round(dt * 1e3, 3),
                      "Mrows_per_s": round(N / dt / 1e6, 1)}), flush=True)
    return dt


def main():
    table = jax.random.normal(jax.random.PRNGKey(0), (T, 8 * F), jnp.float32)
    idx0 = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T)
    w = jax.random.uniform(jax.random.PRNGKey(2), (N, 8))

    # chained gather: next indices derived from gathered values
    def g_only(carry):
        idx = carry
        rows = table[idx]
        nxt = (idx + rows[:, 0].astype(jnp.int32) % 7 + 1) % T
        return nxt

    chain_time("gather_only_chained", g_only, idx0)

    def g_einsum(carry):
        idx = carry
        rows = table[idx].reshape(N, 8, F)
        out = jnp.einsum("nc,ncf->nf", w, rows)
        nxt = (idx + out[:, 0].astype(jnp.int32) % 7 + 1) % T
        return nxt

    chain_time("gather_einsum_chained", g_einsum, idx0)

    # full encode chained: positions perturbed by the previous output
    from dregnerf_tpu.models import ngp
    from dregnerf_tpu.ops.packed_grid import packed_encode

    cfg = ngp.NGPConfig()
    params = ngp.init_ngp(jax.random.PRNGKey(4), cfg)
    packed = jax.jit(lambda p: ngp.prepare_params(p, cfg))(params)["packed_table"]
    u0 = jax.random.uniform(jax.random.PRNGKey(5), (N, 3))

    def enc_step(carry):
        u = carry
        out = packed_encode(packed, u, cfg.grid)  # [N, 32]
        nxt = jnp.mod(u + 0.01 + 1e-6 * out[:, :3], 1.0)
        return nxt

    chain_time("packed_encode_chained", enc_step, u0)


if __name__ == "__main__":
    main()
