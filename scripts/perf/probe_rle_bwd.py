"""Probe: RLE-compressed table-gradient backward vs plain scatter at the
REAL trainer shapes (2^18-sample budget, L8F4 2^19 tables).

Measures the FUSED encode fwd+bwd across all 8 levels for plain/rle x
f32/bf16, chained iterations (axon result-cache workaround, CLAUDE.md).
Fused, not isolated per-level: microbench wins have flipped fused before
(bf16 won isolated, lost fused in compact mode), so the fused number
decides.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python scripts/perf/probe_rle_bwd.py
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

from dregnerf_tpu.ops import packed_grid as PG

N = 1 << 18
N_RAYS = 16384
STEP_U = (3.0 * np.sqrt(3.0) / 1024) / 3.0  # trainer default, extent 3


def ray_positions(key) -> jnp.ndarray:
    """Ray-coherent [N, 3] positions in [0,1]^3 (N_RAYS rays, N/N_RAYS
    consecutive steps each) mimicking capped-march output order."""
    k1, k2 = jax.random.split(key)
    o = jax.random.uniform(k1, (N_RAYS, 1, 3), minval=0.2, maxval=0.8)
    d = jax.random.normal(k2, (N_RAYS, 1, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = (jnp.arange(N // N_RAYS, dtype=jnp.float32) * STEP_U)[None, :, None]
    return jnp.clip((o + d * t), 0.0, 1.0).reshape(-1, 3)


def main():
    key = jax.random.PRNGKey(0)
    x0 = ray_positions(key)

    configs = {
        "plain_f32": PG.PackedGridConfig(grad_accum="f32"),
        "plain_bf16": PG.PackedGridConfig(grad_accum="bf16"),
        "rle_f32": PG.PackedGridConfig(grad_accum="f32", rle_step_u=STEP_U),
        "rle_bf16": PG.PackedGridConfig(grad_accum="bf16", rle_step_u=STEP_U),
    }
    table = PG.init_packed_grid(key, configs["plain_f32"])

    for name, cfg in configs.items():
        if cfg.rle_step_u > 0:
            runs = [round(PG.rle_expected_run(cfg, l), 1)
                    for l in range(cfg.n_levels)]
            print(f"# {name}: expected runs/level {runs}", flush=True)

        @jax.jit
        def full(tbl, x, cfg=cfg):
            def loss(tb):
                packed = PG.pack_table(tb, cfg)
                out = PG.packed_encode(packed, x, cfg)
                return jnp.sum(out * jnp.sin(out)), out

            (l, out), g = jax.value_and_grad(loss, has_aux=True)(tbl)
            # chain: next x depends on this output. The perturbation must
            # SURVIVE f32 rounding or every timed call reuses identical
            # args and the axon tunnel serves result-cache numbers (the
            # first version used 1e-7*out ~ 1e-8 absolute, below the f32
            # ulp at x~0.5 — measured a bogus 3.5e9 samples/s).
            nx = jnp.clip(x + 1e-3 * jnp.sin(out[:, :3]), 0.0, 1.0)
            return nx, l, g

        x = x0
        nx, l, g = full(table, x)
        jax.block_until_ready(g)
        iters = 8
        t0 = time.time()
        for _ in range(iters):
            x, l, g = full(table, x)
        jax.block_until_ready(g)
        dt = (time.time() - t0) / iters
        print(json.dumps({
            "probe": "fused_encode_fwd_bwd", "config": name,
            "ms": round(dt * 1e3, 2),
            "samples_per_s": round(N / dt),
        }), flush=True)


if __name__ == "__main__":
    main()
