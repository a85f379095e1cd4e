"""Render-step decomposition at BENCH shapes (round-3, VERDICT r2 #4).

Question: is the residual render gap (11.5 M samples/s vs the ~2x
independent-gather aggregate ceiling) recoverable, or is it irreducible
marcher latency?

Times, with CHAINED inputs (the axon tunnel result-caches identical-arg
calls — CLAUDE.md):

  full    render_rays at the bench config (rows marcher, 4096 rays,
          2^18 buffer -> K=64, 1024 steps, L8F4)
  march   march_rays_rows alone (occupancy REGION gathers + top_k)
  shade   field.forward + composite_rows alone on pre-marched rows
          (hash-table LEVEL gathers + MXU MLPs)

If march + shade ~= full, there is no fusion/overlap headroom left at the
XLA level (consistent with probe_render_pipelined.py: scan-level software
pipelining does not overlap the stages), and the gap to the
independent-gather ceiling is the marcher's own serial latency.

Run on the TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/perf/probe_render_parts.py
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

from dregnerf_tpu.models import ngp
from dregnerf_tpu.ops import occupancy
from dregnerf_tpu.ops.composite import composite_rows
from dregnerf_tpu.ops.packed_grid import PackedGridConfig
from dregnerf_tpu.ops.ray_march import march_rays_rows, row_sample_positions
from dregnerf_tpu.render.renderer import RenderConfig, render_rays

import os

NUM_RAYS = int(os.environ.get("PROBE_RAYS", 4096))
BUF = int(os.environ.get("PROBE_BUF", 1 << 18))
MAX_STEPS = int(os.environ.get("PROBE_STEPS", 1024))
STEP = float(3.0 * 3**0.5 / MAX_STEPS)
AABB = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])
ITERS = int(os.environ.get("PROBE_ITERS", 10))


def timeit(name, fn, carry, extra=None):
    carry = fn(carry)
    jax.block_until_ready(carry)
    t0 = time.time()
    for _ in range(ITERS):
        carry = fn(carry)
    jax.block_until_ready(carry)
    dt = (time.time() - t0) / ITERS
    rec = {"stage": name, "ms": round(dt * 1e3, 2)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    return dt


def main():
    for layout, (L, F, scale) in {
        "L8F4": (8, 4, 2.1),
        "L4F8": (4, 8, 5.66),
    }.items():
        cfg = ngp.NGPConfig(grid=PackedGridConfig(
            n_levels=L, n_features=F, per_level_scale=scale))
        params = ngp.init_ngp(jax.random.PRNGKey(0), cfg)
        params = jax.jit(lambda p: ngp.prepare_params(p, cfg))(params)
        binary = jax.random.uniform(
            jax.random.PRNGKey(1), (128, 128, 128)) < 0.25
        grid = occupancy.init_grid(128)._replace(binary=binary)
        regions = jax.jit(occupancy.pack_regions)(grid.binary)
        rcfg = RenderConfig(render_step_size=STEP, buffer_size=BUF,
                            max_steps=MAX_STEPS, march_compaction="rows")
        k_per_ray = min(max(BUF // NUM_RAYS, 1), MAX_STEPS)

        o0 = jax.random.uniform(
            jax.random.PRNGKey(2), (NUM_RAYS, 3), minval=-3.0, maxval=-2.0)

        # --- full render (bench methodology) ---
        # params/regions as jit ARGUMENTS: closed-over 2^19-entry tables
        # inline into the HLO and 413 the remote compiler (CLAUDE.md).
        @jax.jit
        def full(params, o, regions):
            d = -o / jnp.linalg.norm(o, axis=-1, keepdims=True)
            out, aux = render_rays(params, cfg, grid, o, d, AABB, rcfg,
                                   background=jnp.ones(3), regions=regions)
            nxt = jnp.clip(o + 1e-4 * (out.rgb - 0.5), -3.0, -2.0)
            return nxt, aux["n_samples"]

        carry, n = full(params, o0, regions)
        n_samples = int(n)
        dt_full = timeit(f"{layout}/full",
                         lambda c: full(params, c, regions)[0], o0,
                         {"n_samples": n_samples})

        # --- march only ---
        @jax.jit
        def march(o):
            d = -o / jnp.linalg.norm(o, axis=-1, keepdims=True)
            rows = march_rays_rows(
                o, d, grid, AABB, rcfg.contraction, STEP, k_per_ray,
                MAX_STEPS, regions=regions)
            # chain: t_start means feed the next origins (1e-4 scale is
            # far above the f32 ulp at |o|~2.5 — sub-ulp perturbations
            # silently restore result-caching, CLAUDE.md)
            mean_t = jnp.mean(rows.t_start * rows.valid, axis=1)
            nxt = jnp.clip(o + 1e-4 * (mean_t[:, None] - 2.0), -3.0, -2.0)
            return nxt

        dt_march = timeit(f"{layout}/march", march, o0)

        # --- shade only (field + composite on pre-marched rows) ---
        d0 = -o0 / jnp.linalg.norm(o0, axis=-1, keepdims=True)
        rows0 = jax.jit(
            lambda o, d: march_rays_rows(
                o, d, grid, AABB, rcfg.contraction, STEP, k_per_ray,
                MAX_STEPS, regions=regions)
        )(o0, d0)
        jax.block_until_ready(rows0)

        @jax.jit
        def shade(params, o, rows):
            d = -o / jnp.linalg.norm(o, axis=-1, keepdims=True)
            pos, dirs = row_sample_positions(rows, o, d)
            rgbs, sigmas = ngp.forward(params, pos, dirs, AABB, cfg)
            sigmas = jnp.where(rows.valid, sigmas.reshape(rows.valid.shape),
                               0.0)
            out = composite_rows(rows, rgbs, sigmas,
                                 background=jnp.ones(3))
            nxt = jnp.clip(o + 1e-4 * (out.rgb - 0.5), -3.0, -2.0)
            return nxt

        dt_shade = timeit(f"{layout}/shade",
                          lambda o: shade(params, o, rows0), o0)

        print(json.dumps({
            "stage": f"{layout}/summary",
            "full_ms": round(dt_full * 1e3, 2),
            "march_ms": round(dt_march * 1e3, 2),
            "shade_ms": round(dt_shade * 1e3, 2),
            "march_plus_shade_ms": round((dt_march + dt_shade) * 1e3, 2),
            "overlap_headroom_ms": round(
                (dt_march + dt_shade - dt_full) * 1e3, 2),
            "n_samples": n_samples,
            "full_samples_per_s": round(n_samples / dt_full),
        }), flush=True)


if __name__ == "__main__":
    main()
