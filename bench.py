"""Benchmark: NGP rendering throughput (rays/s and samples/s) on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline context (BASELINE.md): the reference publishes no numbers; the
north star is rays/sec/chip on NGP rendering vs an A100 tcnn/nerfacc stack
(~1e9 samples/s class). vs_baseline here is measured samples/s divided by
a 1e8 samples/s reference-class floor for a single mid-range GPU; it will
be recalibrated as real reference numbers are recorded.
"""
from __future__ import annotations

import json
import time

# A100-class nerfacc+tcnn render throughput floor used for vs_baseline.
BASELINE_SAMPLES_PER_S = 1e8


def main() -> None:
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/dregnerf_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from dregnerf_tpu.models import ngp
    from dregnerf_tpu.ops import occupancy
    from dregnerf_tpu.render.renderer import RenderConfig, render_rays

    cfg = ngp.NGPConfig()  # full instant-ngp sizing, bf16 compute
    key = jax.random.PRNGKey(0)
    params = ngp.init_ngp(key, cfg)
    aabb = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])
    # half-occupied grid: realistic skip pattern
    binary = (
        jax.random.uniform(jax.random.PRNGKey(1), (128, 128, 128)) < 0.25
    )
    grid = occupancy.init_grid(128)._replace(binary=binary)
    rcfg = RenderConfig(
        render_step_size=float(3.0 * 3**0.5 / 1024),
        buffer_size=1 << 18,
        max_steps=1024,
        # row-packed marching: top_k selection + arithmetic sample
        # positions + row compositor (see ops/ray_march.py RowSamples and
        # scripts/perf/probe_march_parts.py for the measurements)
        march_compaction="rows",
    )

    num_rays = 4096
    k1, k2 = jax.random.split(key)
    origins = jax.random.uniform(k1, (num_rays, 3), minval=-3.0, maxval=-2.0)

    # steady-state rendering reuses the packed grid tables and the packed
    # occupancy regions (training re-packs per grid update — every 16 steps)
    params = jax.jit(lambda p: ngp.prepare_params(p, cfg))(params)
    regions = jax.jit(occupancy.pack_regions)(grid.binary)

    @jax.jit
    def render(params, origins, regions):
        viewdirs = -origins / jnp.linalg.norm(origins, axis=-1, keepdims=True)
        out, aux = render_rays(
            params, cfg, grid, origins, viewdirs, aabb, rcfg,
            background=jnp.ones(3), regions=regions,
        )
        # chain: next origins depend on this frame's rgb, so no two timed
        # calls share arguments (guards against remote-execution result
        # caching — CLAUDE.md measured-facts; chained == unchained within
        # 1% when honest: 23.06 vs 22.92 ms, probe_bench_chained.py)
        nxt = jnp.clip(origins + 1e-4 * (out.rgb - 0.5), -3.0, -2.0)
        return nxt, out.rgb, aux["n_samples"]

    origins, rgb, n = render(params, origins, regions)
    jax.block_until_ready(rgb)
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        origins, rgb, n = render(params, origins, regions)
    jax.block_until_ready(rgb)
    dt = (time.time() - t0) / iters

    n_samples = int(n)
    samples_per_s = n_samples / dt
    print(
        json.dumps(
            {
                "metric": "ngp_render_samples_per_s",
                "value": round(samples_per_s),
                "unit": "samples/s",
                "vs_baseline": round(samples_per_s / BASELINE_SAMPLES_PER_S, 4),
                "detail": {
                    "rays_per_s": round(num_rays / dt),
                    "ms_per_batch": round(dt * 1e3, 2),
                    "n_samples_per_batch": n_samples,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
