"""Probe: capped vs compact march for the t_max surface passes + big-batch
rows render.

The extraction/visibility surface passes (camera->point rays with per-ray
t_max) currently use 'compact'. 'capped' keeps every ray's full list up to
256 survivors (the same set for these short rays) without the global
candidate searchsorted — measure the win. Also: rows render at 8192 rays /
2^19 buffer (amortization check vs the 4096-ray bench).
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
from dregnerf_tpu.ops.ray_march import march_rays
from dregnerf_tpu.render.renderer import RenderConfig, render_rays


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
    aabb = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])
    binary = jax.random.uniform(jax.random.PRNGKey(1), (128, 128, 128)) < 0.25
    grid = occupancy.init_grid(128)._replace(binary=binary)
    regions = jax.block_until_ready(jax.jit(occupancy.pack_regions)(binary))
    step = float(3.0 * 3**0.5 / 1024)

    # surface-pass shape: 8192 camera->point rays, per-ray t_max, 512 steps
    R, S, B = 8192, 512, 1 << 17
    pts = jax.random.uniform(key, (R, 3), minval=-1.2, maxval=1.2)
    origin = jnp.array([0.0, 0.0, 3.0])
    d = pts - origin[None]
    t_max = jnp.linalg.norm(d, axis=-1)
    dirs = d / t_max[:, None]
    origins = jnp.tile(origin[None], (R, 1))

    for mode in ("compact", "capped"):
        @jax.jit
        def m(o, dd, tm, regions, mode=mode):
            p = march_rays(o, dd, grid, aabb, "aabb", step, B, S,
                           t_max=tm, compaction=mode, regions=regions)
            return p.t_start.sum(), p.ray_id.sum(), p.num_samples

        dt = timeit(f"surface_march_{mode}", m, origins, dirs, t_max, regions)
        _, _, n = m(origins, dirs, t_max, regions)
        print(json.dumps({"mode": mode, "n_samples": int(n)}), flush=True)

    # big-batch rows render: 8192 rays x K=64 (2^19 buffer)
    cfg = ngp.NGPConfig()
    params = ngp.init_ngp(key, cfg)
    params = jax.jit(lambda p: ngp.prepare_params(p, cfg))(params)
    k1, _ = jax.random.split(key)
    o8 = jax.random.uniform(k1, (8192, 3), minval=-3.0, maxval=-2.0)
    d8 = -o8 / jnp.linalg.norm(o8, axis=-1, keepdims=True)
    rcfg = RenderConfig(render_step_size=step, buffer_size=1 << 19,
                        max_steps=1024, march_compaction="rows")

    @jax.jit
    def render8(params, o, d, regions):
        out, aux = render_rays(params, cfg, grid, o, d, aabb, rcfg,
                               background=jnp.ones(3), regions=regions)
        return out.rgb, aux["n_samples"]

    dt = timeit("render_rows_8192x64", render8, params, o8, d8, regions)
    _, n = render8(params, o8, d8, regions)
    print(json.dumps({"rows8192_n_samples": int(n),
                      "Msamples_per_s": round(int(n) / dt / 1e6, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
