"""Validate bench.py's number against chained iterations.

The axon path can short-circuit repeated jitted calls with IDENTICAL args
(see CLAUDE.md). bench.py repeats the same render 10x — confirm the
measured 22.9 ms/batch is real by chaining each iteration's ray origins
through the previous output (no two calls share args).
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
from dregnerf_tpu.render.renderer import RenderConfig, render_rays


def main():
    cfg = ngp.NGPConfig()
    key = jax.random.PRNGKey(0)
    params = ngp.init_ngp(key, cfg)
    aabb = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])
    binary = jax.random.uniform(jax.random.PRNGKey(1), (128, 128, 128)) < 0.25
    grid = occupancy.init_grid(128)._replace(binary=binary)
    rcfg = RenderConfig(
        render_step_size=float(3.0 * 3**0.5 / 1024),
        buffer_size=1 << 18, max_steps=1024, march_compaction="rows",
    )
    num_rays = 4096
    k1, _ = jax.random.split(key)
    origins0 = jax.random.uniform(k1, (num_rays, 3), minval=-3.0, maxval=-2.0)
    params = jax.jit(lambda p: ngp.prepare_params(p, cfg))(params)
    regions = jax.jit(occupancy.pack_regions)(binary)

    @jax.jit
    def render_chained(params, origins, regions):
        viewdirs = -origins / jnp.linalg.norm(origins, axis=-1, keepdims=True)
        out, aux = render_rays(
            params, cfg, grid, origins, viewdirs, aabb, rcfg,
            background=jnp.ones(3), regions=regions,
        )
        # next origins depend on this frame's rgb — no call shares args
        nxt = jnp.clip(origins + 1e-4 * (out.rgb - 0.5), -3.0, -2.0)
        return nxt, aux["n_samples"]

    o, n = render_chained(params, origins0, regions)
    jax.block_until_ready(o)
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        o, n = render_chained(params, o, regions)
    jax.block_until_ready(o)
    dt = (time.time() - t0) / iters
    print(json.dumps({
        "stage": "render_rows_chained",
        "ms": round(dt * 1e3, 2),
        "n_samples": int(n),
        "Msamples_per_s": round(int(n) / dt / 1e6, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
