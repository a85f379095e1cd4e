"""Perf probe 3: encoder level-count vs feature-width tradeoff + rows march.

TPU gather cost is per ROW (width <= 128 f32 free — CLAUDE.md measured
facts), so L levels x F feats at constant capacity L*F should encode ~2x
faster at L=8/F=4 than L=16/F=2. Verify, including the full packed_encode
and the full rows render.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/dregnerf_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from dregnerf_tpu.models import ngp
from dregnerf_tpu.ops import occupancy
from dregnerf_tpu.ops.packed_grid import PackedGridConfig, packed_encode
from dregnerf_tpu.ops.ray_march import march_rays_rows
from dregnerf_tpu.render.renderer import RenderConfig, render_rays

BUF = 1 << 18


def timeit(name, fn, *args, iters=10):
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
    key = jax.random.PRNGKey(0)
    aabb = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])
    binary = jax.random.uniform(jax.random.PRNGKey(1), (128, 128, 128)) < 0.25
    grid = occupancy.init_grid(128)._replace(binary=binary)
    regions = jax.block_until_ready(jax.jit(occupancy.pack_regions)(binary))
    step = float(3.0 * 3**0.5 / 1024)
    k1, _ = jax.random.split(key)
    origins = jax.random.uniform(k1, (4096, 3), minval=-3.0, maxval=-2.0)
    viewdirs = -origins / jnp.linalg.norm(origins, axis=-1, keepdims=True)

    # rows march alone (with hoisted regions)
    @jax.jit
    def rows_march(o, d, regions):
        r = march_rays_rows(o, d, grid, aabb, "aabb", step, 64, 1024,
                            regions=regions)
        return r.t_start.sum(), r.valid.sum(), r.num_samples

    timeit("rows_march", rows_march, origins, viewdirs, regions)

    # encoder variants at constant capacity L*F = 32
    u = jax.random.uniform(jax.random.PRNGKey(4), (BUF, 3))
    variants = [
        ("L16_F2", PackedGridConfig(n_levels=16, n_features=2,
                                    per_level_scale=1.4472692012786865)),
        ("L8_F4", PackedGridConfig(n_levels=8, n_features=4,
                                   per_level_scale=2.1)),
        ("L6_F6", PackedGridConfig(n_levels=6, n_features=6,
                                   per_level_scale=2.83)),
        ("L4_F8", PackedGridConfig(n_levels=4, n_features=8,
                                   per_level_scale=5.66)),
    ]
    for name, gcfg in variants:
        cfg = ngp.NGPConfig(grid=gcfg)
        params = ngp.init_ngp(jax.random.PRNGKey(2), cfg)
        params = jax.jit(lambda p, c=cfg: ngp.prepare_params(p, c))(params)
        tabs = params["packed_table"]
        nbytes = sum(t.size * 4 for t in tabs)

        @jax.jit
        def enc(tabs, u, g=gcfg):
            return packed_encode(tabs, u, g).sum()

        dt = timeit(f"encode_{name}", enc, tabs, u)
        print(json.dumps({"variant": name, "packed_MB": round(nbytes / 2**20),
                          "Msamples_per_s": round(BUF / dt / 1e6, 1)}),
              flush=True)

        rcfg = RenderConfig(render_step_size=step, buffer_size=BUF,
                            max_steps=1024, march_compaction="rows")

        @jax.jit
        def render(params, o, d, regions, c=cfg, r=rcfg):
            out, aux = render_rays(params, c, grid, o, d, aabb, r,
                                   background=jnp.ones(3), regions=regions)
            return out.rgb, aux["n_samples"]

        dt = timeit(f"render_{name}", render, params, origins, viewdirs,
                    regions)
        _, n = render(params, origins, viewdirs, regions)
        print(json.dumps({"variant": name,
                          "render_Msamples_per_s": round(int(n) / dt / 1e6, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
