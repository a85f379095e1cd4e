"""Decompose the extraction surface-chunk cost (round-4).

The full-size chunk (8192 rays x 64 samples, 2^19 tables, 128^3 grid,
1024-step candidate mask) measured 181.6 ms row-packed (45k rays/s).
Where does it go? Variants (all jitted with params/grid/regions as
ARGUMENTS — the 413 rule — and chained so the tunnel result cache
can't lie):

  march     rows marching only (candidate mask + top_k) -> sum(t_start)
  density   march + query_density at the row positions -> sum(sigma)
  full      march + density + surface_field_rows (production fn)

Run on the TPU (NOT concurrently with another TPU process):
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/perf/probe_extract_parts.py
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
from dregnerf_tpu.ops.composite import surface_field_rows
from dregnerf_tpu.ops.ray_march import march_rays_rows, row_sample_positions
from dregnerf_tpu.render.renderer import RenderConfig

CHUNK = 8192
K = 64


def main():
    cfg = ngp.NGPConfig()
    params = ngp.init_ngp(jax.random.PRNGKey(0), cfg)
    params = jax.jit(lambda p: ngp.prepare_params(p, cfg))(params)
    aabb = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])
    binary = jax.random.uniform(jax.random.PRNGKey(1), (128, 128, 128)) < 0.25
    grid = occupancy.init_grid(128)._replace(binary=binary)
    regions = jax.jit(occupancy.pack_regions)(grid.binary)
    grid_tuple = tuple(grid)
    rcfg = RenderConfig(
        render_step_size=float(3.0 * 3**0.5 / 1024), max_steps=1024)
    origin = jnp.array([0.0, 0.0, 3.0])

    def make_rays(pts):
        d = pts - origin[None]
        t_max = jnp.linalg.norm(d, axis=-1)
        return jnp.tile(origin[None], (CHUNK, 1)), d / t_max[:, None], t_max

    def march(o, d, t):
        return march_rays_rows(
            o, d, occupancy.OccupancyGrid(*grid_tuple), aabb,
            rcfg.contraction, rcfg.render_step_size, K, rcfg.max_steps,
            rcfg.near_plane, rcfg.far_plane, t_max=t, regions=regions,
        )

    @jax.jit
    def f_march(grid_tuple, regions, pts):
        o, d, t = make_rays(pts)
        rows = march(o, d, t)
        return jnp.sum(rows.t_start, axis=1) + jnp.sum(rows.valid, axis=1)

    @jax.jit
    def f_density(params, grid_tuple, regions, pts):
        o, d, t = make_rays(pts)
        rows = march(o, d, t)
        pos, _ = row_sample_positions(rows, o, d)
        sigma = ngp.query_density(
            params, pos.reshape(-1, 3), aabb, cfg).reshape(rows.valid.shape)
        return jnp.sum(jnp.where(rows.valid, sigma, 0.0), axis=1)

    @jax.jit
    def f_full(params, grid_tuple, regions, pts):
        o, d, t = make_rays(pts)
        rows = march(o, d, t)
        pos, _ = row_sample_positions(rows, o, d)
        sigma = ngp.query_density(
            params, pos.reshape(-1, 3), aabb, cfg).reshape(rows.valid.shape)
        sigma = jnp.where(rows.valid, sigma, 0.0)
        return surface_field_rows(rows, sigma)

    # density eval ALONE at chunk*K flat points (no march): the encode+MLP
    # floor for this shape
    @jax.jit
    def f_query_only(params, pts_flat):
        return ngp.query_density(params, pts_flat, aabb, cfg)

    pts0 = jax.random.uniform(
        jax.random.PRNGKey(2), (CHUNK, 3), minval=-1.2, maxval=1.2)

    def timeit(name, fn, *fixed, flat=False):
        pts = pts0
        if flat:
            pts = jnp.broadcast_to(
                pts0[:, None, :], (CHUNK, K, 3)).reshape(-1, 3)

            def call(p):
                return fn(*fixed, p)

            def chain(p, s):
                return jnp.clip(
                    p + 1e-5 * s.reshape(-1)[:, None], -1.2, 1.2)
        else:
            def call(p):
                return fn(*fixed, p)

            def chain(p, s):
                return jnp.clip(p + 1e-5 * s[:, None], -1.2, 1.2)

        s = call(pts)
        jax.block_until_ready(s)
        iters = 10
        t0 = time.time()
        for _ in range(iters):
            pts = chain(pts, s)
            s = call(pts)
        jax.block_until_ready(s)
        dt = (time.time() - t0) / iters
        print(json.dumps({
            "part": name, "ms": round(dt * 1e3, 2),
            "rays_per_s": round(CHUNK / dt),
        }), flush=True)

    timeit("march", f_march, grid_tuple, regions)
    timeit("density", f_density, params, grid_tuple, regions)
    timeit("full", f_full, params, grid_tuple, regions)
    timeit("query_only_524k", f_query_only, params, flat=True)


if __name__ == "__main__":
    main()
