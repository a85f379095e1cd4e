"""Round-4 pre-fleet TPU gate: extraction 413-fix smoke + trainer wall gap.

Two questions, one process (the tunnel breaks under parallel load):

1. Does full-size (2^19-table) extraction now compile through the remote
   compiler? Round 3's BENCH died with HTTP 413 because the jitted
   surface/feature fns closed over the tables (inlined as HLO constants).
   Fixed by passing params/grid/regions as arguments (sample_grid.py).
   -> smoke make_surface_chunk_fn + query_features at full sizing.

2. Where do the extra ~140 ms/step go in the REAL trainer? BENCH_r03
   wall = 248 ms/step while the identical-shape fused program measured
   ~110-139 ms (probe_step_variants). Decompose:
     raw_step   step_fn only, chained, no host sync, no occ updates
     step_occ   + occupancy update every 16 steps (+ regions repack)
     loop_nosync   full train_iteration, feedback sync disabled
     loop_sync8    full train_iteration, stock BATCH_SYNC_INTERVAL=8
   sync cost = loop_sync8 - loop_nosync; occ cost = step_occ - raw_step;
   residual dispatch overhead = loop_nosync - step_occ.
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/dregnerf_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def smoke_extract():
    from dregnerf_tpu.extract.sample_grid import (
        make_surface_chunk_fn, query_features)
    from dregnerf_tpu.models import ngp
    from dregnerf_tpu.ops import occupancy
    from dregnerf_tpu.render.renderer import RenderConfig

    cfg = ngp.NGPConfig()  # full 2^19 tables
    params = ngp.init_ngp(jax.random.PRNGKey(0), cfg)
    params = jax.jit(lambda p: ngp.prepare_params(p, cfg))(params)
    aabb = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])
    binary = jax.random.uniform(jax.random.PRNGKey(1), (128, 128, 128)) < 0.25
    grid = occupancy.init_grid(128)._replace(binary=binary)
    rcfg = RenderConfig(
        render_step_size=float(3.0 * 3**0.5 / 1024), max_steps=1024)

    chunk, spr = 8192, 64
    t0 = time.time()
    fn = make_surface_chunk_fn(params, cfg, grid, aabb, rcfg, chunk,
                               chunk * spr, samples_per_ray=spr)
    pts = jax.random.uniform(jax.random.PRNGKey(2), (chunk, 3),
                             minval=-1.2, maxval=1.2)
    origin = jnp.array([0.0, 0.0, 3.0])
    d = pts - origin[None]
    t_max = jnp.linalg.norm(d, axis=-1)
    dirs = d / t_max[:, None]
    origins = jnp.tile(origin[None], (chunk, 1))
    s = fn(origins, dirs, t_max)
    jax.block_until_ready(s)
    compile_s = time.time() - t0

    # chained timing (identical-arg calls hit the tunnel result cache)
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        pts = jnp.clip(pts + 1e-5 * s[:, None], -1.2, 1.2)
        dd = pts - origin[None]
        tm = jnp.linalg.norm(dd, axis=-1)
        s = fn(origins, dd / tm[:, None], tm)
    jax.block_until_ready(s)
    dt = (time.time() - t0) / iters
    emit(probe="extract_smoke", ok=True, compile_s=round(compile_s, 1),
         ms_per_chunk=round(dt * 1e3, 2), rays_per_s=round(chunk / dt),
         mean_S=round(float(jnp.mean(s)), 4))

    t0 = time.time()
    rgb, sigma, alpha = query_features(
        params, cfg, aabb, np.asarray(pts, np.float32))
    emit(probe="query_features_smoke", ok=True, s=round(time.time() - t0, 1),
         rgb_mean=round(float(rgb.mean()), 4))


def trainer_wall():
    from dregnerf_tpu.datasets import fixtures
    from dregnerf_tpu.datasets.base import load_scene_blocks
    from dregnerf_tpu.runtime import ngp_trainer as NT
    from dregnerf_tpu.runtime.config import config_parser

    root = tempfile.mkdtemp(prefix="probe_wall_")
    out = tempfile.mkdtemp(prefix="probe_wall_out_")
    try:
        fixtures.make_scene(root, num_views=36, image_size=128)
        scene = load_scene_blocks("objaverse", root, "fixture_scene", "train")[0]
        cfg = config_parser([
            "--dataset", "objaverse", "--root_dir", root,
            "--scene", "fixture_scene", "--expname", "probe", "--out_dir", out,
            "--factor", "1", "--aabb=-1.0,-1.0,-1.0,1.0,1.0,1.0",
            "--max_iterations", "100000",
            "--sample_budget", str(1 << 18), "--max_march_steps", "1024",
            "--grid_resolution", "128", "--init_num_rays", "4096",
            "--max_num_rays", str(1 << 15),
        ])
        trainer = NT.NGPTrainer(cfg, scene)
        key = jax.random.PRNGKey(0)
        # settle the bucket exactly like bench.py
        step, stable, bucket = 0, 0, -1
        while step < 200 and stable < 24:
            m = trainer.train_iteration(step, key)
            step += 1
            nr = int(m["num_rays"])
            stable = stable + 1 if nr == bucket else 0
            bucket = nr
        jax.block_until_ready(m["loss"])
        emit(probe="warmup", steps=step, bucket=bucket)

        iters = 32
        s = trainer.state
        fn = trainer._step_fns[trainer.num_rays]

        # --- raw_step: program + dispatch only --------------------------
        params, opt = s.params, s.opt_state
        for off, n in ((10_000, 4), (20_000, iters)):  # warm, then timed
            t0 = time.time()
            for i in range(n):
                params, opt, m2 = fn(params, opt, s.grid, s.regions,
                                     trainer.images, trainer.c2ws,
                                     trainer.K, key, np.int32(off + i))
            jax.block_until_ready(m2["loss"])
            dt = (time.time() - t0) / n
        emit(probe="raw_step", ms=round(dt * 1e3, 1))

        # --- step_occ: + occ update/repack every 16 ---------------------
        # warm-compile the steady-state occ fn OUTSIDE the timed window
        # (the warmup loop only ever ran the warmup=True variant)
        grid = trainer._occ_update_fns[False](
            s.grid, params, key, np.int32(29_000))
        regions = trainer._pack_regions(grid.binary)
        jax.block_until_ready(regions)
        grid = s.grid
        t0 = time.time()
        for i in range(iters):
            if i % 16 == 0:
                grid = trainer._occ_update_fns[False](
                    grid, params, key, np.int32(30_000 + i))
                regions = trainer._pack_regions(grid.binary)
            params, opt, m2 = fn(params, opt, grid, regions,
                                 trainer.images, trainer.c2ws,
                                 trainer.K, key, np.int32(30_000 + i))
        jax.block_until_ready(m2["loss"])
        dt = (time.time() - t0) / iters
        emit(probe="step_occ", ms=round(dt * 1e3, 1))

        # --- full train_iteration, no feedback sync ---------------------
        old = NT.BATCH_SYNC_INTERVAL
        NT.BATCH_SYNC_INTERVAL = 1 << 30
        t0 = time.time()
        for i in range(step, step + iters):
            m = trainer.train_iteration(i, key)
        jax.block_until_ready(m["loss"])
        dt = (time.time() - t0) / iters
        emit(probe="loop_nosync", ms=round(dt * 1e3, 1))
        NT.BATCH_SYNC_INTERVAL = old

        # --- full train_iteration, stock sync-every-8 --------------------
        step += iters
        t0 = time.time()
        for i in range(step, step + iters):
            m = trainer.train_iteration(i, key)
        jax.block_until_ready(m["loss"])
        dt = (time.time() - t0) / iters
        emit(probe="loop_sync8", ms=round(dt * 1e3, 1),
             samples_per_s=round(int(m["n_samples"]) * 1e3 / (dt * 1e3)))

        # --- lone occ update + repack cost (synced) ----------------------
        t0 = time.time()
        for i in range(4):
            grid = trainer._occ_update_fns[False](
                grid, params, key, np.int32(50_000 + i))
            regions = trainer._pack_regions(grid.binary)
            jax.block_until_ready(regions)
        emit(probe="occ_update_synced", ms=round((time.time() - t0) / 4 * 1e3, 1))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    what = set(sys.argv[1:]) or {"extract", "wall"}
    if "extract" in what:
        smoke_extract()
    if "wall" in what:
        trainer_wall()
