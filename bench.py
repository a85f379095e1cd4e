"""Benchmark: the three hot paths on one chip — render, train, extract.

Prints one JSON line per metric; the LAST line is the headline render
metric and carries all three in `detail` (the driver parses the last
line; the others remain visible in the recorded tail).

Baseline context (BASELINE.md): the reference publishes no numbers; the
north stars are single-chip throughputs vs an A100 tcnn/nerfacc stack.
vs_baseline denominators (reference-class floors, recalibrated as real
numbers land):
  render   1e8 samples/s  (A100 nerfacc+tcnn render class)
  train    1e7 samples/s  (A100 class: ~10k iters x 2^18 in ~4-7 min)
  extract  1e6 rays/s     (the Nc x Np surface pass, stage-2 hot loop)
"""
from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

import numpy as np

BASELINE_RENDER = 1e8
BASELINE_TRAIN = 1e7
BASELINE_EXTRACT = 1e6

# BENCH_SMOKE=1: tiny shapes on CPU — validates every code path this file
# exercises (the driver runs bench.py unattended at round end; a crash
# there silences the headline artifact) without occupying the TPU tunnel.
# Numbers printed under smoke are meaningless; `smoke: true` marks them.
SMOKE = bool(int(os.environ.get("BENCH_SMOKE", "0")))


def _p(real, smoke):
    return smoke if SMOKE else real


def bench_render(jax, jnp):
    from dregnerf_tpu.models import ngp
    from dregnerf_tpu.ops import occupancy
    from dregnerf_tpu.render.renderer import RenderConfig, render_rays

    import dataclasses

    cfg = ngp.NGPConfig()  # full instant-ngp sizing, bf16 compute
    if SMOKE:
        cfg = dataclasses.replace(
            cfg, grid=dataclasses.replace(cfg.grid, log2_table_size=12))
    key = jax.random.PRNGKey(0)
    params = ngp.init_ngp(key, cfg)
    aabb = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])
    res = _p(128, 32)
    binary = jax.random.uniform(jax.random.PRNGKey(1), (res, res, res)) < 0.25
    grid = occupancy.init_grid(res)._replace(binary=binary)
    rcfg = RenderConfig(
        render_step_size=float(3.0 * 3**0.5 / _p(1024, 64)),
        buffer_size=_p(1 << 18, 1 << 12),
        max_steps=_p(1024, 64),
        march_compaction="rows",
    )

    params = jax.jit(lambda p: ngp.prepare_params(p, cfg))(params)
    regions = jax.jit(occupancy.pack_regions)(grid.binary)

    def measure(num_rays, buffer_size):
        import dataclasses as _dc

        rc = _dc.replace(rcfg, buffer_size=buffer_size)
        k1, _ = jax.random.split(key)
        origins = jax.random.uniform(
            k1, (num_rays, 3), minval=-3.0, maxval=-2.0)

        @jax.jit
        def render(params, origins, regions):
            viewdirs = -origins / jnp.linalg.norm(
                origins, axis=-1, keepdims=True)
            out, aux = render_rays(
                params, cfg, grid, origins, viewdirs, aabb, rc,
                background=jnp.ones(3), regions=regions,
            )
            # chain origins through rgb: no two timed calls share args (the
            # axon tunnel result-caches identical-arg calls — CLAUDE.md)
            nxt = jnp.clip(origins + 1e-4 * (out.rgb - 0.5), -3.0, -2.0)
            return nxt, out.rgb, aux["n_samples"]

        origins_, rgb, n = render(params, origins, regions)
        jax.block_until_ready(rgb)
        iters = _p(10, 2)
        t0 = time.time()
        for _ in range(iters):
            origins_, rgb, n = render(params, origins_, regions)
        jax.block_until_ready(rgb)
        dt = (time.time() - t0) / iters
        return int(n) / dt, {
            "rays_per_s": round(num_rays / dt),
            "ms_per_batch": round(dt * 1e3, 2),
            "n_samples_per_batch": int(n),
            "num_rays": num_rays,
        }

    # Two chunk sizes: 4096 rays (the round-2..4 comparable config) and
    # 8192 (the reference's test_chunk_size, config.py:66-68 — bigger
    # batches amortize the per-dispatch tunnel latency). Headline = best.
    sps_a, det_a = measure(_p(4096, 64), _p(1 << 18, 1 << 12))
    try:
        sps_b, det_b = measure(_p(8192, 64), _p(1 << 19, 1 << 12))
    except Exception as e:
        sps_b, det_b = 0.0, {"error": f"{type(e).__name__}: {e}"[:200]}
    best, det = (sps_a, det_a) if sps_a >= sps_b else (sps_b, det_b)
    det["rays4096_samples_per_s"] = round(sps_a)
    det["rays8192_samples_per_s"] = round(sps_b)
    return best, det


def bench_train(jax, jnp):
    """The REAL NGPTrainer at the reference config (2^18-sample budget,
    128^3 grid, 1024 steps, full 2^19 tables) on the hermetic fixture —
    includes occupancy updates and dynamic batching, i.e. true wall-clock
    per trained sample."""
    from dregnerf_tpu.datasets import fixtures
    from dregnerf_tpu.datasets.base import load_scene_blocks
    from dregnerf_tpu.runtime.config import config_parser
    from dregnerf_tpu.runtime.ngp_trainer import NGPTrainer

    root = tempfile.mkdtemp(prefix="bench_train_")
    out = tempfile.mkdtemp(prefix="bench_train_out_")
    try:
        fixtures.make_scene(root, num_views=_p(36, 6), image_size=_p(128, 32))
        scene = load_scene_blocks("objaverse", root, "fixture_scene", "train")[0]
        cfg = config_parser([
            "--dataset", "objaverse", "--root_dir", root,
            "--scene", "fixture_scene", "--expname", "bench", "--out_dir", out,
            "--factor", "1", "--aabb=-1.0,-1.0,-1.0,1.0,1.0,1.0",
            "--max_iterations", "100000",
            "--sample_budget", str(_p(1 << 18, 1 << 12)),
            "--max_march_steps", str(_p(1024, 64)),
            "--grid_resolution", str(_p(128, 32)),
            "--init_num_rays", str(_p(4096, 64)),
            "--max_num_rays", str(_p(1 << 15, 256)),
        ])
        from dregnerf_tpu.runtime.ngp_trainer import OCC_WARMUP_STEPS

        trainer = NGPTrainer(cfg, scene)
        key = jax.random.PRNGKey(0)
        # Warmup until (a) the pow2 ray bucket stops moving — a bucket
        # change inside the timed window drags a fresh compile (minutes,
        # cold cache) into the measurement (a 40-step fixed warmup measured
        # 0.13 M samples/s where the settled step runs 2.4 M) — AND (b) the
        # occupancy grid has left its warmup phase: below OCC_WARMUP_STEPS
        # every 16th step re-evaluates ALL grid cells (~500 ms vs ~106 ms
        # steady, round-4 probe_trainer_wall) — steady-state throughput is
        # the honest number and what a 10k-iteration block actually runs at.
        step, stable, bucket = 0, 0, -1
        min_steps = _p(OCC_WARMUP_STEPS + 1, 8)  # first steady occ update
        need_stable = _p(24, 0)
        while step < max(_p(400, 8), min_steps) and (
                stable < need_stable or step < min_steps):
            m = trainer.train_iteration(step, key)
            step += 1
            nr = int(m["num_rays"])
            stable = stable + 1 if nr == bucket else 0
            bucket = nr
        bucket_settled = stable >= 24  # ADVICE r3: flag an unsettled window
        warmup_steps = step
        jax.block_until_ready(m["loss"])
        iters = _p(32, 4)
        counts = []  # device scalars; summed AFTER timing (no per-step sync)
        t0 = time.time()
        for step in range(step, step + iters):
            m = trainer.train_iteration(step, key)
            counts.append(m["n_samples"])
        jax.block_until_ready(m["loss"])
        dt = time.time() - t0
        total_samples = sum(int(c) for c in counts)
        return total_samples / dt, {
            "s_per_step": round(dt / iters, 4),
            "num_rays": int(m["num_rays"]),
            "march": trainer.render_config.march_compaction,
            "grad_accum": trainer.model_config.grid.grad_accum,
            "warmup_steps": warmup_steps,
            "bucket_settled": bucket_settled,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def bench_extract(jax, jnp):
    """The Nc x Np surface-field megabatch (stage-2 hot loop,
    SURVEY §3.2): camera->point rays with per-ray t_max, capped march +
    density query + per-ray S reduction."""
    from dregnerf_tpu.extract.sample_grid import make_surface_chunk_fn
    from dregnerf_tpu.models import ngp
    from dregnerf_tpu.ops import occupancy
    from dregnerf_tpu.render.renderer import RenderConfig

    import dataclasses

    cfg = ngp.NGPConfig()
    if SMOKE:
        cfg = dataclasses.replace(
            cfg, grid=dataclasses.replace(cfg.grid, log2_table_size=12))
    key = jax.random.PRNGKey(0)
    params = ngp.init_ngp(key, cfg)
    params = jax.jit(lambda p: ngp.prepare_params(p, cfg))(params)
    aabb = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])
    res = _p(128, 32)
    binary = jax.random.uniform(jax.random.PRNGKey(1), (res, res, res)) < 0.25
    grid = occupancy.init_grid(res)._replace(binary=binary)
    rcfg = RenderConfig(
        render_step_size=float(3.0 * 3**0.5 / _p(1024, 64)),
        max_steps=_p(1024, 64),
    )

    chunk = _p(8192, 256)
    samples_per_ray = _p(64, 16)
    # buffer must satisfy chunk <= buffer // samples_per_ray or the march
    # silently zeroes trailing rays (sample_grid.py cap contract).
    fn = make_surface_chunk_fn(
        params, cfg, grid, aabb, rcfg, chunk, chunk * samples_per_ray,
        samples_per_ray=samples_per_ray,
    )

    pts0 = jax.random.uniform(key, (chunk, 3), minval=-1.2, maxval=1.2)

    @jax.jit
    def make_rays(pts, origin):
        d = pts - origin[None]
        t_max = jnp.linalg.norm(d, axis=-1)
        dirs = d / t_max[:, None]
        origins = jnp.tile(origin[None], (chunk, 1))
        return origins, dirs, t_max

    @jax.jit
    def chain(pts, s):
        # chain: next chunk's points depend on this chunk's output
        return jnp.clip(pts + 1e-5 * s[:, None], -1.2, 1.2)

    # The REAL stage-2 loop (compute_surface_mask) dispatches one
    # independent fn call per CAMERA per chunk with a device-side
    # jnp.maximum accumulator — the per-camera gathers overlap in the
    # dispatch pipeline (CLAUDE.md: independent gathers reach 183-190M
    # rows/s aggregate vs ~24M single-stream). Benchmark that pattern:
    # camera-inner, chunk-outer, chained only at the chunk boundary.
    n_cams = _p(16, 2)
    cam_origins = [
        jnp.asarray(o) for o in 3.0 * np.stack([
            np.cos(np.linspace(0, 2 * np.pi, n_cams, endpoint=False)),
            np.sin(np.linspace(0, 2 * np.pi, n_cams, endpoint=False)),
            np.full(n_cams, 0.5),
        ], -1).astype(np.float32)
    ]

    def one(pts):
        acc = None
        for origin in cam_origins:
            origins, dirs, t_max = make_rays(pts, origin)
            s = fn(origins, dirs, t_max)
            acc = s if acc is None else jnp.maximum(acc, s)
        return chain(pts, acc), acc

    pts, s = one(pts0)
    jax.block_until_ready(s)
    iters = _p(4, 1)
    t0 = time.time()
    for _ in range(iters):
        pts, s = one(pts)
    jax.block_until_ready(s)
    dt = (time.time() - t0) / iters
    rays_per_s = n_cams * chunk / dt

    # single-stream chained latency (round-3/4 comparable number)
    def one_chained(pts):
        origins, dirs, t_max = make_rays(pts, cam_origins[0])
        s = fn(origins, dirs, t_max)
        return chain(pts, s), s

    pts, s = one_chained(pts)
    jax.block_until_ready(s)
    single_iters = _p(8, 2)
    t0 = time.time()
    for _ in range(single_iters):
        pts, s = one_chained(pts)
    jax.block_until_ready(s)
    dt_single = (time.time() - t0) / single_iters
    return rays_per_s, {
        "ms_per_cam_chunk_pipelined": round(dt / n_cams * 1e3, 2),
        "ms_per_chunk_single_stream": round(dt_single * 1e3, 2),
        "chunk": chunk, "cams_per_chunk": n_cams,
    }


def main() -> None:
    import jax
    import jax.numpy as jnp

    if SMOKE:
        # crash-validation run: stay OFF the TPU tunnel (env vars are too
        # late under the axon sitecustomize — config.update after import
        # is the working override, CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/dregnerf_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    # Each section is fenced: the driver parses the LAST line, so a crash
    # in one path must not silence the headline render metric.
    def fenced(fn, name):
        try:
            return fn(jax, jnp)
        except Exception as e:  # record the failure, keep benching
            return 0.0, {"error": f"{name}: {type(e).__name__}: {e}"[:300]}

    train_sps, train_detail = fenced(bench_train, "train")
    if SMOKE:
        train_detail["smoke"] = True
    print(json.dumps({
        "metric": "ngp_train_samples_per_s", "value": round(train_sps),
        "unit": "samples/s",
        "vs_baseline": round(train_sps / BASELINE_TRAIN, 4),
        "detail": train_detail,
    }), flush=True)

    extract_rps, extract_detail = fenced(bench_extract, "extract")
    if SMOKE:
        extract_detail["smoke"] = True
    print(json.dumps({
        "metric": "extract_surface_rays_per_s", "value": round(extract_rps),
        "unit": "rays/s",
        "vs_baseline": round(extract_rps / BASELINE_EXTRACT, 4),
        "detail": extract_detail,
    }), flush=True)

    render_sps, render_detail = bench_render(jax, jnp)
    if SMOKE:
        render_detail["smoke"] = True
    render_detail.update({
        "device": str(jax.devices()[0]),
        "train_samples_per_s": round(train_sps),
        "extract_rays_per_s": round(extract_rps),
    })
    print(json.dumps({
        "metric": "ngp_render_samples_per_s", "value": round(render_sps),
        "unit": "samples/s",
        "vs_baseline": round(render_sps / BASELINE_RENDER, 4),
        "detail": render_detail,
    }), flush=True)


if __name__ == "__main__":
    main()
