"""Full-image render: one lax.map scan vs independent per-chunk dispatches.

Round-4 question. The stage-2 extraction loop runs ~3x faster per chunk
in the fleet (independent per-camera dispatches, device-side max
accumulator) than the round-3 chained single-stream bench predicted —
through the axon tunnel, back-to-back INDEPENDENT dispatches avoid the
per-call serialization that a data-dependent chain forces. Scan-level
software pipelining inside ONE program was separately measured a dead end
(probe_render_pipelined.py: XLA keeps the sequential schedule).

Does the same dispatch-level effect exist for full-image rendering?
`render_image_chunked` processes all chunks in ONE compiled lax.map scan
(strictly sequential schedule); the alternative is a host loop of
independent per-chunk jit dispatches (inputs pre-staged, outputs fetched
at the end — no host sync between chunks).

Times, per 2^16-ray image (8 x 8192-ray chunks), chained image-to-image
(next image's rays perturbed by this image's mean rgb — defeats the
tunnel's identical-arg result cache without serializing intra-image
chunks):

  scan      render_image_chunked (one jitted lax.map program)
  hostloop  render_image_chunked with image_dispatch="hostloop" (one
            independent jit dispatch per chunk — the product switch)

Decision rule: if hostloop wins by >1.3x, flip the eval/image paths
(validate / eval_ngp_nerf / novel_views) to the host-loop pattern.

Run on the TPU (serially, after the fleet):
  PYTHONPATH=/root/.axon_site:/root/repo \
      python scripts/perf/probe_render_dispatch.py
Reference being matched: the reference's eval renderer walks 8192-ray
chunks in a host loop too (conerf/base/trainer.py eval path /
eval_ngp_nerf.py:150-170).
"""
from __future__ import annotations

import json
import os
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
from dregnerf_tpu.render.renderer import RenderConfig, render_image_chunked

N_RAYS = int(os.environ.get("PROBE_RAYS", 1 << 16))
CHUNK = int(os.environ.get("PROBE_CHUNK", 8192))
MAX_STEPS = 1024
ITERS = int(os.environ.get("PROBE_ITERS", 6))
AABB = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])


def main() -> None:
    cfg = ngp.NGPConfig()
    key = jax.random.PRNGKey(0)
    params = ngp.init_ngp(key, cfg)
    params = jax.jit(lambda p: ngp.prepare_params(p, cfg))(params)
    binary = jax.random.uniform(jax.random.PRNGKey(1), (128, 128, 128)) < 0.25
    grid = occupancy.init_grid(128)._replace(binary=binary)
    rcfg = RenderConfig(
        render_step_size=float(3.0 * 3**0.5 / MAX_STEPS),
        buffer_size=CHUNK * 64, max_steps=MAX_STEPS,
        march_compaction="rows", chunk_size=CHUNK,
    )
    bg = jnp.ones(3)

    k1, _ = jax.random.split(key)
    origins0 = jax.random.uniform(k1, (N_RAYS, 3), minval=-3.0, maxval=-2.0)

    @jax.jit
    def dirs_of(origins):
        return -origins / jnp.linalg.norm(origins, axis=-1, keepdims=True)

    @jax.jit
    def chain(origins, rgb):
        # above-ulp image-to-image perturbation (result-cache trap:
        # CLAUDE.md probe_rle_bwd) without inter-CHUNK data dependence
        return jnp.clip(
            origins + 1e-4 * (rgb.mean() - 0.5), -3.0, -2.0)

    import dataclasses

    rcfg_host = dataclasses.replace(rcfg, image_dispatch="hostloop")

    def scan_image(origins):
        rgb, _, _ = render_image_chunked(
            params, cfg, grid, origins, dirs_of(origins), AABB, rcfg, bg,
            eval_buffer_size=CHUNK * 64)
        return rgb

    def hostloop_image(origins):
        # the PRODUCT path (RenderConfig.image_dispatch switch), so the
        # measured number is what eval/validate/novel_views would run
        rgb, _, _ = render_image_chunked(
            params, cfg, grid, origins, dirs_of(origins), AABB, rcfg_host,
            bg, eval_buffer_size=CHUNK * 64)
        return rgb

    results = {}
    for name, fn in [("scan", scan_image), ("hostloop", hostloop_image)]:
        origins = origins0
        rgb = fn(origins)
        jax.block_until_ready(rgb)
        origins = chain(origins, rgb)
        t0 = time.time()
        for _ in range(ITERS):
            rgb = fn(origins)
            origins = chain(origins, rgb)
        jax.block_until_ready(rgb)
        dt = (time.time() - t0) / ITERS
        results[name] = {
            "ms_per_image": round(dt * 1e3, 1),
            "rays_per_s": round(N_RAYS / dt),
            "rgb_mean": round(float(rgb.mean()), 6),  # equivalence check
        }
        print(json.dumps({name: results[name]}), flush=True)

    speedup = (results["scan"]["ms_per_image"]
               / max(results["hostloop"]["ms_per_image"], 1e-9))
    print(json.dumps({
        "hostloop_speedup_vs_scan": round(speedup, 3),
        "verdict": ("flip eval paths to host-loop" if speedup > 1.3
                    else "keep lax.map (dispatch overlap insignificant)"),
    }), flush=True)


if __name__ == "__main__":
    main()
