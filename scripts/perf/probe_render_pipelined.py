"""Perf probe: chunked vs software-pipelined full-image render on TPU.

The pipelined path overlaps chunk i+1's occupancy-region gathers (march)
with chunk i's hash-table level gathers (shade) inside one lax.scan body
— independent DMA streams, which probe_gather_chained.py measured at ~2x
aggregate row throughput vs sequential. This probe decides whether XLA's
scheduler actually realizes the overlap at render shapes.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python scripts/perf/probe_render_pipelined.py
Methodology per CLAUDE.md: chained iterations (output perturbs next
origins — the axon tunnel result-caches identical-arg calls), outputs
feed returns (no DCE).
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
from dregnerf_tpu.render.renderer import (
    RenderConfig,
    render_image_chunked,
    render_image_pipelined,
)

N_RAYS = 1 << 16  # a 256x256 image
CHUNK = 8192
BUF = 1 << 18  # per-chunk K = BUF/CHUNK = 32 slots/ray
ITERS = 8


def main():
    cfg = ngp.NGPConfig()
    key = jax.random.PRNGKey(0)
    params = ngp.init_ngp(key, cfg)
    aabb = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])
    binary = jax.random.uniform(jax.random.PRNGKey(1), (128, 128, 128)) < 0.25
    grid = occupancy.init_grid(128)._replace(binary=binary)
    rcfg = RenderConfig(
        render_step_size=float(3.0 * 3**0.5 / 1024),
        buffer_size=BUF,
        max_steps=1024,
        chunk_size=CHUNK,
        march_compaction="rows",
    )
    k1, _ = jax.random.split(key)
    origins0 = jax.random.uniform(k1, (N_RAYS, 3), minval=-3.0, maxval=-2.0)
    bg = jnp.ones(3)

    def run(render_fn, origins):
        o = origins
        viewdirs = -o / jnp.linalg.norm(o, axis=-1, keepdims=True)
        rgb, opacity, depth = render_fn(
            params, cfg, grid, o, viewdirs, aabb, rcfg, bg,
            eval_buffer_size=BUF,
        )
        # chain: perturb next origins by this frame's mean color so no two
        # timed calls share args; all outputs feed the return
        return o + 1e-4 * (jnp.mean(rgb) + jnp.mean(opacity) + jnp.mean(depth))

    for name, fn in (
        ("chunked", render_image_chunked),
        ("pipelined", render_image_pipelined),
    ):
        jfn = jax.jit(lambda o, fn=fn: run(fn, o))
        o = jfn(origins0)
        jax.block_until_ready(o)  # compile + warm
        t0 = time.time()
        for _ in range(ITERS):
            o = jfn(o)
        jax.block_until_ready(o)
        dt = (time.time() - t0) / ITERS
        # effective samples/s at the nominal K budget
        n_samples = N_RAYS * min(BUF // CHUNK, 1024)
        print(json.dumps({
            "path": name,
            "ms_per_image": round(dt * 1e3, 2),
            "rays_per_s": round(N_RAYS / dt),
            "slot_samples_per_s": round(n_samples / dt),
        }), flush=True)


if __name__ == "__main__":
    main()
