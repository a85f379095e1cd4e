"""Perf probe: break the render step into stages and time each on TPU.

Run from repo root:  python scripts/perf/probe_render.py
Prints one JSON line per stage. Methodology per CLAUDE.md: outputs feed the
returned value (no DCE), warm-up compile excluded, chained iterations.
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
from dregnerf_tpu.ops.composite import composite
from dregnerf_tpu.ops.ray_march import march_rays, sample_positions
from dregnerf_tpu.render.renderer import RenderConfig, render_rays

NUM_RAYS = 4096
BUF = 1 << 18
MAX_STEPS = 1024


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
    cfg = ngp.NGPConfig()
    key = jax.random.PRNGKey(0)
    params = ngp.init_ngp(key, cfg)
    aabb = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])
    binary = jax.random.uniform(jax.random.PRNGKey(1), (128, 128, 128)) < 0.25
    grid = occupancy.init_grid(128)._replace(binary=binary)
    step = float(3.0 * 3**0.5 / 1024)
    rcfg = RenderConfig(
        render_step_size=step, buffer_size=BUF, max_steps=MAX_STEPS,
        march_compaction="quota",
    )
    k1, _ = jax.random.split(key)
    origins = jax.random.uniform(k1, (NUM_RAYS, 3), minval=-3.0, maxval=-2.0)
    viewdirs = -origins / jnp.linalg.norm(origins, axis=-1, keepdims=True)
    params_p = jax.jit(lambda p: ngp.prepare_params(p, cfg))(params)

    # 1. full render (quota)
    @jax.jit
    def full(params, o, d):
        out, aux = render_rays(params, cfg, grid, o, d, aabb, rcfg,
                               background=jnp.ones(3))
        return out.rgb, aux["n_samples"]

    timeit("full_render_quota", full, params_p, origins, viewdirs)

    # 1b. full render (compact)
    rcfg_c = RenderConfig(render_step_size=step, buffer_size=BUF,
                          max_steps=MAX_STEPS, march_compaction="compact")

    @jax.jit
    def full_c(params, o, d):
        out, aux = render_rays(params, cfg, grid, o, d, aabb, rcfg_c,
                               background=jnp.ones(3))
        return out.rgb, aux["n_samples"]

    timeit("full_render_compact", full_c, params_p, origins, viewdirs)

    # 2. march only (quota)
    @jax.jit
    def march_q(o, d):
        p = march_rays(o, d, grid, aabb, "aabb", step, BUF, MAX_STEPS,
                       compaction="quota")
        return p.t_start.sum(), p.ray_id.sum(), p.num_samples

    timeit("march_quota", march_q, origins, viewdirs)

    # 3. march only (compact)
    @jax.jit
    def march_c(o, d):
        p = march_rays(o, d, grid, aabb, "aabb", step, BUF, MAX_STEPS,
                       compaction="compact")
        return p.t_start.sum(), p.ray_id.sum(), p.num_samples

    timeit("march_compact", march_c, origins, viewdirs)

    # 4. pack_regions alone
    @jax.jit
    def packreg(b):
        return occupancy.pack_regions(b).sum()

    timeit("pack_regions", packreg, binary)

    # 5. field forward on 2^18 packed positions (bf16 compute)
    pos = jax.random.uniform(jax.random.PRNGKey(2), (BUF, 3), minval=-1.2,
                             maxval=1.2)
    dirs = jax.random.normal(jax.random.PRNGKey(3), (BUF, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    @jax.jit
    def field(params, pos, dirs):
        rgb, sig = ngp.forward(params, pos, dirs, aabb, cfg)
        return rgb.sum(), sig.sum()

    timeit("field_forward_2e18", field, params_p, pos, dirs)

    # 5b. encode alone
    from dregnerf_tpu.ops.packed_grid import packed_encode

    u = jax.random.uniform(jax.random.PRNGKey(4), (BUF, 3))

    @jax.jit
    def enc(tables, u):
        return packed_encode(tables, u, cfg.grid).sum()

    timeit("encode_2e18", enc, params_p["packed_table"], u)

    # 6. composite alone on a real packed buffer (num_rays must stay static)
    from dregnerf_tpu.ops.ray_march import PackedSamples

    pk = jax.jit(lambda o, d: march_rays(o, d, grid, aabb, "aabb", step,
                                         BUF, MAX_STEPS, compaction="quota"))(origins, viewdirs)
    rgbs = jax.random.uniform(jax.random.PRNGKey(5), (BUF, 3))
    sigmas = jax.random.uniform(jax.random.PRNGKey(6), (BUF,)) * 10

    def rebuild(ray_id, t0, t1, valid, ns):
        return PackedSamples(ray_id, t0, t1, valid, ns, NUM_RAYS)

    @jax.jit
    def comp(ray_id, t0, t1, valid, ns, rgbs, sigmas):
        out = composite(rebuild(ray_id, t0, t1, valid, ns), rgbs, sigmas,
                        background=jnp.ones(3))
        return out.rgb.sum(), out.depth.sum()

    timeit("composite", comp, pk.ray_id, pk.t_start, pk.t_end, pk.valid,
           pk.num_samples, rgbs, sigmas)

    @jax.jit
    def sp(ray_id, t0, t1, valid, ns, o, d):
        p, dd = sample_positions(rebuild(ray_id, t0, t1, valid, ns), o, d)
        return p.sum(), dd.sum()

    timeit("sample_positions", sp, pk.ray_id, pk.t_start, pk.t_end, pk.valid,
           pk.num_samples, origins, viewdirs)


if __name__ == "__main__":
    main()
