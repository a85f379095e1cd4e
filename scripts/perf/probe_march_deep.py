"""March-stage decomposition at trainer shapes (round 3).

Where do march_capped's ~59 ms go at [16384 rays x 1024 steps]?
Times: mask alone (span 3.5 midpoint leader), mask+top_k at several k and
key dtypes, and the full capped march. Chained inputs.
"""
from __future__ import annotations

import json
import sys
import time

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/dregnerf_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp

from dregnerf_tpu.ops import occupancy
from dregnerf_tpu.ops.ray_march import _candidate_mask, march_rays

R = 16384
S = 1024
B = 1 << 18
GRID_RES = 128
STEP = float(3.0 * 3**0.5 / 1024)
AABB = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])


def timeit(name, fn, carry, iters=10):
    carry = fn(carry, jnp.int32(0))
    jax.block_until_ready(carry)
    t0 = time.time()
    for i in range(1, iters + 1):
        carry = fn(carry, jnp.int32(i))
    jax.block_until_ready(carry)
    dt = (time.time() - t0) / iters
    print(json.dumps({"stage": name, "ms": round(dt * 1e3, 2)}), flush=True)


def main(only):
    key = jax.random.PRNGKey(0)
    binary = jax.random.uniform(jax.random.PRNGKey(1), (GRID_RES,) * 3) < 0.25
    grid = occupancy.init_grid(GRID_RES)._replace(binary=binary)
    regions = jax.jit(occupancy.pack_regions)(grid.binary)
    k1, _ = jax.random.split(key)
    origins = jax.random.uniform(k1, (R, 3), minval=-3.0, maxval=-2.0)
    viewdirs = -origins / jnp.linalg.norm(origins, axis=-1, keepdims=True)

    def mk_mask(o, i):
        jit_ = jax.random.uniform(
            jax.random.fold_in(jax.random.PRNGKey(9), i), (R, 1)
        )
        return _candidate_mask(
            o, viewdirs, grid, AABB, "aabb", STEP, S, 0.0, 1e10, None,
            jit_, 3.5, regions,
        )

    if not only or "mask" in only:
        @jax.jit
        def mask_only(o, i):
            mask, t_lo = mk_mask(o, i)
            drift = jnp.sum(mask.astype(jnp.float32)) * 1e-9 + jnp.sum(t_lo) * 1e-9
            return jnp.clip(o + 1e-6 * drift, -3.0, -2.0)

        timeit("mask_span3.5", mask_only, origins)

    for kk in (64, 256):
        if only and f"topk{kk}" not in only:
            continue

        @jax.jit
        def mask_topk(o, i, _k=kk):
            mask, t_lo = mk_mask(o, i)
            big = jnp.int32(1 << 30)
            keys = jnp.where(
                mask, -jnp.arange(S, dtype=jnp.int32)[None, :], -big
            )
            vals, _ = jax.lax.top_k(keys, _k)
            drift = jnp.sum(vals.astype(jnp.float32)) * 1e-12 + jnp.sum(t_lo) * 1e-9
            return jnp.clip(o + 1e-6 * drift, -3.0, -2.0)

        timeit(f"mask+topk{kk}_i32", mask_topk, origins)

    if not only or "cumsum" in only:
        @jax.jit
        def mask_cumsum(o, i):
            mask, t_lo = mk_mask(o, i)
            cs = jnp.cumsum(mask.astype(jnp.int32), axis=1)
            drift = jnp.sum(cs[:, -1]).astype(jnp.float32) * 1e-9
            return jnp.clip(o + 1e-6 * drift, -3.0, -2.0)

        timeit("mask+rowcumsum", mask_cumsum, origins)

    for kk in (64, 256):
        if only and f"march{kk}" not in only:
            continue

        @jax.jit
        def march_full(o, i, _k=kk):
            packed = march_rays(
                o, viewdirs, grid, AABB, "aabb", STEP, B, S,
                stratified=True,
                key=jax.random.fold_in(jax.random.PRNGKey(9), i),
                compaction="capped", regions=regions, k_cap=_k,
            )
            drift = jnp.sum(packed.t_start) * 1e-9
            return jnp.clip(o + 1e-6 * drift, -3.0, -2.0)

        timeit(f"march_capped_k{kk}", march_full, origins)


if __name__ == "__main__":
    main(set(sys.argv[1:]))
