"""Round-3 fused-train-step design race (capped marching).

Variants on the REAL fused step (march+field+composite+loss+bwd+adam) at
trainer shapes (16384 rays, 2^18 budget, 1024 steps, 128^3 grid):

  base      capped, midpoint-leader exact span-3.5 (round-3 marcher)
  kcap64    + adaptive per-ray cap 64 (4x the 16-sample per-ray budget)
  bf16      + bf16 table-gradient accumulation
  micro2    + two independent half-budget microbatches in one program —
            XLA can overlap microbatch-2's gather-bound march/encode with
            microbatch-1's scatter-bound backward (different engines)
  compact   reference semantics, new span-3.5 mask

Chained inputs (axon tunnel result-caches identical-arg calls).
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
import optax

from dregnerf_tpu.models import ngp
from dregnerf_tpu.ops import occupancy
from dregnerf_tpu.ops.packed_grid import PackedGridConfig
from dregnerf_tpu.render.renderer import RenderConfig, render_rays

R = 16384
S = 1024
B = 1 << 18
GRID_RES = 128
STEP = float(3.0 * 3**0.5 / 1024)
AABB = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])


def timeit(name, fn, carry, iters=8):
    carry = fn(carry, jnp.int32(0))
    jax.block_until_ready(carry)
    t0 = time.time()
    for i in range(1, iters + 1):
        carry = fn(carry, jnp.int32(i))
    jax.block_until_ready(carry)
    dt = (time.time() - t0) / iters
    print(json.dumps(
        {"variant": name, "ms": round(dt * 1e3, 2),
         "samples_per_s": round(B / dt)}
    ), flush=True)


def main(only):
    key = jax.random.PRNGKey(0)
    binary = jax.random.uniform(jax.random.PRNGKey(1), (GRID_RES,) * 3) < 0.25
    grid = occupancy.init_grid(GRID_RES)._replace(binary=binary)
    regions = jax.jit(occupancy.pack_regions)(grid.binary)
    k1, _ = jax.random.split(key)
    origins = jax.random.uniform(k1, (R, 3), minval=-3.0, maxval=-2.0)
    viewdirs = -origins / jnp.linalg.norm(origins, axis=-1, keepdims=True)
    pixels = jax.random.uniform(jax.random.PRNGKey(3), (R, 3))
    optimizer = optax.adam(1e-2, eps=1e-15)

    def make_step(mode, k_cap=None, accum="f32", micro=1):
        cfg = ngp.NGPConfig(grid=PackedGridConfig(grad_accum=accum))
        params = ngp.init_ngp(jax.random.PRNGKey(0), cfg)
        opt_state = optimizer.init(params)
        rcfg = RenderConfig(
            render_step_size=STEP, buffer_size=B // micro, max_steps=S,
            march_compaction=mode, k_cap=k_cap,
        )

        def loss_fn(p, o, key):
            total = 0.0
            rm = R // micro
            for m in range(micro):
                out, aux = render_rays(
                    p, cfg, grid, o[m * rm:(m + 1) * rm],
                    viewdirs[m * rm:(m + 1) * rm], AABB, rcfg,
                    background=jnp.ones(3), stratified=True,
                    key=jax.random.fold_in(key, m), regions=regions,
                )
                alive = (aux["ray_counts"] > 0).astype(jnp.float32)
                err = (out.rgb - pixels[m * rm:(m + 1) * rm]) ** 2
                total = total + jnp.sum(err * alive[:, None]) / (3.0 * R)
            return total

        @jax.jit
        def step(o, p, s, i):
            l, g = jax.value_and_grad(
                lambda pp: loss_fn(pp, o, jax.random.fold_in(jax.random.PRNGKey(7), i))
            )(p)
            up, s = optimizer.update(g, s, p)
            p = optax.apply_updates(p, up)
            return jnp.clip(o + 1e-6 * l, -3.0, -2.0), p, s

        def run(c, i):
            o, p, s = c
            return step(o, p, s, i)

        return run, (origins, params, opt_state)

    variants = {
        "base": dict(mode="capped"),
        "kcap64": dict(mode="capped", k_cap=64),
        "kcap64_bf16": dict(mode="capped", k_cap=64, accum="bf16"),
        "bf16": dict(mode="capped", accum="bf16"),
        # round-3 sorted-hint scatter backward (probe_pallas_scatter.py):
        # exact-f32 sums at (bet) bf16-beating speed
        "sorted": dict(mode="capped", accum="sorted"),
        "sorted_bf16": dict(mode="capped", accum="sorted_bf16"),
        "kcap64_sorted": dict(mode="capped", k_cap=64, accum="sorted"),
        "compact_sorted": dict(mode="compact", accum="sorted"),
        "kcap64_micro2": dict(mode="capped", k_cap=64, micro=2),
        "kcap64_micro4": dict(mode="capped", k_cap=64, micro=4),
        "kcap64_bf16_micro2": dict(mode="capped", k_cap=64, accum="bf16", micro=2),
        "compact_span35": dict(mode="compact"),
    }
    for name, kw in variants.items():
        if only and name not in only:
            continue
        fn, carry = make_step(**kw)
        timeit(name, fn, carry)


if __name__ == "__main__":
    main(set(sys.argv[1:]))
