"""Round-3 training-step breakdown at REAL trainer shapes.

The round-2 quality gate measured the full fixture trainer at 0.68 s/step
(compact-f32, bucket ~16384 rays, 2^18 budget, 1024 max_steps, 128^3 grid).
This probe decomposes that time: candidate lattice, compaction, field
fwd, field fwd+bwd (scatter), pack_table, composite, adam — each timed as
its own jitted program with CHAINED inputs (identical-arg repeats return
result-cache numbers through the axon tunnel — CLAUDE.md).

Run: python scripts/perf/probe_step_parts.py [stage ...]
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
import numpy as np
import optax

from dregnerf_tpu.models import ngp
from dregnerf_tpu.ops import occupancy
from dregnerf_tpu.ops.packed_grid import pack_table, packed_encode
from dregnerf_tpu.ops.ray_march import _candidate_mask, march_rays, sample_positions
from dregnerf_tpu.render.renderer import RenderConfig, render_rays

R = 16384          # trainer steady-state ray bucket
S = 1024           # max march steps
B = 1 << 18        # sample budget
N = 1 << 18        # field batch
GRID_RES = 128
STEP = float(3.0 * 3**0.5 / 1024)
AABB = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])


def timeit(name, fn, carry, iters=8):
    """fn(carry, i) -> carry; times steady-state with chained inputs."""
    carry = fn(carry, jnp.int32(0))
    jax.block_until_ready(carry)
    t0 = time.time()
    for i in range(1, iters + 1):
        carry = fn(carry, jnp.int32(i))
    jax.block_until_ready(carry)
    dt = (time.time() - t0) / iters
    print(json.dumps({"stage": name, "ms": round(dt * 1e3, 2)}), flush=True)
    return dt


def make_inputs():
    key = jax.random.PRNGKey(0)
    cfg = ngp.NGPConfig()
    params = ngp.init_ngp(key, cfg)
    binary = jax.random.uniform(jax.random.PRNGKey(1), (GRID_RES,) * 3) < 0.25
    grid = occupancy.init_grid(GRID_RES)._replace(binary=binary)
    regions = jax.jit(occupancy.pack_regions)(grid.binary)
    k1, k2 = jax.random.split(key)
    origins = jax.random.uniform(k1, (R, 3), minval=-3.0, maxval=-2.0)
    viewdirs = -origins / jnp.linalg.norm(origins, axis=-1, keepdims=True)
    return cfg, params, grid, regions, origins, viewdirs


def main(only):
    cfg, params, grid, regions, origins, viewdirs = make_inputs()
    rcfg = RenderConfig(
        render_step_size=STEP, buffer_size=B, max_steps=S,
        march_compaction="compact",
    )

    def want(s):
        return not only or s in only

    # ---- full loss fwd / fwd+bwd / fwd+bwd+adam, per compaction mode ----
    optimizer = optax.adam(1e-2, eps=1e-15)
    opt_state = optimizer.init(params)
    pixels = jax.random.uniform(jax.random.PRNGKey(3), (R, 3))

    def make_loss(mode):
        mcfg = RenderConfig(
            render_step_size=STEP, buffer_size=B, max_steps=S,
            march_compaction=mode,
        )

        def loss_fn(p, o, key):
            out, aux = render_rays(
                p, cfg, grid, o, viewdirs, AABB, mcfg,
                background=jnp.ones(3), stratified=True, key=key,
                regions=regions,
            )
            alive = (aux["ray_counts"] > 0).astype(jnp.float32)
            err = (out.rgb - pixels) ** 2
            return jnp.sum(err * alive[:, None]) / (3.0 * R), aux["n_samples"]

        return loss_fn

    for mode in ("compact", "capped", "rows"):
        loss_fn = make_loss(mode)

        if want(f"fwd_{mode}"):
            @jax.jit
            def fwd(o, i, _loss=loss_fn):
                l, n = _loss(params, o, jax.random.fold_in(jax.random.PRNGKey(7), i))
                return jnp.clip(o + 1e-6 * l, -3.0, -2.0), n

            timeit(f"loss_fwd_{mode}", lambda c, i: fwd(c, i)[0], origins)

        if want(f"fwdbwd_{mode}"):
            @jax.jit
            def fwdbwd(o, p, i, _loss=loss_fn):
                (l, n), g = jax.value_and_grad(
                    lambda pp: _loss(pp, o, jax.random.fold_in(jax.random.PRNGKey(7), i)),
                    has_aux=True,
                )(p)
                return jnp.clip(o + 1e-6 * l, -3.0, -2.0), g

            def run(c, i):
                o, p = c
                o2, g = fwdbwd(o, p, i)
                return o2, p

            timeit(f"loss_fwdbwd_{mode}", run, (origins, params))

        if want(f"step_{mode}"):
            @jax.jit
            def full_step(o, p, s, i, _loss=loss_fn):
                (l, n), g = jax.value_and_grad(
                    lambda pp: _loss(pp, o, jax.random.fold_in(jax.random.PRNGKey(7), i)),
                    has_aux=True,
                )(p)
                up, s = optimizer.update(g, s, p)
                p = optax.apply_updates(p, up)
                return jnp.clip(o + 1e-6 * l, -3.0, -2.0), p, s

            def run2(c, i):
                o, p, s = c
                return full_step(o, p, s, i)

            timeit(f"full_step_{mode}", run2, (origins, params, opt_state))

    # ---- march-only stages ----
    if want("march"):
        @jax.jit
        def cand(o, i):
            jit_ = jax.random.uniform(jax.random.fold_in(jax.random.PRNGKey(9), i), (R, 1))
            mask, t_lo = _candidate_mask(
                o, viewdirs, grid, AABB, "aabb", STEP, S, 0.0, 1e10, None,
                jit_, 1.5, regions,
            )
            drift = jnp.sum(mask.astype(jnp.float32)) * 1e-9 + jnp.sum(t_lo) * 1e-9
            return jnp.clip(o + 1e-6 * drift, -3.0, -2.0)

        timeit("candidate_mask_span1.5", cand, origins)

        @jax.jit
        def march_full(o, i):
            packed = march_rays(
                o, viewdirs, grid, AABB, "aabb", STEP, B, S,
                stratified=True, key=jax.random.fold_in(jax.random.PRNGKey(9), i),
                compaction="compact", regions=regions,
            )
            drift = jnp.sum(packed.t_start) * 1e-9
            return jnp.clip(o + 1e-6 * drift, -3.0, -2.0)

        timeit("march_compact", march_full, origins)

        @jax.jit
        def march_capped(o, i):
            packed = march_rays(
                o, viewdirs, grid, AABB, "aabb", STEP, B, S,
                stratified=True, key=jax.random.fold_in(jax.random.PRNGKey(9), i),
                compaction="capped", regions=regions,
            )
            drift = jnp.sum(packed.t_start) * 1e-9
            return jnp.clip(o + 1e-6 * drift, -3.0, -2.0)

        timeit("march_capped", march_capped, origins)

    # ---- field fwd / fwd+bwd on a flat [N, 3] batch ----
    pos0 = jax.random.uniform(jax.random.PRNGKey(5), (N, 3), minval=-1.2, maxval=1.2)
    dirs = jax.random.normal(jax.random.PRNGKey(6), (N, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    if want("field"):
        @jax.jit
        def ffwd(pos, i):
            rgb, sig = ngp.forward(params, pos, dirs, AABB, cfg)
            return jnp.clip(pos + 1e-6 * (rgb - 0.5), -1.2, 1.2)

        timeit("field_fwd", ffwd, pos0)

        @jax.jit
        def ffwdbwd(pos, p, i):
            def loss(pp):
                rgb, sig = ngp.forward(pp, pos, dirs, AABB, cfg)
                return rgb.sum() + sig.sum()

            l, g = jax.value_and_grad(loss)(p)
            return jnp.clip(pos + 1e-9 * l, -1.2, 1.2), g

        def runf(c, i):
            pos, p = c
            pos2, g = ffwdbwd(pos, p, i)
            return pos2, p

        timeit("field_fwdbwd", runf, (pos0, params))

    # ---- encode-only fwd+bwd; pack_table fwd and vjp ----
    u0 = jax.random.uniform(jax.random.PRNGKey(8), (N, 3))
    if want("encode"):
        @jax.jit
        def enc_fwd(u, i):
            p = pack_table(params["table"], cfg.grid)
            e = packed_encode(p, u, cfg.grid)
            return jnp.clip(u + 1e-9 * e[:, :3], 0.0, 1.0)

        timeit("encode_fwd_inclpack", enc_fwd, u0)

        @jax.jit
        def enc_fwdbwd(u, t, i):
            def loss(tt):
                p = pack_table(tt, cfg.grid)
                return packed_encode(p, u, cfg.grid).sum()

            l, g = jax.value_and_grad(loss)(t)
            return jnp.clip(u + 1e-12 * l, 0.0, 1.0), g

        def rune(c, i):
            u, t = c
            u2, g = enc_fwdbwd(u, t, i)
            return u2, t

        timeit("encode_fwdbwd", rune, (u0, params["table"]))

    if want("pack"):
        @jax.jit
        def packf(t, i):
            p = pack_table(t, cfg.grid)
            return t + 1e-12 * p[0][:1, :4].sum()

        timeit("pack_table_fwd", packf, params["table"])

        @jax.jit
        def packb(t, i):
            def loss(tt):
                p = pack_table(tt, cfg.grid)
                return sum(x[::97].sum() for x in p)

            l, g = jax.value_and_grad(loss)(t)
            return t + 1e-12 * g

        timeit("pack_table_fwd+vjp", packb, params["table"])

    # ---- scatter experiments at backward shapes ----
    if want("scatter"):
        sizes = np.asarray(cfg.grid.level_table_sizes())
        g_rows0 = jax.random.normal(jax.random.PRNGKey(10), (N, 8 * cfg.grid.n_features))
        idx0 = [
            jax.random.randint(jax.random.PRNGKey(20 + l), (N,), 0, int(sizes[l]))
            for l in range(cfg.grid.n_levels)
        ]

        @jax.jit
        def scat1(g_rows, idx, i):
            out = jnp.zeros((int(sizes[-1]), g_rows.shape[1]), jnp.float32)
            out = out.at[idx].add(g_rows)
            return g_rows + 1e-12 * out[0].sum(), out[1].sum()

        def runs1(c, i):
            g, o = scat1(c, idx0[-1], i)
            return g

        timeit("scatter_1lvl_2^19", runs1, g_rows0)

        @jax.jit
        def scat_all(g_rows, i):
            # 8 INDEPENDENT scatters (one per level) in one program: do the
            # DMA engines overlap them like independent gathers?
            tot = g_rows[0, 0] * 0.0
            for l in range(cfg.grid.n_levels):
                out = jnp.zeros((int(sizes[l]), g_rows.shape[1]), jnp.float32)
                out = out.at[idx0[l]].add(g_rows + float(l))
                tot = tot + out[l % 16].sum()
            return g_rows + 1e-12 * tot

        timeit("scatter_8lvl_indep", scat_all, g_rows0)

        @jax.jit
        def scat_half(g_rows, i):
            # half the rows: is cost linear in row count?
            out = jnp.zeros((int(sizes[-1]), g_rows.shape[1]), jnp.float32)
            out = out.at[idx0[-1][: N // 2]].add(g_rows[: N // 2])
            return g_rows + 1e-12 * out[0].sum()

        timeit("scatter_1lvl_halfrows", scat_half, g_rows0)

        @jax.jit
        def scat_sorted_idx(g_rows, i):
            # marching-order coherent indices, sorted flag
            idx = jnp.sort(idx0[-1])
            out = jnp.zeros((int(sizes[-1]), g_rows.shape[1]), jnp.float32)
            out = out.at[idx].add(g_rows, indices_are_sorted=True)
            return g_rows + 1e-12 * out[0].sum()

        timeit("scatter_1lvl_sortedflag", scat_sorted_idx, g_rows0)


if __name__ == "__main__":
    main(set(sys.argv[1:]))
