"""Perf probe 2: split march_quota into parts and race candidate designs.

Run from repo root on the TPU:  python scripts/perf/probe_march_parts.py
One JSON line per stage. Methodology per CLAUDE.md (no DCE, warm cache).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/dregnerf_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from dregnerf_tpu.geometry.cameras import ray_aabb_intersect
from dregnerf_tpu.ops import occupancy
from dregnerf_tpu.ops.contraction import contract

R_RAYS = 4096
S = 1024
K = 64
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
    step = float(3.0 * 3**0.5 / 1024)
    k1, _ = jax.random.split(key)
    origins = jax.random.uniform(k1, (R_RAYS, 3), minval=-3.0, maxval=-2.0)
    viewdirs = -origins / jnp.linalg.norm(origins, axis=-1, keepdims=True)
    regions = jax.jit(occupancy.pack_regions)(binary)
    regions = jax.block_until_ready(regions)

    res = 128

    # ---- part A: lattice math only (t, pos, contract, cell) ----
    @jax.jit
    def lattice(o, d):
        t_lo, t_hi = ray_aabb_intersect(o, d, aabb, 0.0, 1e10)
        ts = t_lo[:, None] + jnp.arange(S, dtype=jnp.float32)[None, :] * step
        t_mid = ts + 0.5 * step
        pos = o[:, None, :] + d[:, None, :] * t_mid[..., None]
        u = contract(pos, aabb, "aabb")
        r_idx = jnp.floor(u * res).astype(jnp.int32)
        alive = (t_mid < t_hi[:, None])
        return r_idx.sum(), alive.sum()

    timeit("A_lattice_math", lattice, origins, viewdirs)

    # ---- shared mask builder (current group=4 region lookup) ----
    def build_mask(o, d, regions, group):
        t_lo, t_hi = ray_aabb_intersect(o, d, aabb, 0.0, 1e10)
        ts = t_lo[:, None] + jnp.arange(S, dtype=jnp.float32)[None, :] * step
        t0 = ts
        t_mid = ts + 0.5 * step
        pos = o[:, None, :] + d[:, None, :] * t_mid[..., None]
        u = contract(pos, aabb, "aabb")
        r_idx = jnp.floor(u * res).astype(jnp.int32)
        in_range = jnp.all((r_idx >= 0) & (r_idx < res), axis=-1)
        cell = jnp.clip(r_idx, 0, res - 1)
        n_groups = S // group
        cell_g = cell.reshape(R_RAYS, n_groups, group, 3)
        leader = cell_g[:, :, 0, :]
        occ = occupancy.query_regions(regions, res, cell_g, leader)
        mask = occ.reshape(R_RAYS, S) & in_range
        alive = (t_mid < t_hi[:, None]) & (t_lo[:, None] < t_hi[:, None])
        return mask & alive, t0

    # ---- part B: mask with group=4 (1M gathers) vs group=16 (262k) ----
    @jax.jit
    def mask_g4(o, d, regions):
        m, _ = build_mask(o, d, regions, 4)
        return m.sum()

    timeit("B_mask_group4", mask_g4, origins, viewdirs, regions)

    @jax.jit
    def mask_g16(o, d, regions):
        m, _ = build_mask(o, d, regions, 16)
        return m.sum()

    timeit("B_mask_group16", mask_g16, origins, viewdirs, regions)

    # fill-rate check: conservative out-of-region=occupied inflates mask
    m4 = jax.jit(lambda o, d, r: build_mask(o, d, r, 4)[0])(origins, viewdirs, regions)
    m16 = jax.jit(lambda o, d, r: build_mask(o, d, r, 16)[0])(origins, viewdirs, regions)
    print(json.dumps({
        "stage": "mask_survivors",
        "g4": int(m4.sum()), "g16": int(m16.sum()),
    }), flush=True)

    # ---- part C: selection strategies on a fixed mask ----
    mask = m4
    t0f = jnp.zeros((R_RAYS, S), jnp.float32)

    @jax.jit
    def sel_searchsorted(mask):
        csum = jnp.cumsum(mask.astype(jnp.int32), axis=1)
        counts = csum[:, -1]
        ranks = jnp.arange(1, K + 1, dtype=jnp.int32)
        src = jax.vmap(jnp.searchsorted)(
            csum, jnp.broadcast_to(ranks[None], (R_RAYS, K))
        )
        valid = ranks[None, :] <= counts[:, None]
        return src.astype(jnp.int32).sum(), valid.sum()

    timeit("C_sel_searchsorted", sel_searchsorted, mask)

    @jax.jit
    def sel_topk(mask):
        keys = jnp.where(mask, -jnp.arange(S, dtype=jnp.int32)[None, :], -(1 << 30))
        vals, _ = jax.lax.top_k(keys, K)
        valid = vals > -(1 << 30)
        src = jnp.where(valid, -vals, 0)
        return src.sum(), valid.sum()

    timeit("C_sel_topk", sel_topk, mask)

    @jax.jit
    def sel_scatter(mask):
        csum = jnp.cumsum(mask.astype(jnp.int32), axis=1)
        slot = jnp.where(mask & (csum <= K), csum - 1, K)  # K = dump slot
        out = jnp.zeros((R_RAYS, K + 1), jnp.int32)
        rows = jnp.broadcast_to(
            jnp.arange(R_RAYS, dtype=jnp.int32)[:, None], (R_RAYS, S)
        )
        steps = jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int32)[None, :], (R_RAYS, S)
        )
        out = out.at[rows.reshape(-1), slot.reshape(-1)].max(
            steps.reshape(-1), mode="drop", unique_indices=False
        )
        valid = jnp.arange(K)[None, :] < csum[:, -1:]
        return out[:, :K].sum(), valid.sum()

    timeit("C_sel_scatter", sel_scatter, mask)

    # ---- D: composite cost, segment ops vs row-wise scan on [R, K] ----
    sig = jax.random.uniform(jax.random.PRNGKey(5), (R_RAYS, K)) * 20
    rgbs = jax.random.uniform(jax.random.PRNGKey(6), (R_RAYS, K, 3))
    valid = jax.random.uniform(jax.random.PRNGKey(7), (R_RAYS, K)) < 0.9

    @jax.jit
    def comp_rows(sig, rgbs, valid):
        delta = step
        alpha = 1.0 - jnp.exp(-sig * delta * valid)
        logt = jnp.cumsum(jnp.log1p(-jnp.minimum(alpha, 0.9999)), axis=1)
        trans = jnp.exp(jnp.concatenate(
            [jnp.zeros((R_RAYS, 1)), logt[:, :-1]], axis=1))
        w = alpha * trans
        rgb = jnp.sum(w[..., None] * rgbs, axis=1)
        opac = jnp.sum(w, axis=1)
        return rgb.sum(), opac.sum()

    timeit("D_composite_rows", comp_rows, sig, rgbs, valid)

    # ---- E: gather rates, f32 vs bf16 wrapped-level tables ----
    n_rows = 1 << 19
    idx = jax.random.randint(jax.random.PRNGKey(8), (BUF,), 0, n_rows)
    tab_f32 = jax.random.normal(jax.random.PRNGKey(9), (n_rows, 16), jnp.float32)
    tab_bf16 = tab_f32.astype(jnp.bfloat16)

    @jax.jit
    def g_f32(tab, idx):
        return tab[idx].sum()

    @jax.jit
    def g_bf16(tab, idx):
        return tab[idx].sum()

    dt = timeit("E_gather_f32_16w", g_f32, tab_f32, idx)
    print(json.dumps({"rows_per_s_f32": round(BUF / dt / 1e6, 1)}), flush=True)
    dt = timeit("E_gather_bf16_16w", g_bf16, tab_bf16, idx)
    print(json.dumps({"rows_per_s_bf16": round(BUF / dt / 1e6, 1)}), flush=True)

    # 16 sequential per-level gathers, f32 vs bf16 (the real encode shape)
    idxs = jax.random.randint(jax.random.PRNGKey(10), (16, BUF), 0, n_rows)

    @jax.jit
    def g16_f32(tab, idxs):
        return sum(tab[idxs[l]].sum() for l in range(16))

    @jax.jit
    def g16_bf16(tab, idxs):
        return sum(tab[idxs[l]].sum() for l in range(16))

    timeit("E_gather16_f32", g16_f32, tab_f32, idxs)
    timeit("E_gather16_bf16", g16_bf16, tab_bf16, idxs)


if __name__ == "__main__":
    main()
