"""Static-shape packed ray marching with occupancy-grid skipping.

TPU-native replacement for nerfacc's CUDA `_C.ray_marching` + the
reference's custom per-ray-t_max fork (conerf/utils/nerfacc_utils.py:84-222).

Design (SURVEY.md §7 step 3): nerfacc emits ragged per-ray sample lists; XLA
needs static shapes. We therefore:

  1. generate a dense [R, S] candidate-sample lattice along each ray
     (S = ceil(aabb diagonal / step) — same fixed step count the reference
     derives from `render_step_size`, train_ngp_nerf.py:88-92);
  2. mask candidates by occupancy-grid lookup (a cheap gather — no MLP);
  3. compact surviving samples into ONE packed buffer of static capacity B
     shared by the whole ray batch (B plays the role of the reference's
     2^18 samples-per-step budget, train_ngp_nerf.py:107-132) via a
     cumsum-scatter. Row-major flattening keeps samples grouped by ray and
     ordered by depth, which the transmittance scan relies on.

The field MLP then runs once on the packed [B, 3] positions — a dense,
MXU-shaped batch — instead of on ragged per-ray lists.

Per-ray `t_max` (march exactly from camera to a query point — the surface
field of sample_grid.py / confidence_loss.py) is the same kernel with the
far plane overridden per ray.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dregnerf_tpu.geometry.cameras import ray_aabb_intersect
from dregnerf_tpu.ops.contraction import contract
from dregnerf_tpu.ops.occupancy import OccupancyGrid, pack_regions, query_regions


class PackedSamples(NamedTuple):
    """A fixed-capacity packed sample buffer.

    Entries beyond the live count have valid=False and ray_id == num_rays
    (an overflow segment dropped by the compositor).
    """

    ray_id: jnp.ndarray  # [B] int32, == num_rays for padding
    t_start: jnp.ndarray  # [B] f32
    t_end: jnp.ndarray  # [B] f32
    valid: jnp.ndarray  # [B] bool
    num_samples: jnp.ndarray  # [] int32 — live entries (host reads for dynamic batching)
    num_rays: int


class RowSamples(NamedTuple):
    """Row-packed samples: ray r owns row r, its first K surviving steps.

    The TPU-fast layout (measured, scripts/perf/probe_march_parts.py): with
    samples row-aligned to rays, sample positions are pure arithmetic
    (origins broadcast over K — no gather), transmittance is a row cumsum
    (no segment rebasing), and composites are row sums (no segment_sum).
    Same live sample set as `compaction="quota"`, selected with one
    lax.top_k instead of a per-row searchsorted (4.4ms vs 33.8ms on v5e at
    [4096, 1024] -> 64).
    """

    t_start: jnp.ndarray  # [R, K] f32
    dt: float  # static step size (t_end = t_start + dt)
    valid: jnp.ndarray  # [R, K] bool, depth-ordered, survivors first
    num_samples: jnp.ndarray  # [] int32 — total live entries


def _candidate_mask(
    origins: jnp.ndarray,
    viewdirs: jnp.ndarray,
    grid: OccupancyGrid,
    aabb: jnp.ndarray,
    contraction: str,
    render_step_size: float,
    max_steps: int,
    near_plane: float,
    far_plane: float,
    t_max: jnp.ndarray | None,
    jitter: jnp.ndarray,
    group_span_cells: float,
    regions: jnp.ndarray | None = None,
):
    """Shared candidate lattice + occupancy mask for all compaction modes.

    Returns (mask [R, S] bool, t_lo [R]). `group_span_cells` bounds how many
    grid cells one region-row gather may serve; the row is gathered at the
    group's MIDPOINT step, so group cells sit within +-span/2 of the
    leader. The packed region window spans [-2, +5] cells around the
    leader's supercell (ops/occupancy.py pack_regions), so for spans up to
    ~4 cells every group cell reads EXACTLY (round 3: the old first-step
    leader made wide spans conservative — false-positive samples that cost
    the capped trainer 0.66 dB). Cells past the margin (possible only
    under nonlinear contraction) still read conservatively occupied.
    """
    num_rays = origins.shape[0]
    t_lo, t_hi = ray_aabb_intersect(origins, viewdirs, aabb, near_plane, far_plane)
    if t_max is not None:
        t_hi = jnp.minimum(t_hi, t_max)

    steps = jnp.arange(max_steps, dtype=jnp.float32)[None, :]  # [1, S]
    ts = t_lo[:, None] + (steps + jitter) * render_step_size  # [R, S]
    t_mid = ts + 0.5 * render_step_size

    pos = origins[:, None, :] + viewdirs[:, None, :] * t_mid[..., None]
    u = contract(pos, aabb, contraction)

    res = grid.resolution
    r_idx = jnp.floor(u * res).astype(jnp.int32)
    in_range = jnp.all((r_idx >= 0) & (r_idx < res), axis=-1)
    cell = jnp.clip(r_idx, 0, res - 1)

    # steps-per-cell under the render_step_size = aabb_diag / max_steps
    # convention (trainer setup_bounding_box; checkpoints carry it). Exact
    # for cubic aabbs: an axis-aligned ray advances one cell every
    # (E/res)/(E*sqrt(3)/max_steps) steps. Callers marching with COARSER
    # steps than the convention get oversized groups whose far cells read
    # conservatively occupied — extra samples, never lost content.
    steps_per_cell = max_steps / (res * 1.7320508)
    # the tight 1.5-cell span keeps the round-1 group clamp of 8 (exact-grid
    # parity even at large max_steps/res ratios); the wide 3.5-span path
    # uses up to 32 — with the midpoint leader below, cells stay within
    # +-span/2 <= 2 of the leader, inside the region margin, so wide
    # groups are exact too (linear aabb case)
    max_group = 8 if group_span_cells <= 1.5 else 32
    group = int(
        np.clip(np.floor(group_span_cells * steps_per_cell) + 1, 1, max_group)
    )
    while max_steps % group != 0:
        group -= 1

    if regions is None:
        regions = pack_regions(grid.binary)
    n_groups = max_steps // group
    cell_g = cell.reshape(num_rays, n_groups, group, 3)
    # midpoint leader: group cells deviate at most +-group/2 steps from it,
    # which fits the [-2, +5]-cell region margin for spans <= ~4 cells
    leader = cell_g[:, :, group // 2, :]
    occupied = query_regions(regions, res, cell_g, leader).reshape(
        num_rays, max_steps
    )
    occupied = occupied & in_range

    alive = (t_mid < t_hi[:, None]) & (t_lo[:, None] < t_hi[:, None])
    return occupied & alive, t_lo


def march_rays_rows(
    origins: jnp.ndarray,
    viewdirs: jnp.ndarray,
    grid: OccupancyGrid,
    aabb: jnp.ndarray,
    contraction: str,
    render_step_size: float,
    k_per_ray: int,
    max_steps: int,
    near_plane: float = 0.0,
    far_plane: float = 1e10,
    t_max: jnp.ndarray | None = None,
    stratified: bool = False,
    key: jax.Array | None = None,
    regions: jnp.ndarray | None = None,
    group_span_cells: float = 3.5,
) -> RowSamples:
    """Row-packed marching: each ray's first `k_per_ray` surviving steps.

    Selection is ONE lax.top_k over the step mask per row (keys = -step for
    survivors), replacing cumsum + searchsorted; survivors come out
    depth-ordered with padding last.
    """
    num_rays = origins.shape[0]
    if stratified:
        assert key is not None, "stratified marching needs a PRNG key"
        jitter = jax.random.uniform(key, (num_rays, 1))
    else:
        jitter = jnp.zeros((num_rays, 1))

    mask, t_lo = _candidate_mask(
        origins, viewdirs, grid, aabb, contraction, render_step_size,
        max_steps, near_plane, far_plane, t_max, jitter, group_span_cells,
        regions,
    )

    big = jnp.int32(1 << 30)
    keys = jnp.where(mask, -jnp.arange(max_steps, dtype=jnp.int32)[None, :], -big)
    vals, _ = jax.lax.top_k(keys, k_per_ray)  # descending => steps ascending
    valid = vals > -big
    src = jnp.where(valid, -vals, 0).astype(jnp.float32)  # [R, K]

    t0 = jnp.where(valid, t_lo[:, None] + (src + jitter) * render_step_size, 0.0)
    return RowSamples(
        t_start=t0,
        dt=render_step_size,
        valid=valid,
        num_samples=jnp.sum(valid.astype(jnp.int32)),
    )


def row_sample_positions(
    rows: RowSamples, origins: jnp.ndarray, viewdirs: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[R, K, 3] world positions + broadcast dirs — pure arithmetic."""
    t_mid = rows.t_start + 0.5 * rows.dt
    pos = origins[:, None, :] + viewdirs[:, None, :] * t_mid[..., None]
    dirs = jnp.broadcast_to(viewdirs[:, None, :], pos.shape)
    return pos, dirs


def march_rays(
    origins: jnp.ndarray,
    viewdirs: jnp.ndarray,
    grid: OccupancyGrid,
    aabb: jnp.ndarray,
    contraction: str,
    render_step_size: float,
    buffer_size: int,
    max_steps: int,
    near_plane: float = 0.0,
    far_plane: float = 1e10,
    t_max: jnp.ndarray | None = None,
    stratified: bool = False,
    key: jax.Array | None = None,
    compaction: str = "compact",
    regions: jnp.ndarray | None = None,
    k_cap: int | None = None,
) -> PackedSamples:
    """March rays through the occupancy grid into a packed sample buffer.

    Args:
      origins, viewdirs: [R, 3].
      aabb: [6] world-space bounds of the (contracted) grid.
      contraction: "aabb" | "un_bounded_sphere".
      render_step_size: world-space step dt.
      buffer_size: static packed capacity B.
      max_steps: static candidate steps per ray S.
      t_max: optional [R] per-ray far override (surface-field marching).
      stratified: jitter the first sample offset per ray (training).
      compaction: "compact" (global gather-by-rank packing, tight buffer
        utilization) or "quota" (per-ray K=B/R slots, no global search —
        faster packing, padding where rays are short).
      regions: optional precomputed pack_regions(grid.binary) — hoist it
        out of chunk loops / reuse across steps between grid updates.
      k_cap: per-ray survivor cap for compaction="capped" (default
        min(256, max_steps, buffer_size)). Callers that chunk rays as
        buffer_size // k_cap make buffer overflow impossible.
    """
    num_rays = origins.shape[0]

    if stratified:
        assert key is not None, "stratified marching needs a PRNG key"
        jitter = jax.random.uniform(key, (num_rays, 1))
    else:
        jitter = jnp.zeros((num_rays, 1))

    # all modes take the wide-group region lookup: with the midpoint
    # leader the 3.5-cell span reads the grid EXACTLY (linear aabb case),
    # at a quarter of the tight-span gather count (probe_step_parts.py:
    # candidate mask 41 ms at span 1.5 / group 8 vs ~13 ms at span 3.5 /
    # group 16 for 16384 x 1024 candidates).
    span = 3.5
    mask, t_lo = _candidate_mask(
        origins, viewdirs, grid, aabb, contraction, render_step_size,
        max_steps, near_plane, far_plane, t_max, jitter, span, regions,
    )
    t0 = t_lo[:, None] + (
        jnp.arange(max_steps, dtype=jnp.float32)[None, :] + jitter
    ) * render_step_size

    if compaction == "capped":
        # --- capped-global compaction: budget semantics without the global
        # searchsorted. Per-row lax.top_k picks each ray's first K_cap
        # survivors (measured 7.7x faster than rank search), rows then pack
        # back-to-back at offsets = exclusive-cumsum of per-row counts —
        # the flat buffer is ray-major/depth-ordered exactly like
        # "compact", every ray keeps its full list up to K_cap, and the
        # total is cut at the buffer like before. Deviation from "compact":
        # rays with > K_cap survivors truncate at K_cap instead of pushing
        # later rays out of the buffer (a better-distributed cut; gated on
        # training quality, scripts/perf/quality_train_marching.py).
        k_cap = min(k_cap or 256, max_steps, buffer_size)
        big = jnp.int32(1 << 30)
        keys = jnp.where(
            mask, -jnp.arange(max_steps, dtype=jnp.int32)[None, :], -big
        )
        vals, _ = jax.lax.top_k(keys, k_cap)  # steps ascending per row
        valid_rk = vals > -big
        steps_rk = jnp.where(valid_rk, -vals, 0)  # [R, K_cap]
        cnt = jnp.sum(valid_rk.astype(jnp.int32), axis=1)  # [R]
        offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt).astype(jnp.int32)]
        )  # [R+1]
        total = offsets[-1]
        ranks = jnp.arange(buffer_size, dtype=jnp.int32)
        # row of flat slot i = (number of row starts <= i) - 1, computed by
        # scattering a mark at every row start and taking a cumsum. This
        # replaces searchsorted(offsets, ranks): the binary search costs
        # ~14 gather passes over 2^18 ranks (~36 ms measured,
        # probe_march_deep.py) while scatter+cumsum is ~2 ms (16K scatter
        # rows + one 2^18 int cumsum). Empty rows put two marks on one
        # slot; the cumsum then counts both, which is exactly "last row
        # whose start <= i".
        marks = jnp.zeros((buffer_size + 1,), jnp.int32)
        marks = marks.at[jnp.minimum(offsets[:-1], buffer_size)].add(1)
        row = jnp.cumsum(marks[:buffer_size]) - 1
        valid = ranks < jnp.minimum(total, buffer_size)
        row_safe = jnp.clip(row, 0, num_rays - 1)
        k = jnp.clip(ranks - offsets[row_safe], 0, k_cap - 1)
        step_idx = steps_rk[row_safe, k].astype(jnp.float32)
        ts0 = jnp.where(
            valid,
            t_lo[row_safe]
            + (step_idx + jitter[row_safe, 0]) * render_step_size,
            0.0,
        )
        ray_id = jnp.where(valid, row_safe, num_rays)
        return PackedSamples(
            ray_id=ray_id,
            t_start=ts0,
            t_end=ts0 + render_step_size,
            valid=valid,
            num_samples=jnp.minimum(total, buffer_size),
            num_rays=num_rays,
        )

    if compaction == "quota":
        # --- per-ray quota: NO global compaction --------------------------
        # Each ray owns K = B/R consecutive slots; its first K surviving
        # candidates are found with a BATCHED per-row searchsorted (binary
        # search within each ray's own 1024-entry cumsum — cache-local,
        # unlike the global 4.2M-entry search). Rays with more than K
        # samples lose their tail (per-ray truncation, fairer than the
        # global buffer cut); rays with fewer leave padding.
        k_quota = max(buffer_size // num_rays, 1)
        csum_rows = jnp.cumsum(mask.astype(jnp.int32), axis=1)  # [R, S]
        counts = csum_rows[:, -1]
        ranks = jnp.arange(1, k_quota + 1, dtype=jnp.int32)  # [K]
        src_s = jax.vmap(jnp.searchsorted)(
            csum_rows, jnp.broadcast_to(ranks[None], (num_rays, k_quota))
        ).astype(jnp.int32)  # [R, K] step index of the k-th survivor
        valid2 = ranks[None, :] <= counts[:, None]  # [R, K]
        src_s = jnp.minimum(src_s, max_steps - 1)
        ts0 = jnp.where(valid2, jnp.take_along_axis(t0, src_s, axis=1), 0.0)
        rid = jnp.where(
            valid2, jnp.arange(num_rays, dtype=jnp.int32)[:, None], num_rays
        )
        pad = buffer_size - num_rays * k_quota
        ray_id = jnp.concatenate(
            [rid.reshape(-1), jnp.full((pad,), num_rays, jnp.int32)]
        )
        ts0 = jnp.concatenate([ts0.reshape(-1), jnp.zeros((pad,), jnp.float32)])
        valid = ray_id < num_rays
        num_samples = jnp.sum(jnp.minimum(counts, k_quota)).astype(jnp.int32)
    else:
        # --- global compaction: gather-by-rank (no scatter) ---------------
        # Each packed slot i holds the (i+1)-th surviving candidate; its
        # source index is searchsorted(cumsum(mask), i+1). Replaces a
        # scatter of R*S rows (mostly dropped) with a gather of B rows.
        flat_mask = mask.reshape(-1)
        csum = jnp.cumsum(flat_mask.astype(jnp.int32))
        num_samples = csum[-1]

        ranks = jnp.arange(1, buffer_size + 1, dtype=jnp.int32)
        src = jnp.searchsorted(csum, ranks).astype(jnp.int32)
        valid = ranks <= num_samples
        src = jnp.minimum(src, flat_mask.shape[0] - 1)

        ray_id = jnp.where(
            valid, (src // max_steps).astype(jnp.int32), num_rays
        )
        ts0 = jnp.where(valid, t0.reshape(-1)[src], 0.0)

    return PackedSamples(
        ray_id=ray_id,
        t_start=ts0,
        t_end=ts0 + render_step_size,
        valid=valid,
        num_samples=jnp.minimum(num_samples, buffer_size),
        num_rays=num_rays,
    )


def sample_positions(
    packed: PackedSamples, origins: jnp.ndarray, viewdirs: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Packed sample world positions + their ray directions: ([B, 3], [B, 3])."""
    safe_ray = jnp.minimum(packed.ray_id, packed.num_rays - 1)
    o = origins[safe_ray]
    d = viewdirs[safe_ray]
    t_mid = (packed.t_start + packed.t_end) * 0.5
    return o + d * t_mid[:, None], d
