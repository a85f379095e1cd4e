"""Static-shape hierarchical voxel subsampling (MinkowskiEngine replacement).

Parity with conerf/register/grid_downsample.py:6-94: repeatedly voxel-
quantize a point cloud with doubling cell size, averaging xyz+features per
cell (UNWEIGHTED_AVERAGE), stopping at the first level whose total point
count drops to <= 2*max_points. That caps the registration transformer's
sequence length.

TPU-first design: the reference's output size is data-dependent; here every
level keeps a fixed capacity N with a validity mask:

  1. hash each point's integer cell coords (spatial hash, uint32);
     invalid points get a sentinel key that sorts last;
  2. argsort by key; group boundaries = key-change OR cell-coord-change
     (the coord check splits rare hash collisions instead of merging
     far-apart cells — under-merging is harmless, false merging is not);
  3. group rank via cumsum -> segment_mean of xyz/features at capacity N.

The level-selection ("stop when small enough") is data-dependent control
flow; under jit we compute ALL levels (they are cheap sort+segment passes)
and select the first qualifying one with jnp.take — no recompilation, no
ragged shapes.

Gradients flow through segment_mean back to the FPN features, exactly as
they do through MinkowskiEngine's averaging in the reference.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_P0, _P1, _P2 = 73856093, 19349663, 83492791
_SENTINEL = jnp.uint32(0xFFFFFFFF)


class PointSet(NamedTuple):
    xyz: jnp.ndarray  # [N, 3]
    feats: jnp.ndarray  # [N, F]
    valid: jnp.ndarray  # [N] bool — valid entries come first
    count: jnp.ndarray  # [] int32


def voxel_downsample(points: PointSet, cell_size: float) -> PointSet:
    """One quantize-and-average level at fixed capacity."""
    n = points.xyz.shape[0]
    coords = jnp.floor(points.xyz / cell_size).astype(jnp.int32)
    ucoords = coords.astype(jnp.uint32)
    h = (
        ucoords[:, 0] * jnp.uint32(_P0)
        ^ ucoords[:, 1] * jnp.uint32(_P1)
        ^ ucoords[:, 2] * jnp.uint32(_P2)
    ) & jnp.uint32(0x7FFFFFFF)
    key = jnp.where(points.valid, h, _SENTINEL)

    order = jnp.argsort(key)
    key_s = key[order]
    coords_s = coords[order]
    valid_s = points.valid[order]
    xyz_s = points.xyz[order]
    feats_s = points.feats[order]

    prev_key = jnp.concatenate([key_s[:1] ^ jnp.uint32(1), key_s[:-1]])
    prev_coords = jnp.concatenate([coords_s[:1] + 1, coords_s[:-1]])
    new_group = (key_s != prev_key) | jnp.any(coords_s != prev_coords, axis=-1)
    rank = jnp.cumsum(new_group.astype(jnp.int32)) - 1  # [N]

    ones = valid_s.astype(jnp.float32)
    denom = jax.ops.segment_sum(ones, rank, num_segments=n)
    denom = jnp.maximum(denom, 1.0)
    mean_xyz = jax.ops.segment_sum(xyz_s * ones[:, None], rank, num_segments=n) / denom[:, None]
    mean_feats = (
        jax.ops.segment_sum(feats_s * ones[:, None], rank, num_segments=n)
        / denom[:, None]
    )

    n_groups = jnp.max(jnp.where(valid_s, rank + 1, 0))
    out_valid = jnp.arange(n) < n_groups
    return PointSet(
        xyz=mean_xyz * out_valid[:, None],
        feats=mean_feats * out_valid[:, None],
        valid=out_valid,
        count=n_groups.astype(jnp.int32),
    )


def hierarchical_subsample(
    src: PointSet,
    tgt: PointSet,
    num_levels: int = 6,
    init_cell: float = 0.05,
    max_points: int = 1500,
) -> tuple[PointSet, PointSet, jnp.ndarray]:
    """Run `num_levels` doubling-cell levels on both clouds; return the
    first level whose combined count <= 2*max_points (reference
    grid_downsample.py:70-92 semantics; level 0 always applied).

    Returns (src_out, tgt_out, level_index).
    """
    src_levels, tgt_levels = [], []
    cell = init_cell
    s, t = src, tgt
    for _ in range(num_levels):
        s = voxel_downsample(s, cell)
        t = voxel_downsample(t, cell)
        src_levels.append(s)
        tgt_levels.append(t)
        cell *= 2.0

    counts = jnp.stack([sl.count + tl.count for sl, tl in zip(src_levels, tgt_levels)])
    ok = counts <= 2 * max_points
    # first qualifying level, else the last
    level = jnp.where(jnp.any(ok), jnp.argmax(ok), num_levels - 1)

    def stack(levels):
        return PointSet(
            xyz=jnp.stack([l.xyz for l in levels]),
            feats=jnp.stack([l.feats for l in levels]),
            valid=jnp.stack([l.valid for l in levels]),
            count=jnp.stack([l.count for l in levels]),
        )

    s_all, t_all = stack(src_levels), stack(tgt_levels)
    pick = lambda ps: PointSet(
        xyz=ps.xyz[level], feats=ps.feats[level],
        valid=ps.valid[level], count=ps.count[level],
    )
    return pick(s_all), pick(t_all), level


def masked_select_strided(
    flat_valid: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Spatially-uniform static-shape mask select: indices of ~k True
    entries spread EVENLY across the True set (every stride-th by mask
    rank, stride = ceil(count/k)), plus a validity mask.

    `masked_select_first_k` keeps the first k True entries in flat index
    order — for a voxel grid in ix-major order with count >> k that is a
    low-x SLAB of the occupied set, and the two registration clouds (in
    different world frames) end up covering DIFFERENT object regions.
    Measured on the round-4 fleet blocks (50-76k occupied vs k=16384) this
    cut token coverage to ~25% slabs per side. With count <= k this is
    identical to first-k.
    """
    count = jnp.sum(flat_valid.astype(jnp.int32))
    stride = jnp.maximum((count + k - 1) // k, 1)
    rank = jnp.cumsum(flat_valid.astype(jnp.int32)) - 1
    thinned = flat_valid & (rank % stride == 0)
    return masked_select_first_k(thinned, k)


def masked_select_first_k(
    flat_valid: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Static-shape 'nonzero': indices of the first k True entries of a flat
    bool mask (ascending index order), plus a validity mask for the k slots.

    Replaces the data-dependent `torch.nonzero` mask-select of
    nerf_regtr.py:144-147 — argsort of ~mask is stable, so True entries
    come first in index order.
    """
    order = jnp.argsort(~flat_valid, stable=True)
    if k > order.shape[0]:
        # more slots than mask entries: pad (padded slots read index 0 and
        # are marked invalid below — count can never reach them)
        order = jnp.pad(order, (0, k - order.shape[0]))
    idx = order[:k]
    count = jnp.sum(flat_valid.astype(jnp.int32))
    valid = jnp.arange(k) < count
    return idx, valid
