"""Binary occupancy grid with EMA updates (nerfacc OccupancyGrid parity).

TPU-native replacement for nerfacc 0.3.5's CUDA `OccupancyGrid`
(reference usage: train_ngp_nerf.py:163-169, :293 `every_n_step`;
conerf/register/sample_grid.py:34-56 `occ_eval_fn`):

  * state is a pure pytree: f32 EMA densities [R^3] + bool binary [R, R, R];
  * periodic update queries the field's density at jittered cell centers —
    a dense batched MLP eval, which the MXU loves — then EMA-max and a
    mean-clamped threshold, exactly nerfacc's `ema_decay=0.95`,
    `occ_thre` semantics;
  * cell sampling uses static shapes: uniform cells + occupied cells drawn
    by categorical over the binary mask (nerfacc's warmup phase queries all
    cells; we mirror that with `warmup` flag chosen by the host on step
    count, which only toggles between two pre-compiled branches).

The grid lives in the *contracted* coordinate space [0, 1]^3 so one grid
serves both AABB and unbounded scenes (nerfacc ContractionType parity).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class OccupancyGrid(NamedTuple):
    occs: jnp.ndarray  # [R^3] f32 EMA density
    binary: jnp.ndarray  # [R, R, R] bool

    @property
    def resolution(self) -> int:
        # static (shape-derived) so it never becomes a traced value under jit
        return self.binary.shape[0]

    @property
    def num_cells(self) -> int:
        return self.resolution**3


def init_grid(resolution: int = 128) -> OccupancyGrid:
    return OccupancyGrid(
        occs=jnp.zeros((resolution**3,), jnp.float32),
        binary=jnp.zeros((resolution,) * 3, dtype=bool),
    )


def cell_centers(indices: jnp.ndarray, resolution: int) -> jnp.ndarray:
    """Flat cell indices -> contracted-space cell centers in [0,1]^3."""
    r = resolution
    iz = indices % r
    iy = (indices // r) % r
    ix = indices // (r * r)
    grid = jnp.stack([ix, iy, iz], axis=-1).astype(jnp.float32)
    return (grid + 0.5) / r


def jitter_cells(key: jax.Array, indices: jnp.ndarray, resolution: int) -> jnp.ndarray:
    """Uniform random position inside each cell (contracted space)."""
    centers = cell_centers(indices, resolution)
    noise = jax.random.uniform(key, centers.shape, minval=-0.5, maxval=0.5)
    return centers + noise / resolution


def pack_regions(binary: jnp.ndarray) -> jnp.ndarray:
    """Pack occupancy into per-supercell 8^3-bit region masks.

    For the marcher: a gather fetches one [16]-u32 row = the occupancy of
    the 8x8x8 cell region [sc*4-2, sc*4+6)^3 around supercell sc, so one
    gather serves a whole GROUP of consecutive ray steps (TPU gather cost
    is per-row — SURVEY/bench: ~2e8 rows/s ceiling — so fewer, wider rows
    win). Bit order: bit = lx*64 + ly*8 + lz, packed little-endian into
    16 u32 words.

    binary: [R, R, R] bool with R % 4 == 0. Returns [S, S, S, 16] u32,
    S = R // 4. Cheap (rolls + reshapes), recomputed in-graph per call
    site so it can never go stale against `binary`.
    """
    r = binary.shape[0]
    assert r % 4 == 0, f"occupancy resolution must be divisible by 4, got {r}"
    s = r // 4
    blocks = binary.reshape(s, 4, s, 4, s, 4).transpose(0, 2, 4, 1, 3, 5)
    # widen each axis from the 4-cell block to the 8-cell margin window
    # [-2, +6): concat (roll +1, self, roll -1) along the block axis then
    # slice cells [2:10) of the 12-cell strip.
    def widen(b, block_axis, cell_axis):
        prev = jnp.roll(b, 1, axis=block_axis)
        nxt = jnp.roll(b, -1, axis=block_axis)
        strip = jnp.concatenate([prev, b, nxt], axis=cell_axis)
        idx = [slice(None)] * b.ndim
        idx[cell_axis] = slice(2, 10)
        return strip[tuple(idx)]

    blocks = widen(blocks, 0, 3)
    blocks = widen(blocks, 1, 4)
    blocks = widen(blocks, 2, 5)  # [S, S, S, 8, 8, 8]
    bits = blocks.reshape(s, s, s, 16, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint32)  # [S, S, S, 16]


def query_regions(
    regions: jnp.ndarray,
    resolution: int,
    cell: jnp.ndarray,
    leader_cell: jnp.ndarray,
) -> jnp.ndarray:
    """Occupancy of integer cells using region rows gathered at the GROUP
    leader's supercell — ONE row gather per group.

    cell: [..., G, 3] int32 (G = group size); leader_cell: [..., 3] int32
    (no group dim). The row is gathered once per leader and broadcast over
    the group. Cells outside the leader's region read as OCCUPIED
    (conservative: occupancy only accelerates skipping; false positives
    cost compute, false negatives lose content)."""
    sc = leader_cell >> 2
    s = resolution // 4
    sc = jnp.clip(sc, 0, s - 1)
    row = regions[sc[..., 0], sc[..., 1], sc[..., 2]]  # [..., 16] u32
    row = row[..., None, :]  # broadcast over the group dim

    local = cell - (sc[..., None, :] * 4 - 2)  # in [0, 8) within the region
    in_region = jnp.all((local >= 0) & (local < 8), axis=-1)
    lc = jnp.clip(local, 0, 7)
    bit = lc[..., 0] * 64 + lc[..., 1] * 8 + lc[..., 2]
    word = (bit >> 5).astype(jnp.int32)  # [0, 16)
    pos = (bit & 31).astype(jnp.uint32)
    wordval = jnp.sum(
        jnp.where(
            jnp.arange(16, dtype=jnp.int32) == word[..., None], row, jnp.uint32(0)
        ),
        axis=-1,
        dtype=jnp.uint32,
    )
    occ = ((wordval >> pos) & jnp.uint32(1)).astype(bool)
    return jnp.where(in_region, occ, True)


def query_binary(grid: OccupancyGrid, u: jnp.ndarray) -> jnp.ndarray:
    """Occupancy lookup at contracted positions u [..., 3] in [0,1]^3.

    Out-of-range positions read as unoccupied.
    """
    r = grid.resolution
    idx = jnp.floor(u * r).astype(jnp.int32)
    in_range = jnp.all((idx >= 0) & (idx < r), axis=-1)
    idx = jnp.clip(idx, 0, r - 1)
    occ = grid.binary[idx[..., 0], idx[..., 1], idx[..., 2]]
    return occ & in_range


def update_grid(
    grid: OccupancyGrid,
    key: jax.Array,
    occ_eval_fn: Callable[[jnp.ndarray], jnp.ndarray],
    warmup: bool,
    ema_decay: float = 0.95,
    occ_threshold: float = 0.01,
    n_samples: int | None = None,
) -> OccupancyGrid:
    """One EMA update step.

    Args:
      occ_eval_fn: contracted positions [M, 3] -> occupancy values [M]
        (the reference evaluates density * render_step_size,
        sample_grid.py:34-56).
      warmup: if True, evaluate every cell (nerfacc's first-256-steps
        behavior); else sample n_samples uniform + n_samples occupied cells.
    """
    r = grid.resolution
    n_cells = grid.num_cells
    if n_samples is None:
        n_samples = n_cells // 4

    k_sel, k_occ, k_j1, k_j2 = jax.random.split(key, 4)

    if warmup:
        indices = jnp.arange(n_cells)
        x = jitter_cells(k_j1, indices, r)
        vals = occ_eval_fn(x)
    else:
        uniform_idx = jax.random.randint(k_sel, (n_samples,), 0, n_cells)
        # occupied resample: uniform over occupied cells via
        # cumsum + searchsorted (exact). NOT jax.random.categorical: that
        # lowers to O(n_samples * n_cells) gumbel draws — 2.7e11 elements
        # at 128^3 / 2^17 samples, ~7.4 s per update through the v5e
        # (round-3 probe: the occupancy update was 90% of trainer
        # wall-clock). Falls back to uniform cells when none occupied.
        occ_mask = grid.binary.reshape(-1)
        csum = jnp.cumsum(occ_mask.astype(jnp.int32))
        total = csum[-1]
        u = jax.random.randint(
            k_occ, (n_samples,), 0, jnp.maximum(total, 1)
        )
        occ_idx = jnp.searchsorted(csum, u + 1).astype(uniform_idx.dtype)
        occ_idx = jnp.where(
            total > 0, jnp.minimum(occ_idx, n_cells - 1), uniform_idx
        )
        indices = jnp.concatenate([uniform_idx, occ_idx])
        x = jitter_cells(k_j1, indices, r)
        vals = occ_eval_fn(x)

    vals = vals.reshape(-1)
    # EMA-max update at touched cells (scatter-max against decayed state)
    decayed = grid.occs * ema_decay
    occs = decayed.at[indices].max(vals)

    thresh = jnp.minimum(jnp.mean(occs), occ_threshold)
    binary = (occs > thresh).reshape(r, r, r)
    return OccupancyGrid(occs=occs, binary=binary)
