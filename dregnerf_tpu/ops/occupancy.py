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
        # occupied resample: categorical over binary mask (uniform over
        # occupied cells; falls back to uniform-over-all when none occupied)
        occ_mask = grid.binary.reshape(-1)
        logits = jnp.where(occ_mask, 0.0, -1e9)
        logits = jnp.where(jnp.any(occ_mask), logits, jnp.zeros_like(logits))
        occ_idx = jax.random.categorical(k_occ, logits, shape=(n_samples,))
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
