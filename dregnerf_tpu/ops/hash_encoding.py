"""Multiresolution hash-grid encoding (Instant-NGP), XLA-native.

Replaces tiny-cuda-nn's `HashGrid` encoder (reference conerf/
radiance_fields/ngp.py:92-104: 16 levels, 2 features/level, 2^19 table,
base resolution 16, per-level scale 1.4472692012786865).

TPU-first design decisions:
  * All L levels are evaluated in ONE vectorized pass: positions are scaled
    per-level, the 8 corner indices for every (point, level) pair are
    computed as a [N, L, 8] index tensor, and a single flat gather pulls
    [N, L, 8, F] features from a [L*T, F] table. XLA turns the transpose
    into one fused scatter-add for the backward pass.
  * Levels whose dense vertex grid fits in the table use collision-free
    dense indexing, larger levels use the instant-ngp spatial hash — the
    dense/hash decision is static per level, so there is no data-dependent
    control flow under jit.
  * The table is stored f32 (optimizer master); interpolation happens in
    f32 and the output may be cast to bf16 by the caller before hitting the
    MXU MLPs.

The hash function and grid-vertex convention follow instant-ngp:
``scale_l = b^l * N0 - 1``; ``pos = x * scale + 0.5``; corner hash
``x*1 xor y*2654435761 xor z*805459861 mod T``.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)

# The 8 corners of a unit cube, [8, 3].
_CORNERS = np.stack(
    np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"), axis=-1
).reshape(8, 3).astype(np.int32)


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    n_levels: int = 16
    n_features: int = 2
    log2_table_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 1.4472692012786865

    @property
    def table_size(self) -> int:
        return 1 << self.log2_table_size

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features

    def level_scales(self) -> np.ndarray:
        """Per-level grid scale (number of cells along an axis)."""
        return np.array(
            [
                self.base_resolution * self.per_level_scale**lvl - 1.0
                for lvl in range(self.n_levels)
            ],
            dtype=np.float32,
        )

    def level_resolutions(self) -> np.ndarray:
        """Per-level vertex count along an axis."""
        return (np.ceil(self.level_scales()) + 1.0).astype(np.int64)

    def level_is_dense(self) -> np.ndarray:
        """True for levels where the dense grid fits in the hash table."""
        res = self.level_resolutions()
        return (res**3) <= self.table_size


def init_hash_table(key: jax.Array, config: HashGridConfig) -> jnp.ndarray:
    """[L*T, F] table initialized uniform(-1e-4, 1e-4) (instant-ngp default)."""
    shape = (config.n_levels * config.table_size, config.n_features)
    return jax.random.uniform(key, shape, jnp.float32, -1e-4, 1e-4)


def _corner_indices(config: HashGridConfig, pos_grid: jnp.ndarray) -> jnp.ndarray:
    """Map integer corner coords [N, L, 8, 3] -> table rows [N, L, 8] (flat,
    offset by level)."""
    T = config.table_size
    res = jnp.asarray(config.level_resolutions().astype(np.int64), dtype=jnp.uint32)
    dense = jnp.asarray(config.level_is_dense())  # [L] static bools

    coords = pos_grid.astype(jnp.uint32)  # [N, L, 8, 3]
    # dense index: x + y*res + z*res^2
    r = res[None, :, None]  # [1, L, 1]
    dense_idx = coords[..., 0] + coords[..., 1] * r + coords[..., 2] * (r * r)
    # spatial hash
    primes = jnp.asarray(_PRIMES)
    hashed = (
        coords[..., 0] * primes[0]
        ^ coords[..., 1] * primes[1]
        ^ coords[..., 2] * primes[2]
    ) & jnp.uint32(T - 1)
    idx = jnp.where(dense[None, :, None], dense_idx, hashed)
    level_offset = (
        jnp.arange(config.n_levels, dtype=jnp.uint32)[None, :, None] * jnp.uint32(T)
    )
    return (idx + level_offset).astype(jnp.int32)


def hash_encode(
    table: jnp.ndarray, x: jnp.ndarray, config: HashGridConfig
) -> jnp.ndarray:
    """Encode positions.

    Args:
      table: [L*T, F] feature table.
      x: [..., 3] positions in [0, 1]^3 (out-of-range values are clamped by
        the caller's selector; encoding itself clamps corner coords).

    Returns:
      [..., L*F] features (f32).
    """
    batch_shape = x.shape[:-1]
    x = x.reshape(-1, 3).astype(jnp.float32)

    scales = jnp.asarray(config.level_scales())  # [L]
    pos = x[:, None, :] * scales[None, :, None] + 0.5  # [N, L, 3]
    pos_floor = jnp.floor(pos)
    frac = pos - pos_floor  # [N, L, 3]

    corners = jnp.asarray(_CORNERS)  # [8, 3]
    pos_grid = pos_floor[:, :, None, :].astype(jnp.int32) + corners[None, None]  # [N, L, 8, 3]
    # clamp to valid vertex range per level
    res = jnp.asarray(config.level_resolutions().astype(np.int64), dtype=jnp.int32)
    pos_grid = jnp.clip(pos_grid, 0, (res[None, :, None, None] - 1))

    idx = _corner_indices(config, pos_grid)  # [N, L, 8]
    feats = table[idx]  # [N, L, 8, F]

    # trilinear weights: prod over dims of (corner ? frac : 1-frac)
    w = jnp.where(
        corners[None, None].astype(bool), frac[:, :, None, :], 1.0 - frac[:, :, None, :]
    ).prod(axis=-1)  # [N, L, 8]

    out = jnp.einsum("nlc,nlcf->nlf", w, feats)  # [N, L, F]
    return out.reshape(*batch_shape, config.out_dim)


def hash_table_param_count(config: HashGridConfig) -> int:
    return config.n_levels * config.table_size * config.n_features


def hash_table_bytes(config: HashGridConfig, dtype_bytes: int = 4) -> int:
    return hash_table_param_count(config) * dtype_bytes


def hash_encode_flops(n_points: int, config: HashGridConfig) -> int:
    """Rough cost model (for pl.CostEstimate when the Pallas path lands)."""
    return n_points * config.n_levels * (8 * config.n_features * 2 + 24)
