"""Instant-NGP radiance field, TPU-native.

Capability match for the reference `NGPradianceField`
(conerf/radiance_fields/ngp.py:66-208): multires hash encoding + 1-hidden
64-wide density MLP -> (log-density, 15-dim geo feature); SH degree-4 view
encoding + 2-hidden 64-wide color MLP with sigmoid output; density
activation trunc_exp(x-1); AABB normalization or unbounded sphere
contraction; out-of-box selector zeroing density.

Architecture notes (not a port):
  * The model is a plain params pytree + pure functions, so the whole field
    composes under jit/vmap/pjit without module machinery.
  * MLPs are bias-free (tcnn FullyFusedMLP parity) and run in bf16 on the
    MXU with f32 accumulation; the hash table stays f32.
  * 64-wide layers are padded to MXU lanes by XLA; keeping hidden=64 and
    batching points in multiples of 128 keeps the systolic array full.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from dregnerf_tpu.ops.activation import density_activation
from dregnerf_tpu.ops.contraction import contract_aabb, contract_unisphere
from dregnerf_tpu.ops.hash_encoding import HashGridConfig, hash_encode, init_hash_table
from dregnerf_tpu.ops.packed_grid import (
    PackedGridConfig,
    init_packed_grid,
    pack_table,
    packed_encode,
)
from dregnerf_tpu.ops.sh import sh_encode

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class NGPConfig:
    """`grid` selects the encoder by type: PackedGridConfig (default — the
    TPU-fast one-gather-per-level layout, ops/packed_grid.py) or
    HashGridConfig (instant-ngp xor-hash reference path)."""

    grid: Any = PackedGridConfig()
    geo_feat_dim: int = 15
    hidden_dim: int = 64
    sh_degree: int = 4
    use_viewdirs: bool = True
    unbounded: bool = False
    compute_dtype: Any = jnp.bfloat16

    @property
    def sh_dim(self) -> int:
        return self.sh_degree**2

    @property
    def color_in_dim(self) -> int:
        return (self.sh_dim if self.use_viewdirs else 0) + self.geo_feat_dim


def _dense_init(key: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    """He-uniform, matching tcnn's default layer init scale."""
    fan_in = shape[0]
    bound = (6.0 / fan_in) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _init_table(key: jax.Array, config: NGPConfig) -> jnp.ndarray:
    if isinstance(config.grid, PackedGridConfig):
        return init_packed_grid(key, config.grid)
    return init_hash_table(key, config.grid)


def _encode(params: Params, u: jnp.ndarray, config: NGPConfig) -> jnp.ndarray:
    if isinstance(config.grid, PackedGridConfig):
        packed = params.get("packed_table")
        if packed is None:
            packed = pack_table(params["table"], config.grid)
        return packed_encode(packed, u, config.grid)
    return hash_encode(params["table"], u, config.grid)


def prepare_params(params: Params, config: NGPConfig) -> Params:
    """Precompute the packed table once (inference loops: avoids re-packing
    inside every lax.map chunk). Training packs inside the jitted step so
    gradients flow to the vertex table."""
    if isinstance(config.grid, PackedGridConfig) and "packed_table" not in params:
        return dict(params, packed_table=pack_table(params["table"], config.grid))
    return params


def init_ngp(key: jax.Array, config: NGPConfig = NGPConfig()) -> Params:
    ks = jax.random.split(key, 6)
    h = config.hidden_dim
    params: Params = {
        "table": _init_table(ks[0], config),
        "density_mlp": [
            _dense_init(ks[1], (config.grid.out_dim, h)),
            _dense_init(ks[2], (h, 1 + config.geo_feat_dim)),
        ],
        "color_mlp": [
            _dense_init(ks[3], (config.color_in_dim, h)),
            _dense_init(ks[4], (h, h)),
            _dense_init(ks[5], (h, 3)),
        ],
    }
    return params


def _mlp(layers, x: jnp.ndarray, compute_dtype) -> jnp.ndarray:
    """Bias-free ReLU MLP; bf16 matmuls with f32 accumulation."""
    h = x.astype(compute_dtype)
    for i, w in enumerate(layers):
        h = jnp.dot(h, w.astype(compute_dtype), preferred_element_type=jnp.float32)
        if i + 1 < len(layers):
            h = jnp.maximum(h, 0.0).astype(compute_dtype)
    return h  # f32 (from preferred_element_type of last matmul)


def query_density(
    params: Params,
    x: jnp.ndarray,
    aabb: jnp.ndarray,
    config: NGPConfig = NGPConfig(),
    return_feat: bool = False,
):
    """Density (post-activation) at world positions x [..., 3].

    Mirrors reference ngp.py:148-176: contraction, in-box selector, hash
    encode, density MLP, trunc_exp(x-1) activation, selector zeroing.
    """
    if config.unbounded:
        u = contract_unisphere(x, aabb)
    else:
        u = contract_aabb(x, aabb)
    selector = jnp.all((u > 0.0) & (u < 1.0), axis=-1)

    enc = _encode(params, u, config)
    out = _mlp(params["density_mlp"], enc, config.compute_dtype)
    raw_density, feat = out[..., :1], out[..., 1:]
    density = density_activation(raw_density) * selector[..., None]
    if return_feat:
        return density, feat
    return density


def query_rgb(
    params: Params,
    viewdirs: jnp.ndarray,
    feat: jnp.ndarray,
    config: NGPConfig = NGPConfig(),
) -> jnp.ndarray:
    """Color from unit view directions + geo features (ngp.py:178-193)."""
    if config.use_viewdirs:
        d = sh_encode(viewdirs, config.sh_degree)
        h = jnp.concatenate([d, feat], axis=-1)
    else:
        h = feat
    rgb = _mlp(params["color_mlp"], h, config.compute_dtype)
    return jax.nn.sigmoid(rgb)


def forward(
    params: Params,
    positions: jnp.ndarray,
    viewdirs: jnp.ndarray,
    aabb: jnp.ndarray,
    config: NGPConfig = NGPConfig(),
):
    """(rgb, density) at sample points — reference ngp.py:195-208."""
    density, feat = query_density(params, positions, aabb, config, return_feat=True)
    rgb = query_rgb(params, viewdirs, feat, config)
    return rgb, density


def config_to_meta(config: NGPConfig) -> dict:
    """JSON-able description — checkpoints must be self-describing
    (SURVEY §2.2: a NeRF is reconstructable from the artifact alone)."""
    grid = config.grid
    return {
        "encoder": "packed" if isinstance(grid, PackedGridConfig) else "xor_hash",
        "grid": dataclasses.asdict(grid),
        "geo_feat_dim": config.geo_feat_dim,
        "hidden_dim": config.hidden_dim,
        "sh_degree": config.sh_degree,
        "use_viewdirs": config.use_viewdirs,
        "unbounded": config.unbounded,
        "bf16": config.compute_dtype == jnp.bfloat16,
    }


def config_from_meta(meta: dict) -> NGPConfig:
    grid_cls = PackedGridConfig if meta.get("encoder", "packed") == "packed" else HashGridConfig
    grid = grid_cls(**meta.get("grid", {}))
    return NGPConfig(
        grid=grid,
        geo_feat_dim=meta.get("geo_feat_dim", 15),
        hidden_dim=meta.get("hidden_dim", 64),
        sh_degree=meta.get("sh_degree", 4),
        use_viewdirs=meta.get("use_viewdirs", True),
        unbounded=meta.get("unbounded", False),
        compute_dtype=jnp.bfloat16 if meta.get("bf16", True) else jnp.float32,
    )
