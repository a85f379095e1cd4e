"""Vanilla NeRF and D-NeRF radiance fields (frequency-encoded MLPs).

Capability parity with conerf/radiance_fields/mlp.py:
  * `VanillaNeRFRadianceField` (mlp.py:206): 8x256 trunk with a skip at
    every 4th layer, sigma head + bottleneck->(dir-conditioned) 1x128 color
    head; positional encoding 10 levels for xyz, 4 for directions.
  * `DNeRFRadianceField` (mlp.py:248): adds a time-conditioned warp MLP
    that deforms points before the canonical field (used by the dnerf
    dataset, conerf/datasets/dnerf_synthetic.py).

TPU notes: widths 256/128 are MXU-aligned; everything is a pure-params
pytree like models/ngp.py so the same renderer drives either field.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def posenc(x: jnp.ndarray, num_freqs: int, include_input: bool = True) -> jnp.ndarray:
    """NeRF sinusoidal positional encoding with frequencies 2^0 .. 2^(L-1)."""
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=jnp.float32)
    xs = x[..., None, :] * freqs[:, None]  # [..., L, D]
    enc = jnp.concatenate(
        [jnp.sin(xs), jnp.cos(xs)], axis=-1
    ).reshape(*x.shape[:-1], -1)
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


@dataclasses.dataclass(frozen=True)
class VanillaNeRFConfig:
    net_depth: int = 8
    net_width: int = 256
    skip_layer: int = 4
    net_depth_condition: int = 1
    net_width_condition: int = 128
    posenc_xyz: int = 10
    posenc_dir: int = 4
    warp: bool = False  # D-NeRF time-conditioned deformation
    warp_depth: int = 4
    warp_width: int = 64
    posenc_time: int = 4
    compute_dtype: Any = jnp.float32

    @property
    def xyz_dim(self) -> int:
        return 3 + 6 * self.posenc_xyz

    @property
    def dir_dim(self) -> int:
        return 3 + 6 * self.posenc_dir

    @property
    def time_dim(self) -> int:
        return 1 + 2 * self.posenc_time


def _dense_init(key, shape):
    bound = (6.0 / shape[0]) ** 0.5
    return {
        "w": jax.random.uniform(key, shape, jnp.float32, -bound, bound),
        "b": jnp.zeros(shape[1], jnp.float32),
    }


def _apply_dense(p, x, dtype):
    y = jnp.dot(
        x.astype(dtype), p["w"].astype(dtype), preferred_element_type=jnp.float32
    )
    return y + p["b"]


def init_vanilla_nerf(key: jax.Array, config: VanillaNeRFConfig = VanillaNeRFConfig()) -> Params:
    ks = iter(jax.random.split(key, 64))
    params: Params = {"trunk": []}
    in_dim = config.xyz_dim
    for i in range(config.net_depth):
        params["trunk"].append(_dense_init(next(ks), (in_dim, config.net_width)))
        in_dim = config.net_width
        if config.skip_layer and (i + 1) % config.skip_layer == 0 and i + 1 < config.net_depth:
            in_dim += config.xyz_dim
    params["sigma"] = _dense_init(next(ks), (config.net_width, 1))
    params["bottleneck"] = _dense_init(next(ks), (config.net_width, config.net_width))
    params["color"] = []
    c_in = config.net_width + config.dir_dim
    for _ in range(config.net_depth_condition):
        params["color"].append(_dense_init(next(ks), (c_in, config.net_width_condition)))
        c_in = config.net_width_condition
    params["rgb"] = _dense_init(next(ks), (c_in, 3))
    if config.warp:
        params["warp"] = []
        w_in = config.xyz_dim + config.time_dim
        for _ in range(config.warp_depth):
            params["warp"].append(_dense_init(next(ks), (w_in, config.warp_width)))
            w_in = config.warp_width
        params["warp_out"] = _dense_init(next(ks), (w_in, 3))
    return params


def _trunk(params: Params, enc: jnp.ndarray, config: VanillaNeRFConfig) -> jnp.ndarray:
    h = enc
    dtype = config.compute_dtype
    for i, layer in enumerate(params["trunk"]):
        h = jax.nn.relu(_apply_dense(layer, h, dtype))
        if config.skip_layer and (i + 1) % config.skip_layer == 0 and i + 1 < config.net_depth:
            h = jnp.concatenate([h, enc], axis=-1)
    return h


def warp_points(
    params: Params, x: jnp.ndarray, t: jnp.ndarray, config: VanillaNeRFConfig
) -> jnp.ndarray:
    """D-NeRF deformation: x_canonical = x + MLP(enc(x), enc(t))."""
    enc = jnp.concatenate(
        [posenc(x, config.posenc_xyz), posenc(t, config.posenc_time)], axis=-1
    )
    h = enc
    for layer in params["warp"]:
        h = jax.nn.relu(_apply_dense(layer, h, config.compute_dtype))
    return x + _apply_dense(params["warp_out"], h, config.compute_dtype)


def query_density(
    params: Params,
    x: jnp.ndarray,
    config: VanillaNeRFConfig = VanillaNeRFConfig(),
    t: Optional[jnp.ndarray] = None,
    return_feat: bool = False,
):
    if config.warp and t is not None:
        x = warp_points(params, x, t, config)
    enc = posenc(x, config.posenc_xyz)
    h = _trunk(params, enc, config)
    sigma = jax.nn.softplus(_apply_dense(params["sigma"], h, config.compute_dtype))
    if return_feat:
        return sigma, h
    return sigma


def query_rgb(
    params: Params,
    viewdirs: jnp.ndarray,
    feat: jnp.ndarray,
    config: VanillaNeRFConfig = VanillaNeRFConfig(),
) -> jnp.ndarray:
    b = _apply_dense(params["bottleneck"], feat, config.compute_dtype)
    h = jnp.concatenate([b, posenc(viewdirs, config.posenc_dir)], axis=-1)
    for layer in params["color"]:
        h = jax.nn.relu(_apply_dense(layer, h, config.compute_dtype))
    return jax.nn.sigmoid(_apply_dense(params["rgb"], h, config.compute_dtype))


def forward(
    params: Params,
    positions: jnp.ndarray,
    viewdirs: jnp.ndarray,
    config: VanillaNeRFConfig = VanillaNeRFConfig(),
    t: Optional[jnp.ndarray] = None,
):
    sigma, feat = query_density(params, positions, config, t=t, return_feat=True)
    rgb = query_rgb(params, viewdirs, feat, config)
    return rgb, sigma
