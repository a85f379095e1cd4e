"""Radiance-field registry: a uniform interface over the field families.

The renderer/trainers drive any field exposing
  init(key, cfg) / query_density(params, x, aabb, cfg, return_feat)
  / query_rgb(params, dirs, feat, cfg) / forward(params, pos, dirs, aabb, cfg).

Families (reference conerf/radiance_fields):
  * "ngp"     — packed-grid / hash Instant-NGP (models/ngp.py)
  * "vanilla" — 8x256 frequency-encoded MLP (models/mlp_nerf.py)
  * "dnerf"   — vanilla + time-conditioned warp (timestamps via cfg/t)
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from dregnerf_tpu.models import mlp_nerf, ngp


class _NGPField:
    Config = ngp.NGPConfig
    init = staticmethod(ngp.init_ngp)
    query_density = staticmethod(ngp.query_density)
    query_rgb = staticmethod(ngp.query_rgb)
    forward = staticmethod(ngp.forward)
    prepare_params = staticmethod(ngp.prepare_params)


class _VanillaField:
    """Adapter: aabb is used only for the out-of-box selector (the MLP
    itself is unbounded); signature matches the NGP field."""

    Config = mlp_nerf.VanillaNeRFConfig

    @staticmethod
    def init(key: jax.Array, cfg) -> Any:
        return mlp_nerf.init_vanilla_nerf(key, cfg)

    @staticmethod
    def query_density(params, x, aabb, cfg, return_feat: bool = False, t=None):
        selector = jnp.all((x > aabb[:3]) & (x < aabb[3:]), axis=-1)
        out = mlp_nerf.query_density(params, x, cfg, t=t, return_feat=return_feat)
        if return_feat:
            sigma, feat = out
            return sigma * selector[..., None], feat
        return out * selector[..., None]

    @staticmethod
    def query_rgb(params, dirs, feat, cfg):
        return mlp_nerf.query_rgb(params, dirs, feat, cfg)

    @staticmethod
    def forward(params, positions, viewdirs, aabb, cfg, t=None):
        sigma, feat = _VanillaField.query_density(
            params, positions, aabb, cfg, return_feat=True, t=t
        )
        rgb = mlp_nerf.query_rgb(params, viewdirs, feat, cfg)
        return rgb, sigma

    @staticmethod
    def prepare_params(params, cfg):
        return params


class _DNeRFField(_VanillaField):
    @staticmethod
    def default_config():
        return mlp_nerf.VanillaNeRFConfig(warp=True)


FIELD_REGISTRY = {
    "ngp": _NGPField,
    "vanilla": _VanillaField,
    "dnerf": _DNeRFField,
}


def get_field(name: str):
    if name not in FIELD_REGISTRY:
        raise ValueError(f"unknown field family {name!r}; have {list(FIELD_REGISTRY)}")
    return FIELD_REGISTRY[name]
