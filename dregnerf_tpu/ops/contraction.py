"""Scene contractions: AABB normalization and unbounded sphere contraction.

Forward maps match the reference (conerf/radiance_fields/ngp.py:41-63
`contract_to_unisphere`; nerfacc AABB contraction), plus the inverse maps
(nerfacc `contract_inv`) needed by voxel-grid extraction
(conerf/register/sample_grid.py:237: grid coords -> world).

All maps send world space into the unit cube [0, 1]^3.
"""
from __future__ import annotations

import jax.numpy as jnp

AABB = "aabb"
UN_BOUNDED_SPHERE = "un_bounded_sphere"


def contract_aabb(x: jnp.ndarray, aabb: jnp.ndarray) -> jnp.ndarray:
    """World -> [0,1]^3 by AABB normalization; aabb: [6]."""
    return (x - aabb[:3]) / (aabb[3:] - aabb[:3])


def contract_aabb_inv(u: jnp.ndarray, aabb: jnp.ndarray) -> jnp.ndarray:
    return u * (aabb[3:] - aabb[:3]) + aabb[:3]


def contract_unisphere(x: jnp.ndarray, aabb: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """MipNeRF-360-style contraction: inside the aabb-sphere linear, outside
    compressed to radius 2; final output scaled to [0, 1]."""
    u = contract_aabb(x, aabb) * 2.0 - 1.0  # aabb -> [-1, 1]
    mag = jnp.linalg.norm(u, axis=-1, keepdims=True)
    mag = jnp.maximum(mag, eps)
    contracted = jnp.where(mag > 1.0, (2.0 - 1.0 / mag) * (u / mag), u)
    return contracted / 4.0 + 0.5


def contract_unisphere_inv(v: jnp.ndarray, aabb: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Inverse of `contract_unisphere` (nerfacc contract_inv parity)."""
    u = (v - 0.5) * 4.0
    mag = jnp.linalg.norm(u, axis=-1, keepdims=True)
    mag = jnp.maximum(mag, eps)
    # inside: identity. outside (mag>1): u = (2 - 1/m) * x_hat where m=|x|
    # => |u| = 2 - 1/m => m = 1 / (2 - |u|); x = x_hat * m = u/|u| * m
    m = 1.0 / jnp.maximum(2.0 - mag, eps)
    expanded = jnp.where(mag > 1.0, u / mag * m, u)
    return contract_aabb_inv(expanded * 0.5 + 0.5, aabb)


def contract(x: jnp.ndarray, aabb: jnp.ndarray, kind: str) -> jnp.ndarray:
    if kind == AABB:
        return contract_aabb(x, aabb)
    if kind == UN_BOUNDED_SPHERE:
        return contract_unisphere(x, aabb)
    raise ValueError(f"unknown contraction: {kind}")


def contract_inv(u: jnp.ndarray, aabb: jnp.ndarray, kind: str) -> jnp.ndarray:
    if kind == AABB:
        return contract_aabb_inv(u, aabb)
    if kind == UN_BOUNDED_SPHERE:
        return contract_unisphere_inv(u, aabb)
    raise ValueError(f"unknown contraction: {kind}")
