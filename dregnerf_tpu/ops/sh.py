"""Spherical-harmonics direction encoding (degree 4 → 16 coefficients).

Closed-form jnp replacement for tiny-cuda-nn's `SphericalHarmonics` encoding
(reference conerf/radiance_fields/ngp.py:112-127). The reference feeds
directions scaled to [0, 1] (ngp.py:181: ``dir = (dir + 1) / 2``) and tcnn
maps back to [-1, 1]; `sh_encode` here takes unit directions in [-1, 1]
directly. Coefficient convention matches the instant-ngp real-SH polynomial
table so color MLPs trained against either encoder agree.

Pure elementwise math — the VPU eats this; no custom kernel needed.
"""
from __future__ import annotations

import jax.numpy as jnp


def sh_encode(dirs: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Real spherical harmonics of unit direction vectors.

    Args:
      dirs: [..., 3] unit directions, components in [-1, 1].
      degree: SH degree (1..4); output has degree**2 coefficients.

    Returns:
      [..., degree**2] float array.
    """
    if not 1 <= degree <= 4:
        raise ValueError(f"sh degree must be in [1, 4], got {degree}")
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z

    out = [jnp.full_like(x, 0.28209479177387814)]
    if degree >= 2:
        out += [
            -0.48860251190291987 * y,
            0.48860251190291992 * z,
            -0.48860251190291987 * x,
        ]
    if degree >= 3:
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * zz - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (xx - yy),
        ]
    if degree >= 4:
        out += [
            0.59004358992664352 * y * (-3.0 * xx + yy),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * zz),
            0.3731763325901154 * z * (5.0 * zz - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * zz),
            1.4453057213202769 * z * (xx - yy),
            0.59004358992664352 * x * (-xx + 3.0 * yy),
        ]
    return jnp.stack(out, axis=-1)
