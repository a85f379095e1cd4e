"""Rotation representation conversions (quaternion / axis-angle / matrix).

Equivalent coverage to the reference's numpy helpers
(conerf/geometry/rotation.py:5-268) but jnp-native and batched.
Quaternions are (w, x, y, z), unit-norm.
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def matrix_to_quat(rot: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Branch-free (jit-safe) Shepperd-style conversion: compute all four
    candidate quaternions and select the best-conditioned one."""
    m = rot
    t0 = 1.0 + m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    t1 = 1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2]
    t2 = 1.0 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2]
    t3 = 1.0 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2]

    s0 = jnp.sqrt(jnp.maximum(t0, eps)) * 2.0
    q0 = jnp.stack(
        [0.25 * s0,
         (m[..., 2, 1] - m[..., 1, 2]) / s0,
         (m[..., 0, 2] - m[..., 2, 0]) / s0,
         (m[..., 1, 0] - m[..., 0, 1]) / s0], -1)
    s1 = jnp.sqrt(jnp.maximum(t1, eps)) * 2.0
    q1 = jnp.stack(
        [(m[..., 2, 1] - m[..., 1, 2]) / s1,
         0.25 * s1,
         (m[..., 0, 1] + m[..., 1, 0]) / s1,
         (m[..., 0, 2] + m[..., 2, 0]) / s1], -1)
    s2 = jnp.sqrt(jnp.maximum(t2, eps)) * 2.0
    q2 = jnp.stack(
        [(m[..., 0, 2] - m[..., 2, 0]) / s2,
         (m[..., 0, 1] + m[..., 1, 0]) / s2,
         0.25 * s2,
         (m[..., 1, 2] + m[..., 2, 1]) / s2], -1)
    s3 = jnp.sqrt(jnp.maximum(t3, eps)) * 2.0
    q3 = jnp.stack(
        [(m[..., 1, 0] - m[..., 0, 1]) / s3,
         (m[..., 0, 2] + m[..., 2, 0]) / s3,
         (m[..., 1, 2] + m[..., 2, 1]) / s3,
         0.25 * s3], -1)

    ts = jnp.stack([t0, t1, t2, t3], -1)
    idx = jnp.argmax(ts, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], -2)
    q = jnp.take_along_axis(qs, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def axis_angle_to_matrix(aa: jnp.ndarray) -> jnp.ndarray:
    from dregnerf_tpu.geometry.se3 import so3_exp

    return so3_exp(aa)


def matrix_to_axis_angle(rot: jnp.ndarray) -> jnp.ndarray:
    from dregnerf_tpu.geometry.se3 import so3_log

    return so3_log(rot)


def euler_to_matrix(angles: jnp.ndarray) -> jnp.ndarray:
    """XYZ-intrinsic Euler angles (radians) -> rotation matrix
    (pose_util.py euler helpers)."""
    rx, ry, rz = angles[..., 0], angles[..., 1], angles[..., 2]
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    one = jnp.ones_like(cx)
    zero = jnp.zeros_like(cx)
    mx = jnp.stack(
        [jnp.stack([one, zero, zero], -1),
         jnp.stack([zero, cx, -sx], -1),
         jnp.stack([zero, sx, cx], -1)], -2)
    my = jnp.stack(
        [jnp.stack([cy, zero, sy], -1),
         jnp.stack([zero, one, zero], -1),
         jnp.stack([-sy, zero, cy], -1)], -2)
    mz = jnp.stack(
        [jnp.stack([cz, -sz, zero], -1),
         jnp.stack([sz, cz, zero], -1),
         jnp.stack([zero, zero, one], -1)], -2)
    return mz @ my @ mx


def chordal_distance(r1: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.norm(
        (r1 - r2).reshape(*r1.shape[:-2], 9), axis=-1
    )


def angular_distance_deg(r1: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    from dregnerf_tpu.geometry.se3 import rotation_distance_deg

    return rotation_distance_deg(r1, r2)
