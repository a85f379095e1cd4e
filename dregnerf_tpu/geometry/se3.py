"""SE(3)/SO(3) algebra in pure jnp.

Functional equivalents of the reference's torch SE(3) helpers
(reference: conerf/register/se3.py:7-87, conerf/geometry/pose_util.py:6-368).
All functions are jit/vmap-friendly, operate on trailing dims, and keep f32
precision (rotations should never be bf16).

Conventions: an SE(3) transform is a [..., 3, 4] array ``[R | t]`` mapping
points as ``R @ p + t``; 4x4 homogeneous helpers are provided for IO parity
with the reference's world_frame_transforms.json artifacts.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def se3_init(rot: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Build [..., 3, 4] from rotation [..., 3, 3] and translation [..., 3, 1] or [..., 3]."""
    if trans.shape[-1] != 1:
        trans = trans[..., None]
    return jnp.concatenate([rot, trans], axis=-1)


def se3_rot(pose: jnp.ndarray) -> jnp.ndarray:
    return pose[..., :3, :3]


def se3_trans(pose: jnp.ndarray) -> jnp.ndarray:
    return pose[..., :3, 3]


def se3_identity(batch_shape=()) -> jnp.ndarray:
    eye = jnp.eye(3, 4, dtype=jnp.float32)
    return jnp.broadcast_to(eye, (*batch_shape, 3, 4))


def se3_cat(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose: result(p) = a(b(p)). Matches reference se3_cat (se3.py:33-44)."""
    rot = se3_rot(a) @ se3_rot(b)
    trans = se3_trans(a) + jnp.einsum("...ij,...j->...i", se3_rot(a), se3_trans(b))
    return se3_init(rot, trans)


def se3_inv(pose: jnp.ndarray) -> jnp.ndarray:
    rot_t = jnp.swapaxes(se3_rot(pose), -1, -2)
    trans = -jnp.einsum("...ij,...j->...i", rot_t, se3_trans(pose))
    return se3_init(rot_t, trans)


def se3_transform(pose: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply [..., 3, 4] pose to [..., N, 3] points."""
    return jnp.einsum("...ij,...nj->...ni", se3_rot(pose), points) + se3_trans(pose)[..., None, :]


def to_homogeneous(pose: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 4] -> [..., 4, 4]."""
    bottom = jnp.zeros((*pose.shape[:-2], 1, 4), dtype=pose.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([pose, bottom], axis=-2)


def from_homogeneous(mat: jnp.ndarray) -> jnp.ndarray:
    return mat[..., :3, :4]


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: [..., 3] -> [..., 3, 3] skew-symmetric."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(omega: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Rodrigues' formula, numerically safe near zero (pose_util.py exp maps)."""
    theta = jnp.linalg.norm(omega, axis=-1, keepdims=True)
    theta = jnp.maximum(theta, eps)
    k = hat(omega / theta)
    th = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), k.shape)
    return eye + jnp.sin(th) * k + (1.0 - jnp.cos(th)) * (k @ k)


def so3_log(rot: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Log map SO(3) -> so(3) axis-angle vector."""
    trace = jnp.trace(rot, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0 + eps, 1.0 - eps)
    theta = jnp.arccos(cos_theta)
    w = jnp.stack(
        [
            rot[..., 2, 1] - rot[..., 1, 2],
            rot[..., 0, 2] - rot[..., 2, 0],
            rot[..., 1, 0] - rot[..., 0, 1],
        ],
        axis=-1,
    )
    scale = theta / jnp.maximum(2.0 * jnp.sin(theta), eps)
    return w * scale[..., None]


def se3_exp(xi: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Exp map se(3) -> SE(3); xi = [..., 6] (omega, v)."""
    omega, v = xi[..., :3], xi[..., 3:]
    theta = jnp.linalg.norm(omega, axis=-1, keepdims=True)
    theta = jnp.maximum(theta, eps)
    k = hat(omega / theta)
    th = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), k.shape)
    rot = eye + jnp.sin(th) * k + (1.0 - jnp.cos(th)) * (k @ k)
    V = eye + ((1.0 - jnp.cos(th)) / th) * k + ((th - jnp.sin(th)) / th) * (k @ k)
    trans = jnp.einsum("...ij,...j->...i", V, v)
    return se3_init(rot, trans)


def random_se3(key: jax.Array, rot_scale: float = 1.0, trans_clamp: float = 0.2) -> jnp.ndarray:
    """Random rigid transform: uniform rotation (QR of gaussian) + clamped translation.

    Behavior parity with the reference's random world-frame changes
    (pose_util.py:363-368: translation clamped to +-0.2).
    """
    k1, k2 = jax.random.split(key)
    omega = jax.random.normal(k1, (3,)) * rot_scale
    rot = so3_exp(omega * jnp.pi / jnp.maximum(jnp.linalg.norm(omega), 1e-8)
                  * jnp.minimum(jnp.linalg.norm(omega), 1.0))
    trans = jnp.clip(jax.random.normal(k2, (3,)) * trans_clamp, -trans_clamp, trans_clamp)
    return se3_init(rot, trans)


def sample_se3_small(key: jax.Array, std: float = 0.1) -> jnp.ndarray:
    """Small random perturbation in the tangent space (reference
    datasets/register/dataset.py:82-91 `_sample_se3_small`)."""
    xi = jax.random.normal(key, (6,)) * std
    return se3_exp(xi)


def rotation_distance_deg(r1: jnp.ndarray, r2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Relative rotation error in degrees (train_nerf_regtr.py:40-61)."""
    r = jnp.swapaxes(r1, -1, -2) @ r2
    trace = jnp.trace(r, axis1=-2, axis2=-1)
    cos_angle = jnp.clip((trace - 1.0) / 2.0, -1.0 + eps, 1.0 - eps)
    return jnp.degrees(jnp.arccos(cos_angle))


def translation_distance(t1: jnp.ndarray, t2: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.norm(t1 - t2, axis=-1)


def pose_error(pred: jnp.ndarray, gt: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(RRE deg, RTE) between [..., 3, 4] poses."""
    rre = rotation_distance_deg(se3_rot(pred), se3_rot(gt))
    rte = translation_distance(se3_trans(pred), se3_trans(gt))
    return rre, rte
