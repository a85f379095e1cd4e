"""Differentiable weighted Kabsch / rigid alignment.

TPU-native equivalent of the reference's `compute_rigid_transform`
(conerf/register/se3.py:89-140): weighted centroids -> weighted covariance ->
SVD -> determinant sign fix -> [R | t]. Used at every decoder layer of the
registration transformer, so it must be differentiable and stable under
near-degenerate weights (all-zero overlap early in training).

Always computed in float32 regardless of the surrounding network precision:
3x3 SVD in bf16 is numerically useless.
"""
from __future__ import annotations

import jax.numpy as jnp


def weighted_rigid_transform(
    a: jnp.ndarray,
    b: jnp.ndarray,
    weights: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Least-squares rigid transform aligning a -> b.

    Args:
      a: [..., N, 3] source points.
      b: [..., N, 3] target points.
      weights: [..., N] non-negative per-point weights.

    Returns:
      [..., 3, 4] transform T with ``T(a) ~= b``.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    w = weights.astype(jnp.float32)
    w = jnp.maximum(w, 0.0)
    w_norm = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), eps)

    centroid_a = jnp.einsum("...n,...ni->...i", w_norm, a)
    centroid_b = jnp.einsum("...n,...ni->...i", w_norm, b)
    a_c = a - centroid_a[..., None, :]
    b_c = b - centroid_b[..., None, :]

    # weighted covariance: A^T diag(w) B -> [..., 3, 3]
    cov = jnp.einsum("...ni,...n,...nj->...ij", a_c, w_norm, b_c)

    u, _, vt = jnp.linalg.svd(cov, full_matrices=False)
    v = jnp.swapaxes(vt, -1, -2)
    ut = jnp.swapaxes(u, -1, -2)
    det = jnp.linalg.det(v @ ut)
    d = jnp.concatenate(
        [jnp.ones((*det.shape, 2), dtype=jnp.float32), det[..., None]], axis=-1
    )
    rot = (v * d[..., None, :]) @ ut

    trans = centroid_b - jnp.einsum("...ij,...j->...i", rot, centroid_a)
    return jnp.concatenate([rot, trans[..., None]], axis=-1)


def umeyama(
    src: jnp.ndarray, dst: jnp.ndarray, with_scale: bool = True, eps: float = 1e-8
):
    """Umeyama similarity alignment (reference conerf/geometry/align_poses.py:66).

    Returns (scale, R, t) with ``dst ~= scale * R @ src + t``; src/dst [N, 3].
    """
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    n = src.shape[-2]
    mu_s = jnp.mean(src, axis=-2)
    mu_d = jnp.mean(dst, axis=-2)
    sc = src - mu_s
    dc = dst - mu_d
    cov = (dc.T @ sc) / n
    var_s = jnp.sum(sc**2) / n

    u, s, vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(u) * jnp.linalg.det(vt))
    diag = jnp.array([1.0, 1.0, 1.0]).at[2].set(d)
    rot = (u * diag[None, :]) @ vt
    scale = jnp.where(with_scale, jnp.sum(s * diag) / jnp.maximum(var_s, eps), 1.0)
    trans = mu_d - scale * rot @ mu_s
    return scale, rot, trans
