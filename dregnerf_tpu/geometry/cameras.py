"""Camera models and ray generation.

TPU-native ray generator matching the reference's pixel->ray convention
(conerf/datasets/dataset_base.py:233-299): pixel centers at +0.5, OpenGL
(y/z flipped) vs OpenCV conventions, camera-to-world [3, 4] poses.

All functions are pure jnp and jit/vmap-friendly so ray generation runs
on-device (the reference keeps images GPU-resident and generates rays with
torch ops; here rays are generated inside the jitted train step from
device-resident image stacks, with an explicit PRNG key).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Rays(NamedTuple):
    origins: jnp.ndarray  # [..., 3]
    viewdirs: jnp.ndarray  # [..., 3] unit-norm


def pixel_dirs(
    x: jnp.ndarray,
    y: jnp.ndarray,
    K: jnp.ndarray,
    opengl: bool = True,
) -> jnp.ndarray:
    """Camera-frame direction for pixel coords (x, y); K is the 3x3 intrinsic."""
    sign = -1.0 if opengl else 1.0
    dx = (x.astype(jnp.float32) - K[0, 2] + 0.5) / K[0, 0]
    dy = (y.astype(jnp.float32) - K[1, 2] + 0.5) / K[1, 1] * sign
    dz = jnp.full_like(dx, sign)
    return jnp.stack([dx, dy, dz], axis=-1)


def rays_from_pixels(
    x: jnp.ndarray,
    y: jnp.ndarray,
    K: jnp.ndarray,
    c2w: jnp.ndarray,
    opengl: bool = True,
) -> Rays:
    """Generate world-space rays.

    Args:
      x, y: [...] pixel coordinates.
      K: [3, 3] intrinsics.
      c2w: [..., 3, 4] camera-to-world (broadcastable against x/y).
    """
    cam_dirs = pixel_dirs(x, y, K, opengl)  # [..., 3]
    directions = jnp.einsum("...ij,...j->...i", c2w[..., :3, :3], cam_dirs)
    origins = jnp.broadcast_to(c2w[..., :3, 3], directions.shape)
    viewdirs = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    return Rays(origins=origins, viewdirs=viewdirs)


def image_rays(K: jnp.ndarray, c2w: jnp.ndarray, height: int, width: int,
               opengl: bool = True) -> Rays:
    """Full-image ray grid, [H, W, 3] origins/dirs (test-split path)."""
    x, y = jnp.meshgrid(jnp.arange(width), jnp.arange(height), indexing="xy")
    return rays_from_pixels(x, y, K, c2w[None, None], opengl)


def sample_random_rays(
    key: jax.Array,
    num_rays: int,
    num_images: int,
    height: int,
    width: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Random (image_id, x, y) triples for a training batch
    (dataset_base.py:239-254 batch_over_images path)."""
    k1, k2, k3 = jax.random.split(key, 3)
    image_id = jax.random.randint(k1, (num_rays,), 0, num_images)
    x = jax.random.randint(k2, (num_rays,), 0, width)
    y = jax.random.randint(k3, (num_rays,), 0, height)
    return image_id, x, y


def composite_background(
    rgba: jnp.ndarray, color_bkgd: jnp.ndarray
) -> jnp.ndarray:
    """Alpha-composite synthetic RGBA pixels over a background color
    (dataset_base.py:219-221)."""
    rgb, alpha = rgba[..., :3], rgba[..., 3:4]
    return rgb * alpha + color_bkgd * (1.0 - alpha)


def ray_aabb_intersect(
    origins: jnp.ndarray,
    viewdirs: jnp.ndarray,
    aabb: jnp.ndarray,
    near: float = 0.0,
    far: float = 1e10,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Slab-method ray/AABB intersection (nerfacc `ray_aabb_intersect` parity).

    Returns (t_min, t_max) per ray; t_min > t_max means no hit.
    aabb: [6] = (xmin, ymin, zmin, xmax, ymax, zmax).
    """
    inv_dir = 1.0 / jnp.where(jnp.abs(viewdirs) < 1e-10,
                              jnp.full_like(viewdirs, 1e-10), viewdirs)
    t0 = (aabb[:3] - origins) * inv_dir
    t1 = (aabb[3:] - origins) * inv_dir
    t_small = jnp.minimum(t0, t1)
    t_big = jnp.maximum(t0, t1)
    t_min = jnp.maximum(jnp.max(t_small, axis=-1), near)
    t_max = jnp.minimum(jnp.min(t_big, axis=-1), far)
    return t_min, t_max
