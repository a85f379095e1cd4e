"""Visibility / surface-field supervision for registration training.

The reference (conerf/loss/confidence_loss.py:56-160) reloads both NGP
NeRFs FROM DISK on every training iteration and marches Nc x N rays to
label each keypoint visible/invisible — the dominant cost of its trainer
(SURVEY.md §3.3).

TPU-native redesign, two tiers:

  * `grid_visibility` (training default): the extraction stage already
    computed exactly this field — voxel_mask.pt marks voxels whose
    surface field S >= 0.5 from some training camera AND sigma > 0.7.
    Visibility of an arbitrary point is a nearest-voxel lookup into that
    mask: one gather, fully jittable, no NeRF reload, no ray marching.
    Resolution-limited to the 128^3 grid — the same grid the keypoints
    came from, so no fidelity is lost for kp labels.

  * `exact_visibility` (eval/parity): jitted re-computation by marching
    camera->point rays with the packed marcher (per-ray t_max) against the
    checkpointed NeRF — the reference semantics, for validation and for
    points off the voxel lattice (e.g. warped keypoints far from either
    grid).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from dregnerf_tpu.models import ngp
from dregnerf_tpu.ops.composite import surface_field_per_ray
from dregnerf_tpu.ops.contraction import contract
from dregnerf_tpu.ops.occupancy import OccupancyGrid
from dregnerf_tpu.ops.ray_march import march_rays, sample_positions
from dregnerf_tpu.render.renderer import RenderConfig


def grid_visibility(
    points: jnp.ndarray,
    visible_mask_flat: jnp.ndarray,
    aabb: jnp.ndarray,
    resolution: int,
    contraction: str = "aabb",
) -> jnp.ndarray:
    """[..., 3] world points -> {0., 1.} visibility by voxel-mask lookup.

    visible_mask_flat: [R^3] bool in ix*R^2+iy*R+iz order (voxel_mask.pt
    indices scattered to bool).
    """
    u = contract(points, aabb, contraction)
    idx = jnp.floor(u * resolution).astype(jnp.int32)
    in_range = jnp.all((idx >= 0) & (idx < resolution), axis=-1)
    idx = jnp.clip(idx, 0, resolution - 1)
    flat = idx[..., 0] * resolution * resolution + idx[..., 1] * resolution + idx[..., 2]
    return (visible_mask_flat[flat] & in_range).astype(jnp.float32)


def exact_visibility(
    params: Any,
    model_cfg: ngp.NGPConfig,
    grid: OccupancyGrid,
    aabb: jnp.ndarray,
    rcfg: RenderConfig,
    cam_origins: jnp.ndarray,
    cam_valid: jnp.ndarray,
    points: jnp.ndarray,
    buffer_size: int = 1 << 16,
    cutoff: float = 0.5,
) -> jnp.ndarray:
    """Reference-parity visibility: max over cameras of per-ray S >= cutoff.

    cam_origins: [C, 3] (padded), cam_valid: [C] bool, points: [M, 3].
    Jittable: the camera loop is a fori_loop over a static C.
    """
    m = points.shape[0]

    def body(c, smax):
        o = jnp.broadcast_to(cam_origins[c][None], (m, 3))
        d = points - o
        t_max = jnp.linalg.norm(d, axis=-1)
        viewdirs = d / jnp.maximum(t_max[:, None], 1e-10)
        packed = march_rays(
            o, viewdirs, grid, aabb, rcfg.contraction, rcfg.render_step_size,
            buffer_size, rcfg.max_steps, rcfg.near_plane, rcfg.far_plane,
            t_max=t_max,
        )
        pos, _ = sample_positions(packed, o, viewdirs)
        sigma = ngp.query_density(params, pos, aabb, model_cfg).reshape(-1)
        sigma = jnp.where(packed.valid, sigma, 0.0)
        s = surface_field_per_ray(packed, sigma)
        return jnp.maximum(smax, jnp.where(cam_valid[c], s, 0.0))

    smax = jax.lax.fori_loop(0, cam_origins.shape[0], body, jnp.zeros(m))
    return (smax >= cutoff).astype(jnp.float32)
