"""Trajectory / pose-set alignment utilities.

Equivalents of the reference's conerf/geometry/align_poses.py:29-184
(Procrustes camera alignment, ATE-style trajectory alignment) used by the
registration evaluator to score camera alignment after applying a predicted
relative pose (train_nerf_regtr.py:20-39 `evaluate_camera_alignment`).
"""
from __future__ import annotations

import jax.numpy as jnp

from dregnerf_tpu.geometry.kabsch import umeyama
from dregnerf_tpu.geometry.se3 import rotation_distance_deg


def evaluate_camera_alignment(pred_poses: jnp.ndarray, gt_poses: jnp.ndarray):
    """Mean/angular errors between two aligned camera-pose sets.

    pred_poses/gt_poses: [N, 3, 4]. Returns dict of R_error_deg [N] and
    t_error [N] (reference train_nerf_regtr.py:20-39).
    """
    r_err = rotation_distance_deg(pred_poses[..., :3, :3], gt_poses[..., :3, :3])
    t_err = jnp.linalg.norm(pred_poses[..., :3, 3] - gt_poses[..., :3, 3], axis=-1)
    return {"R_error_deg": r_err, "t_error": t_err}


def align_trajectories(src_centers: jnp.ndarray, dst_centers: jnp.ndarray):
    """Sim(3) alignment of two camera-center trajectories (ATE prep).

    Returns (scale, R, t) with dst ~= scale * R @ src + t.
    """
    return umeyama(src_centers, dst_centers, with_scale=True)
