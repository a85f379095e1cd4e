"""Pose-only ray dataset: render from arbitrary pose lists without images.

Parity with conerf/datasets/register/nerf_pose_only_dataset.py:12-152
(`NeRFPoseOnlyDataset`): hard-coded per-dataset intrinsics, generates rays
for each supplied camera-to-world pose. Used by the registration evaluator
to render aligned/unaligned novel views (eval_nerf_regtr.py:68-109).
"""
from __future__ import annotations

import numpy as np

# (width, height, focal, opengl) per dataset name — reference hard-codes
# these (nerf_pose_only_dataset.py:24-62)
_INTRINSICS = {
    "objaverse": (800, 800, None, True),  # focal from camera_angle_x 0.8575
    "nerf_synthetic": (800, 800, None, True),
    "scannerf": (1440, 1080, 1000.0, True),
    "dtu": (640, 512, 700.0, False),
    "BlendedMVS": (768, 576, 600.0, False),
}
_DEFAULT_ANGLE_X = 0.8575560450553894


def intrinsics_for(dataset: str, factor: int = 1) -> tuple[np.ndarray, int, int, bool]:
    w, h, focal, opengl = _INTRINSICS.get(dataset, _INTRINSICS["objaverse"])
    if focal is None:
        focal = 0.5 * w / np.tan(0.5 * _DEFAULT_ANGLE_X)
    w, h, focal = w // factor, h // factor, focal / factor
    K = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32)
    return K, h, w, opengl


class NeRFPoseOnlyDataset:
    def __init__(self, poses: np.ndarray, dataset: str = "objaverse", factor: int = 1):
        """poses: [N, 3, 4] or [N, 4, 4] camera-to-world."""
        self.poses = np.asarray(poses, np.float32)[:, :3, :4]
        self.K, self.height, self.width, self.opengl = intrinsics_for(dataset, factor)

    def __len__(self) -> int:
        return len(self.poses)

    def __getitem__(self, i: int):
        """Full-image rays for pose i (jnp arrays)."""
        import jax.numpy as jnp

        from dregnerf_tpu.geometry.cameras import image_rays

        rays = image_rays(
            jnp.asarray(self.K), jnp.asarray(self.poses[i]),
            self.height, self.width, self.opengl,
        )
        return rays
