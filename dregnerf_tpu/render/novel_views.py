"""Novel-view synthesis + video export for registration evaluation.

Parity with eval_nerf_regtr.py:68-172 (`synthesize_novel_views` +
`render_videos`): render a NeRF checkpoint from a list of poses (optionally
transformed by a predicted/GT registration pose), write PNGs, and assemble
an mp4 with ffmpeg when available.
"""
from __future__ import annotations

import os
import shutil
import subprocess
from typing import Optional

import numpy as np


def synthesize_novel_views(
    ckpt_path: str,
    poses: np.ndarray,
    out_dir: str,
    dataset: str = "objaverse",
    factor: int = 4,
    transform: Optional[np.ndarray] = None,
    chunk_size: int = 8192,
) -> list:
    """Render each pose from the checkpointed NeRF; returns image paths."""
    import imageio.v2 as imageio
    import jax.numpy as jnp

    from dregnerf_tpu.datasets.pose_only import NeRFPoseOnlyDataset
    from dregnerf_tpu.models import ngp
    from dregnerf_tpu.render.renderer import render_image_chunked
    from dregnerf_tpu.runtime.ngp_trainer import load_field_from_checkpoint
    import dataclasses

    params, grid, meta, model_cfg, render_cfg = load_field_from_checkpoint(ckpt_path)
    render_cfg = dataclasses.replace(render_cfg, chunk_size=chunk_size)
    poses = np.asarray(poses, np.float32)[:, :3, :4]
    if transform is not None:
        t = np.asarray(transform, np.float64)
        homo = np.concatenate(
            [poses, np.tile(np.array([[[0, 0, 0, 1.0]]]), (len(poses), 1, 1))], axis=1
        )
        t4 = np.eye(4)
        t4[:3, :4] = t[:3, :4]
        poses = (t4 @ homo)[:, :3, :4].astype(np.float32)

    ds = NeRFPoseOnlyDataset(poses, dataset, factor)
    os.makedirs(out_dir, exist_ok=True)
    aabb = jnp.asarray(meta["aabb"])
    paths = []
    for i in range(len(ds)):
        rays = ds[i]
        rgb, _, _ = render_image_chunked(
            params, model_cfg, grid,
            rays.origins.reshape(-1, 3), rays.viewdirs.reshape(-1, 3),
            aabb, render_cfg, jnp.ones(3),
        )
        img = np.clip(np.asarray(rgb).reshape(ds.height, ds.width, 3), 0, 1)
        p = os.path.join(out_dir, f"frame_{i:04d}.png")
        imageio.imwrite(p, (img * 255).astype(np.uint8))
        paths.append(p)
    return paths


def frames_to_video(frame_dir: str, out_path: str, fps: int = 24) -> bool:
    """PNG frames -> mp4 via ffmpeg (reference eval_nerf_regtr.py:171).
    Returns False when ffmpeg is unavailable."""
    if shutil.which("ffmpeg") is None:
        return False
    cmd = [
        "ffmpeg", "-y", "-framerate", str(fps),
        "-pattern_type", "glob", "-i", os.path.join(frame_dir, "frame_*.png"),
        "-c:v", "libx264", "-pix_fmt", "yuv420p", out_path,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False
