"""Feature-embedding visualization (conerf/visualization/
feature_visualizer.py parity): project high-dimensional point features to
RGB via PCA and export a colored point cloud for inspection."""
from __future__ import annotations

import numpy as np


def features_to_rgb(feats: np.ndarray) -> np.ndarray:
    """[N, D] features -> [N, 3] colors via PCA + min-max normalize."""
    feats = np.asarray(feats, np.float64)
    mu = feats.mean(axis=0, keepdims=True)
    x = feats - mu
    # top-3 principal directions via SVD of the (N, D) matrix
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    proj = x @ vt[:3].T  # [N, 3]
    lo = proj.min(axis=0, keepdims=True)
    hi = proj.max(axis=0, keepdims=True)
    return ((proj - lo) / np.maximum(hi - lo, 1e-9)).astype(np.float32)


def save_feature_cloud(path: str, xyz: np.ndarray, feats: np.ndarray) -> None:
    """Write a PLY whose colors encode the PCA-projected features."""
    from dregnerf_tpu.io.ply import write_ply

    write_ply(path, np.asarray(xyz), features_to_rgb(feats))
