"""Global registration by massively-parallel colored ICP (no init needed).

Why this exists: FPFH-based global registration (FGR/RANSAC,
conerf/geometry/global_registration.py:30-116) is built on local geometric
signatures and provably degrades on constant-curvature surfaces — on the
fleet's sphere-cluster scenes it lands 18-170 deg off at every voxel scale
while box scenes register fine. The voxel shells carry per-point COLOR,
which disambiguates those scenes, and the jittable `icp_core` makes a
brute-force-parallel attack idiomatic on this hardware:

  1. seed K rotations from the chiral octahedral group (24 exact cube
     rotations — every pose is within <=~31 deg of some seed) plus
     optional extras, translations from centroid alignment;
  2. run ALL seeds as ONE vmapped colored-ICP program at a coarse point
     count (the [K, N, M] distance tensor is K matmuls on the MXU);
  3. score every survivor with the GT-free trimmed-NN objective and
     polish the winner at full point count via `icp_refine`.

This is a TPU-first design: no trees, no branching — one compiled
program races the whole rotation space.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dregnerf_tpu.registration.icp import (
    _prep,
    icp_core,
    icp_refine,
    score_pose_feat,
)


def octahedral_rotations() -> np.ndarray:
    """The 24 rotation matrices of the cube (chiral octahedral group)."""
    mats = []
    for perm in ((0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1),
                 (2, 1, 0)):
        for sx in (1, -1):
            for sy in (1, -1):
                for sz in (1, -1):
                    m = np.zeros((3, 3))
                    m[0, perm[0]] = sx
                    m[1, perm[1]] = sy
                    m[2, perm[2]] = sz
                    if np.linalg.det(m) > 0:
                        mats.append(m)
    return np.stack(mats).astype(np.float32)  # [24, 3, 3]


@partial(jax.jit, static_argnames=("iters",))
def _coarse_race(src, tgt, src_c, tgt_c, sv, tv, seeds, gate0, gate1,
                 iters=20):
    """vmapped colored ICP over seed poses; returns per-seed (pose, score)."""

    def one(seed_pose):
        pose, _rms, _cnt = icp_core(
            src, tgt, src_c, tgt_c, sv, tv, seed_pose, gate0, gate1,
            iters=iters,
        )
        # joint (xyz, color) selection: geometry-only scores are within
        # noise of each other on self-similar primitive clusters
        return pose, score_pose_feat(src, tgt, src_c, tgt_c, sv, tv, pose)

    return jax.vmap(one)(seeds)


def global_colored_icp(
    src_points: np.ndarray,
    tgt_points: np.ndarray,
    src_colors: Optional[np.ndarray] = None,
    tgt_colors: Optional[np.ndarray] = None,
    voxel_size: float = 2.0 / 128 * 2,
    color_weight: float = 0.5,
    n_coarse: int = 1024,
    n_refine: int = 4096,
    seed: int = 0,
) -> Tuple[Optional[np.ndarray], dict]:
    """Global src->tgt registration without an initial pose.

    Returns (T [3, 4] or None, info with per-stage scores/timings)."""
    import time

    t0 = time.time()
    rng = np.random.default_rng(seed)
    src, src_c, sv = _prep(src_points, src_colors, n_coarse, rng)
    tgt, tgt_c, tv = _prep(tgt_points, tgt_colors, n_coarse, rng)
    if sv.sum() < 3 or tv.sum() < 3:
        return None, {"error": "too few points"}

    # centroid-aligned translation for every rotation seed (rotation about
    # the src centroid, then centroid -> centroid)
    mu_s = src[sv].mean(axis=0)
    mu_t = tgt[tv].mean(axis=0)
    rots = octahedral_rotations()  # [24, 3, 3]
    trans = mu_t[None, :] - np.einsum("kij,j->ki", rots, mu_s)  # [24, 3]
    seeds = np.concatenate([rots, trans[:, :, None]], axis=-1)  # [24, 3, 4]

    lam = float(color_weight) if src_colors is not None else 0.0
    poses, scores = _coarse_race(
        jnp.asarray(src), jnp.asarray(tgt),
        jnp.asarray(lam * src_c), jnp.asarray(lam * tgt_c),
        jnp.asarray(sv), jnp.asarray(tv),
        jnp.asarray(seeds),
        jnp.asarray(8.0 * voxel_size, jnp.float32),
        jnp.asarray(0.8 * voxel_size, jnp.float32),
    )
    scores = np.asarray(scores)
    best = int(np.argmin(scores))
    info = {
        "coarse_best_score": float(scores[best]),
        "coarse_seed": best,
        "coarse_time_s": time.time() - t0,
    }

    T, rms, cnt = icp_refine(
        src_points, tgt_points, np.asarray(poses[best]),
        voxel_size=voxel_size, n_points=n_refine, seed=seed,
        src_colors=src_colors, tgt_colors=tgt_colors,
    )
    info["time_s"] = time.time() - t0
    if T is None:
        return np.asarray(poses[best]), info
    info["icp_rms"] = float(rms)
    info["icp_inliers"] = int(cnt)
    return T, info
