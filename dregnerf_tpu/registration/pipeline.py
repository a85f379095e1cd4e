"""Classical global-registration pipeline: multi-scale FGR/RANSAC + ICP.

Reference shape: conerf/geometry/global_registration.py runs Open3D FGR at
one voxel size (0.05, lines 96-116) with `refine_registration` (ICP,
lines 85-92) available behind it. Measured on the fleet's extracted voxel
shells, a single scale is brittle: FPFH at 0.05 works on box-family scenes
but collapses at 0.03 on others, and vice versa (scene_12: 101 deg at
0.03, 31 deg at 0.05; scene_15: 5.9 deg at 0.03, 9.0 at 0.05). So this
pipeline races FGR and RANSAC across scales and picks the winner with a
GT-free trimmed nearest-neighbour score, then optionally polishes with the
color-aware multi-start ICP.
"""
from __future__ import annotations

import time
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from dregnerf_tpu.registration.fgr import (
    run_ransac_registration,
    run_registration,
)
from dregnerf_tpu.registration.icp import _prep, icp_refine, score_pose


def best_global_registration(
    src_points: np.ndarray,
    tgt_points: np.ndarray,
    src_colors: Optional[np.ndarray] = None,
    tgt_colors: Optional[np.ndarray] = None,
    voxel_sizes: Tuple[float, ...] = (0.03, 0.05),
    refine: bool = True,
    n_points: int = 4096,
    seed: int = 0,
) -> Tuple[Optional[np.ndarray], dict]:
    """Returns (T [3, 4] or None, info). info records every candidate's
    GT-free score plus which (method, voxel) won and the ICP delta."""
    rng = np.random.default_rng(seed)
    src, _, sv = _prep(src_points, None, n_points, rng)
    tgt, _, tv = _prep(tgt_points, None, n_points, rng)
    src_j, tgt_j = jnp.asarray(src), jnp.asarray(tgt)
    sv_j, tv_j = jnp.asarray(sv), jnp.asarray(tv)

    cands = []
    t0 = time.time()
    for vs in voxel_sizes:
        for name, fn in (("fgr", run_registration),
                         ("ransac", run_ransac_registration)):
            T, _dt = fn(src_points, tgt_points, voxel_size=vs)
            if T is None:
                cands.append({"method": name, "voxel": vs, "score": None})
                continue
            T34 = np.asarray(T, np.float32)[:3, :4]
            s = float(score_pose(src_j, tgt_j, sv_j, tv_j, jnp.asarray(T34)))
            cands.append({"method": name, "voxel": vs, "score": round(s, 6),
                          "_T": T34})
    scored = [c for c in cands if c.get("_T") is not None]
    info = {
        "candidates": [
            {k: v for k, v in c.items() if k != "_T"} for c in cands
        ],
        "time_s": time.time() - t0,
    }
    if not scored:
        return None, info
    best = min(scored, key=lambda c: c["score"])
    info["winner"] = {"method": best["method"], "voxel": best["voxel"],
                      "score": best["score"]}
    T = best["_T"]
    if refine:
        T_ref, rms, cnt = icp_refine(
            src_points, tgt_points, T,
            voxel_size=2.0 / 128 * 2, seed=seed,
            src_colors=src_colors, tgt_colors=tgt_colors,
        )
        if T_ref is not None:
            info["icp"] = {"rms": round(float(rms), 6), "inliers": int(cnt)}
            T = T_ref
    info["time_s"] = time.time() - t0
    return T, info
