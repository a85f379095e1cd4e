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
from dregnerf_tpu.registration.icp import _prep, icp_refine, score_pose_feat


def _inv34(T: np.ndarray) -> np.ndarray:
    T = np.asarray(T, np.float32)
    R, t = T[:3, :3], T[:3, 3]
    out = np.zeros((3, 4), np.float32)
    out[:3, :3] = R.T
    out[:3, 3] = -R.T @ t
    return out


def best_global_registration(
    src_points: np.ndarray,
    tgt_points: np.ndarray,
    src_colors: Optional[np.ndarray] = None,
    tgt_colors: Optional[np.ndarray] = None,
    voxel_sizes: Tuple[float, ...] = (0.03, 0.05, 0.08, 0.12),
    refine: bool = True,
    n_points: int = 4096,
    seed: int = 0,
    icp_voxel: Optional[float] = None,
    both_directions: bool = True,
    polish_each: bool = True,
) -> Tuple[Optional[np.ndarray], dict]:
    """Returns (T [3, 4] or None, info). info records every candidate's
    GT-free score plus which (method, voxel, direction) won.

    Round-5 race design, driven by per-candidate GT errors measured on the
    round-4 fleet clouds (experiments/stage3/fgr_debug*.json):
      * BOTH directions per (method, scale): FGR/RANSAC are direction-
        sensitive — scene_13 had every forward candidate >163 deg while
        the reverse direction registers to ~2 deg;
      * scale diversity (0.03/0.05/0.08/0.12): scene_14 fails at
        0.03+0.05 in all method/direction combos but registers to 5-10 deg
        at 0.08/0.12 (fgr_debug.json);
      * a light color-aware ICP polish of EVERY candidate before scoring:
        the unpolished joint score can prefer an 9-deg basin over a 2.5-deg
        one (scene_15) — after polish the better basin wins;
      * winner by the joint (xyz, 0.5*rgb) trimmed-NN score — pure
        geometry cannot separate 136-deg poses on self-similar primitive
        clusters (scene_12: all scores within 4% while GT spanned 8-136
        deg).
    """
    from dregnerf_tpu.registration.icp import icp_core

    rng = np.random.default_rng(seed)
    src, sc, sv = _prep(src_points, src_colors, n_points, rng)
    tgt, tc, tv = _prep(tgt_points, tgt_colors, n_points, rng)
    src_j, tgt_j = jnp.asarray(src), jnp.asarray(tgt)
    sv_j, tv_j = jnp.asarray(sv), jnp.asarray(tv)
    lam = 0.5
    sc_j = jnp.asarray(lam * sc)
    tc_j = jnp.asarray(lam * tc)
    # polish gate: coarse 3x the finest race scale, strict 0.4x (the
    # reference refine_registration convention)
    gate0 = jnp.asarray(3.0 * min(voxel_sizes), jnp.float32)
    gate1 = jnp.asarray(0.4 * min(voxel_sizes), jnp.float32)

    directions = (("fwd", src_points, tgt_points),)
    if both_directions:
        directions += (("rev", tgt_points, src_points),)

    cands = []
    t0 = time.time()
    # rotation-grid colored-ICP candidate (registration/global_icp.py):
    # FPFH proposals can be uniformly wrong on sphere-family clouds
    # (scene_14: all 12 FGR/RANSAC candidates 125-156 deg while the GT
    # pose scores 0.037 vs their 0.062+ — the metric discriminates, the
    # PROPOSALS are the gap); 24 octahedral seeds guarantee one within
    # ~31 deg of any pose.
    try:
        from dregnerf_tpu.registration.global_icp import global_colored_icp

        T_g, _ginfo = global_colored_icp(
            src_points, tgt_points, src_colors, tgt_colors, seed=seed)
        if T_g is not None:
            T34 = np.asarray(T_g, np.float32)[:3, :4]
            s = float(score_pose_feat(
                src_j, tgt_j, sc_j, tc_j, sv_j, tv_j, jnp.asarray(T34)))
            cands.append({"method": "gicp", "voxel": None, "dir": "fwd",
                          "score": round(s, 6), "_T": T34})
    except Exception as e:  # noqa: BLE001 — one source must not kill the race
        cands.append({"method": "gicp", "voxel": None, "score": None,
                      "error": str(e)[:200]})
    for vs in voxel_sizes:
        for name, fn in (("fgr", run_registration),
                         ("ransac", run_ransac_registration)):
            for dname, a_pts, b_pts in directions:
                T, _dt = fn(a_pts, b_pts, voxel_size=vs)
                if T is None:
                    cands.append({"method": name, "voxel": vs,
                                  "dir": dname, "score": None})
                    continue
                T34 = np.asarray(T, np.float32)[:3, :4]
                if dname == "rev":
                    T34 = _inv34(T34)
                if polish_each:
                    T34 = np.asarray(icp_core(
                        src_j, tgt_j, sc_j, tc_j, sv_j, tv_j,
                        jnp.asarray(T34), gate0, gate1, iters=12)[0])
                s = float(score_pose_feat(
                    src_j, tgt_j, sc_j, tc_j, sv_j, tv_j,
                    jnp.asarray(T34)))
                cands.append({"method": name, "voxel": vs, "dir": dname,
                              "score": round(s, 6), "_T": T34})
    scored = [c for c in cands if c.get("_T") is not None]
    info = {
        "candidates": [
            {**{k: v for k, v in c.items() if k != "_T"},
             **({"T": np.asarray(c["_T"]).tolist()} if "_T" in c else {})}
            for c in cands
        ],
        "time_s": time.time() - t0,
    }
    if not scored:
        return None, info
    best = min(scored, key=lambda c: c["score"])
    info["winner"] = {"method": best["method"], "voxel": best["voxel"],
                      "dir": best.get("dir", "fwd"), "score": best["score"]}
    T = best["_T"]
    if refine:
        # ICP gate defaults to 2 cells of a 128^3 grid over the [-1,1]
        # aabb; callers with a different grid_resolution pass their own
        # (ADVICE r4: eval_nerf_regtr derives this from config)
        T_ref, rms, cnt = icp_refine(
            src_points, tgt_points, T,
            voxel_size=icp_voxel if icp_voxel is not None else 2.0 / 128 * 2,
            seed=seed,
            src_colors=src_colors, tgt_colors=tgt_colors,
        )
        if T_ref is not None:
            info["icp"] = {"rms": round(float(rms), 6), "inliers": int(cnt)}
            T = T_ref
    info["time_s"] = time.time() - t0
    return T, info
