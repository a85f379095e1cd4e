"""Point-to-point ICP refinement (jittable, static-shape, color-aware).

TPU-native equivalent of the reference's `refine_registration`
(conerf/geometry/global_registration.py:85-92 — o3d `registration_icp`
polishing a global-registration init). Used to refine RegTr / FGR poses on
the extracted voxel shells.

Design (TPU-first):
  - fixed point counts + validity masks (pad or subsample host-side), so the
    whole refinement is ONE compiled program;
  - brute-force nearest neighbour via a [N, M] squared-distance matrix built
    from matmuls (MXU) — at the 4096-point default that is a 16.8M-entry
    f32 matrix, far cheaper than tree construction on this hardware;
  - correspondence search runs in a position+color feature space: the fleet
    scenes are clusters of locally self-similar primitives (spheres slide
    on spheres), and measured on real fleet clouds geometry-only ICP stalls
    (16 deg init -> 13.7 deg) while color-weighted NN converges
    (16 deg -> 3.7 deg on scene_12). The rigid solve itself always uses 3D
    positions only;
  - `lax.scan` over a fixed iteration count with an annealed correspondence
    gate (coarse -> strict, mirroring the reference's voxel_size*0.4 strict
    distance after a coarse global init);
  - multi-start: several color weights (and the unrefined init) race, and a
    common trimmed-NN objective picks the winner — refinement can never
    return something worse than its input under its own metric.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dregnerf_tpu.geometry.kabsch import weighted_rigid_transform


@partial(jax.jit, static_argnames=("iters",))
def icp_core(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    src_cfeat: jnp.ndarray,
    tgt_cfeat: jnp.ndarray,
    src_valid: jnp.ndarray,
    tgt_valid: jnp.ndarray,
    init_pose: jnp.ndarray,
    dist_start: jnp.ndarray,
    dist_end: jnp.ndarray,
    iters: int = 30,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Refine `init_pose` ([3, 4], src->tgt) by point-to-point ICP.

    src: [N, 3], tgt: [M, 3] (padded), *_valid boolean masks.
    *_cfeat: [N|M, C] extra matching features (e.g. lam * rgb) appended to
    the positions for the nearest-neighbour search only; pass zeros for
    classic geometric ICP (weight 0 keeps one compiled program for all
    color weights).
    Returns (pose [3, 4], inlier_rms, inlier_count) — all device values.
    """
    src = src.astype(jnp.float32)
    tgt = tgt.astype(jnp.float32)
    tgt_f = jnp.concatenate([tgt, tgt_cfeat.astype(jnp.float32)], axis=-1)
    tgt_sq = jnp.sum(tgt_f * tgt_f, axis=-1)  # [M]
    # invalid targets must never be selected
    tgt_sq = jnp.where(tgt_valid, tgt_sq, jnp.inf)
    src_cf = src_cfeat.astype(jnp.float32)

    def body(pose, it):
        # anneal the correspondence gate from coarse to strict
        frac = it.astype(jnp.float32) / max(iters - 1, 1)
        gate = dist_start + (dist_end - dist_start) * frac
        moved = src @ pose[:3, :3].T + pose[:3, 3]  # [N, 3]
        moved_f = jnp.concatenate([moved, src_cf], axis=-1)
        # |x|^2 - 2xy + |y|^2 can dip slightly negative at ~0 distance
        # (catastrophic cancellation) — clamp so sqrt/rms stays finite
        d2 = jnp.maximum(
            jnp.sum(moved_f * moved_f, axis=-1)[:, None]
            - 2.0 * (moved_f @ tgt_f.T)
            + tgt_sq[None, :],
            0.0,
        )  # [N, M]
        nn = jnp.argmin(d2, axis=-1)  # [N] — selected in combined space
        # gate on GEOMETRIC distance only: the combined metric grows with
        # the color weight, so a fixed gate in combined space starves the
        # inlier set at high lam (measured: 30-79/4096 inliers at lam=0.5)
        diff = moved - tgt[nn]
        nn_d2 = jnp.sum(diff * diff, axis=-1)
        w = (
            (nn_d2 < gate * gate) & src_valid & tgt_valid[nn]
        ).astype(jnp.float32)
        new_pose = weighted_rigid_transform(src, tgt[nn], w)
        # a degenerate iteration (<3 inliers) keeps the previous pose
        ok = jnp.sum(w) >= 3.0
        pose = jnp.where(ok, new_pose, pose)
        return pose, (nn_d2, w)

    pose, (nn_d2, w) = jax.lax.scan(
        body, init_pose.astype(jnp.float32), jnp.arange(iters)
    )
    last_d2, last_w = nn_d2[-1], w[-1]
    cnt = jnp.sum(last_w)
    # inf distances (all-invalid target rows) carry weight 0 but inf*0=nan
    safe_d2 = jnp.where(last_w > 0, last_d2, 0.0)
    rms = jnp.sqrt(jnp.sum(safe_d2) / jnp.maximum(cnt, 1.0))
    return pose, rms, cnt


@partial(jax.jit, static_argnames=("trim",))
def score_pose_feat(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    src_cfeat: jnp.ndarray,
    tgt_cfeat: jnp.ndarray,
    src_valid: jnp.ndarray,
    tgt_valid: jnp.ndarray,
    pose: jnp.ndarray,
    trim: float = 0.9,
) -> jnp.ndarray:
    """Color-aware trimmed-NN pose score: NN in (xyz, cfeat) joint space,
    trimmed mean of the JOINT distance. On locally self-similar fleet
    clouds (sphere/box clusters) geometry-only NN cannot discriminate a
    136-deg-wrong pose from the right one (measured round 5: all race
    candidates scored 0.024-0.029 while their GT errors spanned 8-136
    deg); color mismatch at the NN separates them. cfeat = lam * rgb with
    the ICP convention (lam ~ 0.5)."""
    src_f = jnp.concatenate(
        [src.astype(jnp.float32), src_cfeat.astype(jnp.float32)], axis=-1)
    tgt_f = jnp.concatenate(
        [tgt.astype(jnp.float32), tgt_cfeat.astype(jnp.float32)], axis=-1)
    moved = src_f.at[:, :3].set(
        src_f[:, :3] @ pose[:3, :3].T + pose[:3, 3])
    tgt_sq = jnp.where(tgt_valid, jnp.sum(tgt_f * tgt_f, axis=-1), jnp.inf)
    d2 = jnp.maximum(
        jnp.sum(moved * moved, axis=-1)[:, None]
        - 2.0 * (moved @ tgt_f.T)
        + tgt_sq[None, :],
        0.0,
    )
    nn_d = jnp.sqrt(jnp.min(d2, axis=-1))
    nn_d = jnp.where(src_valid, nn_d, jnp.inf)
    count = jnp.sum(src_valid.astype(jnp.int32))
    k = jnp.maximum((count.astype(jnp.float32) * trim).astype(jnp.int32), 1)
    sorted_d = jnp.sort(nn_d)
    keep = jnp.arange(nn_d.shape[0]) < k
    vals = jnp.where(keep & jnp.isfinite(sorted_d), sorted_d, 0.0)
    return jnp.sum(vals) / jnp.maximum(jnp.minimum(k, count), 1)


@partial(jax.jit, static_argnames=("trim",))
def score_pose(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    src_valid: jnp.ndarray,
    tgt_valid: jnp.ndarray,
    pose: jnp.ndarray,
    trim: float = 0.9,
) -> jnp.ndarray:
    """Common multi-start objective: trimmed (lowest `trim` fraction) mean geometric NN
    distance of valid src points under `pose`. Color plays no part here —
    candidates with different feature weights need one comparable metric."""
    src = src.astype(jnp.float32)
    tgt = tgt.astype(jnp.float32)
    moved = src @ pose[:3, :3].T + pose[:3, 3]
    tgt_sq = jnp.where(tgt_valid, jnp.sum(tgt * tgt, axis=-1), jnp.inf)
    d2 = jnp.maximum(
        jnp.sum(moved * moved, axis=-1)[:, None]
        - 2.0 * (moved @ tgt.T)
        + tgt_sq[None, :],
        0.0,
    )
    nn_d = jnp.sqrt(jnp.min(d2, axis=-1))
    # exclude padded src rows by pushing them past the trim horizon
    nn_d = jnp.where(src_valid, nn_d, jnp.inf)
    # trim fraction of the VALID count, not the padded capacity — a cloud
    # with < trim*capacity valid points must still drop its worst 1-trim
    # tail or partial-overlap robustness vanishes on sparse clouds
    # (ADVICE r4). k is traced, so rank-indicator weighting replaces top_k.
    count = jnp.sum(src_valid.astype(jnp.int32))
    k = jnp.maximum((count.astype(jnp.float32) * trim).astype(jnp.int32), 1)
    sorted_d = jnp.sort(nn_d)
    keep = jnp.arange(nn_d.shape[0]) < k
    vals = jnp.where(keep & jnp.isfinite(sorted_d), sorted_d, 0.0)
    return jnp.sum(vals) / jnp.maximum(jnp.minimum(k, count), 1)


def _prep(points: np.ndarray, colors, n: int, rng: np.random.Generator):
    """Subsample-or-pad to exactly `n` points + validity mask."""
    pts = np.asarray(points, np.float32).reshape(-1, 3)
    if colors is None:
        cols = np.zeros((pts.shape[0], 3), np.float32)
    else:
        cols = np.asarray(colors, np.float32).reshape(-1, 3)
        if cols.size and cols.max() > 1.0:
            cols = cols / 255.0
    m = pts.shape[0]
    if m >= n:
        idx = rng.choice(m, n, replace=False)
        return pts[idx], cols[idx], np.ones(n, bool)
    out = np.zeros((n, 3), np.float32)
    out[:m] = pts
    outc = np.zeros((n, 3), np.float32)
    outc[:m] = cols
    valid = np.zeros(n, bool)
    valid[:m] = True
    return out, outc, valid


def icp_refine(
    src_points: np.ndarray,
    tgt_points: np.ndarray,
    init_pose: np.ndarray,
    voxel_size: float = 0.05,
    iters: int = 30,
    n_points: int = 4096,
    seed: int = 0,
    src_colors: Optional[np.ndarray] = None,
    tgt_colors: Optional[np.ndarray] = None,
    color_weights: Tuple[float, ...] = (0.0, 0.25, 0.5),
) -> Tuple[Optional[np.ndarray], float, int]:
    """Host-facing refinement: returns (pose_3x4 | None, inlier_rms, count).

    Multi-start: one ICP run per color weight (geometry-only when colors
    are absent), plus the unrefined init, all scored by `score_pose`
    (trimmed geometric NN) — the returned pose is the best candidate, so
    refinement never degrades its input under that metric. The strict
    final gate is `voxel_size * 0.4` (reference recipe,
    global_registration.py:90), annealed in from 3x.
    Returns None when the refinement never found >= 3 correspondences.
    """
    rng = np.random.default_rng(seed)
    src, src_c, sv = _prep(src_points, src_colors, n_points, rng)
    tgt, tgt_c, tv = _prep(tgt_points, tgt_colors, n_points, rng)
    if sv.sum() < 3 or tv.sum() < 3:
        return None, float("inf"), 0
    init = np.asarray(init_pose, np.float32)
    if init.shape == (4, 4):
        init = init[:3, :4]
    src_j, tgt_j = jnp.asarray(src), jnp.asarray(tgt)
    sv_j, tv_j = jnp.asarray(sv), jnp.asarray(tv)
    init_j = jnp.asarray(init)

    lams = list(color_weights) if src_colors is not None else [0.0]
    cands = [(init_j, jnp.inf, jnp.asarray(0.0))]  # the unrefined init
    # two coarse-gate starts: 3x voxel (reference-like local polish) and
    # 8x (wide basin — a 16 deg rotation at object radius 0.5 displaces
    # points ~0.14, past the 3x gate at fleet voxel pitch)
    for gate0 in (3.0, 8.0):
        for lam in lams:
            pose, rms, cnt = icp_core(
                src_j, tgt_j,
                jnp.asarray(lam * src_c), jnp.asarray(lam * tgt_c),
                sv_j, tv_j, init_j,
                jnp.asarray(gate0 * voxel_size, jnp.float32),
                jnp.asarray(0.4 * voxel_size, jnp.float32),
                iters=iters,
            )
            cands.append((pose, rms, cnt))

    # color-aware winner selection when colors exist: geometry-only
    # trimmed NN cannot separate a stalled slide-on-spheres candidate
    # from a converged one (round-5 race measurements) — the same joint
    # (xyz, 0.5*rgb) metric used for global-candidate selection
    if src_colors is not None:
        sc_j, tc_j = jnp.asarray(0.5 * src_c), jnp.asarray(0.5 * tgt_c)
        scores = [float(score_pose_feat(
            src_j, tgt_j, sc_j, tc_j, sv_j, tv_j, p)) for p, _, _ in cands]
    else:
        scores = [float(score_pose(src_j, tgt_j, sv_j, tv_j, p))
                  for p, _, _ in cands]
    best = int(np.argmin(scores))
    pose, rms, cnt = cands[best]
    if best == 0:
        # init won: report its own inlier stats via the strict gate
        _, rms, cnt = icp_core(
            src_j, tgt_j, jnp.zeros_like(src_j), jnp.zeros_like(tgt_j),
            sv_j, tv_j, init_j,
            jnp.asarray(0.4 * voxel_size, jnp.float32),
            jnp.asarray(0.4 * voxel_size, jnp.float32),
            iters=1,
        )
        pose = init_j
    cnt = int(cnt)
    if cnt < 3:
        return None, float(rms), cnt
    return np.asarray(pose), float(rms), cnt
