"""Classical-baseline debug on the REAL fleet clouds (VERDICT r4 item 4).

The committed round-4 fgr_metrics_test.json was produced BEFORE the
multi-scale FGR/RANSAC race landed (every pair has winner=None): it ran
single-scale run_registration. This script re-evaluates the committed
failing scenes (12-15) with the actual `best_global_registration` race +
color ICP polish, prints per-candidate scores, and writes
experiments/stage3/fgr_debug.json.

CPU-only (score_pose/icp jit forced off the TPU): safe to run beside a
TPU job. Run: PYTHONPATH=/root/repo nice -n 19 python scripts/experiments/fgr_debug.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from dregnerf_tpu.datasets.register_pairs import NeRFRegDataset  # noqa: E402
from dregnerf_tpu.geometry import se3  # noqa: E402
from dregnerf_tpu.io.ply import read_ply  # noqa: E402
from dregnerf_tpu.registration.icp import icp_refine  # noqa: E402
from dregnerf_tpu.registration.pipeline import (  # noqa: E402
    best_global_registration,
)

REG_ROOT = os.environ.get("FGR_REGDATA", "/tmp/stage3_fleet/regdata")
SCENES = os.environ.get("FGR_SCENES", "scene_12,scene_13,scene_14,scene_15")
VOXELS = tuple(float(v) for v in os.environ.get(
    "FGR_VOXELS", "0.03,0.05").split(","))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "experiments", "stage3", "fgr_debug.json")


def main():
    import jax.numpy as jnp

    rows = []
    for scene in SCENES.split(","):
        ds = NeRFRegDataset(REG_ROOT, subject_id=scene, split="test", seed=0)
        if len(ds) == 0:
            print(f"[fgr] {scene}: missing artifacts, skipped", flush=True)
            continue
        for order in [(0, 1), (1, 0)]:
            ds.fixed_order = order
            item = ds[0]
            src_pts, src_cols = read_ply(item["src_ply_path"])
            tgt_pts, tgt_cols = read_ply(item["tgt_ply_path"])
            gt = jnp.asarray(np.asarray(item["pose"])[:3, :4], jnp.float32)

            def err(T):
                r, t = se3.pose_error(
                    jnp.asarray(np.asarray(T)[:3, :4], jnp.float32), gt)
                return float(r), float(t)

            t0 = time.time()
            T, info = best_global_registration(
                src_pts, tgt_pts, src_colors=src_cols, tgt_colors=tgt_cols,
                voxel_sizes=VOXELS, refine=False)
            row = {"scene": scene, "order": list(order),
                   "n_src": int(len(src_pts)), "n_tgt": int(len(tgt_pts)),
                   "time_s": round(time.time() - t0, 1),
                   "candidates": info.get("candidates"),
                   "winner": info.get("winner")}
            if T is None:
                row["error"] = "no candidate"
                rows.append(row)
                print(json.dumps(row), flush=True)
                continue
            rre, rte = err(T)
            row["RRE_race"] = round(rre, 2)
            row["RTE_race"] = round(rte, 4)
            # per-candidate GT errors (diagnosis only — the pipeline's
            # winner selection stays GT-free)
            for cand in row.get("candidates") or []:
                if cand.get("T") is not None:
                    r, t = err(np.asarray(cand.pop("T")))
                    cand["RRE_gt"] = round(r, 2)
                    cand["RTE_gt"] = round(t, 4)
            T_i, rms, cnt = icp_refine(
                src_pts, tgt_pts, np.asarray(T)[:3, :4],
                voxel_size=2.0 / 128 * 2,
                src_colors=src_cols, tgt_colors=tgt_cols)
            if T_i is not None:
                rre_i, rte_i = err(T_i)
                row["RRE_icp"] = round(rre_i, 2)
                row["RTE_icp"] = round(rte_i, 4)
            rows.append(row)
            print(json.dumps(row), flush=True)
        ds.fixed_order = None

    rre = np.array([r["RRE_icp" if "RRE_icp" in r else "RRE_race"]
                    for r in rows if "RRE_race" in r])
    agg = {"R_mean": float(rre.mean()) if len(rre) else None,
           "R_med": float(np.median(rre)) if len(rre) else None,
           "rows": rows}
    with open(OUT, "w") as f:
        json.dump(agg, f, indent=2)
    print(f"[fgr] aggregate R_mean {agg['R_mean']} R_med {agg['R_med']} "
          f"-> {OUT}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
