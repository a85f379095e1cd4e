"""InfoNCE A/B (round-4 VERDICT #2 done-criterion): same data, same seed,
same iteration budget — feature-loss weight 0.1 (default) vs 0.0 — and
compare the held-out val-RRE curves.

Context: the reference trains with InfoNCE at weight 0.1
(/root/reference/train_nerf_regtr.py:104-122, conerf/loss/feature_loss.py:4-73).
Round 4 shipped the loss parity-tested but measured DEAD in production
(`feature 0.0000` every iteration — fixed r_p=0.2 was empty at fleet token
spacing). Round 5 made the radii scale-aware (ce4e82b); this experiment
isolates whether the now-alive loss actually buys registration quality.

Runs on the cached stage-3 fleet artifacts; each arm is trained in-process
(the weight is a trace-time constant, so each arm traces its own step).

Env: AB_ITERS (default 2500), AB_TRAIN_SCENES / AB_TEST_SCENES (defaults:
the stage3c split), STAGE3_WORK.
Output: experiments/stage3/infonce_ab.json (+ git commit).
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/dregnerf_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from stage3_fleet import merged_dataset, commit_progress, OUT  # noqa: E402

from dregnerf_tpu.runtime.config import config_parser  # noqa: E402
from dregnerf_tpu.runtime import reg_trainer as RT  # noqa: E402

WORK = os.environ.get("STAGE3_WORK", "/tmp/stage3_fleet")
ITERS = int(os.environ.get("AB_ITERS", 2500))
N_TRAIN = int(os.environ.get("AB_TRAIN_SCENES", 32))
N_TEST = int(os.environ.get("AB_TEST_SCENES", 8))
VAL_EVERY = 500


def run_arm(feature_w: float, train_ds, val_ds, reg_root: str) -> dict:
    RT.LOSS_WEIGHTS["feature"] = feature_w
    cfg = config_parser([
        "--dataset", "objaverse", "--root_dir", reg_root,
        "--expname", f"ab_f{feature_w:g}", "--out_dir",
        os.path.join(WORK, "about"),
        "--aabb=-1.0,-1.0,-1.0,1.0,1.0,1.0", "--robust_loss",
        "--epochs", str(max(1, ITERS // max(1, len(train_ds)))),
        "--n_tensorboard", "1000000", "--n_validation", "1000000",
        "--n_checkpoint", "1000000", "--lr", "1e-4",
        "--val_fraction", "1.0",
        "--reg_device_cache", str(2 * (N_TRAIN + N_TEST) + 8),
    ])
    trainer = RT.RegTrainer(cfg, train_ds, val_ds)
    curve = []
    feats, matches = [], []
    t0 = time.time()
    for it in range(ITERS):
        item = train_ds.get_raw(it % len(train_ds))
        trainer.iteration = it  # drives the in-jit augmentation key
        m = trainer.train_iteration(item)
        if it % 100 == 0:
            feats.append(float(m.get("feature", -1.0)))
            matches.append(float(m.get("feature_matches", -1.0)))
        if (it + 1) % VAL_EVERY == 0:
            score = trainer.validate(1.0)  # -mean(RRE) over 16 pairs
            curve.append({"iter": it + 1, "val_rre": round(-float(score), 3)})
            print(f"[ab f={feature_w:g}] iter {it+1} val_rre "
                  f"{-float(score):.3f} ({time.time()-t0:.0f}s)", flush=True)
    return {
        "feature_weight": feature_w,
        "iters": ITERS,
        "curve": curve,
        "best_val_rre": min(c["val_rre"] for c in curve) if curve else None,
        "final_val_rre": curve[-1]["val_rre"] if curve else None,
        "feature_loss_trace": [round(f, 3) for f in feats[:: max(1, len(feats) // 10)]],
        "feature_matches_mean": round(float(np.mean([m for m in matches if m >= 0])), 1)
        if matches else None,
        "wall_s": round(time.time() - t0, 1),
    }


def main() -> None:
    reg_root = os.path.join(WORK, "regdata")
    # independent of the STAGE3_SCENES env (stage3_fleet.scene_names()
    # reads it; this script is launched without the fleet's env)
    names = [f"scene_{i:02d}" for i in range(N_TRAIN + N_TEST)]
    train_scenes = names[:N_TRAIN]
    test_scenes = names[N_TRAIN:N_TRAIN + N_TEST]
    # only scenes whose extracted artifacts exist (fleet may have stopped
    # early at the train deadline); scenes live under regdata/nerf_models/
    models_dir = os.path.join(reg_root, "nerf_models")
    have = set(os.listdir(models_dir)) if os.path.isdir(models_dir) else set()
    train_scenes = [s for s in train_scenes if s in have]
    test_scenes = [s for s in test_scenes if s in have]
    if len(train_scenes) < 4 or len(test_scenes) < 2:
        print(f"[ab] not enough cached scenes (train {len(train_scenes)}, "
              f"test {len(test_scenes)}) — aborting", flush=True)
        return
    print(f"[ab] {len(train_scenes)} train / {len(test_scenes)} test scenes, "
          f"{ITERS} iters per arm", flush=True)
    train_ds = merged_dataset(reg_root, train_scenes, "train", seed=3)
    val_ds = merged_dataset(reg_root, test_scenes, "test", seed=4)

    out = {"train_scenes": len(train_scenes), "test_scenes": len(test_scenes)}
    for w in (0.1, 0.0):
        out[f"feature_{w:g}"] = run_arm(w, train_ds, val_ds, reg_root)
        path = os.path.join(OUT, "infonce_ab.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=2, sort_keys=True)
        print(f"[ab] wrote {path}", flush=True)
        commit_progress(f"infonce A/B arm f={w:g} done")
    a, b = out["feature_0.1"], out["feature_0"]
    print(f"[ab] RESULT best val RRE: with-InfoNCE {a['best_val_rre']} vs "
          f"without {b['best_val_rre']}", flush=True)


if __name__ == "__main__":
    main()
