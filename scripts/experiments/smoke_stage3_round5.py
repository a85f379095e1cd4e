"""Round-5 pre-fleet smoke of the changed stage-3 path, on the REAL TPU.

Drives ~60 train iterations + one full validate() against the cached
round-4 fleet artifacts and checks, in one process:
  * the device grid cache never evicts (upload-leak fix: every axon
    upload permanently retains its buffer host-side — probe_upload_leak);
  * validate() routes through the cached path (second validate adds ZERO
    uploads);
  * the scale-aware InfoNCE (ce4e82b) produces nonzero feature_matches
    on real fleet grids — the round-4 loss was measured dead;
  * RSS across iterations stays flat (< 2 MB/iter drift).

Also pre-warms the new model's compile cache for the fleet launch.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/experiments/smoke_stage3_round5.py
"""
from __future__ import annotations

import json
import os
import time

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/dregnerf_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import numpy as np

from dregnerf_tpu.runtime.config import config_parser
from dregnerf_tpu.runtime import reg_trainer as RT

import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from stage3_fleet import merged_dataset  # noqa: E402

WORK = os.environ.get("STAGE3_WORK", "/tmp/stage3_fleet")


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main():
    reg_root = os.path.join(WORK, "regdata")
    train_scenes = [f"scene_{i:02d}" for i in range(0, 6)]
    test_scenes = [f"scene_{i:02d}" for i in range(12, 14)]
    train_ds = merged_dataset(reg_root, train_scenes, "train", seed=3)
    val_ds = merged_dataset(reg_root, test_scenes, "test", seed=4)
    cfg = config_parser([
        "--dataset", "objaverse", "--root_dir", reg_root,
        "--expname", "smoke_r5", "--out_dir", "/tmp/smoke_r5",
        "--aabb=-1.0,-1.0,-1.0,1.0,1.0,1.0", "--robust_loss",
        "--epochs", "1", "--lr", "1e-4", "--val_fraction", "1.0",
        "--reg_device_cache", str(2 * 8 + 8),
    ])
    trainer = RT.RegTrainer(cfg, train_ds, val_ds)

    t0 = time.time()
    matches, rss_trace = [], []
    for it in range(60):
        item = train_ds.get_raw(it % len(train_ds))
        trainer.iteration = it
        m = trainer.train_iteration(item)
        if it == 0:
            print(f"[smoke] first step (compile) {time.time()-t0:.0f}s",
                  flush=True)
        if it % 10 == 0:
            fm = float(m.get("feature_matches", -1))
            fl = float(m.get("feature", -1))
            matches.append(fm)
            rss_trace.append(round(rss_mb(), 1))
            print(f"[smoke] it {it} feature {fl:.4f} matches {fm:.0f} "
                  f"rss {rss_trace[-1]:.0f}MB uploads "
                  f"{trainer._dev_uploads} evict {trainer._dev_evictions}",
                  flush=True)

    up_before = trainer._dev_uploads
    s1 = trainer.validate()
    up_mid = trainer._dev_uploads
    s2 = trainer.validate()
    up_after = trainer._dev_uploads
    out = {
        "feature_matches": matches,
        "rss_trace_mb": rss_trace,
        "rss_drift_mb_per_iter": round(
            (rss_trace[-1] - rss_trace[1]) / (10 * max(len(rss_trace) - 2, 1)), 3),
        "uploads_train": up_before,
        "uploads_first_validate": up_mid - up_before,
        "uploads_second_validate": up_after - up_mid,
        "evictions": trainer._dev_evictions,
        "val_scores": [round(float(s1), 3), round(float(s2), 3)],
        "ok": (trainer._dev_evictions == 0
               and up_after == up_mid
               and max(matches) > 0),
    }
    print(json.dumps(out), flush=True)
    with open("/tmp/smoke_r5.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
