"""Host-RSS bisect probe for the stage-3 RegTr training loop.

Round-4 judge finding (VERDICT Weak #1): the stage-3 fleet python gets
OOM-killed at ~130 GB anon-rss (~45 MB/iter growth). This probe drives
RegTrainer.train_iteration on the real fleet regdata for a few hundred
iterations and prints RSS every N iters, with env knobs to bisect:

  RSS_MODE=aug    (default) device-cache + in-jit augmentation path
  RSS_MODE=plain  host __getitem__ path (no device cache)
  RSS_MODE=sync   aug path + jax.block_until_ready(metrics) every iter
  RSS_MODE=nostep aug path with the jitted step SKIPPED (data only)
  RSS_ITERS=200   iteration count
  RSS_SCENES=4    scenes from the fleet regdata

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/perf/probe_reg_rss.py
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

MODE = os.environ.get("RSS_MODE", "aug")
ITERS = int(os.environ.get("RSS_ITERS", 200))
N_SCENES = int(os.environ.get("RSS_SCENES", 4))
REG_ROOT = os.environ.get("RSS_REGDATA", "/tmp/stage3_fleet/regdata")


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main():
    from dregnerf_tpu.datasets.register_pairs import NeRFRegDataset
    from dregnerf_tpu.runtime.config import config_parser
    from dregnerf_tpu.runtime.reg_trainer import RegTrainer

    ds = None
    for i in range(N_SCENES):
        one = NeRFRegDataset(REG_ROOT, subject_id=f"scene_{i:02d}",
                             split="train", seed=3)
        ds = one if ds is None else (ds.meta.extend(one.meta) or ds)
    cfg = config_parser([
        "--dataset", "objaverse", "--root_dir", REG_ROOT,
        "--expname", "rssprobe", "--out_dir", "/tmp/rssprobe",
        "--aabb=-1.0,-1.0,-1.0,1.0,1.0,1.0", "--robust_loss",
        "--epochs", "1",
    ])
    if MODE == "plain":
        cfg.reg_device_cache = 0
    if os.environ.get("RSS_CACHE"):
        cfg.reg_device_cache = int(os.environ["RSS_CACHE"])
    print(f"[rss] building trainer (init compile) RSS {rss_mb():.0f} MB",
          flush=True)
    trainer = RegTrainer(cfg, ds, ds)
    print(f"[rss] trainer ready RSS {rss_mb():.0f} MB", flush=True)

    use_raw = MODE in ("aug", "sync", "nostep")
    fetch = ds.get_raw if use_raw else ds.__getitem__
    rng = np.random.default_rng(0)
    trace = []
    t0 = time.time()
    print(f"[rss] mode={MODE} start {rss_mb():.0f} MB", flush=True)
    from dregnerf_tpu.runtime.resilience import Watchdog

    wd = Watchdog(900, name="rss-probe")
    wd.__enter__()
    for it in range(ITERS):
        wd.beat()
        item = fetch(int(rng.integers(len(ds))))
        if MODE == "nostep":
            trainer._to_device_cached(item)  # data movement only
        else:
            trainer.iteration = it
            metrics = trainer.train_iteration(item)
            if MODE == "sync":
                jax.block_until_ready(metrics)
        if (it + 1) % 20 == 0:
            m = rss_mb()
            trace.append({"iter": it + 1, "rss_mb": round(m, 1)})
            print(f"[rss] iter {it+1} RSS {m:.0f} MB "
                  f"({(time.time()-t0)/(it+1):.2f} s/it)", flush=True)
    out = {"mode": MODE, "iters": ITERS, "trace": trace,
           "mb_per_iter": round(
               (trace[-1]["rss_mb"] - trace[0]["rss_mb"])
               / max(trace[-1]["iter"] - trace[0]["iter"], 1), 3)
           if len(trace) >= 2 else None}
    print(json.dumps(out), flush=True)
    with open(f"/tmp/rss_probe_{MODE}.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
