"""Grid-vs-exact visibility supervision: converged-RRE effect (VERDICT r2 #7).

The trainers default to `grid_visibility` (voxel-mask gather) for the GT
overlap labels; the reference marches the actual NeRFs every iteration
(conerf/loss/confidence_loss.py:56-160). This experiment measures whether
that shortcut costs accuracy:

  1. start from the CONVERGED stage-3 RegTr checkpoint (grid-mode fleet,
     scripts/experiments/stage3_fleet.py must have completed);
  2. fine-tune two branches from that same state for FT_ITERS iterations:
     one with --visibility grid, one with --visibility exact;
  3. evaluate held-out RRE/RTE for base / grid-ft / exact-ft;
  4. also record raw LABEL AGREEMENT between grid and exact visibility on
     sampled keypoints of several train pairs.

Writes experiments/stage3/visibility_effect.json.

Run after stage3_fleet.py on the TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/experiments/visibility_effect.py
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

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from stage3_fleet import (  # noqa: E402
    N_SCENES, N_TEST_SCENES, WORK, OUT, merged_dataset, scene_names,
)

from dregnerf_tpu.runtime.config import config_parser  # noqa: E402

FT_ITERS = int(os.environ.get("VISFX_ITERS", 500))
N_EVAL_DRAWS = 3


def make_trainer(mode: str, reg_root: str, tag: str):
    from dregnerf_tpu.runtime import reg_trainer as RT

    names = scene_names()
    train_scenes = names[: N_SCENES - N_TEST_SCENES]
    test_scenes = names[N_SCENES - N_TEST_SCENES:]
    train_ds = merged_dataset(reg_root, train_scenes, "train", seed=3)
    val_ds = merged_dataset(reg_root, test_scenes, "test", seed=4)

    # the latest converged stage-3 iterate (file, not dir — np.load);
    # fine-tuning resumes optimizer state from the same artifact.
    # Honor STAGE3_EXPNAME (ADVICE r4: a hardcoded "stage3" silently loads
    # a stale round-4 checkpoint when the fleet ran as stage3b/stage3c).
    fleet_exp = os.environ.get("STAGE3_EXPNAME", "stage3")
    base_ckpt = os.path.join(WORK, "regout", fleet_exp, "model", "model.ckpt")
    cfg = config_parser([
        "--dataset", "objaverse", "--root_dir", reg_root,
        "--expname", f"visfx_{tag}",
        "--out_dir", os.path.join(WORK, "visfx"),
        "--aabb=-1.0,-1.0,-1.0,1.0,1.0,1.0", "--robust_loss",
        "--epochs", "1",
        "--n_tensorboard", "100", "--n_validation", "1000000",
        "--n_checkpoint", "1000000", "--lr", "1e-4",
        "--visibility", mode,
        "--ckpt_path", base_ckpt,
        "--vis_max_cameras", "40",
        # hold EVERY block of the run on device: any eviction re-upload
        # leaks host RSS through the axon tunnel (rss_leak_probe.json)
        "--reg_device_cache", str(2 * N_SCENES + 8),
    ])
    trainer = RT.RegTrainer(cfg, train_ds, val_ds)
    trainer.load_checkpoint()
    assert trainer.iteration > 0, (
        f"no converged stage-3 checkpoint under {base_ckpt} — run "
        "stage3_fleet.py first"
    )
    return trainer, val_ds


def eval_heldout(trainer, val_ds):
    rres, rtes = [], []
    # deterministic both-order draws (matches the fleet eval), routed
    # through the device grid cache: the plain _to_device path leaks its
    # host buffer per upload through the axon tunnel (rss_leak_probe.json)
    orders = ([(0, 1), (1, 0)] if hasattr(val_ds, "meta")
              else [None] * N_EVAL_DRAWS)
    for i in range(len(val_ds)):
        for d, order in enumerate(orders):
            if order is not None:
                val_ds.fixed_order = order
            else:
                val_ds.rng = np.random.default_rng(1000 * i + d)
            item = val_ds[i]
            if "src_cache_key" in item and trainer._dev_cache_size > 0:
                batch = trainer._to_device_cached(item)
            else:
                batch = trainer._to_device(item)
            _, rre, rte = trainer._eval_fn(trainer.params, batch)
            rres.append(float(rre))
            rtes.append(float(rte))
        if orders[0] is not None:
            val_ds.fixed_order = None
    return {
        "R_mean": float(np.mean(rres)), "R_med": float(np.median(rres)),
        "R_std": float(np.std(rres)),
        "t_mean": float(np.mean(rtes)), "t_med": float(np.median(rtes)),
        "n_pairs": len(rres),
    }


def finetune(trainer, iters: int):
    rng = np.random.default_rng(123)
    n = len(trainer.train_dataset)
    t0 = time.time()
    # grid mode rides the device-cached get_raw path (in-jit augmentation,
    # zero per-iter uploads); exact mode needs __getitem__ items (the
    # exact step loads NeRF contexts per pair) — its per-iter grid upload
    # leaks host RSS, bounded by FT_ITERS in this short isolated process.
    use_raw = getattr(trainer, "visibility", "grid") != "exact"
    for it in range(iters):
        idx = int(rng.integers(n))
        item = (trainer.train_dataset.get_raw(idx)
                if use_raw else trainer.train_dataset[idx])
        metrics = trainer.train_iteration(item)
        trainer.iteration += 1
        if it % 100 == 0:
            print(
                f"[ft] {it}/{iters} total={float(metrics['total']):.4f} "
                f"({time.time() - t0:.0f}s)", flush=True,
            )
    return (time.time() - t0) / max(iters, 1)


def label_agreement(trainer, n_pairs: int = 4, n_points: int = 2048):
    """Fraction of sampled GT-keypoint labels where grid == exact."""
    from dregnerf_tpu.losses.visibility import (
        exact_visibility_ctx, grid_visibility, load_visibility_context,
    )

    rng = np.random.default_rng(0)
    rows = []
    for i in range(min(n_pairs, len(trainer.train_dataset))):
        item = trainer.train_dataset[i]
        batch = trainer._to_device(item)
        mask = np.asarray(batch["src_mask"])
        res = trainer.grid_resolution
        pts = rng.uniform(-1.0, 1.0, (n_points, 3)).astype(np.float32)
        g = grid_visibility(
            jnp.asarray(pts), jnp.asarray(mask).reshape(-1),
            trainer.aabb, res,
        )
        ctx, model_cfg, rcfg = load_visibility_context(
            item["src_nerf_path"], max_cameras=40
        )
        e = exact_visibility_ctx(ctx, model_cfg, rcfg, jnp.asarray(pts))
        agree = float(jnp.mean((g > 0.5) == (e > 0.5)))
        rows.append({"scene": item["scene"], "agreement": round(agree, 4)})
        print(f"[labels] {item['scene']}: grid==exact on {agree:.1%} "
              f"of {n_points} points", flush=True)
    return rows


def _write(results):
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "visibility_effect.json"), "w") as f:
        json.dump(results, f, indent=2)


def main():
    reg_root = os.path.join(WORK, "regdata")
    results = {"ft_iters": FT_ITERS}

    # write after every stage: the queue bounds this script with `timeout`
    # and the cheap stages (base eval, label agreement, grid-ft) must
    # survive a deadline kill during the expensive exact-ft tail
    trainer_g, val_ds = make_trainer("grid", reg_root, "grid")
    results["base"] = eval_heldout(trainer_g, val_ds)
    print("[base]", json.dumps(results["base"]), flush=True)
    _write(results)

    results["label_agreement"] = label_agreement(trainer_g)
    _write(results)

    s_per_it = finetune(trainer_g, FT_ITERS)
    results["grid_ft"] = {**eval_heldout(trainer_g, val_ds),
                          "s_per_iter": round(s_per_it, 3)}
    print("[grid_ft]", json.dumps(results["grid_ft"]), flush=True)
    _write(results)
    del trainer_g

    trainer_e, val_ds = make_trainer("exact", reg_root, "exact")
    s_per_it = finetune(trainer_e, FT_ITERS)
    results["exact_ft"] = {**eval_heldout(trainer_e, val_ds),
                           "s_per_iter": round(s_per_it, 3)}
    print("[exact_ft]", json.dumps(results["exact_ft"]), flush=True)

    _write(results)
    print(json.dumps({k: v for k, v in results.items()
                      if k != "label_agreement"}), flush=True)


if __name__ == "__main__":
    main()
