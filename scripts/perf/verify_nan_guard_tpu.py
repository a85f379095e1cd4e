"""Drive the NaN-guarded RegTr train step on the REAL TPU (tiny fixture).

Verifies (on-device, not CPU-only):
  1. a clean batch trains with finite losses and skipped_nonfinite == 0;
  2. a batch with NaN grid features raises skipped_nonfinite == 1 and
     leaves params bit-identical (the round-4 stage-3 divergence guard);
  3. the next clean step after a skipped one still updates params.

Run: timeout 900 python scripts/perf/verify_nan_guard_tpu.py
"""
import json
import os
import sys
import tempfile

import numpy as np


def make_fixture(root):
    rng = np.random.default_rng(0)
    scene = "test_scene"
    sph = rng.normal(size=(800, 3))
    sph /= np.linalg.norm(sph, axis=1, keepdims=True)
    base = np.vstack([
        sph * np.array([0.5, 0.3, 0.2]),
        rng.normal(size=(200, 3)) * 0.05 + np.array([0.45, 0.25, 0.1]),
    ])
    from dregnerf_tpu.datasets.base import random_se3_np
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../../tests"))
    from test_reg_training import make_block_artifacts  # type: ignore

    transforms = {0: random_se3_np(rng), 1: random_se3_np(rng)}
    img_dir = os.path.join(root, "images", scene)
    os.makedirs(img_dir, exist_ok=True)
    with open(os.path.join(img_dir, "world_frame_transforms.json"), "w") as f:
        json.dump({str(k): v.tolist() for k, v in transforms.items()}, f)
    for k, T in transforms.items():
        make_block_artifacts(
            os.path.join(root, "nerf_models", scene, f"block_{k}"), rng, T,
            base,
        )
    return scene


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices())

    from dregnerf_tpu.datasets.register_pairs import NeRFRegDataset
    from dregnerf_tpu.losses import registration as L
    from dregnerf_tpu.models.regtr import NeRFRegTr
    from dregnerf_tpu.runtime import reg_trainer as RT
    from dregnerf_tpu.runtime.checkpoint import CheckpointManager
    from dregnerf_tpu.runtime.config import config_parser

    root = tempfile.mkdtemp(prefix="nanguard_")
    scene = make_fixture(root)
    out = os.path.join(root, "out")
    cfg = config_parser([
        "--dataset", "objaverse", "--root_dir", root, "--expname", "g",
        "--out_dir", out, "--no_bf16",
        "--compilation_cache", "/tmp/dregnerf_jax_cache",
    ])
    ds = NeRFRegDataset(root, subject_id=scene, split="train", seed=5)
    tr = RT.RegTrainer.__new__(RT.RegTrainer)
    tr.config = cfg
    tr.train_dataset = ds
    tr.val_dataset = ds
    tr.output_dir = os.path.join(out, "g")
    os.makedirs(tr.output_dir, exist_ok=True)
    tr.ckpt_manager = CheckpointManager(os.path.join(tr.output_dir, "model"))
    tr.aabb = jnp.asarray(cfg.aabb, jnp.float32)
    tr.model = NeRFRegTr(
        backbone="resnet18", d_model=32, num_layers=1, num_heads=2,
        dim_feedforward=64, max_input_points=256, num_tokens=64,
        max_points=50, num_downsample=2, dtype=jnp.float32,
    )
    key = jax.random.PRNGKey(0)
    sample = tr._to_device(ds[0])
    tr.grid_resolution = int(sample["src_grid"].shape[0])
    tr.params = {
        "model": tr.model.init(key, sample)["params"],
        "infonce_W": L.init_infonce_W(key, 32),
    }
    tr.setup_optimizer()
    tr.iteration = 0
    tr._log_file = open(os.path.join(tr.output_dir, "log.txt"), "a")
    tr._step_fn = tr._make_step_fn()

    # 1. clean step: finite, not skipped
    m = tr.train_iteration(ds[0])
    assert np.isfinite(float(m["total"])), m
    assert float(m["skipped_nonfinite"]) == 0.0, m
    print("clean step ok: total=%.4f" % float(m["total"]))

    # 2. NaN batch: skipped, params unchanged
    before = jax.tree_util.tree_map(np.asarray, tr.params)
    bad = dict(ds[0])
    bad["src_grid"] = np.asarray(bad["src_grid"]).copy()
    bad["src_grid"][..., 3:] = np.nan
    m_bad = tr.train_iteration(bad)
    assert float(m_bad["skipped_nonfinite"]) == 1.0, m_bad
    after = jax.tree_util.tree_map(np.asarray, tr.params)
    for b, a in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(b, a)
    print("nan batch skipped, params unchanged")

    # 3. next clean step still updates
    m2 = tr.train_iteration(ds[1 % len(ds)])
    assert float(m2["skipped_nonfinite"]) == 0.0
    after2 = jax.tree_util.tree_map(np.asarray, tr.params)
    changed = any(
        not np.array_equal(b, a)
        for b, a in zip(jax.tree_util.tree_leaves(after),
                        jax.tree_util.tree_leaves(after2))
    )
    assert changed, "clean step after skip did not update params"
    print("recovery step updates params — ALL OK on", jax.devices()[0])


if __name__ == "__main__":
    main()
