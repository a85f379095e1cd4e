"""Unit coverage for the round-5 quality/leak fixes.

- masked_select_strided: spatially-uniform static-shape voxel selection
  (replaces first-k, which took a low-x slab of the occupied set).
- scale-aware InfoNCE: nonzero positive matches at coarse token spacing
  where the reference's fixed r_p=0.2 is empty (the round-4 dead-loss
  production bug, reference conerf/loss/feature_loss.py:4-73).
- lpips_rand: the documented hermetic perceptual-metric fallback.
- eval-split cache keys: register_pairs eval items are cacheable so
  validate() never re-uploads grids (every axon host->device upload
  permanently retains its host buffer — the round-4 130 GB OOM).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from dregnerf_tpu.losses.registration import infonce_loss
from dregnerf_tpu.ops.voxel_subsample import (
    masked_select_first_k,
    masked_select_strided,
)


class TestMaskedSelectStrided:
    def test_spreads_across_the_true_set(self):
        # 10000 occupied entries, select 100: first-k takes the first 100
        # (a "slab"); strided must cover the whole range.
        mask = jnp.zeros(20000, bool).at[::2].set(True)  # 10k True
        idx, valid = masked_select_strided(mask, 100)
        assert bool(valid.all())
        picked = np.asarray(idx)
        assert mask[picked].all()
        # coverage: max picked index is near the end of the True range
        assert picked.max() > 19000 * 0.9
        # first-k for contrast: stays in the first ~200 slots
        idx_fk, _ = masked_select_first_k(mask, 100)
        assert np.asarray(idx_fk).max() < 220

    def test_equals_first_k_when_under_capacity(self):
        mask = jnp.zeros(512, bool).at[jnp.array([3, 17, 400])].set(True)
        idx_s, val_s = masked_select_strided(mask, 8)
        idx_f, val_f = masked_select_first_k(mask, 8)
        np.testing.assert_array_equal(np.asarray(val_s), np.asarray(val_f))
        np.testing.assert_array_equal(
            np.asarray(idx_s)[np.asarray(val_s)],
            np.asarray(idx_f)[np.asarray(val_f)])

    def test_validity_and_shapes_static(self):
        mask = jnp.zeros(256, bool).at[:5].set(True)
        idx, valid = masked_select_strided(mask, 16)
        assert idx.shape == (16,) and valid.shape == (16,)
        assert int(valid.sum()) == 5

    def test_all_false(self):
        idx, valid = masked_select_strided(jnp.zeros(64, bool), 8)
        assert not bool(valid.any())


class TestScaleAwareInfoNCE:
    def _clouds(self, spacing: float, n: int = 64, d: int = 8, seed: int = 0):
        rng = np.random.default_rng(seed)
        xyz = (rng.permutation(n)[:, None] * spacing *
               np.eye(3)[0][None, :]).astype(np.float32)
        feat = rng.normal(size=(n, d)).astype(np.float32)
        return jnp.asarray(feat), jnp.asarray(xyz)

    def test_fixed_radius_dead_at_coarse_spacing(self):
        # tokens 0.75 apart (the measured fleet spacing after 5 cell
        # doublings): nearest CROSS-cloud neighbor of a 0.3-offset cloud
        # is 0.3 away -> r_p=0.2 finds nothing, scale-aware r_p does.
        feat, xyz = self._clouds(spacing=0.75)
        offset = jnp.array([0.3, 0.0, 0.0], jnp.float32)
        W = jnp.eye(feat.shape[-1], dtype=jnp.float32)
        valid = jnp.ones(xyz.shape[0], bool)

        _, n_dead = infonce_loss(
            W, feat, feat, xyz + offset, xyz, valid, valid,
            r_p=0.2, r_n=0.4, return_stats=True)
        assert int(n_dead) == 0  # the round-4 production state

        r_p = jnp.float32(1.25 * 0.375)  # 1.25x a stop-cell of 0.375
        _, n_alive = infonce_loss(
            W, feat, feat, xyz + offset, xyz, valid, valid,
            r_p=r_p, r_n=2.0 * r_p, return_stats=True)
        assert int(n_alive) == xyz.shape[0]

    def test_loss_finite_and_positive_when_alive(self):
        feat, xyz = self._clouds(spacing=0.1)
        W = 0.1 * jnp.eye(feat.shape[-1], dtype=jnp.float32)
        valid = jnp.ones(xyz.shape[0], bool)
        loss, n = infonce_loss(
            W, feat, feat, xyz, xyz, valid, valid,
            r_p=0.2, r_n=0.4, return_stats=True)
        assert int(n) == xyz.shape[0]
        assert np.isfinite(float(loss)) and float(loss) > 0.0

    def test_no_valid_positives_gives_zero_loss(self):
        feat, xyz = self._clouds(spacing=0.1)
        valid = jnp.ones(xyz.shape[0], bool)
        loss, n = infonce_loss(
            jnp.eye(feat.shape[-1]), feat, feat, xyz, xyz,
            valid, jnp.zeros_like(valid),
            r_p=0.2, r_n=0.4, return_stats=True)
        assert int(n) == 0
        assert float(loss) == 0.0


class TestLpipsRandFallback:
    def test_zero_on_identical_positive_on_different(self):
        from dregnerf_tpu.utils.metrics import lpips_rand

        rng = np.random.default_rng(0)
        img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
        noise = rng.uniform(size=(32, 32, 3)).astype(np.float32)
        same = lpips_rand(img, img)
        diff = lpips_rand(img, noise)
        assert same == pytest.approx(0.0, abs=1e-6)
        assert diff > 1e-4

    def test_deterministic_across_calls(self):
        from dregnerf_tpu.utils.metrics import lpips_rand

        rng = np.random.default_rng(1)
        a = rng.uniform(size=(32, 32, 3)).astype(np.float32)
        b = rng.uniform(size=(32, 32, 3)).astype(np.float32)
        assert lpips_rand(a, b) == pytest.approx(lpips_rand(a, b), rel=1e-6)


class TestEvalItemCacheKeys:
    def test_eval_items_carry_cache_keys(self, tmp_path):
        """Eval-split items must be routable through the device grid
        cache: grids are unaugmented outside train, so the artifact path
        is a stable cache key (reg_trainer._to_device_cached)."""
        import json
        import os

        import torch

        from dregnerf_tpu.datasets.base import random_se3_np
        from dregnerf_tpu.datasets.register_pairs import NeRFRegDataset
        from dregnerf_tpu.io.ply import write_ply

        root, scene, res = str(tmp_path / "reg"), "s0", 8
        rng = np.random.default_rng(0)
        transforms = {0: random_se3_np(rng), 1: random_se3_np(rng)}
        img_dir = os.path.join(root, "images", scene)
        os.makedirs(img_dir, exist_ok=True)
        with open(os.path.join(img_dir, "world_frame_transforms.json"),
                  "w") as f:
            json.dump({str(k): v.tolist() for k, v in transforms.items()}, f)
        base = rng.normal(size=(64, 3)) * 0.4
        for k, T in transforms.items():
            bdir = os.path.join(root, "nerf_models", scene, f"block_{k}")
            os.makedirs(bdir, exist_ok=True)
            pts = base @ T[:3, :3].T + T[:3, 3]
            u = np.clip((pts + 1.5) / 3.0, 0, 0.999)
            flat = np.unique(
                (u[:, 0] * res).astype(int) * res * res
                + (u[:, 1] * res).astype(int) * res
                + (u[:, 2] * res).astype(int))
            grid = np.zeros((res**3, 7), np.float32)
            grid[flat, :3] = pts[: len(flat)]
            grid[flat, 6] = 1.0
            torch.save(torch.from_numpy(grid.reshape(res, res, res, 7)),
                       os.path.join(bdir, "voxel_grid.pt"))
            torch.save(torch.from_numpy(flat.astype(np.int64)),
                       os.path.join(bdir, "voxel_mask.pt"))
            write_ply(os.path.join(bdir, "voxel_point_cloud.ply"),
                      grid[flat, :3], grid[flat, 3:6])
            with open(os.path.join(bdir, "model.ckpt"), "wb") as f:
                f.write(b"stub")

        ds = NeRFRegDataset(root, subject_id=scene, split="test")
        item = ds[0]
        assert "src_cache_key" in item and "tgt_cache_key" in item
        assert item["src_cache_key"] != item["tgt_cache_key"]
        # deterministic: same item -> same keys (cache hits, no upload)
        item2 = ds[0]
        assert item2["src_cache_key"] == item["src_cache_key"]
