"""Registration losses + pair dataset + RegTrainer end-to-end (synthetic).

Builds a synthetic nerf_models directory (voxel_grid.pt / voxel_mask.pt /
world_frame_transforms.json for two blocks of one scene) without training
NeRFs, then drives the full RegTrainer loop.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dregnerf_tpu.losses import registration as L

R_GRID = 16


def make_block_artifacts(block_dir, rng, transform, base_points):
    """Write voxel artifacts for a block whose world frame is `transform`."""
    import torch

    os.makedirs(block_dir, exist_ok=True)
    pts = base_points @ transform[:3, :3].T + transform[:3, 3]
    aabb_lo, aabb_hi = -1.5, 1.5
    u = (pts - aabb_lo) / (aabb_hi - aabb_lo)
    idx3 = np.clip((u * R_GRID).astype(int), 0, R_GRID - 1)
    flat = idx3[:, 0] * R_GRID**2 + idx3[:, 1] * R_GRID + idx3[:, 2]
    flat = np.unique(flat)
    grid = np.zeros((R_GRID**3, 7), np.float32)
    ix, iy, iz = flat // R_GRID**2, (flat // R_GRID) % R_GRID, flat % R_GRID
    centers = (np.stack([ix, iy, iz], -1) + 0.5) / R_GRID * (aabb_hi - aabb_lo) + aabb_lo
    grid[flat, :3] = centers
    grid[flat, 3:6] = rng.uniform(size=(len(flat), 3))
    grid[flat, 6] = 1.0
    torch.save(torch.from_numpy(grid.reshape(R_GRID, R_GRID, R_GRID, 7)),
               os.path.join(block_dir, "voxel_grid.pt"))
    torch.save(torch.from_numpy(flat.astype(np.int64)),
               os.path.join(block_dir, "voxel_mask.pt"))
    from dregnerf_tpu.io.ply import write_ply

    write_ply(os.path.join(block_dir, "voxel_point_cloud.ply"),
              grid[flat, :3], grid[flat, 3:6])
    # minimal model.ckpt stand-in (the fast path never loads it)
    with open(os.path.join(block_dir, "model.ckpt"), "wb") as f:
        f.write(b"stub")


@pytest.fixture(scope="module")
def pair_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("regdata")
    rng = np.random.default_rng(0)
    scene = "test_scene"
    # asymmetric base shape
    sph = rng.normal(size=(800, 3))
    sph /= np.linalg.norm(sph, axis=1, keepdims=True)
    base = np.vstack([
        sph * np.array([0.5, 0.3, 0.2]),
        rng.normal(size=(200, 3)) * 0.05 + np.array([0.45, 0.25, 0.1]),
    ])
    from dregnerf_tpu.datasets.base import random_se3_np

    transforms = {0: random_se3_np(rng), 1: random_se3_np(rng)}
    img_dir = os.path.join(root, "images", scene)
    os.makedirs(img_dir, exist_ok=True)
    with open(os.path.join(img_dir, "world_frame_transforms.json"), "w") as f:
        json.dump({str(k): v.tolist() for k, v in transforms.items()}, f)
    for k, T in transforms.items():
        make_block_artifacts(
            os.path.join(root, "nerf_models", scene, f"block_{k}"), rng, T, base
        )
    return str(root), scene, transforms


class TestLosses:
    def test_overlap_bce_masked(self):
        pred = jnp.array([0.9, 0.1, 0.5, 0.5])
        gt = jnp.array([1.0, 0.0, 1.0, 0.0])
        mask = jnp.array([True, True, False, False])
        loss = L.overlap_bce(pred, gt, mask)
        expected = -np.log(0.9)
        np.testing.assert_allclose(loss, expected, atol=1e-5)

    def test_charbonnier_limits(self):
        np.testing.assert_allclose(L.charbonnier(jnp.array(0.0)), 0.0)
        big = float(L.charbonnier(jnp.array(10.0), scale=0.5))
        np.testing.assert_allclose(big, np.sqrt(401) - 1, rtol=1e-5)

    def test_correspondence_loss_zero_at_gt(self, rng):
        kp = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
        w = jnp.ones(32)
        m = jnp.ones(32, bool)
        loss = L.correspondence_loss(kp, kp, w, m)
        np.testing.assert_allclose(loss, 0.0, atol=1e-6)

    def test_infonce_identifies_matches(self, key, rng):
        """With features equal across clouds and W=I-ish, loss should beat
        the random-W case."""
        n, d = 64, 16
        feats = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        xyz = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
        valid = jnp.ones(n, bool)
        W_good = jnp.eye(d) * 3.0
        W_rand = jnp.asarray(rng.normal(size=(d, d)) * 0.01, jnp.float32)
        l_good = L.infonce_loss(W_good, feats, feats, xyz, xyz, valid, valid)
        l_rand = L.infonce_loss(W_rand, feats, feats, xyz, xyz, valid, valid)
        assert float(l_good) < float(l_rand)

    def test_infonce_no_matches_is_finite(self, rng):
        feats = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)
        a = jnp.zeros((8, 3))
        b = jnp.ones((8, 3)) * 100.0  # nothing within r_p
        valid = jnp.ones(8, bool)
        loss = L.infonce_loss(jnp.eye(4), feats, feats, a, b, valid, valid)
        assert np.isfinite(float(loss))

    def test_infonce_all_invalid_grad_finite(self, rng):
        """Regression: positive_valid all-False used to make every row of the
        masked logits all -inf; logsumexp's VJP then emitted NaN that the
        value-level isfinite guard could not stop (0 * NaN = NaN), NaN-ing
        the whole gradient (stage-3 divergence at ~iter 6700)."""
        n, d = 8, 4
        feats = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        xyz = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
        valid = jnp.ones(n, bool)

        def f(W, fa, fb):
            return L.infonce_loss(
                W, fa, fb, xyz, xyz, valid, jnp.zeros(n, bool)
            )

        g = jax.grad(f, argnums=(0, 1, 2))(jnp.eye(d), feats, feats)
        for gi in g:
            assert np.all(np.isfinite(np.asarray(gi)))
        # and the valid-positives path still has live gradients
        gW = jax.grad(
            lambda W: L.infonce_loss(W, feats, feats, xyz, xyz, valid, valid)
        )(jnp.eye(d))
        assert np.all(np.isfinite(np.asarray(gW)))
        assert float(jnp.abs(gW).sum()) > 0.0

    def test_grid_visibility_lookup(self):
        from dregnerf_tpu.losses.visibility import grid_visibility

        r = 8
        mask = np.zeros(r**3, bool)
        mask[0] = True  # voxel (0,0,0)
        aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
        inside = jnp.array([[-0.9, -0.9, -0.9]])  # voxel 0
        outside = jnp.array([[0.9, 0.9, 0.9], [5.0, 0.0, 0.0]])
        assert float(grid_visibility(inside, jnp.asarray(mask), aabb, r)[0]) == 1.0
        np.testing.assert_allclose(
            grid_visibility(outside, jnp.asarray(mask), aabb, r), [0.0, 0.0]
        )


class TestPairDataset:
    def test_loads_pair_with_gt_pose(self, pair_root):
        from dregnerf_tpu.datasets.register_pairs import NeRFRegDataset

        root, scene, transforms = pair_root
        ds = NeRFRegDataset(root, subject_id=scene, split="test")
        assert len(ds) == 1
        item = ds[0]
        assert item["src_grid"].shape == (R_GRID, R_GRID, R_GRID, 7)
        assert item["src_mask"].shape == (R_GRID**3,)
        b0, b1 = item["block_list"]
        expected = transforms[b1] @ np.linalg.inv(transforms[b0])
        np.testing.assert_allclose(item["pose"], expected, atol=1e-5)

    def test_gt_pose_aligns_points(self, pair_root):
        """pose must map src voxel points onto the tgt block's frame."""
        from dregnerf_tpu.datasets.register_pairs import NeRFRegDataset

        root, scene, _ = pair_root
        ds = NeRFRegDataset(root, subject_id=scene, split="test")
        item = ds[0]
        src_pts = item["src_grid"].reshape(-1, 7)[item["src_mask"], :3]
        tgt_pts = item["tgt_grid"].reshape(-1, 7)[item["tgt_mask"], :3]
        pose = item["pose"]
        warped = src_pts @ pose[:3, :3].T + pose[:3, 3]
        # chamfer-ish: each warped point has a near tgt neighbor (voxel res)
        d = np.linalg.norm(warped[:, None] - tgt_pts[None], axis=-1).min(1)
        assert np.median(d) < 0.35  # ~voxel diagonal at R=16 over [-1.5,1.5]

    def test_train_augmentation_consistency(self, pair_root):
        """After jitter+perturb+swap the adjusted pose must still align."""
        from dregnerf_tpu.datasets.register_pairs import NeRFRegDataset

        root, scene, _ = pair_root
        ds = NeRFRegDataset(root, subject_id=scene, split="train", seed=3)
        item = ds[0]
        src_pts = item["src_grid"].reshape(-1, 7)[item["src_mask"], :3]
        tgt_pts = item["tgt_grid"].reshape(-1, 7)[item["tgt_mask"], :3]
        pose = item["pose"]
        warped = src_pts @ pose[:3, :3].T + pose[:3, 3]
        d = np.linalg.norm(warped[:, None] - tgt_pts[None], axis=-1).min(1)
        assert np.median(d) < 0.4

    def test_device_augment_matches_host_algebra(self, pair_root):
        """device_augment(grid, mask, p, key=None) must equal the host
        _rigid_perturb xyz math for a given conjugated matrix p, and
        leave unmasked rows and non-xyz channels untouched."""
        import jax.numpy as jnp

        from dregnerf_tpu.datasets.register_pairs import (NeRFRegDataset,
                                                          device_augment)

        root, scene, _ = pair_root
        ds = NeRFRegDataset(root, subject_id=scene, split="test")
        grid, mask, _c = ds._load_block_raw(ds.meta[0]["blocks"][0])
        rng = np.random.default_rng(5)
        from dregnerf_tpu.datasets.register_pairs import _se3_small

        p = _se3_small(rng, 0.1).astype(np.float32)

        out = np.asarray(device_augment(
            jnp.asarray(grid), jnp.asarray(mask), jnp.asarray(p), None))
        flat_in, flat_out = grid.reshape(-1, 7), out.reshape(-1, 7)
        expect = flat_in[mask, :3] @ p[:3, :3].T + p[:3, 3]
        np.testing.assert_allclose(flat_out[mask, :3], expect, atol=1e-5)
        np.testing.assert_array_equal(flat_out[~mask], flat_in[~mask])
        np.testing.assert_array_equal(flat_out[:, 3:], flat_in[:, 3:])

    def test_get_raw_pose_consistency_after_device_augment(self, pair_root):
        """get_raw's updated GT pose must align the device-augmented src
        cloud with the device-augmented tgt cloud (the device-path analog
        of test_train_augmentation_consistency)."""
        import jax
        import jax.numpy as jnp

        from dregnerf_tpu.datasets.register_pairs import (NeRFRegDataset,
                                                          device_augment)

        root, scene, _ = pair_root
        ds = NeRFRegDataset(root, subject_id=scene, split="train", seed=3)
        item = ds.get_raw(0)
        ks, kt = jax.random.split(jax.random.PRNGKey(0))
        src = np.asarray(device_augment(
            jnp.asarray(item["src_grid"]), jnp.asarray(item["src_mask"]),
            jnp.asarray(item["aug"]["p_src"]), ks))
        tgt = np.asarray(device_augment(
            jnp.asarray(item["tgt_grid"]), jnp.asarray(item["tgt_mask"]),
            jnp.asarray(item["aug"]["p_tgt"]), kt))
        src_pts = src.reshape(-1, 7)[item["src_mask"], :3]
        tgt_pts = tgt.reshape(-1, 7)[item["tgt_mask"], :3]
        pose = item["pose"]
        warped = src_pts @ pose[:3, :3].T + pose[:3, 3]
        d = np.linalg.norm(warped[:, None] - tgt_pts[None], axis=-1).min(1)
        assert np.median(d) < 0.4

    def test_block_cache_is_never_mutated_by_augmentation(self, pair_root):
        """__getitem__ jitters/perturbs IN PLACE; the LRU block cache must
        hand out copies so train-time augmentation never accumulates into
        the cached arrays across iterations."""
        from dregnerf_tpu.datasets.register_pairs import NeRFRegDataset

        root, scene, _ = pair_root
        ds = NeRFRegDataset(root, subject_id=scene, split="train", seed=3)
        paths = ds.meta[0]["blocks"][0]
        pristine = ds._load_block_raw(paths)[0].copy()
        for _ in range(3):
            ds[0]  # augments (mutates its returned arrays)
        cached = ds._load_block_raw(paths)[0]
        np.testing.assert_array_equal(cached, pristine)
        assert len(ds._block_cache) <= ds.cache_blocks


class TestRegTrainerLoop:
    @pytest.fixture(scope="class")
    def trainer(self, pair_root):
        from dregnerf_tpu.datasets.register_pairs import NeRFRegDataset
        from dregnerf_tpu.runtime import reg_trainer as RT
        from dregnerf_tpu.runtime.config import config_parser

        root, scene, _ = pair_root
        out = os.path.join(root, "out")
        cfg = config_parser([
            "--dataset", "objaverse", "--root_dir", root, "--expname", "regsmoke",
            "--out_dir", out, "--position_embedding_dim", "64",
            "--num_downsample", "3", "--no_bf16", "--compilation_cache", "",
            "--n_tensorboard", "5", "--n_validation", "1000", "--n_checkpoint", "6",
            "--epochs", "6", "--robust_loss",
        ])
        train_ds = NeRFRegDataset(root, subject_id=scene, split="train", seed=1)
        val_ds = NeRFRegDataset(root, subject_id=scene, split="test", seed=1)

        # shrink the model for CPU
        import jax.numpy as jnp
        from dregnerf_tpu.models.regtr import NeRFRegTr

        tr = RT.RegTrainer.__new__(RT.RegTrainer)
        tr.config = cfg
        tr.train_dataset = train_ds
        tr.val_dataset = val_ds
        tr.output_dir = os.path.join(out, "regsmoke")
        os.makedirs(tr.output_dir, exist_ok=True)
        from dregnerf_tpu.runtime.checkpoint import CheckpointManager

        tr.ckpt_manager = CheckpointManager(os.path.join(tr.output_dir, "model"))
        tr.aabb = jnp.asarray(cfg.aabb, jnp.float32)
        tr.model = NeRFRegTr(
            backbone="resnet18", d_model=64, num_layers=2, num_heads=4,
            dim_feedforward=128, max_input_points=512, num_tokens=128,
            max_points=100, num_downsample=3, dtype=jnp.float32,
        )
        key = jax.random.PRNGKey(0)
        sample = tr._to_device(train_ds[0])
        tr.grid_resolution = int(sample["src_grid"].shape[0])
        tr.params = {
            "model": tr.model.init(key, sample)["params"],
            "infonce_W": L.init_infonce_W(key, 64),
        }
        tr.setup_optimizer()
        tr.iteration = 0
        tr._log_file = open(os.path.join(tr.output_dir, "log.txt"), "a")
        from collections import OrderedDict

        tr._dev_cache = OrderedDict()
        tr._dev_cache_size = 8
        tr._aug_key = jax.random.PRNGKey(7)
        tr._aug_step_fn = None
        tr._step_fn = tr._make_step_fn()
        tr._eval_fn = tr._make_eval_fn()
        return tr

    def test_loss_decreases(self, trainer):
        first = None
        for i in range(6):
            m = trainer.train_iteration(trainer.train_dataset[0])
            total = float(m["total"])
            assert np.isfinite(total)
            if first is None:
                first = total
        assert total < first * 1.5  # noisy single-pair training; no explosion

    def test_metrics_present(self, trainer):
        m = trainer.train_iteration(trainer.train_dataset[0])
        for k in ("overlap", "nerf_cont", "feature", "corr", "total", "R_error"):
            assert k in m

    def test_device_cached_step_matches_host_step(self, trainer):
        """On an unaugmented pair (test split: identity transforms, no
        jitter) the device-cached augmented-step program must produce the
        same losses/updates as the host-path step."""
        import jax
        import jax.numpy as jnp

        ds = trainer.val_dataset
        ds.rng = np.random.default_rng(0)
        item_h = ds[0]
        ds.rng = np.random.default_rng(0)
        item_d = ds.get_raw(0)
        assert item_d["aug"]["jitter"] is False
        np.testing.assert_array_equal(item_h["pose"], item_d["pose"])

        p0, s0 = trainer.params, trainer.opt_state
        _, _, m_h = trainer._step_fn(p0, s0, trainer._to_device(item_h))
        if trainer._aug_step_fn is None:
            trainer._aug_step_fn = trainer._make_aug_step_fn()
        batch = trainer._to_device_cached(item_d)
        _, _, m_d = trainer._aug_step_fn(
            p0, s0, batch,
            jnp.asarray(item_d["aug"]["p_src"]),
            jnp.asarray(item_d["aug"]["p_tgt"]),
            jnp.float32(0.0), jax.random.PRNGKey(0),
        )
        assert len(trainer._dev_cache) == 2  # both blocks resident
        for k in m_h:
            np.testing.assert_allclose(
                float(m_h[k]), float(m_d[k]), rtol=1e-4, atol=1e-5,
                err_msg=k)

    def test_train_deadline_stops_before_first_iteration(self, trainer):
        # Wall-clock cutoff (fleet round-end insurance): a deadline already
        # in the past must stop train() before it runs a single iteration,
        # but still write the final checkpoint.
        import time as _time

        it0 = trainer.iteration
        trainer.train_deadline = _time.time() - 1.0
        trainer.on_validate = None
        try:
            trainer.train()
        finally:
            trainer.train_deadline = None
        assert trainer.iteration == it0
        assert os.path.exists(
            os.path.join(trainer.output_dir, "model", "model.ckpt"))

    def test_validate_and_checkpoint(self, trainer):
        score = trainer.validate(fraction=1.0)
        assert np.isfinite(score)
        trainer.iteration = 6
        trainer.save_checkpoint(score)
        assert os.path.exists(os.path.join(trainer.output_dir, "model", "model.ckpt"))
        # resume round-trip
        trainer.load_checkpoint()
        assert trainer.iteration == 6


class TestFGRBaseline:
    def test_fgr_recovers_pose(self, rng):
        from dregnerf_tpu.registration.fgr import run_registration

        sph = rng.normal(size=(1000, 3))
        sph /= np.linalg.norm(sph, axis=1, keepdims=True)
        pts = np.vstack([
            sph * np.array([0.5, 0.3, 0.2]),
            rng.normal(size=(300, 3)) * 0.05 + np.array([0.45, 0.25, 0.1]),
        ])
        from scipy.spatial.transform import Rotation as R

        T = np.eye(4)
        T[:3, :3] = R.from_euler("xyz", [20, -35, 50], degrees=True).as_matrix()
        T[:3, 3] = [0.2, -0.1, 0.3]
        tgt = pts @ T[:3, :3].T + T[:3, 3]
        est, dt = run_registration(pts, tgt, voxel_size=0.03)
        assert est is not None
        rre = np.degrees(np.arccos(np.clip(
            (np.trace(est[:3, :3].T @ T[:3, :3]) - 1) / 2, -1, 1)))
        assert rre < 5.0
        assert np.linalg.norm(est[:3, 3] - T[:3, 3]) < 0.05

    def test_fgr_multicluster_voxel_cloud(self, rng):
        """Round-4 regression: multi-cluster voxel-SNAPPED shell clouds
        (exactly what stage-2 extraction emits). Before the normal
        orientation fix in fgr.cpp the arbitrary eigenvector sign
        scrambled FPFH between rotated copies: 24.6 deg error on
        IDENTICAL clouds; with outward-oriented normals: ~1 deg full
        overlap / ~3 deg at 70%."""
        from scipy.spatial.transform import Rotation as R

        from dregnerf_tpu.registration.fgr import run_registration

        r = np.random.default_rng(7)
        pts = []
        for _ in range(4):
            c = r.uniform(-0.6, 0.6, 3)
            rad = r.uniform(0.15, 0.3)
            d = r.normal(size=(3000, 3))
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            pts.append(c + rad * d)
        p = np.concatenate(pts)
        p = np.unique(np.round(p / (2 / 128)) * (2 / 128), axis=0)
        T = np.eye(4)
        T[:3, :3] = R.from_euler("xyz", [15, 25, -30], degrees=True).as_matrix()
        T[:3, 3] = [0.3, -0.2, 0.1]
        tgt = p @ T[:3, :3].T + T[:3, 3]
        # partial overlap: independent 30% dropout on each side
        src_p = p[rng.random(len(p)) > 0.3]
        tgt_p = tgt[rng.random(len(tgt)) > 0.3]
        est, _ = run_registration(src_p, tgt_p, voxel_size=0.05)
        assert est is not None
        rre = np.degrees(np.arccos(np.clip(
            (np.trace(est[:3, :3].T @ T[:3, :3]) - 1) / 2, -1, 1)))
        assert rre < 6.0, rre
        assert np.linalg.norm(est[:3, 3] - T[:3, 3]) < 0.08

    def test_fgr_sparse_cloud_retry_ladder(self, rng):
        """A cloud too sparse for the 0.05 downsample floor registers via
        the voxel-halving retry (round-3 fleet failure mode: every FGR row
        was 'fgr failed' on degenerate extractions)."""
        from dregnerf_tpu.registration.fgr import run_registration

        sph = rng.normal(size=(90, 3))
        sph /= np.linalg.norm(sph, axis=1, keepdims=True)
        pts = sph * np.array([0.2, 0.15, 0.1])  # tiny shell: ~dozens of
        # occupied 0.05-voxels -> rc -2/-3 at the reference voxel size
        tgt = pts + np.array([0.05, -0.02, 0.01])
        est, _ = run_registration(pts, tgt, voxel_size=0.2, retry=True)
        assert est is not None  # ladder found a workable density

    def test_ransac_recovers_large_rotation(self, rng):
        """RANSAC+GN handles rotations where plain FGR can fall into a
        wrong basin."""
        from scipy.spatial.transform import Rotation as R

        from dregnerf_tpu.registration.fgr import run_ransac_registration

        sph = rng.normal(size=(1000, 3))
        sph /= np.linalg.norm(sph, axis=1, keepdims=True)
        pts = np.vstack([
            sph * np.array([0.5, 0.3, 0.2]),
            rng.normal(size=(300, 3)) * 0.05 + np.array([0.45, 0.25, 0.1]),
        ])
        T = np.eye(4)
        T[:3, :3] = R.from_euler("xyz", [80, 10, -120], degrees=True).as_matrix()
        T[:3, 3] = [0.2, -0.1, 0.3]
        tgt = pts @ T[:3, :3].T + T[:3, 3]
        est, _ = run_ransac_registration(pts, tgt, voxel_size=0.03)
        assert est is not None
        rre = np.degrees(np.arccos(np.clip(
            (np.trace(est[:3, :3].T @ T[:3, :3]) - 1) / 2, -1, 1)))
        assert rre < 10.0


def test_batched_reg_step_matches_metrics_shape(pair_root):
    """reg_batch_size=2 vmapped step runs and returns finite losses."""
    import os

    from dregnerf_tpu.datasets.register_pairs import NeRFRegDataset
    from dregnerf_tpu.models.regtr import NeRFRegTr
    from dregnerf_tpu.runtime import reg_trainer as RT
    from dregnerf_tpu.runtime.checkpoint import CheckpointManager
    from dregnerf_tpu.runtime.config import config_parser

    root, scene, _ = pair_root
    out = os.path.join(root, "out_batched")
    cfg = config_parser([
        "--dataset", "objaverse", "--root_dir", root, "--expname", "b2",
        "--out_dir", out, "--no_bf16", "--compilation_cache", "",
        "--robust_loss", "--reg_batch_size", "2",
    ])
    ds = NeRFRegDataset(root, subject_id=scene, split="train", seed=5)
    tr = RT.RegTrainer.__new__(RT.RegTrainer)
    tr.config = cfg
    tr.train_dataset = ds
    tr.val_dataset = ds
    tr.output_dir = os.path.join(out, "b2")
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
    m = tr.train_iteration_batch([ds[0], ds[0]])
    assert np.isfinite(float(m["total"]))
    for k in ("overlap", "nerf_cont", "feature", "corr"):
        assert k in m
    assert float(m["skipped_nonfinite"]) == 0.0

    # Regression (round-4 stage-3 NaN at ~iter 6700): a draw that produces a
    # nonfinite loss/gradient must NOT update params — the guarded step keeps
    # the old params/opt_state and raises the skipped_nonfinite flag.
    before = jax.tree_util.tree_map(np.asarray, tr.params)
    bad = ds[0]
    bad = dict(bad)
    bad["src_grid"] = np.asarray(bad["src_grid"]).copy()
    bad["src_grid"][..., 3:] = np.nan
    m_bad = tr.train_iteration_batch([bad, ds[0]])
    assert float(m_bad["skipped_nonfinite"]) == 1.0
    after = jax.tree_util.tree_map(np.asarray, tr.params)
    for b, a in zip(
        jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)
    ):
        np.testing.assert_array_equal(b, a)


def test_exact_visibility_fns_from_checkpoints(tmp_path, key):
    """make_exact_visibility_fns loads tiny NeRF checkpoints and labels
    points in {0, 1}; compute_losses accepts the seam."""
    import os

    from dregnerf_tpu.models import ngp
    from dregnerf_tpu.ops import occupancy
    from dregnerf_tpu.ops.packed_grid import PackedGridConfig
    from dregnerf_tpu.runtime.checkpoint import save_checkpoint
    from dregnerf_tpu.runtime.reg_trainer import make_exact_visibility_fns

    cfg = ngp.NGPConfig(
        grid=PackedGridConfig(n_levels=2, log2_table_size=8),
        compute_dtype=jnp.float32,
    )
    params = ngp.init_ngp(key, cfg)
    grid = occupancy.init_grid(8)._replace(binary=jnp.ones((8,) * 3, bool))
    meta = {
        "aabb": [-1.0, -1.0, -1.0, 1.0, 1.0, 1.0],
        "contraction_type": "aabb", "render_step_size": 0.05,
        "near_plane": 0.0, "far_plane": 1e10,
        "camera_poses": [np.concatenate([np.eye(3), [[0], [0], [3.0]]], 1).tolist()],
        "field": "ngp", "model_config": ngp.config_to_meta(cfg),
    }
    path = str(tmp_path / "model.ckpt")
    save_checkpoint(path, {
        "model": params,
        "occupancy": {"occs": grid.occs, "binary": grid.binary},
    }, meta)

    src_vis, tgt_vis = make_exact_visibility_fns(path, path, max_cameras=4,
                                                 buffer_size=1 << 12)
    pts = jax.random.uniform(key, (16, 3), minval=-0.8, maxval=0.8)
    labels = src_vis(pts)
    assert labels.shape == (16,)
    vals = set(np.unique(np.asarray(labels)))
    assert vals <= {0.0, 1.0}
    # multi-layer shape passes through too
    labels2 = tgt_vis(jnp.stack([pts, pts]))
    assert labels2.shape == (2, 16)


class TestExactVisibilityTraining:
    """VERDICT r1 item 3: exact (marched) visibility as a full train-step
    feature — NeRF params as step ARGUMENTS — plus a measured grid-vs-exact
    label disagreement rate on a trained fixture NeRF."""

    @pytest.fixture(scope="class")
    def trained_scene(self, tmp_path_factory):
        """Train one tiny NGP on the fixture scene, extract real voxel
        artifacts, and lay out a 2-block registration scene (both blocks
        share the checkpoint; identity world frames -> GT pose = I)."""
        import shutil

        from dregnerf_tpu.datasets import fixtures
        from dregnerf_tpu.datasets.base import load_scene_blocks
        from dregnerf_tpu.extract.sample_grid import (
            extract_voxel_features,
            save_voxel_artifacts,
        )
        from dregnerf_tpu.models.ngp import NGPConfig, init_ngp
        from dregnerf_tpu.ops.hash_encoding import HashGridConfig
        from dregnerf_tpu.runtime.config import config_parser
        from dregnerf_tpu.runtime.ngp_trainer import (
            NGPTrainer,
            load_field_from_checkpoint,
        )

        root = str(tmp_path_factory.mktemp("exactvis"))
        data = os.path.join(root, "data")
        fixtures.make_scene(data, num_views=12, image_size=32)
        out = os.path.join(root, "out")
        cfg = config_parser([
            "--dataset", "objaverse", "--root_dir", data,
            "--scene", "fixture_scene", "--expname", "ev", "--out_dir", out,
            "--factor", "1", "--aabb=-1.0,-1.0,-1.0,1.0,1.0,1.0",
            "--max_iterations", "400", "--sample_budget", str(1 << 13),
            "--max_march_steps", "64", "--grid_resolution", "16",
            "--init_num_rays", "256", "--max_num_rays", "1024",
            "--n_tensorboard", "100", "--n_validation", "10000",
            "--n_checkpoint", "400", "--no_bf16", "--compilation_cache", "",
        ])
        scene = load_scene_blocks("objaverse", data, "fixture_scene", "train")[0]
        trainer = NGPTrainer(cfg, scene, scene)
        trainer.model_config = NGPConfig(
            grid=HashGridConfig(n_levels=4, log2_table_size=11),
            compute_dtype=jnp.float32,
        )
        trainer.params = init_ngp(jax.random.PRNGKey(0), trainer.model_config)
        trainer.opt_state = trainer.optimizer.init(trainer.params)
        trainer.state.params = trainer.params
        trainer.state.opt_state = trainer.opt_state
        trainer._step_fns = {}
        trainer.__dict__.pop("_occ_update_fns", None)
        trainer.train()

        ckpt = os.path.join(out, "ev", "model", "model.ckpt")
        params, grid, meta, model_cfg, rcfg = load_field_from_checkpoint(ckpt)
        extracted = extract_voxel_features(
            params, model_cfg, grid, meta, jax.random.PRNGKey(1),
            surface_chunk=2048,
        )
        # 2-block registration layout (identity world frames)
        scene_name = "fixture_scene"
        img_dir = os.path.join(root, "images", scene_name)
        os.makedirs(img_dir, exist_ok=True)
        with open(os.path.join(img_dir, "world_frame_transforms.json"), "w") as f:
            json.dump({"0": np.eye(4).tolist(), "1": np.eye(4).tolist()}, f)
        for b in (0, 1):
            bdir = os.path.join(root, "nerf_models", scene_name, f"block_{b}")
            save_voxel_artifacts(bdir, extracted)
            shutil.copy(ckpt, os.path.join(bdir, "model.ckpt"))
        return root, scene_name, ckpt, extracted

    def test_grid_vs_exact_disagreement(self, trained_scene):
        """Compare grid_visibility (voxel-mask lookup) against exact marched
        labels at keypoints AND warped keypoints; report the rate."""
        from dregnerf_tpu.losses.visibility import (
            exact_visibility_ctx,
            grid_visibility,
            load_visibility_context,
        )

        root, scene_name, ckpt, ex = trained_scene
        ctx, model_cfg, rcfg = load_visibility_context(ckpt, max_cameras=12)
        res = int(ex["resolution"][0])
        mask_flat = np.zeros(res**3, bool)
        keep = ex["surface_mask"] & ex["density_mask"]
        mask_flat[ex["indices"][keep]] = True
        kp = jnp.asarray(ex["points"][keep])  # on-lattice keypoints
        # warped keypoints: small rigid motion off the lattice
        from dregnerf_tpu.datasets.base import random_se3_np

        T = random_se3_np(np.random.default_rng(3), trans_clamp=0.1)
        warped = kp @ jnp.asarray(T[:3, :3].T) + jnp.asarray(T[:3, 3])

        aabb = ctx.aabb
        exact = jax.jit(
            lambda c, pts: exact_visibility_ctx(c, model_cfg, rcfg, pts,
                                                buffer_size=1 << 12)
        )
        gridv = jax.jit(
            lambda pts: grid_visibility(pts, jnp.asarray(mask_flat), aabb, res)
        )
        report = {}
        for name, pts in [("keypoints", kp), ("warped", warped)]:
            e = np.asarray(exact(ctx, pts))
            g = np.asarray(gridv(pts))
            assert set(np.unique(e)) <= {0.0, 1.0}
            report[name] = float(np.mean(e != g))
        print(f"grid-vs-exact disagreement: {report}")
        # keypoints sit on the voxel lattice the mask came from: labels must
        # largely agree (mask = surface AND density; exact = surface only,
        # so exact >= grid up to jitter)
        assert report["keypoints"] < 0.25, report
        assert report["warped"] <= 1.0  # reported, not bounded a priori

    def test_exact_step_runs_and_is_finite(self, trained_scene):
        """RegTrainer(visibility='exact'): one full train step with NeRF
        contexts threaded through the step arguments."""
        from collections import OrderedDict

        from dregnerf_tpu.datasets.register_pairs import NeRFRegDataset
        from dregnerf_tpu.models.regtr import NeRFRegTr
        from dregnerf_tpu.runtime import reg_trainer as RT
        from dregnerf_tpu.runtime.checkpoint import CheckpointManager
        from dregnerf_tpu.runtime.config import config_parser

        root, scene_name, ckpt, _ = trained_scene
        out = os.path.join(root, "regout")
        cfg = config_parser([
            "--dataset", "objaverse", "--root_dir", root, "--expname", "ev",
            "--out_dir", out, "--position_embedding_dim", "32",
            "--num_downsample", "2", "--no_bf16", "--compilation_cache", "",
            "--visibility", "exact", "--vis_max_cameras", "12",
            "--vis_buffer_size", str(1 << 12), "--robust_loss",
        ])
        ds = NeRFRegDataset(root, subject_id=scene_name, split="train", seed=0)
        assert len(ds) == 1

        tr = RT.RegTrainer.__new__(RT.RegTrainer)
        tr.config = cfg
        tr.train_dataset = ds
        tr.val_dataset = ds
        tr.output_dir = os.path.join(out, "ev")
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
        tr.visibility = "exact"
        tr._vis_cache = OrderedDict()
        tr._vis_cache_size = 4
        tr._vis_static = None
        tr._exact_step_fn = None
        tr._log_file = open(os.path.join(tr.output_dir, "log.txt"), "a")
        tr._eval_fn = tr._make_eval_fn()

        m = tr.train_iteration(ds[0])
        for k in ("overlap", "nerf_cont", "feature", "corr", "total"):
            assert np.isfinite(float(m[k])), (k, m)
        # both block checkpoints resolved through the LRU
        assert len(tr._vis_cache) == 2
        # second step reuses the compiled fn and cache
        m2 = tr.train_iteration(ds[0])
        assert np.isfinite(float(m2["total"]))


def test_reg_evaluator_artifacts(pair_root, tmp_path):
    """RegEvaluator writes the reference's artifact set: metrics JSONs,
    transformation_est.json, pose .pts, aligned/unaligned clouds AND the
    keypoint + overlap-filtered clouds (reference eval_nerf_regtr.py:371-438)."""
    import importlib
    import sys

    root, scene, _ = pair_root
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ev_mod = importlib.import_module("eval_nerf_regtr")

    from dregnerf_tpu.datasets.register_pairs import NeRFRegDataset
    from dregnerf_tpu.runtime.config import config_parser

    cfg = config_parser([
        "--dataset", "objaverse", "--root_dir", root, "--expname", "regev",
        "--out_dir", str(tmp_path), "--no_bf16", "--compilation_cache", "",
        "--position_embedding_dim", "64", "--num_downsample", "3",
        "--icp_refine",  # exercise the ICP-polish + classical-race path
    ])
    ds = NeRFRegDataset(root, subject_id=scene, split="test", seed=2)
    # shrink the model for CPU
    import jax.numpy as jnp

    from dregnerf_tpu.models.regtr import NeRFRegTr

    ev = ev_mod.RegEvaluator.__new__(ev_mod.RegEvaluator)
    ev.config = cfg
    ev.dataset = ds
    ev.output_dir = str(tmp_path / "eval")
    os.makedirs(ev.output_dir, exist_ok=True)
    ev.model = NeRFRegTr(
        backbone="resnet18", d_model=64, num_layers=2, num_heads=4,
        dim_feedforward=128, max_input_points=512, num_tokens=128,
        max_points=100, num_downsample=3, dtype=jnp.float32,
    )
    import jax

    from dregnerf_tpu.losses.registration import init_infonce_W
    from dregnerf_tpu.runtime.reg_trainer import RegTrainer

    key = jax.random.PRNGKey(0)
    sample = RegTrainer._to_device(ds[0])
    ev.params = {
        "model": ev.model.init(key, sample)["params"],
        "infonce_W": init_infonce_W(key, 64),
    }
    ev._forward = jax.jit(
        lambda p, b: ev.model.apply({"params": p["model"]}, b))
    metrics = ev.evaluate()
    assert "aggregate" in metrics and metrics["aggregate"]["num_pairs"] == 1
    scene_dir = os.path.join(ev.output_dir, scene)
    for f in (
        "transformation_est.json", "pose_est.pt", "pose_gt.pt",
        "src_unaligned.ply", "src_aligned.ply", "tgt.ply",
        "src_xyz.ply", "tgt_xyz.ply", "src_kp_warped.ply", "tgt_kp_warped.ply",
        "all_src_xyz.ply", "all_tgt_xyz.ply",
        "noisy_point_cloud_pred.ply", "point_cloud_pred.ply",
        "noisy_point_cloud_gt.ply", "point_cloud_gt.ply",
    ):
        assert os.path.exists(os.path.join(scene_dir, f)), f
    assert os.path.exists(os.path.join(ev.output_dir, "metrics_test.json"))

    def test_validate_pushes_pose_viz(self, trainer):
        """--enable_visdom live view: validate() publishes GT/pred clouds +
        frusta to the hermetic pose server (visdom replacement)."""
        import json
        import urllib.request

        from dregnerf_tpu.utils.pose_server import PoseVizServer

        trainer.pose_viz = PoseVizServer(port=0)
        try:
            trainer.validate(fraction=0.5)
            url = f"http://127.0.0.1:{trainer.pose_viz.port}/state.json"
            state = json.loads(urllib.request.urlopen(url).read())
            kinds = [t["kind"] for t in state["traces"]]
            # 3 clouds (tgt, src@gt, src@pred) + 2 frusta + distance segs
            assert kinds.count("points") == 3
            assert kinds.count("lines") == 3
        finally:
            trainer.pose_viz.close()
            trainer.pose_viz = None


class TestClassicalPipeline:
    def test_best_global_registration_picks_and_refines(self, rng):
        """Multi-scale FGR/RANSAC race + ICP polish recovers a large SE(3)
        on a multi-cluster shell (registration/pipeline.py)."""
        from scipy.spatial.transform import Rotation as R

        from dregnerf_tpu.geometry import se3
        from dregnerf_tpu.registration.pipeline import best_global_registration

        sph = rng.normal(size=(1200, 3))
        sph /= np.linalg.norm(sph, axis=1, keepdims=True)
        pts = np.vstack([
            sph * np.array([0.5, 0.3, 0.2]),
            rng.normal(size=(400, 3)) * 0.05 + np.array([0.45, 0.25, 0.1]),
            rng.normal(size=(300, 3)) * 0.04 - np.array([0.3, 0.4, 0.05]),
        ])
        T = np.eye(4)
        T[:3, :3] = R.from_euler("xyz", [60, -20, 110], degrees=True).as_matrix()
        T[:3, 3] = [0.15, -0.2, 0.1]
        tgt = pts @ T[:3, :3].T + T[:3, 3]
        est, info = best_global_registration(pts, tgt, voxel_sizes=(0.03, 0.05))
        assert est is not None, info
        assert "winner" in info and info["winner"]["score"] is not None
        rre, rte = se3.pose_error(
            jnp.asarray(est), jnp.asarray(T[:3, :4], jnp.float32))
        assert float(rre) < 3.0, (float(rre), info)
        assert float(rte) < 0.05, (float(rte), info)

    def test_best_global_registration_none_when_degenerate(self):
        from dregnerf_tpu.registration.pipeline import best_global_registration

        est, info = best_global_registration(
            np.zeros((5, 3)), np.ones((5, 3)), voxel_sizes=(0.05,))
        assert est is None
        assert info["candidates"]
