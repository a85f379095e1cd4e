"""End-to-end pipeline: train 2 NeRF blocks -> extract voxel grids ->
register the pair (BASELINE config 5, all on CPU with tiny settings).

This is the full DReg-NeRF flow through the real artifact formats:
world_frame_transforms.json -> per-block model.ckpt -> voxel_grid.pt /
voxel_mask.pt / voxel_point_cloud.ply -> NeRFRegDataset -> RegTrainer.
"""
import json
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dregnerf_tpu.runtime.config import config_parser


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    data_root = os.path.join(root, "data")
    from dregnerf_tpu.datasets import fixtures

    fixtures.make_scene(data_root, num_views=24, image_size=40)

    from dregnerf_tpu.datasets.base import load_scene_blocks
    from dregnerf_tpu.models.ngp import NGPConfig, init_ngp
    from dregnerf_tpu.ops.packed_grid import PackedGridConfig
    from dregnerf_tpu.runtime.ngp_trainer import NGPTrainer

    out_root = os.path.join(root, "out")
    cfg = config_parser([
        "--dataset", "objaverse", "--root_dir", data_root,
        "--scene", "fixture_scene", "--expname", "e2e", "--out_dir", out_root,
        "--factor", "1", "--aabb=-1.0,-1.0,-1.0,1.0,1.0,1.0",
        "--max_iterations", "80", "--sample_budget", str(1 << 13),
        "--max_march_steps", "96", "--grid_resolution", "24",
        "--init_num_rays", "512", "--max_num_rays", "1024",
        "--n_tensorboard", "40", "--n_validation", "10000",
        "--n_checkpoint", "80", "--no_bf16", "--compilation_cache", "",
    ])

    # ---- stage 1: train both blocks with tiny packed-grid models ----------
    train_blocks = load_scene_blocks(
        "objaverse", data_root, "fixture_scene", "train", 1, True, 2
    )
    test_blocks = load_scene_blocks(
        "objaverse", data_root, "fixture_scene", "test", 1, True, 2
    )
    small_model = NGPConfig(
        grid=PackedGridConfig(n_levels=6, log2_table_size=12),
        compute_dtype=jnp.float32,
    )
    block_dirs = []
    for k, (tr, te) in enumerate(zip(train_blocks, test_blocks)):
        out_dir = os.path.join(out_root, "e2e", f"block_{k}")
        trainer = NGPTrainer(cfg, tr, te, output_dir=out_dir)
        trainer.model_config = small_model
        trainer.params = init_ngp(jax.random.PRNGKey(k), small_model)
        trainer.opt_state = trainer.optimizer.init(trainer.params)
        trainer.state.params = trainer.params
        trainer.state.opt_state = trainer.opt_state
        trainer._step_fns = {}
        trainer.__dict__.pop("_occ_update_fns", None)
        trainer.train()
        block_dirs.append(out_dir)

    # ---- stage 2: extract voxel grids ------------------------------------
    from dregnerf_tpu.extract.sample_grid import (
        extract_voxel_features,
        save_voxel_artifacts,
    )
    from dregnerf_tpu.runtime.ngp_trainer import load_field_from_checkpoint
    from dregnerf_tpu.runtime.checkpoint import load_checkpoint, _unflatten_into
    from dregnerf_tpu.ops import occupancy as occ_mod

    for k, d in enumerate(block_dirs):
        ckpt = os.path.join(d, "model", "model.ckpt")
        flat, meta = load_checkpoint(ckpt)
        params = _unflatten_into(init_ngp(jax.random.PRNGKey(k), small_model),
                                 flat, prefix="model::")
        grid = occ_mod.OccupancyGrid(
            occs=jnp.asarray(flat["occupancy::occs"]),
            binary=jnp.asarray(flat["occupancy::binary"]),
        )
        ex = extract_voxel_features(
            params, small_model, grid, meta, jax.random.PRNGKey(7),
            density_threshold=0.2, surface_chunk=2048,
        )
        # loosen: the 80-step model is weak; ensure non-empty artifacts
        if not (ex["density_mask"] & ex["surface_mask"]).any():
            ex["density_mask"][:] = True
            ex["surface_mask"][:] = True
        save_voxel_artifacts(d, ex)

    # ---- arrange the nerf_models layout the pair dataset expects ----------
    reg_root = os.path.join(root, "regdata")
    scene_models = os.path.join(reg_root, "nerf_models", "fixture_scene")
    img_meta_dir = os.path.join(reg_root, "images", "fixture_scene")
    os.makedirs(img_meta_dir, exist_ok=True)
    shutil.copyfile(
        os.path.join(data_root, "fixture_scene", "world_frame_transforms.json"),
        os.path.join(img_meta_dir, "world_frame_transforms.json"),
    )
    for k, d in enumerate(block_dirs):
        dst = os.path.join(scene_models, f"block_{k}")
        os.makedirs(os.path.join(dst, "model"), exist_ok=True)
        shutil.copyfile(os.path.join(d, "model", "model.ckpt"),
                        os.path.join(dst, "model", "model.ckpt"))
        for f in ("voxel_grid.pt", "voxel_mask.pt", "voxel_point_cloud.ply"):
            shutil.copyfile(os.path.join(d, f), os.path.join(dst, f))
    return root, reg_root, block_dirs


class TestPipeline:
    def test_artifacts_exist(self, pipeline):
        _, reg_root, _ = pipeline
        for k in (0, 1):
            d = os.path.join(reg_root, "nerf_models", "fixture_scene", f"block_{k}")
            for f in ("voxel_grid.pt", "voxel_mask.pt", "voxel_point_cloud.ply"):
                assert os.path.exists(os.path.join(d, f))

    def test_registration_trains_on_real_pair(self, pipeline):
        root, reg_root, _ = pipeline
        from dregnerf_tpu.datasets.register_pairs import NeRFRegDataset
        from dregnerf_tpu.losses.registration import init_infonce_W
        from dregnerf_tpu.models.regtr import NeRFRegTr
        from dregnerf_tpu.runtime import reg_trainer as RT
        from dregnerf_tpu.runtime.checkpoint import CheckpointManager

        ds = NeRFRegDataset(reg_root, subject_id="fixture_scene", split="test")
        assert len(ds) == 1
        item = ds[0]
        assert item["pose"].shape == (4, 4)

        cfg = config_parser([
            "--dataset", "objaverse", "--root_dir", reg_root,
            "--expname", "rege2e", "--out_dir", os.path.join(root, "regout"),
            "--aabb=-1.0,-1.0,-1.0,1.0,1.0,1.0",
            "--no_bf16", "--compilation_cache", "", "--robust_loss",
        ])
        tr = RT.RegTrainer.__new__(RT.RegTrainer)
        tr.config = cfg
        tr.train_dataset = ds
        tr.val_dataset = ds
        tr.output_dir = os.path.join(root, "regout", "rege2e")
        os.makedirs(tr.output_dir, exist_ok=True)
        tr.ckpt_manager = CheckpointManager(os.path.join(tr.output_dir, "model"))
        tr.aabb = jnp.asarray(cfg.aabb, jnp.float32)
        tr.model = NeRFRegTr(
            backbone="resnet18", d_model=64, num_layers=2, num_heads=4,
            dim_feedforward=128, max_input_points=1024, num_tokens=256,
            max_points=200, num_downsample=3, dtype=jnp.float32,
        )
        key = jax.random.PRNGKey(0)
        sample = tr._to_device(ds[0])
        tr.grid_resolution = int(sample["src_grid"].shape[0])
        tr.params = {
            "model": tr.model.init(key, sample)["params"],
            "infonce_W": init_infonce_W(key, 64),
        }
        tr.setup_optimizer()
        tr.iteration = 0
        tr._log_file = open(os.path.join(tr.output_dir, "log.txt"), "a")
        tr._step_fn = tr._make_step_fn()
        tr._eval_fn = tr._make_eval_fn()

        for _ in range(4):
            m = tr.train_iteration(ds[0])
            assert np.isfinite(float(m["total"]))
        assert np.isfinite(float(m["R_error"]))

    def test_novel_view_synthesis_from_checkpoint(self, pipeline, tmp_path):
        """Render 2 frames from a trained block checkpoint via the
        pose-only path (the eval video pipeline minus ffmpeg)."""
        root, reg_root, block_dirs = pipeline
        from dregnerf_tpu.render.novel_views import synthesize_novel_views

        ckpt = os.path.join(block_dirs[0], "model", "model.ckpt")
        poses = np.stack([
            np.concatenate([np.eye(3), [[0], [0], [3.0]]], 1),
            np.concatenate([np.eye(3), [[0.2], [0], [3.0]]], 1),
        ])
        # checkpoints are self-describing (model_config in meta), so the
        # shrunk test model rebuilds faithfully from the artifact alone
        frames = synthesize_novel_views(
            ckpt, poses, str(tmp_path / "frames"), "objaverse", factor=16,
            chunk_size=512,
        )
        assert len(frames) == 2
        for f in frames:
            assert os.path.exists(f)


def test_ngp_evaluator_cli_surface(pipeline, tmp_path):
    """Stage-2 Evaluator surface: render-eval writes metrics.json and
    extraction emits the voxel artifact set from a block checkpoint (the
    reference eval_ngp_nerf.py contract)."""
    import importlib
    import sys

    root, reg_root, block_dirs = pipeline
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ev_mod = importlib.import_module("eval_ngp_nerf")

    from dregnerf_tpu.datasets.base import load_scene_blocks

    cfg = config_parser([
        "--dataset", "objaverse", "--root_dir", os.path.join(root, "data"),
        "--scene", "fixture_scene", "--expname", "e2e",
        "--out_dir", os.path.join(root, "out"),
        "--factor", "1", "--aabb=-1.0,-1.0,-1.0,1.0,1.0,1.0",
        "--sample_budget", str(1 << 13), "--max_march_steps", "96",
        "--test_chunk_size", "2048", "--no_bf16", "--compilation_cache", "",
    ])
    test_scene = load_scene_blocks(
        "objaverse", os.path.join(root, "data"), "fixture_scene", "test", 1,
        True, 2,
    )[0]
    ev = ev_mod.Evaluator(cfg, block_dirs[0], test_scene)
    result = ev.evaluate()
    assert np.isfinite(result["psnr"]) and result["num_views"] > 0
    assert os.path.exists(os.path.join(block_dirs[0], "eval", "metrics.json"))
    ev.sample_points()
    for f in ("voxel_grid.pt", "voxel_mask.pt", "voxel_point_cloud.ply",
              "density_voxel_grid.pt", "density_voxel_point_cloud.ply"):
        assert os.path.exists(os.path.join(block_dirs[0], f)), f
