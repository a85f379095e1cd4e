"""Sigma-sharpness gate (round 3): which training default diffuses density?

Round-3 stage-1 blocks (capped-512 marching + bf16 table-grad EMA defaults,
4000 iters, 2^19 tables) converge to high PSNR but DIFFUSE density:
sigma_p90 ~73-101 where round-2 blocks (compact+f32, 1000 iters, 2^15
tables) had 159-230 — so the stage-2 surface field S = 1-T never crosses
the 0.5 cutoff (S_p99 0.44) and extraction collapses (82 of ~10k shell
voxels). PSNR alone cannot see this; this gate trains the SAME block under
the 2x2 of {capped,compact} x {bf16,f32} at fleet settings and reports the
extraction-relevant distributions per config.

Decision rule: keep the fastest config whose surface-voxel count and val
PSNR match compact+f32 (the round-2 reference default).

Run on the TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/experiments/sigma_gate.py
"""
from __future__ import annotations

import dataclasses
import json
import os
import time

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/dregnerf_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from dregnerf_tpu.datasets import fixtures
from dregnerf_tpu.datasets.base import load_scene_blocks
from dregnerf_tpu.geometry.cameras import image_rays
from dregnerf_tpu.models.ngp import NGPConfig, init_ngp
from dregnerf_tpu.ops.packed_grid import PackedGridConfig
from dregnerf_tpu.render.renderer import RenderConfig, render_image_chunked
from dregnerf_tpu.runtime.config import config_parser
from dregnerf_tpu.runtime.ngp_trainer import (NGPTrainer,
                                              load_field_from_checkpoint)

WORK = os.environ.get("SIGMA_GATE_WORK", "/tmp/sigma_gate")
ITERS = int(os.environ.get("SIGMA_GATE_ITERS", 4000))
BUDGET = int(os.environ.get("SIGMA_GATE_BUDGET", 1 << 17))
# data-scale knobs: the 2x2 found the diffuseness is capacity-vs-data
# (ALL configs fog at 36 views x 96px with 2^19 tables), so the second
# experiment raises the pixel count toward the reference's regime
# (objaverse: ~100 views x 800^2)
N_VIEWS = int(os.environ.get("SIGMA_GATE_VIEWS", 36))
IMG_SIZE = int(os.environ.get("SIGMA_GATE_IMG", 96))
_ALL = [
    ("compact", "f32"),   # round-2 default: the quality reference
    ("capped", "f32"),
    ("compact", "bf16"),
    ("capped", "bf16"),   # round-3 default: the suspect
]
_SEL = os.environ.get("SIGMA_GATE_CONFIGS", "")
CONFIGS = (
    [tuple(c.split("_")) for c in _SEL.split(",")] if _SEL else _ALL
)


def composite_white(img_u8):
    gt = np.asarray(img_u8, np.float32) / 255.0
    return gt[..., :3] * gt[..., 3:4] + (1.0 - gt[..., 3:4])


def psnr(a, b):
    return -10.0 * np.log10(float(np.mean((a - b) ** 2)) + 1e-12)


def render_view(params, model_cfg, grid, meta, rcfg, K, c2w, h, w, opengl):
    rays = image_rays(jnp.asarray(K), jnp.asarray(c2w), h, w, opengl)
    rgb, _, _ = render_image_chunked(
        params, model_cfg, grid,
        rays.origins.reshape(-1, 3), rays.viewdirs.reshape(-1, 3),
        jnp.asarray(meta["aabb"]), rcfg, jnp.ones(3),
    )
    return np.asarray(rgb).reshape(h, w, 3)


def checkpoint_metrics(ckpt, te, tr):
    """The extraction-relevant distributions for one trained block."""
    from dregnerf_tpu.extract.sample_grid import (compute_surface_mask,
                                                  extract_voxel_features)

    params, grid, meta, model_cfg, rcfg = load_field_from_checkpoint(ckpt)
    rcfg_eval = dataclasses.replace(
        rcfg, march_compaction="rows", chunk_size=8192)
    val_psnr = psnr(
        render_view(params, model_cfg, grid, meta, rcfg_eval, te.K,
                    te.camtoworlds[0], te.height, te.width, te.opengl),
        composite_white(te.images[0]))
    tr_psnr = psnr(
        render_view(params, model_cfg, grid, meta, rcfg_eval, tr.K,
                    tr.camtoworlds[0], tr.height, tr.width, tr.opengl),
        composite_white(tr.images[0]))
    ex = extract_voxel_features(
        params, model_cfg, grid, meta, jax.random.PRNGKey(7),
        surface_chunk=8192)
    sigma = np.asarray(ex["sigma"])
    rcfg_s = RenderConfig(
        contraction=meta["contraction_type"],
        render_step_size=float(meta["render_step_size"]))
    scores = compute_surface_mask(
        params, model_cfg, grid, jnp.asarray(meta["aabb"]), rcfg_s,
        np.asarray(ex["points"]), np.asarray(meta["camera_poses"]),
        return_scores=True)
    return {
        "occ_cells": int(np.asarray(grid.binary).sum()),
        "val_psnr": round(val_psnr, 2),
        "train_psnr": round(tr_psnr, 2),
        "density_mask": int(np.asarray(ex["density_mask"]).sum()),
        "surface_mask": int(np.asarray(ex["surface_mask"]).sum()),
        "sigma_p50": round(float(np.percentile(sigma, 50)), 1),
        "sigma_p90": round(float(np.percentile(sigma, 90)), 1),
        "sigma_p99": round(float(np.percentile(sigma, 99)), 1),
        "S_p90": round(float(np.percentile(scores, 90)), 3),
        "S_p99": round(float(np.percentile(scores, 99)), 3),
        "S_ge_cutoff": int((scores >= 0.5).sum()),
    }


def main():
    data_root = os.path.join(WORK, "data")
    scene = "scene_00"
    if not os.path.exists(os.path.join(data_root, scene, "transforms.json")):
        fixtures.make_scene(data_root, num_views=N_VIEWS, image_size=IMG_SIZE,
                            seed=0, name=scene,
                            spheres=fixtures.random_spheres(100))
    tr = load_scene_blocks("objaverse", data_root, scene, "train", 1, True, 2)[0]
    te = load_scene_blocks("objaverse", data_root, scene, "test", 1, True, 2)[0]

    results = {}
    scale_tag = f"@{N_VIEWS}x{IMG_SIZE}" if (N_VIEWS, IMG_SIZE) != (36, 96) \
        else ""
    for march, accum in CONFIGS:
        name = f"{march}_{accum}"
        out_dir = os.path.join(WORK, "out", name)
        ckpt = os.path.join(out_dir, "model", "model.ckpt")
        rec = {"march": march, "accum": accum}
        if not os.path.exists(ckpt):
            cfg = config_parser([
                "--dataset", "objaverse", "--root_dir", data_root,
                "--scene", scene, "--expname", name, "--out_dir",
                os.path.join(WORK, "out"),
                "--factor", "1", "--aabb=-1.0,-1.0,-1.0,1.0,1.0,1.0",
                "--max_iterations", str(ITERS),
                "--sample_budget", str(BUDGET), "--max_march_steps", "1024",
                "--grid_resolution", "128", "--init_num_rays", "1024",
                "--max_num_rays", str(1 << 15),
                "--n_tensorboard", "1000", "--n_validation", "1000000",
                "--n_checkpoint", str(ITERS),
            ])
            trainer = NGPTrainer(cfg, tr, te, output_dir=out_dir)
            trainer.model_config = NGPConfig(
                grid=PackedGridConfig(grad_accum=accum))
            trainer.render_config = dataclasses.replace(
                trainer.render_config, march_compaction=march)
            trainer.params = init_ngp(jax.random.PRNGKey(0),
                                      trainer.model_config)
            trainer.opt_state = trainer.optimizer.init(trainer.params)
            trainer.state.params = trainer.params
            trainer.state.opt_state = trainer.opt_state
            trainer._step_fns = {}
            trainer.__dict__.pop("_occ_update_fns", None)
            t0 = time.time()
            trainer.train()
            rec["train_s"] = round(time.time() - t0, 1)
        rec.update(checkpoint_metrics(ckpt, te, tr))
        rec["views"], rec["img"] = N_VIEWS, IMG_SIZE
        results[name + scale_tag] = rec
        print(json.dumps(rec), flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "experiments", "stage3",
        "sigma_gate.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    try:  # merge across runs (each run covers one data scale / config set)
        with open(out) as f:
            merged = json.load(f)
    except Exception:
        merged = {}
    merged.update(results)
    with open(out, "w") as f:
        json.dump(merged, f, indent=2, sort_keys=True)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
