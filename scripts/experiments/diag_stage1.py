"""Diagnose stage-1 round-3 val-PSNR collapse + tiny surface-voxel counts.

For each existing /tmp/stage3_fleet checkpoint:
  * occupancy fill;
  * fixed-eval (rows marching, generous buffer) PSNR on BOTH the held-out
    view and a TRAIN view (train view discriminates renderer bug vs
    overfitting: training logged PSNR ~60 on these pixels);
  * density/surface mask counts from a fresh extraction pass.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/dregnerf_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from stage3_fleet import WORK  # noqa: E402

from dregnerf_tpu.datasets.base import load_scene_blocks  # noqa: E402
from dregnerf_tpu.geometry.cameras import image_rays  # noqa: E402
from dregnerf_tpu.render.renderer import render_image_chunked  # noqa: E402
from dregnerf_tpu.runtime.ngp_trainer import load_field_from_checkpoint  # noqa: E402


def composite_white(img_u8):
    gt = np.asarray(img_u8, np.float32) / 255.0
    return gt[..., :3] * gt[..., 3:4] + (1.0 - gt[..., 3:4])


def render_view(params, model_cfg, grid, meta, rcfg, K, c2w, h, w, opengl):
    rays = image_rays(jnp.asarray(K), jnp.asarray(c2w), h, w, opengl)
    rgb, _, _ = render_image_chunked(
        params, model_cfg, grid,
        rays.origins.reshape(-1, 3), rays.viewdirs.reshape(-1, 3),
        jnp.asarray(meta["aabb"]), rcfg, jnp.ones(3),
    )
    return np.asarray(rgb).reshape(h, w, 3)


def psnr(a, b):
    return -10.0 * np.log10(float(np.mean((a - b) ** 2)) + 1e-12)


def main():
    data_root = os.path.join(WORK, "data")
    out_root = os.path.join(WORK, "out")
    scene = "scene_00"
    train_blocks = load_scene_blocks(
        "objaverse", data_root, scene, "train", 1, True, 2)
    test_blocks = load_scene_blocks(
        "objaverse", data_root, scene, "test", 1, True, 2)
    for k, (tr, te) in enumerate(zip(train_blocks, test_blocks)):
        ckpt = os.path.join(out_root, scene, f"block_{k}", "model", "model.ckpt")
        if not os.path.exists(ckpt):
            continue
        params, grid, meta, model_cfg, rcfg = load_field_from_checkpoint(ckpt)
        occ_fill = int(np.asarray(grid.binary).sum())
        rcfg_eval = dataclasses.replace(
            rcfg, march_compaction="rows", chunk_size=8192)

        val_rgb = render_view(
            params, model_cfg, grid, meta, rcfg_eval,
            te.K, te.camtoworlds[0], te.height, te.width, te.opengl)
        val_gt = composite_white(te.images[0])
        tr_rgb = render_view(
            params, model_cfg, grid, meta, rcfg_eval,
            tr.K, tr.camtoworlds[0], tr.height, tr.width, tr.opengl)
        tr_gt = composite_white(tr.images[0])

        # extraction masks + raw surface-score distribution
        from dregnerf_tpu.extract.sample_grid import extract_voxel_features
        ex = extract_voxel_features(
            params, model_cfg, grid, meta, jax.random.PRNGKey(7),
            surface_chunk=8192,
        )
        dm = int(np.asarray(ex["density_mask"]).sum())
        sm = int(np.asarray(ex["surface_mask"]).sum())
        both = int(np.asarray(ex["surface_mask"] & ex["density_mask"]).sum())
        sigma = np.asarray(ex.get("sigma", np.zeros(1)))

        from dregnerf_tpu.extract.sample_grid import compute_surface_mask
        from dregnerf_tpu.render.renderer import RenderConfig
        rcfg_s = RenderConfig(
            contraction=meta["contraction_type"],
            render_step_size=float(meta["render_step_size"]),
        )
        scores = compute_surface_mask(
            params, model_cfg, grid, jnp.asarray(meta["aabb"]), rcfg_s,
            np.asarray(ex["points"]), np.asarray(meta["camera_poses"]),
            return_scores=True,
        )
        print(json.dumps({
            "block": k, "occ_cells": occ_fill,
            "val_psnr_fixed": round(psnr(val_rgb, val_gt), 2),
            "train_psnr_fixed": round(psnr(tr_rgb, tr_gt), 2),
            "density_mask": dm, "surface_mask": sm, "both": both,
            "sigma_p50": float(np.percentile(sigma, 50)),
            "sigma_p90": float(np.percentile(sigma, 90)),
            "S_p50": float(np.percentile(scores, 50)),
            "S_p90": float(np.percentile(scores, 90)),
            "S_p99": float(np.percentile(scores, 99)),
            "S_max": float(scores.max()),
            "S_ge_cutoff": int((scores >= 0.5).sum()),
        }), flush=True)


if __name__ == "__main__":
    main()
