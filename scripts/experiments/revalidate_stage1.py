"""Re-validate stage-1 fleet blocks from their checkpoints.

Renders the held-out view of every <scene>/block_k checkpoint under the
stage-3 work dir with the FIXED eval renderer (rows marching, adequate
per-ray buffer) and rewrites experiments/stage3/stage1_psnr.json.
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
from stage3_fleet import OUT, WORK, scene_names  # noqa: E402

from dregnerf_tpu.datasets.base import load_scene_blocks  # noqa: E402
from dregnerf_tpu.geometry.cameras import image_rays  # noqa: E402
from dregnerf_tpu.render.renderer import render_image_chunked  # noqa: E402
from dregnerf_tpu.runtime.ngp_trainer import load_field_from_checkpoint  # noqa: E402


def main():
    data_root = os.path.join(WORK, "data")
    out_root = os.path.join(WORK, "out")
    rec = {}
    for scene in scene_names():
        try:
            test_blocks = load_scene_blocks(
                "objaverse", data_root, scene, "test", 1, True, 2
            )
        except Exception as e:
            print(f"[reval] {scene}: no data ({e})")
            continue
        for k, tb in enumerate(test_blocks):
            ckpt = os.path.join(out_root, scene, f"block_{k}", "model", "model.ckpt")
            if not os.path.exists(ckpt):
                continue
            params, grid, meta, model_cfg, rcfg = load_field_from_checkpoint(ckpt)
            rcfg = dataclasses.replace(
                rcfg, march_compaction="rows", chunk_size=8192
            )
            rays = image_rays(
                jnp.asarray(tb.K), jnp.asarray(tb.camtoworlds[0]),
                tb.height, tb.width, tb.opengl,
            )
            rgb, _, _ = render_image_chunked(
                params, model_cfg, grid,
                rays.origins.reshape(-1, 3), rays.viewdirs.reshape(-1, 3),
                jnp.asarray(meta["aabb"]), rcfg, jnp.ones(3),
            )
            rgb = np.asarray(rgb).reshape(tb.height, tb.width, 3)
            gt = np.asarray(tb.images[0], np.float32) / 255.0
            gt = gt[..., :3] * gt[..., 3:4] + (1.0 - gt[..., 3:4])
            psnr = -10.0 * np.log10(float(np.mean((rgb - gt) ** 2)))
            rec[f"{scene}/block_{k}"] = round(psnr, 2)
            print(f"[reval] {scene}/block_{k}: val PSNR {psnr:.2f}", flush=True)
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "stage1_psnr.json"), "w") as f:
        json.dump(rec, f, indent=2, sort_keys=True)
    vals = list(rec.values())
    if vals:
        print(json.dumps({
            "blocks": len(vals), "min": min(vals), "mean": round(float(np.mean(vals)), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
