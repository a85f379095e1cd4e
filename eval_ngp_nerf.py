"""Evaluate trained NGP blocks + extract voxel feature grids (stage 2).

CLI parity with the reference eval_ngp_nerf.py: renders the test split
(PSNR/SSIM/LPIPS -> eval/<scene>/metrics.json), then extracts
voxel_grid.pt / voxel_mask.pt / voxel_point_cloud.ply (+ density_* variants)
next to each block checkpoint (reference Evaluator, eval_ngp_nerf.py:38-459).
"""
from __future__ import annotations

import json
import os

import numpy as np

from dregnerf_tpu.runtime.config import config_parser, setup_jax


class Evaluator:
    def __init__(self, config, model_dir: str, scene_data):
        import jax

        from dregnerf_tpu.runtime.ngp_trainer import load_field_from_checkpoint

        self.config = config
        self.model_dir = model_dir
        self.scene = scene_data
        ckpt = os.path.join(model_dir, "model", "model.ckpt")
        if not os.path.exists(ckpt):
            ckpt = os.path.join(model_dir, "model.ckpt")
        (
            self.params, self.grid, self.meta, self.model_config, self.render_config,
        ) = load_field_from_checkpoint(ckpt)
        self.key = jax.random.PRNGKey(config.seed)

    def evaluate(self) -> dict:
        """Render every test view; PSNR/SSIM/LPIPS -> metrics.json."""
        import dataclasses

        import jax.numpy as jnp

        from dregnerf_tpu.geometry.cameras import image_rays
        from dregnerf_tpu.render.renderer import render_image_chunked
        from dregnerf_tpu.utils import metrics as M

        scene = self.scene
        rcfg = dataclasses.replace(
            self.render_config,
            buffer_size=self.config.sample_budget,
            max_steps=self.config.max_march_steps,
            chunk_size=self.config.test_chunk_size,
            image_dispatch=getattr(self.config, "image_dispatch", "")
            or "scan",
        )
        psnrs, ssims, lpipss, lpips_rands = [], [], [], []
        out_dir = os.path.join(self.model_dir, "eval")
        os.makedirs(out_dir, exist_ok=True)
        bg = jnp.ones(3)
        for i in range(scene.num_images):
            rays = image_rays(
                jnp.asarray(scene.K), jnp.asarray(scene.camtoworlds[i]),
                scene.height, scene.width, scene.opengl,
            )
            rgb, _, _ = render_image_chunked(
                self.params, self.model_config, self.grid,
                rays.origins.reshape(-1, 3), rays.viewdirs.reshape(-1, 3),
                jnp.asarray(self.meta["aabb"]), rcfg, bg,
            )
            rgb = np.asarray(rgb).reshape(scene.height, scene.width, 3)
            gt = np.asarray(scene.images[i], np.float32) / 255.0
            if scene.synthetic:
                gt = gt[..., :3] * gt[..., 3:4] + (1.0 - gt[..., 3:4])
            mse = float(np.mean((rgb - gt) ** 2))
            psnrs.append(-10.0 * np.log10(mse))
            ssims.append(float(M.ssim(jnp.asarray(rgb), jnp.asarray(gt))))
            lp = M.lpips(rgb, gt)
            if lp is not None:
                lpipss.append(lp)
            lpips_rands.append(M.lpips_rand(rgb, gt))
            try:
                import imageio.v2 as imageio

                imageio.imwrite(
                    os.path.join(out_dir, f"rgb_{i:03d}.png"),
                    (np.clip(rgb, 0, 1) * 255).astype(np.uint8),
                )
            except Exception:
                pass
        result = {
            "psnr": float(np.mean(psnrs)),
            "ssim": float(np.mean(ssims)),
            "lpips": float(np.mean(lpipss)) if lpipss else None,
            # hermetic fallback perceptual column (random-feature LPIPS
            # architecture, utils/lpips.py) — lower is better; NOT
            # numerically comparable to published LPIPS(alex) values
            "lpips_rand_alex": float(np.mean(lpips_rands)),
            "num_views": len(psnrs),
        }
        if not lpipss:
            result["lpips_note"] = (
                "true LPIPS needs calibration weights exported by "
                "scripts/preprocess/export_lpips_weights.py (zero-egress "
                "image has none); lpips_rand_alex is the documented "
                "fallback perceptual metric"
            )
        with open(os.path.join(out_dir, "metrics.json"), "w") as f:
            json.dump(result, f, indent=2)
        print(f"[eval] {self.model_dir}: {result}")
        return result

    def sample_points(self) -> None:
        import jax

        from dregnerf_tpu.extract.sample_grid import (
            extract_voxel_features,
            save_voxel_artifacts,
        )

        from dregnerf_tpu.parallel.mesh import make_mesh_from_config

        extracted = extract_voxel_features(
            self.params, self.model_config, self.grid, self.meta, self.key,
            surface_chunk=min(self.config.test_chunk_size, 8192),
            mesh=make_mesh_from_config(self.config),
        )
        save_voxel_artifacts(self.model_dir, extracted)
        n_surf = int((extracted["surface_mask"] & extracted["density_mask"]).sum())
        print(f"[extract] {self.model_dir}: {n_surf} surface voxels")


def main() -> None:
    config = config_parser()
    setup_jax(config)
    from dregnerf_tpu.datasets.base import load_scene_blocks

    exp_dir = os.path.join(config.out_dir, config.expname)
    block_dirs = sorted(
        d for d in os.listdir(exp_dir) if d.startswith("block_")
    ) if os.path.isdir(exp_dir) else []

    if block_dirs:
        test_blocks = load_scene_blocks(
            config.dataset, config.root_dir, config.scene, "test",
            config.factor, True, len(block_dirs),
        )
        for d, scene in zip(block_dirs, test_blocks):
            ev = Evaluator(config, os.path.join(exp_dir, d), scene)
            ev.evaluate()
            ev.sample_points()
    else:
        scene = load_scene_blocks(
            config.dataset, config.root_dir, config.scene, "test", config.factor
        )[0]
        ev = Evaluator(config, exp_dir, scene)
        ev.evaluate()
        ev.sample_points()


if __name__ == "__main__":
    main()
