"""Evaluate NeRFRegTr on held-out NeRF pairs (stage 3 eval).

CLI parity with the reference eval_nerf_regtr.py: per test pair, run the
registration forward (timed), record RRE/RTE mean/median, run the classical
FGR baseline side-by-side, dump transformation_est.json + aligned /
unaligned point clouds, and (when a NeRF checkpoint + ffmpeg are present)
render aligned novel-view videos.
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import time

import numpy as np

from dregnerf_tpu.runtime.config import config_parser, setup_jax


class RegEvaluator:
    def __init__(self, config, dataset):
        import jax
        import jax.numpy as jnp

        from dregnerf_tpu.runtime.checkpoint import load_checkpoint
        from dregnerf_tpu.runtime.reg_trainer import RegTrainer, make_reg_model
        from dregnerf_tpu.losses.registration import init_infonce_W

        self.config = config
        self.dataset = dataset
        self.output_dir = os.path.join(config.out_dir, config.expname, "eval")
        os.makedirs(self.output_dir, exist_ok=True)

        self.model = make_reg_model(config, jnp.bfloat16 if config.bf16 else jnp.float32)
        ckpt = config.ckpt_path or os.path.join(
            config.out_dir, config.expname, "model", "model.ckpt"
        )
        sample = RegTrainer._to_device(dataset[0])
        key = jax.random.PRNGKey(0)
        params = {
            "model": self.model.init(key, sample)["params"],
            "infonce_W": init_infonce_W(key, config.position_embedding_dim),
        }
        if os.path.exists(ckpt):
            state, meta = load_checkpoint(ckpt, {"params": params})
            self.params = state["params"]
            print(f"loaded RegTr checkpoint {ckpt} (step {meta.get('step')})")
        else:
            self.params = params
            print(f"[WARNING] no checkpoint at {ckpt}; evaluating random init")

        @jax.jit
        def forward(params, batch):
            return self.model.apply({"params": params["model"]}, batch)

        self._forward = forward

    def evaluate(self) -> dict:
        import jax

        from dregnerf_tpu.geometry import se3
        from dregnerf_tpu.io.ply import read_ply, write_ply
        from dregnerf_tpu.runtime.reg_trainer import RegTrainer

        per_scene = {}
        fgr_per_scene = {}
        for i in range(len(self.dataset)):
            item = self.dataset[i]
            batch = RegTrainer._to_device(item)
            t0 = time.time()
            pred = self._forward(self.params, batch)
            pose = np.asarray(jax.block_until_ready(pred["pose"][-1]))
            dt = time.time() - t0
            gt = np.asarray(item["pose"])[:3, :4]
            rre, rte = se3.pose_error(pose, gt)
            scene = item["scene"]
            per_scene[scene] = {
                "R_error_deg": float(rre), "t_error": float(rte), "time": dt,
                "blocks": [int(b) for b in item["block_list"]],
            }

            scene_dir = os.path.join(self.output_dir, scene)
            os.makedirs(scene_dir, exist_ok=True)
            with open(os.path.join(scene_dir, "transformation_est.json"), "w") as f:
                json.dump(
                    {"pose_est": pose.tolist(), "pose_gt": gt.tolist()}, f, indent=2
                )

            # pose artifacts (reference dumps pose .pt tensors alongside json)
            try:
                import torch

                torch.save(torch.from_numpy(pose.copy()),
                           os.path.join(scene_dir, "pose_est.pt"))
                torch.save(torch.from_numpy(gt.copy()),
                           os.path.join(scene_dir, "pose_gt.pt"))
            except Exception:
                pass

            # aligned / unaligned point-cloud dumps + FGR baseline
            try:
                src_pts, src_cols = read_ply(item["src_ply_path"])
                tgt_pts, tgt_cols = read_ply(item["tgt_ply_path"])
                aligned = src_pts @ pose[:3, :3].T + pose[:3, 3]
                write_ply(os.path.join(scene_dir, "src_unaligned.ply"), src_pts, src_cols)
                write_ply(os.path.join(scene_dir, "src_aligned.ply"), aligned, src_cols)
                write_ply(os.path.join(scene_dir, "tgt.ply"), tgt_pts, tgt_cols)

                from dregnerf_tpu.registration.fgr import run_registration

                fgr_pose, fgr_time = run_registration(src_pts, tgt_pts)
                if fgr_pose is None:  # sparse clouds: retry finer voxels
                    fgr_pose, fgr_time = run_registration(
                        src_pts, tgt_pts, voxel_size=0.02
                    )
                if fgr_pose is not None:
                    frre, frte = se3.pose_error(fgr_pose[:3, :4], gt)
                    fgr_per_scene[scene] = {
                        "R_error_deg": float(frre), "t_error": float(frte),
                        "time": fgr_time,
                    }
            except FileNotFoundError:
                pass

            # novel-view videos: render the src NeRF aligned by the
            # predicted pose vs unaligned vs GT (reference render_videos x3,
            # eval_nerf_regtr.py:348-369); skipped without a NeRF checkpoint
            if self.config.enable_visdom or os.environ.get("DREG_RENDER_VIDEOS"):
                self._render_videos(scene_dir, item, pose, gt)

            print(f"[eval] {scene}: RRE {float(rre):.3f} deg RTE {float(rte):.4f} ({dt:.2f}s)")

        return self._agg_and_write(per_scene, fgr_per_scene)

    def _render_videos(self, scene_dir, item, pose_est, pose_gt) -> None:
        """Render short aligned/unaligned/gt orbits from the src NeRF."""
        import numpy as np

        from dregnerf_tpu.render.novel_views import (
            frames_to_video,
            synthesize_novel_views,
        )

        ckpt = item.get("src_nerf_path", "")
        if not (ckpt and os.path.exists(ckpt) and ckpt.endswith(".ckpt")):
            return
        # small orbit of poses around the scene
        n = 12
        poses = []
        for i in range(n):
            th = 2 * np.pi * i / n
            eye = 3.0 * np.array([np.cos(th), np.sin(th), 0.5])
            fwd = -eye / np.linalg.norm(eye)
            right = np.cross(fwd, [0, 0, 1.0])
            right /= np.linalg.norm(right)
            up = np.cross(right, fwd)
            c2w = np.eye(4)
            c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
            poses.append(c2w)
        poses = np.stack(poses)
        for tag, transform in (
            ("gt", pose_gt), ("aligned", pose_est), ("unaligned", None)
        ):
            frame_dir = os.path.join(scene_dir, f"frames_{tag}")
            try:
                synthesize_novel_views(
                    ckpt, poses, frame_dir, self.config.dataset or "objaverse",
                    factor=8, transform=transform,
                )
                frames_to_video(frame_dir, os.path.join(scene_dir, f"{tag}.mp4"))
            except Exception as e:
                print(f"[eval] video {tag} skipped: {e}")
                break

    def _agg_and_write(self, per_scene, fgr_per_scene):
        def agg(d):
            if not d:
                return {}
            r = [v["R_error_deg"] for v in d.values()]
            t = [v["t_error"] for v in d.values()]
            return {
                "R_mean": float(np.mean(r)), "R_med": float(np.median(r)),
                "t_mean": float(np.mean(t)), "t_med": float(np.median(t)),
                "num_pairs": len(d),
            }

        metrics = {"per_scene": per_scene, "aggregate": agg(per_scene)}
        with open(os.path.join(self.output_dir, "metrics_test.json"), "w") as f:
            json.dump(metrics, f, indent=2)
        if fgr_per_scene:
            with open(os.path.join(self.output_dir, "fgr_metrics_test.json"), "w") as f:
                json.dump(
                    {"per_scene": fgr_per_scene, "aggregate": agg(fgr_per_scene)},
                    f, indent=2,
                )
        print(f"[eval] aggregate: {metrics['aggregate']}")
        return metrics


def main() -> None:
    config = config_parser()
    setup_jax(config)
    from dregnerf_tpu.datasets.register_pairs import NeRFRegDataset

    dataset = NeRFRegDataset(
        config.root_dir, config.dataset or "objaverse", config.json_dir,
        subject_id=config.scene or None, split="test", seed=config.seed,
    )
    RegEvaluator(config, dataset).evaluate()


if __name__ == "__main__":
    main()
