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
            pred_np = {k: np.asarray(v) for k, v in pred.items()}
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

            # aligned / unaligned point-cloud dumps + classical baseline
            try:
                src_pts, src_cols = read_ply(item["src_ply_path"])
                tgt_pts, tgt_cols = read_ply(item["tgt_ply_path"])

                # optional ICP polish of the RegTr pose (--icp_refine;
                # reference refine_registration, global_registration.py:85)
                if getattr(self.config, "icp_refine", False):
                    from dregnerf_tpu.registration.icp import icp_refine

                    t1 = time.time()
                    refined, icp_rms, icp_cnt = icp_refine(
                        src_pts, tgt_pts, pose,
                        voxel_size=2.0 / self.config.grid_resolution * 2,
                        src_colors=src_cols, tgt_colors=tgt_cols,
                    )
                    if refined is not None:
                        rre_i, rte_i = se3.pose_error(refined, gt)
                        per_scene[scene].update(
                            R_error_icp_deg=float(rre_i),
                            t_error_icp=float(rte_i),
                            icp_rms=float(icp_rms),
                            icp_inliers=int(icp_cnt),
                            icp_time=time.time() - t1,
                        )
                        pose = refined  # aligned dumps use the best pose

                aligned = src_pts @ pose[:3, :3].T + pose[:3, 3]
                write_ply(os.path.join(scene_dir, "src_unaligned.ply"), src_pts, src_cols)
                write_ply(os.path.join(scene_dir, "src_aligned.ply"), aligned, src_cols)
                write_ply(os.path.join(scene_dir, "tgt.ply"), tgt_pts, tgt_cols)

                from dregnerf_tpu.registration.pipeline import (
                    best_global_registration,
                )

                fgr_pose, ginfo = best_global_registration(
                    src_pts, tgt_pts,
                    src_colors=src_cols, tgt_colors=tgt_cols,
                    icp_voxel=2.0 / self.config.grid_resolution * 2,
                    refine=getattr(self.config, "icp_refine", False),
                )
                if fgr_pose is not None:
                    frre, frte = se3.pose_error(fgr_pose[:3, :4], gt)
                    fgr_per_scene[scene] = {
                        "R_error_deg": float(frre), "t_error": float(frte),
                        "time": ginfo.get("time_s"),
                        "winner": ginfo.get("winner"),
                    }
            except FileNotFoundError:
                pass

            # keypoint / overlap-filtered cloud artifacts (reference
            # eval_nerf_regtr.py:371-438)
            self._dump_keypoint_clouds(scene_dir, pred_np, pose, gt)

            # fused-scene videos: src + pred/gt-aligned tgt NeRF rendered
            # side by side (reference render_videos x3,
            # eval_nerf_regtr.py:348-369); skipped without NeRF checkpoints
            if getattr(self.config, "render_videos", False) or os.environ.get(
                "DREG_RENDER_VIDEOS"
            ):
                self._render_videos(scene_dir, item, pose, gt)

            print(f"[eval] {scene}: RRE {float(rre):.3f} deg RTE {float(rte):.4f} ({dt:.2f}s)")

        return self._agg_and_write(per_scene, fgr_per_scene)

    def _dump_keypoint_clouds(self, scene_dir, pred, pose_est, pose_gt) -> None:
        """Keypoint + overlap-score-filtered cloud artifacts (reference
        eval_nerf_regtr.py:371-438): src_xyz / tgt_xyz / *_kp_warped,
        red+green composites, noisy_point_cloud_{pred,gt} and the
        overlap>=0.5-filtered point_cloud_{pred,gt}."""
        from dregnerf_tpu.io.ply import write_ply

        red = np.array([1.0, 0.0, 0.0])
        green = np.array([0.0, 1.0, 0.0])
        sv = pred["src_valid"].astype(bool)
        tv = pred["tgt_valid"].astype(bool)
        src_kp = pred["src_kp"][sv]
        tgt_kp = pred["tgt_kp"][tv]
        src_warp = pred["src_kp_warped"][-1][sv]
        tgt_warp = pred["tgt_kp_warped"][-1][tv]

        def dump(name, pts, cols=None):
            write_ply(os.path.join(scene_dir, name), pts, cols)

        dump("src_xyz.ply", src_kp)
        dump("tgt_xyz.ply", tgt_kp)
        dump("src_kp_warped.ply", src_warp)
        dump("tgt_kp_warped.ply", tgt_warp)
        dump("all_src_xyz.ply", np.concatenate([src_kp, tgt_warp]),
             np.concatenate([np.tile(red, (len(src_kp), 1)),
                             np.tile(green, (len(tgt_warp), 1))]))
        dump("all_tgt_xyz.ply", np.concatenate([src_warp, tgt_kp]),
             np.concatenate([np.tile(red, (len(src_warp), 1)),
                             np.tile(green, (len(tgt_kp), 1))]))

        overlap = np.concatenate(
            [pred["src_overlap"][-1][sv], pred["tgt_overlap"][-1][tv]]) >= 0.5
        src_pred = src_kp @ pose_est[:3, :3].T + pose_est[:3, 3]
        fused_pred = np.concatenate([src_pred, tgt_kp])
        dump("noisy_point_cloud_pred.ply", fused_pred,
             np.concatenate([np.tile(red, (len(src_pred), 1)),
                             np.tile(green, (len(tgt_kp), 1))]))
        dump("point_cloud_pred.ply", fused_pred[overlap],
             np.tile(green, (int(overlap.sum()), 1)))
        src_gt = src_kp @ pose_gt[:3, :3].T + pose_gt[:3, 3]
        fused_gt = np.concatenate([src_gt, tgt_kp])
        dump("noisy_point_cloud_gt.ply", fused_gt,
             np.tile(red, (len(fused_gt), 1)))
        dump("point_cloud_gt.ply", fused_gt[overlap],
             np.tile(red, (int(overlap.sum()), 1)))

    @staticmethod
    def _orbit_poses(n: int = 12) -> np.ndarray:
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
        return np.stack(poses)

    def _render_videos(self, scene_dir, item, pose_est, pose_gt) -> None:
        """Fused-scene orbits: [src rgb|depth | tgt rgb|depth] side-by-side
        frames + mp4 for gt/aligned (tgt cameras mapped by the pose) and
        unaligned (identical cameras) — reference render_videos semantics."""
        from dregnerf_tpu.render.novel_views import render_pair_views

        src_ckpt = item.get("src_nerf_path", "")
        tgt_ckpt = item.get("tgt_nerf_path", "")
        # any loadable checkpoint artifact works — no filename-suffix
        # requirement (the manager writes .ckpt but users may point at
        # exported/renamed artifacts)
        ok = all(p and os.path.exists(p) for p in (src_ckpt, tgt_ckpt))
        if not ok:
            return
        poses = self._orbit_poses()
        for tag, transform in (
            ("gt", pose_gt), ("aligned", pose_est), ("unaligned", None)
        ):
            # continue per-tag: a failure in "gt" must not silently drop
            # the aligned/unaligned videos
            try:
                render_pair_views(
                    src_ckpt, tgt_ckpt, poses, transform, scene_dir, tag,
                    self.config.dataset or "objaverse", factor=8,
                )
            except Exception as e:
                print(f"[eval] video {tag} skipped: {e}")

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
