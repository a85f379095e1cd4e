"""Registration (NeRFRegTr) training runtime.

Parity with the reference `RegTrainer` (train_nerf_regtr.py:64-299):
4 losses with weights {overlap 1, nerf_cont 1, feature 0.1, corr 1},
AdamW(lr 1e-4, wd 1e-4) + StepLR(34000, 0.5), grad-clip 0.1, RRE/RTE
validation on a val-scene subsample, checkpoint carries the InfoNCE W.

TPU-first redesign (SURVEY.md §7 step 7): the reference reloads BOTH NGP
NeRFs from disk inside the loss on EVERY iteration
(confidence_loss.py:73) — the dominant cost of its trainer. Here the
visibility labels come from `grid_visibility` — a nearest-voxel gather into
the voxel_mask artifacts that are already the model's inputs — so the
ENTIRE train step (forward, 4 losses, AdamW update) is one jitted program
with no host round-trips. Exact marched visibility stays available
(losses/visibility.exact_visibility) for parity checks.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dregnerf_tpu.geometry import se3
from dregnerf_tpu.losses import registration as L
from dregnerf_tpu.losses.visibility import grid_visibility
from dregnerf_tpu.models.regtr import NeRFRegTr
from dregnerf_tpu.runtime.checkpoint import CheckpointManager

LOSS_WEIGHTS = {"overlap": 1.0, "nerf_cont": 1.0, "feature": 0.1, "corr": 1.0}


def make_reg_model(config, dtype=jnp.float32) -> NeRFRegTr:
    return NeRFRegTr(
        pos_emb_type=config.position_embedding_type,
        d_model=config.position_embedding_dim,
        pos_emb_scaling=config.position_embedding_scaling,
        num_downsample=config.num_downsample,
        dtype=dtype,
    )


def compute_losses(
    model: NeRFRegTr,
    params: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    aabb: jnp.ndarray,
    grid_resolution: int,
    robust: bool = True,
    visibility_fns: tuple | None = None,
    warped_visibility_fns: tuple | None = None,
):
    """All 4 registration losses; returns (total, dict, pred).

    visibility_fns: optional (src_vis, tgt_vis) callables points->[...]
    labels. Default is the fast voxel-mask lookup; pass
    `make_exact_visibility_fns(...)` output for the reference-exact marched
    supervision.

    warped_visibility_fns: optional separate (src, tgt) label fns for the
    per-layer WARPED keypoints (the nerf-consistency term's tilde labels).
    That term carries no gradient — both sides are binarized (>= 0.5 has
    zero derivative; the reference binarizes identically,
    confidence_loss.py:155) — so exact-mode training labels the warped
    points with the free voxel-mask lookup by default and reserves marched
    labels for the gradient-carrying gt targets; pass the exact fns here
    to restore full reference logging parity (--vis_exact_warped).
    """
    pred = model.apply({"params": params["model"]}, batch)
    pose_gt = batch["pose"][:3, :4]  # [3, 4]
    pose_gt_inv = se3.se3_inv(pose_gt)

    src_kp, tgt_kp = pred["src_kp"], pred["tgt_kp"]  # [N, 3]
    src_valid = pred["src_valid"]
    tgt_valid = pred["tgt_valid"]
    n_layers = pred["src_kp_warped"].shape[0]

    if visibility_fns is not None:
        src_vis, tgt_vis = visibility_fns
    else:
        src_vis = lambda pts: grid_visibility(
            pts, batch["src_mask"], aabb, grid_resolution
        )
        tgt_vis = lambda pts: grid_visibility(
            pts, batch["tgt_mask"], aabb, grid_resolution
        )
    # GT overlap labels: keypoints against their own NeRF's visibility field.
    # Labels are binarized in the reference (confidence_loss.py:155) hence
    # carry no gradient; stop_gradient prunes the marched backward graph.
    if warped_visibility_fns is not None:
        # split label sources: gt from `visibility_fns` (e.g. exact
        # marching), tilde from the cheap warped fns (see docstring)
        src_wvis, tgt_wvis = warped_visibility_fns
        src_gt = jax.lax.stop_gradient(src_vis(src_kp))
        tgt_gt = jax.lax.stop_gradient(tgt_vis(tgt_kp))
        src_tilde = jax.lax.stop_gradient(src_wvis(pred["src_kp_warped"]))
        tgt_tilde = jax.lax.stop_gradient(tgt_wvis(pred["tgt_kp_warped"]))
    else:
        # one batched vis call per side ([1+L, N, 3])
        src_labels = jax.lax.stop_gradient(
            src_vis(jnp.concatenate([src_kp[None], pred["src_kp_warped"]], axis=0))
        )  # [1+L, N]
        tgt_labels = jax.lax.stop_gradient(
            tgt_vis(jnp.concatenate([tgt_kp[None], pred["tgt_kp_warped"]], axis=0))
        )
        src_gt, src_tilde = src_labels[0], src_labels[1:]
        tgt_gt, tgt_tilde = tgt_labels[0], tgt_labels[1:]

    losses = {}
    # --- overlap (last layer) ---
    pred_overlap = jnp.concatenate([pred["src_overlap"][-1], pred["tgt_overlap"][-1]])
    gt_overlap = jnp.concatenate([src_gt, tgt_gt])
    both_valid = jnp.concatenate([src_valid, tgt_valid])
    losses["overlap"] = L.overlap_bce(pred_overlap, gt_overlap, both_valid)

    # --- nerf consistency (all layers; warped kps vs the SAME side's field,
    #     reference train_nerf_regtr.py:198-201) ---
    losses["nerf_cont"] = 0.5 * (
        L.nerf_consistency(src_tilde, jnp.broadcast_to(src_gt, (n_layers, src_gt.shape[0])), src_valid)
        + L.nerf_consistency(tgt_tilde, jnp.broadcast_to(tgt_gt, (n_layers, tgt_gt.shape[0])), tgt_valid)
    )

    # --- feature InfoNCE (last layer feats; src xyz GT-transformed) ---
    # Scale-aware positive/ignore radii: the reference's fixed r_p=0.2
    # (feature_loss.py:14) assumes token spacing well under 0.2; the
    # hierarchical subsample stops at a data-dependent cell size, and at
    # coarse levels no anchor finds a cross-cloud token within 0.2 — the
    # loss was measured DEAD across two fleets (VERDICT r4 Weak #2). Widen
    # r_p to 1.25x the stop-level cell (never below the reference 0.2) so
    # "positive" tracks the actual quantization, and log the match count.
    cell = jnp.float32(model.init_subsample_cell) * (
        2.0 ** pred["ds_level"].astype(jnp.float32))
    r_p = jnp.maximum(jnp.float32(0.2), 1.25 * cell)
    losses["feature"], n_match = L.infonce_loss(
        params["infonce_W"],
        pred["src_feats"][-1, 0].astype(jnp.float32),
        pred["tgt_feats"][-1, 0].astype(jnp.float32),
        se3.se3_transform(pose_gt, src_kp),
        tgt_kp,
        src_valid,
        tgt_valid,
        r_p=r_p,
        r_n=2.0 * r_p,
        return_stats=True,
    )
    losses["feature_matches"] = n_match.astype(jnp.float32)

    # --- correspondence (last layer, both directions, GT-overlap weighted) ---
    src_warped_gt = se3.se3_transform(pose_gt, src_kp)
    tgt_warped_gt = se3.se3_transform(pose_gt_inv, tgt_kp)
    losses["corr"] = L.correspondence_loss(
        pred["src_kp_warped"][-1], src_warped_gt, src_gt, src_valid, robust
    ) + L.correspondence_loss(
        pred["tgt_kp_warped"][-1], tgt_warped_gt, tgt_gt, tgt_valid, robust
    )

    # iterate LOSS_WEIGHTS (not losses): the dict also carries pure
    # diagnostics (feature_matches) that must not enter the objective
    total = sum(losses[k] * LOSS_WEIGHTS[k] for k in LOSS_WEIGHTS)
    return total, losses, pred


def make_exact_visibility_fns(
    src_ckpt: str,
    tgt_ckpt: str,
    max_cameras: int = 128,
    buffer_size: int = 1 << 16,
):
    """Reference-exact visibility supervision (confidence_loss.py:56-160):
    march camera->point rays against the actual NeRF checkpoints.

    Unlike the reference (which RELOADS both NeRFs from disk every
    iteration), the checkpoints are loaded ONCE. The returned closures are
    convenience wrappers for eval/analysis; TRAINING threads the contexts
    through the jitted step's arguments instead (RegTrainer
    `--visibility exact`) so full-size tables never become jit constants.
    """
    from dregnerf_tpu.losses.visibility import (
        exact_visibility_ctx,
        load_visibility_context,
    )

    def load(path):
        ctx, model_cfg, rcfg = load_visibility_context(path, max_cameras)

        def vis(points):
            return exact_visibility_ctx(
                ctx, model_cfg, rcfg, points, buffer_size=buffer_size
            )

        return vis

    return load(src_ckpt), load(tgt_ckpt)


class RegTrainer:
    def __init__(self, config, train_dataset, val_dataset, output_dir: Optional[str] = None):
        self.config = config
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.output_dir = output_dir or os.path.join(config.out_dir, config.expname)
        os.makedirs(self.output_dir, exist_ok=True)
        self.ckpt_manager = CheckpointManager(os.path.join(self.output_dir, "model"))
        self.aabb = jnp.asarray(config.aabb, jnp.float32)

        self.model = make_reg_model(config, jnp.bfloat16 if config.bf16 else jnp.float32)
        key = jax.random.PRNGKey(config.seed)
        sample = self._to_device(train_dataset[0])
        self.grid_resolution = int(sample["src_grid"].shape[0])
        model_params = self.model.init(key, sample)["params"]
        self.params = {
            "model": model_params,
            "infonce_W": L.init_infonce_W(jax.random.fold_in(key, 1),
                                          config.position_embedding_dim),
        }
        self.setup_optimizer()
        self.iteration = 0
        # optional (iteration, val_score) callback after each validation —
        # fleet experiments use it to commit metric JSONs mid-stage-3
        # (ADVICE r3: a VM restart must not lose the longest stage)
        self.on_validate = None
        from dregnerf_tpu.runtime.logging import ScalarLogger

        self._log_file = open(os.path.join(self.output_dir, "log.txt"), "a")
        self.logger = ScalarLogger(
            os.path.join(config.out_dir, "logs", config.expname),
            enable_tensorboard=getattr(config, "enable_tensorboard", False),
        )
        self.pose_viz = None
        if getattr(config, "enable_visdom", False):
            # visdom replacement: hermetic live viewer (utils/pose_server.py;
            # reference wires visdom here, conerf/base/trainer.py:137-156)
            from dregnerf_tpu.utils.pose_server import PoseVizServer

            self.pose_viz = PoseVizServer(
                port=int(getattr(config, "visdom_port", 8097) or 8097))
            print(
                f"[reg_trainer] live pose viewer at "
                f"http://127.0.0.1:{self.pose_viz.port}/",
                flush=True,
            )
        self.visibility = getattr(config, "visibility", "grid") or "grid"
        if self.visibility == "exact" and int(getattr(config, "reg_batch_size", 1)) > 1:
            raise ValueError(
                "--visibility exact supports reg_batch_size=1 (the reference "
                "trains at batch 1; exact labels march Nc rays per keypoint)"
            )
        from dregnerf_tpu.parallel.mesh import make_mesh_from_config

        self.mesh = make_mesh_from_config(config)  # --mesh_shape: DP over pairs
        if self.mesh is not None:
            if self.visibility == "exact":
                raise ValueError(
                    "--mesh_shape with --visibility exact is not supported yet"
                )
            if int(getattr(config, "reg_batch_size", 1)) > 1:
                raise ValueError(
                    "--mesh_shape shards one pair per device; leave "
                    "--reg_batch_size at 1 (pairs per step = mesh size)"
                )
        from collections import OrderedDict

        self._vis_cache: "OrderedDict[str, Any]" = OrderedDict()
        self._vis_cache_size = int(getattr(config, "vis_cache_size", 8))
        self._vis_static = None  # (model_cfg, rcfg) from the first checkpoint
        self._exact_step_fn = None  # built lazily once _vis_static is known
        # Device-resident voxel-grid cache + in-jit augmentation (pairs
        # with NeRFRegDataset.get_raw/device_augment): the host path
        # re-uploads ~117 MB of grids per iteration; this moves only the
        # pose and two 4x4 matrices once a block is cached on the chip.
        self._dev_cache: "OrderedDict[str, Any]" = OrderedDict()
        self._dev_cache_size = int(getattr(config, "reg_device_cache", 32))
        self._dev_uploads = 0
        self._dev_evictions = 0
        self._aug_key = jax.random.PRNGKey(config.seed + 77)
        self._aug_step_fn = None  # built lazily
        self._step_fn = self._make_step_fn()
        self._eval_fn = self._make_eval_fn()

    def setup_optimizer(self) -> None:
        schedule = optax.piecewise_constant_schedule(
            self.config.lr, {34000 * (i + 1): 0.5 for i in range(4)}
        )
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(0.1),
            optax.adamw(schedule, weight_decay=1e-4),
        )
        self.opt_state = self.optimizer.init(self.params)

    @staticmethod
    def _to_device(item: Dict) -> Dict[str, jnp.ndarray]:
        return {
            "src_grid": jnp.asarray(item["src_grid"]),
            "tgt_grid": jnp.asarray(item["tgt_grid"]),
            "src_mask": jnp.asarray(item["src_mask"]),
            "tgt_mask": jnp.asarray(item["tgt_mask"]),
            "pose": jnp.asarray(item["pose"]),
        }

    def _make_step_fn(self):
        if getattr(self, "mesh", None) is not None:
            # DP over pairs: one pair per device, pmean'd grads over ICI
            from dregnerf_tpu.parallel.regtr_dp import make_dp_reg_step

            return make_dp_reg_step(
                self.mesh, self.model, self.optimizer, self.aabb,
                self.grid_resolution, self.config.robust_loss,
            )
        model = self.model
        aabb = self.aabb
        res = self.grid_resolution
        robust = self.config.robust_loss
        optimizer = self.optimizer
        batch_size = max(int(getattr(self.config, "reg_batch_size", 1)), 1)

        def step(params, opt_state, batch):
            def loss_fn(p):
                if batch_size == 1:
                    total, losses, pred = compute_losses(
                        model, p, batch, aabb, res, robust
                    )
                    return total, (losses, pred["pose"][-1])
                # vmapped multi-pair step: batch arrays carry a leading
                # pair axis; losses averaged (MXU-filling conv batches —
                # the reference trains at batch 1)
                def one(pair):
                    total, losses, pred = compute_losses(
                        model, p, pair, aabb, res, robust
                    )
                    return total, losses, pred["pose"][-1]

                totals, losses, poses = jax.vmap(one)(batch)
                return jnp.mean(totals), (
                    jax.tree_util.tree_map(jnp.mean, losses), poses[0]
                )

            (total, (losses, pose_pred)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            # Nonfinite-step guard: one degenerate draw must not poison the
            # run (stage-3 round-4 fleet NaN'd at ~iter 6700 from a single
            # bad gradient). If any grad or the loss is nonfinite, keep
            # params/opt_state unchanged and flag it in the metrics.
            leaves = jax.tree_util.tree_leaves(grads)
            finite = jnp.isfinite(total)
            for g in leaves:
                finite = finite & jnp.all(jnp.isfinite(g))
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
            )
            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old), new_params, params
            )
            opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old),
                new_opt_state, opt_state,
            )
            gt = batch["pose"][:3, :4] if batch_size == 1 else batch["pose"][0, :3, :4]
            rre, rte = se3.pose_error(pose_pred, gt)
            metrics = {**losses, "total": total, "R_error": rre,
                       "t_error": rte,
                       "skipped_nonfinite": (~finite).astype(jnp.float32)}
            return params, opt_state, metrics

        self._reg_step_impl = step  # reused by the augmented-step variant
        return jax.jit(step)

    def _make_aug_step_fn(self):
        """Train step over device-cached grids: in-jit augmentation
        (jitter + per-side rigid transform from `get_raw`) then the same
        loss/update body as `_step_fn`."""
        from dregnerf_tpu.datasets.register_pairs import device_augment

        impl = self._reg_step_impl
        clip = float(getattr(self.train_dataset, "jitter_clip", 0.05))

        @jax.jit
        def aug_step(params, opt_state, batch, p_src, p_tgt, jitter_scale,
                     key):
            ks, kt = jax.random.split(key)
            b = dict(batch)
            b["src_grid"] = device_augment(
                b["src_grid"], b["src_mask"], p_src, ks, jitter_scale, clip)
            b["tgt_grid"] = device_augment(
                b["tgt_grid"], b["tgt_mask"], p_tgt, kt, jitter_scale, clip)
            return impl(params, opt_state, b)

        return aug_step

    def _to_device_cached(self, item: Dict) -> Dict[str, jnp.ndarray]:
        """Batch for a `get_raw` item; grids/masks LRU-cached on device.

        The cache must be sized to hold EVERY block of the run: each
        host->device upload through the axon tunnel permanently retains
        the transfer buffer host-side (probe_upload_leak.py — 56 MB
        retained per 56 MB grid upload, immune to gc/malloc_trim), so an
        evicted block re-uploaded later leaks ~61 MB of host RSS every
        time. The round-4 stage-3b fleet (40 blocks > 32 slots → ~1
        eviction/iter) was OOM-killed at 130 GB RSS exactly this way."""
        def dev(ckey, grid, mask):
            hit = self._dev_cache.pop(ckey, None)
            if hit is None:
                hit = (jnp.asarray(grid), jnp.asarray(mask))
                self._dev_uploads += 1
            self._dev_cache[ckey] = hit
            while len(self._dev_cache) > max(self._dev_cache_size, 1):
                self._dev_cache.popitem(last=False)
                self._dev_evictions += 1
                if self._dev_evictions == 1:
                    print(
                        "[reg_trainer] WARNING: device grid cache evicting "
                        f"(size {self._dev_cache_size}); every re-upload "
                        "leaks ~61 MB host RSS through the axon tunnel — "
                        "raise --reg_device_cache to cover all blocks",
                        flush=True,
                    )
            return hit

        sg, sm = dev(item["src_cache_key"], item["src_grid"], item["src_mask"])
        tg, tm = dev(item["tgt_cache_key"], item["tgt_grid"], item["tgt_mask"])
        return {
            "src_grid": sg, "src_mask": sm, "tgt_grid": tg, "tgt_mask": tm,
            "pose": jnp.asarray(item["pose"]),
        }

    def _get_vis_ctx(self, path: str):
        """LRU-cached (device-resident) VisibilityContext for one checkpoint.

        First load fixes the static (model_cfg, rcfg) pair used by the
        compiled exact step; later checkpoints must match or the step would
        silently recompile per pair.
        """
        from dregnerf_tpu.losses.visibility import load_visibility_context

        if path in self._vis_cache:
            self._vis_cache.move_to_end(path)
            return self._vis_cache[path]
        ctx, model_cfg, rcfg = load_visibility_context(
            path, max_cameras=int(getattr(self.config, "vis_max_cameras", 128))
        )
        if self._vis_static is None:
            self._vis_static = (model_cfg, rcfg)
        elif self._vis_static != (model_cfg, rcfg):
            raise ValueError(
                f"NeRF checkpoint {path} has configs {(model_cfg, rcfg)} != "
                f"fleet configs {self._vis_static}; exact visibility needs a "
                "config-homogeneous NeRF fleet (one compiled step)"
            )
        self._vis_cache[path] = ctx
        while len(self._vis_cache) > self._vis_cache_size:
            self._vis_cache.popitem(last=False)
        return ctx

    def _make_exact_step_fn(self):
        """Train step with exact (marched) visibility supervision.

        The two VisibilityContext pytrees are step ARGUMENTS — full-size NGP
        tables never embed as jit constants (reference semantics:
        conerf/loss/confidence_loss.py:56-160, called per iteration at
        train_nerf_regtr.py:191-199)."""
        from dregnerf_tpu.losses.visibility import exact_visibility_ctx

        model = self.model
        aabb = self.aabb
        res = self.grid_resolution
        robust = self.config.robust_loss
        optimizer = self.optimizer
        model_cfg, rcfg = self._vis_static
        buffer_size = int(getattr(self.config, "vis_buffer_size", 1 << 16))
        exact_warped = bool(getattr(self.config, "vis_exact_warped", False))

        @jax.jit
        def step(params, opt_state, batch, src_ctx, tgt_ctx):
            def loss_fn(p):
                vis_fns = (
                    lambda pts: exact_visibility_ctx(
                        src_ctx, model_cfg, rcfg, pts, buffer_size=buffer_size
                    ),
                    lambda pts: exact_visibility_ctx(
                        tgt_ctx, model_cfg, rcfg, pts, buffer_size=buffer_size
                    ),
                )
                if exact_warped:
                    warped_fns = None  # one batched exact call (full parity)
                else:
                    # warped (tilde) labels from the free voxel-mask lookup:
                    # the nerf-consistency term is gradient-free either way
                    # (binarized labels) and the warped points are L/(1+L) of
                    # the marched rays — ~6/7 of exact-mode cost for zero
                    # training effect
                    from dregnerf_tpu.losses.visibility import grid_visibility

                    warped_fns = (
                        lambda pts: grid_visibility(
                            pts, batch["src_mask"], aabb, res
                        ),
                        lambda pts: grid_visibility(
                            pts, batch["tgt_mask"], aabb, res
                        ),
                    )
                total, losses, pred = compute_losses(
                    model, p, batch, aabb, res, robust,
                    visibility_fns=vis_fns,
                    warped_visibility_fns=warped_fns,
                )
                return total, (losses, pred["pose"][-1])

            (total, (losses, pose_pred)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            rre, rte = se3.pose_error(pose_pred, batch["pose"][:3, :4])
            metrics = {**losses, "total": total, "R_error": rre, "t_error": rte}
            return params, opt_state, metrics

        return step

    def train_iteration_batch(self, items) -> Dict[str, float]:
        """Multi-pair step: stack host items along a leading pair axis
        (vmapped when single-device, device-sharded when --mesh_shape)."""
        if getattr(self, "mesh", None) is not None:
            from dregnerf_tpu.parallel.regtr_dp import shard_pair_batch

            batch = shard_pair_batch(self.mesh, items)
        else:
            batch = {
                k: jnp.stack([jnp.asarray(it[k]) for it in items])
                for k in ("src_grid", "tgt_grid", "src_mask", "tgt_mask", "pose")
            }
        self.params, self.opt_state, metrics = self._step_fn(
            self.params, self.opt_state, batch
        )
        return metrics

    def _make_eval_fn(self):
        model = self.model

        @jax.jit
        def ev(params, batch):
            pred = model.apply({"params": params["model"]}, batch)
            pose = pred["pose"][-1]
            rre, rte = se3.pose_error(pose, batch["pose"][:3, :4])
            return pose, rre, rte

        return ev

    def train_iteration(self, item: Dict) -> Dict[str, float]:
        if "aug" in item:  # device-cached path (get_raw items)
            batch = self._to_device_cached(item)
            if self._aug_step_fn is None:
                self._aug_step_fn = self._make_aug_step_fn()
            aug = item["aug"]
            js = (float(getattr(self.train_dataset, "jitter_scale", 0.005))
                  if aug.get("jitter", True) else 0.0)
            self.params, self.opt_state, metrics = self._aug_step_fn(
                self.params, self.opt_state, batch,
                jnp.asarray(aug["p_src"]), jnp.asarray(aug["p_tgt"]),
                jnp.float32(js),
                jax.random.fold_in(self._aug_key, self.iteration),
            )
            return metrics
        batch = self._to_device(item)
        if getattr(self, "visibility", "grid") == "exact":
            src_ctx = self._get_vis_ctx(item["src_nerf_path"])
            tgt_ctx = self._get_vis_ctx(item["tgt_nerf_path"])
            if self._exact_step_fn is None:
                self._exact_step_fn = self._make_exact_step_fn()
            self.params, self.opt_state, metrics = self._exact_step_fn(
                self.params, self.opt_state, batch, src_ctx, tgt_ctx
            )
            return metrics
        self.params, self.opt_state, metrics = self._step_fn(
            self.params, self.opt_state, batch
        )
        return metrics

    def train(self) -> None:
        cfg = self.config
        max_iterations = cfg.epochs * max(len(self.train_dataset), 1)
        self.load_checkpoint()
        rng = np.random.default_rng(cfg.seed)
        t0 = time.time()
        score: Optional[float] = None  # no validation yet -> never "best"
        from dregnerf_tpu.runtime.resilience import Watchdog, run_with_retries

        bsz = max(int(getattr(cfg, "reg_batch_size", 1)), 1)
        if getattr(self, "mesh", None) is not None:
            bsz = int(self.mesh.shape["data"])  # one pair per device
        if bsz > 1:
            n_pairs = len(self.train_dataset)
            if n_pairs < bsz:
                raise ValueError(
                    f"batched RegTr training needs >= {bsz} train pairs "
                    f"(batch/mesh size), got {n_pairs}; shrink --mesh_shape/"
                    f"--reg_batch_size or add scenes"
                )
            dropped = n_pairs % bsz
            if dropped:
                print(
                    f"[reg_trainer] dropping {dropped}/{n_pairs} remainder "
                    f"pairs per epoch (batch size {bsz})", flush=True,
                )
        use_raw = (
            bsz == 1
            and getattr(self, "visibility", "grid") != "exact"
            and getattr(self, "mesh", None) is None
            and self._dev_cache_size > 0
            and hasattr(self.train_dataset, "get_raw")
        )
        fetch = (self.train_dataset.get_raw if use_raw
                 else self.train_dataset.__getitem__)
        if use_raw:
            print("[reg_trainer] device-resident grid cache on "
                  f"(<= {self._dev_cache_size} blocks, in-jit augmentation)",
                  flush=True)
        # Hang watchdog: same failure mode + recovery as NGPTrainer.train
        # (futex wedge through the tunnel -> hard exit -> supervisor
        # restart -> resume from latest checkpoint).
        # Optional wall-clock cutoff (epoch seconds): a fleet running
        # against a fixed round end stops training early so the held-out
        # eval still gets its window (a trained-but-unevaluated model is
        # worth nothing to the round). model_best selection makes the
        # truncation safe: the eval uses the best validated iterate.
        deadline = getattr(self, "train_deadline", None)
        with Watchdog(getattr(cfg, "watchdog_s", 1200),
                      name=cfg.expname) as wd:
            while self.iteration < max_iterations:
                if deadline is not None and time.time() >= deadline:
                    print(
                        f"[reg_trainer] train deadline reached at iteration "
                        f"{self.iteration}/{max_iterations} — stopping early",
                        flush=True,
                    )
                    break
                order = rng.permutation(len(self.train_dataset))
                if bsz > 1:
                    order = order[: len(order) - len(order) % bsz].reshape(-1, bsz)
                for i in order:
                    if bsz > 1:
                        metrics = run_with_retries(
                            lambda i=i: self.train_iteration_batch(
                                [self.train_dataset[int(j)] for j in i]
                            ),
                            on_failure=lambda exc: self.save_checkpoint(),
                        )
                    else:
                        metrics = run_with_retries(
                            lambda i=i: self.train_iteration(fetch(int(i))),
                            on_failure=lambda exc: self.save_checkpoint(),
                        )
                    self.iteration += 1
                    if self.iteration % cfg.n_tensorboard == 0:
                        self.log_scalars(metrics, time.time() - t0)
                    if self.iteration % cfg.n_validation == 0:
                        score = self.validate()
                        if self.on_validate is not None:
                            try:  # experiment bookkeeping must not kill training
                                self.on_validate(self.iteration, score)
                            except Exception as exc:  # noqa: BLE001
                                print(f"[reg_trainer] on_validate failed: {exc}",
                                      flush=True)
                    if self.iteration % cfg.n_checkpoint == 0:
                        self.save_checkpoint(score)
                    if self.iteration >= max_iterations:
                        break
                    if deadline is not None and time.time() >= deadline:
                        break
                    wd.beat()
        self.save_checkpoint(score)

    def validate(self, fraction: float | None = None) -> float:
        """RRE/RTE on a random val subsample (train_nerf_regtr.py:258-291).

        `fraction` defaults to --val_fraction. Small held-out sets should
        use 1.0: the returned -mean(RRE) drives model_best selection, and
        a 1-pair subsample makes "best" a draw of luck (the round-2
        final-vs-best 6.1-vs-0.03 deg gap was diagnosed exactly there).
        """
        n = len(self.val_dataset)
        if n == 0:
            return 0.0
        if fraction is None:
            fraction = float(getattr(self.config, "val_fraction", 0.2))
        rng = np.random.default_rng(self.iteration)
        ids = rng.choice(n, max(1, int(n * fraction)), replace=False)
        rres, rtes = [], []
        viz_pair = None
        # Evaluate BOTH block orders per scene when the dataset supports
        # deterministic ordering (VERDICT r4 Weak #6: best-ckpt selection
        # rode a 4-pair mean whose per-iter noise spanned 12-77 deg;
        # both-order doubling is free de-noising and matches the held-out
        # eval's deterministic draws).
        both = hasattr(self.val_dataset, "meta")
        orders = [(0, 1), (1, 0)] if both else [None]
        n_pairs = 0
        for i in ids:
            for order in orders:
                if order is not None:
                    self.val_dataset.fixed_order = order
                item = self.val_dataset[int(i)]
                # eval items carry cache keys (grids unaugmented): route
                # through the device cache — repeated val uploads leak
                # host RSS through the axon tunnel (see _to_device_cached)
                if "src_cache_key" in item and self._dev_cache_size > 0:
                    batch = self._to_device_cached(item)
                else:
                    batch = self._to_device(item)
                pose, rre, rte = self._eval_fn(self.params, batch)
                if viz_pair is None:
                    viz_pair = (batch, pose)
                rres.append(float(rre))
                rtes.append(float(rte))
                n_pairs += 1
            if both:
                self.val_dataset.fixed_order = None
        if getattr(self, "pose_viz", None) is not None and viz_pair is not None:
            self._push_pose_viz(*viz_pair)
        line = (
            f"[val] iter {self.iteration} RRE {np.mean(rres):.3f} deg "
            f"(med {np.median(rres):.3f}) RTE {np.mean(rtes):.4f} "
            f"(med {np.median(rtes):.4f}) over {n_pairs} pairs"
        )
        print(line, flush=True)
        self._log_file.write(line + "\n")
        self._log_file.flush()
        return -float(np.mean(rres))

    def _push_pose_viz(self, batch: Dict, pose_pred) -> None:
        """Live registration view: tgt cloud (gray), src cloud under the GT
        transform (blue) vs under the prediction (magenta), plus the two
        transforms as frusta with a center-distance segment — the
        DReg-NeRF reading of the reference's visdom camera plot."""
        from dregnerf_tpu.utils.pose_server import (point_trace,
                                                    visualize_cameras)

        a = np.asarray(self.aabb, np.float32).reshape(-1)
        res = self.grid_resolution

        def centers(mask):
            idx = np.argwhere(np.asarray(mask))
            return (idx + 0.5) / res * (a[3:] - a[:3])[None] + a[:3][None]

        def xf(T, pts):
            T = np.asarray(T, np.float32)
            return pts @ T[:3, :3].T + T[:3, 3][None]

        gt = np.asarray(batch["pose"], np.float32)
        pred = np.asarray(pose_pred, np.float32)
        src, tgt = centers(batch["src_mask"]), centers(batch["tgt_mask"])
        traces = [
            point_trace(tgt, "#999999", seed=1),
            point_trace(xf(gt, src), "#4488ff", seed=2),
            point_trace(xf(pred, src), "#ff44cc", seed=2),
        ]
        visualize_cameras(
            self.pose_viz, self.iteration, poses=[gt, pred],
            cam_depth=0.15, colors=("#4488ff", "#ff44cc"),
            extra_traces=traces,
        )

    def log_scalars(self, metrics: Dict, elapsed: float) -> None:
        line = f"iter {self.iteration} | " + " | ".join(
            f"{k} {float(v):.4f}" for k, v in metrics.items()
        ) + f" | {elapsed:.1f}s"
        print(line, flush=True)
        self._log_file.write(line + "\n")
        self._log_file.flush()
        logger = getattr(self, "logger", None)
        if logger is not None and logger.writer is not None:
            for k, v in metrics.items():
                logger.writer.add_scalar(f"train/{k}", float(v), self.iteration)

    def save_checkpoint(self, score: Optional[float] = None) -> None:
        # score=None (e.g. failure-path saves) never touches model_best.ckpt:
        # RegTr scores are -RRE (negative), so a 0.0 default would claim
        # best permanently.
        state = {"params": self.params, "optimizer": self.opt_state}
        meta = {
            "aabb": np.asarray(self.aabb).tolist(),
            "grid_resolution": self.grid_resolution,
            "d_model": self.config.position_embedding_dim,
            "num_downsample": self.config.num_downsample,
        }
        self.ckpt_manager.save(self.iteration, state, meta, score)

    def load_checkpoint(self) -> None:
        templates = {"params": self.params, "optimizer": self.opt_state}
        loaded = self.ckpt_manager.load(templates, path=self.config.ckpt_path)
        if loaded is None:
            return
        state, meta = loaded
        self.params = state["params"]
        if not self.config.no_load_opt:
            self.opt_state = state["optimizer"]
        self.iteration = int(meta["step"])
        print(f"resumed RegTrainer from iteration {self.iteration}", flush=True)
