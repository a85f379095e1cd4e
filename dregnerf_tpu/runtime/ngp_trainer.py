"""NGP per-block training runtime.

Capability parity with the reference `NGPTrainer` (train_ngp_nerf.py:26-403):
occupancy-grid EMA update every 16 steps, dynamic ray batching that holds
the per-step sample count near a fixed budget, smooth-L1 loss over alive
rays, Adam(lr 1e-2, eps 1e-15) with the x0.33 MultiStep schedule at
{1/2, 3/4, 9/10} of training, periodic validation renders + checkpoints.

TPU-first redesign:
  * The whole train step — ray sampling from the device-resident uint8
    image stack, background compositing, marching, field eval, composite,
    loss, Adam update — is ONE jitted function; the only host<->device
    traffic per step is the n_samples scalar (same feedback the reference
    reads, train_ngp_nerf.py:313) and logged scalars.
  * Dynamic ray batching quantizes to power-of-two buckets so XLA compiles
    a handful of programs instead of one per ray-count; compiled programs
    are cached (persistent compilation cache enabled by the CLI).
  * No AMP grad scaler: bf16 matmuls with f32 accumulation/params need none.
  * Occupancy updates evaluate density at cell centers in fixed-size
    lax.map chunks — dense MXU batches, two compiled variants
    (warmup = all cells, steady = uniform+occupied sample).
"""
from __future__ import annotations

import dataclasses
import functools
import math
import os
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dregnerf_tpu.datasets.base import SceneData
from dregnerf_tpu.geometry.cameras import rays_from_pixels
from dregnerf_tpu.models import ngp
from dregnerf_tpu.ops import occupancy
from dregnerf_tpu.parallel.mesh import make_mesh_from_config
from dregnerf_tpu.ops.contraction import contract_inv
from dregnerf_tpu.render.renderer import RenderConfig, render_rays, render_image_chunked
from dregnerf_tpu.runtime.checkpoint import CheckpointManager
from dregnerf_tpu.utils.metrics import mse_to_psnr


OCC_UPDATE_INTERVAL = 16
OCC_WARMUP_STEPS = 256
# dynamic ray batching reads n_samples from the device only every this
# many steps: a per-step int() sync would serialize host dispatch against
# the (remote) device and forfeit pipelining — measured 0.68 s/step
# wall-clock for a 0.26 s program (round 3). The feedback only switches
# pow2 buckets, so a few steps of staleness is harmless.
BATCH_SYNC_INTERVAL = 8


@dataclasses.dataclass
class NGPTrainState:
    params: Any
    opt_state: Any
    grid: occupancy.OccupancyGrid
    step: int = 0
    # packed occupancy regions, refreshed only when `grid` changes (every
    # OCC_UPDATE_INTERVAL steps) instead of re-packed inside every render
    regions: Any = None


def huber(x: jnp.ndarray, delta: float = 1.0) -> jnp.ndarray:
    """smooth_l1 (torch F.smooth_l1_loss elementwise)."""
    absx = jnp.abs(x)
    return jnp.where(absx < delta, 0.5 * x * x / delta, absx - 0.5 * delta)


def multistep_lr(base_lr: float, max_steps: int, gamma: float = 0.33):
    bounds = {
        int(max_steps * 0.5): gamma,
        int(max_steps * 0.75): gamma,
        int(max_steps * 0.9): gamma,
    }
    return optax.piecewise_constant_schedule(base_lr, bounds)


def chunked_apply(fn, x: jnp.ndarray, chunk: int):
    """Apply fn over axis 0 in fixed-size chunks via lax.map (one compile)."""
    n = x.shape[0]
    if n <= chunk:
        return fn(x)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    xp = jnp.concatenate([x, jnp.zeros((pad, *x.shape[1:]), x.dtype)])
    out = jax.lax.map(fn, xp.reshape(n_chunks, chunk, *x.shape[1:]))
    return out.reshape(n_chunks * chunk, *out.shape[2:])[:n]


class NGPTrainer:
    """Trains one NeRF block; mirrors reference NGPTrainer template methods."""

    def __init__(
        self,
        config,
        scene: SceneData,
        val_scene: Optional[SceneData] = None,
        output_dir: Optional[str] = None,
    ):
        self.config = config
        self.scene = scene
        self.val_scene = val_scene
        self.output_dir = output_dir or os.path.join(
            config.out_dir, config.expname
        )
        os.makedirs(self.output_dir, exist_ok=True)
        self.ckpt_manager = CheckpointManager(os.path.join(self.output_dir, "model"))

        self.setup_bounding_box()
        self.build_networks()
        self.setup_optimizer()
        self._move_data_to_device()
        self.mesh = make_mesh_from_config(config)  # None unless --mesh_shape
        self._step_fns: dict[int, Any] = {}
        self.num_rays = int(config.init_num_rays)
        self.state = NGPTrainState(
            params=self.params, opt_state=self.opt_state, grid=self.grid
        )
        self.scalars_to_log: dict[str, float] = {}
        from dregnerf_tpu.runtime.logging import ScalarLogger

        self.logger = ScalarLogger(
            os.path.join(config.out_dir, "logs", config.expname),
            text_path=os.path.join(self.output_dir, "log.txt"),
            enable_tensorboard=getattr(config, "enable_tensorboard", False),
        )

    # ------------------------------------------------------------------ setup
    def setup_bounding_box(self) -> None:
        """reference train_ngp_nerf.py:61-93: contraction type + step size."""
        cfg = self.config
        aabb = np.asarray(cfg.aabb, np.float32)
        self.aabb = jnp.asarray(aabb)
        self.contraction = "un_bounded_sphere" if cfg.unbounded else "aabb"
        diag = float(np.linalg.norm(aabb[3:] - aabb[:3]))
        self.render_step_size = diag / cfg.max_march_steps
        self.near_plane = getattr(self.scene, "near", 0.0) or 0.0
        self.far_plane = getattr(self.scene, "far", 1e10) or 1e10

    def build_networks(self) -> None:
        cfg = self.config
        from dregnerf_tpu.models.fields import get_field

        field_name = getattr(cfg, "field", "ngp")
        self.field = get_field(field_name)
        dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32
        if field_name == "ngp":
            from dregnerf_tpu.ops.packed_grid import PackedGridConfig

            # RLE backward (ops/rle.py): needs the normalized march step;
            # only meaningful for the linear aabb contraction where step_u
            # is constant along the ray
            rle_step_u = 0.0
            if getattr(cfg, "rle_backward", False) and not cfg.unbounded:
                aabb = np.asarray(cfg.aabb, np.float32).reshape(-1)
                extent = float(np.min(aabb[3:] - aabb[:3]))
                rle_step_u = self.render_step_size / max(extent, 1e-9)
            self.model_config = ngp.NGPConfig(
                grid=PackedGridConfig(
                    grad_accum=getattr(cfg, "grad_accum", "bf16"),
                    rle_step_u=rle_step_u,
                ),
                unbounded=cfg.unbounded, compute_dtype=dtype,
            )
        else:
            from dregnerf_tpu.models.mlp_nerf import VanillaNeRFConfig

            self.model_config = VanillaNeRFConfig(
                warp=(field_name == "dnerf"), compute_dtype=dtype
            )
        key = jax.random.PRNGKey(cfg.seed)
        self.params = self.field.init(key, self.model_config)
        self.grid = occupancy.init_grid(cfg.grid_resolution)
        self.render_config = RenderConfig(
            contraction=self.contraction,
            render_step_size=self.render_step_size,
            buffer_size=cfg.sample_budget,
            max_steps=cfg.max_march_steps,
            near_plane=self.near_plane,
            far_plane=self.far_plane,
            chunk_size=cfg.test_chunk_size,
            # Training marcher (quality-gated, quality_train_marching.py):
            # "compact" is the reference-exact global budget cut; "capped"
            # packs per-ray-capped lists back-to-back — same sample content
            # until overflow, no global rank search. The row-packed render
            # mode stays OFF for training: K-per-ray truncation at
            # budget/rays measurably hurts from-scratch training (round-2
            # gate: rows val PSNR 11.68 vs 33.29).
            march_compaction=(
                getattr(cfg, "march_compaction", "") or "capped"
            ),
            # capped training uses a 512 per-ray cap: at the default step
            # count a ray fully crossing an object needs up to ~270
            # occupied steps, so the old 256 cap truncated central rays'
            # exit shells (round-3 gate: 32.75 vs 33.29 dB). At 512 the
            # cap never binds in practice and capped == compact sample
            # content exactly (tested), at none of compact's global-rank
            # search cost.
            k_cap=min(512, cfg.max_march_steps),
            image_dispatch=getattr(cfg, "image_dispatch", "") or "scan",
        )

    def setup_optimizer(self) -> None:
        schedule = multistep_lr(1e-2, self.config.max_iterations)
        self.optimizer = optax.adam(schedule, eps=1e-15)
        self.opt_state = self.optimizer.init(self.params)

    def _move_data_to_device(self) -> None:
        self.images = jnp.asarray(self.scene.images)  # uint8, device-resident
        self.c2ws = jnp.asarray(self.scene.camtoworlds)
        self.K = jnp.asarray(self.scene.K)
        ts = getattr(self.scene, "timestamps", None)
        self.timestamps = None if ts is None else jnp.asarray(ts)  # D-NeRF

    # ------------------------------------------------------------- train step
    def _make_step_fn(self, num_rays: int):
        if self.mesh is not None:
            return self._make_dp_step_fn(num_rays)
        cfg = self.config
        model_cfg = self.model_config
        rcfg = self.render_config
        aabb = self.aabb
        H, W = self.scene.height, self.scene.width
        synthetic = self.scene.synthetic
        opengl = self.scene.opengl
        optimizer = self.optimizer
        field = self.field
        timestamps = self.timestamps  # tiny [N_img] array or None (static)

        @jax.jit
        def step_fn(params, opt_state, grid, regions, images, c2ws, K, key,
                    step_idx):
            # fold the step counter INSIDE the program: an eager host-side
            # fold_in is a ~29 ms RPC through the remote tunnel and
            # serializes dispatch (probe: 0.04 ms/call folded inside vs
            # 144 ms with an eager fold) — round 3
            key = jax.random.fold_in(key, step_idx)
            kimg, kx, ky, kbg, kmarch = jax.random.split(key, 5)
            n_img = images.shape[0]
            img_id = jax.random.randint(kimg, (num_rays,), 0, n_img)
            x = jax.random.randint(kx, (num_rays,), 0, W)
            y = jax.random.randint(ky, (num_rays,), 0, H)
            rgba = images[img_id, y, x].astype(jnp.float32) / 255.0
            bg = jax.random.uniform(kbg, (3,))
            if synthetic:
                pixels = rgba[:, :3] * rgba[:, 3:4] + bg * (1.0 - rgba[:, 3:4])
            else:
                pixels = rgba[:, :3]
            rays = rays_from_pixels(x, y, K, c2ws[img_id], opengl)

            def loss_fn(p):
                ray_times = None if timestamps is None else timestamps[img_id]
                out, aux = render_rays(
                    p, model_cfg, grid, rays.origins, rays.viewdirs, aabb, rcfg,
                    background=bg, stratified=True, key=kmarch, field=field,
                    times=ray_times, regions=regions,
                )
                alive = (aux["ray_counts"] > 0).astype(jnp.float32)
                n_alive = jnp.maximum(jnp.sum(alive), 1.0)
                err = huber(out.rgb - pixels)
                loss = jnp.sum(err * alive[:, None]) / (n_alive * 3.0)
                sq = jnp.sum((out.rgb - pixels) ** 2 * alive[:, None]) / (n_alive * 3.0)
                return loss, (aux, sq, jnp.sum(alive))

            (loss, (aux, sq, n_alive)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = {
                "loss": loss,
                "psnr": mse_to_psnr(sq),
                "n_samples": aux["n_samples"],
                "alive_rays": n_alive,
            }
            return params, opt_state, metrics

        return step_fn

    def _make_dp_step_fn(self, num_rays: int):
        """Mesh-sharded step (--mesh_shape): rays split over the data axis,
        gradients psum'd over ICI; dynamic batching feedback stays GLOBAL
        (num_rays is the global ray count)."""
        from dregnerf_tpu.parallel.ngp_dp import make_dp_train_step  # lazy: cycle

        n_data = self.mesh.shape["data"]
        return make_dp_train_step(
            self.mesh,
            self.optimizer,
            self.model_config,
            self.render_config,
            self.aabb,
            (self.scene.height, self.scene.width),
            synthetic=self.scene.synthetic,
            opengl=self.scene.opengl,
            num_rays_per_device=max(num_rays // n_data, 1),
            field=self.field,
            timestamps=self.timestamps,
        )

    @functools.cached_property
    def _pack_regions(self):
        return jax.jit(occupancy.pack_regions)

    @functools.cached_property
    def _occ_update_fns(self):
        cfg = self.config
        model_cfg = self.model_config
        aabb = self.aabb
        contraction = self.contraction
        step_size = self.render_step_size
        field = self.field

        def occ_fn(params, u):
            world = contract_inv(u, aabb, contraction)
            d = field.query_density(params, world, aabb, model_cfg)
            return d.reshape(-1) * step_size

        chunk = 1 << 16

        def make(warmup: bool):
            n_samples = min(cfg.grid_resolution**3 // 4, 1 << 17)

            @jax.jit
            def update(grid, params, key, step_idx):
                # step fold inside the program (see step_fn note)
                key = jax.random.fold_in(jax.random.fold_in(key, step_idx), 1)
                return occupancy.update_grid(
                    grid,
                    key,
                    lambda u: chunked_apply(lambda c: occ_fn(params, c), u, chunk),
                    warmup=warmup,
                    n_samples=n_samples,
                )

            return update

        return {True: make(True), False: make(False)}

    # ------------------------------------------------------------------ train
    def train_iteration(self, step: int, key: jax.Array) -> dict:
        """One training step. `key` is the RUN's base key (constant across
        steps — the step counter is folded in on-device; callers must NOT
        fold per step on the host, which costs an RPC per call)."""
        s = self.state
        step_idx = np.int32(step)
        if step % OCC_UPDATE_INTERVAL == 0:
            warmup = step < OCC_WARMUP_STEPS
            s.grid = self._occ_update_fns[warmup](
                s.grid, s.params, key, step_idx
            )
            s.regions = None  # grid changed; repack below
        if s.regions is None:
            s.regions = self._pack_regions(s.grid.binary)

        bucket = self.num_rays
        if bucket not in self._step_fns:
            self._step_fns[bucket] = self._make_step_fn(bucket)
        s.params, s.opt_state, metrics = self._step_fns[bucket](
            s.params, s.opt_state, s.grid, s.regions, self.images, self.c2ws,
            self.K, key, step_idx,
        )

        # dynamic ray batching: track the sample budget, pow2 buckets.
        # Only materialize a device scalar every BATCH_SYNC_INTERVAL steps,
        # and read the one SAVED AT THE PREVIOUS SYNC (computed ~8 steps
        # ago, so the fetch is a cheap RTT on ready data) instead of the
        # just-dispatched step's — blocking on the current step drains the
        # whole dispatch pipeline (round-4 probe: the blocking variant cost
        # ~50 ms/step amortized; staleness only delays a pow2 bucket
        # switch by one interval, which is harmless).
        if step % BATCH_SYNC_INTERVAL == 0:
            prev = getattr(self, "_pending_n_samples", None)
            self._pending_n_samples = (bucket, metrics["n_samples"])
            prev_bucket, n_samples = (bucket, 0) if prev is None else (
                prev[0], int(prev[1]))
            if n_samples > 0:
                target = self.config.sample_budget
                ideal = prev_bucket * target / max(n_samples, 1)
                new_bucket = 1 << int(round(math.log2(max(ideal, 1))))
                self.num_rays = int(
                    np.clip(
                        new_bucket,
                        self.config.init_num_rays,
                        self.config.max_num_rays,
                    )
                )
        metrics["num_rays"] = bucket
        return metrics

    def train(self) -> None:
        """Direct train_iteration loop under a hang watchdog.

        The axon tunnel has wedged long runs in a futex wait with no
        exception (round 3, ~step 500, twice) — unrecoverable from inside
        the process. The watchdog hard-exits on a stale heartbeat so an
        outer supervisor/restart loop resumes from the latest checkpoint
        (--watchdog_s, 0 disables; supervise.sh is the stock supervisor).
        Parity: reference trainer loop conerf/base/trainer.py:161-246.
        """
        from dregnerf_tpu.runtime.resilience import Watchdog, run_with_retries

        cfg = self.config
        key = jax.random.PRNGKey(cfg.seed)
        start = self.load_checkpoint()
        t0 = time.time()
        with Watchdog(getattr(cfg, "watchdog_s", 1200),
                      name=cfg.expname) as wd:
            for step in range(start, cfg.max_iterations):
                metrics = run_with_retries(
                    lambda: self.train_iteration(step, key),
                    on_failure=lambda exc: self.save_checkpoint(step),
                )
                self.state.step = step + 1
                if step % cfg.n_tensorboard == 0:
                    # float(loss) is also the periodic device sync that
                    # keeps the heartbeat honest: a wedged device blocks
                    # here, the beat goes stale, the watchdog fires.
                    self.log_scalars(step, metrics, time.time() - t0)
                if (step + 1) % cfg.n_validation == 0:
                    self.validate(step + 1)
                if (step + 1) % cfg.n_checkpoint == 0 or step + 1 == cfg.max_iterations:
                    self.save_checkpoint(step + 1)
                wd.beat()

    # ------------------------------------------------------------------ infra
    def log_scalars(self, step: int, metrics: dict, elapsed: float) -> None:
        self.logger.log_scalars(
            step,
            {
                "train/loss": float(metrics["loss"]),
                "train/psnr": float(metrics["psnr"]),
                "train/num_rays": metrics["num_rays"],
                "train/n_samples": int(metrics["n_samples"]),
                "train/alive_ray_mask": int(metrics["alive_rays"]),
                "elapsed_s": elapsed,
            },
        )

    def validate(self, step: int) -> float:
        scene = self.val_scene or self.scene
        idx = 0
        from dregnerf_tpu.geometry.cameras import image_rays

        rays = image_rays(
            jnp.asarray(scene.K), jnp.asarray(scene.camtoworlds[idx]),
            scene.height, scene.width, scene.opengl,
        )
        bg = jnp.ones(3)
        ts = getattr(scene, "timestamps", None)
        # eval rendering: row-packed marching with a generous per-ray K.
        # The TRAINING buffer (= sample budget) is too small for full-image
        # chunks at high step counts — the shared cut silently rendered
        # trailing rays as background (round 3: val PSNR 18 for a model
        # whose train PSNR was 60).
        eval_cfg = dataclasses.replace(
            self.render_config, march_compaction="rows"
        )
        rgb, _, _ = render_image_chunked(
            self.state.params, self.model_config, self.state.grid,
            rays.origins.reshape(-1, 3), rays.viewdirs.reshape(-1, 3),
            self.aabb, eval_cfg, bg, field=self.field,
            eval_buffer_size=self.config.test_chunk_size
            * min(256, self.render_config.max_steps),
            time=None if ts is None else float(ts[idx]),
        )
        rgb = rgb.reshape(scene.height, scene.width, 3)
        gt = np.asarray(scene.images[idx], np.float32) / 255.0
        if scene.synthetic:
            gt = gt[..., :3] * gt[..., 3:4] + np.ones(3) * (1 - gt[..., 3:4])
        val_mse = float(np.mean((np.asarray(rgb) - gt) ** 2))
        val_psnr = -10.0 * math.log10(val_mse)
        self.logger.log_scalars(step, {"val/psnr": val_psnr})
        try:
            import imageio.v2 as imageio

            os.makedirs(os.path.join(self.output_dir, "val"), exist_ok=True)
            imageio.imwrite(
                os.path.join(self.output_dir, "val", f"rgb_{step:06d}.png"),
                (np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8),
            )
        except Exception:
            pass
        return val_psnr

    def compose_meta(self) -> dict:
        """Self-describing render meta (reference train_ngp_nerf.py:192-209)."""
        cfg = self.config
        return {
            "aabb": np.asarray(self.aabb).tolist(),
            "unbounded": bool(cfg.unbounded),
            "grid_resolution": cfg.grid_resolution,
            "contraction_type": self.contraction,
            "near_plane": self.near_plane,
            "far_plane": min(self.far_plane, 1e10),
            "render_step_size": self.render_step_size,
            "alpha_thre": 0.0,
            "cone_angle": cfg.cone_angle,
            "max_march_steps": int(cfg.max_march_steps),
            # adaptive pow2 ray bucket: restored on resume so a
            # watchdog/supervisor restart re-enters the settled bucket
            # instead of re-adapting from init_num_rays (each bucket it
            # climbs through is a fresh compile through the tunnel)
            "num_rays": int(self.num_rays),
            "camera_poses": np.asarray(self.scene.camtoworlds).tolist(),
            "block_id": self.scene.block_id,
            "field": getattr(self.config, "field", "ngp"),
            "model_config": (
                ngp.config_to_meta(self.model_config)
                if getattr(self.config, "field", "ngp") == "ngp"
                else {"warp": getattr(self.model_config, "warp", False),
                      "bf16": bool(self.config.bf16)}
            ),
        }

    def save_checkpoint(self, step: int, score: Optional[float] = None) -> None:
        state = {
            "model": self.state.params,
            "occupancy": {
                "occs": self.state.grid.occs, "binary": self.state.grid.binary
            },
            "optimizer": self.state.opt_state,
        }
        self.ckpt_manager.save(step, state, self.compose_meta(), score)

    def load_checkpoint(self) -> int:
        templates = {
            "model": self.state.params,
            "occupancy": {
                "occs": self.state.grid.occs, "binary": self.state.grid.binary
            },
            "optimizer": self.state.opt_state,
        }
        loaded = self.ckpt_manager.load(templates, path=self.config.ckpt_path)
        if loaded is None:
            return 0
        state, meta = loaded
        self.state.params = state["model"]
        if not self.config.no_load_opt:
            self.state.opt_state = state["optimizer"]
        self.state.grid = occupancy.OccupancyGrid(
            occs=jnp.asarray(state["occupancy"]["occs"]),
            binary=jnp.asarray(state["occupancy"]["binary"]),
        )
        self.num_rays = int(meta.get("num_rays", self.num_rays))
        print(f"resumed from step {meta['step']} "
              f"(ray bucket {self.num_rays})", flush=True)
        return int(meta["step"])


def load_field_from_checkpoint(path: str):
    """Rebuild (params, grid, meta, model_config, render_config) from one
    artifact — the reference `load_radiance_fields` contract
    (confidence_loss.py:16-52)."""
    from dregnerf_tpu.runtime.checkpoint import load_checkpoint as _load

    flat, meta = _load(path)
    field_name = meta.get("field", "ngp")
    key = jax.random.PRNGKey(0)
    if field_name == "ngp":
        mc = dict(meta.get("model_config", {}))
        mc.setdefault("unbounded", bool(meta.get("unbounded", False)))
        model_cfg = ngp.config_from_meta(mc)
        template_params = ngp.init_ngp(key, model_cfg)
    else:
        from dregnerf_tpu.models.fields import get_field
        from dregnerf_tpu.models.mlp_nerf import VanillaNeRFConfig

        mc = meta.get("model_config", {})
        model_cfg = VanillaNeRFConfig(
            warp=bool(mc.get("warp", field_name == "dnerf")),
            compute_dtype=jnp.bfloat16 if mc.get("bf16", True) else jnp.float32,
        )
        template_params = get_field(field_name).init(key, model_cfg)
    from dregnerf_tpu.runtime.checkpoint import _unflatten_into

    params = _unflatten_into(template_params, flat, prefix="model::")
    grid = occupancy.OccupancyGrid(
        occs=jnp.asarray(flat["occupancy::occs"]),
        binary=jnp.asarray(flat["occupancy::binary"]),
    )
    render_cfg = RenderConfig(
        contraction=meta["contraction_type"],
        render_step_size=float(meta["render_step_size"]),
        near_plane=float(meta.get("near_plane", 0.0) or 0.0),
        far_plane=float(meta.get("far_plane", 1e10) or 1e10),
        max_steps=int(meta.get("max_march_steps", 1024)),
    )
    return params, grid, meta, model_cfg, render_cfg
