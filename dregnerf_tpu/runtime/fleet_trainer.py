"""Fleet stage-1 training: all blocks of a scene trained simultaneously.

`train_ngp_nerf.py --multi_blocks --fleet --mesh_shape N` replaces the
reference's sequential per-block loop (train_ngp_nerf.py:406-443) and its
one-process-per-GPU shell fan-out with ONE sharded program: block states
stack along a leading axis sharded over the mesh (parallel/fleet.py), each
device steps its own blocks with zero collectives.

Reuses NGPTrainer per block for setup, meta composition, validation and
checkpointing — only the hot loop is replaced. Dynamic ray batching is
disabled in fleet mode (one compiled program across blocks); choose
--init_num_rays to hold the sample budget.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from dregnerf_tpu.ops.occupancy import OccupancyGrid
from dregnerf_tpu.parallel.fleet import (
    make_fleet_occ_update,
    make_fleet_pack_regions,
    make_fleet_train_step,
    stack_blocks,
    unstack_blocks,
)
from dregnerf_tpu.parallel.mesh import make_mesh, make_mesh_from_config
from dregnerf_tpu.runtime.ngp_trainer import (
    OCC_UPDATE_INTERVAL,
    OCC_WARMUP_STEPS,
    NGPTrainer,
)


class FleetNGPTrainer:
    """Drives B per-block NGPTrainers through one fleet-sharded hot loop."""

    def __init__(self, config, train_scenes, test_scenes, output_dirs):
        self.config = config
        self.trainers = [
            NGPTrainer(config, tr, te, output_dir=d)
            for tr, te, d in zip(train_scenes, test_scenes, output_dirs)
        ]
        t0 = self.trainers[0]
        for t in self.trainers[1:]:
            assert (t.scene.height, t.scene.width) == (
                t0.scene.height, t0.scene.width
            ), "fleet blocks must share image resolution"
        self.mesh = make_mesh_from_config(config) or make_mesh(
            min(len(self.trainers), len(jax.devices()))
        )

    def train(self) -> None:
        cfg = self.config
        trainers = self.trainers
        mesh = self.mesh
        t0 = trainers[0]
        n_blocks = len(trainers)

        # pad image stacks to a common count; per-block n_img bounds sampling
        max_imgs = max(t.images.shape[0] for t in trainers)

        def pad_images(t):
            imgs = np.asarray(t.images)
            c2ws = np.asarray(t.c2ws)
            pad = max_imgs - imgs.shape[0]
            if pad:
                imgs = np.concatenate([imgs, np.repeat(imgs[:1], pad, 0)])
                c2ws = np.concatenate([c2ws, np.repeat(c2ws[:1], pad, 0)])
            return imgs, c2ws

        padded = [pad_images(t) for t in trainers]
        params_B = stack_blocks(mesh, [t.state.params for t in trainers])
        opt_B = stack_blocks(mesh, [t.state.opt_state for t in trainers])
        grid_B = stack_blocks(mesh, [t.state.grid for t in trainers])
        images_B = stack_blocks(mesh, [p[0] for p in padded])
        c2ws_B = stack_blocks(mesh, [p[1] for p in padded])
        K_B = stack_blocks(mesh, [np.asarray(t.K) for t in trainers])
        n_img_B = stack_blocks(
            mesh, [np.int32(t.images.shape[0]) for t in trainers]
        )

        num_rays = int(cfg.init_num_rays)
        with mesh:
            step = make_fleet_train_step(
                mesh, t0.optimizer, t0.model_config, t0.render_config,
                t0.aabb, (t0.scene.height, t0.scene.width), num_rays,
                synthetic=t0.scene.synthetic, opengl=t0.scene.opengl,
            )
            pack_regions_B = make_fleet_pack_regions(mesh)
            occ_updates = make_fleet_occ_update(
                mesh, t0.model_config, t0.aabb, t0.render_step_size,
                t0.contraction,
                n_samples=min(cfg.grid_resolution**3 // 4, 1 << 17),
            )
            key = jax.random.PRNGKey(cfg.seed)
            wall = time.time()
            for it in range(cfg.max_iterations):
                if it % OCC_UPDATE_INTERVAL == 0:
                    grid_B = occ_updates[it < OCC_WARMUP_STEPS](
                        grid_B, params_B, jax.random.fold_in(key, 2 * it + 1)
                    )
                    regions_B = pack_regions_B(grid_B.binary)
                params_B, opt_B, metrics = step(
                    params_B, opt_B, grid_B, regions_B, images_B, c2ws_B,
                    K_B, n_img_B, jax.random.fold_in(key, 2 * it),
                )
                if (it + 1) % cfg.n_tensorboard == 0:
                    loss = np.asarray(metrics["loss"])
                    psnr = np.asarray(metrics["psnr"])
                    print(
                        f"[fleet] step {it + 1}/{cfg.max_iterations} "
                        f"loss {loss.mean():.5f} psnr "
                        + "/".join(f"{p:.1f}" for p in psnr)
                        + f" | {time.time() - wall:.1f}s",
                        flush=True,
                    )

        # unstack final states back into the per-block trainers and let each
        # write its own self-describing checkpoint + validation render
        for t, p, o, g in zip(
            trainers,
            unstack_blocks(params_B, n_blocks),
            unstack_blocks(opt_B, n_blocks),
            unstack_blocks(grid_B, n_blocks),
        ):
            t.state.params = jax.tree_util.tree_map(jnp.asarray, p)
            t.state.opt_state = jax.tree_util.tree_map(jnp.asarray, o)
            t.state.grid = OccupancyGrid(
                occs=jnp.asarray(g.occs), binary=jnp.asarray(g.binary)
            )
            t.save_checkpoint(cfg.max_iterations)
            if t.val_scene is not None and t.val_scene.num_images:
                t.validate(step=cfg.max_iterations)
