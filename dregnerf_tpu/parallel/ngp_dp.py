"""Data-parallel NGP training step over a device mesh.

Rays are sharded across the `data` mesh axis with `shard_map`: every device
marches and renders its own ray shard against replicated field params and
occupancy grid (marching/compaction are per-ray local, so no communication
until the gradient `psum`). The Adam update then runs replicated. This is
the TPU-native replacement for what DDP *would* have been in the reference
(SURVEY.md §2.4), with the packed sample buffer split evenly per device so
per-chip compute stays MXU-dense.

Reachable from the trainer: `train_ngp_nerf.py --mesh_shape N` routes
NGPTrainer through this step (runtime/ngp_trainer.py), with the dynamic
ray-batching feedback applied to the GLOBAL ray count.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from dregnerf_tpu.geometry.cameras import rays_from_pixels
from dregnerf_tpu.models import ngp
from dregnerf_tpu.ops.occupancy import OccupancyGrid
from dregnerf_tpu.render.renderer import RenderConfig, render_rays
from dregnerf_tpu.runtime.ngp_trainer import huber
from dregnerf_tpu.utils.metrics import mse_to_psnr


def make_dp_train_step(
    mesh: Mesh,
    optimizer: optax.GradientTransformation,
    model_config: ngp.NGPConfig,
    render_config: RenderConfig,
    aabb: jnp.ndarray,
    image_shape: tuple[int, int],
    synthetic: bool = True,
    opengl: bool = True,
    num_rays_per_device: int = 256,
    field=ngp,
    timestamps: jnp.ndarray | None = None,
):
    """Build a jitted, mesh-sharded train step.

    The returned fn takes (params, opt_state, grid, regions, images, c2ws,
    K, key, step_idx) with rays resampled per device (key folded with the
    step counter and device index ON DEVICE — eager host-side folds cost
    an RPC each through the remote tunnel), and returns (params, opt_state, metrics) — params/opt_state
    replicated, metrics reduced over the mesh. `regions` may be None
    (pack_regions runs in-graph). Metrics match the single-device trainer
    step (loss/psnr/n_samples/alive_rays).
    """
    H, W = image_shape
    n_data = mesh.shape["data"]
    local_rcfg = dataclasses.replace(
        render_config, buffer_size=max(render_config.buffer_size // n_data, 1)
    )

    def step_impl(params, opt_state, grid_tuple, regions, images, c2ws, K,
                  key, step_idx):
        grid = OccupancyGrid(*grid_tuple)
        dev = jax.lax.axis_index("data")
        key = jax.random.fold_in(jax.random.fold_in(key, step_idx), dev)
        kimg, kx, ky, kbg, kmarch = jax.random.split(key, 5)
        n_img = images.shape[0]
        img_id = jax.random.randint(kimg, (num_rays_per_device,), 0, n_img)
        x = jax.random.randint(kx, (num_rays_per_device,), 0, W)
        y = jax.random.randint(ky, (num_rays_per_device,), 0, H)
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
                p, model_config, grid, rays.origins, rays.viewdirs, aabb,
                local_rcfg, background=bg, stratified=True, key=kmarch,
                field=field, times=ray_times, regions=regions,
            )
            alive = (aux["ray_counts"] > 0).astype(jnp.float32)
            n_alive = jnp.maximum(jnp.sum(alive), 1.0)
            err = huber(out.rgb - pixels)
            loss = jnp.sum(err * alive[:, None]) / (n_alive * 3.0)
            sq = jnp.sum((out.rgb - pixels) ** 2 * alive[:, None]) / (n_alive * 3.0)
            return loss, (aux["n_samples"], sq, jnp.sum(alive))

        (loss, (n_samples, sq, n_alive)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        # the only collectives on the hot path: gradient + scalar reduction
        # over ICI
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        sq = jax.lax.pmean(sq, "data")
        n_samples = jax.lax.psum(n_samples, "data")
        n_alive = jax.lax.psum(n_alive, "data")

        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {
            "loss": loss,
            "psnr": mse_to_psnr(sq),
            "n_samples": n_samples,
            "alive_rays": n_alive,
        }
        return params, opt_state, metrics

    specs_no_regions = (P(), P(), P(), P(), P(), P(), P(), P())
    specs_regions = (P(), P(), P(), P(), P(), P(), P(), P(), P())

    step_with_regions = functools.partial(
        shard_map, mesh=mesh, in_specs=specs_regions,
        out_specs=(P(), P(), P()), check_vma=False,
    )(step_impl)
    step_no_regions = functools.partial(
        shard_map, mesh=mesh, in_specs=specs_no_regions,
        out_specs=(P(), P(), P()), check_vma=False,
    )(lambda p, o, g, i, c, k, key, si: step_impl(p, o, g, None, i, c, k,
                                                 key, si))

    @jax.jit
    def wrapped(params, opt_state, grid, regions, images, c2ws, K, key,
                step_idx=np.int32(0)):
        if regions is None:
            return step_no_regions(
                params, opt_state, tuple(grid), images, c2ws, K, key, step_idx
            )
        return step_with_regions(
            params, opt_state, tuple(grid), regions, images, c2ws, K, key,
            step_idx,
        )

    return wrapped
