"""Ray-sharded voxel extraction for multi-chip meshes.

The Nc x Np surface-field pass is the extraction bottleneck (SURVEY.md
§3.2) and the true 'long sequence' of this workload: millions of
camera->voxel rays, each independent. Sharding the ray axis with shard_map
gives perfect scaling — marching, field eval, and the per-ray surface
reduction are all shard-local; there are NO collectives (outputs stay
sharded and are consumed per-ray).
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from dregnerf_tpu.models import ngp
from dregnerf_tpu.ops.composite import surface_field_rows
from dregnerf_tpu.ops.occupancy import OccupancyGrid
from dregnerf_tpu.ops.ray_march import march_rays_rows, row_sample_positions
from dregnerf_tpu.render.renderer import RenderConfig


def make_sharded_surface_fn(
    mesh: Mesh,
    model_cfg: ngp.NGPConfig,
    aabb: jnp.ndarray,
    rcfg: RenderConfig,
    buffer_per_device: int = 1 << 16,
    field=ngp,
    samples_per_ray: int = 64,
):
    """Jitted (params, grid, origins, viewdirs, t_max) -> per-ray S with the
    ray axis sharded over the mesh's `data` axis. Ray count must divide by
    the axis size (pad on the host).

    As in make_surface_chunk_fn, each ray is capped at `samples_per_ray`
    survivors; size per-device rays <= buffer_per_device // samples_per_ray
    so dense scenes cannot overflow the packed buffer."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P("data")),
        out_specs=P("data"),
    )
    def fn(params, grid_tuple, origins, viewdirs, t_max):
        # row layout, same as the single-chip path (sample_grid.py):
        # first-K-survivors content, axis-1 surface reduction
        grid = OccupancyGrid(*grid_tuple)
        rows = march_rays_rows(
            origins, viewdirs, grid, aabb, rcfg.contraction,
            rcfg.render_step_size, samples_per_ray, rcfg.max_steps,
            rcfg.near_plane, rcfg.far_plane, t_max=t_max,
        )
        pos, _ = row_sample_positions(rows, origins, viewdirs)
        sigma = field.query_density(
            params, pos.reshape(-1, 3), aabb, model_cfg
        ).reshape(rows.valid.shape)
        sigma = jnp.where(rows.valid, sigma, 0.0)
        return surface_field_rows(rows, sigma)

    @jax.jit
    def wrapped(params, grid, origins, viewdirs, t_max):
        return fn(params, tuple(grid), origins, viewdirs, t_max)

    return wrapped
