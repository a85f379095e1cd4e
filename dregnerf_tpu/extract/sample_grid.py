"""Voxel feature extraction from a trained NeRF (stage 2 of the pipeline).

Capability parity with the reference `SampleGrid`
(conerf/register/sample_grid.py:59-343) + the artifact writer
(eval_ngp_nerf.py:336-412):

  * jitter-sample every occupied voxel of the trained NeRF's occupancy
    grid, map to world via the inverse contraction;
  * density mask: sigma > 0.7;
  * surface mask: for every training camera, march a ray from the camera
    to the point (per-ray t_max) and take S = max_t T*alpha; binarize at
    0.5; OR over cameras. This is the Nc x Np megabatch — the extraction
    hot loop (SURVEY.md §3.2) — evaluated in fixed-size jitted ray chunks;
  * color: mean of query_rgb over 18 fixed view directions (the constants
    reproduce the reference table exactly, including its x==y quirk —
    sample_grid.py:132-145 — since trained RegTr checkpoints depend on the
    resulting color statistics);
  * alpha = clip(1 - exp(-delta * sigma), 0, 1) with delta = 1e-2.

Artifacts written (byte-compatible torch .pt / PLY — §2.2 of SURVEY.md):
  voxel_grid.pt [x,y,z,7], voxel_mask.pt (flat indices), voxel_point_cloud.ply
  + density_voxel_* variants.
"""
from __future__ import annotations

import math
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from dregnerf_tpu.models import ngp
from dregnerf_tpu.ops.contraction import contract_inv
from dregnerf_tpu.ops.occupancy import OccupancyGrid
from dregnerf_tpu.render.renderer import RenderConfig
from dregnerf_tpu.io.ply import write_ply

DELTA = 1e-2  # NeRF-RPN-style alpha step (reference sample_grid.py:112)
DENSITY_THRESHOLD = 0.7
SURFACE_CUTOFF = 0.5


def fixed_viewing_directions() -> np.ndarray:
    """The reference's 18 fixed directions (sample_grid.py:132-145).

    NOTE: the reference computes x and y both as cos(phi)*sin(theta); the
    directions are therefore NOT uniformly spread. Reproduced as-is because
    downstream color statistics (and any ported RegTr weights) depend on it.
    """
    phis = [math.pi / 3, 0.0, -math.pi]
    thetas = [k * math.pi / 3 for k in range(6)]
    dirs = []
    for phi in phis:
        for theta in thetas:
            dirs.append(
                [
                    math.cos(phi) * math.sin(theta),
                    math.cos(phi) * math.sin(theta),
                    math.sin(theta),
                ]
            )
    return np.asarray(dirs, np.float32)


def occupied_voxel_points(
    grid: OccupancyGrid,
    aabb: jnp.ndarray,
    contraction: str,
    key: jax.Array,
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side: (world points [Np, 3], flat indices [Np]) for occupied
    voxels, jittered inside each cell (sample_grid.py:223-243)."""
    binary = np.asarray(grid.binary)
    res = binary.shape[0]
    indices = np.nonzero(binary.reshape(-1))[0]
    ix = indices // (res * res)
    iy = (indices // res) % res
    iz = indices % res
    coords = np.stack([ix, iy, iz], -1).astype(np.float32)
    jitter = np.asarray(jax.random.uniform(key, coords.shape))
    u = (coords + jitter) / res
    if contraction == "un_bounded_sphere":
        mask = np.linalg.norm(u - 0.5, axis=-1) < 0.5
        u, indices = u[mask], indices[mask]
    world = np.asarray(contract_inv(jnp.asarray(u), aabb, contraction))
    return world, indices


def make_surface_chunk_fn(
    params: Any,
    model_cfg: ngp.NGPConfig,
    grid: OccupancyGrid,
    aabb: jnp.ndarray,
    rcfg: RenderConfig,
    chunk: int,
    buffer_size: int,
    samples_per_ray: int = 64,
):
    """Jitted: (origins, viewdirs, t_max)[chunk] -> per-ray surface field S.

    Each ray keeps its first `samples_per_ray` surviving steps (row
    layout, [chunk, samples_per_ray]); `buffer_size` only bounds memory
    via the callers' chunk <= buffer_size // samples_per_ray sizing rule.
    The per-ray cap (not a shared global cut) is what prevents the
    round-3 starvation failure: dense scenes (fully-occupied object
    interiors after converged training: ~265 occupied steps on a
    center-crossing ray) would blow a shared buffer and silently return
    S=0 for trailing rays — round 3 saw 82 of ~10k shell voxels survive
    extraction on a 105k-occupied-cell model.
    """
    from dregnerf_tpu.ops.occupancy import pack_regions

    regions = pack_regions(grid.binary)  # once per fn, not per chunk call
    grid_tuple = tuple(grid)

    # params / grid / regions are jit ARGUMENTS, not closure constants:
    # closed-over arrays are inlined into the HLO and the 2^19-entry
    # tables blow the remote compiler's request-size limit (HTTP 413 —
    # CLAUDE.md; round-3 BENCH captured the failure). Mirrors
    # parallel/extract_sharded.py.
    #
    # Row-packed marching: each ray keeps its FIRST samples_per_ray
    # surviving steps — content-identical to the previous capped flat
    # packing (both select via top_k over -step), but the surface field
    # becomes axis-1 cumsum/max instead of segment ops and the flat
    # pack/scatter stage disappears entirely.
    @jax.jit
    def fn(params, grid_tuple, regions, origins, viewdirs, t_max):
        from dregnerf_tpu.ops.composite import surface_field_rows
        from dregnerf_tpu.ops.ray_march import (
            march_rays_rows, row_sample_positions)

        grid = OccupancyGrid(*grid_tuple)
        rows = march_rays_rows(
            origins, viewdirs, grid, aabb, rcfg.contraction,
            rcfg.render_step_size, samples_per_ray, rcfg.max_steps,
            rcfg.near_plane, rcfg.far_plane, t_max=t_max, regions=regions,
        )
        pos, _ = row_sample_positions(rows, origins, viewdirs)
        sigma = ngp.query_density(
            params, pos.reshape(-1, 3), aabb, model_cfg
        ).reshape(rows.valid.shape)
        sigma = jnp.where(rows.valid, sigma, 0.0)
        return surface_field_rows(rows, sigma)

    def call(origins, viewdirs, t_max):
        return fn(params, grid_tuple, regions, origins, viewdirs, t_max)

    return call


def compute_surface_mask(
    params: Any,
    model_cfg: ngp.NGPConfig,
    grid: OccupancyGrid,
    aabb: jnp.ndarray,
    rcfg: RenderConfig,
    points_world: np.ndarray,
    camera_poses: np.ndarray,
    chunk: int = 8192,
    buffer_size: int = 1 << 17,
    cutoff: float = SURFACE_CUTOFF,
    mesh=None,
    samples_per_ray: int = 64,
    return_scores: bool = False,
) -> np.ndarray:
    """[Np] bool: max over cameras of per-ray S >= cutoff (the Nc x Np pass).

    With `mesh` (from --mesh_shape) the ray axis of each chunk is sharded
    over the mesh's data axis (parallel/extract_sharded.py — zero
    collectives, perfect scaling on the extraction bottleneck).

    chunk is clamped to buffer_size // samples_per_ray and the march caps
    each ray at samples_per_ray survivors, so the packed buffer cannot
    overflow on dense scenes (see make_surface_chunk_fn)."""
    np_pts = points_world.shape[0]
    chunk = max(1, min(chunk, buffer_size // max(samples_per_ray, 1)))
    if mesh is not None:
        from dregnerf_tpu.parallel.extract_sharded import make_sharded_surface_fn

        n_data = int(mesh.shape["data"])
        chunk = -(-chunk // n_data) * n_data  # pad chunk to divide evenly
        sharded = make_sharded_surface_fn(
            mesh, model_cfg, aabb, rcfg,
            buffer_per_device=max(buffer_size // n_data, 1),
            samples_per_ray=samples_per_ray,
        )
        grid_tuple = grid

        def fn(o, d, t):
            return sharded(params, grid_tuple, o, d, t)
    else:
        fn = make_surface_chunk_fn(
            params, model_cfg, grid, aabb, rcfg, chunk, buffer_size,
            samples_per_ray=samples_per_ray,
        )
    surface = np.zeros(np_pts, np.float32)
    # Chunk-outer / camera-inner with DEVICE-side max accumulation: a
    # host sync per (camera, chunk) dispatch serializes against the
    # remote chip (CLAUDE.md per-step-sync finding) — at 100 cameras x
    # ~40 chunks that measured ~6 min/block through the axon tunnel.
    # Accumulating jnp.maximum on device and syncing once per chunk
    # keeps the identical jitted fn (same shapes) and lets dispatch
    # pipeline: one round-trip per chunk instead of per camera.
    origins = [np.asarray(cam)[:3, 3] for cam in camera_poses]
    for i in range(0, np_pts, chunk):
        sl = slice(i, min(i + chunk, np_pts))
        nn = sl.stop - sl.start
        pts = points_world[sl]
        acc = None
        for origin in origins:
            dirs = pts - origin[None]
            t_max = np.linalg.norm(dirs, axis=-1)
            viewdirs = dirs / np.maximum(t_max[:, None], 1e-10)
            o = np.tile(origin[None], (chunk, 1)).astype(np.float32)
            d = np.zeros((chunk, 3), np.float32)
            t = np.zeros(chunk, np.float32)
            d[:nn] = viewdirs
            t[:nn] = t_max
            s = fn(jnp.asarray(o), jnp.asarray(d), jnp.asarray(t))
            acc = s if acc is None else jnp.maximum(acc, s)
        surface[sl] = np.asarray(acc)[:nn]
    if return_scores:
        return surface
    return surface >= cutoff


def query_features(
    params: Any,
    model_cfg: ngp.NGPConfig,
    aabb: jnp.ndarray,
    points_world: np.ndarray,
    chunk: int = 1 << 16,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(rgb mean over 18 fixed dirs, sigma, alpha) for [Np, 3] world points."""
    dirs18 = jnp.asarray(fixed_viewing_directions())

    # params as a jit ARGUMENT (not closure): see make_surface_chunk_fn.
    @jax.jit
    def fn(params, x):
        sigma, feat = ngp.query_density(params, x, aabb, model_cfg, return_feat=True)

        def per_dir(d):
            v = jnp.broadcast_to(d[None], (x.shape[0], 3))
            return ngp.query_rgb(params, v, feat, model_cfg)

        rgb = jax.vmap(per_dir)(dirs18).mean(axis=0)
        return rgb, sigma.reshape(-1)

    np_pts = points_world.shape[0]
    rgbs = np.zeros((np_pts, 3), np.float32)
    sigmas = np.zeros(np_pts, np.float32)
    for i in range(0, np_pts, chunk):
        sl = slice(i, min(i + chunk, np_pts))
        x = np.zeros((chunk, 3), np.float32)
        x[: sl.stop - sl.start] = points_world[sl]
        r, s = fn(params, jnp.asarray(x))
        rgbs[sl] = np.asarray(r)[: sl.stop - sl.start]
        sigmas[sl] = np.asarray(s)[: sl.stop - sl.start]
    alphas = np.clip(1.0 - np.exp(-DELTA * sigmas), 0.0, 1.0)
    return rgbs, sigmas, alphas


def extract_voxel_features(
    params: Any,
    model_cfg: ngp.NGPConfig,
    grid: OccupancyGrid,
    meta: Dict[str, Any],
    key: jax.Array,
    density_threshold: float = DENSITY_THRESHOLD,
    surface_chunk: int = 8192,
    mesh=None,
) -> Dict[str, np.ndarray]:
    """Full extraction (reference query_radiance_and_density_from_camera).

    `mesh` shards the Nc x Np surface pass over the mesh's data axis."""
    aabb = jnp.asarray(meta["aabb"], jnp.float32)
    contraction = meta["contraction_type"]
    rcfg = RenderConfig(
        contraction=contraction,
        render_step_size=float(meta["render_step_size"]),
        near_plane=float(meta.get("near_plane", 0.0) or 0.0),
        far_plane=float(meta.get("far_plane", 1e10) or 1e10),
    )
    points, indices = occupied_voxel_points(grid, aabb, contraction, key)
    camera_poses = np.asarray(meta["camera_poses"], np.float32)
    surface_mask = compute_surface_mask(
        params, model_cfg, grid, aabb, rcfg, points, camera_poses,
        chunk=surface_chunk, mesh=mesh,
    )
    rgb, sigma, alpha = query_features(params, model_cfg, aabb, points)
    density_mask = sigma > density_threshold
    return {
        "points": points,
        "rgb": rgb,
        "sigma": sigma,
        "alpha": alpha,
        "indices": indices,
        "density_mask": density_mask,
        "surface_mask": surface_mask,
        "resolution": np.asarray(grid.binary.shape),
    }


def _scatter_grid(res, indices, points, rgb, alpha) -> np.ndarray:
    grid = np.zeros((int(np.prod(res)), 7), np.float32)
    grid[indices, :3] = points
    grid[indices, 3:6] = rgb
    grid[indices, 6] = alpha
    return grid.reshape(*res, 7)


def save_voxel_artifacts(out_dir: str, extracted: Dict[str, np.ndarray]) -> None:
    """Write the §2.2 artifact set; .pt via torch for byte compatibility."""
    import torch

    os.makedirs(out_dir, exist_ok=True)
    res = extracted["resolution"]
    pts, rgb, alpha = extracted["points"], extracted["rgb"], extracted["alpha"]
    idx = extracted["indices"]
    dmask = extracted["density_mask"]
    smask = extracted["surface_mask"] & dmask

    for name, m in [("density_voxel", dmask), ("voxel", smask)]:
        p, r, a, i = pts[m], rgb[m], alpha[m], idx[m]
        write_ply(os.path.join(out_dir, f"{name}_point_cloud.ply"), p, r)
        grid = _scatter_grid(res, i, p, r, a)
        torch.save(torch.from_numpy(grid), os.path.join(out_dir, f"{name}_grid.pt"))
        torch.save(
            torch.from_numpy(i.astype(np.int64)),
            os.path.join(out_dir, f"{name}_mask.pt"),
        )
