"""Visibility / surface-field supervision for registration training.

The reference (conerf/loss/confidence_loss.py:56-160) reloads both NGP
NeRFs FROM DISK on every training iteration and marches Nc x N rays to
label each keypoint visible/invisible — the dominant cost of its trainer
(SURVEY.md §3.3).

TPU-native redesign, two tiers:

  * `grid_visibility` (training default): the extraction stage already
    computed exactly this field — voxel_mask.pt marks voxels whose
    surface field S >= 0.5 from some training camera AND sigma > 0.7.
    Visibility of an arbitrary point is a nearest-voxel lookup into that
    mask: one gather, fully jittable, no NeRF reload, no ray marching.
    Resolution-limited to the 128^3 grid — the same grid the keypoints
    came from, so no fidelity is lost for kp labels.

  * `exact_visibility` (eval/parity): jitted re-computation by marching
    camera->point rays with the packed marcher (per-ray t_max) against the
    checkpointed NeRF — the reference semantics, for validation and for
    points off the voxel lattice (e.g. warped keypoints far from either
    grid).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from dregnerf_tpu.models import ngp
from dregnerf_tpu.ops.composite import surface_field_per_ray
from dregnerf_tpu.ops.contraction import contract
from dregnerf_tpu.ops.occupancy import OccupancyGrid
from dregnerf_tpu.ops.ray_march import march_rays, sample_positions
from dregnerf_tpu.render.renderer import RenderConfig


class VisibilityContext(NamedTuple):
    """Everything exact visibility needs from one NeRF checkpoint, as ARRAYS.

    This is the round-2 fix for the jit-constant limitation: full-size
    NeRF params must thread through the train step's ARGUMENTS (the remote
    compiler rejects programs with large embedded constants — HTTP 413), so
    the context is a pytree passed to the jitted step, not a closure.
    Static knobs (model/render configs) travel separately.
    """

    params: Any  # NGP params pytree (raw vertex table; packed in-graph)
    binary: jnp.ndarray  # [R, R, R] bool occupancy
    cam_origins: jnp.ndarray  # [C, 3] f32 (padded to static C)
    cam_valid: jnp.ndarray  # [C] bool
    aabb: jnp.ndarray  # [6] f32


def grid_visibility(
    points: jnp.ndarray,
    visible_mask_flat: jnp.ndarray,
    aabb: jnp.ndarray,
    resolution: int,
    contraction: str = "aabb",
) -> jnp.ndarray:
    """[..., 3] world points -> {0., 1.} visibility by voxel-mask lookup.

    visible_mask_flat: [R^3] bool in ix*R^2+iy*R+iz order (voxel_mask.pt
    indices scattered to bool).
    """
    u = contract(points, aabb, contraction)
    idx = jnp.floor(u * resolution).astype(jnp.int32)
    in_range = jnp.all((idx >= 0) & (idx < resolution), axis=-1)
    idx = jnp.clip(idx, 0, resolution - 1)
    flat = idx[..., 0] * resolution * resolution + idx[..., 1] * resolution + idx[..., 2]
    return (visible_mask_flat[flat] & in_range).astype(jnp.float32)


def exact_visibility(
    params: Any,
    model_cfg: ngp.NGPConfig,
    grid: OccupancyGrid,
    aabb: jnp.ndarray,
    rcfg: RenderConfig,
    cam_origins: jnp.ndarray,
    cam_valid: jnp.ndarray,
    points: jnp.ndarray,
    buffer_size: int = 1 << 16,
    cutoff: float = 0.5,
    samples_per_ray: int = 64,
) -> jnp.ndarray:
    """Reference-parity visibility: max over cameras of per-ray S >= cutoff.

    cam_origins: [C, 3] (padded), cam_valid: [C] bool, points: [M, 3].
    Jittable: the camera loop is a fori_loop over a static C; invalid
    padded cameras are skipped with lax.cond (no wasted marching).

    Points are processed in ray chunks of buffer_size // samples_per_ray
    rays, and the march's per-ray survivor cap is set to samples_per_ray,
    so chunk * cap == buffer_size and the packed buffer can NEVER
    overflow — no ray is silently starved regardless of scene density.
    Rays crossing more than `samples_per_ray` occupied steps truncate at
    the cap; raise `samples_per_ray` (or buffer_size) for such scenes.
    """
    m = points.shape[0]
    from dregnerf_tpu.ops.occupancy import pack_regions

    regions = pack_regions(grid.binary)  # once, not per camera iteration

    chunk = max(min(buffer_size // max(samples_per_ray, 1), m), 1)
    n_chunks = -(-m // chunk)
    pad = n_chunks * chunk - m
    pts = jnp.concatenate([points, jnp.ones((pad, 3), points.dtype)])
    pts = pts.reshape(n_chunks, chunk, 3)

    def surface_chunk(origin, p):
        o = jnp.broadcast_to(origin[None], (chunk, 3))
        d = p - o
        t_max = jnp.linalg.norm(d, axis=-1)
        viewdirs = d / jnp.maximum(t_max[:, None], 1e-10)
        packed = march_rays(
            o, viewdirs, grid, aabb, rcfg.contraction, rcfg.render_step_size,
            buffer_size, rcfg.max_steps, rcfg.near_plane, rcfg.far_plane,
            t_max=t_max, regions=regions, compaction="capped",
            k_cap=samples_per_ray,
        )
        pos, _ = sample_positions(packed, o, viewdirs)
        sigma = ngp.query_density(params, pos, aabb, model_cfg).reshape(-1)
        sigma = jnp.where(packed.valid, sigma, 0.0)
        return surface_field_per_ray(packed, sigma)

    def body(c, smax):
        def march_cam(_):
            s = jax.lax.map(
                lambda p: surface_chunk(cam_origins[c], p), pts
            ).reshape(-1)[:m]
            return jnp.maximum(smax, s)

        # padded camera slots skip the march entirely
        return jax.lax.cond(cam_valid[c], march_cam, lambda _: smax, None)

    smax = jax.lax.fori_loop(0, cam_origins.shape[0], body, jnp.zeros(m))
    return (smax >= cutoff).astype(jnp.float32)


def exact_visibility_ctx(
    ctx: VisibilityContext,
    model_cfg: ngp.NGPConfig,
    rcfg: RenderConfig,
    points: jnp.ndarray,
    buffer_size: int = 1 << 16,
    cutoff: float = 0.5,
) -> jnp.ndarray:
    """`exact_visibility` over a VisibilityContext argument pytree.

    Jit-safe at full model size: ctx arrays are step arguments, never
    constants. Packs the encoder table ONCE up front (outside the camera
    loop) and accepts arbitrary leading batch dims on `points` (the warped
    keypoints arrive as [L, N, 3]).
    """
    params = ngp.prepare_params(ctx.params, model_cfg)
    grid = OccupancyGrid(
        occs=jnp.zeros((0,), jnp.float32), binary=ctx.binary
    )
    shape = points.shape[:-1]
    flat = points.reshape(-1, 3)
    out = exact_visibility(
        params, model_cfg, grid, ctx.aabb, rcfg,
        ctx.cam_origins, ctx.cam_valid, flat,
        buffer_size=buffer_size, cutoff=cutoff,
    )
    return out.reshape(shape)


def load_visibility_context(
    path: str, max_cameras: int = 128
) -> tuple[VisibilityContext, ngp.NGPConfig, RenderConfig]:
    """Host-side: one NeRF checkpoint -> (context arrays, static configs).

    Reference contract: conerf/loss/confidence_loss.py:16-52
    `load_radiance_fields` — but loaded ONCE per checkpoint (callers cache),
    not per iteration.
    """
    import numpy as np

    from dregnerf_tpu.runtime.ngp_trainer import load_field_from_checkpoint

    params, grid, meta, model_cfg, rcfg = load_field_from_checkpoint(path)
    if meta.get("field", "ngp") != "ngp":
        raise NotImplementedError(
            "exact visibility supervision currently supports NGP checkpoints "
            f"only (got field={meta.get('field')!r})"
        )
    cams = np.asarray(meta["camera_poses"], np.float32)
    if len(cams) > max_cameras:
        print(
            f"[visibility] WARNING: {path} has {len(cams)} cameras; exact "
            f"visibility uses the first {max_cameras} (raise --vis_max_cameras "
            "for full reference parity — points visible only from dropped "
            "cameras will be labeled invisible)",
            flush=True,
        )
    origins = np.zeros((max_cameras, 3), np.float32)
    valid = np.zeros(max_cameras, bool)
    n = min(len(cams), max_cameras)
    origins[:n] = cams[:n, :3, 3]
    valid[:n] = True
    ctx = VisibilityContext(
        params=params,
        binary=grid.binary,
        cam_origins=jnp.asarray(origins),
        cam_valid=jnp.asarray(valid),
        aabb=jnp.asarray(meta["aabb"], jnp.float32),
    )
    return ctx, model_cfg, rcfg
