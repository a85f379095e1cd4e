"""Volume rendering driver: field + occupancy grid + marcher + compositor.

Equivalent of the reference's `render_image` (conerf/utils/utils.py:44-142)
re-architected for XLA: a single jitted function renders one static-size ray
bucket through the packed-sample pipeline; full images are rendered by
scanning over fixed-size chunks (the reference's `test_chunk_size=8192`
chunking, conerf/utils/config.py:66-68), so there is exactly one compiled
program regardless of image size.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from dregnerf_tpu.models import ngp
from dregnerf_tpu.ops.composite import RenderOutput, composite, composite_rows
from dregnerf_tpu.ops.occupancy import OccupancyGrid
from dregnerf_tpu.ops.ray_march import (
    march_rays,
    march_rays_rows,
    row_sample_positions,
    sample_positions,
)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    contraction: str = "aabb"
    render_step_size: float = 5.1e-3
    buffer_size: int = 1 << 18
    max_steps: int = 1024
    near_plane: float = 0.0
    far_plane: float = 1e10
    chunk_size: int = 8192
    # "rows" (row-packed top_k marcher + row compositor — fastest, the
    # default), "quota" (flat per-ray-quota buffer) or "compact" (global
    # gather-by-rank packing, tightest buffer utilization). See
    # ops/ray_march.py for the tradeoffs.
    march_compaction: str = "rows"
    # per-ray survivor cap for march_compaction="capped"; None = min(256,
    # max_steps). Training uses an adaptive cap (a few x the per-ray
    # budget) so the top_k stays cheap.
    k_cap: int | None = None
    # full-image chunk execution: "scan" = all chunks in ONE compiled
    # lax.map program (strictly sequential XLA schedule); "hostloop" =
    # one independent jit dispatch per chunk (the stage-2 extraction
    # loop's pattern — through the axon tunnel, back-to-back independent
    # dispatches avoid per-call serialization; raced on TPU by
    # scripts/perf/probe_render_dispatch.py).
    image_dispatch: str = "scan"


def render_rays(
    params: Any,
    model_config: ngp.NGPConfig,
    grid: OccupancyGrid,
    origins: jnp.ndarray,
    viewdirs: jnp.ndarray,
    aabb: jnp.ndarray,
    config: RenderConfig,
    background: jnp.ndarray | None = None,
    stratified: bool = False,
    key: jax.Array | None = None,
    t_max: jnp.ndarray | None = None,
    field=ngp,
    times: jnp.ndarray | None = None,
    regions: jnp.ndarray | None = None,
) -> tuple[RenderOutput, dict]:
    """Render one ray bucket.

    Returns (RenderOutput, aux) where aux carries `n_samples` (live packed
    entries — the host reads this for dynamic ray batching, reference
    train_ngp_nerf.py:313-319) and `ray_counts` (samples per ray — the
    reference's alive_ray_mask source for loss masking, :321-323).

    Single-pass: density + color are queried together on the packed buffer
    (the reference's two-pass sigma_fn/rgb_sigma_fn split exists to feed
    nerfacc's CUDA visibility filter; on TPU one fused batch is cheaper
    than re-querying the hash grid).
    """
    if config.march_compaction == "rows":
        return _render_rays_rows(
            params, model_config, grid, origins, viewdirs, aabb, config,
            background, stratified, key, t_max, field, times, regions,
        )
    packed = march_rays(
        origins,
        viewdirs,
        grid,
        aabb,
        config.contraction,
        config.render_step_size,
        config.buffer_size,
        config.max_steps,
        config.near_plane,
        config.far_plane,
        t_max=t_max,
        stratified=stratified,
        key=key,
        compaction=config.march_compaction,
        regions=regions,
        k_cap=config.k_cap,
    )
    positions, dirs = sample_positions(packed, origins, viewdirs)
    if times is not None:
        # time-conditioned fields (D-NeRF): per-sample timestamp gathered
        # from the sample's source ray
        safe_ray = jnp.minimum(packed.ray_id, packed.num_rays - 1)
        t_sample = times[safe_ray][:, None]
        rgbs, sigmas = field.forward(
            params, positions, dirs, aabb, model_config, t=t_sample
        )
    else:
        rgbs, sigmas = field.forward(params, positions, dirs, aabb, model_config)
    sigmas = jnp.where(packed.valid, sigmas.reshape(-1), 0.0)
    out = composite(packed, rgbs, sigmas, background=background)
    ray_counts = jax.ops.segment_sum(
        packed.valid.astype(jnp.int32),
        packed.ray_id,
        num_segments=packed.num_rays + 1,
    )[: packed.num_rays]
    aux = {"n_samples": packed.num_samples, "ray_counts": ray_counts}
    return out, aux


def _render_rays_rows(
    params, model_config, grid, origins, viewdirs, aabb, config,
    background, stratified, key, t_max, field, times, regions,
) -> tuple[RenderOutput, dict]:
    """Row-packed render path: K = buffer_size / num_rays slots per ray;
    positions by arithmetic (no gathers), row compositor. The fast path —
    see ops/ray_march.py RowSamples."""
    num_rays = origins.shape[0]
    # a ray cannot yield more than max_steps survivors (top_k bound)
    k_per_ray = min(max(config.buffer_size // num_rays, 1), config.max_steps)
    rows = march_rays_rows(
        origins,
        viewdirs,
        grid,
        aabb,
        config.contraction,
        config.render_step_size,
        k_per_ray,
        config.max_steps,
        config.near_plane,
        config.far_plane,
        t_max=t_max,
        stratified=stratified,
        key=key,
        regions=regions,
    )
    positions, dirs = row_sample_positions(rows, origins, viewdirs)
    if times is not None:
        t_sample = jnp.broadcast_to(
            times[:, None, None], (*rows.valid.shape, 1)
        )
        rgbs, sigmas = field.forward(
            params, positions, dirs, aabb, model_config, t=t_sample
        )
    else:
        rgbs, sigmas = field.forward(params, positions, dirs, aabb, model_config)
    sigmas = jnp.where(rows.valid, sigmas.reshape(rows.valid.shape), 0.0)
    out = composite_rows(rows, rgbs, sigmas, background=background)
    aux = {
        "n_samples": rows.num_samples,
        "ray_counts": jnp.sum(rows.valid.astype(jnp.int32), axis=1),
    }
    return out, aux


def render_image_pipelined(
    params: Any,
    model_config: ngp.NGPConfig,
    grid: OccupancyGrid,
    origins: jnp.ndarray,
    viewdirs: jnp.ndarray,
    aabb: jnp.ndarray,
    config: RenderConfig,
    background: jnp.ndarray,
    eval_buffer_size: int | None = None,
    field=ngp,
    time: float | None = None,
):
    """Software-pipelined full-image render (rows marcher only).

    Two-stage pipeline over fixed-size ray chunks inside one lax.scan:
    each iteration marches chunk i+1 (occupancy REGION gathers) while
    shading chunk i (hash-table LEVEL gathers). The two stages are
    data-independent inside the body, so XLA's latency-hiding scheduler
    could in principle overlap their DMA streams — the round-2 probes
    measured independent gathers pipelining to ~2x aggregate row
    throughput (CLAUDE.md, probe_gather_chained.py).

    MEASURED (round 3, probe_render_pipelined.py, 2^16 rays / 8192-chunk
    / 2^18 buffer on v5e): pipelined 186.4 ms/image vs chunked 185.7 —
    XLA does NOT overlap the two stages across the scan body; the
    sequential march->shade schedule is preserved. Kept as an
    equivalence-tested alternative path and as evidence that the
    remaining render gap is not recoverable by software pipelining at
    the lax.scan level.

    Falls back to `render_image_chunked` for non-rows compaction modes.
    Same signature/return as `render_image_chunked`.
    """
    from dregnerf_tpu.ops.occupancy import pack_regions

    if config.march_compaction != "rows":
        return render_image_chunked(
            params, model_config, grid, origins, viewdirs, aabb, config,
            background, eval_buffer_size, field, time,
        )
    if hasattr(field, "prepare_params"):
        params = field.prepare_params(params, model_config)
    regions = pack_regions(grid.binary)
    n = origins.shape[0]
    cs = config.chunk_size
    buf = eval_buffer_size or config.buffer_size
    if eval_buffer_size is None:
        # eval must not inherit the TRAINING sample budget (see
        # render_image_chunked)
        buf = max(buf, cs * min(128, config.max_steps))
    k_per_ray = min(max(buf // cs, 1), config.max_steps)
    n_chunks = -(-n // cs)
    pad = n_chunks * cs - n
    o = jnp.concatenate([origins, jnp.zeros((pad, 3), origins.dtype)])
    d = jnp.concatenate(
        [viewdirs, jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (pad, 1))]
    )
    o = o.reshape(n_chunks, cs, 3)
    d = d.reshape(n_chunks, cs, 3)
    times = None if time is None else jnp.full((cs,), float(time))

    def march_chunk(oc, dc, regions):
        return march_rays_rows(
            oc, dc, grid, aabb, config.contraction, config.render_step_size,
            k_per_ray, config.max_steps, config.near_plane, config.far_plane,
            regions=regions,
        )

    def shade_chunk(rows, oc, dc):
        positions, dirs = row_sample_positions(rows, oc, dc)
        if times is not None:
            t_sample = jnp.broadcast_to(
                times[:, None, None], (*rows.valid.shape, 1)
            )
            rgbs, sigmas = field.forward(
                params, positions, dirs, aabb, model_config, t=t_sample
            )
        else:
            rgbs, sigmas = field.forward(
                params, positions, dirs, aabb, model_config
            )
        sigmas = jnp.where(rows.valid, sigmas.reshape(rows.valid.shape), 0.0)
        out = composite_rows(rows, rgbs, sigmas, background=background)
        return out.rgb, out.opacity, out.depth

    def body(carry, x):
        rows_prev, o_prev, d_prev = carry
        o_next, d_next = x
        rows_next = march_chunk(o_next, d_next, regions)  # independent of
        out_prev = shade_chunk(rows_prev, o_prev, d_prev)  # this shade
        return (rows_next, o_next, d_next), out_prev

    rows0 = march_chunk(o[0], d[0], regions)
    carry, outs = jax.lax.scan(body, (rows0, o[0], d[0]), (o[1:], d[1:]))
    last = shade_chunk(carry[0], carry[1], carry[2])
    rgb = jnp.concatenate([outs[0].reshape(-1, 3), last[0]])
    opacity = jnp.concatenate([outs[1].reshape(-1), last[1]])
    depth = jnp.concatenate([outs[2].reshape(-1), last[2]])
    return rgb[:n], opacity[:n], depth[:n]


def render_image_chunked(
    params: Any,
    model_config: ngp.NGPConfig,
    grid: OccupancyGrid,
    origins: jnp.ndarray,
    viewdirs: jnp.ndarray,
    aabb: jnp.ndarray,
    config: RenderConfig,
    background: jnp.ndarray,
    eval_buffer_size: int | None = None,
    field=ngp,
    time: float | None = None,
):
    """Render [N, 3] rays (a full flattened image) in fixed-size chunks.

    `time` renders the whole image at one timestamp (D-NeRF).

    Rays are padded to a multiple of chunk_size; chunks are processed with
    lax.map so the program compiles once — or, with
    `config.image_dispatch == "hostloop"`, as independent per-chunk jit
    dispatches (one cached program; see RenderConfig.image_dispatch).
    """
    from dregnerf_tpu.ops.occupancy import pack_regions

    if hasattr(field, "prepare_params"):
        params = field.prepare_params(params, model_config)  # pack once, not per chunk
    regions = pack_regions(grid.binary)  # once, not per chunk (~6ms each)
    n = origins.shape[0]
    cs = config.chunk_size
    buf = eval_buffer_size or config.buffer_size
    if eval_buffer_size is None and config.march_compaction == "rows":
        # full-image eval must not inherit the TRAINING sample budget: at
        # high step counts it gives each ray too few row slots (K =
        # buffer/chunk) and silently truncates dense rays. 128 slots/ray
        # covers any first-surface crossing with margin.
        buf = max(buf, cs * min(128, config.max_steps))
    n_chunks = -(-n // cs)
    pad = n_chunks * cs - n
    o = jnp.concatenate([origins, jnp.zeros((pad, 3), origins.dtype)])
    d = jnp.concatenate(
        [viewdirs, jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (pad, 1))]
    )
    o = o.reshape(n_chunks, cs, 3)
    d = d.reshape(n_chunks, cs, 3)

    chunk_cfg = dataclasses.replace(config, buffer_size=buf)

    times = None if time is None else jnp.full((cs,), float(time))

    if config.image_dispatch == "hostloop":
        outs = [
            _render_chunk_jit(
                params, model_config, grid, o[i], d[i], aabb, chunk_cfg,
                background, field, times, regions,
            )
            for i in range(n_chunks)
        ]
        rgb = jnp.stack([x[0] for x in outs])
        opacity = jnp.stack([x[1] for x in outs])
        depth = jnp.stack([x[2] for x in outs])
    else:
        def one_chunk(args):
            oc, dc = args
            out, _ = render_rays(
                params, model_config, grid, oc, dc, aabb, chunk_cfg,
                background, field=field, times=times, regions=regions,
            )
            return out.rgb, out.opacity, out.depth

        rgb, opacity, depth = jax.lax.map(one_chunk, (o, d))
    return (
        rgb.reshape(-1, 3)[:n],
        opacity.reshape(-1)[:n],
        depth.reshape(-1)[:n],
    )


@functools.partial(
    jax.jit, static_argnames=("model_config", "config", "field")
)
def _render_chunk_jit(
    params, model_config, grid, oc, dc, aabb, config, background, field,
    times, regions,
):
    """One image chunk as a standalone dispatch; the jit cache is keyed on
    (model_config, config, field) + shapes, so repeated images reuse one
    compiled program just like the lax.map path."""
    out, _ = render_rays(
        params, model_config, grid, oc, dc, aabb, config, background,
        field=field, times=times, regions=regions,
    )
    return out.rgb, out.opacity, out.depth
