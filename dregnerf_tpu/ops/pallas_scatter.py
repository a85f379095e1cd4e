"""Bucketed Pallas scatter-add for NGP table gradients.

XLA lowers scatter-add on TPU to a serial ~70ns/row (f32) / ~29ns/row
(bf16) loop over HBM rows (measured, scripts/perf/probe_step_parts.py) —
it is the training-step bound of the packed-grid encoder backward
(reference kernel: tiny-cuda-nn's hash-table gradient accumulation,
conerf/radiance_fields/ngp.py:92-104).

This kernel restructures the reduction for the TPU memory hierarchy:

  1. XLA side: rows are sorted by destination SHARD (argsort of
     idx // shard_rows, bincount -> shard offsets);
  2. Pallas grid over shards: each step owns one [shard_rows, W] f32
     output block RESIDENT IN VMEM, DMA-streams its slice of the sorted
     rows HBM->VMEM in chunks, and serially accumulates — a VMEM
     read-modify-write per row instead of an HBM one.

The serial loop totals N iterations across all shards (rows are visited
once), accumulation is exact f32 (the bf16 scatter trades precision for
speed; VMEM RMW makes that trade unnecessary), and the chunk DMA
overlaps nothing fancy — the bet is purely that a VMEM RMW + loop step
is ~10x cheaper than XLA's HBM scatter step. Gate on the real fused
training step before changing defaults (CLAUDE.md: microbenches
mislead).

On non-TPU backends the kernel runs in interpret mode (tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bucketed_kernel(off_ref, idx_ref, src_hbm, out_ref, scratch, sem, *,
                     chunk, shard_rows):
    shard = pl.program_id(0)
    base = shard * shard_rows
    out_ref[:] = jnp.zeros_like(out_ref)
    start = off_ref[shard]
    end = off_ref[shard + 1]
    n_chunks = (end - start + chunk - 1) // chunk

    def chunk_body(c, _):
        c0 = start + c * chunk
        dma = pltpu.make_async_copy(
            src_hbm.at[pl.ds(c0, chunk), :], scratch, sem)
        dma.start()
        dma.wait()

        def row_body(i, _):
            g = c0 + i

            @pl.when(g < end)
            def _():
                local = idx_ref[g] - base
                out_ref[pl.ds(local, 1), :] += scratch[pl.ds(i, 1), :].astype(
                    out_ref.dtype)

            return 0

        jax.lax.fori_loop(0, chunk, row_body, 0)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("table_rows", "shard_rows", "chunk", "interpret"))
def bucketed_scatter_add(
    idx: jnp.ndarray,
    src: jnp.ndarray,
    *,
    table_rows: int,
    shard_rows: int = 16384,
    chunk: int = 2048,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """sum-scatter `src` rows [N, W] into a new f32 [table_rows, W] table.

    Equivalent to `jnp.zeros((table_rows, W)).at[idx].add(src)` up to f32
    summation order. table_rows need not divide shard_rows (the output is
    padded to the shard grid and sliced).
    """
    n, w = src.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shard_rows = min(shard_rows, _next_pow2(table_rows))
    n_shards = -(-table_rows // shard_rows)
    padded_rows = n_shards * shard_rows

    shard_id = idx // shard_rows
    order = jnp.argsort(shard_id)
    idx_sorted = idx[order].astype(jnp.int32)
    src_sorted = src[order].astype(jnp.float32)
    counts = jnp.bincount(shard_id, length=n_shards)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)])
    # pad so the fixed-size chunk DMA at a shard's tail stays in bounds
    # (padded rows sit past offsets[-1] == N and are never accumulated)
    idx_sorted = jnp.pad(idx_sorted, (0, chunk))
    src_sorted = jnp.pad(src_sorted, ((0, chunk), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # offsets, idx_sorted
        grid=(n_shards,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (shard_rows, w), lambda s, off_ref, idx_ref: (s, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((chunk, w), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _bucketed_kernel, chunk=chunk, shard_rows=shard_rows)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((padded_rows, w), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(2.0 * (shard_rows + chunk) * w * 4),
        ),
    )(offsets, idx_sorted, src_sorted)
    return out[:table_rows] if padded_rows != table_rows else out


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())
