"""Pallas serial-accumulate scatter vs XLA native scatter-add (VERDICT r2 #1).

The NGP table-gradient backward scatters [N, 32] sample rows into a
[2^19, 32] per-level packed-table cotangent. Measured (probe_step_parts):
XLA's scatter is a serial ~70ns/row loop in f32, ~29ns/row in bf16, and
independent level scatters do NOT overlap — it is the training-step bound.

This probe measures a Pallas alternative: keep a table SHARD resident in
VMEM as the output block (grid over shards), stream (idx, src) chunks
HBM->VMEM, and serially accumulate rows that fall in the shard. Rows are
visited once per shard pass, so the serial loop runs N * n_shards
iterations — the bet is that a VMEM row RMW + loop step is enough cheaper
than XLA's HBM scatter step to win at n_shards = ceil(table_bytes/8MB).

Shapes: one wrapped level at trainer scale — N = 2^18 samples,
T = 2^19 rows, W = 32 (8 corners x 4 features), bf16 accumulate.

Run on the TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/perf/probe_pallas_scatter.py
CPU correctness check (interpret mode):
  ... probe_pallas_scatter.py --check
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/dregnerf_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(idx_ref, src_hbm, out_ref, scratch, idx_s, sem, *, n, chunk,
            shard_rows):
    """One grid step = one table shard resident in VMEM (out_ref).

    idx_ref: [N] int32 in SMEM (scalar-prefetched: available for control).
    src_hbm: [N, W] rows in HBM/ANY; streamed in chunks via DMA.
    """
    shard = pl.program_id(0)
    base = shard * shard_rows
    out_ref[:] = jnp.zeros_like(out_ref)

    n_chunks = n // chunk

    def chunk_body(c, _):
        dma = pltpu.make_async_copy(
            src_hbm.at[pl.ds(c * chunk, chunk), :], scratch, sem
        )
        dma.start()
        dma.wait()

        def row_body(i, _):
            row_idx = idx_ref[c * chunk + i]
            local = row_idx - base

            @pl.when((local >= 0) & (local < shard_rows))
            def _():
                out_ref[pl.ds(local, 1), :] += scratch[pl.ds(i, 1), :].astype(
                    out_ref.dtype
                )

            return 0

        jax.lax.fori_loop(0, chunk, row_body, 0)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
    del idx_s  # SMEM scratch unused (idx arrives scalar-prefetched)


@functools.partial(
    jax.jit, static_argnames=("table_rows", "shard_rows", "chunk",
                              "interpret"))
def pallas_scatter_add(idx, src, *, table_rows, shard_rows=2048, chunk=2048,
                       interpret=False):
    n, w = src.shape
    n_shards = table_rows // shard_rows
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # idx
        grid=(n_shards,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # src stays in HBM
        out_specs=pl.BlockSpec(
            (shard_rows, w), lambda s, idx_ref: (s, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((chunk, w), src.dtype),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _kernel, n=n, chunk=chunk, shard_rows=shard_rows)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((table_rows, w), jnp.bfloat16),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1.5 * (shard_rows + chunk) * w * 4),
        ),
    )(idx, src)


def xla_scatter_add(idx, src, table_rows):
    return (
        jnp.zeros((table_rows, src.shape[1]), jnp.bfloat16)
        .at[idx]
        .add(src.astype(jnp.bfloat16))
    )


def xla_sorted_scatter_add(idx, src, table_rows):
    """argsort + indices_are_sorted hint: does the hint unserialize it?"""
    order = jnp.argsort(idx)
    return (
        jnp.zeros((table_rows, src.shape[1]), jnp.bfloat16)
        .at[idx[order]]
        .add(src[order].astype(jnp.bfloat16), indices_are_sorted=True)
    )


# bucketed variant lives in the library (integrated as --grad_accum pallas)
from dregnerf_tpu.ops.pallas_scatter import (  # noqa: E402
    bucketed_scatter_add as pallas_bucketed_scatter_add)


def make_coherent_idx(key, n, table_rows, run=1.0):
    """Ray-coherent-ish indices: random walk with expected run length."""
    if run <= 1.0:
        return jax.random.randint(key, (n,), 0, table_rows, jnp.int32)
    n_runs = int(n / run) + 1
    starts = jax.random.randint(key, (n_runs,), 0, table_rows, jnp.int32)
    reps = np.full(n_runs, int(run), np.int32)
    idx = jnp.repeat(starts, jnp.asarray(reps), total_repeat_length=n)
    return idx


def check():
    n, t, w = 4096, 8192, 32
    key = jax.random.PRNGKey(0)
    idx = make_coherent_idx(key, n, t)
    src = jax.random.normal(jax.random.PRNGKey(1), (n, w), jnp.float32)
    ours = pallas_scatter_add(
        idx, src, table_rows=t, shard_rows=1024, chunk=512, interpret=True)
    ref = xla_scatter_add(idx, src, t)
    np.testing.assert_allclose(
        np.asarray(ours, np.float32), np.asarray(ref, np.float32),
        rtol=0, atol=0.25)  # bf16 accumulation order differs
    bucketed = pallas_bucketed_scatter_add(
        idx, src, table_rows=t, shard_rows=1024, chunk=512, interpret=True)
    np.testing.assert_allclose(
        np.asarray(bucketed, np.float32), np.asarray(ref, np.float32),
        rtol=0, atol=0.25)
    srt = xla_sorted_scatter_add(idx, src, t)
    np.testing.assert_allclose(
        np.asarray(srt, np.float32), np.asarray(ref, np.float32),
        rtol=0, atol=0.25)
    print("interpret-mode check OK (shard, bucketed, sorted-hint)")


def bench():
    n, t, w = 1 << 18, 1 << 19, 32
    key = jax.random.PRNGKey(0)
    src = jax.random.normal(jax.random.PRNGKey(1), (n, w), jnp.float32)

    for tag, run in [("random", 1.0), ("coherent_run4", 4.0)]:
        idx = make_coherent_idx(key, n, t, run)
        for name, fn in [
            ("xla", lambda i, s: xla_scatter_add(i, s, t)),
            ("xla_sorted_hint", lambda i, s: xla_sorted_scatter_add(i, s, t)),
            ("pallas_shard2048", functools.partial(
                pallas_scatter_add, table_rows=t, shard_rows=2048)),
            ("pallas_shard16384", functools.partial(
                pallas_scatter_add, table_rows=t, shard_rows=16384,
                chunk=4096)),
            ("pallas_bucketed16k", functools.partial(
                pallas_bucketed_scatter_add, table_rows=t,
                shard_rows=16384, chunk=2048)),
            ("pallas_bucketed64k", functools.partial(
                pallas_bucketed_scatter_add, table_rows=t,
                shard_rows=65536, chunk=4096)),
        ]:
            f = jax.jit(lambda i, s, fn=fn: fn(i, s))
            try:
                out = f(idx, src)
                out.block_until_ready()
                # chain src through output so no two calls share args
                iters, s = 8, src
                t0 = time.time()
                for _ in range(iters):
                    out = f(idx, s)
                    s = s + 1e-6 * out[:n].astype(jnp.float32)
                out.block_until_ready()
                dt = (time.time() - t0) / iters
                print(f"{tag:16s} {name:20s} {dt*1e3:8.2f} ms "
                      f"({n/dt/1e6:.1f} M rows/s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{tag:16s} {name:20s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    if "--check" in sys.argv:
        check()
    else:
        bench()
