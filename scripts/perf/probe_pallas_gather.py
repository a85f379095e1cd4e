"""Pallas experiment: manual DMA-pipelined row gather vs XLA's gather.

The encode path is bound by XLA's gather engine (~190M rows/s for 64B
rows from 32MB tables). Test whether a Pallas kernel issuing per-row
async copies HBM->VMEM with a deep in-flight window can beat it.
"""
from __future__ import annotations

import functools
import json
import time

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/dregnerf_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 1 << 19
F = 16  # row width (floats) — the packed L8F4 row is 32; test 16 and 32
N = 1 << 18
BLK = 512  # rows per grid step
WINDOW = 16  # in-flight DMAs


def make_gather(f):
    def kernel(idx_ref, table_hbm, out_ref, sem):
        base = pl.program_id(0) * BLK

        def issue(j):
            return pltpu.make_async_copy(
                table_hbm.at[idx_ref[base + j]],
                out_ref.at[j],
                sem.at[j % WINDOW],
            )

        # warm up the window
        for j in range(WINDOW):
            issue(j).start()

        def body(j, _):
            issue(j).wait()

            @pl.when(j + WINDOW < BLK)
            def _():
                issue(j + WINDOW).start()

            return 0

        jax.lax.fori_loop(0, BLK, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // BLK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (BLK, f), lambda i, idx_ref: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((WINDOW,))],
    )

    @jax.jit
    def gather(idx, table):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, f), jnp.float32),
            grid_spec=grid_spec,
        )(idx, table)

    return gather


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(json.dumps({"stage": name, "ms": round(dt * 1e3, 3),
                      "Mrows_per_s": round(N / dt / 1e6, 1)}), flush=True)
    return dt


def main():
    for f in (16, 32):
        table = jax.random.normal(jax.random.PRNGKey(0), (T, f), jnp.float32)
        idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T)

        @jax.jit
        def xla_gather(table, idx):
            return table[idx]

        timeit(f"xla_gather_w{f}", xla_gather, table, idx)
        try:
            pg = make_gather(f)
            out = pg(idx, table)
            ref = table[idx]
            import numpy as np

            np.testing.assert_allclose(np.asarray(out), np.asarray(ref))
            timeit(f"pallas_gather_w{f}", pg, idx, table)
        except Exception as e:
            print(json.dumps({"stage": f"pallas_gather_w{f}",
                              "error": str(e)[:500]}), flush=True)


if __name__ == "__main__":
    main()
