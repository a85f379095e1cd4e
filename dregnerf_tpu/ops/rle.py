"""Run-length compression for coherent scatter-adds (static shapes).

Why: the TPU lowers scatter-add to a SERIAL ~70 ns/row loop (measured,
probe_step_parts.py), so the packed-grid table-gradient accumulation —
one [N, 8F] scatter per level — dominates the NGP train step. But
marched samples arrive ray-major with strictly increasing t, so at a
level with cell edge larger than the step size, CONSECUTIVE samples hit
the SAME cell: runs of equal slot indices. Summing each run first (VPU
cumsum + boundary gathers — row-aligned, no serial loop) shrinks the
scatter to one row per run: ~32x fewer rows at the coarsest level of the
default L8F4 layout, ~3.5x overall.

All shapes are static: the run count is bounded by `max_runs` (callers
derive it from marching geometry — a capped ray of K samples crosses at
most K cells, and at most ~3*res+1 cells of an res^3 grid). Overflow
runs are DROPPED (jax scatter mode="drop"), so max_runs must be a true
bound; `run_length_segment_sum` also returns n_runs for callers to
assert against in tests.

Reference parity: tiny-cuda-nn accumulates hash-table gradients with
CUDA atomics (no reference-file analogue on TPU); this is the TPU-native
equivalent of its gradient accumulation stage.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def run_length_segment_sum(
    idx: jnp.ndarray, vals: jnp.ndarray, max_runs: int
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sum rows of `vals` over runs of consecutive equal `idx`.

    Args:
      idx:  [N] int32 slot per row (ray-coherent; NOT globally sorted).
      vals: [N, W] rows to accumulate.
      max_runs: static bound on the number of runs (true bound required;
        overflow is dropped).

    Returns:
      run_idx:  [max_runs] int32 — the slot of each run (0 for unused
        slots, whose rows are zero).
      run_sum:  [max_runs, W] — per-run row sums (zeros past n_runs).
      n_runs:   [] int32 — actual number of runs.
    """
    n = idx.shape[0]
    new = jnp.concatenate(
        [jnp.ones((1,), bool), idx[1:] != idx[:-1]])  # run starts [N]
    run_of = jnp.cumsum(new.astype(jnp.int32)) - 1  # sorted run id per row
    n_runs = run_of[-1] + 1

    # compact run-start positions into a static buffer (scatter-marks:
    # only run-start rows write; non-starts target slot max_runs -> drop)
    elem = jnp.arange(n, dtype=jnp.int32)
    write_to = jnp.where(new, run_of, max_runs)
    starts = jnp.full((max_runs,), n, jnp.int32).at[write_to].set(
        elem, mode="drop")

    # run-end positions scattered the same way (NOT derived from the next
    # run's start: under overflow-drop that would extend the last kept run
    # over every dropped row). Unused slots form empty [n, n-1] spans whose
    # cumsum difference is exactly zero.
    is_end = jnp.concatenate([idx[1:] != idx[:-1], jnp.ones((1,), bool)])
    end = jnp.full((max_runs,), n - 1, jnp.int32).at[
        jnp.where(is_end, run_of, max_runs)
    ].set(elem, mode="drop")

    csum = jnp.cumsum(vals.astype(jnp.float32), axis=0)  # [N, W]
    upper = csum[jnp.clip(end, 0, n - 1)]
    lower = jnp.where(
        (starts > 0)[:, None], csum[jnp.clip(starts - 1, 0, n - 1)], 0.0)
    # guard the degenerate end < start (cannot happen for valid runs; the
    # empty past-n_runs spans have end = n-1, start = n -> upper == lower)
    run_sum = (upper - lower).astype(vals.dtype)

    valid = jnp.arange(max_runs, dtype=jnp.int32) < n_runs
    run_idx = jnp.where(valid, idx[jnp.clip(starts, 0, n - 1)], 0)
    run_sum = jnp.where(valid[:, None], run_sum, 0.0)
    return run_idx, run_sum, n_runs


def rle_scatter_add(
    acc: jnp.ndarray, idx: jnp.ndarray, vals: jnp.ndarray, max_runs: int
) -> jnp.ndarray:
    """acc.at[idx].add(vals) with run-length pre-compression.

    Exactly equal (up to f32 summation order) to the direct scatter-add
    when max_runs bounds the true run count.
    """
    run_idx, run_sum, _ = run_length_segment_sum(idx, vals, max_runs)
    return acc.at[run_idx].add(run_sum.astype(acc.dtype))


def rle_scatter_add_safe(
    acc: jnp.ndarray, idx: jnp.ndarray, vals: jnp.ndarray, max_runs: int
) -> jnp.ndarray:
    """`rle_scatter_add` with a full-scatter fallback when the run count
    exceeds `max_runs` (lax.cond — only the taken branch executes), so
    `max_runs` may be a HEURISTIC: occupancy-filtered marching breaks run
    coherence data-dependently, making true static bounds as large as N.
    Correct for any max_runs; fast whenever the heuristic holds."""
    run_idx, run_sum, n_runs = run_length_segment_sum(idx, vals, max_runs)
    return jax.lax.cond(
        n_runs <= max_runs,
        lambda a: a.at[run_idx].add(run_sum.astype(a.dtype)),
        lambda a: a.at[idx].add(vals.astype(a.dtype)),
        acc,
    )
