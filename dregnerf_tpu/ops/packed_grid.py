"""Packed-row multiresolution grid encoding — the TPU-fast NGP encoder.

Why this exists (measured on TPU v5e, see bench history in
.claude/skills/verify/SKILL.md): XLA's gather engine tops out at ~100-200M
rows/s regardless of row width (width <= 128 floats is free). The classic
instant-ngp hash encoding needs 8 corner gathers x 16 levels = 128 rows per
sample — a hard ceiling near 1M samples/s. This encoder restructures the
memory layout so encoding needs exactly ONE gather per (point, level):

  * Every level is a (possibly modulo-wrapped) dense vertex grid with
    linear slot index  slot = (x*res^2 + y*res + z) mod T_l  computed in
    uint32 (T_l a power of two for wrapped levels, so mod-2^32 wraparound
    composes correctly with the final mask).
  * Because the slot index is LINEAR in the cell coords, the 8 corners of
    any cell live at 8 STATIC slot offsets {0,1,B,B+1,A,A+1,A+B,A+B+1}.
    A derived "packed" table P[t] = concat_o V[(t+o) mod T] is built from
    8 jnp.rolls of the vertex table V — sequential traffic, a couple of ms
    per training step, and its gradient (roll transpose = opposite roll)
    is equally cheap.
  * Encoding then gathers ONE [8*F]-float row per (point, level) and
    applies trilinear weights — identical math to vertex interpolation,
    so the field stays C0-continuous everywhere.

Aliasing: levels whose dense grid exceeds T wrap linearly instead of
xor-hashing. Far-apart vertices still share parameters (as in instant-ngp);
the alias structure is a deterministic lattice rather than pseudo-random.
The multi-level pyramid de-aliases exactly as in instant-ngp: each level
wraps at different offsets and the MLP resolves the votes. The xor-hash
encoder (ops/hash_encoding.py) remains available for parity checks via
NGPConfig.encoder = "xor_hash".

Capability parity target: tiny-cuda-nn HashGrid (reference
conerf/radiance_fields/ngp.py:92-104) — same level geometry (16 levels,
base 16, growth 1.4472692012786865), same feature width, near-identical
parameter budget (~12.5M).
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PackedGridConfig:
    """Default layout: 4 levels x 8 features (constant capacity L*F = 32,
    same parameter budget and resolution span as tcnn's 16x2).

    TPU rationale (measured, scripts/perf/probe_encode_width.py +
    quality_levels.py + layout_gate.py on v5e): encoding costs one row
    GATHER per (point, level) and row width up to 128 floats is free, so
    fewer, wider levels trade nothing in table bytes but cut gather rows
    (and backward scatter rows) proportionally — full render 14.4 (L4F8)
    vs 11.5 (L8F4) vs 10.2 (L16F2) M samples/s. The round-5 layout gate at
    data scale (100 views x 192 px, 2000 steps, full 2^19 tables,
    experiments/stage3/layout_gate.json) quality-gates the flip: L4F8 val
    PSNR 33.11-33.24 vs L8F4's 32.52-32.65, surface-voxel extraction
    90.8k vs 77.3k. Narrower tcnn-like layouts stay available:
    PackedGridConfig(n_levels=8, n_features=4, per_level_scale=2.1) or the
    tcnn-parity 16x2 (per_level_scale=1.4472692012786865).
    """

    n_levels: int = 4
    n_features: int = 8
    log2_table_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 5.66
    # table-gradient scatter-add accumulator: "f32" (exact XLA scatter),
    # "bf16" (2.9x faster scatter on v5e — 7.1 vs 20.8 ms per wrapped
    # level, probe_train_bwd.py; tcnn accumulates its hash-table grads in
    # fp16, so reduced-precision accumulation is the reference's own
    # design), "sorted"/"sorted_bf16" (argsort + indices_are_sorted hint:
    # the scatter stops being a serial row loop — 503 M rows/s vs 1.2 on
    # random indices, probe_pallas_scatter.py; "sorted" keeps exact f32
    # sums), or "pallas" (bucketed VMEM-resident accumulate,
    # ops/pallas_scatter.py — exact f32 numerics; mosaic rejects it
    # through the axon tunnel as of round 3). Quality-gated before
    # becoming default.
    grad_accum: str = "f32"
    # run-length compression of the table-gradient scatter (ops/rle.py):
    # marched samples are ray-coherent, so coarse levels see runs of equal
    # slots; pre-summing runs (VPU cumsum, no serial loop) shrinks the
    # serial per-row scatter. Set to the normalized step size
    # (render_step_size / aabb extent, linear contraction only) to enable;
    # 0 disables. Levels with expected runs < RLE_MIN_RUN keep the plain
    # scatter; an in-graph overflow fallback keeps any heuristic correct.
    rle_step_u: float = 0.0

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features

    def level_scales(self) -> np.ndarray:
        return np.array(
            [
                self.base_resolution * self.per_level_scale**l - 1.0
                for l in range(self.n_levels)
            ],
            np.float32,
        )

    def level_resolutions(self) -> np.ndarray:
        return (np.ceil(self.level_scales()) + 1.0).astype(np.int64)

    def level_table_sizes(self) -> np.ndarray:
        """T_l: full dense size when it fits, else 2^log2_table_size."""
        res = self.level_resolutions()
        t_max = 1 << self.log2_table_size
        return np.where(res**3 <= t_max, res**3, t_max).astype(np.int64)

    def level_wrapped(self) -> np.ndarray:
        res = self.level_resolutions()
        return (res**3) > (1 << self.log2_table_size)

    def level_offsets(self) -> np.ndarray:
        sizes = self.level_table_sizes()
        return np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)

    @property
    def total_rows(self) -> int:
        return int(self.level_table_sizes().sum())


def init_packed_grid(key: jax.Array, config: PackedGridConfig) -> jnp.ndarray:
    """Vertex table V: [total_rows, F], uniform(-1e-4, 1e-4)."""
    return jax.random.uniform(
        key, (config.total_rows, config.n_features), jnp.float32, -1e-4, 1e-4
    )


# corner order: (dx, dy, dz) with dz fastest — offsets 0,1,B,B+1,A,A+1,A+B,A+B+1
_CORNERS = np.stack(
    np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"), axis=-1
).reshape(8, 3).astype(np.int64)


def gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table[idx]; the backward is XLA's native scatter-add.

    Perf note (measured on v5e): a sort-based backward (argsort indices,
    scatter sorted rows) wins 3.3x on RANDOM indices (197 -> 60 ms for
    2^18 16-float rows into 2^19) but LOSES in the real training step
    (284 vs 248 ms full fwd+bwd) because marching emits ray-ordered,
    spatially coherent samples whose slots are already scatter-friendly —
    the 16 per-level argsorts are pure overhead. Kept as a seam so the
    policy can be revisited for incoherent workloads.
    """
    return table[idx]


@jax.custom_vjp
def gather_rows_bf16_accum(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """gather_rows with a bf16 scatter-add backward (2.9x faster on v5e;
    tcnn-style reduced-precision table-gradient accumulation)."""
    return table[idx]


def _grb_fwd(table, idx):
    return table[idx], (idx, table.shape)


def _grb_bwd(res, g):
    idx, shape = res
    acc = jnp.zeros(shape, jnp.bfloat16).at[idx].add(g.astype(jnp.bfloat16))
    return acc.astype(jnp.float32), None


gather_rows_bf16_accum.defvjp(_grb_fwd, _grb_bwd)


import functools as _functools  # noqa: E402


@_functools.lru_cache(maxsize=None)
def _gather_rows_pallas(table_rows: int):
    """gather_rows with the bucketed Pallas scatter backward
    (ops/pallas_scatter.py): rows sorted by table shard, then a serial
    f32 accumulate over VMEM-resident output blocks — exact f32 numerics
    at (bet: better-than-)bf16-scatter speed."""
    from dregnerf_tpu.ops.pallas_scatter import bucketed_scatter_add

    @jax.custom_vjp
    def f(table, idx):
        return table[idx]

    def fwd(table, idx):
        return table[idx], idx

    def bwd(idx, g):
        acc = bucketed_scatter_add(
            idx, g.astype(jnp.float32), table_rows=table_rows)
        return acc, None

    f.defvjp(fwd, bwd)
    return f


@_functools.lru_cache(maxsize=None)
def _gather_rows_sorted(accum: str):
    """gather_rows with an argsort + `indices_are_sorted` scatter backward.

    Round-3 probe (probe_pallas_scatter.py, v5e trainer shapes
    2^18 rows -> 2^19x32): XLA's scatter-add is a serial row loop ONLY
    when it cannot prove index monotonicity — sorting the indices and
    passing indices_are_sorted=True collapses 214.7 ms to 0.52 ms
    (503 M rows/s) on random indices. The round-2 sort-based backward
    (gather_rows docstring) lost because it sorted WITHOUT the hint, so
    the scatter stayed serial and the argsorts were pure overhead.
    `accum="f32"` keeps exact f32 numerics (sums merely reordered);
    `accum="bf16"` matches the tcnn-style reduced-precision accumulator.
    """

    @jax.custom_vjp
    def f(table, idx):
        return table[idx]

    def fwd(table, idx):
        return table[idx], (idx, table.shape)

    def bwd(res, g):
        idx, shape = res
        order = jnp.argsort(idx)
        dt = jnp.bfloat16 if accum == "bf16" else jnp.float32
        acc = jnp.zeros(shape, dt).at[idx[order]].add(
            g[order].astype(dt), indices_are_sorted=True
        )
        return acc.astype(jnp.float32), None

    f.defvjp(fwd, bwd)
    return f


RLE_MIN_RUN = 4.0  # expected steps-per-cell below which RLE can't win
_RLE_SAFETY = 2.0  # heuristic max_runs = safety * expected runs


def rle_expected_run(config: PackedGridConfig, level: int) -> float:
    """Expected consecutive samples per cell at `level` for a march with
    normalized step `config.rle_step_u` (diagonal-worst-case crossing)."""
    if config.rle_step_u <= 0.0:
        return 0.0
    scale = float(config.level_scales()[level])
    return 1.0 / (config.rle_step_u * scale * 1.7320508)


@_functools.lru_cache(maxsize=None)
def _gather_rows_rle(max_runs: int, accum: str):
    """gather with a run-length-compressed scatter-add backward.

    Runs are pre-summed in f32 (better numerics than a plain bf16
    scatter even when the final accumulation is bf16); the scatter then
    touches one row per run. Overflowing the heuristic `max_runs` falls
    back to the plain scatter in-graph (ops/rle.py)."""
    from dregnerf_tpu.ops.rle import rle_scatter_add_safe

    @jax.custom_vjp
    def f(table, idx):
        return table[idx]

    def fwd(table, idx):
        return table[idx], (idx, table.shape)

    def bwd(res, g):
        idx, shape = res
        dt = jnp.bfloat16 if accum == "bf16" else jnp.float32
        acc = rle_scatter_add_safe(
            jnp.zeros(shape, dt), idx, g.astype(jnp.float32), max_runs)
        return acc.astype(jnp.float32), None

    f.defvjp(fwd, bwd)
    return f


def pack_table(table: jnp.ndarray, config: PackedGridConfig) -> tuple:
    """V [total_rows, F] -> tuple of per-level P_l [T_l, 8*F] via 8 rolls.

    Kept per-level (not concatenated) deliberately: gather throughput on
    TPU degrades with table size, so 16 gathers from <=33MB tables beat
    one gather from a 400MB table.
    """
    sizes = config.level_table_sizes()
    res = config.level_resolutions()
    offsets = config.level_offsets()
    packed_levels = []
    for l in range(config.n_levels):
        v = jax.lax.dynamic_slice_in_dim(table, int(offsets[l]), int(sizes[l]))
        A, B = int(res[l]) * int(res[l]), int(res[l])
        rows = []
        for dx, dy, dz in _CORNERS:
            o = int(dx * A + dy * B + dz) % int(sizes[l])
            rows.append(jnp.roll(v, -o, axis=0))
        packed_levels.append(jnp.concatenate(rows, axis=1))
    return tuple(packed_levels)


def packed_encode(
    packed: tuple, x: jnp.ndarray, config: PackedGridConfig
) -> jnp.ndarray:
    """Encode positions with the packed per-level tables.

    Args:
      packed: tuple of [T_l, 8*F] from `pack_table`.
      x: [..., 3] in [0, 1]^3 (clipped).

    Returns [..., n_levels * F] f32.
    """
    batch_shape = x.shape[:-1]
    n = int(np.prod(batch_shape)) if batch_shape else 1
    x = jnp.clip(x.reshape(-1, 3).astype(jnp.float32), 0.0, 1.0)
    L, F = config.n_levels, config.n_features

    scales = jnp.asarray(config.level_scales())  # [L]
    res = config.level_resolutions()

    pos = x[:, None, :] * scales[None, :, None] + 0.5  # [N, L, 3]
    pos_floor = jnp.floor(pos)
    frac = pos - pos_floor

    # cell coords clamped to the valid cell range [0, res-2]
    max_cell = jnp.asarray((res - 2).astype(np.int32))  # [L]
    cell = jnp.clip(
        pos_floor.astype(jnp.int32), 0, max_cell[None, :, None]
    ).astype(jnp.uint32)

    A = jnp.asarray((res * res).astype(np.uint32))  # [L] (mod-2^32 ok)
    B = jnp.asarray(res.astype(np.uint32))
    lin = cell[..., 0] * A[None, :] + cell[..., 1] * B[None, :] + cell[..., 2]

    wrapped = config.level_wrapped()
    t_pow2 = jnp.uint32((1 << config.log2_table_size) - 1)

    corners = jnp.asarray(_CORNERS.astype(np.float32))  # [8, 3]
    w = jnp.prod(
        jnp.where(
            corners[None, None].astype(bool),
            frac[:, :, None, :],
            1.0 - frac[:, :, None, :],
        ),
        axis=-1,
    )  # [N, L, 8]

    if config.grad_accum == "bf16":
        gather = gather_rows_bf16_accum
    elif config.grad_accum == "sorted":
        gather = _gather_rows_sorted("f32")
    elif config.grad_accum == "sorted_bf16":
        gather = _gather_rows_sorted("bf16")
    else:
        gather = gather_rows
    sizes = config.level_table_sizes()
    outs = []
    for l in range(L):
        slot = (lin[:, l] & t_pow2) if wrapped[l] else lin[:, l]
        exp_run = rle_expected_run(config, l)
        if exp_run >= RLE_MIN_RUN:
            max_runs = min(n, int(_RLE_SAFETY * n / exp_run))
            # pallas accumulates exact f32 — match it in the RLE levels
            rle_accum = "f32" if config.grad_accum != "bf16" else "bf16"
            g = _gather_rows_rle(max_runs, rle_accum)
        elif config.grad_accum == "pallas":
            g = _gather_rows_pallas(int(sizes[l]))
        else:
            g = gather
        # one gather per (point, level)
        rows = g(packed[l], slot.astype(jnp.int32))
        rows = rows.reshape(n, 8, F)
        outs.append(jnp.einsum("nc,ncf->nf", w[:, l], rows))
    out = jnp.stack(outs, axis=1)  # [N, L, F]
    return out.reshape(*batch_shape, L * F)


def packed_grid_param_count(config: PackedGridConfig) -> int:
    return config.total_rows * config.n_features
