"""RegTr training-step breakdown at stage-3 shapes (round-3 perf probe).

Decomposes the registration train step (reference hot loop
train_nerf_regtr.py:171-256) into separately jitted stages at the real
fleet shapes (128^3x7 grid, ~16k occupied voxels, d=256 resnet50 FPN,
2048 tokens/side, 6 cross-encoder layers):

  fpn        one side's 3D ResNet50+FPN forward
  select     sparse gather-side trilinear resize + voxel select
  select_dense  same via the materialized [R^3, 256] volume (old path)
  forward    full NeRFRegTr forward (both sides)
  step       full train step: fwd + 4 losses + bwd + AdamW

Inputs are CHAINED between iterations (an i-dependent > ulp perturbation
of the grid rgba) because identical-arg repeats through the axon tunnel
return result-cache numbers (CLAUDE.md).

Run on TPU: PYTHONPATH=/root/.axon_site:/root/repo \
    python scripts/perf/probe_regtr_step.py [stage ...]
"""
from __future__ import annotations

import json
import sys
import time

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/dregnerf_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np
import optax

from dregnerf_tpu.models.regtr import (NeRFRegTr, gather_trilinear_resized,
                                       trilinear_resize)
from dregnerf_tpu.ops.voxel_subsample import masked_select_first_k
from dregnerf_tpu.runtime.config import config_parser
from dregnerf_tpu.runtime.reg_trainer import (LOSS_WEIGHTS, compute_losses,
                                              make_reg_model)

import os

R = int(os.environ.get("PROBE_R", 128))
N_OCC = int(os.environ.get("PROBE_OCC", 20000))  # ~fleet-scale occupancy


def make_batch():
    rng = np.random.default_rng(0)
    grid = np.zeros((R, R, R, 7), np.float32)
    mask = np.zeros(R * R * R, bool)
    ii = rng.integers(8, R - 8, size=(N_OCC, 3))
    flat = ii[:, 0] * R * R + ii[:, 1] * R + ii[:, 2]
    g = grid.reshape(-1, 7)
    g[flat, :3] = (ii + 0.5) / R * 2.0 - 1.0
    g[flat, 3:6] = rng.uniform(size=(len(flat), 3))
    g[flat, 6] = rng.uniform(0.5, 1.0, size=len(flat))
    mask[flat] = True
    pose = np.eye(4, dtype=np.float32)
    return {
        "src_grid": jnp.asarray(grid), "src_mask": jnp.asarray(mask),
        "tgt_grid": jnp.asarray(grid), "tgt_mask": jnp.asarray(mask),
        "pose": jnp.asarray(pose),
    }


def perturb(batch, i):
    """> ulp, value-preserving-scale chain step (beats the result cache)."""
    eps = (jnp.float32(i) + 1.0) * 1e-4
    out = dict(batch)
    for k in ("src_grid", "tgt_grid"):
        out[k] = batch[k].at[..., 3:6].add(eps)
    return out


def timeit(name, fn, batch, iters=6):
    out = fn(batch)
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(1, iters + 1):
        out = fn(perturb(batch, i))
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(json.dumps({"stage": name, "ms": round(dt * 1e3, 2)}), flush=True)
    return dt


def main():
    stages = set(sys.argv[1:]) or {
        "fpn", "select", "select_dense", "forward", "step"}
    cfg = config_parser([
        "--dataset", "objaverse", "--root_dir", "/tmp", "--expname", "probe",
        "--out_dir", "/tmp/probe_regtr", "--robust_loss",
    ])
    model = make_reg_model(cfg, jnp.bfloat16)
    batch = make_batch()
    key = jax.random.PRNGKey(0)
    params = {"model": model.init(key, batch)["params"],
              "infonce_W": jnp.zeros((256, 256), jnp.float32)}
    print(json.dumps({
        "shapes": {"grid": list(batch["src_grid"].shape), "n_occ": N_OCC},
    }), flush=True)

    if "fpn" in stages or "select" in stages or "select_dense" in stages:
        # isolate the FPN submodule apply
        fpn_params = params["model"]["fpn3d"]
        from dregnerf_tpu.models.resnet3d import FeaturePyramid3D
        fpn_mod = FeaturePyramid3D(
            arch="resnet50", out_channels=256, dtype=jnp.bfloat16)

        # model params are jit ARGUMENTS everywhere below: the ResNet50-3D
        # weights closed over as constants would inline into the HLO and
        # 413 the remote compiler (CLAUDE.md).
        @jax.jit
        def fpn_fn(fp, b):
            rgba = b["src_grid"][None, ..., 3:7].astype(jnp.bfloat16)
            return fpn_mod.apply({"params": fp}, rgba)

        if "fpn" in stages:
            timeit("fpn", lambda b: fpn_fn(fpn_params, b), batch)

        @jax.jit
        def select_fn(fp, b):
            rgba = b["src_grid"][None, ..., 3:7].astype(jnp.bfloat16)
            f = fpn_mod.apply({"params": fp}, rgba)
            idx, valid = masked_select_first_k(b["src_mask"], 16384)
            return gather_trilinear_resized(f, (R, R, R), idx) * valid[:, None]

        @jax.jit
        def select_dense_fn(fp, b):
            rgba = b["src_grid"][None, ..., 3:7].astype(jnp.bfloat16)
            f = fpn_mod.apply({"params": fp}, rgba)
            idx, valid = masked_select_first_k(b["src_mask"], 16384)
            up = trilinear_resize(f, (R, R, R))[0].reshape(-1, f.shape[-1])
            return up[idx] * valid[:, None]

        if "select" in stages:
            timeit("select(fpn+sparse)",
                   lambda b: select_fn(fpn_params, b), batch)
        if "select_dense" in stages:
            timeit("select_dense(fpn+dense)",
                   lambda b: select_dense_fn(fpn_params, b), batch)

    if "forward" in stages:
        @jax.jit
        def fwd(p, b):
            return model.apply({"params": p}, b)["pose"]

        timeit("forward", lambda b: fwd(params["model"], b), batch)

    if "step" in stages:
        tx = optax.chain(
            optax.clip_by_global_norm(0.1),
            optax.adamw(1e-4, weight_decay=1e-4),
        )
        opt_state = tx.init(params)
        aabb = jnp.asarray(cfg.aabb, jnp.float32)

        @jax.jit
        def step(p, s, b):
            def loss_fn(p_):
                total, losses, _ = compute_losses(
                    model, p_, b, aabb, R, robust=True)
                return total, losses

            (total, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p)
            updates, s2 = tx.update(grads, s, p)
            p2 = optax.apply_updates(p, updates)
            return p2, s2, total

        def step_chain(b):
            nonlocal params, opt_state
            params, opt_state, total = step(params, opt_state, b)
            return total

        timeit("step(fwd+bwd+adamw)", step_chain, batch)


if __name__ == "__main__":
    main()
