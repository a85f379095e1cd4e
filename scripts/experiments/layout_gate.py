"""Encoder-layout race AT DATA SCALE (round-3 perf backlog).

Round 2 gated encoder layouts on 36-view x 96-px fixtures and kept L8F4;
the sigma-gate experiments later showed that pixel regime is exactly the
one that confounds quality (2^19 tables fog regardless of config). This
gate re-races the layouts at the data scale the fleet actually trains at
(100 views x 192 px), under the round-3 training default (capped-512
marching + bf16 table-gradient accumulation), and also gates the
run-length-compressed table-gradient backward (ops/rle.py).

Per config: steady-state train wall time, val/train PSNR, and the
extraction-relevant density/surface distributions (same metrics as
sigma_gate.py). Decision rule: fastest config whose val PSNR and
surface-voxel count match the L8F4 incumbent.

Encoding cost scales with gather/scatter ROWS = samples x levels, so
fewer, wider levels are the lever (row width up to 128 floats is free on
the gather side; the serial scatter is per-row): L4F8 measured 14.4 M
samples/s full render vs L8F4's 11.5 (probe_encode_width.py).

Run on the TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/experiments/layout_gate.py
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/dregnerf_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sigma_gate import checkpoint_metrics  # noqa: E402

from dregnerf_tpu.datasets import fixtures  # noqa: E402
from dregnerf_tpu.datasets.base import load_scene_blocks  # noqa: E402
from dregnerf_tpu.models.ngp import NGPConfig, init_ngp  # noqa: E402
from dregnerf_tpu.ops.packed_grid import PackedGridConfig  # noqa: E402
from dregnerf_tpu.runtime.config import config_parser  # noqa: E402
from dregnerf_tpu.runtime.ngp_trainer import NGPTrainer  # noqa: E402

WORK = os.environ.get("LAYOUT_GATE_WORK", "/tmp/layout_gate")
ITERS = int(os.environ.get("LAYOUT_GATE_ITERS", 2000))
BUDGET = int(os.environ.get("LAYOUT_GATE_BUDGET", 1 << 17))
N_VIEWS = int(os.environ.get("LAYOUT_GATE_VIEWS", 100))
IMG_SIZE = int(os.environ.get("LAYOUT_GATE_IMG", 192))

# rle_step_u = render_step_size / min-extent for the [-1,1]^3 fixture aabb
# (diag*sqrt(3)... see ngp_trainer.build_networks): 2*sqrt(3)/1024 / 2
_STEP_U = float(np.sqrt(3.0) / 1024.0)

# Ordered by decision value: the queue bounds this script with `timeout`
# and results are written incrementally, so a mid-run kill keeps the
# highest-value comparisons (incumbent baseline first, then the strongest
# challenger layouts, then the long-shot Pallas variants).
_ALL = {
    # incumbent (round-3 default) — the comparison baseline at data scale
    "L8F4": PackedGridConfig(n_levels=8, n_features=4, per_level_scale=2.1,
                             grad_accum="bf16"),
    "L4F8": PackedGridConfig(n_levels=4, n_features=8, per_level_scale=5.66,
                             grad_accum="bf16"),
    # L4F8 coarse-level run lengths at this step size are ~74/13 samples
    # per cell — the strongest RLE compression of any layout
    "L4F8_rle": PackedGridConfig(n_levels=4, n_features=8,
                                 per_level_scale=5.66, grad_accum="bf16",
                                 rle_step_u=_STEP_U),
    # + run-length-compressed scatter at coarse levels (expected runs
    # 22.8/10.5/4.9 for levels 0-2 at this step size)
    "L8F4_rle": PackedGridConfig(n_levels=8, n_features=4,
                                 per_level_scale=2.1, grad_accum="bf16",
                                 rle_step_u=_STEP_U),
    "L6F6": PackedGridConfig(n_levels=6, n_features=6, per_level_scale=2.83,
                             grad_accum="bf16"),
    "L6F6_rle": PackedGridConfig(n_levels=6, n_features=6,
                                 per_level_scale=2.83, grad_accum="bf16",
                                 rle_step_u=_STEP_U),
    # bucketed Pallas VMEM scatter backward (exact f32; ops/pallas_scatter)
    # — expected to fail remote mosaic compile (HTTP 500, probe_scatter);
    # kept last as a cheap retest in case the tunnel's mosaic path works now
    "L8F4_pallas": PackedGridConfig(n_levels=8, n_features=4,
                                    per_level_scale=2.1,
                                    grad_accum="pallas"),
    "L4F8_pallas": PackedGridConfig(n_levels=4, n_features=8,
                                    per_level_scale=5.66,
                                    grad_accum="pallas"),
}
_SEL = os.environ.get("LAYOUT_GATE_CONFIGS", "")
CONFIGS = {k: _ALL[k] for k in _SEL.split(",")} if _SEL else _ALL


def main():
    data_root = os.path.join(WORK, "data")
    scene = "scene_00"
    if not os.path.exists(os.path.join(data_root, scene, "transforms.json")):
        fixtures.make_scene(data_root, num_views=N_VIEWS, image_size=IMG_SIZE,
                            seed=0, name=scene,
                            spheres=fixtures.random_spheres(100))
    tr = load_scene_blocks("objaverse", data_root, scene, "train", 1, True, 2)[0]
    te = load_scene_blocks("objaverse", data_root, scene, "test", 1, True, 2)[0]

    results = {}
    for name, grid_cfg in CONFIGS.items():
        try:
            results[name] = _run_config(name, grid_cfg, data_root, scene, tr, te)
        except Exception as e:  # noqa: BLE001 — isolate per-config failures
            results[name] = {"layout": name, "error":
                             f"{type(e).__name__}: {str(e)[:300]}"}
            print(json.dumps(results[name]), flush=True)
        # write after EVERY config: the queue bounds this script with
        # `timeout`, and a mid-run kill must not lose completed configs
        _write(results)


def _run_config(name, grid_cfg, data_root, scene, tr, te):
    if True:  # keep original indentation below
        out_dir = os.path.join(WORK, "out", name)
        ckpt = os.path.join(out_dir, "model", "model.ckpt")
        rec = {"layout": name, "iters": ITERS,
               "views": N_VIEWS, "img": IMG_SIZE}
        if not os.path.exists(ckpt):
            cfg = config_parser([
                "--dataset", "objaverse", "--root_dir", data_root,
                "--scene", scene, "--expname", name, "--out_dir",
                os.path.join(WORK, "out"),
                "--factor", "1", "--aabb=-1.0,-1.0,-1.0,1.0,1.0,1.0",
                "--max_iterations", str(ITERS),
                "--sample_budget", str(BUDGET), "--max_march_steps", "1024",
                "--grid_resolution", "128", "--init_num_rays", "1024",
                "--max_num_rays", str(1 << 15),
                "--n_tensorboard", "1000", "--n_validation", "1000000",
                "--n_checkpoint", str(ITERS),
            ])
            trainer = NGPTrainer(cfg, tr, te, output_dir=out_dir)
            trainer.model_config = NGPConfig(grid=grid_cfg)
            trainer.render_config = dataclasses.replace(
                trainer.render_config, march_compaction="capped")
            trainer.params = init_ngp(jax.random.PRNGKey(0),
                                      trainer.model_config)
            trainer.opt_state = trainer.optimizer.init(trainer.params)
            trainer.state.params = trainer.params
            trainer.state.opt_state = trainer.opt_state
            trainer._step_fns = {}
            trainer.__dict__.pop("_occ_update_fns", None)
            t0 = time.time()
            trainer.train()
            rec["train_s"] = round(time.time() - t0, 1)
        rec.update(checkpoint_metrics(ckpt, te, tr))
        print(json.dumps(rec), flush=True)
        return rec


def _write(results):
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "experiments", "stage3",
        "layout_gate.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    try:
        with open(out) as f:
            merged = json.load(f)
    except Exception:
        merged = {}
    merged.update(results)
    with open(out, "w") as f:
        json.dump(merged, f, indent=2, sort_keys=True)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
