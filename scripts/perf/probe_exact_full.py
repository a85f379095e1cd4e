"""Full-size exact-visibility registration step on the real TPU.

Round-1 VERDICT item 3 'Done' condition: RegTrainer(visibility='exact')
must run a FULL-SIZE step on TPU — full instant-ngp table (2^19 rows),
128 cameras, real NeRFRegTr — with the NeRF contexts as step ARGUMENTS
(never jit constants; the remote compiler rejects large constants with
HTTP 413).

Builds two full-size NGP checkpoints (random weights — the point is the
compile + execution at size, not convergence), a synthetic 64^3 voxel
pair, and runs RegTrainer._make_exact_step_fn's step twice (compile +
steady state), printing timings.
"""
from __future__ import annotations

import json
import os
import tempfile
import time

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/dregnerf_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from dregnerf_tpu.models import ngp
from dregnerf_tpu.ops import occupancy
from dregnerf_tpu.runtime.config import config_parser


def make_full_size_ckpt(path: str, seed: int) -> None:
    """Self-describing NGP checkpoint at FULL size (2^19-row tables)."""
    from dregnerf_tpu.runtime.checkpoint import save_checkpoint

    cfg = ngp.NGPConfig()  # full instant-ngp sizing
    params = ngp.init_ngp(jax.random.PRNGKey(seed), cfg)
    grid = occupancy.init_grid(128)._replace(
        binary=jnp.asarray(
            np.random.default_rng(seed).uniform(size=(128,) * 3) < 0.2
        )
    )
    n_cams = 100
    rng = np.random.default_rng(seed + 1)
    cams = np.tile(np.eye(4, dtype=np.float32)[None], (n_cams, 1, 1))
    eyes = rng.normal(size=(n_cams, 3))
    cams[:, :3, 3] = 3.0 * eyes / np.linalg.norm(eyes, axis=1, keepdims=True)
    meta = {
        "step": 0,
        "field": "ngp",
        "model_config": ngp.config_to_meta(cfg),
        "aabb": [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5],
        "contraction_type": "aabb",
        "render_step_size": float(3.0 * 3**0.5 / 1024),
        "near_plane": 0.0,
        "far_plane": 1e10,
        "grid_resolution": 128,
        "max_march_steps": 1024,
        "camera_poses": cams.tolist(),
    }
    os.makedirs(os.path.dirname(path), exist_ok=True)
    state = {
        "model": params,
        "occupancy": {"occs": grid.occs, "binary": grid.binary},
    }
    save_checkpoint(path, state, meta)


def main():
    from dregnerf_tpu.losses.registration import init_infonce_W
    from dregnerf_tpu.runtime import reg_trainer as RT

    work = tempfile.mkdtemp(prefix="exactvis_")
    src_ckpt = os.path.join(work, "src", "model.ckpt")
    tgt_ckpt = os.path.join(work, "tgt", "model.ckpt")
    t0 = time.time()
    make_full_size_ckpt(src_ckpt, 0)
    make_full_size_ckpt(tgt_ckpt, 1)
    print(json.dumps({"stage": "make_ckpts", "s": round(time.time() - t0, 1)}),
          flush=True)

    # synthetic 64^3 pair with ~2000 occupied voxels
    rng = np.random.default_rng(2)
    r = 64

    def grid_and_mask():
        grid = np.zeros((r, r, r, 7), np.float32)
        mask = np.zeros(r**3, bool)
        flat = rng.choice(r**3, 2000, replace=False)
        grid.reshape(-1, 7)[flat, :3] = rng.uniform(-1, 1, (2000, 3))
        grid.reshape(-1, 7)[flat, 3:6] = rng.uniform(0, 1, (2000, 3))
        grid.reshape(-1, 7)[flat, 6] = 1.0
        mask[flat] = True
        return grid, mask

    sg, sm = grid_and_mask()
    tg, tm = grid_and_mask()
    item = {
        "src_grid": sg, "tgt_grid": tg, "src_mask": sm, "tgt_mask": tm,
        "pose": np.eye(4, dtype=np.float32),
        "src_nerf_path": src_ckpt, "tgt_nerf_path": tgt_ckpt,
        "scene": "probe", "index": 0,
    }

    cfg = config_parser([
        "--dataset", "objaverse", "--root_dir", work, "--expname", "exact",
        "--out_dir", work, "--visibility", "exact", "--robust_loss",
        "--vis_buffer_size", str(1 << 16),
    ])

    # RegTrainer via __new__ (no dataset machinery needed)
    tr = RT.RegTrainer.__new__(RT.RegTrainer)
    tr.config = cfg
    tr.output_dir = os.path.join(work, "out")
    os.makedirs(tr.output_dir, exist_ok=True)
    from dregnerf_tpu.runtime.checkpoint import CheckpointManager

    tr.ckpt_manager = CheckpointManager(os.path.join(tr.output_dir, "model"))
    tr.aabb = jnp.asarray(cfg.aabb, jnp.float32)
    tr.model = RT.make_reg_model(cfg, jnp.bfloat16)  # FULL reg model (d=256, resnet50)
    tr.grid_resolution = r
    key = jax.random.PRNGKey(0)
    sample = tr._to_device(item)
    tr.params = {
        "model": tr.model.init(key, sample)["params"],
        "infonce_W": init_infonce_W(key, cfg.position_embedding_dim),
    }
    tr.setup_optimizer()
    tr.iteration = 0
    tr.visibility = "exact"
    from collections import OrderedDict

    tr._vis_cache = OrderedDict()
    tr._vis_cache_size = 8
    tr._vis_static = None
    tr._exact_step_fn = None

    t0 = time.time()
    m = tr.train_iteration(item)
    jax.block_until_ready(m["total"])
    compile_s = time.time() - t0
    t0 = time.time()
    iters = 3
    for _ in range(iters):
        m = tr.train_iteration(item)
    jax.block_until_ready(m["total"])
    steady = (time.time() - t0) / iters
    print(json.dumps({
        "stage": "exact_full_size_step",
        "compile_s": round(compile_s, 1),
        "steady_s_per_iter": round(steady, 3),
        "losses": {k: round(float(v), 4) for k, v in m.items()},
        "table_rows": int(ngp.NGPConfig().grid.total_rows),
    }), flush=True)


if __name__ == "__main__":
    main()
