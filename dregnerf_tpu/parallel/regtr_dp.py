"""Data-parallel registration training over a device mesh.

Scene PAIRS are sharded across the `data` axis: each device runs the full
NeRFRegTr forward + 4-loss pipeline on its own pair (the per-pair compute
is independent — conv/attention stay device-local), then gradients are
`pmean`ed over ICI and AdamW applies replicated updates. This turns the
reference's batch-size-1 trainer (train_nerf_regtr.py) into an N-pairs-
per-step trainer with perfect scaling, since there is exactly ONE
collective per step.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dregnerf_tpu.geometry import se3
from dregnerf_tpu.runtime.reg_trainer import compute_losses


def make_dp_reg_step(
    mesh: Mesh,
    model,
    optimizer: optax.GradientTransformation,
    aabb: jnp.ndarray,
    grid_resolution: int,
    robust: bool = True,
):
    """Returns jitted step(params, opt_state, batch) where batch arrays have
    a leading device axis of size mesh.shape['data']:
      src_grid/tgt_grid [D, R, R, R, 7], src_mask/tgt_mask [D, R^3],
      pose [D, 4, 4].
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P("data")),
        out_specs=(P(), P(), P()),
    )
    def step(params, opt_state, batch):
        local = {k: v[0] for k, v in batch.items()}  # this device's pair

        def loss_fn(p):
            total, losses, pred = compute_losses(
                model, p, local, aabb, grid_resolution, robust
            )
            return total, (losses, pred["pose"][-1])

        (total, (losses, pose_pred)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        grads = jax.lax.pmean(grads, "data")
        total = jax.lax.pmean(total, "data")
        losses = jax.lax.pmean(losses, "data")
        rre, rte = se3.pose_error(pose_pred, local["pose"][:3, :4])
        rre = jax.lax.pmean(rre, "data")
        rte = jax.lax.pmean(rte, "data")

        # Nonfinite-step guard, same as the single-chip step: ONE device's
        # degenerate draw poisons the pmean'd gradient for everyone —
        # skip the update and flag it (post-pmean `grads`/`total` are
        # replicated, so every device takes the same branch; no divergence
        # across the mesh).
        leaves = jax.tree_util.tree_leaves(grads)
        finite = jnp.isfinite(total)
        for g in leaves:
            finite = finite & jnp.all(jnp.isfinite(g))
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old), new_params, params
        )
        opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old),
            new_opt_state, opt_state,
        )
        return params, opt_state, {
            **losses, "total": total, "R_error": rre, "t_error": rte,
            "skipped_nonfinite": (~finite).astype(jnp.float32),
        }

    @jax.jit
    def wrapped(params, opt_state, batch):
        return step(params, opt_state, batch)

    return wrapped


def shard_pair_batch(mesh: Mesh, items: list) -> Dict[str, jnp.ndarray]:
    """Stack host-side pair dicts into device-sharded batch arrays."""
    import numpy as np

    keys = ("src_grid", "tgt_grid", "src_mask", "tgt_mask", "pose")
    batch = {k: np.stack([np.asarray(it[k]) for it in items]) for k in keys}
    sharding = NamedSharding(mesh, P("data"))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}
