"""Activations with custom gradients.

`trunc_exp` mirrors the reference's `_TruncExp` (conerf/radiance_fields/
ngp.py:22-38): forward is exp(x); backward clamps the pre-activation at 15
so density gradients can't explode. The NGP density activation is
``trunc_exp(x - 1)`` (ngp.py:76).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, max=15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def density_activation(x: jnp.ndarray) -> jnp.ndarray:
    """NGP default density activation: trunc_exp(x - 1)."""
    return trunc_exp(x - 1.0)
