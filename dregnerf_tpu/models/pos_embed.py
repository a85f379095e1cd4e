"""Position embeddings for continuous 3D coordinates.

Parity with conerf/register/position_embedding.py:8-76: sinusoidal embedding
generalized to continuous 3D (temperature 1000, scale*2pi) and a learned-MLP
alternative.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


class PositionEmbeddingCoordsSine(nn.Module):
    n_dim: int = 3
    d_model: int = 256
    temperature: float = 1000.0
    scale: float = 1.0

    @nn.compact
    def __call__(self, xyz: jnp.ndarray) -> jnp.ndarray:
        num_pos_feats = self.d_model // self.n_dim // 2 * 2
        padding = self.d_model - num_pos_feats * self.n_dim

        dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
        dim_t = self.temperature ** (2 * (dim_t // 2) / num_pos_feats)

        x = xyz * (self.scale * 2 * math.pi)
        pos = x[..., None] / dim_t  # [..., n_dim, num_pos_feats]
        pos_sin = jnp.sin(pos[..., 0::2])
        pos_cos = jnp.cos(pos[..., 1::2])
        emb = jnp.stack([pos_sin, pos_cos], axis=-1).reshape(*x.shape[:-1], -1)
        if padding:
            emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, padding)])
        return emb


class PositionEmbeddingLearned(nn.Module):
    n_dim: int = 3
    d_model: int = 256

    @nn.compact
    def __call__(self, xyz: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.d_model)(xyz)
        h = nn.gelu(h)
        return nn.Dense(self.d_model)(h)
