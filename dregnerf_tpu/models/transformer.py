"""Transformer cross-encoder (DETR-derived) in flax.

Parity with conerf/register/transformer.py:35-317: per layer, BOTH src and
tgt are updated with a SHARED self-attention, a SHARED cross-attention
(src<->tgt), and a SHARED feedforward; pre-norm; positional embeddings
added to q/k (and to values: sa_val_has_pos_emb = ca_val_has_pos_emb =
True, nerf_regtr.py:96-106); all `num_layers` intermediate outputs are
returned with the final LayerNorm applied (the last entry gets the
post-stack norm, TransformerCrossEncoder.forward).

Static shapes: sequences are padded to a fixed token capacity with boolean
valid masks; masks enter attention as key-padding bias. Dropout is 0.0 in
the reference config, so no dropout machinery.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _attn_mask(q_valid: jnp.ndarray, k_valid: jnp.ndarray) -> jnp.ndarray:
    """[B, 1, Q, K] boolean attention mask from validity masks."""
    return (q_valid[:, None, :, None] & k_valid[:, None, None, :])


class CrossEncoderLayer(nn.Module):
    d_model: int = 256
    num_heads: int = 8
    dim_feedforward: int = 1024
    dtype: Any = jnp.float32
    # sequence-parallel seam (SURVEY §2.4/§5): when a Mesh is supplied the
    # attention core runs token-sharded over `sp_axis` via
    # parallel/sp_attention.make_flax_sp_attention_fn — exact equivalence,
    # same parameters; None = plain local attention.
    sp_mesh: Any = None
    sp_axis: str = "data"

    @nn.compact
    def __call__(self, src, tgt, src_valid, tgt_valid, src_pos, tgt_pos):
        if self.sp_mesh is not None:
            from dregnerf_tpu.parallel.sp_attention import (
                make_flax_sp_attention_fn,
            )

            attention_fn = make_flax_sp_attention_fn(self.sp_mesh, self.sp_axis)
        else:
            attention_fn = nn.dot_product_attention
        # shared modules (applied to both sides)
        self_attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.d_model,
            dtype=self.dtype, attention_fn=attention_fn, name="self_attn",
        )
        cross_attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.d_model,
            dtype=self.dtype, attention_fn=attention_fn, name="cross_attn",
        )
        norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        norm3 = nn.LayerNorm(dtype=self.dtype, name="norm3")
        ffn1 = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="ffn1")
        ffn2 = nn.Dense(self.d_model, dtype=self.dtype, name="ffn2")

        # --- self attention (pre-norm) ---
        s2 = norm1(src)
        s2p = s2 + src_pos
        src = src + self_attn(s2p, s2p, s2p, mask=_attn_mask(src_valid, src_valid))
        t2 = norm1(tgt)
        t2p = t2 + tgt_pos
        tgt = tgt + self_attn(t2p, t2p, t2p, mask=_attn_mask(tgt_valid, tgt_valid))

        # --- cross attention ---
        s2, t2 = norm2(src), norm2(tgt)
        s2p, t2p = s2 + src_pos, t2 + tgt_pos
        src = src + cross_attn(s2p, t2p, t2p, mask=_attn_mask(src_valid, tgt_valid))
        tgt = tgt + cross_attn(t2p, s2p, s2p, mask=_attn_mask(tgt_valid, src_valid))

        # --- feedforward ---
        src = src + ffn2(nn.relu(ffn1(norm3(src))))
        tgt = tgt + ffn2(nn.relu(ffn1(norm3(tgt))))
        return src, tgt


class TransformerCrossEncoder(nn.Module):
    num_layers: int = 6
    d_model: int = 256
    num_heads: int = 8
    dim_feedforward: int = 1024
    dtype: Any = jnp.float32
    sp_mesh: Any = None  # sequence-parallel switch (see CrossEncoderLayer)
    sp_axis: str = "data"

    @nn.compact
    def __call__(self, src, tgt, src_valid, tgt_valid, src_pos, tgt_pos):
        """src/tgt: [B, N, D]; valid: [B, N] bool; pos: [B, N, D].

        Returns (src_all, tgt_all): [num_layers, B, N, D] — every
        intermediate normalized, the final layer normalized post-stack.
        """
        final_norm = nn.LayerNorm(dtype=self.dtype, name="final_norm")
        src_out, tgt_out = [], []
        for i in range(self.num_layers):
            src, tgt = CrossEncoderLayer(
                self.d_model, self.num_heads, self.dim_feedforward,
                self.dtype, sp_mesh=self.sp_mesh, sp_axis=self.sp_axis,
                name=f"layer{i}",
            )(src, tgt, src_valid, tgt_valid, src_pos, tgt_pos)
            src_out.append(final_norm(src))
            tgt_out.append(final_norm(tgt))
        return jnp.stack(src_out), jnp.stack(tgt_out)


class CorrespondenceDecoder(nn.Module):
    """Single-head attention decoder (nerf_regtr.py:251-394): project q/k
    only, softmax over the OTHER cloud, weighted sum of its coordinates;
    plus a sigmoid overlap head on the un-pos-embedded features."""

    d_model: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, src_feats, tgt_feats, src_xyz, tgt_xyz, src_valid, tgt_valid,
        src_pos, tgt_pos,
    ):
        """src_feats/tgt_feats: [L, B, N, D] conditioned features.

        Returns (src_corr [L,B,N,3], tgt_corr, src_overlap [L,B,N], tgt_overlap).
        """
        q_proj = nn.Dense(self.d_model, dtype=self.dtype, name="q_proj")
        k_proj = nn.Dense(self.d_model, dtype=self.dtype, name="k_proj")
        conf = nn.Dense(1, dtype=self.dtype, name="conf_logits_decoder")

        def simple_attention(query, key, value, k_valid):
            # query/key: [L, B, N, D]; value: [B, S, 3]
            q = q_proj(query) / jnp.sqrt(query.shape[-1]).astype(query.dtype)
            k = k_proj(key)
            attn = jnp.einsum("lbqd,lbsd->lbqs", q, k)
            attn = jnp.where(k_valid[None, :, None, :], attn, -1e9)
            attn = jax.nn.softmax(attn, axis=-1)
            return jnp.einsum("lbqs,bsd->lbqd", attn, value)

        src_q = src_feats + src_pos[None]
        tgt_q = tgt_feats + tgt_pos[None]
        src_corr = simple_attention(src_q, tgt_q, tgt_xyz, tgt_valid)
        tgt_corr = simple_attention(tgt_q, src_q, src_xyz, src_valid)
        src_overlap = jax.nn.sigmoid(conf(src_feats)[..., 0])
        tgt_overlap = jax.nn.sigmoid(conf(tgt_feats)[..., 0])
        return src_corr, tgt_corr, src_overlap, tgt_overlap
