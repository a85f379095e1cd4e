"""Sequence-parallel attention seam for the registration cross-encoder.

The reference's point sequences are capped at ~3000 tokens, so plain data
parallelism suffices for parity — but SURVEY.md §2.4/§5 calls for a
sharded-attention seam for future >10^4-point grids. This provides it:

  * tokens (queries) are sharded over the `data` mesh axis;
  * keys/values are all-gathered once per attention call (Ulysses-style
    head sharding is unnecessary at d_model 256 — one all-gather of K/V is
    cheaper than two all-to-alls at these sizes);
  * the softmax and weighted sum are shard-local afterward.

Exact equivalence with unsharded attention (no approximation).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def make_flax_sp_attention_fn(mesh: Mesh, axis: str = "data"):
    """Build an `attention_fn` for flax `nn.MultiHeadDotProductAttention`
    that shards the QUERY/token axis over `axis` and all-gathers K/V.

    This is the plumbing that turns the seam into a feature: pass the
    returned fn as `attention_fn=` (TransformerCrossEncoder exposes it via
    its `sp_mesh` switch) and the cross-encoder's six attention calls run
    token-sharded over the mesh with exact (non-approximate) results.

    Shapes follow flax's convention after projection:
      query [B, Q, H, Dh], key/value [B, K, H, Dh], mask [B, 1|H, Q, K].
    Q and K must divide the mesh axis size (the model pads tokens to a
    static power-of-two capacity, so this holds by construction).
    """

    def attention_fn(query, key, value, bias=None, mask=None, **kwargs):
        del kwargs  # dropout machinery unused (reference dropout = 0.0)
        if bias is not None:
            raise NotImplementedError("sp attention_fn supports mask only")
        scale = jnp.sqrt(query.shape[-1]).astype(query.dtype)

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(
                P(None, axis),
                P(None, axis),
                P(None, axis),
                P(None, None, axis, None),
            ),
            out_specs=P(None, axis),
        )
        def attn(q_l, k_l, v_l, m_l):
            k_full = jax.lax.all_gather(k_l, axis, axis=1, tiled=True)
            v_full = jax.lax.all_gather(v_l, axis, axis=1, tiled=True)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q_l, k_full) / scale
            logits = jnp.where(m_l, logits, jnp.asarray(-1e9, logits.dtype))
            w = jax.nn.softmax(logits, axis=-1)
            return jnp.einsum("bhqk,bkhd->bqhd", w, v_full)

        if mask is None:
            mask = jnp.ones(
                (query.shape[0], 1, query.shape[1], key.shape[1]), bool
            )
        return attn(query, key, value, mask)

    return attention_fn


def sharded_attention(
    mesh: Mesh,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_valid: jnp.ndarray,
    k_valid: jnp.ndarray,
    num_heads: int = 8,
    axis: str = "data",
) -> jnp.ndarray:
    """Multi-head attention with the query/token axis sharded over `axis`.

    q: [N_q, D] (sharded on N_q), k/v: [N_kv, D] (sharded on N_kv),
    q_valid: [N_q] bool, k_valid: [N_kv] bool. Returns [N_q, D] sharded
    like q. Plain projection-free attention (the caller projects).
    """
    d = q.shape[-1]
    dh = d // num_heads

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    def attn(q_l, k_l, v_l, qv_l, kv_l):
        # gather the FULL key/value sequence onto every shard (one
        # collective per call; rides ICI)
        k_full = jax.lax.all_gather(k_l, axis, tiled=True)
        v_full = jax.lax.all_gather(v_l, axis, tiled=True)
        kv_full = jax.lax.all_gather(kv_l, axis, tiled=True)

        nq = q_l.shape[0]
        nk = k_full.shape[0]
        qh = q_l.reshape(nq, num_heads, dh).transpose(1, 0, 2)
        kh = k_full.reshape(nk, num_heads, dh).transpose(1, 0, 2)
        vh = v_full.reshape(nk, num_heads, dh).transpose(1, 0, 2)

        logits = jnp.einsum("hqd,hkd->hqk", qh, kh) / jnp.sqrt(dh).astype(q_l.dtype)
        logits = jnp.where(kv_full[None, None, :], logits, -1e9)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("hqk,hkd->hqd", w, vh)
        out = out.transpose(1, 0, 2).reshape(nq, d)
        return out * qv_l[:, None]

    return attn(q, k, v, q_valid, k_valid)
