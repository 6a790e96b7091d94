"""Grouped-query attention with optional returned probabilities and top-k
value aggregation.

TPU-native counterpart of the reference's ``scaled_dot_product_attention``
wrapper (reference: attention_utils.py:8-54): when a cache strategy needs
attention probabilities (heavy-hitter, hybrid, analysis), we take the "math"
einsum path and return GQA-pooled probs; otherwise the caller may use the
fused flash path for prefill. Unlike the reference we never materialize
GQA-repeated K/V — the query heads are folded into a group axis and contracted
against the shared KV heads directly.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def gqa_attention(
    q: jax.Array,  # [B, H, L, D]
    k: jax.Array,  # [B, KVH, S, D]
    v: jax.Array,  # [B, KVH, S, D]
    mask: Optional[jax.Array] = None,  # bool, broadcastable to [B, KVH, G, L, S]
    scale: Optional[float] = None,
    return_attn: bool = False,
    attn_top_k: float = 1.0,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Masked softmax attention with grouped queries.

    Returns ``(out [B, H, L, D], attn [B, KVH, L, S] | None)`` where ``attn``
    is mean-pooled over the query-group axis, matching the reference's GQA
    pooling before cache-state updates (reference: model.py:413-418).

    ``attn_top_k < 1`` restricts the value aggregation to the top-k scored
    cache slots during decode (reference: attention_utils.py:44-51).
    """
    B, H, L, D = q.shape
    KVH, S = k.shape[1], k.shape[2]
    G = H // KVH
    scale = (1.0 / math.sqrt(D)) if scale is None else scale

    qg = q.reshape(B, KVH, G, L, D)
    scores = (
        jnp.einsum(
            "bkgld,bksd->bkgls", qg, k, preferred_element_type=jnp.float32
        )
        * scale
    )
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)

    top_k = S if L > 1 else int(round(attn_top_k * S))
    if top_k < S:
        # Decode-only sparse value aggregation over top-k scored slots.
        topv, topi = jax.lax.top_k(scores, top_k)  # [B,KVH,G,L,K]
        probs = jax.nn.softmax(topv, axis=-1)
        # Gather V rows per (b, kvh, g): v [B,KVH,S,D] -> [B,KVH,G,L,K,D]
        v_exp = jnp.broadcast_to(v[:, :, None, None], (B, KVH, G, L, S, D))
        v_top = jnp.take_along_axis(v_exp, topi[..., None], axis=4)
        out = jnp.einsum("bkglt,bkgltd->bkgld", probs, v_top.astype(probs.dtype))
        out = out.reshape(B, H, L, D).astype(q.dtype)
        attn = None
        if return_attn:
            # Scatter the top-k probs back to dense [B,KVH,L,S] (group-pooled).
            onehot_scatter = jnp.zeros((B, KVH, G, L, S), probs.dtype).at[
                jnp.arange(B)[:, None, None, None, None],
                jnp.arange(KVH)[None, :, None, None, None],
                jnp.arange(G)[None, None, :, None, None],
                jnp.arange(L)[None, None, None, :, None],
                topi,
            ].add(probs)
            attn = onehot_scatter.mean(axis=2)
        return out, attn

    probs = jax.nn.softmax(scores, axis=-1)  # f32 [B,KVH,G,L,S]
    out = jnp.einsum("bkgls,bksd->bkgld", probs, v.astype(probs.dtype))
    out = out.reshape(B, H, L, D).astype(q.dtype)
    attn = probs.mean(axis=2) if return_attn else None
    return out, attn


def causal_prefill_attention(
    q: jax.Array,  # [B, H, P, D]
    k: jax.Array,  # [B, KVH, P, D]
    v: jax.Array,  # [B, KVH, P, D]
    valid: jax.Array,  # bool [B, P] (True for real prompt tokens)
    return_attn: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Full causal self-attention over a (padded) prompt.

    Rows attend causally; padded key columns are masked out. When ``attn`` is
    not needed this routes to a fused flash kernel on TPU; the math path is the
    fallback (and the only path that can return probabilities — same dispatch
    contract as the reference, attention_utils.py:26-35).
    """
    B, H, P, D = q.shape
    if not return_attn:
        flash = _maybe_flash(q, k, v, valid)
        if flash is not None:
            return flash, None
    causal = jnp.tril(jnp.ones((P, P), dtype=bool))
    mask = causal[None, None, None] & valid[:, None, None, None, :]
    return gqa_attention(q, k, v, mask=mask, return_attn=return_attn)


def _maybe_flash(q, k, v, valid):
    """Fused flash attention via the JAX-shipped Pallas TPU kernel.

    Returns None if unavailable (non-TPU backend or unsupported shape), in
    which case the caller falls back to the XLA einsum path.
    """
    if jax.default_backend() not in ("tpu",):
        return None
    B, H, P, D = q.shape
    KVH = k.shape[1]
    if P % 128 != 0 or D % 128 != 0:
        return None
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention,
        )

        G = H // KVH
        if G > 1:
            k = jnp.repeat(k, G, axis=1)
            v = jnp.repeat(v, G, axis=1)
        # Padded key positions are excluded via a large-negative additive bias.
        bias = jnp.where(valid[:, None, None, :], 0.0, NEG_INF).astype(
            jnp.float32
        )
        return flash_attention(
            q.astype(jnp.float32),
            k.astype(jnp.float32),
            v.astype(jnp.float32),
            ab=jnp.broadcast_to(bias, (B, H, P, P)),
            causal=True,
            sm_scale=1.0 / math.sqrt(D),
        ).astype(q.dtype)
    except Exception:
        return None
