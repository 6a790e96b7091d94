"""Prompt compression: prefill-time eviction when |prompt| > cache budget.

TPU-native re-design of the reference's ``PromptCompressor`` hierarchy
(reference: prompt_compression.py:5-247). All compressors are pure functions
over static-shape (padded) prompts: token priorities are computed per head,
invalid (padded) tokens get -inf priority, and a top-``budget`` + ascending
sort produces the kept indices — one static graph covers both the
"needs compression" and "prompt fits" cases.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)
BIG = 1e9


class PromptCompressorBase:
    name = "abstract"
    head_specific = False
    needs_attn = False

    @staticmethod
    def token_importances(spec, input_pos, k, v, prompt_len, summary=None):
        """Return priority [B, KVH or 1, P] (higher = keep).

        ``summary`` is the prefill attention summary dict
        (ops/attention.py ``AttnSummary``) when the compressor needs it.
        """
        raise NotImplementedError


def _plen_b(prompt_len):
    """Per-lane prompt lengths as a broadcastable [B or 1, 1, 1] column."""
    return jnp.atleast_1d(jnp.asarray(prompt_len, jnp.int32))[:, None, None]


def _recent_global_save_mask(spec, input_pos, prompt_len):
    """Tokens never dropped: global prefix + recent window, per lane
    (reference: prompt_compression.py:14-19). Returns bool [B or 1, 1, P]."""
    plen = _plen_b(prompt_len)
    return jnp.logical_or(
        input_pos[None, None, :] < spec.global_tokens,
        input_pos[None, None, :] >= plen - spec.recent_window,
    )


class PromptCompressorFull(PromptCompressorBase):
    """Pass-through (reference: prompt_compression.py:91-106)."""

    name = "full"


class PromptCompressorRandom(PromptCompressorBase):
    """Keep global+recent, random selection elsewhere
    (reference: prompt_compression.py:109-125)."""

    name = "random"

    @staticmethod
    def token_importances(spec, input_pos, k, v, prompt_len, summary=None):
        P = input_pos.shape[-1]
        key = jax.random.fold_in(
            jax.random.PRNGKey(1234), jnp.sum(jnp.asarray(prompt_len))
        )
        noise = jax.random.uniform(key, (P,))
        save = _recent_global_save_mask(spec, input_pos, prompt_len)
        return jnp.where(save, BIG, noise[None, None, :])


class PromptCompressorRecentGlobal(PromptCompressorBase):
    """Keep the most recent ``budget - global_tokens`` tokens plus the global
    prefix (reference: prompt_compression.py:128-145)."""

    name = "recent_global"

    @staticmethod
    def token_importances(spec, input_pos, k, v, prompt_len, summary=None):
        priority = jnp.where(
            input_pos < spec.global_tokens, BIG, input_pos.astype(jnp.float32)
        )
        return priority[None, None, :]


class PromptCompressorL2(PromptCompressorBase):
    """Keep low-L2-norm keys (reference: prompt_compression.py:197-209)."""

    name = "l2"
    head_specific = True

    @staticmethod
    def token_importances(spec, input_pos, k, v, prompt_len, summary=None):
        priority = -jnp.linalg.norm(k.astype(jnp.float32), axis=-1)
        save = _recent_global_save_mask(spec, input_pos, prompt_len)
        return jnp.where(save, BIG, priority)


class PromptCompressorKeepItOdd(PromptCompressorBase):
    """Toy: prefer odd positions (reference: prompt_compression.py:212-230)."""

    name = "keep_it_odd"

    @staticmethod
    def token_importances(spec, input_pos, k, v, prompt_len, summary=None):
        P = input_pos.shape[-1]
        priority = input_pos.astype(jnp.float32)
        priority = jnp.where(input_pos % 2 == 0, priority - 2.0 * P, priority)
        save = _recent_global_save_mask(spec, input_pos, prompt_len)
        return jnp.where(save, BIG, priority[None, None, :])


class PromptCompressorHeavyHitter(PromptCompressorBase):
    """SnapKV: score prompt tokens by pooled attention from an observation
    window of trailing queries (reference: prompt_compression.py:148-194,
    following arXiv:2404.14469).
    """

    name = "heavy_hitter"
    head_specific = True
    needs_attn = True
    kernel_size = 5
    observation_len = 16

    @classmethod
    def token_importances(cls, spec, input_pos, k, v, prompt_len, summary=None):
        assert summary is not None, "SnapKV needs the prefill attention summary"
        plen = _plen_b(prompt_len)  # [B or 1, 1, 1]
        obs_len = jnp.minimum(cls.observation_len, plen)
        # summary['obs_mean']: mean attention from the last obs_len valid
        # queries, streamed during prefill (never materializes the P x P map).
        priority = summary["obs_mean"]  # [B, KVH, P]
        priority = _avg_pool_1d(priority, cls.kernel_size)
        # Force-keep the observation window and the global prefix (per lane).
        ip = input_pos[None, None, :]
        keep = jnp.logical_or(
            jnp.logical_and(ip >= plen - obs_len, ip < plen),
            ip < spec.global_tokens,
        )
        return jnp.where(keep, BIG, priority)


def _avg_pool_1d(x: jax.Array, kernel: int) -> jax.Array:
    """Same-shape average pooling along the last axis with edge-corrected
    counts (torch AvgPool1d(count_include_pad=False) semantics, reference:
    prompt_compression.py:160-168)."""
    half = kernel // 2
    P = x.shape[-1]
    padded = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(half, half)])
    csum = jnp.cumsum(padded, axis=-1)
    csum = jnp.pad(csum, [(0, 0)] * (x.ndim - 1) + [(1, 0)])
    window_sum = (
        jax.lax.dynamic_slice_in_dim(csum, kernel, P, axis=-1)
        - jax.lax.dynamic_slice_in_dim(csum, 0, P, axis=-1)
    )
    idx = jnp.arange(P)
    counts = jnp.minimum(idx + half, P - 1) - jnp.maximum(idx - half, 0) + 1
    return window_sum / counts.astype(x.dtype)


PROMPT_COMPRESSORS = {
    c.name: c
    for c in [
        PromptCompressorFull,
        PromptCompressorRandom,
        PromptCompressorRecentGlobal,
        PromptCompressorL2,
        PromptCompressorKeepItOdd,
        PromptCompressorHeavyHitter,
    ]
}


def get_prompt_compressor(strategy: str):
    """Registry lookup (reference: prompt_compression.py:233-247)."""
    if strategy not in PROMPT_COMPRESSORS:
        raise ValueError(f"Unknown prompt compression strategy: {strategy}")
    return PROMPT_COMPRESSORS[strategy]


def compress_prompt(
    compressor,
    spec,
    input_pos: jax.Array,  # [P]
    k: jax.Array,  # [B, KVH, P, D]
    v: jax.Array,
    valid: jax.Array,  # bool [B, P]
    prompt_len: jax.Array,  # scalar
    summary=None,  # AttnSummary dict if compressor.needs_attn
):
    """Score, select, and gather the kept prompt tokens.

    Returns ``(keep_pos [B,KVH,C], k' [B,KVH,C,D], v', keep_valid [B,KVH,C],
    kept_attn [B,KVH,C] | None)`` where C = spec.max_cache_length.
    Mirrors reference prompt_compression.py:28-43 with static shapes: if fewer
    than C valid tokens exist, padded picks carry ``keep_valid=False``.
    """
    B, KVH, P, D = k.shape
    C = spec.max_cache_length
    priority = compressor.token_importances(
        spec, input_pos, k, v, prompt_len, summary=summary
    )
    priority = jnp.broadcast_to(priority, (B, KVH, P)).astype(jnp.float32)
    priority = jnp.where(valid[:, None, :], priority, NEG_INF)

    _, keep_idx = jax.lax.top_k(priority, C)  # [B, KVH, C]
    keep_idx = jnp.sort(keep_idx, axis=-1)  # ascending original order

    keep_pos = jnp.take_along_axis(
        jnp.broadcast_to(input_pos[None, None, :], (B, KVH, P)), keep_idx, -1
    )
    keep_valid = jnp.take_along_axis(
        jnp.broadcast_to(valid[:, None, :], (B, KVH, P)), keep_idx, -1
    )
    k_out = jnp.take_along_axis(k, keep_idx[..., None], axis=2)
    v_out = jnp.take_along_axis(v, keep_idx[..., None], axis=2)

    kept_attn = None
    if summary is not None:
        # Seed for the heavy-hitter attention history: query-averaged mass of
        # each kept token (reference: prompt_compression.py:189-194).
        kept_attn = jnp.take_along_axis(summary["cum_mean"], keep_idx, axis=-1)
        kept_attn = jnp.where(keep_valid, kept_attn, 0.0)
    return keep_pos, k_out, v_out, keep_valid, kept_attn
