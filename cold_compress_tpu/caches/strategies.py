"""Built-in cache strategies: full, random, recent_global, l2, keep_it_odd.

Each mirrors the eviction semantics of its reference counterpart
(reference: cache.py:493-613,1423-1441) as pure score/index functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import (
    CacheSpec,
    CacheState,
    CacheStrategy,
    NEG_INF,
    POS_INF,
    scatter_scalar,
)


class FullCache(CacheStrategy):
    """Append-only cache sized to the full sequence (reference: cache.py:493-502)."""

    name = "full"
    relevant_kwargs = ["max_cache_length", "max_seq_length", "cache_bits"]

    @classmethod
    def eviction_idx(cls, spec, state, input_pos):
        # First unfilled slot: argmin over pos (-1 slots sort first; ties pick
        # the lowest index). Matches reference cache.py:500-502.
        idx = jnp.argmin(state.pos, axis=-1).astype(jnp.int32)
        return idx, state


class RecentGlobalCache(CacheStrategy):
    """Sliding window + attention sinks (reference: cache.py:527-556).

    Evicts the oldest non-global token: argmin of pos over slots past the
    global-token prefix.
    """

    name = "recent_global"
    relevant_kwargs = [
        "max_cache_length",
        "max_seq_length",
        "cache_bits",
        "global_tokens",
    ]

    @classmethod
    def eviction_idx(cls, spec, state, input_pos):
        g = spec.global_tokens
        idx = (
            jnp.argmin(state.pos[:, :, g:], axis=-1).astype(jnp.int32) + g
        )
        return idx, state


class RandomCache(CacheStrategy):
    """Random eviction outside the recent window (reference: cache.py:505-524).

    Randomness comes from a counter-based PRNG stored in the state (the
    reference draws from the global torch RNG each step); identical scores are
    broadcast across heads so evictions stay head-constant.
    """

    name = "random"
    relevant_kwargs = [
        "max_cache_length",
        "max_seq_length",
        "cache_bits",
        "global_tokens",
        "recent_window",
    ]

    @staticmethod
    def init_extra(spec, B, H, D):
        return {"rng_counter": jnp.zeros((), jnp.int32)}

    @classmethod
    def eviction_idx(cls, spec, state, input_pos):
        C = state.pos.shape[-1]
        key = jax.random.fold_in(
            jax.random.PRNGKey(1234), state.extra["rng_counter"]
        )
        scores = jax.random.uniform(key, (1, 1, C))
        scores = jnp.where(
            state.pos >= input_pos - spec.recent_window, POS_INF, scores
        )
        slot = jnp.arange(C)
        scores = jnp.where(slot < spec.global_tokens, POS_INF, scores)
        scores = jnp.where(state.pos == -1, NEG_INF, scores)
        idx = jnp.argmin(scores, axis=-1).astype(jnp.int32)
        new_extra = dict(state.extra)
        new_extra["rng_counter"] = state.extra["rng_counter"] + 1
        return idx, state.replace(extra=new_extra)


class L2Cache(CacheStrategy):
    """Evict the key with the highest L2 norm (reference: cache.py:559-612).

    Low-norm keys are treated as important (arXiv:2406.11430); a recent window
    is always protected. Head-specific.
    """

    name = "l2"
    head_specific = True
    relevant_kwargs = [
        "max_cache_length",
        "max_seq_length",
        "cache_bits",
        "global_tokens",
        "recent_window",
    ]

    @staticmethod
    def init_extra(spec, B, H, D):
        return {
            "key_norm": jnp.zeros((B, H, spec.max_cache_length), jnp.float32)
        }

    @staticmethod
    def token_importances(spec, state, input_pos):
        key_norm = state.extra["key_norm"]
        scores = jnp.max(key_norm) - key_norm
        return jnp.where(
            state.pos >= input_pos - spec.recent_window, POS_INF, scores
        )

    @classmethod
    def on_decode_fill(cls, spec, state, idx, input_pos, k_row, v_row):
        norm = jnp.linalg.norm(k_row.astype(jnp.float32), axis=-1)  # [B,H]
        new_extra = dict(state.extra)
        new_extra["key_norm"] = scatter_scalar(
            state.extra["key_norm"], idx, norm
        )
        return state.replace(extra=new_extra)

    @classmethod
    def on_prefill_fill(cls, spec, state, input_pos, k, v, valid):
        P = k.shape[2]
        norms = jnp.linalg.norm(k.astype(jnp.float32), axis=-1)  # [B,H,P]
        norms = jnp.where(valid, norms, 0.0)
        new_extra = dict(state.extra)
        new_extra["key_norm"] = (
            state.extra["key_norm"].at[:, :, :P].set(norms)
        )
        return state.replace(extra=new_extra)


class KeepItOddCache(CacheStrategy):
    """Toy strategy keeping odd positions (reference: cache.py:1423-1441)."""

    name = "keep_it_odd"
    relevant_kwargs = [
        "max_cache_length",
        "max_seq_length",
        "cache_bits",
        "global_tokens",
        "recent_window",
    ]

    @staticmethod
    def token_importances(spec, state, input_pos):
        scores = jnp.where(state.pos % 2 == 1, 1.0, 0.0)
        return jnp.where(
            state.pos >= input_pos - spec.recent_window, POS_INF, scores
        )
