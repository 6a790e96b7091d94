"""Heavy-hitter (ScissorHands / H2O-style) cache strategy.

Evicts the token with the lowest windowed average attention
(reference: cache.py:615-765). The attention history lives in the cache state
as two buffers — a numerator of (optionally thresholded) attention mass per
slot and a denominator counting observations — updated after every attention
call and zeroed at evicted slots.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import (
    CacheSpec,
    CacheState,
    CacheStrategy,
    gather_scalar,
    scatter_scalar,
)


class HeavyHitterCache(CacheStrategy):
    name = "heavy_hitter"
    head_specific = True
    needs_attn = True
    relevant_kwargs = [
        "max_cache_length",
        "max_seq_length",
        "cache_bits",
        "global_tokens",
        "history_window_size",
        "recent_window",
        "attn_thresholding",
    ]

    @staticmethod
    def init_extra(spec, B, H, D):
        C, W = spec.max_cache_length, spec.history_window_size
        extra = {
            # W == 1 accumulates the full history in a single slot
            # (reference: cache.py:660-667,718-721); W > 1 keeps a ring of the
            # last W observations.
            "attn_num": jnp.zeros(
                (B, H, C) if W == 1 else (B, H, C, W), jnp.float32
            ),
            "attn_denom": jnp.zeros((B, H, C), jnp.int32),
            "attn_counter": jnp.zeros((), jnp.int32),
        }
        return extra

    # ---- eviction (reference: cache.py:725-765) ---------------------------

    @classmethod
    def eviction_idx(cls, spec, state, input_pos):
        W = spec.history_window_size

        from ..ops.pallas_evict import fused_evict_supported, fused_hh_evict

        if fused_evict_supported(spec, state):
            # One Pallas pass replaces the ~10 dependent XLA ops below
            # (score, protect, argmin, zero-at-idx) — the ops are tiny in
            # bytes but each costs a sequencing slot in the decode step.
            B = state.pos.shape[0]
            ipos = jnp.broadcast_to(
                jnp.asarray(input_pos).reshape(B, -1)[:, 0], (B,)
            )
            from ..ops.pallas_qmm import force_interpret

            idx, num2, denom2 = fused_hh_evict(
                state.extra["attn_num"],
                state.extra["attn_denom"],
                state.pos,
                ipos,
                global_tokens=int(spec.global_tokens),
                recent_window=int(spec.recent_window),
                interpret=force_interpret(),
            )
            new_extra = dict(state.extra)
            new_extra["attn_num"] = num2
            new_extra["attn_denom"] = denom2
            return idx, state.replace(extra=new_extra)

        num = (
            state.extra["attn_num"]
            if W == 1
            else jnp.sum(state.extra["attn_num"], axis=-1)
        )
        denom = (
            jnp.maximum(state.extra["attn_denom"], 1)
            if W == 1
            else jnp.clip(state.extra["attn_denom"], 1, W)
        )
        avg_attn = num / denom.astype(jnp.float32)

        protected = jnp.logical_or(
            state.pos < spec.global_tokens,
            state.pos >= input_pos - spec.recent_window,
        )
        avg_attn = jnp.where(protected, 1.0, avg_attn)
        avg_attn = jnp.where(state.pos == -1, 0.0, avg_attn)
        idx = jnp.argmin(avg_attn, axis=-1).astype(jnp.int32)

        # Zero the attention history of the newly claimed slot.
        new_extra = dict(state.extra)
        if W == 1:
            new_extra["attn_num"] = scatter_scalar(
                state.extra["attn_num"], idx, 0.0
            )
        else:
            b = jnp.arange(idx.shape[0])[:, None]
            h = jnp.arange(idx.shape[1])[None, :]
            new_extra["attn_num"] = (
                state.extra["attn_num"].at[b, h, idx].set(0.0)
            )
        new_extra["attn_denom"] = scatter_scalar(
            state.extra["attn_denom"], idx, 0
        )
        return idx, state.replace(extra=new_extra)

    # ---- history update (reference: cache.py:690-723) ---------------------

    @classmethod
    def update_state(
        cls, spec, state, input_pos, attn, is_prefill, prompt_len=None
    ):
        """Insert the latest attention observation.

        ``attn`` is a [B, KVH, C]-aligned per-slot attention summary: during
        decode, the (GQA-pooled) probabilities over cache slots; during
        prefill, the query-averaged per-kept-token attention produced by the
        model layer / prompt compressor.
        """
        if attn is None:
            return state
        W = spec.history_window_size
        attn = attn.astype(jnp.float32)
        C = state.pos.shape[-1]
        if attn.shape[-1] < C:
            attn = jnp.pad(attn, [(0, 0), (0, 0), (0, C - attn.shape[-1])])

        if spec.attn_thresholding:
            uniform = 1.0 / jnp.maximum(
                state.cache_ct.astype(jnp.float32), 1.0
            )
            attn = (attn >= uniform[..., None]).astype(jnp.float32)

        new_extra = dict(state.extra)
        if W == 1:
            new_extra["attn_num"] = state.extra["attn_num"] + attn
        else:
            slot = state.extra["attn_counter"] % W
            new_extra["attn_num"] = (
                state.extra["attn_num"].at[:, :, :, slot].set(attn)
            )
        new_extra["attn_denom"] = state.extra["attn_denom"] + 1
        new_extra["attn_counter"] = state.extra["attn_counter"] + 1
        return state.replace(extra=new_extra)
