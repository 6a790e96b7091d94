"""Attention-loss analysis cache (``debug_<strategy>``).

TPU-native counterpart of the reference ``KVCacheAnalysis``
(reference: cache.py:1291-1420): attention runs over a FULL cache while a
shadow compressed cache follows along; each decode step records the attention
mass lost to the shadow cache's evictions
(loss = 1 - sum of attention probabilities of surviving tokens,
reference: cache.py:1401-1405). Doubles as a built-in oracle for tests.

The shadow cache state is nested inside the outer state's ``extra`` dict
(pytrees compose), so the whole ensemble jits and donates like any other
cache.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import CacheSpec, CacheState, init_state
from .prompt_compression import compress_prompt, get_prompt_compressor
from .strategies import FullCache

_ANALYSIS_CACHE = {}


def make_analysis_strategy(inner_name: str):
    """Build (and memoize) an analysis strategy class wrapping
    ``inner_name`` (reference: cache.py:1460-1474)."""
    if inner_name in _ANALYSIS_CACHE:
        return _ANALYSIS_CACHE[inner_name]
    from . import get_cache_strategy

    inner = get_cache_strategy(inner_name)

    class AnalysisCache(FullCache):
        name = f"debug_{inner_name}"
        head_specific = inner.head_specific
        # Attention probabilities are always needed to measure the loss.
        needs_attn = True
        relevant_kwargs = [
            "max_cache_length",
            "max_seq_length",
            "cache_bits",
            "history_window_size",
            "recent_window",
            "attn_thresholding",
            "global_tokens",
            "prompt_compression_strategy",
        ]
        inner_strategy = inner

        # ---- construction -------------------------------------------------

        @classmethod
        def init(cls, spec, batch_size, n_kv_heads, head_dim, dtype=jnp.bfloat16):
            # Outer cache is a full cache over the whole sequence
            # (reference: cache.py:1318-1324); the user's budget configures
            # the shadow.
            outer_spec = CacheSpec(
                cache_strategy=cls.name,
                max_cache_length=spec.max_seq_length,
                max_seq_length=spec.max_seq_length,
                global_tokens=0,
                prompt_compression_strategy=spec.prompt_compression_strategy,
            )
            inner_spec = CacheSpec(
                **{
                    **{
                        f.name: getattr(spec, f.name)
                        for f in spec.__dataclass_fields__.values()
                    },
                    "cache_strategy": inner_name,
                }
            )
            shadow = inner.init(
                inner_spec, batch_size, n_kv_heads, head_dim, dtype
            )
            state = init_state(
                outer_spec, batch_size, n_kv_heads, head_dim, dtype
            )
            extra = dict(state.extra)
            extra["shadow"] = shadow
            extra["attention_losses"] = jnp.full(
                (spec.max_seq_length,), -1.0, jnp.float32
            )
            extra["attention_loss_ctr"] = jnp.zeros((), jnp.int32)
            return state.replace(extra=extra)

        @classmethod
        def reset_extra(cls, spec, extra):
            """Restore the -1 "unwritten" sentinel in the loss buffer on
            reset (zeros would read as real losses)."""
            extra["attention_losses"] = jnp.full_like(
                extra["attention_losses"], -1.0
            )
            return extra

        # ---- decode -------------------------------------------------------

        @classmethod
        def decode_update(cls, state, input_pos, k, v, token=None):
            shadow = state.extra["shadow"]
            shadow, _, _, _ = inner.decode_update(
                shadow, input_pos, k, v, token=token
            )
            extra = dict(state.extra)
            extra["shadow"] = shadow
            state = state.replace(extra=extra)
            # Outer full-cache append; attention runs over the full cache.
            return super().decode_update(state, input_pos, k, v, token=token)

        @classmethod
        def update_state(
            cls, spec, state, input_pos, attn, is_prefill=False,
            prompt_len=None,
        ):
            if attn is None:
                return state
            shadow = state.extra["shadow"]
            extra = dict(state.extra)
            if is_prefill:
                # Shadow prefill state (compression handled in post_prefill);
                # no loss recorded during prefill — full and compressed
                # prefill attentions are identical
                # (reference: cache.py:1387-1390).
                return state
            # Gather the full-cache attention at the shadow's kept positions
            # (reference: cache.py:1391-1399). Unfilled slots (-1) index the
            # final slot, which holds ~zero attention.
            C_full = attn.shape[-1]
            idx = jnp.where(shadow.pos == -1, C_full - 1, shadow.pos)
            attn_c = jnp.take_along_axis(attn, idx, axis=-1)
            attn_c = jnp.where(shadow.pos == -1, 0.0, attn_c)
            shadow = inner.update_state(
                shadow.spec, shadow, input_pos, attn_c, is_prefill=False
            )
            loss = jnp.mean(1.0 - jnp.sum(attn_c, axis=-1))
            ctr = state.extra["attention_loss_ctr"]
            extra["shadow"] = shadow
            extra["attention_losses"] = state.extra["attention_losses"].at[
                ctr
            ].set(loss)
            extra["attention_loss_ctr"] = ctr + 1
            return state.replace(extra=extra)

        # ---- prefill ------------------------------------------------------

        @classmethod
        def post_prefill(
            cls, spec, state, k, v, summary, input_pos, valid, prompt_len,
            tokens=None,
        ):
            """Fill the shadow cache after the outer full fill, compressing
            the prompt with the configured compressor if it exceeds the
            shadow budget (reference: cache.py:1355-1390)."""
            from .base import prefill_update

            shadow = state.extra["shadow"]
            sspec = shadow.spec
            P = k.shape[2]
            if sspec.max_cache_length < P:
                compressor = get_prompt_compressor(
                    sspec.prompt_compression_strategy
                )
                keep_pos, k_c, v_c, keep_valid, kept_attn = compress_prompt(
                    compressor, sspec, input_pos, k, v, valid, prompt_len,
                    summary=summary,
                )
                shadow = prefill_update(
                    inner, shadow, keep_pos, k_c, v_c, keep_valid
                )
                if kept_attn is None and summary is not None:
                    kept_attn = jnp.take_along_axis(
                        summary["cum_mean"], keep_pos, axis=-1
                    )
            else:
                shadow = prefill_update(
                    inner,
                    shadow,
                    input_pos[None, None, :],
                    k,
                    v,
                    valid[:, None, :],
                )
                kept_attn = (
                    summary["cum_mean"] if summary is not None else None
                )
            shadow = inner.update_state(
                sspec, shadow, input_pos, kept_attn, is_prefill=True,
                prompt_len=prompt_len,
            )
            extra = dict(state.extra)
            extra["shadow"] = shadow
            return state.replace(extra=extra)

    AnalysisCache.__name__ = f"AnalysisCache_{inner_name}"
    _ANALYSIS_CACHE[inner_name] = AnalysisCache
    return AnalysisCache
