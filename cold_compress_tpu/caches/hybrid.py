"""FastGen-style hybrid cache: per-head compression policies chosen by
profiling the prompt's attention.

TPU-native redesign of the reference ``KVCacheHybrid`` (reference:
cache.py:768-1289, following arXiv:2310.01801). The reference loops over heads
in Python at every decode step and therefore cannot compile
(cache.py:129-132 asserts compile=False); here the per-head policy is a traced
integer index into a *static* strategy menu, every policy-dependent quantity
(budgets, save masks, eviction scores) is computed as a vectorized gather, and
the whole thing jits — profiling, decode eviction, and all.

Policy menu entries (YAML ``hybrid_strategies``) combine components:
  special        keep special tokens (chat/control ids)
  punc           keep punctuation tokens
  window         keep a recent window (fraction of the cache length)
  heavy_hitter   keep the top-attention-mass tokens (fraction)
  full           keep everything
A head is assigned the first menu entry whose kept-token set recovers at least
``min_recovery_frac`` of its prompt attention mass (reference:
cache.py:1171-1174).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .base import (
    CacheSpec,
    CacheState,
    gather_scalar,
    input_pos_b11,
    scatter_scalar,
    store_kv_rows,
)
from .heavy_hitter import HeavyHitterCache

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


@dataclass(frozen=True)
class HybridStrategy:
    strategy: str
    recent_window: float = 0.0
    heavy_hitter_frac: float = 0.0

    @property
    def has(self):
        return lambda comp: comp in self.strategy


def normalize_hybrid_strategies(entries) -> Tuple[HybridStrategy, ...]:
    """YAML list-of-dicts -> hashable menu tuple."""
    out = []
    for e in entries:
        if isinstance(e, HybridStrategy):
            out.append(e)
        else:
            out.append(
                HybridStrategy(
                    strategy=e["strategy"],
                    recent_window=float(e.get("recent_window", 0.0)),
                    heavy_hitter_frac=float(e.get("heavy_hitter_frac", 0.0)),
                )
            )
    return tuple(out)


def _menu_tables(spec: CacheSpec):
    """Static per-strategy component tables gathered by the per-head index."""
    menu = spec.hybrid_strategies
    assert menu, "hybrid cache requires a hybrid_strategies menu"
    C = spec.max_cache_length

    def tab(fn, dtype=jnp.float32):
        return jnp.asarray([fn(s) for s in menu], dtype)

    return {
        "has_special": tab(lambda s: "special" in s.strategy, jnp.bool_),
        "has_punc": tab(lambda s: "punc" in s.strategy, jnp.bool_),
        "has_window": tab(lambda s: "window" in s.strategy, jnp.bool_),
        "has_hh": tab(lambda s: "heavy_hitter" in s.strategy, jnp.bool_),
        "is_full": tab(lambda s: s.strategy == "full", jnp.bool_),
        "window_len": tab(
            lambda s: round(s.recent_window * C)
            if "window" in s.strategy
            else 0,
            jnp.int32,
        ),
        "hh_budget": tab(
            lambda s: round(s.heavy_hitter_frac * C)
            if "heavy_hitter" in s.strategy
            else 0,
            jnp.int32,
        ),
    }


def _special_token_mask(spec: CacheSpec, tokens: jax.Array) -> jax.Array:
    """Mark tokens that are (part of) a special-token sequence
    (reference: cache.py:1021-1034 — nested-tensor loop, here static unrolled
    subsequence matching)."""
    B, P = tokens.shape
    mask = jnp.zeros((B, P), bool)
    for seq in spec.token_ids_special:
        L = len(seq)
        if L == 1:
            mask = mask | (tokens == seq[0])
        else:
            hit = jnp.ones((B, P - L + 1), bool)
            for j, tid in enumerate(seq):
                hit = hit & (tokens[:, j : P - L + 1 + j] == tid)
            for j in range(L):
                mask = mask.at[:, j : P - L + 1 + j].max(hit)
    return mask


def _punc_token_mask(spec: CacheSpec, tokens: jax.Array) -> jax.Array:
    if not spec.token_ids_punc:
        return jnp.zeros(tokens.shape, bool)
    punc = jnp.asarray(spec.token_ids_punc, jnp.int32)
    return jnp.isin(tokens, punc)


class HybridCache(HeavyHitterCache):
    name = "hybrid"
    head_specific = True
    relevant_kwargs = [
        "max_cache_length",
        "max_seq_length",
        "cache_bits",
        "global_tokens",
        "min_recovery_frac",
        "hybrid_strategies",
    ]

    # needs_attn is static-conservative: decode records attention history iff
    # any menu entry uses heavy hitters (the reference narrows this at runtime
    # after profiling, cache.py:1209-1214).
    @classmethod
    def menu_needs_attn(cls, spec):
        return any("heavy_hitter" in s.strategy for s in spec.hybrid_strategies)

    @staticmethod
    def init_extra(spec, B, H, D):
        C = spec.max_cache_length
        extra = HeavyHitterCache.init_extra(spec, B, H, D)
        extra.update(
            {
                "strategy_idx": jnp.zeros((B, H), jnp.int32),
                "special_mask": jnp.zeros((B, H, C), bool),
                "punc_mask": jnp.zeros((B, H, C), bool),
                "num_special": jnp.zeros((B,), jnp.int32),
                "num_punc": jnp.zeros((B,), jnp.int32),
            }
        )
        return extra

    # ------------------------------------------------------------------
    # Prefill: profile heads, pick per-head policies, fill reordered cache
    # (reference: cache.py:1138-1272)
    # ------------------------------------------------------------------

    @classmethod
    def profile_prefill(
        cls,
        spec: CacheSpec,
        state: CacheState,
        q: jax.Array,  # [B, H, P, D]
        k: jax.Array,  # [B, KVH, P, D]
        v: jax.Array,
        tokens: jax.Array,  # [B, P]
        input_pos: jax.Array,  # [P]
        valid: jax.Array,  # [B, P]
        prompt_len: jax.Array,  # scalar
    ) -> CacheState:
        cum, wcols = _profile_partial(spec, q, k, prompt_len)
        return cls.fill_after_profile(
            spec, state, cum, wcols, k, v, tokens, input_pos, valid,
            prompt_len,
        )

    @classmethod
    def profile_prefill_with_attn(
        cls, spec, state, q, k, v, tokens, input_pos, valid, prompt_len
    ):
        """Fused prefill-attention + profiling: returns (y, state).

        On TPU-shaped inputs the flash profile kernel computes the
        attention output AND the profile accumulators in one VMEM-resident
        pass (ops/pallas_prefill.py::flash_profile — the XLA profile pass
        materializes ~P²-sized f32 probability chunks in HBM; hybrid
        prefill measured 157 vs 6.9k tok/s in r4 batch A). Elsewhere falls
        back to the streaming XLA pass."""
        from ..ops.attention import prefill_attention
        from ..ops.pallas_prefill import flash_profile, flash_prefill_supported
        from ..ops.pallas_qmm import force_interpret

        _, uniq_w = _profile_windows(spec, k.shape[2])
        if flash_prefill_supported(q.shape) or force_interpret():
            y, cum, wcols = flash_profile(
                q, k, v, prompt_len, window_lens=tuple(uniq_w),
                interpret=force_interpret(),
            )
        else:
            y, _ = prefill_attention(q, k, v, valid, prompt_len)
            cum, wcols = _profile_partial(spec, q, k, prompt_len)
        state = cls.fill_after_profile(
            spec, state, cum, wcols, k, v, tokens, input_pos, valid,
            prompt_len,
        )
        return y, state

    @classmethod
    def fill_after_profile(
        cls,
        spec: CacheSpec,
        state: CacheState,
        cum: jax.Array,  # [B, KVH, P] profile accumulators (psum'ed if SP)
        wcols: jax.Array,  # [W, B, KVH, P]
        k: jax.Array,  # [B, KVH, P, D] FULL-sequence keys
        v: jax.Array,
        tokens: jax.Array,  # [B, P] full token ids
        input_pos: jax.Array,  # [P]
        valid: jax.Array,  # [B, P]
        prompt_len: jax.Array,
    ) -> CacheState:
        """Replicated tail of profiling: menu scoring, per-head policy pick,
        keep-mask build, and the reordered cache fill. Sequence-parallel
        prefill psums the _profile_partial accumulators across the 'sp'
        axis and calls this on every device (parallel/sp.py)."""
        B, KVH, P, D = k.shape
        C = spec.max_cache_length
        assert C >= P, "hybrid requires max_cache_length = full sequence"

        special = _special_token_mask(spec, tokens) & valid  # [B, P]
        punc = _punc_token_mask(spec, tokens) & valid
        num_special = jnp.sum(special, axis=-1).astype(jnp.int32)
        num_punc = jnp.sum(punc, axis=-1).astype(jnp.int32)

        cum_attn, scores = _profile_finalize(
            spec, cum, wcols, valid, prompt_len, special, punc
        )  # cum_attn [B,KVH,P]; scores [S,B,KVH]

        # First menu entry recovering >= min_recovery_frac; falls back to
        # entry 0 when none qualifies (reference argmax semantics,
        # cache.py:1171-1174).
        qualifies = (scores >= spec.min_recovery_frac).astype(jnp.int32)
        strategy_idx = jnp.argmax(qualifies, axis=0).astype(jnp.int32)

        # Build the fill-time keep mask per head using total_len = C
        # (reference: cache.py:1177-1186 rebuilds masks with the cache length).
        keep = _keep_mask_for_filling(
            spec, strategy_idx, cum_attn, special, punc, input_pos, valid,
            prompt_len,
        )  # [B, KVH, P] bool

        # Order: kept-valid first (original order), then unkept valid, pads
        # last. Stable sort on a composite key.
        sort_key = (
            keep.astype(jnp.int32) * 2 + valid[:, None, :].astype(jnp.int32)
        )
        order = jnp.argsort(-sort_key, axis=-1, stable=True)  # [B,KVH,P]

        k_o = jnp.take_along_axis(k, order[..., None], axis=2)
        v_o = jnp.take_along_axis(v, order[..., None], axis=2)
        pos_o = jnp.take_along_axis(
            jnp.broadcast_to(input_pos[None, None, :], (B, KVH, P)), order, -1
        )
        keep_o = jnp.take_along_axis(keep, order, axis=-1)
        special_o = jnp.take_along_axis(
            jnp.broadcast_to(special[:, None, :], (B, KVH, P)), order, -1
        )
        punc_o = jnp.take_along_axis(
            jnp.broadcast_to(punc[:, None, :], (B, KVH, P)), order, -1
        )
        cum_o = jnp.take_along_axis(cum_attn, order, axis=-1)

        cache_ct = jnp.sum(keep_o, axis=-1).astype(jnp.int32)  # [B, KVH]
        slot = jnp.arange(P)
        live = slot[None, None, :] < cache_ct[..., None]  # [B,KVH,P]

        from .base import store_kv_prefix

        state = store_kv_prefix(state, k_o, v_o)
        state = state.replace(
            pos=state.pos.at[:, :, :P].set(jnp.where(live, pos_o, -1)),
            mask=state.mask.at[:, :, :P].set(live),
            cache_ct=cache_ct,
        )
        new_extra = dict(state.extra)
        new_extra["strategy_idx"] = strategy_idx
        new_extra["special_mask"] = state.extra["special_mask"].at[
            :, :, :P
        ].set(special_o & live)
        new_extra["punc_mask"] = state.extra["punc_mask"].at[:, :, :P].set(
            punc_o & live
        )
        new_extra["num_special"] = num_special
        new_extra["num_punc"] = num_punc
        state = state.replace(extra=new_extra)

        if cls.menu_needs_attn(spec):
            seeded = jnp.where(live, cum_o, 0.0)
            state = HeavyHitterCache.update_state(
                spec, state, input_pos, seeded, is_prefill=True,
                prompt_len=prompt_len,
            )
        return state

    # ------------------------------------------------------------------
    # Decode: vectorized per-head insert/evict (reference: cache.py:965-1019)
    # ------------------------------------------------------------------

    @classmethod
    def decode_update(cls, state: CacheState, input_pos, k, v, token=None):
        spec = state.spec
        B, KVH, _, D = k.shape
        C = spec.max_cache_length
        input_pos = input_pos_b11(input_pos, B)  # [B,1,1], per-lane positions
        tables = _menu_tables(spec)
        sidx = state.extra["strategy_idx"]  # [B, KVH]

        def gat(name):
            return tables[name][sidx]  # [B, KVH]

        has_special = gat("has_special")
        has_punc = gat("has_punc")
        has_window = gat("has_window")
        has_hh = gat("has_hh")
        is_full = gat("is_full")
        window_len = gat("window_len")
        hh_budget = gat("hh_budget")

        is_punc_tok = (
            _punc_token_mask(spec, token[:, None])[:, 0]
            if token is not None and spec.token_ids_punc
            else jnp.zeros((B,), bool)
        )  # [B]

        ct = state.cache_ct  # [B, KVH]
        budget = (
            spec.global_tokens
            + jnp.where(has_special, state.extra["num_special"][:, None], 0)
            + jnp.where(has_punc, state.extra["num_punc"][:, None], 0)
            + jnp.where(has_window, window_len, 0)
            + jnp.where(has_hh, hh_budget, 0)
        )

        append_idx = jnp.minimum(C - 1, ct).astype(jnp.int32)
        # Append (no eviction) when: full strategy, punc-keeper seeing a punc
        # token, or still under budget (reference: cache.py:896-930).
        force_append = jnp.logical_or(
            is_full, jnp.logical_and(has_punc, is_punc_tok[:, None])
        )
        under_budget = ct < budget
        append = jnp.logical_or(force_append, under_budget)
        evictor = jnp.logical_or(has_window, has_hh)
        evict = jnp.logical_and(~append, evictor)
        # Heads that neither append nor evict drop the token into the dummy
        # slot C-1 with mask untouched (reference: cache.py:973-1001).
        no_insert = jnp.logical_and(~append, ~evictor)

        # ---- eviction scores (reference: cache.py:844-894) ----------------
        W = spec.history_window_size
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
        hh_score = num / denom.astype(jnp.float32)
        pos_score = state.pos.astype(jnp.float32)
        score = jnp.where(has_hh[..., None], hh_score, pos_score)

        slot = jnp.arange(C)
        save = slot[None, None, :] < spec.global_tokens
        save = jnp.logical_or(
            save, jnp.logical_and(has_special[..., None],
                                  state.extra["special_mask"]),
        )
        save = jnp.logical_or(
            save,
            jnp.logical_and(has_punc[..., None], state.extra["punc_mask"]),
        )
        save = jnp.logical_or(
            save,
            jnp.logical_and(
                has_window[..., None],
                state.pos > input_pos - window_len[..., None],
            ),
        )
        # Only slots below the per-head fill count are candidates
        # (reference slices [:cache_ct], cache.py:856-873).
        save = jnp.logical_or(save, slot[None, None, :] >= ct[..., None])
        score = jnp.where(save, jnp.inf, score)
        evict_idx = jnp.argmin(score, axis=-1).astype(jnp.int32)

        # If every filled slot is protected (global+special+punc+window cover
        # all of cache_ct), argmin over all-inf scores would return slot 0 and
        # silently overwrite a global token — drop the incoming token instead
        # (ADVICE r1).
        protected_all = jnp.all(jnp.isinf(score), axis=-1)
        drop = jnp.logical_or(
            no_insert, jnp.logical_and(evict, protected_all)
        )
        evict = jnp.logical_and(evict, ~protected_all)

        fill_idx = jnp.where(
            drop, C - 1, jnp.where(evict, evict_idx, append_idx)
        )

        # ---- apply ---------------------------------------------------------
        # Dropping heads must leave the cache byte-identical (slot C-1 may
        # hold a real row once a head reaches full occupancy):
        # store_kv_rows(skip=drop) pre-gathers the incumbent row and writes
        # it back — O(row) per head, vs the r3 post-hoc full-cache where()
        # that re-materialized every K/V buffer each step.
        state = store_kv_rows(
            state, fill_idx, k[:, :, 0], v[:, :, 0], skip=drop
        )
        new_pos = jnp.where(
            drop,
            gather_scalar(state.pos, fill_idx),
            jnp.broadcast_to(input_pos[:, :, 0], (B, KVH)),
        )
        state = state.replace(
            pos=scatter_scalar(state.pos, fill_idx, new_pos),
            mask=scatter_scalar(
                state.mask,
                fill_idx,
                jnp.where(drop, gather_scalar(state.mask, fill_idx), True),
            ),
            # Clamp at C: once an always-append head reuses slot C-1 the
            # occupancy no longer grows (ADVICE r1 — unclamped counts skewed
            # budget checks and compression stats).
            cache_ct=jnp.minimum(ct + append.astype(jnp.int32), C),
        )

        new_extra = dict(state.extra)
        if cls.menu_needs_attn(spec):
            # Zero the history of evicted slots.
            zero = evict
            if W == 1:
                cur = gather_scalar(new_extra["attn_num"], fill_idx)
                new_extra["attn_num"] = scatter_scalar(
                    new_extra["attn_num"], fill_idx, jnp.where(zero, 0.0, cur)
                )
            else:
                b = jnp.arange(B)[:, None]
                h = jnp.arange(KVH)[None, :]
                cur = new_extra["attn_num"][b, h, fill_idx]
                new_extra["attn_num"] = (
                    new_extra["attn_num"]
                    .at[b, h, fill_idx]
                    .set(jnp.where(zero[..., None], 0.0, cur))
                )
            curd = gather_scalar(new_extra["attn_denom"], fill_idx)
            new_extra["attn_denom"] = scatter_scalar(
                new_extra["attn_denom"], fill_idx, jnp.where(zero, 0, curd)
            )
        if spec.token_ids_punc:
            # Track punctuation slots (reference: cache.py:1009-1017).
            cur = gather_scalar(new_extra["punc_mask"], fill_idx)
            new_extra["punc_mask"] = scatter_scalar(
                new_extra["punc_mask"],
                fill_idx,
                jnp.where(is_punc_tok[:, None], True, cur),
            )
            new_extra["num_punc"] = state.extra["num_punc"] + is_punc_tok.astype(
                jnp.int32
            )
        state = state.replace(extra=new_extra)

        from .base import materialize_kv

        k_full, v_full = materialize_kv(state, dtype=k.dtype)
        return state, k_full, v_full, state.mask

    @classmethod
    def update_state(
        cls, spec, state, input_pos, attn, is_prefill=False, prompt_len=None
    ):
        if is_prefill:
            # Handled inside profile_prefill.
            return state
        if not cls.menu_needs_attn(spec):
            return state
        return HeavyHitterCache.update_state(
            spec, state, input_pos, attn, is_prefill, prompt_len
        )

    @classmethod
    def strategy_histogram(cls, spec, state):
        """Per-strategy head fractions (reference: cache.py:1043-1064)."""
        sidx = state.extra["strategy_idx"]
        S = len(spec.hybrid_strategies)
        counts = jnp.bincount(sidx.reshape(-1), length=S)
        return counts / sidx.size


# --------------------------------------------------------------------------
# Profiling pass
# --------------------------------------------------------------------------


def _strategy_base_cols(spec, s: HybridStrategy, cum_attn, special, punc,
                        input_pos, valid, prompt_len, total_len):
    """Query-independent kept columns for one menu entry: global + special +
    punc + heavy hitters (window is query-dependent, handled separately).

    Returns bool [B, KVH, P].
    """
    B, KVH, P = cum_attn.shape
    g = spec.global_tokens
    base = jnp.broadcast_to(
        (input_pos < g)[None, None, :] & valid[:, None, :], (B, KVH, P)
    )
    if "special" in s.strategy:
        base = base | jnp.broadcast_to(special[:, None, :], (B, KVH, P))
    if "punc" in s.strategy:
        base = base | jnp.broadcast_to(punc[:, None, :], (B, KVH, P))
    if "heavy_hitter" in s.strategy:
        # Heavy hitters picked from columns not already covered by the base
        # mask nor the window of the LAST query (reference: cache.py:1101-1131
        # uses the last query row to find "available" columns).
        w = max(1, int(s.recent_window * total_len)) if "window" in s.strategy else 0
        last_q = (
            jnp.atleast_1d(jnp.asarray(prompt_len, jnp.int32)) - 1
        )[:, None, None]  # per-lane
        in_last_window = jnp.logical_and(
            input_pos[None, None, :] > last_q - w,
            input_pos[None, None, :] <= last_q,
        ) if w > 0 else jnp.zeros((1, 1, P), bool)
        avail = valid[:, None, :] & ~base & ~in_last_window
        k_max = max(1, min(P, math.ceil(s.heavy_hitter_frac * total_len)))
        avail_ct = jnp.sum(avail, axis=-1)  # [B,KVH]
        num_hh = jnp.minimum(
            jnp.ceil(s.heavy_hitter_frac * total_len).astype(jnp.int32),
            avail_ct,
        )
        masked_scores = jnp.where(avail, cum_attn, NEG_INF)
        topv, topi = jax.lax.top_k(masked_scores, k_max)
        sel = jnp.logical_and(
            jnp.arange(k_max)[None, None, :] < num_hh[..., None],
            topv > NEG_INF,
        )
        hh = jnp.zeros((B, KVH, P), bool)
        b = jnp.arange(B)[:, None, None]
        h = jnp.arange(KVH)[None, :, None]
        hh = hh.at[b, h, topi].max(sel)
        base = base | hh
    if s.strategy == "full":
        base = jnp.broadcast_to(valid[:, None, :], (B, KVH, P))
    return base


def _profile_windows(spec, P):
    """Distinct non-zero window lengths in the menu, at total_len = P."""
    window_lens = [
        max(1, int(s.recent_window * P)) if "window" in s.strategy else 0
        for s in spec.hybrid_strategies
    ]
    return window_lens, sorted({w for w in window_lens if w > 0})


def _profile_partial(spec, q, k, prompt_len, q_offset=0,
                     chunk_size: int = 512):
    """Streaming profile accumulators for a contiguous QUERY block at
    global position ``q_offset`` against the FULL key sequence.

    Returns (cum [B, KVH, P], wcols [W, B, KVH, P]): raw column
    attention-mass sums over this block's valid queries, and the same
    restricted to each distinct recent-window length. Both are plain sums
    over query rows, so sequence-parallel prefill runs this on each
    device's query shard and psums the results (parallel/sp.py) — the
    building block the single-device pass (q_offset=0, full q) shares."""
    B, H, Pq, D = q.shape
    KVH = k.shape[1]
    P = k.shape[2]
    G = H // KVH
    scale = 1.0 / math.sqrt(D)
    input_pos = jnp.arange(P, dtype=jnp.int32)

    qg = q.reshape(B, KVH, G, Pq, D).astype(jnp.bfloat16)
    kf = k.astype(jnp.bfloat16)
    chunk = min(chunk_size, Pq)
    n_chunks = -(-Pq // chunk)
    if n_chunks * chunk != Pq:
        # Pad the query axis to a chunk multiple (a full-length hybrid cache
        # can have any multiple-of-8 length, e.g. max_seq_length 5000). Pad
        # queries have q_pos >= P >= prompt_len, so q_valid zeroes their
        # contribution; keys are not padded.
        qg = jnp.pad(
            qg, [(0, 0), (0, 0), (0, 0), (0, n_chunks * chunk - Pq), (0, 0)]
        )

    _, uniq_w = _profile_windows(spec, P)

    def attn_chunk(ci):
        qc = jax.lax.dynamic_slice_in_dim(qg, ci * chunk, chunk, axis=3)
        q_pos = q_offset + ci * chunk + jnp.arange(chunk)
        scores = (
            jnp.einsum(
                "bkgld,bksd->bkgls", qc, kf,
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        causal = input_pos[None, :] <= q_pos[:, None]
        scores = jnp.where(causal[None, None, None], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        return probs.mean(axis=2), q_pos  # [B,KVH,chunk,P]

    # Per-lane prompt lengths [B] (scalar broadcasts to all lanes).
    plen = jnp.broadcast_to(
        jnp.atleast_1d(jnp.asarray(prompt_len, jnp.int32)), (B,)
    )

    def body(carry, ci):
        cum, wcols = carry
        pooled, q_pos = attn_chunk(ci)
        q_valid = (q_pos[None, :] < plen[:, None]).astype(jnp.float32)
        cum = cum + jnp.einsum("bkcs,bc->bks", pooled, q_valid)
        new_w = []
        for wi, w in enumerate(uniq_w):
            in_window = jnp.logical_and(
                input_pos[None, :] >= q_pos[:, None] + 1 - w,
                input_pos[None, :] <= q_pos[:, None],
            )  # [chunk, P]
            new_w.append(
                wcols[wi]
                + jnp.einsum(
                    "bkcs,bc->bks",
                    jnp.where(in_window[None, None], pooled, 0.0),
                    q_valid,
                )
            )
        if uniq_w:
            wcols = jnp.stack(new_w)
        return (cum, wcols), None

    init = (
        jnp.zeros((B, KVH, P), jnp.float32),
        jnp.zeros((len(uniq_w), B, KVH, P), jnp.float32),
    )
    (cum, wcols), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return cum, wcols


def _profile_finalize(spec, cum, wcols, valid, prompt_len, special, punc):
    """Turn (psum'ed) profile accumulators into the query-averaged column
    attention (cum_attn) and each menu entry's recovered-attention score.

    The per-strategy decomposition: with colsum[c] = sum_q probs[q, c]
    (query-validity weighted) and, for each distinct window length w,
    wcolsum_w[c] = sum_q probs[q, c] * [c in window_w(q)]:

        sum_q sum_{c in base_s OR window_w(q)} probs[q, c]
          = dot(base_s, colsum)                (static columns)
          + sum_c wcolsum_w[c]                 (window mass)
          - dot(base_s, wcolsum_w)             (overlap double-count)

    base_s depends on cum_attn (heavy-hitter column selection), but only
    through per-COLUMN reductions — so the accumulators stream in one
    chunked pass (replacing the reference's materialized [S, H, P, P] mask
    stack, cache.py:1066-1136,1160-1168, and the r3 two-sweep layout) and
    the per-strategy scores collapse to cheap [B, KVH, P] dots here.
    tests/test_hybrid.py asserts parity against a dense reference."""
    B, KVH, P = cum.shape
    menu = spec.hybrid_strategies
    input_pos = jnp.arange(P, dtype=jnp.int32)
    window_lens, uniq_w = _profile_windows(spec, P)
    plen = jnp.broadcast_to(
        jnp.atleast_1d(jnp.asarray(prompt_len, jnp.int32)), (B,)
    )
    denom = jnp.maximum(plen[:, None] - input_pos[None, :], 1).astype(
        jnp.float32
    )  # [B, P]
    cum_attn = cum / denom[:, None, :]

    sums = []
    for si, s in enumerate(menu):
        base = _strategy_base_cols(
            spec, s, cum_attn, special, punc, input_pos, valid, prompt_len, P
        ).astype(jnp.float32)  # [B,KVH,P]
        tot = jnp.sum(base * cum, axis=-1)  # [B,KVH]
        w = window_lens[si]
        if w > 0:
            wc = wcols[uniq_w.index(w)]
            tot = tot + jnp.sum(wc, axis=-1) - jnp.sum(base * wc, axis=-1)
        sums.append(tot)
    n_q = jnp.maximum(plen, 1).astype(jnp.float32)  # [B]
    scores = jnp.stack(sums) / n_q[None, :, None]  # mean over valid queries
    return cum_attn, scores


def _profile_pass(spec, q, k, valid, prompt_len, special, punc,
                  chunk_size: int = 512):
    """Single-device profile: one streaming QK^T pass (q_offset=0, full
    query axis) then finalize. SP runs the same two pieces with a psum in
    between (parallel/sp.py)."""
    cum, wcols = _profile_partial(
        spec, q, k, prompt_len, q_offset=0, chunk_size=chunk_size
    )
    return _profile_finalize(
        spec, cum, wcols, valid, prompt_len, special, punc
    )


def _keep_mask_for_filling(
    spec, strategy_idx, cum_attn, special, punc, input_pos, valid, prompt_len
):
    """Per-head kept-token mask using total_len = max_cache_length and the
    last query's window (reference: cache.py:1177-1186)."""
    B, KVH, P = cum_attn.shape
    C = spec.max_cache_length
    menu = spec.hybrid_strategies
    masks = []
    for s in menu:
        base = _strategy_base_cols(
            spec, s, cum_attn, special, punc, input_pos, valid, prompt_len, C
        )
        if "window" in s.strategy:
            w = max(1, int(s.recent_window * C))
            last_q = (
                jnp.atleast_1d(jnp.asarray(prompt_len, jnp.int32)) - 1
            )[:, None, None]  # per-lane
            in_window = jnp.logical_and(
                input_pos[None, None, :] > last_q - w,
                input_pos[None, None, :] <= last_q,
            )
            base = base | (in_window & valid[:, None, :])
        masks.append(base)
    stacked = jnp.stack(masks)  # [S, B, KVH, P]
    return jnp.take_along_axis(
        stacked, strategy_idx[None, :, :, None], axis=0
    )[0]
