"""KV-cache framework: fixed-budget caches as JAX pytrees.

TPU-native re-design of the reference's ``KVCache`` module hierarchy
(reference: cache.py:152-490). The reference mutates registered torch buffers
in place; here a cache is an immutable dataclass of arrays threaded through the
jitted step functions (XLA performs the in-place update via buffer donation).

Protocol (mirrors the reference contract, SURVEY.md §3.2):
  * decode: insert the new token BEFORE attention. Eviction = score every
    slot, protect globals (+inf), prefer empty slots (-inf), scatter at the
    argmin slot (reference: cache.py:348-379).
  * prefill: full attention first, then (optionally compressed) K/V fill the
    cache contiguously from slot 0 (reference: cache.py:381-401).

Shapes (B = batch, KVH = kv heads, C = budget, D = head dim):
  k/v:       [B, KVH, C, D]       (bf16, or packed uint8 when quantized)
  pos:       [B, KVH, C] int32    original position of each slot, -1 = empty
  mask:      [B, KVH, C] bool     valid slots (per-head attention mask)
  cache_ct:  [B, KVH]   int32     number of filled slots

Head-constant strategies simply produce identical eviction indices across the
KVH axis, so one uniform layout serves both cases (the reference keeps separate
[1, C] and [KVH, C] layouts, cache.py:207-218).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")
POS_INF = float("inf")


# --------------------------------------------------------------------------
# Static spec
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class CacheSpec:
    """Static (trace-time) configuration of one layer's cache.

    Field names track the reference CLI flags (cache.py:13-118) so YAML
    configs port over unchanged.
    """

    cache_strategy: str = "full"
    max_cache_length: int = 1024
    max_seq_length: int = 1024
    global_tokens: int = 1
    recent_window: int = 10
    cache_bits: Optional[int] = None
    history_window_size: int = 1
    attn_thresholding: bool = False
    prompt_compression_strategy: str = "recent_global"
    # FastGen hybrid knobs (M7)
    min_recovery_frac: float = 0.9
    hybrid_strategies: Tuple[Any, ...] = ()
    # Static token vocab classifications for the hybrid cache (from the
    # tokenizer: special-token sequences and punctuation ids,
    # reference: generation_utils.py:378-384).
    token_ids_special: Tuple[Tuple[int, ...], ...] = ()
    token_ids_punc: Tuple[int, ...] = ()

    @property
    def quantized(self) -> bool:
        return self.cache_bits is not None

    @property
    def packed_head_dim_divisor(self) -> int:
        return {None: 1, 8: 1, 4: 2, 2: 4}[self.cache_bits]


# --------------------------------------------------------------------------
# Pytree state
# --------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclass
class CacheState:
    k: jax.Array
    v: jax.Array
    pos: jax.Array
    mask: jax.Array
    cache_ct: jax.Array
    # Per-(head, slot) affine quantization params (None when not quantized).
    k_scales: Optional[jax.Array] = None
    k_zeros: Optional[jax.Array] = None
    v_scales: Optional[jax.Array] = None
    v_zeros: Optional[jax.Array] = None
    # Strategy-specific extras (dict of arrays; empty for simple strategies).
    extra: Dict[str, jax.Array] = field(default_factory=dict)
    spec: CacheSpec = field(
        default=CacheSpec(), metadata=dict(static=True)
    )

    def replace(self, **kw) -> "CacheState":
        return dataclasses.replace(self, **kw)


# --------------------------------------------------------------------------
# Quantized row storage (per-(head, slot) affine, reference
# quantization_utils.py:4-46 — improved: only inserted rows are re-quantized,
# scales are per head+slot rather than joint across heads)
# --------------------------------------------------------------------------


def quantize_rows(x: jax.Array, n_bit: int):
    """Quantize along the last axis. x [..., D] -> (q packed, scales, zeros).

    q holds unsigned values in [0, 2^n_bit - 1]; 4/2-bit values are packed
    into uint8 along D. Dequant: (q - 2^(n_bit-1)) * scale + zero.
    """
    xf = x.astype(jnp.float32)
    mn = jnp.min(xf, axis=-1)
    mx = jnp.max(xf, axis=-1)
    max_int = 2**n_bit - 1
    scales = jnp.maximum(mx - mn, 1e-6) / max_int
    zeros = mn + scales * (2 ** (n_bit - 1))
    q = jnp.clip(
        jnp.round((xf - mn[..., None]) / scales[..., None]), 0, max_int
    ).astype(jnp.uint8)
    if n_bit == 4:
        q = _pack_last(q, 2, 4)
    elif n_bit == 2:
        q = _pack_last(q, 4, 2)
    return q, scales, zeros


def dequantize_rows(q: jax.Array, scales, zeros, n_bit: int, dtype):
    if n_bit == 4:
        q = _unpack_last(q, 2, 4)
    elif n_bit == 2:
        q = _unpack_last(q, 4, 2)
    x = (q.astype(jnp.float32) - 2 ** (n_bit - 1)) * scales[..., None] + zeros[
        ..., None
    ]
    return x.astype(dtype)


def _pack_last(q: jax.Array, per_byte: int, n_bit: int) -> jax.Array:
    """Half-split (segment) packing: byte j's bit-range s holds the value at
    position j + s*(D/per_byte). Segments concatenate — never interleave —
    so the Pallas decode-attention kernel unpacks with shifts + a lane
    concat (ops/pallas_decode_attn.py::_dequant)."""
    Dh = q.shape[-1] // per_byte
    qr = q.reshape(q.shape[:-1] + (per_byte, Dh)).astype(jnp.uint32)
    shifts = (jnp.arange(per_byte, dtype=jnp.uint32) * n_bit)[:, None]
    return jnp.sum(qr << shifts, axis=-2).astype(jnp.uint8)


def _unpack_last(p: jax.Array, per_byte: int, n_bit: int) -> jax.Array:
    mask = (1 << n_bit) - 1
    pe = p.astype(jnp.uint32)[..., None, :]
    shifts = (jnp.arange(per_byte, dtype=jnp.uint32) * n_bit)[:, None]
    vals = (pe >> shifts) & mask  # [..., per_byte, Dh]
    return vals.reshape(p.shape[:-1] + (p.shape[-1] * per_byte,)).astype(
        jnp.uint8
    )


# --------------------------------------------------------------------------
# Shared machinery
# --------------------------------------------------------------------------


def init_state(
    spec: CacheSpec,
    batch_size: int,
    n_kv_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
    extra: Optional[Dict[str, jax.Array]] = None,
) -> CacheState:
    B, H, C, D = batch_size, n_kv_heads, spec.max_cache_length, head_dim
    if spec.quantized:
        Dp = D // spec.packed_head_dim_divisor
        k = jnp.zeros((B, H, C, Dp), jnp.uint8)
        v = jnp.zeros((B, H, C, Dp), jnp.uint8)
        qparams = dict(
            k_scales=jnp.full((B, H, C), 1e-6, jnp.float32),
            k_zeros=jnp.zeros((B, H, C), jnp.float32),
            v_scales=jnp.full((B, H, C), 1e-6, jnp.float32),
            v_zeros=jnp.zeros((B, H, C), jnp.float32),
        )
    else:
        k = jnp.zeros((B, H, C, D), dtype)
        v = jnp.zeros((B, H, C, D), dtype)
        qparams = {}
    return CacheState(
        k=k,
        v=v,
        pos=jnp.full((B, H, C), -1, jnp.int32),
        mask=jnp.zeros((B, H, C), bool),
        cache_ct=jnp.zeros((B, H), jnp.int32),
        extra=dict(extra or {}),
        spec=spec,
        **qparams,
    )


def reset_state(state: CacheState) -> CacheState:
    """Fresh state for a new example (reference: cache.py:229-239).

    Recurses into nested ``CacheState`` values inside ``extra`` (the analysis
    cache's shadow cache) so their empty-slot sentinels (pos=-1,
    scales=1e-6) are restored as well, and gives the owning strategy a
    ``reset_extra`` hook for non-zero extra defaults.
    """
    is_cs = lambda x: isinstance(x, CacheState)  # noqa: E731
    extra = {
        key: jax.tree.map(
            lambda x: reset_state(x) if is_cs(x) else jnp.zeros_like(x),
            val,
            is_leaf=is_cs,
        )
        for key, val in state.extra.items()
    }
    try:
        from . import get_cache_strategy

        strategy = get_cache_strategy(state.spec.cache_strategy)
    except (ValueError, ImportError):
        strategy = None
    if strategy is not None and hasattr(strategy, "reset_extra"):
        extra = strategy.reset_extra(state.spec, extra)
    return CacheState(
        k=jnp.zeros_like(state.k),
        v=jnp.zeros_like(state.v),
        pos=jnp.full_like(state.pos, -1),
        mask=jnp.zeros_like(state.mask),
        cache_ct=jnp.zeros_like(state.cache_ct),
        k_scales=None
        if state.k_scales is None
        else jnp.full_like(state.k_scales, 1e-6),
        k_zeros=None if state.k_zeros is None else jnp.zeros_like(state.k_zeros),
        v_scales=None
        if state.v_scales is None
        else jnp.full_like(state.v_scales, 1e-6),
        v_zeros=None if state.v_zeros is None else jnp.zeros_like(state.v_zeros),
        extra=extra,
        spec=state.spec,
    )


def materialize_kv(state: CacheState, dtype=jnp.bfloat16):
    """Return the cache contents as dense bf16 [B, KVH, C, D] arrays."""
    spec = state.spec
    if not spec.quantized:
        return state.k, state.v
    k = dequantize_rows(
        state.k, state.k_scales, state.k_zeros, spec.cache_bits, dtype
    )
    v = dequantize_rows(
        state.v, state.v_scales, state.v_zeros, spec.cache_bits, dtype
    )
    return k, v


def _bh_index(B: int, H: int):
    return jnp.arange(B)[:, None], jnp.arange(H)[None, :]


def scatter_rows(arr: jax.Array, idx: jax.Array, rows: jax.Array) -> jax.Array:
    """arr [B,H,C,...] <- rows [B,H,...] at slot idx [B,H]."""
    b, h = _bh_index(arr.shape[0], arr.shape[1])
    return arr.at[b, h, idx].set(rows)


def scatter_scalar(arr: jax.Array, idx: jax.Array, val) -> jax.Array:
    """arr [B,H,C] <- val ([B,H] or scalar) at slot idx [B,H]."""
    b, h = _bh_index(arr.shape[0], arr.shape[1])
    return arr.at[b, h, idx].set(val)


def gather_scalar(arr: jax.Array, idx: jax.Array) -> jax.Array:
    """arr [B,H,C] -> [B,H] at slot idx [B,H]."""
    b, h = _bh_index(arr.shape[0], arr.shape[1])
    return arr[b, h, idx]


def input_pos_b11(input_pos, B: int) -> jax.Array:
    """Normalize a decode position (scalar or per-lane [B]) to [B, 1, 1] so
    comparisons against ``pos`` [B, H, C] broadcast per lane."""
    return jnp.broadcast_to(
        jnp.atleast_1d(jnp.asarray(input_pos, jnp.int32)), (B,)
    )[:, None, None]


def protect_and_prefer_empty(
    scores: jax.Array, state: CacheState
) -> jax.Array:
    """Shared eviction score shaping (reference: cache.py:366-379).

    Global tokens (lowest slots) become un-evictable; empty slots are evicted
    first.
    """
    C = scores.shape[-1]
    slot = jnp.arange(C)
    scores = jnp.where(slot < state.spec.global_tokens, POS_INF, scores)
    scores = jnp.where(state.pos == -1, NEG_INF, scores)
    return scores


def store_kv_rows(
    state: CacheState,
    idx: jax.Array,
    k_row: jax.Array,
    v_row: jax.Array,
    skip: Optional[jax.Array] = None,
) -> CacheState:
    """Scatter one K/V row per (batch, head) into slot ``idx``.

    Quantizes only the inserted row — unlike the reference, which dequantizes
    and re-quantizes the whole cache every step (cache.py:323-339).

    ``skip`` [B, H] bool marks heads whose slot must stay BYTE-identical
    (the hybrid cache's dropping heads, which reuse slot C-1 as a dummy
    target): the incumbent row/scales are pre-gathered at ``idx`` and
    written back — O(row) work per head. The post-hoc full-cache where()
    this replaces re-materialized every K/V buffer each decode step
    (~4 GB/token HBM traffic at C=8192; hybrid decoded 54.8 vs full's
    70.7 tok/s in the r4 batch-A measurement).
    """
    spec = state.spec
    if spec.quantized:
        qk, ks, kz = quantize_rows(k_row, spec.cache_bits)
        qv, vs, vz = quantize_rows(v_row, spec.cache_bits)
        if skip is not None:
            row = skip[..., None]
            qk = jnp.where(row, gather_scalar(state.k, idx), qk)
            qv = jnp.where(row, gather_scalar(state.v, idx), qv)
            ks = jnp.where(skip, gather_scalar(state.k_scales, idx), ks)
            kz = jnp.where(skip, gather_scalar(state.k_zeros, idx), kz)
            vs = jnp.where(skip, gather_scalar(state.v_scales, idx), vs)
            vz = jnp.where(skip, gather_scalar(state.v_zeros, idx), vz)
        return state.replace(
            k=scatter_rows(state.k, idx, qk),
            v=scatter_rows(state.v, idx, qv),
            k_scales=scatter_scalar(state.k_scales, idx, ks),
            k_zeros=scatter_scalar(state.k_zeros, idx, kz),
            v_scales=scatter_scalar(state.v_scales, idx, vs),
            v_zeros=scatter_scalar(state.v_zeros, idx, vz),
        )
    k_new = k_row.astype(state.k.dtype)
    v_new = v_row.astype(state.v.dtype)
    if skip is not None:
        row = skip[..., None]
        k_new = jnp.where(row, gather_scalar(state.k, idx), k_new)
        v_new = jnp.where(row, gather_scalar(state.v, idx), v_new)
    return state.replace(
        k=scatter_rows(state.k, idx, k_new),
        v=scatter_rows(state.v, idx, v_new),
    )


def store_kv_prefix(
    state: CacheState, k: jax.Array, v: jax.Array
) -> CacheState:
    """Write K/V [B,KVH,P,D] into slots [0, P) (prefill fill)."""
    spec = state.spec
    P = k.shape[2]
    if spec.quantized:
        qk, ks, kz = quantize_rows(k, spec.cache_bits)
        qv, vs, vz = quantize_rows(v, spec.cache_bits)
        return state.replace(
            k=state.k.at[:, :, :P].set(qk),
            v=state.v.at[:, :, :P].set(qv),
            k_scales=state.k_scales.at[:, :, :P].set(ks),
            k_zeros=state.k_zeros.at[:, :, :P].set(kz),
            v_scales=state.v_scales.at[:, :, :P].set(vs),
            v_zeros=state.v_zeros.at[:, :, :P].set(vz),
        )
    return state.replace(
        k=state.k.at[:, :, :P].set(k.astype(state.k.dtype)),
        v=state.v.at[:, :, :P].set(v.astype(state.v.dtype)),
    )


# --------------------------------------------------------------------------
# Strategy base class
# --------------------------------------------------------------------------


class CacheStrategy:
    """A cache strategy is a namespace of pure functions over ``CacheState``.

    Subclasses override ``token_importances`` (score-based eviction) or
    ``eviction_idx`` directly, plus optional fill/state hooks.
    """

    name: str = "abstract"
    head_specific: bool = False
    needs_attn: bool = False
    # Flags relevant to this strategy, used for results-dir naming parity
    # (reference: cache.py:155-160 ``relevant_kwargs``).
    relevant_kwargs = [
        "max_cache_length",
        "global_tokens",
        "max_seq_length",
        "cache_bits",
    ]

    # ---- construction -----------------------------------------------------

    @classmethod
    def init(
        cls, spec: CacheSpec, batch_size: int, n_kv_heads: int, head_dim: int,
        dtype=jnp.bfloat16,
    ) -> CacheState:
        return init_state(
            spec,
            batch_size,
            n_kv_heads,
            head_dim,
            dtype,
            extra=cls.init_extra(spec, batch_size, n_kv_heads, head_dim),
        )

    @staticmethod
    def init_extra(spec, B, H, D) -> Dict[str, jax.Array]:
        return {}

    # ---- eviction ---------------------------------------------------------

    @staticmethod
    def token_importances(
        spec: CacheSpec, state: CacheState, input_pos: jax.Array
    ) -> jax.Array:
        raise NotImplementedError

    @classmethod
    def eviction_idx(
        cls, spec: CacheSpec, state: CacheState, input_pos: jax.Array
    ) -> Tuple[jax.Array, CacheState]:
        """Return ([B,KVH] slot indices, possibly-updated state)."""
        scores = cls.token_importances(spec, state, input_pos)
        scores = jnp.broadcast_to(scores, state.pos.shape)
        scores = protect_and_prefer_empty(scores, state)
        return jnp.argmin(scores, axis=-1).astype(jnp.int32), state

    # ---- update hooks -----------------------------------------------------

    @classmethod
    def on_decode_fill(
        cls, spec, state: CacheState, idx, input_pos, k_row, v_row
    ) -> CacheState:
        return state

    @classmethod
    def on_prefill_fill(
        cls, spec, state: CacheState, input_pos, k, v, valid
    ) -> CacheState:
        return state

    @classmethod
    def update_state(
        cls,
        spec,
        state: CacheState,
        input_pos,
        attn: Optional[jax.Array],
        is_prefill: bool,
        prompt_len=None,
    ) -> CacheState:
        """Post-attention state update (reference: cache.py:342-346,690-723).

        ``attn`` is [B, KVH, C]-aligned probabilities for decode, or the
        prompt-compressor-provided summary for prefill.
        """
        return state

    @classmethod
    def decode_update(cls, state: CacheState, input_pos, k, v, token=None):
        """Insert one token (pre-attention), evicting if needed. Strategies
        with non-score-based insert logic (hybrid) override this wholesale.

        Returns (state, k_cache, v_cache, mask); see module-level
        ``decode_update``.
        """
        spec = state.spec
        B, H = state.cache_ct.shape
        ipos = input_pos_b11(input_pos, B)  # [B,1,1]
        idx, state = cls.eviction_idx(spec, state, ipos)
        inserted = (gather_scalar(state.pos, idx) == -1).astype(jnp.int32)
        k_row = k[:, :, 0]
        v_row = v[:, :, 0]
        state = store_kv_rows(state, idx, k_row, v_row)
        state = state.replace(
            pos=scatter_scalar(
                state.pos, idx, jnp.broadcast_to(ipos[:, :, 0], (B, H))
            ),
            mask=scatter_scalar(state.mask, idx, True),
            cache_ct=state.cache_ct + inserted,
        )
        state = cls.on_decode_fill(spec, state, idx, input_pos, k_row, v_row)
        k_full, v_full = materialize_kv(state, dtype=k.dtype)
        return state, k_full, v_full, state.mask


# --------------------------------------------------------------------------
# Top-level cache ops used by the model
# --------------------------------------------------------------------------


def decode_update(
    strategy: type,
    state: CacheState,
    input_pos: jax.Array,  # scalar int32: position of the incoming token
    k: jax.Array,  # [B, KVH, 1, D]
    v: jax.Array,
    token: Optional[jax.Array] = None,  # [B] current token ids (hybrid punc)
):
    """Insert one token (pre-attention), evicting if needed.

    Returns (state, k_cache [B,KVH,C,D], v_cache, mask [B,KVH,C]).
    Mirrors reference cache.py:348-364 (``_decoding_update``).
    """
    return strategy.decode_update(state, input_pos, k, v, token=token)


def strategy_needs_attn(strategy: type, spec: CacheSpec) -> bool:
    """Whether decode must return attention probabilities for this cache;
    hybrid depends on its menu."""
    if hasattr(strategy, "menu_needs_attn"):
        return strategy.menu_needs_attn(spec)
    return strategy.needs_attn


def prefill_update(
    strategy: type,
    state: CacheState,
    input_pos: jax.Array,  # [B, KVH, P] or [P]: kept original positions
    k: jax.Array,  # [B, KVH, P, D] (P <= C; post-compression)
    v: jax.Array,
    valid: jax.Array,  # bool [B, KVH, P] or [P]: real (non-pad) tokens
) -> CacheState:
    """Contiguously fill slots [0, P) after prefill attention.

    Mirrors reference cache.py:381-401 (``_prefill_update``/``_fill``),
    extended with padding-validity masking for static shapes.
    """
    B, H, P, _ = k.shape
    input_pos = jnp.broadcast_to(
        jnp.asarray(input_pos, jnp.int32), (B, H, P)
    )
    valid = jnp.broadcast_to(valid, (B, H, P))
    state = store_kv_prefix(state, k, v)
    pos_fill = jnp.where(valid, input_pos, -1)
    state = state.replace(
        pos=state.pos.at[:, :, :P].set(pos_fill),
        mask=state.mask.at[:, :, :P].set(valid),
        cache_ct=state.cache_ct + jnp.sum(valid, axis=-1).astype(jnp.int32),
    )
    return strategy.on_prefill_fill(state.spec, state, input_pos, k, v, valid)


# --------------------------------------------------------------------------
# Observability (reference: cache.py:247-281)
# --------------------------------------------------------------------------


def cache_memory_gb(state: CacheState) -> float:
    total = 0
    for leaf in jax.tree.leaves(state):
        total += leaf.size * leaf.dtype.itemsize
    return total / (1024**3)


def compression_ratio(state: CacheState, seq_len) -> jax.Array:
    """Quantization-aware compression ratio (reference: cache.py:271-281)."""
    n = jnp.maximum(seq_len - 1, 1)
    size = state.cache_ct.astype(jnp.float32)
    if state.spec.cache_bits is not None:
        size = size * (state.spec.cache_bits / 16.0)
    return jnp.mean((n - size) / n)
