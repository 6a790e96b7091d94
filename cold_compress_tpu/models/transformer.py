"""Functional decoder-only transformer (Llama/Qwen2 family).

TPU-native redesign of the reference ``Transformer`` (reference:
model.py:174-457). Weights are a pytree of arrays, the KV caches are a tuple
of ``CacheState`` pytrees threaded through pure ``prefill``/``decode_step``
functions, and attention/caching follow the reference's core dataflow
contract (SURVEY.md §3.2):

  * decode inserts the new token into the cache BEFORE attention;
  * prefill runs full causal attention FIRST, then (optionally) compresses
    the prompt and fills the cache.

Weights are stored ``[in, out]`` (transposed from torch Linear) so the hot
matmuls are plain ``x @ w`` on the MXU; q/k/v projections are separate arrays
sharded on the head axis (decode is weight-bandwidth-bound, so the reference's
fused wqkv buys nothing on TPU and would complicate tensor-parallel
PartitionSpecs — see parallel/mesh.py).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..caches import (
    CacheState,
    compress_prompt,
    decode_update,
    get_cache_strategy,
    get_prompt_compressor,
    prefill_update,
    strategy_needs_attn,
)
from ..ops.attention import gqa_attention, prefill_attention
from ..ops.linear import (
    dequantize_weight,
    is_quantized,
    linear,
    to_colpack,
)
from .config import ModelConfig
from .rope import apply_rotary_emb, precompute_freqs_cis

Params = Dict[str, Any]


# --------------------------------------------------------------------------
# Parameter initialization
# --------------------------------------------------------------------------


def init_params(
    cfg: ModelConfig, key: jax.Array, dtype=jnp.bfloat16
) -> Params:
    """Random-normal initialized weights in the canonical pytree layout."""

    def dense(key, shape, scale=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(
            dtype
        )

    keys = jax.random.split(key, cfg.n_layer + 3)
    D, H, KVH, hd = cfg.dim, cfg.n_head, cfg.n_kv_head, cfg.head_dim
    layers = []
    for i in range(cfg.n_layer):
        lk = jax.random.split(keys[i], 8)
        layer = {
            "attn": {
                "wq": dense(lk[0], (D, H * hd)),
                "wk": dense(lk[1], (D, KVH * hd)),
                "wv": dense(lk[2], (D, KVH * hd)),
                "wo": dense(lk[3], (H * hd, D)),
            },
            "ffn": {
                "w1": dense(lk[4], (D, cfg.intermediate_size)),
                "w3": dense(lk[5], (D, cfg.intermediate_size)),
                "w2": dense(lk[6], (cfg.intermediate_size, D)),
            },
            "attention_norm": jnp.ones((D,), dtype),
            "ffn_norm": jnp.ones((D,), dtype),
        }
        if cfg.attention_bias:
            layer["attn"]["bq"] = jnp.zeros((H * hd,), dtype)
            layer["attn"]["bk"] = jnp.zeros((KVH * hd,), dtype)
            layer["attn"]["bv"] = jnp.zeros((KVH * hd,), dtype)
        layers.append(layer)
    params = {
        "tok_embeddings": dense(keys[-3], (cfg.vocab_size, D)),
        "layers": layers,
        "norm": jnp.ones((D,), dtype),
        "output": None
        if cfg.tie_word_embeddings
        else dense(keys[-2], (D, cfg.vocab_size)),
    }
    return params


def make_rope_table(
    cfg: ModelConfig, max_positions: Optional[int] = None
) -> jax.Array:
    """Rope rows for positions [0, n): rows are per-position, so a table
    truncated to the run's actual max sequence length is exact. Matters
    for long-block models: Llama-3.1's full table is 131072 x hd/2 x 2
    f32 = 67 MB living next to the decode loop for runs that never pass
    8-16k (r5 flat-curve isolation, PERF.md round-5)."""
    n = cfg.block_size
    if max_positions is not None:
        n = min(n, max(int(max_positions), 16))
    return precompute_freqs_cis(
        n, cfg.head_dim, cfg.rope_base, cfg.rope_scaling
    )


# --------------------------------------------------------------------------
# Building blocks
# --------------------------------------------------------------------------


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """RMSNorm in f32 (reference: model.py:446-457)."""
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(
        jnp.mean(xf * xf, axis=-1, keepdims=True) + eps
    )
    return normed.astype(x.dtype) * weight


def feed_forward(p: Dict[str, Any], x: jax.Array) -> jax.Array:
    """SwiGLU MLP (reference: model.py:435-443)."""
    if "w13" in p:
        # Fused gate+up projection: one weight stream / one Pallas dispatch
        # instead of two (see fuse_layer_params).
        y = linear(x, p["w13"])
        F = y.shape[-1] // 2
        return linear(jax.nn.silu(y[..., :F]) * y[..., F:], p["w2"])
    return linear(jax.nn.silu(linear(x, p["w1"])) * linear(x, p["w3"]), p["w2"])


def _qkv(cfg: ModelConfig, p: Dict[str, Any], x: jax.Array, freqs: jax.Array):
    """Project + rotate. x: [B, L, D] -> q [B,H,L,hd], k/v [B,KVH,L,hd]."""
    B, L, _ = x.shape
    if "wqkv" in p:
        # Fused q|k|v projection (see fuse_layer_params).
        Dq = cfg.n_head * cfg.head_dim
        Dkv = cfg.n_kv_head * cfg.head_dim
        y = linear(x, p["wqkv"], p.get("bqkv"))
        q = y[..., :Dq]
        k = y[..., Dq : Dq + Dkv]
        v = y[..., Dq + Dkv :]
    else:
        q = linear(x, p["wq"], p.get("bq"))
        k = linear(x, p["wk"], p.get("bk"))
        v = linear(x, p["wv"], p.get("bv"))
    q = q.reshape(B, L, cfg.n_head, cfg.head_dim)
    k = k.reshape(B, L, cfg.n_kv_head, cfg.head_dim)
    v = v.reshape(B, L, cfg.n_kv_head, cfg.head_dim)
    q = apply_rotary_emb(q, freqs)
    k = apply_rotary_emb(k, freqs)
    return (
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
    )


# --------------------------------------------------------------------------
# Attention layers: prefill and decode paths
# --------------------------------------------------------------------------


def attention_prefill(
    cfg: ModelConfig,
    p: Dict[str, Any],
    x: jax.Array,  # [B, P, D]
    cache: CacheState,
    input_pos: jax.Array,  # [P]
    valid: jax.Array,  # bool [B, P]
    prompt_len: jax.Array,  # scalar
    freqs: jax.Array,  # [P, hd//2, 2]
    tokens: Optional[jax.Array] = None,  # [B, P] ids (hybrid profiling)
) -> Tuple[jax.Array, CacheState]:
    """Prefill attention + cache fill (reference: model.py:363-427, prefill
    branch). Full causal attention first, then prompt compression when the
    budget is below the (padded) prompt length, then the contiguous fill."""
    spec = cache.spec
    strategy = get_cache_strategy(spec.cache_strategy)
    compressor = get_prompt_compressor(spec.prompt_compression_strategy)

    B, P, _ = x.shape
    C = spec.max_cache_length
    compress = C < P

    q, k, v = _qkv(cfg, p, x, freqs)

    if hasattr(strategy, "profile_prefill"):
        # Hybrid/FastGen: profiling replaces compression+fill entirely.
        # The fused path computes attention AND the profile accumulators in
        # one flash pass (caches/hybrid.py::profile_prefill_with_attn).
        y, cache = strategy.profile_prefill_with_attn(
            spec, cache, q, k, v, tokens, input_pos, valid, prompt_len
        )
        y = y.transpose(0, 2, 1, 3).reshape(B, P, cfg.n_head * cfg.head_dim)
        return linear(y, p["wo"]), cache

    need_summary = strategy_needs_attn(strategy, spec) or (
        compress and compressor.needs_attn
    )
    # Streaming prefill attention: O(P) per-key summaries instead of the
    # reference's full P x P probability map (attention_utils.py:36-54).
    y, summary = prefill_attention(
        q, k, v, valid, prompt_len, need_summary=need_summary
    )

    cache = fill_from_kv(
        strategy, compressor, cache, k, v, summary, input_pos, valid,
        prompt_len, tokens=tokens,
    )

    y = y.transpose(0, 2, 1, 3).reshape(B, P, cfg.n_head * cfg.head_dim)
    return linear(y, p["wo"]), cache


def fill_from_kv(
    strategy,
    compressor,
    cache: CacheState,
    k: jax.Array,  # [B, KVH, P, hd] full-sequence keys
    v: jax.Array,
    summary,  # AttnSummary | None (per-key means)
    input_pos: jax.Array,  # [P] global positions
    valid: jax.Array,  # bool [B, P]
    prompt_len: jax.Array,
    tokens: Optional[jax.Array] = None,
) -> CacheState:
    """Prompt compression + cache fill from precomputed K/V and attention
    summaries. Shared by the single-device prefill (above) and the
    sequence-parallel prefill (parallel/sp.py), where K/V are all-gathered
    and summaries psum'ed before this (replicated) fill."""
    spec = cache.spec
    compress = spec.max_cache_length < k.shape[2]
    if compress and compressor.name != "full":
        keep_pos, k_c, v_c, keep_valid, kept_attn = compress_prompt(
            compressor, spec, input_pos, k, v, valid, prompt_len,
            summary=summary,
        )
        cache = prefill_update(strategy, cache, keep_pos, k_c, v_c, keep_valid)
        if kept_attn is None and strategy_needs_attn(strategy, spec):
            kept_attn = jnp.take_along_axis(
                summary["cum_mean"], keep_pos, axis=-1
            )
    else:
        if compress:
            raise ValueError(
                "Prompt exceeds the cache budget but the prompt compressor is "
                "'full' (pass-through); choose a real compression strategy "
                "or use --feed_long_prompts."
            )
        # Budget >= padded prompt: direct fill.
        cache = prefill_update(
            strategy, cache, input_pos[None, None, :], k, v, valid[:, None, :]
        )
        kept_attn = (
            summary["cum_mean"]
            if strategy_needs_attn(strategy, spec)
            else None
        )
    cache = strategy.update_state(
        spec, cache, input_pos, kept_attn, is_prefill=True,
        prompt_len=prompt_len,
    )
    if hasattr(strategy, "post_prefill"):
        # Analysis (debug_*) caches fill their shadow compressed cache here.
        cache = strategy.post_prefill(
            spec, cache, k, v, summary, input_pos, valid, prompt_len,
            tokens=tokens,
        )
    return cache


def attention_decode(
    cfg: ModelConfig,
    p: Dict[str, Any],
    x: jax.Array,  # [B, 1, D]
    cache: CacheState,
    input_pos: jax.Array,  # scalar
    freqs: jax.Array,  # [1, hd//2, 2]
    attn_top_k: float = 1.0,
    token: Optional[jax.Array] = None,  # [B] current token ids
) -> Tuple[jax.Array, CacheState]:
    """Single-token decode attention over the fixed-budget cache
    (reference: model.py:389-411, decode branch). The new token is inserted
    BEFORE attention so it can attend to itself."""
    spec = cache.spec
    strategy = get_cache_strategy(spec.cache_strategy)
    B = x.shape[0]

    q, k, v = _qkv(cfg, p, x, freqs)
    cache, k_cache, v_cache, mask = decode_update(
        strategy, cache, input_pos, k, v, token=token
    )
    need_attn = strategy_needs_attn(strategy, spec)
    from ..ops.pallas_decode_attn import (
        decode_attn_supported,
        quantized_decode_attention,
    )

    fused_ok = attn_top_k >= 1.0 and decode_attn_supported(
        spec, q.shape, cache.k.shape[2], cache.k.shape[1]
    )
    if os.environ.get("CCT_ATTN_DEBUG", "0") == "1":
        # Trace-time routing witness (once per compile): quality A/Bs of
        # kernel numerics are vacuous if the gate silently falls back to
        # the XLA math path (e.g. head_dim 64 models).
        print(
            f"[attn-route] fused={fused_ok} C={cache.k.shape[2]} "
            f"D={q.shape[-1]} bits={spec.cache_bits or 16}",
            flush=True,
        )
    if fused_ok:
        # Fused path for quantized AND bf16 caches: packed caches never
        # leave their quantized form in HBM (XLA dead-code-eliminates
        # decode_update's unused materialized k_cache/v_cache), and bf16
        # caches stream at HBM speed instead of XLA's ~240 GB/s einsum.
        # (ops/pallas_decode_attn.py)
        from ..ops.pallas_qmm import force_interpret

        y, attn = quantized_decode_attention(
            q, cache.k, cache.v, cache.k_scales, cache.k_zeros,
            cache.v_scales, cache.v_zeros, cache.mask,
            bits=spec.cache_bits or 16, need_attn=need_attn,
            interpret=force_interpret(),
        )
    else:
        kv_mask = mask[:, :, None, None, :]  # [B, KVH, G=1, L=1, C]
        y, attn = gqa_attention(
            q,
            k_cache,
            v_cache,
            mask=kv_mask,
            return_attn=need_attn,
            attn_top_k=attn_top_k,
        )
    if attn is not None:
        cache = strategy.update_state(
            spec, cache, input_pos, attn[:, :, 0], is_prefill=False
        )
    y = y.transpose(0, 2, 1, 3).reshape(B, 1, cfg.n_head * cfg.head_dim)
    return linear(y, p["wo"]), cache


# --------------------------------------------------------------------------
# Full model forward
# --------------------------------------------------------------------------


def _block(cfg, p, x, attn_out):
    """Residual wiring (reference: model.py:307-327)."""
    h = x + attn_out
    return h + feed_forward(p["ffn"], rms_norm(h, p["ffn_norm"], cfg.norm_eps))


def _logits(cfg: ModelConfig, params: Params, x: jax.Array) -> jax.Array:
    x = rms_norm(x, params["norm"], cfg.norm_eps)
    out_w = params["output"]
    if out_w is None:  # tied embeddings (Qwen2-0.5B)
        emb = params["tok_embeddings"]
        if is_quantized(emb):
            emb = dequantize_weight(emb, x.dtype)
        return jax.lax.dot_general(
            x,
            emb,
            (((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if is_quantized(out_w):
        return linear(x, out_w).astype(jnp.float32)
    return jax.lax.dot_general(
        x,
        out_w,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _embed(params: Params, tokens: jax.Array) -> jax.Array:
    emb = params["tok_embeddings"]
    if is_quantized(emb):
        emb = dequantize_weight(emb)
    # mode='clip': out-of-range ids (padding sentinels) must not produce the
    # NaN fill values jnp.take defaults to.
    return jnp.take(emb, tokens, axis=0, mode="clip")


def prefill(
    cfg: ModelConfig,
    params: Params,
    rope: jax.Array,
    caches: Tuple[CacheState, ...],
    tokens: jax.Array,  # [B, P] (padded with any id past prompt_len)
    prompt_len: jax.Array,  # scalar int32: true prompt length
) -> Tuple[jax.Array, Tuple[CacheState, ...]]:
    """Run the full prompt through the model, filling all caches.

    Returns (last-position logits [B, vocab] in f32, caches). Only the final
    valid position is projected to vocabulary space — the reference computes
    all-position logits and keeps the last (generation_utils.py:145-160); for
    128k vocabularies that materializes GBs, so we gather the final hidden
    state first.
    """
    B, P = tokens.shape
    input_pos = jnp.arange(P, dtype=jnp.int32)
    # prompt_len may be scalar (shared) or [B] (per-lane batched prefill).
    plen = jnp.atleast_1d(jnp.asarray(prompt_len, jnp.int32))
    valid = jnp.broadcast_to(input_pos[None, :] < plen[:, None], (B, P))
    freqs = rope[:P]
    x = _embed(params, tokens)

    def layer_fn(x, layer_params, cache):
        attn_out, cache = attention_prefill(
            cfg,
            layer_params["attn"],
            rms_norm(x, layer_params["attention_norm"], cfg.norm_eps),
            cache,
            input_pos,
            valid,
            prompt_len,
            freqs,
            tokens=tokens,
        )
        return _block(cfg, layer_params, x, attn_out), cache

    if is_stacked(caches):
        # Homogeneous layers: scan instead of unrolling — ~n_layer x smaller
        # XLA graph and compile time. (Callers should pre-stack params with
        # ``stack_layer_params``; stacking here is an in-graph fallback.)
        layers = stack_layer_params(params)["layers"]

        def body(x, inp):
            i, cache = inp
            x, cache = layer_fn(x, _layer_view(layers, i), cache)
            return x, cache

        x, new_caches = jax.lax.scan(
            body, x, (jnp.arange(cfg.n_layer), caches)
        )
    else:
        new_list = []
        for layer_params, cache in zip(params["layers"], caches):
            x, cache = layer_fn(x, layer_params, cache)
            new_list.append(cache)
        new_caches = tuple(new_list)
    last = x[jnp.arange(B), jnp.broadcast_to(plen, (B,)) - 1]  # [B, D]
    logits = _logits(cfg, params, last[:, None])[:, 0]  # [B, vocab] f32
    return logits, new_caches


def decode_step(
    cfg: ModelConfig,
    params: Params,
    rope: jax.Array,
    caches: Tuple[CacheState, ...],
    token: jax.Array,  # [B] int32
    input_pos: jax.Array,  # scalar int32
    attn_top_k: float = 1.0,
) -> Tuple[jax.Array, Tuple[CacheState, ...]]:
    """One decode step. Returns (logits [B, vocab] f32, caches).

    ``input_pos`` is a scalar (all lanes at the same position) or [B]
    per-lane positions (batched generation with unequal prompt lengths).
    """
    B = token.shape[0]
    ipos = jnp.atleast_1d(jnp.asarray(input_pos, jnp.int32))
    # [Bi, 1, hd//2, 2]: per-lane rope rows (Bi == 1 broadcasts over B).
    freqs = jnp.take(rope, ipos, axis=0)[:, None]
    x = _embed(params, token[:, None])  # [B, 1, D]

    def layer_fn(x, layer_params, cache):
        attn_out, cache = attention_decode(
            cfg,
            layer_params["attn"],
            rms_norm(x, layer_params["attention_norm"], cfg.norm_eps),
            cache,
            input_pos,
            freqs,
            attn_top_k=attn_top_k,
            token=token,
        )
        return _block(cfg, layer_params, x, attn_out), cache

    if is_stacked(caches):
        layers = stack_layer_params(params)["layers"]

        def body(x, inp):
            i, cache = inp
            x, cache = layer_fn(x, _layer_view(layers, i), cache)
            return x, cache

        x, new_caches = jax.lax.scan(
            body, x, (jnp.arange(cfg.n_layer), caches)
        )
    else:
        new_list = []
        for layer_params, cache in zip(params["layers"], caches):
            x, cache = layer_fn(x, layer_params, cache)
            new_list.append(cache)
        new_caches = tuple(new_list)
    logits = _logits(cfg, params, x)[:, 0]
    return logits, new_caches


# --------------------------------------------------------------------------
# Cache construction helpers (reference: model.py:191-233 ``setup_caches``)
# --------------------------------------------------------------------------


def is_stacked(caches) -> bool:
    """True when caches/params use the stacked (scan-over-layers) layout."""
    return isinstance(caches, CacheState)


def layer_cache(caches, i: int) -> CacheState:
    """Per-layer cache view from either layout."""
    if is_stacked(caches):
        return jax.tree.map(lambda x: x[i], caches)
    return caches[i]


def init_caches(
    cfg: ModelConfig,
    specs,  # Sequence[CacheSpec], one per layer
    batch_size: int = 1,
    dtype=jnp.bfloat16,
    stacked: Optional[bool] = None,
):
    """Build per-layer cache states.

    When all layers share one spec (the common case) and ``stacked`` is not
    explicitly False, a single stacked ``CacheState`` with a leading layer
    axis is returned and the model runs a ``lax.scan`` over layers — an
    ~n_layer reduction in XLA graph size and compile time. Heterogeneous
    specs (pyramid budgets, mixed strategies) fall back to a tuple of states
    and an unrolled layer loop.
    """
    assert len(specs) == cfg.n_layer
    homogeneous = len(set(specs)) == 1
    if stacked is None:
        stacked = homogeneous
    if stacked:
        assert homogeneous, (
            "Stacked caches require identical per-layer cache specs."
        )
        strategy = get_cache_strategy(specs[0].cache_strategy)
        one = strategy.init(
            specs[0], batch_size, cfg.n_kv_head, cfg.head_dim, dtype
        )
        return jax.tree.map(
            lambda x: jnp.broadcast_to(
                x[None], (cfg.n_layer,) + x.shape
            ).copy(),
            one,
        )
    caches = []
    for spec in specs:
        strategy = get_cache_strategy(spec.cache_strategy)
        caches.append(
            strategy.init(
                spec, batch_size, cfg.n_kv_head, cfg.head_dim, dtype
            )
        )
    return tuple(caches)


def _layer_view(stacked_layers, i):
    """Per-layer view of the stacked params for scan step ``i``.

    Quantized leaves stay stacked and carry ``idx=i`` so the Pallas matmul
    kernels index the layer inside the kernel (zero-copy; XLA would
    otherwise materialize a copy of each sliced weight per scan step —
    measured at ~3x the HBM traffic). Dense leaves (norms, biases) are
    dynamically sliced — those fuse into their consumers.
    """

    def f(leaf):
        if leaf is None:
            return None
        if is_quantized(leaf):
            return dataclasses.replace(leaf, idx=i)
        return jax.lax.dynamic_index_in_dim(leaf, i, axis=0, keepdims=False)

    return jax.tree.map(
        f,
        stacked_layers,
        is_leaf=lambda x: is_quantized(x) or x is None,
    )


def stack_layer_params(params: Params) -> Params:
    """Stack the per-layer parameter pytrees along a leading layer axis so
    the forward pass can ``lax.scan`` over layers. No-op if already stacked.
    """
    layers = params["layers"]
    if not isinstance(layers, list):
        return params
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {**params, "layers": stacked}


def _concat_weight_leaves(leaves):
    """Concatenate weight leaves along the output (last) axis.

    Works for dense arrays and ``QuantizedWeight``s (packed bytes, scales
    and zeros all share the output axis as their last dim, for both the
    per-layer and the stacked layouts).
    """
    if is_quantized(leaves[0]):
        first = leaves[0]
        assert all(
            is_quantized(l)
            and l.kind == first.kind
            and l.group_size == first.group_size
            for l in leaves
        ), "fused projections must share quantization settings"
        cat = lambda xs: None if xs[0] is None else jnp.concatenate(xs, -1)  # noqa: E731
        return dataclasses.replace(
            first,
            w=cat([l.w for l in leaves]),
            scales=cat([l.scales for l in leaves]),
            zeros=cat([l.zeros for l in leaves]),
        )
    assert not any(is_quantized(l) for l in leaves)
    return jnp.concatenate(leaves, axis=-1)


def fuse_layer_params(params: Params) -> Params:
    """Fuse the q/k/v and w1/w3 projections into single wider weights.

    Decode is dispatch-bound on this backend (each Pallas matmul call
    carries fixed overhead; see scripts/perf_probe3.py) — fusing 7 calls
    per layer down to 4 cuts that overhead with identical bytes/FLOPs.
    The fused leaves concatenate along the *output* axis, so results are
    bit-identical to the unfused path (each output column's dot product is
    unchanged; int4/int8 quantization metadata is per-output-column/group
    and concatenates losslessly).

    Only valid for UNSHARDED runs: tensor-parallel PartitionSpecs shard the
    output axis per projection (parallel/mesh.py), which a q|k|v concat
    would interleave incorrectly. Callers gate on tp == 1.
    """

    def fuse_one(lp):
        lp = dict(lp)
        attn = dict(lp["attn"])
        if "wq" in attn:
            attn["wqkv"] = _concat_weight_leaves(
                [attn.pop("wq"), attn.pop("wk"), attn.pop("wv")]
            )
            if "bq" in attn:
                attn["bqkv"] = jnp.concatenate(
                    [attn.pop("bq"), attn.pop("bk"), attn.pop("bv")], -1
                )
            lp["attn"] = attn
        ffn = dict(lp["ffn"])
        if "w1" in ffn:
            ffn["w13"] = _concat_weight_leaves(
                [ffn.pop("w1"), ffn.pop("w3")]
            )
            lp["ffn"] = ffn
        return lp

    layers = params["layers"]
    if isinstance(layers, list):
        layers = [fuse_one(lp) for lp in layers]
    else:
        layers = fuse_one(layers)
    return {**params, "layers": layers}


def tile_output_head(params: Params, tile_out: int = 512) -> Params:
    """Repack an int8 vocab head into the tiled8 decode layout.

    The head is the second-largest per-token byte stream after the layer
    stack (0.5 GB/token for a 128k vocab); the tiled layout feeds the
    Pallas one-dot W8A8 kernel (ops/pallas_qmm.py::qmm_w8a8_tiled) instead
    of the slower barriered XLA int8 dot. Layout-only: logits are
    bit-identical (padded columns are sliced off inside ops/linear.py).
    Safe under TP at the moment only for tp == 1 callers, like colpack."""
    out_w = params.get("output")
    if is_quantized(out_w) and out_w.layout == "rowpack":
        from ..ops.linear import to_colpack_tiled, to_tiled_int8

        if out_w.kind == "int8":
            params = {**params, "output": to_tiled_int8(out_w, tile_out)}
        elif out_w.kind == "int4":
            # int4 head (--head_bits 4): colpack halves both the bytes and
            # the per-block MXU work; tiled for contiguous DMA.
            params = {**params, "output": to_colpack_tiled(out_w, tile_out)}
    return params


def colpack_layer_params(params: Params) -> Params:
    """Repack the layers' int4 leaves into the column-packed decode layout.

    The colpack format halves the Pallas W4A8 kernel's MXU work (2 dots over
    half the output width instead of 3 over half the input depth; see
    ops/pallas_qmm.py). Storage/interchange stays rowpack — this runs once at
    setup, layer by layer, on the already-stacked (and optionally fused)
    params. Like fuse_layer_params, callers gate on tp == 1: the colpack
    nibble pairing spans output columns (j, j + out/2), which tensor-parallel
    output sharding would split across devices.
    """

    def conv(leaf):
        if (
            is_quantized(leaf)
            and leaf.kind == "int4"
            and leaf.layout == "rowpack"
        ):
            cp = to_colpack(leaf)
            from ..ops.pallas_qmm import cpt_enabled, qmm_split_streams

            if cpt_enabled():
                from ..ops.linear import to_cpt, to_cpt_split

                out = to_cpt(cp)
                S = qmm_split_streams()
                if (
                    S > 1
                    and out.w.ndim == 4
                    and out.w.shape[1] % S == 0
                ):
                    out = to_cpt_split(out, S)
                return out
            return cp
        return leaf

    layers = params["layers"]
    is_leaf = is_quantized
    if isinstance(layers, list):
        layers = [
            jax.tree.map(conv, lp, is_leaf=is_leaf) for lp in layers
        ]
    else:
        layers = jax.tree.map(conv, layers, is_leaf=is_leaf)
    return {**params, "layers": layers}


def model_size_bytes(params: Params) -> int:
    """Non-embedding parameter bytes (reference: generation_utils.py:569-575)."""
    total = 0
    emb = params["tok_embeddings"]
    emb_ids = {id(leaf) for leaf in jax.tree.leaves(emb)}
    for leaf in jax.tree.leaves(params):
        if id(leaf) not in emb_ids:
            total += leaf.size * leaf.dtype.itemsize
    return total
