"""Sequence-parallel (SP) prefill over a device mesh.

Long-prompt prefill is the one phase where activations dominate memory and
FLOPs scale O(P²); the reference handles long context exclusively by
*compressing* the KV cache (SURVEY §5.7 — it has no sequence parallelism
of any kind). This module adds the TPU-native missing piece: shard the
prompt's QUERY blocks over a mesh axis with ``shard_map``, all-gather each
layer's K/V over ICI, and psum the per-key attention-summary partials so
every device runs the identical (replicated) cache fill.

Design (per layer, inside shard_map):

  x_loc [B, P/sp, D]                         sequence-sharded activations
  q,k,v = qkv(x_loc)                         local projections + RoPE
  k_all, v_all = all_gather(k|v, 'sp')       [B, KVH, P, hd] on every device
  y_loc, cum_p, obs_p = chunked_prefill_partial(q, k_all, v_all,
                                               q_offset=shard*P/sp)
  cum, obs = psum(cum_p|obs_p, 'sp')         exact: summaries are sums over
                                             query rows (ops/attention.py)
  cache = fill_from_kv(k_all, v_all, summary) replicated fill -> replicated
                                             caches, ready for decode

The attention itself is exact (each query row's softmax is independent;
key axis is never chunked), so SP output == single-device output up to
f32 summation order. Hybrid (FastGen) profiling rides the same scheme:
its accumulators are per-COLUMN sums over query rows (caches/hybrid.py
``_profile_partial``), so each device profiles its own query shard, the
partials psum over 'sp', and the policy pick + reordered fill run
replicated (``HybridCache.fill_after_profile``).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..caches import get_cache_strategy, get_prompt_compressor
from ..caches.base import CacheState
from ..caches.hybrid import _profile_partial
from ..models import transformer as T
from ..models.config import ModelConfig
from ..ops.attention import chunked_prefill_partial, finalize_summary


def make_sp_mesh(sp: int, devices=None) -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= sp, f"Need {sp} devices, have {len(devices)}"
    return Mesh(np.asarray(devices[:sp]), axis_names=("sp",))


def sp_supported(caches) -> bool:
    """SP covers every strategy: summary-based fills psum per-key summary
    partials, and hybrid profiling psums its column accumulators (both are
    sums over the sharded query axis)."""
    return True


@partial(jax.jit, static_argnames=("cfg", "mesh", "obs_len"))
def sp_prefill(
    cfg: ModelConfig,
    params,
    rope: jax.Array,
    caches,
    tokens: jax.Array,  # [B, P]; P must divide by mesh.shape['sp']
    prompt_len: jax.Array,  # scalar int32
    mesh: Mesh,
    obs_len: int = 16,
) -> Tuple[jax.Array, object]:
    """Sequence-parallel prefill. Returns (last-position logits [B, vocab]
    f32, caches) — caches replicated across the sp axis, so decode can
    proceed on any single device (or under a tp resharding)."""
    B, Pfull = tokens.shape
    sp = mesh.shape["sp"]
    assert Pfull % sp == 0, f"prompt bucket {Pfull} % sp {sp} != 0"
    Ploc = Pfull // sp
    stacked = T.is_stacked(caches)
    if stacked:
        layers = T.stack_layer_params(params)["layers"]
    elif isinstance(params["layers"], (list, tuple)):
        layers = params["layers"]
    else:  # stacked params over heterogeneous caches: unroll static views
        layers = [
            T._layer_view(params["layers"], i) for i in range(cfg.n_layer)
        ]

    plen = jnp.asarray(prompt_len, jnp.int32)
    freqs = rope[:Pfull]

    def f(params, layers, tokens_loc, freqs_loc, caches, plen):
        shard = jax.lax.axis_index("sp")
        offset = shard * Ploc
        input_pos = jnp.arange(Pfull, dtype=jnp.int32)
        plen_b = jnp.broadcast_to(jnp.atleast_1d(plen), (B,))
        valid = input_pos[None, :] < plen_b[:, None]  # [B, Pfull]
        x = T._embed(params, tokens_loc)  # [B, Ploc, D]
        tokens_all = jax.lax.all_gather(
            tokens_loc, "sp", axis=1, tiled=True
        )  # [B, Pfull] — hybrid profiling masks need the full ids

        def layer_fn(x, lp, cache):
            spec = cache.spec
            strategy = get_cache_strategy(spec.cache_strategy)
            compressor = get_prompt_compressor(
                spec.prompt_compression_strategy
            )
            xr = T.rms_norm(x, lp["attention_norm"], cfg.norm_eps)
            q, k, v = T._qkv(cfg, lp["attn"], xr, freqs_loc)
            k_all = jax.lax.all_gather(k, "sp", axis=2, tiled=True)
            v_all = jax.lax.all_gather(v, "sp", axis=2, tiled=True)
            if hasattr(strategy, "profile_prefill"):
                # Hybrid/FastGen: profile this shard's query rows, psum the
                # column accumulators, then run the (replicated) policy
                # pick + reordered fill. Mirrors the summary psum below.
                y, _, _ = chunked_prefill_partial(
                    q, k_all, v_all, plen, q_offset=offset
                )
                cum_p, wcols_p = _profile_partial(
                    spec, q, k_all, plen, q_offset=offset
                )
                cum = jax.lax.psum(cum_p, "sp")
                wcols = jax.lax.psum(wcols_p, "sp")
                cache = strategy.fill_after_profile(
                    spec, cache, cum, wcols, k_all, v_all, tokens_all,
                    input_pos, valid, plen,
                )
            else:
                y, cum_p, obs_p = chunked_prefill_partial(
                    q, k_all, v_all, plen, q_offset=offset,
                    need_summary=True, obs_len=obs_len,
                )
                cum = jax.lax.psum(cum_p, "sp")
                obs = jax.lax.psum(obs_p, "sp")
                summary = finalize_summary(cum, obs, plen_b, Pfull, obs_len)
                cache = T.fill_from_kv(
                    strategy, compressor, cache, k_all, v_all, summary,
                    input_pos, valid, plen,
                )
            y = y.transpose(0, 2, 1, 3).reshape(
                B, Ploc, cfg.n_head * cfg.head_dim
            )
            attn_out = T.linear(y, lp["attn"]["wo"])
            return T._block(cfg, lp, x, attn_out), cache

        if stacked:
            def body(x, inp):
                i, cache = inp
                x, cache = layer_fn(x, T._layer_view(layers, i), cache)
                return x, cache

            x, new_caches = jax.lax.scan(
                body, x, (jnp.arange(cfg.n_layer), caches)
            )
        else:
            new_list = []
            for lp, cache in zip(layers, caches):
                x, cache = layer_fn(x, lp, cache)
                new_list.append(cache)
            new_caches = tuple(new_list)

        # Last valid hidden state: the owning shard contributes it, psum
        # broadcasts it (exactly one shard's mask row is hot per lane).
        local_pos = offset + jnp.arange(Ploc)
        sel = (local_pos[None, :] == (plen_b - 1)[:, None]).astype(x.dtype)
        x_last = jax.lax.psum(
            jnp.einsum("bl,bld->bd", sel, x), "sp"
        )  # [B, D]
        logits = T._logits(cfg, params, x_last[:, None])[:, 0]
        return logits, new_caches

    rep = lambda tree: jax.tree.map(lambda _: P(), tree)  # noqa: E731
    cache_specs = rep(caches)
    out = shard_map(
        f,
        mesh=mesh,
        in_specs=(
            rep(params), rep(layers), P(None, "sp"), P("sp"),
            cache_specs, P(),
        ),
        out_specs=(P(), cache_specs),
        check_vma=False,
    )(params, layers, tokens, freqs, caches, plen)
    return out


# --------------------------------------------------------------------------
# SP x TP: 2-D mesh prefill
# --------------------------------------------------------------------------


def make_sp_tp_mesh(sp: int, tp: int, devices=None) -> Mesh:
    """(sp, tp) mesh with tp innermost (tp's per-layer all-reduces are the
    latency-critical collective; sp's all-gathers overlap layer compute)."""
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= sp * tp
    return Mesh(
        np.asarray(devices[: sp * tp]).reshape(sp, tp),
        axis_names=("sp", "tp"),
    )


def _tp_param_specs(params, cfg: ModelConfig):
    """Spec tree for dense params under shard_map: col-sharded q/k/v/w1/w3,
    row-sharded wo/w2 (the tp.py scheme, reference tp.py:78-160), replicated
    norms/embeddings, vocab-sharded head. Dense leaves only (the quantized
    decode path runs under GSPMD instead)."""

    def layer_spec(lp, lead):
        def col(a):
            return P(*lead, None, "tp")

        def row(a):
            return P(*lead, "tp", None)

        attn = {}
        for k in lp["attn"]:
            if k in ("wq", "wk", "wv", "wqkv"):
                attn[k] = col(lp["attn"][k])
            elif k == "wo":
                attn[k] = row(lp["attn"][k])
            else:  # biases on the sharded output axis
                attn[k] = P(*lead, "tp")
        ffn = {
            k: (row(v) if k == "w2" else col(v))
            for k, v in lp["ffn"].items()
        }
        return {
            "attn": attn,
            "ffn": ffn,
            "attention_norm": P(*lead, None),
            "ffn_norm": P(*lead, None),
        }

    layers = params["layers"]
    if isinstance(layers, (list, tuple)):
        lspec = [layer_spec(lp, ()) for lp in layers]
    else:
        lspec = layer_spec(layers, (None,))
    return {
        "tok_embeddings": P(),
        "norm": P(),
        "output": None if params["output"] is None else P(None, "tp"),
        "layers": lspec,
    }


def _tp_cache_specs(caches):
    """KV-head axis on tp, everything else replicated (eviction/state are
    head-local — parallel/mesh.py::cache_pspecs rationale)."""
    stacked = isinstance(caches, CacheState)
    states = [caches] if stacked else list(caches)

    def one(state):
        off = 1 if state.pos.ndim == 4 else 0
        B, KVH = state.pos.shape[off], state.pos.shape[off + 1]
        lead = (None,) * off

        def leaf_spec(x):
            if x is None:
                return None
            if (
                x.ndim >= off + 2
                and x.shape[off] == B
                and x.shape[off + 1] == KVH
            ):
                return P(*lead, None, "tp", *([None] * (x.ndim - off - 2)))
            return P(*([None] * x.ndim))

        return jax.tree.map(leaf_spec, state)

    return one(caches) if stacked else tuple(one(s) for s in states)


@partial(jax.jit, static_argnames=("cfg", "mesh", "obs_len"))
def sp_tp_prefill(
    cfg: ModelConfig,
    params,
    rope: jax.Array,
    caches,
    tokens: jax.Array,  # [B, P]
    prompt_len: jax.Array,
    mesh: Mesh,
    obs_len: int = 16,
):
    """2-D sequence x tensor parallel prefill.

    Query blocks shard over 'sp'; heads/FFN columns shard over 'tp'
    (reference tp.py's scheme, expressed as manual collectives inside
    shard_map: K/V all-gather on 'sp', summary psums on 'sp', one psum per
    attention/FFN output on 'tp'). Caches come back head-sharded on 'tp'
    and replicated on 'sp' — exactly the layout the GSPMD tp decode path
    uses. Dense (bf16/f32) weights only."""
    from ..ops.linear import is_quantized as _isq

    assert not any(
        map(_isq, jax.tree.leaves(params, is_leaf=_isq))
    ), "sp_tp_prefill: dense weights only (quantized runs under GSPMD tp)"
    B, Pfull = tokens.shape
    sp, tp = mesh.shape["sp"], mesh.shape["tp"]
    assert Pfull % sp == 0
    assert cfg.n_kv_head % tp == 0 and cfg.n_head % tp == 0
    Ploc = Pfull // sp
    # Head-divided local view, like the reference's TP config division
    # (tp.py:163-168): dim scales with n_head so the derived head_dim is
    # unchanged.
    cfg_loc = cfg.replace(
        n_head=cfg.n_head // tp,
        n_kv_head=cfg.n_kv_head // tp,
        dim=cfg.dim // tp,
    )
    stacked = T.is_stacked(caches)
    if stacked:
        layers = T.stack_layer_params(params)["layers"]
        lead = (None,)
    elif isinstance(params["layers"], (list, tuple)):
        layers = params["layers"]
        lead = ()
    else:
        layers = [
            T._layer_view(params["layers"], i) for i in range(cfg.n_layer)
        ]
        lead = ()

    plen = jnp.asarray(prompt_len, jnp.int32)
    freqs = rope[:Pfull]

    def f(params, layers, tokens_loc, freqs_loc, caches, plen):
        shard = jax.lax.axis_index("sp")
        offset = shard * Ploc
        input_pos = jnp.arange(Pfull, dtype=jnp.int32)
        plen_b = jnp.broadcast_to(jnp.atleast_1d(plen), (B,))
        valid = input_pos[None, :] < plen_b[:, None]
        x = T._embed(params, tokens_loc)
        tokens_all = jax.lax.all_gather(
            tokens_loc, "sp", axis=1, tiled=True
        )  # [B, Pfull]

        def layer_fn(x, lp, cache):
            spec = cache.spec
            strategy = get_cache_strategy(spec.cache_strategy)
            compressor = get_prompt_compressor(
                spec.prompt_compression_strategy
            )
            xr = T.rms_norm(x, lp["attention_norm"], cfg.norm_eps)
            # Local heads: wq/wk/wv are column-sharded, so _qkv with the
            # head-divided config produces this shard's heads.
            q, k, v = T._qkv(cfg_loc, lp["attn"], xr, freqs_loc)
            k_all = jax.lax.all_gather(k, "sp", axis=2, tiled=True)
            v_all = jax.lax.all_gather(v, "sp", axis=2, tiled=True)
            if hasattr(strategy, "profile_prefill"):
                # Hybrid under sp x tp: heads are tp-local (the cache's KV
                # head axis is tp-sharded to match), queries sp-sharded;
                # the column accumulators psum over 'sp' only.
                y, _, _ = chunked_prefill_partial(
                    q, k_all, v_all, plen, q_offset=offset
                )
                cum_p, wcols_p = _profile_partial(
                    spec, q, k_all, plen, q_offset=offset
                )
                cum = jax.lax.psum(cum_p, "sp")
                wcols = jax.lax.psum(wcols_p, "sp")
                cache = strategy.fill_after_profile(
                    spec, cache, cum, wcols, k_all, v_all, tokens_all,
                    input_pos, valid, plen,
                )
            else:
                y, cum_p, obs_p = chunked_prefill_partial(
                    q, k_all, v_all, plen, q_offset=offset,
                    need_summary=True, obs_len=obs_len,
                )
                cum = jax.lax.psum(cum_p, "sp")
                obs = jax.lax.psum(obs_p, "sp")
                summary = finalize_summary(cum, obs, plen_b, Pfull, obs_len)
                cache = T.fill_from_kv(
                    strategy, compressor, cache, k_all, v_all, summary,
                    input_pos, valid, plen,
                )
            y = y.transpose(0, 2, 1, 3).reshape(
                B, Ploc, cfg_loc.n_head * cfg.head_dim
            )
            # Row-sharded wo: local partial, summed over tp.
            attn_out = jax.lax.psum(T.linear(y, lp["attn"]["wo"]), "tp")
            h = x + attn_out
            ffn_part = T.feed_forward(
                lp["ffn"], T.rms_norm(h, lp["ffn_norm"], cfg.norm_eps)
            )
            return h + jax.lax.psum(ffn_part, "tp"), cache

        if stacked:
            def body(x, inp):
                i, cache = inp
                x, cache = layer_fn(x, T._layer_view(layers, i), cache)
                return x, cache

            x, new_caches = jax.lax.scan(
                body, x, (jnp.arange(cfg.n_layer), caches)
            )
        else:
            new_list = []
            for lp, cache in zip(layers, caches):
                x, cache = layer_fn(x, lp, cache)
                new_list.append(cache)
            new_caches = tuple(new_list)

        local_pos = offset + jnp.arange(Ploc)
        sel = (local_pos[None, :] == (plen_b - 1)[:, None]).astype(x.dtype)
        x_last = jax.lax.psum(jnp.einsum("bl,bld->bd", sel, x), "sp")
        xn = T.rms_norm(x_last[:, None], params["norm"], cfg.norm_eps)
        out_w = params["output"]
        if out_w is None:  # tied embeddings: table is replicated
            logits = jnp.einsum(
                "bld,vd->blv", xn, params["tok_embeddings"]
            ).astype(jnp.float32)[:, 0]
        else:  # vocab-sharded head: local columns then gather
            logits_loc = jnp.einsum("bld,dv->blv", xn, out_w).astype(
                jnp.float32
            )[:, 0]
            logits = jax.lax.all_gather(
                logits_loc, "tp", axis=-1, tiled=True
            )
        return logits, new_caches

    # Slim non-layer params (embeddings/norm/head) — the layer stack rides
    # separately with tp shardings.
    slim = {
        "tok_embeddings": params["tok_embeddings"],
        "norm": params["norm"],
        "output": params["output"],
    }
    slim_spec = {
        "tok_embeddings": P(),
        "norm": P(),
        "output": None if params["output"] is None else P(None, "tp"),
    }
    layers_spec = _tp_param_specs({**params, "layers": layers}, cfg)[
        "layers"
    ]
    cache_specs = _tp_cache_specs(caches)
    out = shard_map(
        f,
        mesh=mesh,
        in_specs=(
            slim_spec, layers_spec, P(None, "sp"), P("sp"),
            cache_specs, P(),
        ),
        out_specs=(P(), cache_specs),
        check_vma=False,
    )(slim, layers, tokens, freqs, caches, plen)
    return out
