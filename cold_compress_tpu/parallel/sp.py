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
f32 summation order. Hybrid (FastGen) profiling needs full attention maps
and is not supported under SP; every score/summary-based strategy is.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..caches import get_cache_strategy, get_prompt_compressor
from ..caches.base import CacheState
from ..models import transformer as T
from ..models.config import ModelConfig
from ..ops.attention import chunked_prefill_partial, finalize_summary


def make_sp_mesh(sp: int, devices=None) -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= sp, f"Need {sp} devices, have {len(devices)}"
    return Mesh(np.asarray(devices[:sp]), axis_names=("sp",))


def sp_supported(caches) -> bool:
    """SP covers every strategy whose prefill consumes per-key summaries;
    hybrid profiling (full attention maps) is the exception."""
    specs = (
        [caches.spec]
        if isinstance(caches, CacheState)
        else [c.spec for c in (caches if isinstance(caches, tuple) else [caches])]
    )
    return all(
        not hasattr(
            get_cache_strategy(s.cache_strategy), "profile_prefill"
        )
        for s in specs
    )


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
