"""Tensor-parallel decode (and prefill) with per-device Pallas kernels.

The GSPMD path (parallel/mesh.py) shards *rowpack* quantized weights with
PartitionSpecs and lets XLA insert the collectives — but Pallas custom
calls cannot be auto-partitioned, so under GSPMD every quantized matmul
falls back to the XLA dequant path and TP decode loses the W4A8/W8A8
kernels entirely. The reference does NOT pay this cost: its int4 CUDA
kernel keeps running under TP because tp.py shards ``scales_and_zeros``
alongside the packed weights (reference: tp.py:90-114). This module is
the TPU equivalent: an explicit ``shard_map`` run mode where each device
holds its own *locally repacked* weight shard (colpack / tiled layouts,
ops/linear.py) and runs the same Pallas kernels as the single-chip path,
with the two per-layer ``psum``s and one head ``all_gather`` as the only
communication (the tp.py scheme: column-parallel wq/wk/wv/w1/w3,
row-parallel wo/w2, vocab-sharded head).

Layout notes (why repack must be per-shard):

* colpack pairs output columns (j, j + OUT/2) in one byte — a global
  colpack would pair columns living on different devices. Column-parallel
  leaves are therefore sliced on OUT first and colpack-repacked per shard.
* rowpack packs input rows (r, r + IN/2) per byte — slicing IN splits the
  nibble pairs. Row-parallel int4 leaves go through colpack FIRST (its
  input axis is unpacked), then slice IN rows and their scale groups.
* Per-device local arrays are stacked on a leading device axis and fed to
  ``shard_map`` with ``P('tp', ...)`` — each device sees exactly its own
  repack. This sidesteps any "global array whose shards happen to be
  valid local layouts" gymnastics.

Numerics vs tp=1: identical math for column-parallel kernels (activation
rows are full-IN); row-parallel W4A8 quantizes activations per local IN
segment, so outputs differ from tp=1 at the usual activation-quantization
scale (tests/test_tp_kernels.py bounds it).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models import transformer as T
from ..models.config import ModelConfig
from ..ops.linear import (
    dequantize_weight,
    is_quantized,
    to_colpack,
    to_colpack_tiled,
    to_tiled_int8,
)
from ..ops.pallas_qmm import tiled_head_enabled

def _dp_tp_cache_specs(caches):
    """Batch axis on dp, KV-head axis on tp (head-locality rationale:
    parallel/mesh.py::cache_pspecs). Handles stacked [L, B, KVH, ...] and
    per-layer [B, KVH, ...] leaves."""
    from ..caches.base import CacheState

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
                return P(*lead, "dp", "tp", *([None] * (x.ndim - off - 2)))
            return P(*([None] * x.ndim))

        return jax.tree.map(leaf_spec, state)

    if isinstance(caches, CacheState):
        return one(caches)
    return tuple(one(st) for st in caches)


def _lane_spec(arr):
    """Per-lane vectors ([B]) shard on dp; scalars stay replicated."""
    return P("dp") if getattr(arr, "ndim", 0) == 1 else P()

_COL = ("wq", "wk", "wv", "w1", "w3", "bq", "bk", "bv")
_ROW = ("wo", "w2")


def make_tp_mesh(tp: int, dp: int = 1, devices=None) -> Mesh:
    """(dp, tp) mesh, tp innermost (its two per-layer psums are the
    latency-critical collectives); dp shards the batch axis and needs no
    in-layer communication."""
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= dp * tp, (
        f"Need {dp * tp} devices, have {len(devices)}"
    )
    return Mesh(
        np.asarray(devices[: dp * tp]).reshape(dp, tp),
        axis_names=("dp", "tp"),
    )


def _slice_last(a, t: int, tp: int):
    n = a.shape[-1]
    assert n % tp == 0, f"output dim {n} must divide tp={tp}"
    s = n // tp
    return a[..., t * s:(t + 1) * s]


def _col_local(leaf, t: int, tp: int):
    """Column-parallel shard: slice the output axis; int4 rowpack is then
    colpack-repacked per shard (decode-kernel layout)."""
    if leaf is None:
        return None
    if is_quantized(leaf):
        sl = dataclasses.replace(
            leaf,
            w=_slice_last(leaf.w, t, tp),
            scales=_slice_last(leaf.scales, t, tp),
            zeros=None
            if leaf.zeros is None
            else _slice_last(leaf.zeros, t, tp),
        )
        if sl.kind == "int4" and sl.layout == "rowpack":
            sl = to_colpack(sl)
        return sl
    return _slice_last(leaf, t, tp)  # dense weight [.., IN, OUT] or bias


def _row_local(leaf, t: int, tp: int):
    """Row-parallel shard: slice the input axis (int4 via colpack, whose
    input axis is unpacked; rowpack's packed IN would split nibble pairs)."""
    if leaf is None:
        return None
    if is_quantized(leaf):
        if leaf.kind == "int4":
            assert leaf.layout == "rowpack", "repack before sharding"
            cp = to_colpack(leaf)  # w [.., IN, OUT/2], meta [.., 2, G, OUT/2]
            in_dim = cp.w.shape[-2]
            assert in_dim % tp == 0
            s = in_dim // tp
            gs = leaf.group_size
            assert s % gs == 0, (
                f"per-shard input rows ({s}) must align to quantization "
                f"groups ({gs}); lower tp or the group size"
            )
            g = s // gs
            return dataclasses.replace(
                cp,
                w=cp.w[..., t * s:(t + 1) * s, :],
                scales=cp.scales[..., t * g:(t + 1) * g, :],
                zeros=cp.zeros[..., t * g:(t + 1) * g, :],
            )
        # int8: w [.., IN, OUT], per-output-channel scales replicated.
        in_dim = leaf.w.shape[-2]
        assert in_dim % tp == 0
        s = in_dim // tp
        return dataclasses.replace(leaf, w=leaf.w[..., t * s:(t + 1) * s, :])
    in_dim = leaf.shape[-2]
    assert in_dim % tp == 0
    s = in_dim // tp
    return leaf[..., t * s:(t + 1) * s, :]


def _head_local(out_w, t: int, tp: int):
    """Vocab-sharded head, repacked per shard into the decode layout the
    single-chip path uses (tiled8 / colpack[_tiled] under CCT_TILED_HEAD)."""
    if out_w is None:
        return None
    tiled = tiled_head_enabled()
    if is_quantized(out_w):
        sl = dataclasses.replace(
            out_w,
            w=_slice_last(out_w.w, t, tp),
            scales=_slice_last(out_w.scales, t, tp),
            zeros=None
            if out_w.zeros is None
            else _slice_last(out_w.zeros, t, tp),
        )
        if sl.kind == "int8" and sl.layout == "rowpack" and tiled:
            sl = to_tiled_int8(sl)
        elif sl.kind == "int4" and sl.layout == "rowpack":
            sl = to_colpack_tiled(sl) if tiled else to_colpack(sl)
        return sl
    return _slice_last(out_w, t, tp)


class TpContext(NamedTuple):
    """Everything the shard_map TP run mode needs, built once at setup."""

    mesh: Mesh
    slim: dict          # replicated: tok_embeddings, norm
    layers: Any         # [tp, NL, ...] per-device local layer stacks
    head: Any           # [tp, ...] per-device local vocab head (or None)


def _stack_locals(locals_list):
    """Stack per-device pytrees on a new leading device axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *locals_list)


def _device_axis_specs(tree):
    return jax.tree.map(lambda a: P("tp", *([None] * (a.ndim - 1))), tree)


def _replicated_specs(tree):
    return jax.tree.map(lambda a: P(*([None] * a.ndim)), tree)


def _strip_device_axis(tree):
    return jax.tree.map(lambda a: a[0], tree)


def prepare_tp(cfg: ModelConfig, params, tp: int, dp: int = 1,
               devices=None) -> TpContext:
    """Build the per-device local param stacks for shard_map TP.

    ``params`` may be per-layer lists or pre-stacked; quantized leaves must
    still be in their storage layouts (rowpack int4 / rowmajor int8) —
    repacking into the decode layouts happens here, per shard.
    """
    assert cfg.n_kv_head % tp == 0 and cfg.n_head % tp == 0, (
        f"tp={tp} must divide n_head={cfg.n_head} / n_kv_head={cfg.n_kv_head}"
    )
    assert cfg.intermediate_size % tp == 0
    params = T.stack_layer_params(params)
    layers = params["layers"]
    assert "wqkv" not in layers["attn"], (
        "prepare_tp shards per-projection weights; do not fuse_layer_params "
        "before it (fused q|k|v pairs columns across shard boundaries)"
    )

    def one_device(t):
        attn = {
            k: (_col_local(v, t, tp) if k in _COL else _row_local(v, t, tp))
            for k, v in layers["attn"].items()
        }
        ffn = {
            k: (_col_local(v, t, tp) if k in _COL else _row_local(v, t, tp))
            for k, v in layers["ffn"].items()
        }
        return {
            "attn": attn,
            "ffn": ffn,
            "attention_norm": layers["attention_norm"],
            "ffn_norm": layers["ffn_norm"],
        }

    local_layers = _stack_locals([one_device(t) for t in range(tp)])
    head = params["output"]
    local_head = (
        None
        if head is None
        else _stack_locals([_head_local(head, t, tp) for t in range(tp)])
    )
    slim = {
        "tok_embeddings": params["tok_embeddings"],
        "norm": params["norm"],
    }
    return TpContext(
        mesh=make_tp_mesh(tp, dp=dp, devices=devices),
        slim=slim,
        layers=local_layers,
        head=local_head,
    )


def _local_cfg(cfg: ModelConfig, tp: int) -> ModelConfig:
    """Head-divided config for the per-device forward (the reference's TP
    config division, tp.py:163-168): derived head_dim is unchanged."""
    return cfg.replace(
        n_head=cfg.n_head // tp,
        n_kv_head=cfg.n_kv_head // tp,
        dim=cfg.dim // tp,
    )


def _tp_logits(cfg: ModelConfig, slim, head, x):
    """Final-norm + vocab projection: local columns, then a tiled gather
    (shard-major column order == contiguous vocab blocks)."""
    xn = T.rms_norm(x, slim["norm"], cfg.norm_eps)
    if head is None:  # tied embeddings: table replicated, no gather
        emb = slim["tok_embeddings"]
        if is_quantized(emb):
            emb = dequantize_weight(emb, xn.dtype)
        return jax.lax.dot_general(
            xn, emb, (((xn.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    loc = T.linear(xn, head).astype(jnp.float32)
    return jax.lax.all_gather(loc, "tp", axis=-1, tiled=True)


def _tp_layer_fn(cfg, cfg_loc, lp, x, cache, input_pos, freqs, token,
                 attn_top_k, valid=None, prompt_len=None, tokens=None):
    """One transformer layer on local heads/columns with the two psums the
    reference registers as all-reduce hooks (tp.py:134-138, 156-160)."""
    xr = T.rms_norm(x, lp["attention_norm"], cfg.norm_eps)
    if valid is None:  # decode
        attn_out, cache = T.attention_decode(
            cfg_loc, lp["attn"], xr, cache, input_pos, freqs,
            attn_top_k=attn_top_k, token=token,
        )
    else:  # prefill
        attn_out, cache = T.attention_prefill(
            cfg_loc, lp["attn"], xr, cache, input_pos, valid, prompt_len,
            freqs, tokens=tokens,
        )
    h = x + jax.lax.psum(attn_out, "tp")
    ffn = T.feed_forward(lp["ffn"], T.rms_norm(h, lp["ffn_norm"], cfg.norm_eps))
    return h + jax.lax.psum(ffn, "tp"), cache


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def tp_prefill(
    cfg: ModelConfig,
    mesh: Mesh,
    slim,
    layers,
    head,
    rope: jax.Array,
    caches,
    tokens: jax.Array,  # [B, P]
    prompt_len: jax.Array,
):
    """Tensor-parallel prefill from the SAME per-device weight shards the
    decode loop streams — no second (GSPMD-layout) weight copy in HBM.
    Quantized matmuls route per device exactly as on a single chip
    (W4A8 prefill kernel under CCT_PREFILL_W4A8, else local XLA dequant).
    Returns (last-position logits [B, vocab] f32, caches)."""
    B, Pfull = tokens.shape
    tp = mesh.shape["tp"]
    assert B % mesh.shape["dp"] == 0, "batch must divide the dp axis"
    cfg_loc = _local_cfg(cfg, tp)
    plen = jnp.asarray(prompt_len, jnp.int32)
    freqs = rope[:Pfull]
    cache_specs = _dp_tp_cache_specs(caches)

    def f(slim, layers, head, caches, tokens, plen):
        layers = _strip_device_axis(layers)
        head = None if head is None else _strip_device_axis(head)
        Bl = tokens.shape[0]  # local lanes (B / dp)
        input_pos = jnp.arange(Pfull, dtype=jnp.int32)
        plen_b = jnp.broadcast_to(jnp.atleast_1d(plen), (Bl,))
        valid = input_pos[None, :] < plen_b[:, None]
        x = T._embed(slim, tokens)

        def body(x, inp):
            i, cache = inp
            x, cache = _tp_layer_fn(
                cfg, cfg_loc, T._layer_view(layers, i), x, cache,
                input_pos, freqs, None, 1.0,
                valid=valid, prompt_len=plen, tokens=tokens,
            )
            return x, cache

        x, new_caches = jax.lax.scan(
            body, x, (jnp.arange(cfg.n_layer), caches)
        )
        last = x[jnp.arange(Bl), plen_b - 1]  # [Bl, D]
        logits = _tp_logits(cfg, slim, head, last[:, None])[:, 0]
        return logits, new_caches

    return shard_map(
        f,
        mesh=mesh,
        in_specs=(
            _replicated_specs(slim), _device_axis_specs(layers),
            None if head is None else _device_axis_specs(head),
            cache_specs, P("dp", None), _lane_spec(plen),
        ),
        out_specs=(P("dp", None), cache_specs),
        check_vma=False,
    )(slim, layers, head, caches, tokens, plen)


@partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "max_steps", "attn_top_k"),
    donate_argnames=("caches",),
)
def tp_decode_loop(
    cfg: ModelConfig,
    mesh: Mesh,
    slim,
    layers,
    head,
    rope: jax.Array,
    caches,
    first_token: jax.Array,
    start_pos: jax.Array,
    prefix: jax.Array,
    terminators: jax.Array,
    max_steps: int,
    attn_top_k: float = 1.0,
):
    """The full decode while_loop under shard_map: per-device Pallas weight
    streaming, head-sharded caches/attention, two psums per layer and one
    logits all_gather per token. Same contract as runtime._decode_loop_jit.
    """
    tp = mesh.shape["tp"]
    dp = mesh.shape["dp"]
    cfg_loc = _local_cfg(cfg, tp)
    cache_specs = _dp_tp_cache_specs(caches)

    def f(slim, layers, head, rope, caches, first_token, start_pos, prefix,
          terminators):
        layers = _strip_device_axis(layers)
        head = None if head is None else _strip_device_axis(head)

        def step_fn(caches, token, input_pos):
            B = token.shape[0]
            ipos = jnp.atleast_1d(jnp.asarray(input_pos, jnp.int32))
            freqs = jnp.take(rope, ipos, axis=0)[:, None]
            x = T._embed(slim, token[:, None])

            def body(x, inp):
                i, cache = inp
                x, cache = _tp_layer_fn(
                    cfg, cfg_loc, T._layer_view(layers, i), x, cache,
                    input_pos, freqs, token, attn_top_k,
                )
                return x, cache

            x, new_caches = jax.lax.scan(
                body, x, (jnp.arange(cfg.n_layer), caches)
            )
            logits = _tp_logits(cfg, slim, head, x)[:, 0]
            return logits, new_caches

        from ..runtime.generate import decode_loop_core

        # dp lanes live on different devices: the stop decision must see
        # every lane's done flag (a collective, run in the loop body).
        all_done = (
            jnp.all
            if dp == 1
            else lambda d: jnp.all(
                jax.lax.all_gather(d, "dp", axis=0, tiled=True)
            )
        )
        return decode_loop_core(
            cfg, step_fn, caches, first_token, start_pos, prefix,
            terminators, max_steps, all_done=all_done,
        )

    return shard_map(
        f,
        mesh=mesh,
        in_specs=(
            _replicated_specs(slim), _device_axis_specs(layers),
            None if head is None else _device_axis_specs(head),
            P(), cache_specs, P("dp"), _lane_spec(start_pos), P(), P(),
        ),
        out_specs=(
            P(None, "dp"),  # tokens_buf [steps+1, B]
            P(None, "dp"),  # probs_buf [steps, B]
            P(),            # n_steps
            P("dp", None),  # last_probs [B, vocab]
            cache_specs,
        ),
        check_vma=False,
    )(
        slim, layers, head, rope, caches, first_token,
        start_pos, prefix, terminators,
    )
