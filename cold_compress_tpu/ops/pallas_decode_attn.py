"""Fused decode attention over the (optionally quantized) KV cache (Pallas).

With ``--cache_bits`` set, the XLA path dequantizes the whole cache to bf16
in HBM every decode step (caches/base.py::materialize_kv) — the exact slow
path the reference pays (reference: cache.py:323-339, quantized K/V are
dequantized wholesale each forward). Here the packed cache rides HBM->VMEM
in its quantized form and is dequantized on the VPU inside the kernel, so a
cache_bits=8 cache streams HALF the bytes of a bf16 cache (int4: quarter)
and nothing quantization-related ever round-trips HBM.

The kernel also serves *bf16* caches (``bits=16``): XLA's decode einsum
streams the cache at ~240 GB/s on this part, while one fat Pallas program
per batch element streams at near-HBM speed.

Layout notes:
* grid = (B,): ONE program per batch element, the KVH head loop statically
  unrolled inside. Grid steps carry multi-microsecond fixed overhead on this
  backend (measured ~8.6 us/step at (B, KVH) granularity = 69 us/layer for
  ~3 us of bytes); a single fat step amortizes it to noise.
* per head: packed K/V [C, D / packing] (or bf16 [C, D]), the 8-row query
  group block (G real rows, zero-padded), and an [8, C] f32 "meta" block
  carrying k_scale / k_zero' / v_scale / v_zero' / mask as rows
  (sublane-padded — Mosaic wants >= 8 sublanes).
* zero' = zero - 2^(bits-1) * scale folds the unsigned-storage offset into
  the affine constant, so dequant is one fused multiply-add per element.
* The group-pooled probabilities (heavy-hitter et al. consume [B, KVH, C])
  are averaged over the G real rows in-kernel and written as row 0 of a
  sublane-padded [8, C] output block.

Numerics match materialize_kv + ops/attention.py::gqa_attention to bf16
rounding (scores in f32, same softmax; V-aggregation in bf16 like the XLA
path's einsum).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

#: VMEM budget for one program's K+V blocks (bytes). One grid step means no
#: double-buffering pressure; leave headroom for q/meta/outputs.
_VMEM_KV_BUDGET = 10 * 2**20


def _oneshot_budget_bytes() -> int:
    """K+V byte budget for choosing the one-shot kernel. The chip's VMEM is
    ~128 MB and a one-step grid holds exactly one copy of every block, so
    one-shot stays profitable well past the conservative 10 MB chunk-path
    bound — an explicit vmem_limit_bytes accompanies any call above
    Mosaic's 16 MB default (the r2/r3 batches hit that limit twice).
    CCT_ATTN_OS_BUDGET_MB overrides (0 disables one-shot entirely)."""
    return int(os.environ.get("CCT_ATTN_OS_BUDGET_MB", "40")) * 2**20


def _dequant(q_ref_slice, scale, zero_p, bits: int):
    """Unpack + affine-dequant a packed [C, D/packing] uint8 block to f32
    [C, D]. ``zero_p`` already absorbs the -2^(bits-1)*scale offset."""
    p = q_ref_slice.astype(jnp.int32)
    if bits == 8:
        vals = p.astype(jnp.float32)
    else:
        # Half-split packing along D: segment s holds bit range s*bits.
        per = 8 // bits
        mask = (1 << bits) - 1
        segs = [((p >> (s * bits)) & mask).astype(jnp.float32)
                for s in range(per)]
        vals = jnp.concatenate(segs, axis=-1)
    return vals * scale[:, None] + zero_p[:, None]


def _dequant_segs(q_ref_slice, scale, zero_p, bits: int):
    """Like _dequant but yields the dequantized [C, D/per] segments without
    concatenating them: the lane-doubling concat is a Mosaic relayout that
    dominates the sub-byte path (hardware: cache_bits=4 decoded 75.3 vs the
    bf16 cache's 92.3 tok/s). Segment s covers head-dim columns
    [s*D/per, (s+1)*D/per) — callers dot each segment against the matching
    query/output columns, which is bit-identical math minus the relayout."""
    p = q_ref_slice.astype(jnp.int32)
    if bits == 8:
        return [p.astype(jnp.float32) * scale[:, None] + zero_p[:, None]]
    per = 8 // bits
    mask = (1 << bits) - 1
    return [
        ((p >> (s * bits)) & mask).astype(jnp.float32) * scale[:, None]
        + zero_p[:, None]
        for s in range(per)
    ]


def _int_segs(packed, bits: int):
    """Packed [C, D/per] uint8 block -> int8 MXU operands.

    bits=8: one segment, u - 128 via XOR 0x80 + bitcast (exact two's
    complement; pair with RAW zeros). bits=4/2: per bit-plane segments of
    UNSIGNED values (0..15 / 0..3, fit int8 directly; pair with the
    standard folded zero'). Segment s covers head-dim columns
    [s*D/per, (s+1)*D/per) like _dequant_segs."""
    if bits == 8:
        return [jax.lax.bitcast_convert_type(
            packed ^ jnp.uint8(0x80), jnp.int8
        )]
    per = 8 // bits
    mask = (1 << bits) - 1
    p = packed.astype(jnp.int32)
    return [((p >> (s * bits)) & mask).astype(jnp.int8)
            for s in range(per)]


def _i8_scores(q, kq_block, sk, k_off, scale, bits):
    """[8, C] attention scores via s8xs8->s32 MXU dots + rank-1 affine
    fixups (per-key-row scales make the dequant collapse to them)."""
    qf = q.astype(jnp.float32)
    qs = jnp.maximum(
        jnp.max(jnp.abs(qf), axis=-1, keepdims=True), 1e-8
    ) * (1.0 / 127.0)  # [8, 1]
    qq = jnp.round(qf / qs).astype(jnp.int8)
    qsum = jnp.sum(qf, axis=-1, keepdims=True)  # [8, 1] exact
    ksegs = _int_segs(kq_block, bits)
    Dseg = ksegs[0].shape[-1]
    di = sum(
        jax.lax.dot_general(
            qq[:, i * Dseg : (i + 1) * Dseg], kseg,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        for i, kseg in enumerate(ksegs)
    )  # [8, C]
    return (di.astype(jnp.float32) * qs * sk[None, :]
            + qsum * k_off[None, :]) * scale


def _i8_pv(e, vq_block, sv, v_off, bits):
    """e @ dequant(V) via int8 MXU dots: quantize (e * sv) rows to int8 —
    comparable error to the bf16 e cast the dequant paths pay — and fold
    the offset via one [8, C] @ [C] dot. ``e`` may be unnormalized
    (online-softmax chunks) — it scales out through ps/zterm."""
    ep = e * sv[None, :]
    ps = jnp.maximum(
        jnp.max(jnp.abs(ep), axis=-1, keepdims=True), 1e-30
    ) * (1.0 / 127.0)
    pq = jnp.round(ep / ps).astype(jnp.int8)
    dv = jnp.concatenate(
        [
            jax.lax.dot_general(
                pq, vseg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            for vseg in _int_segs(vq_block, bits)
        ],
        axis=-1,
    )  # [8, D]
    zterm = jnp.sum(e * v_off[None, :], axis=-1, keepdims=True)
    return dv.astype(jnp.float32) * ps + zterm


def _kernel(q_ref, kq_ref, vq_ref, meta_ref, o_ref, p_ref, *, KVH, G, scale,
            bits, need_attn, i8dot=False):
    for h in range(KVH):  # static unroll: one fat program per batch element
        q = q_ref[0, h]  # [8, D] bf16 (rows >= G are zero)
        meta = meta_ref[0, h]  # [8, C] f32
        sk, zk, sv, zv, msk = meta[0], meta[1], meta[2], meta[3], meta[4]

        if i8dot and bits in (2, 4, 8):
            # int8 MXU attention (_i8_scores/_i8_pv): all [C, D]-sized
            # work is s8xs8->s32 MXU dots; the per-key-row affine dequant
            # collapses to rank-1 fixups on [8, C]. bits=8 pairs signed
            # bytes with the RAW zeros (meta rows 5/6); 4/2-bit segments
            # stay unsigned and keep the folded zero' (rows 1/3).
            if bits == 8:
                k_off, v_off = meta[5], meta[6]  # raw zeros
            else:
                k_off, v_off = zk, zv  # folded zero' (unsigned segments)

            s = _i8_scores(q, kq_ref[0, h], sk, k_off, scale, bits)
            s = jnp.where(msk[None, :] > 0.5, s, NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            l = jnp.sum(e, axis=-1, keepdims=True)
            probs = e / l  # [8, C] f32

            if need_attn:
                pooled = jnp.sum(probs[:G], axis=0) * (1.0 / G)
                p_ref[0, h] = jnp.concatenate(
                    [pooled[None, :],
                     jnp.zeros((7, pooled.shape[0]), jnp.float32)],
                    axis=0,
                )

            o_ref[0, h] = _i8_pv(probs, vq_ref[0, h], sv, v_off, bits)
            continue

        if bits == 16:
            # Native bf16 MXU dot with f32 accumulation: q and the cache
            # are bf16-VALUED, so upcasting the operands to f32 (the r2
            # kernel) produced bit-identical scores through a slower
            # multi-pass f32 MXU path.
            s = jax.lax.dot_general(
                q, kq_ref[0, h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [8, C]
        else:
            # Segment-wise dots: dequant each packed bit-plane [C, D/per]
            # and contract it against the matching query columns — no
            # lane-doubling concat (Mosaic relayout) on the packed path.
            # Dequant lands in bf16 so the MXU dot runs single-pass
            # (~0.2% relative score change vs the f32-operand dot, well
            # inside the quantization noise already accepted).
            ksegs = _dequant_segs(kq_ref[0, h], sk, zk, bits)
            Dseg = ksegs[0].shape[-1]
            s = sum(
                jax.lax.dot_general(
                    q[:, i * Dseg : (i + 1) * Dseg],
                    kseg.astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for i, kseg in enumerate(ksegs)
            ) * scale  # [8, C]
        s = jnp.where(msk[None, :] > 0.5, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        probs = e / l  # [8, C] f32

        if need_attn:
            pooled = jnp.sum(probs[:G], axis=0) * (1.0 / G)  # [C]
            p_ref[0, h] = jnp.concatenate(
                [pooled[None, :],
                 jnp.zeros((7, pooled.shape[0]), jnp.float32)],
                axis=0,
            )

        pb = probs.astype(jnp.bfloat16)
        if bits == 16:
            vf = vq_ref[0, h].astype(jnp.bfloat16)
            o = jax.lax.dot_general(
                pb, vf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            vsegs = _dequant_segs(vq_ref[0, h], sv, zv, bits)
            o = jnp.concatenate(
                [
                    jax.lax.dot_general(
                        pb, vseg.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for vseg in vsegs
                ],
                axis=-1,
            )  # [8, D] — concat of tiny [8, D/per] results
        o_ref[0, h] = o


def _chunk_step(q_ref, kq_ref, vq_ref, meta_ref, e_ref, aux_ref,
                acc_ref, m_ref, l_ref, h, *, scale, bits, need_attn,
                i8dot=False):
    """Process one head's KV chunk block, updating the running (acc, m, l)
    scratch; returns (acc_new, l_new) for an optional finalize."""
    q = q_ref[0, h]  # [8, D] bf16
    meta = meta_ref[0, h]  # [8, CHUNK] f32
    sk, zk, sv, zv, msk = meta[0], meta[1], meta[2], meta[3], meta[4]

    if i8dot and bits in (2, 4, 8):
        # int8-MXU online-softmax chunk (see _i8_scores/_i8_pv): the
        # unnormalized e rows feed _i8_pv directly — its per-row prob
        # quantization scale absorbs the running-max normalization.
        k_off, v_off = (meta[5], meta[6]) if bits == 8 else (zk, zv)
        s = _i8_scores(q, kq_ref[0, h], sk, k_off, scale, bits)
        live = msk[None, :] > 0.5
        s = jnp.where(live, s, NEG_INF)
        m_prev = m_ref[h, :, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        e = jnp.where(live, jnp.exp(s - m_new), 0.0)
        corr = jnp.exp(m_prev - m_new)
        l_new = l_ref[h, :, 0:1] * corr + jnp.sum(e, axis=-1, keepdims=True)
        pv = _i8_pv(e, vq_ref[0, h], sv, v_off, bits)
        acc_new = acc_ref[h] * corr + pv
        acc_ref[h] = acc_new
        m_ref[h] = jnp.broadcast_to(m_new, m_ref[h].shape)
        l_ref[h] = jnp.broadcast_to(l_new, l_ref[h].shape)
        if need_attn:
            e_ref[0, h] = e
            aux_ref[0, h] = jnp.concatenate(
                [jnp.broadcast_to(m_new, (8, 64)),
                 jnp.broadcast_to(l_new, (8, 64))], axis=-1
            )
        return acc_new, l_new

    if bits == 16:
        # bf16 operands, f32 accumulation (see _kernel).
        s = jax.lax.dot_general(
            q, kq_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [8, CHUNK]
    else:
        # Segment-wise dots (see _dequant_segs): no lane-doubling concat.
        ksegs = _dequant_segs(kq_ref[0, h], sk, zk, bits)
        Dseg = ksegs[0].shape[-1]
        s = sum(
            jax.lax.dot_general(
                q[:, i * Dseg : (i + 1) * Dseg],
                kseg.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for i, kseg in enumerate(ksegs)
        ) * scale  # [8, CHUNK]
    live = msk[None, :] > 0.5
    s = jnp.where(live, s, NEG_INF)

    m_prev = m_ref[h, :, 0:1]  # [8, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    # Explicit mask multiply: a fully-masked chunk must contribute 0,
    # not exp(NEG_INF - NEG_INF) = 1.
    e = jnp.where(live, jnp.exp(s - m_new), 0.0)  # [8, CHUNK]
    corr = jnp.exp(m_prev - m_new)  # [8, 1]
    l_new = l_ref[h, :, 0:1] * corr + jnp.sum(e, axis=-1, keepdims=True)

    eb = e.astype(jnp.bfloat16)
    if bits == 16:
        vf = vq_ref[0, h].astype(jnp.bfloat16)
        pv = jax.lax.dot_general(
            eb, vf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [8, D]
    else:
        vsegs = _dequant_segs(vq_ref[0, h], sv, zv, bits)
        pv = jnp.concatenate(
            [
                jax.lax.dot_general(
                    eb, vseg.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for vseg in vsegs
            ],
            axis=-1,
        )  # [8, D]
    acc_new = acc_ref[h] * corr + pv

    acc_ref[h] = acc_new
    m_ref[h] = jnp.broadcast_to(m_new, m_ref[h].shape)
    l_ref[h] = jnp.broadcast_to(l_new, l_ref[h].shape)

    if need_attn:
        e_ref[0, h] = e
        aux_ref[0, h] = jnp.concatenate(
            [jnp.broadcast_to(m_new, (8, 64)),
             jnp.broadcast_to(l_new, (8, 64))], axis=-1
        )
    return acc_new, l_new


def _kernel_chunked(q_ref, kq_ref, vq_ref, meta_ref, o_ref, e_ref, aux_ref,
                    acc_ref, m_ref, l_ref, *, KVH, G, scale, bits, need_attn,
                    n_chunks, i8dot=False):
    """Flash-style online-softmax over cache chunks: grid (B, NC).

    Chunking the cache axis lets Mosaic double-buffer the K/V chunk DMAs
    against compute (the one-shot kernel above serializes an 8+ MB DMA
    before any math). Scratch carries the running (acc, m, l) per head/row;
    the final chunk normalizes and writes ``o``.

    For pooled probabilities, each chunk writes its *unnormalized* e-block
    (at that chunk's running max) plus (m_chunk, l_running) into ``aux``;
    the wrapper applies the global correction afterwards — probabilities
    for chunk c are e * exp(m_c - m_final) / l_final.
    """
    nc = pl.program_id(1)

    @pl.when(nc == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    for h in range(KVH):
        acc_new, l_new = _chunk_step(
            q_ref, kq_ref, vq_ref, meta_ref, e_ref, aux_ref,
            acc_ref, m_ref, l_ref, h,
            scale=scale, bits=bits, need_attn=need_attn, i8dot=i8dot,
        )

        @pl.when(nc == n_chunks - 1)
        def _finalize():
            o_ref[0, h] = acc_new / jnp.maximum(l_new, 1e-30)


def _kernel_chunked_ms(q_ref, *refs, KVH, G, scale, bits, need_attn,
                       n_chunks, streams, i8dot=False):
    """Multi-stream chunked kernel: ``streams`` (kq, vq, meta) triples feed
    S chunk DMAs in flight per grid step; stream i owns chunk
    nc + i * (NC/S). Online softmax is order-free, and each chunk's e-block
    records ITS running max, so the wrapper's global correction is
    unchanged. Outputs: o, then per-stream (e, aux)."""
    S = streams
    NCs = n_chunks // S
    ins = refs[: 3 * S]
    o_ref = refs[3 * S]
    eaux = refs[3 * S + 1 : 3 * S + 1 + 2 * S]
    acc_ref, m_ref, l_ref = refs[3 * S + 1 + 2 * S :]
    nc = pl.program_id(1)

    @pl.when(nc == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    for h in range(KVH):
        for i in range(S):
            kq_ref, vq_ref, meta_ref = ins[3 * i : 3 * i + 3]
            e_ref, aux_ref = eaux[2 * i : 2 * i + 2]
            acc_new, l_new = _chunk_step(
                q_ref, kq_ref, vq_ref, meta_ref, e_ref, aux_ref,
                acc_ref, m_ref, l_ref, h,
                scale=scale, bits=bits, need_attn=need_attn, i8dot=i8dot,
            )

        @pl.when(nc == NCs - 1)
        def _finalize():
            # The globally-last chunk (NC-1) belongs to the last stream at
            # the last step, so (acc, l) here are the final values.
            o_ref[0, h] = acc_new / jnp.maximum(l_new, 1e-30)


def _chunked_call(qf, kq, vq, meta, *, B, KVH, C, D, G, scale, bits,
                  need_attn, chunk, interpret, i8dot=False):
    import os

    NC = C // chunk
    Dp = kq.shape[3]
    S = int(os.environ.get("CCT_ATTN_STREAMS", "1"))
    S = S if (S > 1 and NC % S == 0) else 1
    # Double-buffered per-step blocks: S x (K + V + meta) in, (e, aux)
    # out, plus q/o/scratch. Wide adaptive chunks (>512 at 16k+ contexts)
    # exceed Mosaic's 16 MB default.
    blk = 2 * KVH * chunk * Dp * kq.dtype.itemsize + KVH * 8 * chunk * 4
    ch_vmem = 2 * S * blk + 2 * KVH * 8 * (chunk + 128) * 4 + 8 * 2**20
    params = (
        pltpu.CompilerParams(vmem_limit_bytes=min(ch_vmem, 100 * 2**20))
        if ch_vmem > 16 * 2**20
        else None
    )
    cost = pl.CostEstimate(
        flops=4 * B * KVH * 8 * C * D,
        bytes_accessed=2 * B * KVH * C * Dp * kq.dtype.itemsize
        + B * KVH * C * 4 * 4,
        transcendentals=B * KVH * 8 * C,
    )
    q_spec = pl.BlockSpec((1, KVH, 8, D), lambda b, c: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, KVH, 8, D), lambda b, c: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((KVH, 8, D), jnp.float32),
        pltpu.VMEM((KVH, 8, 128), jnp.float32),
        pltpu.VMEM((KVH, 8, 128), jnp.float32),
    ]

    if S > 1:
        NCs = NC // S
        kernel = functools.partial(
            _kernel_chunked_ms, KVH=KVH, G=G, scale=scale, bits=bits,
            need_attn=need_attn, n_chunks=NC, streams=S, i8dot=i8dot,
        )
        in_specs = [q_spec]
        operands = []
        for i in range(S):
            off = i * NCs
            kv_spec = pl.BlockSpec(
                (1, KVH, chunk, Dp),
                lambda b, c, off=off: (b, 0, c + off, 0),
                memory_space=pltpu.VMEM,
            )
            m_spec = pl.BlockSpec(
                (1, KVH, 8, chunk),
                lambda b, c, off=off: (b, 0, 0, c + off),
                memory_space=pltpu.VMEM,
            )
            in_specs += [kv_spec, kv_spec, m_spec]
            operands += [kq, vq, meta]
        out_specs = [o_spec]
        out_shapes = [jax.ShapeDtypeStruct((B, KVH, 8, D), jnp.float32)]
        for i in range(S):
            out_specs += [
                pl.BlockSpec((1, KVH, 8, chunk), lambda b, c: (b, 0, 0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, KVH, 8, 128), lambda b, c: (b, 0, 0, c),
                             memory_space=pltpu.VMEM),
            ]
            out_shapes += [
                jax.ShapeDtypeStruct((B, KVH, 8, NCs * chunk), jnp.float32),
                jax.ShapeDtypeStruct((B, KVH, 8, NCs * 128), jnp.float32),
            ]
        outs = pl.pallas_call(
            kernel,
            grid=(B, NCs),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=interpret,
            cost_estimate=cost,
        )(qf, *operands)
        y = outs[0]
        if not need_attn:
            return y, None
        # Streams cover contiguous chunk ranges in order: concat then the
        # same global correction as the single-stream path.
        e_out = jnp.concatenate(outs[1::2], axis=-1)
        aux = jnp.concatenate(outs[2::2], axis=-1)
    else:
        kernel = functools.partial(
            _kernel_chunked, KVH=KVH, G=G, scale=scale, bits=bits,
            need_attn=need_attn, n_chunks=NC, i8dot=i8dot,
        )
        out_shapes = [
            jax.ShapeDtypeStruct((B, KVH, 8, D), jnp.float32),
            jax.ShapeDtypeStruct((B, KVH, 8, C), jnp.float32),
            jax.ShapeDtypeStruct((B, KVH, 8, NC * 128), jnp.float32),
        ]
        kv_spec = pl.BlockSpec((1, KVH, chunk, Dp), lambda b, c: (b, 0, c, 0),
                               memory_space=pltpu.VMEM)
        y, e_out, aux = pl.pallas_call(
            kernel,
            grid=(B, NC),
            in_specs=[
                q_spec,
                kv_spec,
                kv_spec,
                pl.BlockSpec((1, KVH, 8, chunk), lambda b, c: (b, 0, 0, c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                o_spec,
                pl.BlockSpec((1, KVH, 8, chunk), lambda b, c: (b, 0, 0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, KVH, 8, 128), lambda b, c: (b, 0, 0, c),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=out_shapes,
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=interpret,
            cost_estimate=cost,
        )(qf, kq, vq, meta)

        if not need_attn:
            return y, None
    # Global softmax correction: chunk c's e-block was scaled by its own
    # running max; the final (m, l) live in the last chunk's aux block.
    aux = aux.reshape(B, KVH, 8, NC, 128)
    m_c = aux[..., 0]                     # [B, KVH, 8, NC]
    m_fin = m_c[..., -1:]                 # [B, KVH, 8, 1]
    l_fin = aux[..., -1, 64][..., None]   # [B, KVH, 8, 1]
    corr = jnp.exp(m_c - m_fin) / jnp.maximum(l_fin, 1e-30)
    probs = e_out.reshape(B, KVH, 8, NC, chunk) * corr[..., None]
    pooled = jnp.mean(probs[:, :, :G], axis=2).reshape(B, KVH, C)
    return y, pooled


def _kernel_manual(q_ref, kq_hbm, vq_hbm, meta_hbm, o_ref,
                   kbuf, vbuf, mbuf, acc_ref, m_ref, l_ref, sem,
                   *, KVH, scale, bits, i8dot, chunk, n_chunks):
    """Manual double-buffered chunked attention: grid (B,) — ONE program,
    a ``fori_loop`` over cache chunks with explicit ``make_async_copy``
    prefetch of chunk c+1 while chunk c computes.

    Rationale: the grid-based chunked kernel pays the backend's
    multi-microsecond fixed cost per grid step AND leaves the overlap
    decision to Mosaic's implicit pipeline, which measured ~116 GB/s
    effective on the 32k full-cache leg vs a ~600 GB/s roof (PERF.md
    round-4). Here the pipeline is explicit: two VMEM slots per operand,
    chunk c+1's three DMAs issued before chunk c's compute begins.
    Online-softmax state lives in scratch; compute reuses _chunk_step
    with ``need_attn=False`` (pooled probabilities need the e-blocks in
    HBM — callers that want them take the grid kernel)."""
    b = pl.program_id(0)

    def dmas(slot, c):
        start = c * chunk
        return (
            pltpu.make_async_copy(
                kq_hbm.at[b, :, pl.ds(start, chunk), :],
                kbuf.at[slot, 0], sem.at[slot, 0]),
            pltpu.make_async_copy(
                vq_hbm.at[b, :, pl.ds(start, chunk), :],
                vbuf.at[slot, 0], sem.at[slot, 1]),
            pltpu.make_async_copy(
                meta_hbm.at[b, :, :, pl.ds(start, chunk)],
                mbuf.at[slot, 0], sem.at[slot, 2]),
        )

    acc_ref[...] = jnp.zeros_like(acc_ref)
    m_ref[...] = jnp.full_like(m_ref, NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)
    for d in dmas(0, 0):
        d.start()

    def loop(c, carry):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _prefetch():
            for d in dmas(jax.lax.rem(c + 1, 2), c + 1):
                d.start()

        for d in dmas(slot, c):
            d.wait()
        for h in range(KVH):
            _chunk_step(
                q_ref, kbuf.at[slot], vbuf.at[slot], mbuf.at[slot],
                None, None, acc_ref, m_ref, l_ref, h,
                scale=scale, bits=bits, need_attn=False, i8dot=i8dot,
            )
        return carry

    jax.lax.fori_loop(0, n_chunks, loop, 0)
    for h in range(KVH):
        o_ref[0, h] = acc_ref[h] / jnp.maximum(l_ref[h, :, 0:1], 1e-30)


def _manual_call(qf, kq, vq, meta, *, B, KVH, C, D, G, scale, bits,
                 chunk, interpret, i8dot=False):
    """pallas_call wrapper for _kernel_manual (need_attn=False only)."""
    NC = C // chunk
    Dp = kq.shape[3]
    blk = (2 * KVH * chunk * Dp * kq.dtype.itemsize  # K+V slot
           + KVH * 8 * chunk * 4)                    # meta slot (f32)
    vmem = 2 * blk + 4 * KVH * 8 * (D + 256) * 4 + 8 * 2**20
    params = pltpu.CompilerParams(
        vmem_limit_bytes=min(max(vmem, 16 * 2**20), 100 * 2**20)
    )
    kernel = functools.partial(
        _kernel_manual, KVH=KVH, scale=scale, bits=bits,
        i8dot=i8dot, chunk=chunk, n_chunks=NC,
    )
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)
    y = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, KVH, 8, D), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            hbm_spec, hbm_spec, hbm_spec,
        ],
        out_specs=pl.BlockSpec((1, KVH, 8, D), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, KVH, 8, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 1, KVH, chunk, Dp), kq.dtype),
            pltpu.VMEM((2, 1, KVH, chunk, Dp), vq.dtype),
            pltpu.VMEM((2, 1, KVH, 8, chunk), jnp.float32),
            pltpu.VMEM((KVH, 8, D), jnp.float32),
            pltpu.VMEM((KVH, 8, 128), jnp.float32),
            pltpu.VMEM((KVH, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=params,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * KVH * 8 * C * D,
            bytes_accessed=2 * B * KVH * C * Dp * kq.dtype.itemsize
            + B * KVH * C * 4 * 4,
            transcendentals=B * KVH * 8 * C,
        ),
    )(qf, kq, vq, meta)
    return y


#: Cache-axis chunk width for the pipelined kernel; caches at least
#: 2 chunks long take the pipelined path (DMA/compute overlap), shorter
#: ones the one-shot kernel.
_DECODE_CHUNK = 512


def _pick_chunk(C: int, KVH: int, Dp: int, itemsize: int) -> int:
    """Adaptive cache-axis chunk width for the pipelined kernel.

    Grid steps carry ~8.6 us fixed overhead on this backend (module
    header): at 16k+ contexts a fixed 512-wide chunk spends more time on
    grid steps than on bytes (32 chunks x 32 layers ~ 8.8 ms/token — the
    full-cache @16k leg measured 41.65 tok/s where bytes alone price
    ~10 ms). Grow the chunk until ~8 steps remain or the double-buffered
    K+V blocks stop fitting a raised scoped-vmem limit.
    CCT_ATTN_CHUNK forces a width (must divide C)."""
    env = int(os.environ.get("CCT_ATTN_CHUNK", "0"))
    if env and C % env == 0 and C // env >= 2:
        return env
    chunk = _DECODE_CHUNK
    while (
        C // chunk > 8
        and chunk < 4096
        and C % (chunk * 2) == 0
        and 2 * KVH * (chunk * 2) * Dp * itemsize <= 16 * 2**20
    ):
        chunk *= 2
    return chunk


# --------------------------------------------------------------------------
# V2 ("slim") decode kernel — CCT_ATTN_V2 gate
#
# The r4 hardware legs put the big-cache chunked kernel at ~116-155 GB/s
# effective vs the ~470-632 GB/s the one-shot kernel and the weight stream
# reach (PERF.md round-4; the 32k full-cache rows are the only table where
# the reference stays ahead). Two structural taxes the grid kernel pays that
# the bytes don't require:
#   * the [B, KVH, 8, C] f32 "meta" operand is STACKED AND PADDED in XLA
#     on every decode step (scales/zeros/mask re-written to HBM: +8.4 MB
#     write +8.4 MB read per layer at 32k-bf16 — ~12% of K+V) — v2 passes
#     scales/zeros/mask as separate [B, KVH, C] operands read in place;
#   * e/aux output blocks are allocated and written back every grid step
#     even with need_attn=False — v2 has no outputs besides `o`.
# One kernel covers one-shot and chunked: grid (B, NC) with NC == 1 IS the
# one-shot (init and finalize run in the same step), so the slim layout
# also lifts the one-shot VMEM ceiling (67 MB K+V = full@16k-bf16 /
# full@32k-kv8 now fit a 96 MB window).
# --------------------------------------------------------------------------


def _v2_budget_bytes() -> int:
    """One-shot K+V budget for the v2 kernel (CCT_ATTN_V2_OS_MB).

    Hardware (r5 batch B): the one-DMA rate DEGRADES with size past
    ~40 MB — 67 MB one-shot measured ~133 GB/s end-to-end (16k-bf16 40.25
    / 32k-kv8 38.51 tok/s) vs the chunked kernel's ~200 GB/s on the same
    rows (45.7 / 40.9). Same for fat chunks: 8192-wide chunks at 32k-bf16
    measured 20.0 vs 22.95 with 2048-wide. So v2 keeps v1's proven
    routing sizes (40 MB one-shot, _pick_chunk chunks) and its win is the
    removed meta stream + e/aux outputs."""
    return int(os.environ.get("CCT_ATTN_V2_OS_MB", "40")) * 2**20


def _pick_chunk_v2(C: int, KVH: int, Dp: int, itemsize: int) -> int:
    """v2 chunk width = v1's proven adaptive pick (see _v2_budget_bytes:
    fatter chunks measured slower). CCT_ATTN_CHUNK still overrides."""
    return _pick_chunk(C, KVH, Dp, itemsize)


def _kernel_v2(q_ref, *refs, KVH, scale, bits, i8dot, n_chunks):
    """Slim online-softmax over cache chunks; see the section comment."""
    if bits == 16:
        kq_ref, vq_ref, mask_ref, o_ref, acc_ref, m_ref, l_ref = refs
    else:
        (kq_ref, vq_ref, ks_ref, kz_ref, vs_ref, vz_ref, mask_ref,
         o_ref, acc_ref, m_ref, l_ref) = refs
    nc = pl.program_id(1)

    @pl.when(nc == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    off = 0.0 if bits == 16 else float(2 ** (bits - 1))
    for h in range(KVH):
        q = q_ref[0, h]  # [8, D] bf16
        live = mask_ref[0, h][None, :] > 0.5  # [1, CHUNK]
        if bits != 16:
            sk, zk_raw = ks_ref[0, h], kz_ref[0, h]
            sv, zv_raw = vs_ref[0, h], vz_ref[0, h]
            # Folded zero' (see module header) computed in-kernel: one VPU
            # fma on [CHUNK] replaces v1's whole stacked-meta HBM stream.
            zk = zk_raw - off * sk
            zv = zv_raw - off * sv

        if i8dot and bits in (2, 4, 8):
            k_off, v_off = (zk_raw, zv_raw) if bits == 8 else (zk, zv)
            s = _i8_scores(q, kq_ref[0, h], sk, k_off, scale, bits)
        elif bits == 16:
            s = jax.lax.dot_general(
                q, kq_ref[0, h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
        else:
            ksegs = _dequant_segs(kq_ref[0, h], sk, zk, bits)
            Dseg = ksegs[0].shape[-1]
            s = sum(
                jax.lax.dot_general(
                    q[:, i * Dseg : (i + 1) * Dseg],
                    kseg.astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for i, kseg in enumerate(ksegs)
            ) * scale
        s = jnp.where(live, s, NEG_INF)

        m_prev = m_ref[h, :, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        e = jnp.where(live, jnp.exp(s - m_new), 0.0)
        corr = jnp.exp(m_prev - m_new)
        l_new = l_ref[h, :, 0:1] * corr + jnp.sum(e, axis=-1, keepdims=True)

        if i8dot and bits in (2, 4, 8):
            pv = _i8_pv(e, vq_ref[0, h], sv, v_off, bits)
        elif bits == 16:
            pv = jax.lax.dot_general(
                e.astype(jnp.bfloat16), vq_ref[0, h].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            vsegs = _dequant_segs(vq_ref[0, h], sv, zv, bits)
            eb = e.astype(jnp.bfloat16)
            pv = jnp.concatenate(
                [
                    jax.lax.dot_general(
                        eb, vseg.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for vseg in vsegs
                ],
                axis=-1,
            )
        acc_new = acc_ref[h] * corr + pv
        acc_ref[h] = acc_new
        m_ref[h] = jnp.broadcast_to(m_new, m_ref[h].shape)
        l_ref[h] = jnp.broadcast_to(l_new, l_ref[h].shape)

        @pl.when(nc == n_chunks - 1)
        def _finalize():
            o_ref[0, h] = acc_new / jnp.maximum(l_new, 1e-30)


def _v2_call(qf, kq, vq, k_scales, k_zeros, v_scales, v_zeros, maskf, *,
             B, KVH, C, D, G, scale, bits, interpret, i8dot):
    """pallas_call wrapper for the v2 kernel (need_attn=False only)."""
    Dp = kq.shape[3]
    kv_bytes = 2 * KVH * C * Dp * kq.dtype.itemsize
    if kv_bytes <= _v2_budget_bytes() or C % _DECODE_CHUNK:
        chunk = C  # one-shot: a single fat grid step
    else:
        chunk = _pick_chunk_v2(C, KVH, Dp, kq.dtype.itemsize)
    NC = C // chunk
    # Window: double-buffered K+V (+f32 sidecars) blocks, q/o, scratch.
    n_side = 1 if bits == 16 else 5
    blk = 2 * KVH * chunk * Dp * kq.dtype.itemsize + n_side * KVH * chunk * 4
    vmem = (2 if NC > 1 else 1) * blk + 4 * KVH * 8 * (D + 256) * 4 + 8 * 2**20
    params = pltpu.CompilerParams(
        vmem_limit_bytes=min(max(vmem, 16 * 2**20), 110 * 2**20)
    )
    kv_spec = pl.BlockSpec((1, KVH, chunk, Dp), lambda b, c: (b, 0, c, 0),
                           memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, KVH, chunk), lambda b, c: (b, 0, c),
                            memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, KVH, 8, D), lambda b, c: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    if bits == 16:
        in_specs = [q_spec, kv_spec, kv_spec, row_spec]
        operands = (qf, kq, vq, maskf)
    else:
        in_specs = [q_spec, kv_spec, kv_spec] + [row_spec] * 5
        operands = (qf, kq, vq, k_scales, k_zeros, v_scales, v_zeros, maskf)
    y = pl.pallas_call(
        functools.partial(
            _kernel_v2, KVH=KVH, scale=scale, bits=bits, i8dot=i8dot,
            n_chunks=NC,
        ),
        grid=(B, NC),
        in_specs=in_specs,
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, 8, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((KVH, 8, D), jnp.float32),
            pltpu.VMEM((KVH, 8, 128), jnp.float32),
            pltpu.VMEM((KVH, 8, 128), jnp.float32),
        ],
        compiler_params=params,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * KVH * 8 * C * D,
            bytes_accessed=kv_bytes + B * KVH * C * 4 * n_side,
            transcendentals=B * KVH * 8 * C,
        ),
    )(*operands)
    return y


@functools.partial(
    jax.jit,
    static_argnames=("bits", "need_attn", "interpret", "chunked", "i8dot"),
)
def quantized_decode_attention(
    q: jax.Array,      # [B, H, 1, D] (bf16/f32)
    kq: jax.Array,     # [B, KVH, C, D/packing] uint8 (or [B,KVH,C,D] bf16)
    vq: jax.Array,
    k_scales: Optional[jax.Array],  # [B, KVH, C] f32 (None when bits=16)
    k_zeros: Optional[jax.Array],
    v_scales: Optional[jax.Array],
    v_zeros: Optional[jax.Array],
    mask: jax.Array,   # [B, KVH, C] bool
    bits: int = 8,
    need_attn: bool = False,
    interpret: bool = False,
    chunked: Optional[bool] = None,
    i8dot: Optional[bool] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Returns (out [B, H, 1, D], pooled attn [B, KVH, 1, C] | None),
    matching gqa_attention's decode contract.

    ``chunked=None`` auto-selects: caches spanning >= 2 chunks of
    ``_DECODE_CHUNK`` take the pipelined online-softmax kernel, shorter
    ones the one-shot kernel."""
    B, H, _, D = q.shape
    KVH, C = kq.shape[1], kq.shape[2]
    G = H // KVH
    scale = 1.0 / math.sqrt(D)

    qf = q.reshape(B, KVH, G, D)
    if G < 8:
        qf = jnp.pad(qf, ((0, 0), (0, 0), (0, 8 - G), (0, 0)))
    qf = qf.astype(jnp.bfloat16)

    # i8dot=None defers to the env gate — resolved at TRACE time, so the
    # env must be process-constant (tests pass i8dot explicitly: it is a
    # static cache key, the env is not). Default ON for int8 caches since
    # r4: measured +13 tok/s (93.9 -> 106.9 end-to-end at 8B) and
    # ppl-lossless through the real kernel on trained weights (+0.02% vs
    # plain kv8, results/quality_kv128). For 4/2-bit caches the added
    # query/prob quantization costs ~0.85% ppl on top of the cache's own
    # rounding, so it stays opt-in (CCT_ATTN_I8DOT=1: +11% decode).
    if i8dot is None:
        i8dot = os.environ.get(
            "CCT_ATTN_I8DOT", "1" if bits == 8 else "0"
        ) == "1"
    i8dot = bool(i8dot) and bits in (2, 4, 8)
    if (
        not need_attn
        and chunked is None
        and os.environ.get("CCT_ATTN_V2", "0") == "1"
    ):
        # Slim decode-only path (see the V2 section comment). Like the
        # manual/i8dot gates this env is read at trace time and must be
        # process-constant; tests pass through the explicit kernels.
        y = _v2_call(
            qf, kq, vq, k_scales, k_zeros, v_scales, v_zeros,
            mask.astype(jnp.float32), B=B, KVH=KVH, C=C, D=D, G=G,
            scale=scale, bits=bits, interpret=interpret, i8dot=i8dot,
        )
        return y[:, :, :G].reshape(B, H, 1, D).astype(q.dtype), None
    maskf = mask.astype(jnp.float32)
    if bits == 16:
        zero = jnp.zeros_like(maskf)
        rows = [zero, zero, zero, zero, maskf]
    else:
        off = float(2 ** (bits - 1))
        rows = [
            k_scales,
            k_zeros - off * k_scales,
            v_scales,
            v_zeros - off * v_scales,
            maskf,
        ]
        if i8dot and bits == 8:
            # The bits=8 int8-MXU kernel consumes u - 128 directly, so it
            # needs the RAW zeros (rows 5/6) rather than the folded zero
            # terms (sub-byte segments stay unsigned and use rows 1/3).
            rows += [k_zeros, v_zeros]
    meta = jnp.stack(rows, axis=2)  # [B, KVH, 5|7, C]
    meta = jnp.pad(meta, ((0, 0), (0, 0), (0, 8 - len(rows)), (0, 0)))

    if chunked is None:
        chunked = C % _DECODE_CHUNK == 0 and C >= 2 * _DECODE_CHUNK
        if chunked and os.environ.get("CCT_ATTN_ONESHOT", "1") == "1":
            # Default since r3: the 4-chunk grid at C=2048 ran the decode
            # step at 92.3 tok/s; one fat step (grid overhead paid once)
            # measured 98.1 (bf16 cache) / 95.0 (int8 cache) on hardware
            # (results/tpu_batch_r3/bench_os*.log). Chunking only pays
            # when K+V exceed the one-step VMEM budget;
            # CCT_ATTN_ONESHOT=0 forces the chunked kernel for every
            # chunk-aligned cache (short / non-aligned caches still take
            # the one-shot kernel — no chunked grid exists for them).
            if (
                2 * KVH * C * kq.shape[3] * kq.dtype.itemsize
                <= _oneshot_budget_bytes()
            ):
                chunked = False
    if chunked:
        chunk = _pick_chunk(C, KVH, kq.shape[3], kq.dtype.itemsize)
        if not need_attn and os.environ.get("CCT_ATTN_MANUAL", "0") == "1":
            # Opt-in until hardware-validated (repo convention for new
            # kernel gates): explicit double-buffered DMA pipeline, one
            # program per batch element, no per-chunk grid steps.
            # Like the i8dot gate above, this env is read at TRACE time
            # inside the jit and is not a cache key: it must be
            # process-constant (flipping it mid-process is a silent
            # no-op; tests clear_cache() around it).
            y = _manual_call(
                qf, kq, vq, meta, B=B, KVH=KVH, C=C, D=D, G=G,
                scale=scale, bits=bits, chunk=chunk, interpret=interpret,
                i8dot=i8dot,
            )
            return y[:, :, :G].reshape(B, H, 1, D).astype(q.dtype), None
        y, pooled = _chunked_call(
            qf, kq, vq, meta, B=B, KVH=KVH, C=C, D=D, G=G, scale=scale,
            bits=bits, need_attn=need_attn,
            chunk=chunk,
            interpret=interpret, i8dot=i8dot,
        )
        out = y[:, :, :G].reshape(B, H, 1, D).astype(q.dtype)
        if not need_attn:
            return out, None
        return out, pooled[:, :, None, :]  # [B, KVH, 1, C]

    Dp = kq.shape[3]
    kernel = functools.partial(
        _kernel, KVH=KVH, G=G, scale=scale, bits=bits, need_attn=need_attn,
        i8dot=i8dot,
    )
    out_shapes = [
        jax.ShapeDtypeStruct((B, KVH, 8, D), jnp.float32),
        jax.ShapeDtypeStruct((B, KVH, 8, C), jnp.float32),
    ]
    kv_spec = pl.BlockSpec((1, KVH, C, Dp), lambda b: (b, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    # One step holds K+V + q + meta + the f32 probs/e outputs at once —
    # size the scoped-vmem limit explicitly (Mosaic's 16 MB default OOMs
    # at full-cache sizes) with slack for compiler scratch.
    os_vmem = (
        2 * KVH * C * Dp * kq.dtype.itemsize  # K+V blocks
        + 2 * KVH * 8 * C * 4                 # meta in + probs out (f32)
        + 3 * KVH * 8 * D * 4                 # q + o + scratch rows
        + 8 * 2**20
    )
    params = pltpu.CompilerParams(
        vmem_limit_bytes=min(max(os_vmem, 16 * 2**20), 100 * 2**20)
    )
    y, pooled = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, KVH, 8, D), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            kv_spec,
            kv_spec,
            pl.BlockSpec((1, KVH, 8, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, KVH, 8, D), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KVH, 8, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shapes,
        compiler_params=params,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * C * D,
            bytes_accessed=2 * B * KVH * C * Dp * kq.dtype.itemsize
            + B * KVH * C * 4 * 4,
            transcendentals=B * KVH * 8 * C,
        ),
    )(qf, kq, vq, meta)

    out = (
        y[:, :, :G]
        .reshape(B, H, 1, D)
        .astype(q.dtype)
    )
    if not need_attn:
        return out, None
    return out, pooled[:, :, 0][:, :, None, :]  # [B, KVH, 1, C]


def decode_attn_supported(spec, q_shape, C: int, kvh: int) -> bool:
    """Gate: real TPU, lane-aligned cache length / head dim, supported
    packing, single-token decode, and K+V blocks within the one-shot VMEM
    budget."""
    from .pallas_qmm import backend_ok

    if os.environ.get("CCT_ATTN_DISABLE", "0") == "1":
        # Diagnostic: route decode attention through the XLA einsum path
        # (materialize_kv + gqa_attention) to benchmark the non-Pallas
        # baseline at a given context.
        return False
    if not backend_ok():
        return False
    B, H, L, D = q_shape
    bits = spec.cache_bits if spec.cache_bits is not None else 16
    if bits not in (16, 8, 4, 2):
        return False
    dp_bytes = D * (2 if bits == 16 else bits // 8 if bits == 8 else 1)
    if bits in (4, 2):
        dp_bytes = D // (8 // bits)
    if L != 1 or C % 128 or D % 128:
        return False
    kv_full = 2 * kvh * C * dp_bytes
    if bits == 16 and kv_full > _oneshot_budget_bytes():
        # Measured routing (r5 batch B, 32k bf16 full cache): the XLA
        # einsum path runs 33.0 tok/s where the Pallas chunked kernel
        # plateaus at 22.95-23.36 (2048/4096 chunks, manual double-buffer,
        # multi-stream all within noise of each other) — big bf16 blocks
        # stream ~200 GB/s through any Pallas grid on this part while
        # XLA's fused einsum does better end-to-end. Quantized caches
        # stay on the kernel: the XLA path would materialize a bf16 copy
        # of the cache in HBM every step (caches/base.py::materialize_kv),
        # and the chunked kernel already beats the reference there
        # (40.88 vs 30.03 @32k kv8). CCT_ATTN_FORCE=1 overrides for A/Bs.
        if os.environ.get("CCT_ATTN_FORCE", "0") != "1":
            return False
    # Mirror quantized_decode_attention's chunked=None routing exactly so
    # the gate never admits a config the chosen kernel can't compile:
    # chunk-aligned caches take the pipelined kernel unless one-shot is
    # enabled AND the whole cache fits its budget; everything else
    # (short or non-chunk-aligned C) takes the one-shot kernel
    # regardless of CCT_ATTN_ONESHOT.
    chunkable = C % _DECODE_CHUNK == 0 and C >= 2 * _DECODE_CHUNK
    oneshot_fits = kv_full <= max(_oneshot_budget_bytes(), _VMEM_KV_BUDGET)
    if chunkable:
        if (
            os.environ.get("CCT_ATTN_ONESHOT", "1") == "1"
            and kv_full <= _oneshot_budget_bytes()
        ):
            return True  # routed one-shot
        # routed chunked: one chunk's K+V must fit the chunk-path bound
        return 2 * kvh * _DECODE_CHUNK * dp_bytes <= _VMEM_KV_BUDGET
    return oneshot_fits
