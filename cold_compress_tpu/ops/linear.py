"""Linear/projection ops with pluggable weight formats.

A weight leaf is either a plain array ``[in, out]`` (bf16/f32) or a dict
describing a quantized weight (produced by ``cold_compress_tpu.quantization``):

  int8 per-channel (reference: quantize.py:333-404):
      {"kind": "int8", "w": int8 [in, out], "scales": f32 [out]}
  int4 group-wise (reference: quantize.py:407-529):
      {"kind": "int4", "w": uint8/int8 packed [in//2, out] (two nibbles per
       byte along the *in* axis), "scales": bf16 [n_groups, out],
       "zeros": bf16 [n_groups, out], "group_size": int}

``linear`` dispatches on the leaf type so the same model code runs dense or
quantized. The XLA path dequantizes inline (fused by the compiler); a Pallas
dequant-matmul kernel is used on TPU for the int4 path (ops/pallas_qmm.py).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class QuantizedWeight:
    """Self-describing quantized weight leaf (kind/group_size are static so
    the pytree jits cleanly).

    ``idx`` marks a *stacked* leaf: arrays carry a leading layer axis and
    ``idx`` selects the layer. The scan-over-layers path uses this so the
    Pallas kernels index the layer inside the kernel (BlockSpec prefetch)
    instead of XLA materializing a per-step copy of the sliced weights.
    """

    w: jax.Array
    scales: jax.Array
    zeros: Optional[jax.Array] = None
    idx: Optional[jax.Array] = None
    kind: str = field(default="int8", metadata=dict(static=True))
    group_size: int = field(default=128, metadata=dict(static=True))
    # int4 byte layout: "rowpack" (storage/interchange format: nibbles are
    # input rows i and i + in/2 of one output column) or "colpack" (decode
    # acceleration format: nibbles are output columns j and j + out/2 of one
    # input row; see ops/pallas_qmm.py qmm_w4a8_cp_stacked).
    # int8 layout: "rowmajor" flat [in, out] (default) or "tiled8" — blocks
    # [T, in, TO] contiguous in HBM with OUT zero-padded to T*TO (decode
    # acceleration for the vocab head; see ops/pallas_qmm.py qmm_w8a8_tiled).
    layout: str = field(default="rowpack", metadata=dict(static=True))
    # True output width for layouts that pad OUT (tiled8).
    out_true: Optional[int] = field(default=None, metadata=dict(static=True))

    def resolved(self) -> "QuantizedWeight":
        """Materialize the selected layer of a stacked leaf (XLA fuses the
        slice into elementwise/dot consumers)."""
        if self.idx is None:
            return self
        def take(a):
            if a is None:
                return None
            if isinstance(a, tuple):  # cpt_split: per-stream buffers
                return tuple(take(p) for p in a)
            return jax.lax.dynamic_index_in_dim(
                a, self.idx, axis=0, keepdims=False
            )
        return dataclasses.replace(
            self, w=take(self.w), scales=take(self.scales),
            zeros=take(self.zeros), idx=None,
        )


def is_quantized(x) -> bool:
    return isinstance(x, QuantizedWeight)


def unpack_int4(packed: jax.Array, axis: int = 0) -> jax.Array:
    """Unpack two 4-bit values per byte along ``axis``, half-split layout:
    low nibbles hold rows [0, n), high nibbles rows [n, 2n).

    Storage is int8 with a SIGNED high nibble (value q_hi - 8), so the
    Pallas dual-dot kernel can feed packed bytes straight to the int8 MXU
    (ops/pallas_qmm.py). Legacy uint8 buffers (both nibbles unsigned) are
    accepted for checkpoint back-compat. Returns unsigned values [0, 15].
    """
    p = to_signed_pack(packed).astype(jnp.int32)
    lo = (p & 0x0F).astype(jnp.uint8)
    hi = ((p >> 4) + 8).astype(jnp.uint8)  # arithmetic shift: signed q-8
    return jnp.concatenate([lo, hi], axis=axis)


def pack_int4(vals: jax.Array, axis: int = 0) -> jax.Array:
    """Pack 4-bit values (in [0,15]) into int8 bytes along ``axis``: byte r
    holds row r in the low nibble (unsigned) and row r + n/2 in the high
    nibble stored signed as (q - 8)."""
    n = vals.shape[axis]
    assert n % 2 == 0
    v = vals.astype(jnp.int32)
    lo = jax.lax.slice_in_dim(v, 0, n // 2, axis=axis)
    hi = jax.lax.slice_in_dim(v, n // 2, n, axis=axis)
    byte = lo | (((hi - 8) & 0xF) << 4)  # bits of ((q_hi-8)<<4)|q_lo
    return jnp.where(byte >= 128, byte - 256, byte).astype(jnp.int8)


def to_signed_pack(packed: jax.Array) -> jax.Array:
    """Convert a legacy unsigned-nibble uint8 pack to the signed-hi int8
    layout (bitwise: flip the top bit). No-op for int8 input."""
    if packed.dtype == jnp.int8:
        return packed
    return jax.lax.bitcast_convert_type(packed ^ 0x80, jnp.int8)


def to_colpack(w_leaf: QuantizedWeight) -> QuantizedWeight:
    """Repack a rowpack int4 leaf into the colpack acceleration layout.

    rowpack: w [.., in//2, out], byte (r, j) = rows (r, r + in/2) of col j.
    colpack: w [.., in, out//2], byte (i, j) = cols (j, j + out/2) of row i
             (low nibble unsigned q, high nibble signed q-8);
             scales/zeros [.., 2, in/gs, out//2] (plane 0 = low half cols).

    Stacked leaves are repacked layer-by-layer (lax.map) so the transient
    unpacked uint8 buffer stays one layer big.
    """
    assert w_leaf.kind == "int4" and w_leaf.layout == "rowpack"

    def one(w, s, z):
        q = unpack_int4(w, axis=0).astype(jnp.int32)  # [in, out], 0..15
        out = q.shape[-1]
        assert out % 2 == 0
        lo = q[:, : out // 2]
        hi = q[:, out // 2:]
        byte = lo | (((hi - 8) & 0xF) << 4)
        wcp = jnp.where(byte >= 128, byte - 256, byte).astype(jnp.int8)
        meta = lambda a: jnp.stack(  # noqa: E731
            [a[..., : out // 2], a[..., out // 2:]], axis=0
        )
        return wcp, meta(s), meta(z)

    if w_leaf.w.ndim == 3:  # stacked [NL, in//2, out]
        wcp, s, z = jax.lax.map(
            lambda t: one(*t), (w_leaf.w, w_leaf.scales, w_leaf.zeros)
        )
    else:
        wcp, s, z = one(w_leaf.w, w_leaf.scales, w_leaf.zeros)
    return dataclasses.replace(
        w_leaf, w=wcp, scales=s, zeros=z, layout="colpack"
    )


def to_cpt(w_leaf: QuantizedWeight, tile_out: int | None = None) -> QuantizedWeight:
    """Repack a colpack int4 leaf into the cpt decode layout: contiguous
    weight tiles + ONE fused metadata sidecar per tile.

      w:      [NL, IN, OUTh]            -> [NL, T, IN, TOh]  (contiguous)
      scales: [NL, 2, ngf, OUTh] (+z)   -> meta [NL, T, 4*ngf, TOh] with
              plane rows (s_lo | s_hi | z_lo - 8 s_lo | z_hi), scale dtype.

    Flat blocks are strided HBM reads that stream ~25% below the contiguous
    tiles (r3 probe batch), and the fused sidecar replaces two block-indexed
    DMA streams plus a per-step VPU zero-term recompute with one stream of
    setup-time constants. Accepts single-layer leaves ([IN, OUTh]) too.
    """
    assert w_leaf.kind == "int4" and w_leaf.layout == "colpack"
    w, s, z = w_leaf.w, w_leaf.scales, w_leaf.zeros
    single = w.ndim == 2
    if single:
        w, s, z = w[None], s[None], z[None]
    NL, IN, OUTh = w.shape
    ngf = s.shape[2]
    from .pallas_qmm import _pick_tile_out_cp

    TOh = tile_out or _pick_tile_out_cp(IN, OUTh)
    if TOh > OUTh or OUTh % TOh:
        # Tiny models (test fixtures): one tile spanning the whole output.
        # The Pallas cpt kernel gate rejects lane-unaligned tiles anyway;
        # storage and the XLA paths handle any tile width.
        TOh = OUTh
    assert OUTh % TOh == 0, (OUTh, TOh)
    T = OUTh // TOh
    wt = w.reshape(NL, IN, T, TOh).transpose(0, 2, 1, 3)
    sf = s.astype(jnp.float32)
    zf = z.astype(jnp.float32)
    meta = jnp.concatenate(
        [sf[:, 0], sf[:, 1], zf[:, 0] - 8.0 * sf[:, 0], zf[:, 1]], axis=1
    ).astype(s.dtype)  # [NL, 4*ngf, OUTh]
    mt = meta.reshape(NL, 4 * ngf, T, TOh).transpose(0, 2, 1, 3)
    if single:
        wt, mt = wt[0], mt[0]
    return dataclasses.replace(
        w_leaf, w=wt, scales=mt, zeros=None, layout="cpt"
    )


def to_cpt_split(w_leaf: QuantizedWeight, streams: int) -> QuantizedWeight:
    """Split a STACKED cpt leaf's tile axis into ``streams`` physically
    separate HBM buffers (layout "cpt_split"; w/scales become tuples).

    The in-buffer multi-stream kernel (CCT_QMM_STREAMS) binds ONE array to
    S operands with offset index maps; r3's probe8 measured that this
    same-buffer aliasing defeats DMA pipelining, and the production A/B
    came out slightly worse. Splitting at repack time gives each stream's
    double-buffered DMA chain its own buffer — the layout probe8 found
    profitable. Stream i holds the contiguous tile range
    [i*T/S, (i+1)*T/S), so outputs concatenate back in cpt column order.
    """
    assert w_leaf.kind == "int4" and w_leaf.layout == "cpt"
    assert w_leaf.w.ndim == 4, "cpt_split is for stacked layer leaves"
    NL, T, IN, TOh = w_leaf.w.shape
    S = streams
    assert T % S == 0, (T, S)
    Ts = T // S
    split = lambda a: tuple(  # noqa: E731
        jnp.copy(a[:, i * Ts : (i + 1) * Ts]) for i in range(S)
    )
    return dataclasses.replace(
        w_leaf, w=split(w_leaf.w), scales=split(w_leaf.scales),
        layout="cpt_split",
    )


def to_tiled_int8(
    w_leaf: QuantizedWeight, tile_out: int = 512
) -> QuantizedWeight:
    """Repack a rowmajor int8 leaf [in, out] into contiguous HBM blocks
    [T, in, TO] (OUT zero-padded to T*TO; padded columns get scale 0).

    One-time setup transform for the vocab head: the flat layout's blocks
    are strided rows that this backend's DMA streams well below peak,
    while tile-major blocks stream contiguously (same trick as the tiled
    colpack layer stacks)."""
    assert w_leaf.kind == "int8" and w_leaf.layout == "rowpack"
    w, s = w_leaf.w, w_leaf.scales
    IN, OUT = w.shape
    # Pad to a multiple of 4 tiles so the multi-stream kernel (which
    # splits the tile range over N DMA pipelines) always divides evenly.
    pad = (-OUT) % (4 * tile_out)
    if pad:
        w = jnp.pad(w, ((0, 0), (0, pad)))
        s = jnp.pad(s, (0, pad))
    T = (OUT + pad) // tile_out
    wt = w.reshape(IN, T, tile_out).transpose(1, 0, 2)
    st = s.reshape(T, tile_out).astype(jnp.float32)
    return dataclasses.replace(
        w_leaf, w=wt, scales=st, layout="tiled8", out_true=OUT
    )


def to_colpack_tiled(
    w_leaf: QuantizedWeight, tile_out: int = 512
) -> QuantizedWeight:
    """Repack a rowpack int4 leaf into TILED colpack blocks for the wide
    vocab head: w [T, in, TOh] contiguous in HBM (OUT zero-padded so that
    (OUT/2) % TOh == 0; padded columns get scale 0 = zero logits, sliced
    off in ``linear``), scales/zeros [2, in/gs, OUTh] flat as the stacked
    colpack kernel expects. One-time setup transform like to_colpack."""
    assert w_leaf.kind == "int4" and w_leaf.layout == "rowpack"
    w, s, z = w_leaf.w, w_leaf.scales, w_leaf.zeros
    OUT = w.shape[-1]
    # 4-tile multiple for the multi-stream split (see to_tiled_int8).
    pad = (-OUT) % (2 * 4 * tile_out)
    if pad:
        w = jnp.pad(w, ((0, 0), (0, pad)))
        s = jnp.pad(s, ((0, 0), (0, pad)))
        z = jnp.pad(z, ((0, 0), (0, pad)))
    cp = to_colpack(dataclasses.replace(w_leaf, w=w, scales=s, zeros=z))
    IN, OUTh = cp.w.shape
    T = OUTh // tile_out
    wt = cp.w.reshape(IN, T, tile_out).transpose(1, 0, 2)
    return dataclasses.replace(
        cp, w=wt, layout="colpack_tiled", out_true=OUT
    )


def dequantize_weight(w_leaf, dtype=jnp.bfloat16) -> jax.Array:
    """Materialize a quantized weight leaf as a dense [in, out] array."""
    if not is_quantized(w_leaf):
        return w_leaf.astype(dtype)
    if w_leaf.kind == "int4" and w_leaf.layout == "cpt_split":
        # Rejoin the per-stream buffers along the tile axis (transient,
        # one layer at a time under the layer scan) and reuse the cpt math.
        joined = dataclasses.replace(
            w_leaf,
            # tile axis: 0 for resolved [Ts, IN, TOh], 1 for stacked 4D
            w=jnp.concatenate(w_leaf.w, axis=w_leaf.w[0].ndim - 3),
            scales=jnp.concatenate(
                w_leaf.scales, axis=w_leaf.scales[0].ndim - 3
            ),
            layout="cpt",
        )
        return dequantize_weight(joined, dtype)
    if w_leaf.kind == "int4" and w_leaf.layout == "cpt":
        T, IN, TOh = w_leaf.w.shape
        ngf = w_leaf.scales.shape[1] // 4
        m = (
            w_leaf.scales.transpose(1, 0, 2)
            .reshape(4, ngf, T * TOh)
            .astype(jnp.float32)
        )
        s = jnp.stack([m[0], m[1]])
        z = jnp.stack([m[2] + 8.0 * m[0], m[3]])
        flat = dataclasses.replace(
            w_leaf,
            w=w_leaf.w.transpose(1, 0, 2).reshape(IN, T * TOh),
            # f32 (not recast to bf16): z = zt + 8s must round exactly once
            # so this fallback matches the kernel's zt-based math.
            scales=s,
            zeros=z,
            layout="colpack",
        )
        out = dequantize_weight(flat, dtype)
        return out[:, : w_leaf.out_true] if w_leaf.out_true else out
    if w_leaf.kind == "int4" and w_leaf.layout == "colpack_tiled":
        T, IN, TOh = w_leaf.w.shape
        flat = dataclasses.replace(
            w_leaf,
            w=w_leaf.w.transpose(1, 0, 2).reshape(IN, T * TOh),
            layout="colpack",
        )
        return dequantize_weight(flat, dtype)[:, : w_leaf.out_true]
    if w_leaf.kind == "int8" and w_leaf.layout == "tiled8":
        T, IN, TO = w_leaf.w.shape
        w = w_leaf.w.transpose(1, 0, 2).reshape(IN, T * TO)
        s = w_leaf.scales.reshape(T * TO)
        return (w.astype(jnp.float32) * s[None, :])[
            :, : w_leaf.out_true
        ].astype(dtype)
    if w_leaf.kind == "int8":
        return (
            w_leaf.w.astype(jnp.float32) * w_leaf.scales[None, :]
        ).astype(dtype)
    if w_leaf.kind == "int4" and w_leaf.layout == "colpack":
        gs = w_leaf.group_size
        p = w_leaf.w.astype(jnp.int32)  # [in, out//2]
        lo = p & 0x0F
        hi = (p >> 4) + 8  # arithmetic shift recovers signed q-8
        q = jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)
        s = jnp.concatenate(
            [w_leaf.scales[0], w_leaf.scales[1]], axis=-1
        ).astype(jnp.float32)
        z = jnp.concatenate(
            [w_leaf.zeros[0], w_leaf.zeros[1]], axis=-1
        ).astype(jnp.float32)
        in_dim, out_dim = q.shape
        q = q.reshape(in_dim // gs, gs, out_dim)
        w = (q - 8.0) * s[:, None, :] + z[:, None, :]
        return w.reshape(in_dim, out_dim).astype(dtype)
    if w_leaf.kind == "int4":
        gs = w_leaf.group_size
        w = unpack_int4(w_leaf.w, axis=0).astype(jnp.float32)  # [in, out]
        in_dim, out_dim = w.shape
        w = w.reshape(in_dim // gs, gs, out_dim)
        # Affine: x_deq = (q - 8) * scale + zero  (mid-point convention shared
        # with the KV-cache quantizer; reference quantize.py:133-176 uses an
        # equivalent min/max affine form).
        w = (w - 8.0) * w_leaf.scales[:, None, :] + w_leaf.zeros[:, None, :]
        return w.reshape(in_dim, out_dim).astype(dtype)
    raise ValueError(f"Unknown quantized weight kind: {w_leaf.kind}")


def matmul_cpt_xla(x2: jax.Array, w_leaf: QuantizedWeight) -> jax.Array:
    """``x2 @ w`` for a cpt-layout int4 leaf via a tile-major batched dot.

    DEAD END for prefill dispatch (measured): dequantizing tiles in their
    native [T, IN, TOh] order avoids the packed-byte transpose, but XLA
    then relayouts the *bf16* [2T, IN, TOh] dot operand — 4x the bytes of
    the packed transpose it saved (hardware: prefill 6357 -> 5650 tok/s).
    ``dequantize_weight``'s transpose-then-dequant stays the prefill path;
    this function is kept as the reference implementation of the cpt
    column mapping (tile t's low/high nibbles are output columns
    [t*TOh, (t+1)*TOh) and OUT/2 + [t*TOh, (t+1)*TOh)) and for tests.
    Numerics match dequantize_weight's colpack math exactly: f32 affine
    per plane (w_lo = lo * s_lo + (z_lo - 8 s_lo), w_hi = hi * s_hi +
    z_hi), cast to x.dtype, f32-accumulated dot."""
    wt, mt = w_leaf.w, w_leaf.scales  # [T, IN, TOh], [T, 4*ngf, TOh]
    T, IN, TOh = wt.shape
    ngf = mt.shape[1] // 4
    gs = w_leaf.group_size
    p = wt.astype(jnp.int32)
    m = mt.astype(jnp.float32)

    def rows(a):  # [T, ngf, TOh] group planes -> per-row [T, IN, TOh]
        return jnp.repeat(a, gs, axis=1)

    lo = (p & 0x0F).astype(jnp.float32)
    hi = (p >> 4).astype(jnp.float32)  # arithmetic shift: signed nibble
    w_lo = lo * rows(m[:, :ngf]) + rows(m[:, 2 * ngf : 3 * ngf])
    w_hi = hi * rows(m[:, ngf : 2 * ngf]) + rows(m[:, 3 * ngf :])
    wf = jnp.concatenate([w_lo, w_hi], axis=0).astype(x2.dtype)  # [2T,IN,TOh]
    y = jax.lax.dot_general(
        x2, wf, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [L, 2T, TOh]; columns in [lo tiles | hi tiles] order == colpack's
    y = y.reshape(x2.shape[0], 2 * T * TOh)
    return y[:, : w_leaf.out_true] if w_leaf.out_true else y


def w8a8_matmul(x2: jax.Array, w_leaf: QuantizedWeight) -> jax.Array:
    """Native int8 MXU matmul with dynamic per-row activation quantization.

    Weights stay int8 in HBM and feed the MXU directly (no per-element
    dequant — the dequant scales fold into the f32 epilogue), which is the
    only way to run at HBM speed: VPU-side casting of every weight element
    caps out far below memory bandwidth.
    """
    absmax = jnp.max(jnp.abs(x2.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = jnp.maximum(absmax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x2.astype(jnp.float32) / sx), -127, 127).astype(
        jnp.int8
    )
    # Keep the int8 dot un-fused from its prologue and epilogue — letting
    # XLA fuse the dynamic quantization into the dot demotes it off the MXU
    # int8 path (measured 15-30x slower), and the big fused int8 graphs have
    # wedged this backend outright.
    xq = jax.lax.optimization_barrier(xq)
    acc = jax.lax.dot_general(
        xq,
        w_leaf.w,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc = jax.lax.optimization_barrier(acc)
    return acc.astype(jnp.float32) * sx * w_leaf.scales[None, :]


def linear(x: jax.Array, w_leaf, bias=None) -> jax.Array:
    """Compute ``x @ w (+ bias)`` for a dense or quantized weight leaf.

    x: [..., in]; returns [..., out]. On TPU, int8 weights use the native
    int8 MXU with dynamic activation quantization; int4 decode-sized
    activations use the fused Pallas dequant-matmul kernel
    (ops/pallas_qmm.py). Neither materializes dequantized weights in HBM.
    """
    if is_quantized(w_leaf):
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        on_tpu = jax.default_backend() == "tpu"
        from .pallas_qmm import (
            force_interpret,
            qmm_w4a8,
            qmm_w4a8_cp_stacked,
            qmm_w4a8_cpt,
            qmm_w4a8_cpt_split,
            qmm_w4a8_prefill,
            qmm_w4a8_prefill_cpt,
            qmm_w4a8_stacked,
            qmm_w8a8_tiled,
            w4a8_cp_supported,
            w4a8_cpt2_supported,
            w4a8_cpt_split_supported,
            w4a8_cpt_supported,
            w4a8_prefill_cpt_supported,
            w4a8_prefill_supported,
            w4a8_supported,
            w8a8_tiled_supported,
        )

        # CPU wiring tests run the same kernels in interpret mode.
        interp = force_interpret()

        if w_leaf.kind == "int4" and w_leaf.layout == "cpt_split":
            idx = w_leaf.idx if w_leaf.idx is not None else 0
            if w4a8_cpt_split_supported(x2.shape, w_leaf):
                y = qmm_w4a8_cpt_split(
                    x2, list(w_leaf.w), list(w_leaf.scales), idx,
                    group_size=w_leaf.group_size, interpret=interp,
                )
            elif w4a8_prefill_cpt_supported(
                x2.shape,
                dataclasses.replace(
                    w_leaf, w=w_leaf.w[0], scales=w_leaf.scales[0],
                    layout="cpt",
                ),
            ):
                # Prefill: run each stream's tiles through the prefill cpt
                # kernel, then restore cpt column order ([lo all streams |
                # hi all streams]) from the per-part [lo_i | hi_i] outputs.
                parts = [
                    qmm_w4a8_prefill_cpt(
                        x2, w_i, m_i, idx,
                        group_size=w_leaf.group_size, interpret=interp,
                    )
                    for w_i, m_i in zip(w_leaf.w, w_leaf.scales)
                ]
                half = parts[0].shape[-1] // 2
                y = jnp.concatenate(
                    [p[:, :half] for p in parts]
                    + [p[:, half:] for p in parts],
                    axis=-1,
                )
            else:
                y = None
            if y is not None:
                if w_leaf.out_true:
                    y = y[:, : w_leaf.out_true]
                y = y.reshape(*lead, y.shape[-1]).astype(x.dtype)
                if bias is not None:
                    y = y + bias.astype(y.dtype)
                return y

        if (
            w_leaf.kind == "int4"
            and w_leaf.layout == "cpt"
            and w4a8_prefill_cpt_supported(x2.shape, w_leaf)
        ):
            w_, m_ = w_leaf.w, w_leaf.scales
            idx = w_leaf.idx
            if idx is None:
                w_, m_ = w_[None], m_[None]
                idx = 0
            y = qmm_w4a8_prefill_cpt(
                x2, w_, m_, idx, group_size=w_leaf.group_size,
                interpret=interp,
            )
            if w_leaf.out_true:
                y = y[:, : w_leaf.out_true]
            y = y.reshape(*lead, y.shape[-1]).astype(x.dtype)
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y

        if (
            w_leaf.kind == "int4"
            and w_leaf.layout == "colpack"
            and w4a8_prefill_supported(x2.shape, w_leaf)
        ):
            w_, s_, z_ = w_leaf.w, w_leaf.scales, w_leaf.zeros
            idx = w_leaf.idx
            if idx is None:
                w_, s_, z_ = w_[None], s_[None], z_[None]
                idx = 0
            y = qmm_w4a8_prefill(
                x2, w_, s_, z_, idx, group_size=w_leaf.group_size,
                interpret=interp,
            )
            y = y.reshape(*lead, y.shape[-1]).astype(x.dtype)
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y

        if (
            w_leaf.kind == "int8"
            and w_leaf.layout == "tiled8"
            and w8a8_tiled_supported(x2.shape, w_leaf)
        ):
            y = qmm_w8a8_tiled(x2, w_leaf.w, w_leaf.scales, interpret=interp)
            y = y[:, : w_leaf.out_true]
            y = y.reshape(*lead, y.shape[-1]).astype(x.dtype)
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y
        if (
            w_leaf.kind == "int4"
            and w_leaf.layout == "cpt"
            and w4a8_cpt2_supported(x2.shape, w_leaf)
        ):
            # cpt layout: contiguous weight tiles + one fused metadata
            # sidecar stream (see to_cpt / ops/pallas_qmm.py qmm_w4a8_cpt).
            w_, m_ = w_leaf.w, w_leaf.scales
            idx = w_leaf.idx
            if idx is None:  # single leaf (vocab head): unit stack axis
                w_, m_ = w_[None], m_[None]
                idx = 0
            y = qmm_w4a8_cpt(
                x2, w_, m_, idx, group_size=w_leaf.group_size,
                interpret=interp,
            )
            if w_leaf.out_true:
                y = y[:, : w_leaf.out_true]
            y = y.reshape(*lead, y.shape[-1]).astype(x.dtype)
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y
        if (
            w_leaf.kind == "int4"
            and w_leaf.layout == "colpack_tiled"
            and w4a8_cpt_supported(x2.shape, w_leaf)
        ):
            # Tiled colpack head: one unit stack axis, layer idx 0; the
            # kernel's 4D (tiled) weight path fetches contiguous blocks.
            y = qmm_w4a8_cp_stacked(
                x2, w_leaf.w[None], w_leaf.scales[None],
                w_leaf.zeros[None], 0, group_size=w_leaf.group_size,
                interpret=interp,
            )
            y = y[:, : w_leaf.out_true]
            y = y.reshape(*lead, y.shape[-1]).astype(x.dtype)
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y
        if (
            w_leaf.kind == "int4"
            and w_leaf.layout == "colpack"
            and w4a8_cp_supported(x2.shape, w_leaf)
        ):
            w_, s_, z_ = w_leaf.w, w_leaf.scales, w_leaf.zeros
            idx = w_leaf.idx
            if idx is None:  # single layer: add a unit stack axis
                w_, s_, z_ = w_[None], s_[None], z_[None]
                idx = 0
            y = qmm_w4a8_cp_stacked(
                x2, w_, s_, z_, idx, group_size=w_leaf.group_size,
                interpret=interp,
            )
            y = y.reshape(*lead, y.shape[-1]).astype(x.dtype)
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y
        if (
            w_leaf.kind == "int4"
            and w_leaf.layout == "rowpack"
            and w4a8_supported(x2.shape, w_leaf)
        ):
            if w_leaf.idx is not None:  # stacked: layer indexed in-kernel
                y = qmm_w4a8_stacked(
                    x2, w_leaf.w, w_leaf.scales, w_leaf.zeros, w_leaf.idx,
                    group_size=w_leaf.group_size, interpret=interp,
                )
            else:
                y = qmm_w4a8(
                    x2, w_leaf.w, w_leaf.scales, w_leaf.zeros,
                    group_size=w_leaf.group_size, interpret=interp,
                )
            y = y.reshape(*lead, y.shape[-1]).astype(x.dtype)
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y
        # All remaining paths are XLA — dynamic slices of stacked leaves
        # fuse into their consumers, so resolving here costs no copy.
        w_leaf = w_leaf.resolved()
        # Decode-sized rows only: at prefill sizes the barriers would
        # materialize [P, out] int32/f32 intermediates, so large-L int8
        # matmuls take the per-layer dequant path below (transient bf16
        # weights for one layer at a time under the layer scan).
        if (
            w_leaf.kind == "int8"
            and w_leaf.layout != "tiled8"
            and (on_tpu or interp)
            and x2.shape[0] <= 32
        ):
            y = w8a8_matmul(x2, w_leaf)
            y = y.reshape(*lead, y.shape[-1]).astype(x.dtype)
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y
        w = dequantize_weight(w_leaf, dtype=x.dtype)
    else:
        w = w_leaf
    y = jax.lax.dot_general(
        x,
        w,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
