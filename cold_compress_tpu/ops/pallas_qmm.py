"""Pallas TPU kernel: fused dequantize + matmul for weight-only int4 (W4A8).

The decode hot path is weight-bandwidth-bound: at batch 1 every token reads
all weights once, so the kernel must stream the *packed* bytes at HBM speed.
Two design points measured on this backend (scripts/perf_probe2.py):

* Dual-dot unpack: the packed byte is stored as int8 with a SIGNED high
  nibble, b = ((q_hi - 8) << 4) | q_lo, so the byte feeds the int8 MXU
  directly for the hi plane:  dot(x_hi, b) = 16*dot(x_hi, h) + dot(x_hi, l).
  Only the low nibble needs a VPU op (one int8 `& 0xF`). Three MXU dots per
  group replace two dots + a 6-op/byte int32-hop unpack (the MXU is idle at
  decode sizes; the VPU is not).
* Scan-over-layers feeds custom calls through XLA dynamic-slices, which
  MATERIALIZE a copy of each layer's weights every step (~3x HBM traffic —
  measured 230 GB/s effective vs the 712 GB/s the same part streams for a
  fused XLA dot). The stacked variant therefore takes the WHOLE [L, ...]
  weight stack plus the layer index as a scalar-prefetch argument and lets
  the BlockSpec index maps fetch that layer's tiles straight from HBM.

TPU-native replacement for the reference's ``aten._weight_int4pack_mm`` CUDA
kernel (reference: quantize.py:414-425, SURVEY.md §2.9).

Layouts (matching quantization/weight_quant.py / ops/linear.py::pack_int4):
  w  int8 [in//2, out] — byte r packs weight rows r (low nibble, unsigned
     0..15) and r + in/2 (high nibble, SIGNED value q-8 in -8..7).
  scales/zeros f32 [in/group_size, out]; groups 0..in/2/gs-1 cover the low
     rows, the rest the high rows. dequant = (q - 8) * scale + zero.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_OUT = 256

# Experiment knobs (bench A/B without code edits):
#   CCT_QMM_VMEM_MB — raise the Mosaic scoped-vmem limit (default ~16 MB)
#                     so bigger double-buffered weight blocks fit.
#   CCT_QMM_TILE    — override the output-tile budget picker.
#   CCT_QMM_STREAMS — weight blocks fetched through N independent DMA
#                     pipelines per grid step (same HBM buffer, offset
#                     index maps). The single-pipeline rate on this
#                     backend caps well below what the part streams for
#                     a fused XLA dot; N=2 doubles in-flight block DMAs.
#                     Measured WORSE in production (91.38 vs 92.3, r3):
#                     same-buffer aliasing defeats the DMA pipeline.
#   CCT_QMM_INKQ    — move activation quantization + block-diagonal
#                     layout + scale epilogue INSIDE the cpt kernel
#                     (grid-step-0 VMEM scratch) so the per-projection
#                     glue overlaps the weight-block DMAs instead of
#                     stalling the stream between kernels. Default ON
#                     since r4 (=0 restores the XLA prologue): +4 tok/s
#                     same-machine, weight stream 521 -> 543 GB/s.
#   CCT_QMM_SPLIT   — N>1 splits each stacked cpt leaf's tile axis into N
#                     PHYSICALLY SEPARATE HBM buffers at repack time
#                     (ops/linear.py::to_cpt_split), the multi-stream
#                     layout probe8 found profitable; the decode kernel
#                     then runs one DMA chain per buffer
#                     (qmm_w4a8_cpt_split).
_VMEM_MB = int(os.environ.get("CCT_QMM_VMEM_MB", "0"))
_TILE_ENV = int(os.environ.get("CCT_QMM_TILE", "0"))
_STREAMS = int(os.environ.get("CCT_QMM_STREAMS", "1"))


def force_interpret() -> bool:
    """CCT_PALLAS_INTERPRET=1: every Pallas routing gate accepts non-TPU
    backends and the kernels run in interpret mode. This lets CPU tests
    drive the EXACT hardware code paths end-to-end (param repacks, pad
    slicing, scale layouts, cache wiring) — kernel unit tests alone don't
    cover the plumbing between them."""
    return os.environ.get("CCT_PALLAS_INTERPRET", "0") == "1"


def backend_ok() -> bool:
    """True when Pallas kernel paths may be routed to (real TPU, or any
    backend under the interpret-mode override)."""
    return jax.default_backend() == "tpu" or force_interpret()


def _compiler_params(min_vmem_bytes: int = 0):
    """Mosaic compiler params; ``min_vmem_bytes`` raises the ~16 MB scoped
    vmem limit when the caller knows its in-flight block footprint exceeds
    it (multi-stream kernels keep S double-buffered weight blocks resident
    — measured 17.3 M at S=2 on the w2 projection, a hard compile error
    under the default limit). CCT_QMM_VMEM_MB still overrides upward."""
    need = max(min_vmem_bytes, _VMEM_MB * 1024 * 1024)
    if need > 16 * 1024 * 1024 or _VMEM_MB:
        return pltpu.CompilerParams(vmem_limit_bytes=need)
    return None


def _stream_vmem_bytes(S: int, block_bytes: int, side_bytes: int = 0,
                       fixed_bytes: int = 0) -> int:
    """Scoped-vmem floor for S concurrent double-buffered weight streams.

    Each stream keeps 2 blocks in flight (weight block + its per-stream
    side operands: scale/zero blocks and the output block, which are all
    block-indexed and therefore double-buffered too). ``fixed_bytes``
    covers constant-index operands (the block-diagonal activations), which
    scale with the tile size under a CCT_QMM_TILE override and so cannot
    hide in a flat pad. A 4 MB pad absorbs Mosaic scratch."""
    return (
        2 * S * (block_bytes + side_bytes)
        + fixed_bytes
        + 4 * 1024 * 1024
    )


def _pick_tile_out(INh: int, OUT: int) -> int:
    """Largest MXU-aligned output tile whose packed-weight block fits a
    ~2.5 MB VMEM budget (double-buffered under the ~16 MB v5e VMEM).

    Grid steps carry ~2 us of fixed sequencing overhead each while a 256-wide
    tile streams in <1 us — at decode sizes the kernel is STEP-bound, not
    byte-bound (measured 14.3 ms/token at TO=256 vs the ~6 ms the same bytes
    stream in). Fewer, fatter steps are strictly better until the block
    breaks VMEM double-buffering.
    """
    # 2048-wide tiles were probed (budget 4.5 MB) and came out ~7% SLOWER —
    # the 4.2 MB blocks break DMA double-buffering under VMEM pressure.
    # 1024 is the measured sweet spot (scripts/perf_probe3.py).
    budget = 3_700_000  # int8 bytes: [INh, TO] packed block
    for cand in (1024, 512, 256, 128):
        if OUT % cand == 0 and INh * cand <= budget:
            return cand
    return 128


def _w4a8_kernel(idx_ref, xlo_ref, xhi_ref, xsl_ref, xsh_ref, w_ref, s_ref,
                 z_ref, o_ref, *, group_size, n_groups_half, groups_per_chunk,
                 rows_l):
    """Block-diagonal dual-dot W4A8 for one [INh, TO] packed tile.

    The decode matmul has only L<=8 activation rows — a plain per-group dot
    wastes 15/16 of the MXU's 128-row systolic array and goes pass-bound at
    ~176 GB/s (measured). Here the activations arrive *block-diagonal*:
    row (g*L + l) of ``xlo/xhi`` holds query row l's slice for group g and
    zeros elsewhere, so ONE [128, CH] @ [CH, TO] int8 dot yields every
    group's partial product separately (the zero blocks contribute nothing):

      Phb = Xbd_hi . b      (packed byte, signed-hi nibble: no unpack)
      Pll = Xbd_lo . l      (l = b & 0xF, the only VPU op per byte)
      Phl = Xbd_hi . l
      acc = sum_g  s_lo[g] * Pll[g] + s_hi[g]/16 * (Phb - Phl)[g]
          + zero-point terms from the activation row-sums.

    3 big dots replace 3*ngh tiny ones: full MXU rows, no per-dot overhead.
    """
    ngh, ngc, L = n_groups_half, groups_per_chunk, rows_l
    gs = group_size
    TO = w_ref.shape[-1]
    CH = ngc * gs
    n_chunks = -(-ngh // ngc)

    acc = jnp.zeros((L, TO), jnp.float32)
    for c in range(n_chunks):
        g0 = c * ngc
        ng = min(ngc, ngh - g0)
        rows = ng * L
        xlo = xlo_ref[pl.ds(g0 * L, rows), : ng * gs]
        xhi = xhi_ref[pl.ds(g0 * L, rows), : ng * gs]
        b = w_ref[0, pl.ds(g0 * gs, ng * gs), :]
        lo = b & 0xF
        phb = jnp.dot(xhi, b, preferred_element_type=jnp.int32)
        pll = jnp.dot(xlo, lo, preferred_element_type=jnp.int32)
        phl = jnp.dot(xhi, lo, preferred_element_type=jnp.int32)
        s_lo = s_ref[0, pl.ds(g0, ng), :].astype(jnp.float32)  # [ng, TO]
        s_hi = s_ref[0, pl.ds(ngh + g0, ng), :].astype(jnp.float32)
        term = (
            pll.astype(jnp.float32).reshape(ng, L, TO) * s_lo[:, None, :]
            + (phb - phl).astype(jnp.float32).reshape(ng, L, TO)
            * (s_hi * 0.0625)[:, None, :]
        )
        acc += jnp.sum(term, axis=0)

    # Affine zero-point terms over all groups: [L, ngh] @ [ngh, TO] f32 dots.
    s_all = s_ref[0].astype(jnp.float32)  # [2*ngh, TO]
    z_all = z_ref[0].astype(jnp.float32)
    zterm_lo = z_all[:ngh] - 8.0 * s_all[:ngh]
    acc += jnp.dot(xsl_ref[...], zterm_lo)  # [L, ngh] @ [ngh, TO]
    acc += jnp.dot(xsh_ref[...], z_all[ngh:])
    o_ref[...] = acc


def _quantize_rows(x):
    """Per-row dynamic int8 activation quantization (scale absorbed in the
    caller's epilogue)."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(absmax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    # Keep the quantization un-fused from the int8 dots (fusing demotes the
    # MXU int8 path; measured in round 1).
    return jax.lax.optimization_barrier(xq), sx


def _pad_rows(x, mult: int = 8):
    L = x.shape[0]
    pad = (-L) % mult
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, L


@functools.partial(
    jax.jit, static_argnames=("group_size", "interpret", "tile_out")
)
def qmm_w4a8_stacked(x, w_stack, s_stack, z_stack, layer_idx,
                     group_size: int = 128, interpret: bool = False,
                     tile_out: int | None = None):
    """x [L, IN] @ layer ``layer_idx`` of int4-packed stacks.

    w_stack [NL, IN//2, OUT] int8 (signed-hi packing); s/z [NL, IN/gs, OUT].
    The layer index rides as a scalar-prefetch arg so only that layer's
    tiles are fetched — no whole-layer copy.
    """
    x, true_L = _pad_rows(x)
    L, IN = x.shape
    INh = IN // 2
    NL, _, OUT = w_stack.shape
    gs = group_size
    ngh = INh // gs
    ngc = max(1, min(ngh, 128 // L))  # groups folded into one dot's rows
    CH = ngc * gs
    TO = tile_out or _pick_tile_out(INh, OUT)
    assert OUT % TO == 0

    xq, sx = _quantize_rows(x)
    xlo = xq[:, :INh]
    xhi = xq[:, INh:]
    rs = lambda a: jnp.sum(  # noqa: E731
        a.reshape(L, ngh, gs).astype(jnp.float32), axis=-1
    )  # [L, ngh]
    xsl, xsh = rs(xlo), rs(xhi)

    # Block-diagonal layout: row g*L + l carries query row l's group-g slice
    # in local chunk columns [(g % ngc)*gs, ...), zeros elsewhere.
    onehot = (
        (jnp.arange(ngh)[:, None] % ngc) == jnp.arange(ngc)[None, :]
    ).astype(jnp.int8)

    def bd(xp):
        xt = xp.reshape(L, ngh, gs).transpose(1, 0, 2)  # [ngh, L, gs]
        full = onehot[:, None, :, None] * xt[:, :, None, :]
        return full.reshape(ngh * L, CH)

    xlo_bd = bd(xlo)
    xhi_bd = bd(xhi)

    kernel = functools.partial(
        _w4a8_kernel, group_size=gs, n_groups_half=ngh,
        groups_per_chunk=ngc, rows_l=L,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(OUT // TO,),
        in_specs=[
            pl.BlockSpec((ngh * L, CH), lambda j, idx: (0, 0)),
            pl.BlockSpec((ngh * L, CH), lambda j, idx: (0, 0)),
            pl.BlockSpec((L, ngh), lambda j, idx: (0, 0)),
            pl.BlockSpec((L, ngh), lambda j, idx: (0, 0)),
            pl.BlockSpec((1, INh, TO), lambda j, idx: (idx[0], 0, j)),
            pl.BlockSpec((1, 2 * ngh, TO), lambda j, idx: (idx[0], 0, j)),
            pl.BlockSpec((1, 2 * ngh, TO), lambda j, idx: (idx[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((L, TO), lambda j, idx: (0, j)),
    )
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, OUT), jnp.float32),
        compiler_params=_compiler_params(),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * L * IN * OUT,
            bytes_accessed=IN * OUT // 2 + L * IN + L * OUT * 4,
            transcendentals=0,
        ),
    )(
        jnp.asarray([layer_idx], jnp.int32),
        xlo_bd, xhi_bd, xsl, xsh, w_stack, s_stack, z_stack,
    )
    return (y * sx)[:true_L]


@functools.partial(jax.jit, static_argnames=("group_size", "interpret"))
def qmm_w4a8(x, w_packed, scales, zeros, group_size: int = 128,
             interpret: bool = False):
    """Single-layer wrapper: x [L, IN] @ int4-packed [IN//2, OUT]."""
    return qmm_w4a8_stacked(
        x, w_packed[None], scales[None], zeros[None], 0,
        group_size=group_size, interpret=interpret,
    )


# --------------------------------------------------------------------------
# v3: column-packed dual-dot (2 MXU dots instead of 3)
# --------------------------------------------------------------------------
#
# The row-packed scheme above needs THREE int8 dots per weight block (phb,
# pll, phl) because the two nibbles of a byte belong to different *input*
# rows, so each nibble plane multiplies a different activation plane. If the
# byte instead packs the weights of the SAME input row for two different
# *output* columns (j and j + OUT/2), one activation operand serves both:
#
#   d1 = x_bd . b         = 16 * (x . q_hi) + (x . q_lo)      (b = 16h | l)
#   d2 = x_bd . (b & 0xF) =                    (x . q_lo)
#   =>  x . q_hi = (d1 - d2) / 16   (exact in int32; |.| < 2^24 so f32 too)
#
# Two dots over half the output width = IN*OUT MXU columns per tile — the
# information-theoretic minimum for int8 MXU dequant-matmul — vs the
# row-packed scheme's 3 * (IN/2) * OUT = 1.5x. The block-diagonal activation
# layout (one row per (group, query-row)) is kept so group-wise scales apply
# to exact per-group partials after the dot.


def _cp_tile_body(xbd_ref, xs_ref, w_ref, s_ref, z_ref, o_ref, *,
                  group_size, n_groups, groups_per_chunk, rows_l, tiled):
    """Column-packed dual-dot W4A8 for one [IN, TOh] packed tile.

    Writes o_ref [2, L, TOh]: plane 0 = output columns [j*TOh ...) of the
    low-nibble half, plane 1 = the matching columns of the high half
    (final layout assembled by the wrapper). ``tiled`` weights carry an
    extra leading tile axis (block (1, 1, IN, TOh)).
    """
    ngf, ngc, L = n_groups, groups_per_chunk, rows_l
    gs = group_size
    TOh = w_ref.shape[-1]
    n_chunks = -(-ngf // ngc)

    acc_lo = jnp.zeros((L, TOh), jnp.float32)
    acc_hi = jnp.zeros((L, TOh), jnp.float32)
    for c in range(n_chunks):
        g0 = c * ngc
        ng = min(ngc, ngf - g0)
        rows = ng * L
        xbd = xbd_ref[pl.ds(g0 * L, rows), : ng * gs]
        if tiled:
            b = w_ref[0, 0, pl.ds(g0 * gs, ng * gs), :]
        else:
            b = w_ref[0, pl.ds(g0 * gs, ng * gs), :]
        lo = b & 0xF
        d1 = jnp.dot(xbd, b, preferred_element_type=jnp.int32)
        d2 = jnp.dot(xbd, lo, preferred_element_type=jnp.int32)
        s_lo = s_ref[0, 0, pl.ds(g0, ng), :].astype(jnp.float32)  # [ng, TOh]
        s_hi = s_ref[0, 1, pl.ds(g0, ng), :].astype(jnp.float32)
        xl = d2.astype(jnp.float32).reshape(ng, L, TOh)
        xh = ((d1 - d2).astype(jnp.float32) * 0.0625).reshape(ng, L, TOh)
        acc_lo += jnp.sum(xl * s_lo[:, None, :], axis=0)
        acc_hi += jnp.sum(xh * s_hi[:, None, :], axis=0)

    # Affine zero-point terms over all groups: [L, ngf] @ [ngf, TOh] f32.
    s_all = s_ref[0].astype(jnp.float32)  # [2, ngf, TOh]
    z_all = z_ref[0].astype(jnp.float32)
    xs = xs_ref[...]
    # lo nibble stores q in [0,15]: dequant (q-8)*s + z. hi nibble stores
    # q-8 signed already, so only the zero term remains.
    o_ref[0] = acc_lo + jnp.dot(xs, z_all[0] - 8.0 * s_all[0])
    o_ref[1] = acc_hi + jnp.dot(xs, z_all[1])


def _w4a8_cp_kernel(idx_ref, xbd_ref, xs_ref, w_ref, s_ref, z_ref, o_ref,
                    *, group_size, n_groups, groups_per_chunk, rows_l,
                    tiled=False):
    _cp_tile_body(
        xbd_ref, xs_ref, w_ref, s_ref, z_ref, o_ref,
        group_size=group_size, n_groups=n_groups,
        groups_per_chunk=groups_per_chunk, rows_l=rows_l, tiled=tiled,
    )


def _w4a8_cp_kernel_ms(idx_ref, xbd_ref, xs_ref, *refs, group_size,
                       n_groups, groups_per_chunk, rows_l, tiled, streams):
    """Multi-stream variant: ``streams`` (w, s, z) input triples followed by
    ``streams`` outputs — each stream's block rides its own DMA pipeline."""
    S = streams
    for i in range(S):
        _cp_tile_body(
            xbd_ref, xs_ref, refs[3 * i], refs[3 * i + 1], refs[3 * i + 2],
            refs[3 * S + i],
            group_size=group_size, n_groups=n_groups,
            groups_per_chunk=groups_per_chunk, rows_l=rows_l, tiled=tiled,
        )


def _pick_tile_out_cp(IN: int, OUTh: int) -> int:
    if _TILE_ENV:
        if OUTh % _TILE_ENV == 0:
            return _TILE_ENV
    budget = 3_700_000  # int8 bytes: [IN, TOh] packed block
    for cand in (1024, 512, 256, 128):
        if OUTh % cand == 0 and IN * cand <= budget:
            return cand
    return 128


@functools.partial(
    jax.jit, static_argnames=("group_size", "interpret", "tile_out")
)
def qmm_w4a8_cp_stacked(x, w_stack, s_stack, z_stack, layer_idx,
                        group_size: int = 128, interpret: bool = False,
                        tile_out: int | None = None):
    """x [L, IN] @ layer ``layer_idx`` of column-packed int4 stacks.

    w_stack int8, byte (i, j) packs weight (i, j) in the low nibble
    (unsigned q) and weight (i, j + OUT//2) in the high nibble (signed
    q-8). Two storage layouts:
      flat:  [NL, IN, OUT//2]
      tiled: [NL, n_tiles, IN, TOh] — each grid step's block is CONTIGUOUS
             in HBM (the flat layout's blocks are strided rows of TOh
             bytes, which this backend's DMA streams well below peak).
    s/z [NL, 2, IN/gs, OUT//2] with plane 0 = low half columns.
    """
    true_L = x.shape[0]
    if true_L > 1:
        x, _ = _pad_rows(x)
    L, IN = x.shape
    tiled = w_stack.ndim == 4
    if tiled:
        NL, n_tiles, _, TOh_t = w_stack.shape
        OUTh = n_tiles * TOh_t
        tile_out = TOh_t
    else:
        NL, _, OUTh = w_stack.shape
    gs = group_size
    ngf = IN // gs
    # rows per chunk = ngc*L <= 128 (one MXU pass); CH <= 4096 bounds the
    # block-diagonal operand's VMEM footprint.
    ngc = max(1, min(ngf, 128 // L, 4096 // gs))
    CH = ngc * gs
    TOh = tile_out or _pick_tile_out_cp(IN, OUTh)
    assert OUTh % TOh == 0

    xq, sx = _quantize_rows(x)
    xs = jnp.sum(
        xq.reshape(L, ngf, gs).astype(jnp.float32), axis=-1
    )  # [L, ngf]

    onehot = (
        (jnp.arange(ngf)[:, None] % ngc) == jnp.arange(ngc)[None, :]
    ).astype(jnp.int8)
    xt = xq.reshape(L, ngf, gs).transpose(1, 0, 2)  # [ngf, L, gs]
    xbd = (onehot[:, None, :, None] * xt[:, :, None, :]).reshape(
        ngf * L, CH
    )

    T = OUTh // TOh
    S = _STREAMS if (_STREAMS > 1 and T % _STREAMS == 0) else 1
    cost = pl.CostEstimate(
        flops=2 * L * IN * OUTh * 2,
        bytes_accessed=IN * OUTh + L * IN + L * OUTh * 8,
        transcendentals=0,
    )
    idx_arg = jnp.asarray([layer_idx], jnp.int32)

    if S > 1:
        # The same HBM buffers feed S operands whose index maps cover
        # disjoint tile ranges — S block DMAs in flight per grid step.
        Ts = T // S
        kernel = functools.partial(
            _w4a8_cp_kernel_ms, group_size=gs, n_groups=ngf,
            groups_per_chunk=ngc, rows_l=L, tiled=tiled, streams=S,
        )
        in_specs = [
            pl.BlockSpec((ngf * L, CH), lambda j, idx: (0, 0)),
            pl.BlockSpec((L, ngf), lambda j, idx: (0, 0)),
        ]
        operands = []
        for i in range(S):
            off = i * Ts
            w_spec = (
                pl.BlockSpec(
                    (1, 1, IN, TOh),
                    lambda j, idx, off=off: (idx[0], j + off, 0, 0),
                )
                if tiled
                else pl.BlockSpec(
                    (1, IN, TOh),
                    lambda j, idx, off=off: (idx[0], 0, j + off),
                )
            )
            sz_spec = pl.BlockSpec(
                (1, 2, ngf, TOh),
                lambda j, idx, off=off: (idx[0], 0, 0, j + off),
            )
            in_specs += [w_spec, sz_spec, sz_spec]
            operands += [w_stack, s_stack, z_stack]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Ts,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((2, L, TOh), lambda j, idx: (0, 0, j))
                for _ in range(S)
            ],
        )
        parts = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((2, L, Ts * TOh), jnp.float32)
                for _ in range(S)
            ],
            compiler_params=_compiler_params(
                _stream_vmem_bytes(
                    S,
                    IN * TOh,
                    # per-stream block-indexed sides: s + z blocks
                    # [1, 2, ngf, TOh] and the [2, L, TOh] f32 output.
                    side_bytes=(
                        2 * (2 * ngf * TOh) * s_stack.dtype.itemsize
                        + 2 * L * TOh * 4
                    ),
                    fixed_bytes=xbd.size + xs.size * 4,
                )
            ),
            interpret=interpret,
            cost_estimate=cost,
        )(idx_arg, xbd, xs, *operands)
        y = jnp.concatenate(parts, axis=-1)
    else:
        kernel = functools.partial(
            _w4a8_cp_kernel, group_size=gs, n_groups=ngf,
            groups_per_chunk=ngc, rows_l=L, tiled=tiled,
        )
        w_spec = (
            pl.BlockSpec((1, 1, IN, TOh), lambda j, idx: (idx[0], j, 0, 0))
            if tiled
            else pl.BlockSpec((1, IN, TOh), lambda j, idx: (idx[0], 0, j))
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((ngf * L, CH), lambda j, idx: (0, 0)),
                pl.BlockSpec((L, ngf), lambda j, idx: (0, 0)),
                w_spec,
                pl.BlockSpec(
                    (1, 2, ngf, TOh), lambda j, idx: (idx[0], 0, 0, j)
                ),
                pl.BlockSpec(
                    (1, 2, ngf, TOh), lambda j, idx: (idx[0], 0, 0, j)
                ),
            ],
            out_specs=pl.BlockSpec((2, L, TOh), lambda j, idx: (0, 0, j)),
        )
        y = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((2, L, OUTh), jnp.float32),
            compiler_params=_compiler_params(),
            interpret=interpret,
            cost_estimate=cost,
        )(idx_arg, xbd, xs, w_stack, s_stack, z_stack)
    # [2, L, OUTh] -> [L, OUT] with low-half columns first.
    y = y.transpose(1, 0, 2).reshape(L, 2 * OUTh)
    return (y * sx)[:true_L]


# --------------------------------------------------------------------------
# v4 "cpt": tile-major colpack blocks + one fused metadata stream
# --------------------------------------------------------------------------
#
# Two measured inefficiencies of the v3 stacked path (r3 probe batch,
# results/tpu_batch_r3/):
#   1. Flat [NL, IN, OUTh] weight blocks are STRIDED in HBM (each grid step
#      reads IN rows of TOh bytes with stride OUTh) — the r3 probes stream
#      contiguous [NL, T, IN, TOh] tiles at 573-632 GB/s while the production
#      kernel plateaus at ~430-470.
#   2. Scales and zeros ride two extra block-indexed DMA streams, and the
#      zero-point terms (z_lo - 8 s_lo) are recomputed on the VPU every step.
# The cpt layout fixes both at setup time (ops/linear.py to_cpt): weights
# become contiguous [NL, T, IN, TOh] tiles and the per-tile metadata is ONE
# fused [NL, T, 4*ngf, TOh] sidecar whose planes are (s_lo, s_hi,
# zt_lo = z_lo - 8 s_lo, zt_hi = z_hi), in the checkpoint's scale dtype.


def _cpt_tile_body(xbd_ref, xs_ref, w_ref, m_ref, o_ref, *, group_size,
                   n_groups, groups_per_chunk, rows_l, sx_ref=None):
    """Column-packed dual-dot for one contiguous [IN, TOh] tile with the
    fused metadata sidecar. Writes o_ref [2, L, TOh] (plane 0 = low-half
    columns) exactly like _cp_tile_body."""
    ngf, ngc, L = n_groups, groups_per_chunk, rows_l
    gs = group_size
    TOh = w_ref.shape[-1]
    n_chunks = -(-ngf // ngc)

    acc_lo = jnp.zeros((L, TOh), jnp.float32)
    acc_hi = jnp.zeros((L, TOh), jnp.float32)
    for c in range(n_chunks):
        g0 = c * ngc
        ng = min(ngc, ngf - g0)
        rows = ng * L
        xbd = xbd_ref[pl.ds(g0 * L, rows), : ng * gs]
        b = w_ref[0, 0, pl.ds(g0 * gs, ng * gs), :]
        lo = b & 0xF
        d1 = jnp.dot(xbd, b, preferred_element_type=jnp.int32)
        d2 = jnp.dot(xbd, lo, preferred_element_type=jnp.int32)
        s_lo = m_ref[0, 0, pl.ds(g0, ng), :].astype(jnp.float32)
        s_hi = m_ref[0, 0, pl.ds(ngf + g0, ng), :].astype(jnp.float32)
        xl = d2.astype(jnp.float32).reshape(ng, L, TOh)
        xh = ((d1 - d2).astype(jnp.float32) * 0.0625).reshape(ng, L, TOh)
        acc_lo += jnp.sum(xl * s_lo[:, None, :], axis=0)
        acc_hi += jnp.sum(xh * s_hi[:, None, :], axis=0)

    # Zero-point terms: precomputed at repack, one f32 dot per half.
    xs = xs_ref[...]
    zt_lo = m_ref[0, 0, pl.ds(2 * ngf, ngf), :].astype(jnp.float32)
    zt_hi = m_ref[0, 0, pl.ds(3 * ngf, ngf), :].astype(jnp.float32)
    out0 = acc_lo + jnp.dot(xs, zt_lo)
    out1 = acc_hi + jnp.dot(xs, zt_hi)
    if sx_ref is not None:
        # In-kernel activation-quant variant: the per-row scale lives in
        # VMEM scratch and folds into the store, replacing the wrapper's
        # (y * sx) epilogue.
        out0 = out0 * sx_ref[...]
        out1 = out1 * sx_ref[...]
    o_ref[0] = out0
    o_ref[1] = out1


def _cpt_kernel(idx_ref, xbd_ref, xs_ref, w_ref, m_ref, o_ref, *,
                group_size, n_groups, groups_per_chunk, rows_l):
    _cpt_tile_body(
        xbd_ref, xs_ref, w_ref, m_ref, o_ref, group_size=group_size,
        n_groups=n_groups, groups_per_chunk=groups_per_chunk, rows_l=rows_l,
    )


def _cpt_kernel_inkq(idx_ref, x_ref, w_ref, m_ref, o_ref,
                     xbd_scr, xs_scr, sx_scr, *, group_size, n_groups,
                     groups_per_chunk, rows_l):
    """cpt dual-dot with IN-KERNEL activation quantization.

    The out-of-kernel prologue (per-row int8 quantization, block-diagonal
    activation layout, per-group row sums) and the (y * sx) epilogue are
    serialized XLA ops BETWEEN weight-streaming kernels: nothing overlaps
    them, so each projection's DMA pipeline sits idle while they run
    (~0.5 ms/token of the 6.6 ms weight stream at 8B — p11 production
    6.60 ms vs probe9 bare kernels 6.04, PERF.md round-3 decomposition).
    Here grid step 0 computes them on the VPU into VMEM scratch WHILE the
    auto-pipeline's first weight-block DMAs are already in flight, and the
    scale folds into the output store.
    """
    gs, ngf, ngc, L = group_size, n_groups, groups_per_chunk, rows_l

    @pl.when(pl.program_id(0) == 0)
    def _prologue():
        xf = x_ref[...].astype(jnp.float32)  # [L, IN]
        absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        sx = jnp.maximum(absmax, 1e-8) / 127.0
        # Keep the quantized values in f32 until the final store: Mosaic
        # only supports non-no-op shape insertion/broadcast for 32-bit
        # types ("Insertion of minor dim ... only supported for 32-bit
        # types" on int8 — hardware-compile-only, interpret passes).
        xqf = jnp.clip(jnp.round(xf / sx), -127, 127)
        sx_scr[...] = sx
        xs_scr[...] = jnp.sum(xqf.reshape(L, ngf, gs), axis=-1)
        # Block-diagonal layout, built per chunk: within chunk c the
        # destination column band of group g0+i IS its source columns, so
        # each chunk block is a pure mask-select of its broadcast slice —
        # no per-row shifts, major-dim broadcasts only.
        n_chunks = -(-ngf // ngc)
        for c in range(n_chunks):
            g0 = c * ngc
            ng = min(ngc, ngf - g0)
            xc = xqf[:, g0 * gs:(g0 + ng) * gs]  # [L, ng*gs]
            rep = jnp.broadcast_to(
                xc[None], (ng, L, ng * gs)
            ).reshape(ng * L, ng * gs)
            rowg = jax.lax.broadcasted_iota(
                jnp.int32, (ng * L, ng * gs), 0
            ) // L
            colg = jax.lax.broadcasted_iota(
                jnp.int32, (ng * L, ng * gs), 1
            ) // gs
            blk = jnp.where(rowg == colg, rep, 0.0)
            xbd_scr[pl.ds(g0 * L, ng * L), pl.ds(0, ng * gs)] = (
                blk.astype(jnp.int8)
            )

    _cpt_tile_body(
        xbd_scr, xs_scr, w_ref, m_ref, o_ref, group_size=group_size,
        n_groups=n_groups, groups_per_chunk=groups_per_chunk, rows_l=rows_l,
        sx_ref=sx_scr,
    )


def _cpt_kernel_ms(idx_ref, xbd_ref, xs_ref, *refs, group_size, n_groups,
                   groups_per_chunk, rows_l, streams):
    """Multi-stream: ``streams`` (w, m) input pairs then ``streams``
    outputs — each pair's blocks ride their own DMA pipeline."""
    S = streams
    for i in range(S):
        _cpt_tile_body(
            xbd_ref, xs_ref, refs[2 * i], refs[2 * i + 1], refs[2 * S + i],
            group_size=group_size, n_groups=n_groups,
            groups_per_chunk=groups_per_chunk, rows_l=rows_l,
        )


@functools.partial(
    jax.jit, static_argnames=("group_size", "interpret", "inkq")
)
def qmm_w4a8_cpt(x, w_tiles, meta, layer_idx, group_size: int = 128,
                 interpret: bool = False, inkq: Optional[bool] = None):
    """x [L, IN] @ layer ``layer_idx`` of cpt-layout int4 stacks.

    w_tiles [NL, T, IN, TOh] int8 colpack bytes, contiguous per (layer,
    tile); meta [NL, T, 4*ngf, TOh] fused sidecar (see module comment).
    Returns [L, 2*T*TOh] f32 with low-half columns first.

    ``inkq=None`` defers to the CCT_QMM_INKQ env gate (trace-time, so the
    env must be process-constant; tests pass it explicitly): activation
    quantization + block-diagonal layout + scale epilogue move inside the
    kernel (grid step 0, VMEM scratch) so they overlap the first weight
    block DMAs instead of stalling the stream between kernels.
    """
    true_L = x.shape[0]
    if true_L > 1:
        x, _ = _pad_rows(x)
    L, IN = x.shape
    NL, T, _, TOh = w_tiles.shape
    OUTh = T * TOh
    gs = group_size
    ngf = IN // gs
    ngc = max(1, min(ngf, 128 // L, 4096 // gs))
    CH = ngc * gs

    if inkq is None:
        # Default ON since r4: the in-kernel prologue overlaps the first
        # weight-block DMAs instead of stalling between kernels — measured
        # 107.6/106.7 vs 103.3 tok/s same-machine (results/tpu_batch_r4/
        # bench_inkq2*.log, weight stream 543 GB/s vs 521), with exact
        # math parity to the out-of-kernel prologue (tests/test_qmm_cp.py).
        inkq = os.environ.get("CCT_QMM_INKQ", "1") == "1"
    if inkq and _STREAMS <= 1:
        cost = pl.CostEstimate(
            flops=2 * L * IN * OUTh * 2,
            bytes_accessed=IN * OUTh + L * IN + L * OUTh * 8,
            transcendentals=0,
        )
        idx_arg = jnp.asarray([layer_idx], jnp.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((L, IN), lambda j, idx: (0, 0)),
                pl.BlockSpec(
                    (1, 1, IN, TOh), lambda j, idx: (idx[0], j, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, 4 * ngf, TOh), lambda j, idx: (idx[0], j, 0, 0)
                ),
            ],
            out_specs=pl.BlockSpec((2, L, TOh), lambda j, idx: (0, 0, j)),
            scratch_shapes=[
                pltpu.VMEM((ngf * L, CH), jnp.int8),
                pltpu.VMEM((L, ngf), jnp.float32),
                pltpu.VMEM((L, 1), jnp.float32),
            ],
        )
        y = pl.pallas_call(
            functools.partial(
                _cpt_kernel_inkq, group_size=gs, n_groups=ngf,
                groups_per_chunk=ngc, rows_l=L,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((2, L, OUTh), jnp.float32),
            compiler_params=_compiler_params(),
            interpret=interpret,
            cost_estimate=cost,
        )(idx_arg, x, w_tiles, meta)
        y = y.transpose(1, 0, 2).reshape(L, 2 * OUTh)
        return y[:true_L]

    xq, sx = _quantize_rows(x)
    xs = jnp.sum(
        xq.reshape(L, ngf, gs).astype(jnp.float32), axis=-1
    )  # [L, ngf]
    onehot = (
        (jnp.arange(ngf)[:, None] % ngc) == jnp.arange(ngc)[None, :]
    ).astype(jnp.int8)
    xt = xq.reshape(L, ngf, gs).transpose(1, 0, 2)
    xbd = (onehot[:, None, :, None] * xt[:, :, None, :]).reshape(
        ngf * L, CH
    )

    S = _STREAMS if (_STREAMS > 1 and T % _STREAMS == 0) else 1
    cost = pl.CostEstimate(
        flops=2 * L * IN * OUTh * 2,
        bytes_accessed=IN * OUTh + L * IN + L * OUTh * 8,
        transcendentals=0,
    )
    idx_arg = jnp.asarray([layer_idx], jnp.int32)
    kern_kw = dict(
        group_size=gs, n_groups=ngf, groups_per_chunk=ngc, rows_l=L,
    )
    base_specs = [
        pl.BlockSpec((ngf * L, CH), lambda j, idx: (0, 0)),
        pl.BlockSpec((L, ngf), lambda j, idx: (0, 0)),
    ]

    if S > 1:
        Ts = T // S
        in_specs = list(base_specs)
        operands = []
        for i in range(S):
            off = i * Ts
            in_specs += [
                pl.BlockSpec(
                    (1, 1, IN, TOh),
                    lambda j, idx, off=off: (idx[0], j + off, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, 4 * ngf, TOh),
                    lambda j, idx, off=off: (idx[0], j + off, 0, 0),
                ),
            ]
            operands += [w_tiles, meta]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Ts,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((2, L, TOh), lambda j, idx: (0, 0, j))
                for _ in range(S)
            ],
        )
        parts = pl.pallas_call(
            functools.partial(_cpt_kernel_ms, streams=S, **kern_kw),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((2, L, Ts * TOh), jnp.float32)
                for _ in range(S)
            ],
            compiler_params=_compiler_params(
                _stream_vmem_bytes(
                    S,
                    IN * TOh,
                    side_bytes=(
                        4 * ngf * TOh * meta.dtype.itemsize
                        + 2 * L * TOh * 4
                    ),
                    fixed_bytes=xbd.size + xs.size * 4,
                )
            ),
            interpret=interpret,
            cost_estimate=cost,
        )(idx_arg, xbd, xs, *operands)
        y = jnp.concatenate(parts, axis=-1)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T,),
            in_specs=base_specs
            + [
                pl.BlockSpec(
                    (1, 1, IN, TOh), lambda j, idx: (idx[0], j, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, 4 * ngf, TOh), lambda j, idx: (idx[0], j, 0, 0)
                ),
            ],
            out_specs=pl.BlockSpec((2, L, TOh), lambda j, idx: (0, 0, j)),
        )
        y = pl.pallas_call(
            functools.partial(_cpt_kernel, **kern_kw),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((2, L, OUTh), jnp.float32),
            compiler_params=_compiler_params(),
            interpret=interpret,
            cost_estimate=cost,
        )(idx_arg, xbd, xs, w_tiles, meta)
    # [2, L, OUTh] -> [L, OUT] with low-half columns first.
    y = y.transpose(1, 0, 2).reshape(L, 2 * OUTh)
    return (y * sx)[:true_L]


@functools.partial(
    jax.jit, static_argnames=("group_size", "interpret")
)
def qmm_w4a8_cpt_split(x, w_parts, m_parts, layer_idx,
                       group_size: int = 128, interpret: bool = False):
    """Split-buffer multi-stream cpt matmul: stream i's blocks come from a
    PHYSICALLY SEPARATE HBM buffer.

    ``CCT_QMM_STREAMS`` binds one buffer to S operands with offset index
    maps; probe8 measured that same-buffer aliasing defeats the DMA
    pipeline (dma2 collapsed to 10 GB/s) and the production A/B came out
    slightly WORSE (91.38 vs 92.3 tok/s, r3). Here the tile axis is split
    at repack time into S disjoint arrays (w_parts[i] [NL, T/S, IN, TOh],
    m_parts[i] the matching sidecars), so each stream's double-buffered
    DMA chain walks its own buffer — the only multi-stream layout probe8
    found profitable.

    Tile ranges stay contiguous per stream, so concatenating the S output
    parts reproduces qmm_w4a8_cpt's column order exactly.
    """
    S = len(w_parts)
    true_L = x.shape[0]
    if true_L > 1:
        x, _ = _pad_rows(x)
    L, IN = x.shape
    NL, Ts, _, TOh = w_parts[0].shape
    OUTh = S * Ts * TOh
    gs = group_size
    ngf = IN // gs
    ngc = max(1, min(ngf, 128 // L, 4096 // gs))
    CH = ngc * gs

    xq, sx = _quantize_rows(x)
    xs = jnp.sum(
        xq.reshape(L, ngf, gs).astype(jnp.float32), axis=-1
    )
    onehot = (
        (jnp.arange(ngf)[:, None] % ngc) == jnp.arange(ngc)[None, :]
    ).astype(jnp.int8)
    xt = xq.reshape(L, ngf, gs).transpose(1, 0, 2)
    xbd = (onehot[:, None, :, None] * xt[:, :, None, :]).reshape(
        ngf * L, CH
    )

    cost = pl.CostEstimate(
        flops=2 * L * IN * OUTh * 2,
        bytes_accessed=IN * OUTh + L * IN + L * OUTh * 8,
        transcendentals=0,
    )
    in_specs = [
        pl.BlockSpec((ngf * L, CH), lambda j, idx: (0, 0)),
        pl.BlockSpec((L, ngf), lambda j, idx: (0, 0)),
    ]
    operands = []
    for i in range(S):
        in_specs += [
            pl.BlockSpec((1, 1, IN, TOh), lambda j, idx: (idx[0], j, 0, 0)),
            pl.BlockSpec(
                (1, 1, 4 * ngf, TOh), lambda j, idx: (idx[0], j, 0, 0)
            ),
        ]
        operands += [w_parts[i], m_parts[i]]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Ts,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((2, L, TOh), lambda j, idx: (0, 0, j))
            for _ in range(S)
        ],
    )
    parts = pl.pallas_call(
        functools.partial(
            _cpt_kernel_ms, streams=S, group_size=gs, n_groups=ngf,
            groups_per_chunk=ngc, rows_l=L,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((2, L, Ts * TOh), jnp.float32)
            for _ in range(S)
        ],
        compiler_params=_compiler_params(
            _stream_vmem_bytes(
                S,
                IN * TOh,
                side_bytes=(
                    4 * ngf * TOh * m_parts[0].dtype.itemsize
                    + 2 * L * TOh * 4
                ),
                fixed_bytes=xbd.size + xs.size * 4,
            )
        ),
        interpret=interpret,
        cost_estimate=cost,
    )(jnp.asarray([layer_idx], jnp.int32), xbd, xs, *operands)
    y = jnp.concatenate(parts, axis=-1)
    y = y.transpose(1, 0, 2).reshape(L, 2 * OUTh)
    return (y * sx)[:true_L]


def qmm_split_streams() -> int:
    """CCT_QMM_SPLIT=S (>1) routes stacked cpt leaves through the
    split-buffer multi-stream kernel (see qmm_w4a8_cpt_split)."""
    return int(os.environ.get("CCT_QMM_SPLIT", "1"))


def w4a8_cpt_split_supported(x_2d_shape, w_leaf) -> bool:
    """Decode gate for cpt_split leaves (w = tuple of [NL, Ts, IN, TOh])."""
    if not backend_ok():
        return False
    L, IN = x_2d_shape
    TOh = w_leaf.w[0].shape[-1]
    gs = w_leaf.group_size
    return (
        w_leaf.kind == "int4"
        and L <= 32
        and IN % 256 == 0
        and TOh % 128 == 0
        and IN % gs == 0
    )


def w4a8_cpt2_supported(x_2d_shape, w_leaf) -> bool:
    """Gate for the cpt kernel (leaf layout == 'cpt', w [NL, T, IN, TOh])."""
    if not backend_ok():
        return False
    L, IN = x_2d_shape
    TOh = w_leaf.w.shape[-1]
    gs = w_leaf.group_size
    return (
        w_leaf.kind == "int4"
        and L <= 32
        and IN % 256 == 0
        and TOh % 128 == 0
        and IN % gs == 0
    )


# --------------------------------------------------------------------------
# W4A8 prefill matmul (large-M tiles on the int8 MXU)
# --------------------------------------------------------------------------
#
# Prefill currently dequantizes each layer's int4 weights to transient bf16
# and runs bf16 dots (ops/linear.py fallback): ~0.4 s of VPU unpacking plus
# bf16-rate MXU time per 8k prefill. This kernel runs prefill-sized
# activations (per-row dynamic int8, the decode kernels' scheme) straight
# against the column-packed bytes: per group, two int8 dots (d1 = x.b,
# d2 = x.(b&0xF)) recover both nibble planes at the MXU's double int8
# rate, with the group scales applied in a f32 epilogue. At M >= 256 the
# systolic array is full, so no block-diagonal trick is needed — the grid
# tiles (M, OUT) and weight blocks are revisited across M steps without
# refetch (the index map ignores m).


def _w4a8_pf_kernel(idx_ref, xq_ref, xs_ref, w_ref, s_ref, z_ref, o_ref, *,
                    group_size, n_groups, tiled):
    gs, ngf = group_size, n_groups
    TOh = w_ref.shape[-1]
    TM = xq_ref.shape[0]
    acc_lo = jnp.zeros((TM, TOh), jnp.float32)
    acc_hi = jnp.zeros((TM, TOh), jnp.float32)
    for g in range(ngf):
        xg = xq_ref[:, pl.ds(g * gs, gs)]
        if tiled:
            b = w_ref[0, 0, pl.ds(g * gs, gs), :]
        else:
            b = w_ref[0, pl.ds(g * gs, gs), :]
        lo = b & 0xF
        d1 = jnp.dot(xg, b, preferred_element_type=jnp.int32)
        d2 = jnp.dot(xg, lo, preferred_element_type=jnp.int32)
        s_lo = s_ref[0, 0, g, :].astype(jnp.float32)  # [TOh]
        s_hi = s_ref[0, 1, g, :].astype(jnp.float32)
        acc_lo += d2.astype(jnp.float32) * s_lo[None, :]
        acc_hi += (d1 - d2).astype(jnp.float32) * (
            s_hi * 0.0625
        )[None, :]
    s_all = s_ref[0].astype(jnp.float32)
    z_all = z_ref[0].astype(jnp.float32)
    xs = xs_ref[...]  # [TM, ngf] group row-sums
    o_ref[0] = acc_lo + jnp.dot(xs, z_all[0] - 8.0 * s_all[0])
    o_ref[1] = acc_hi + jnp.dot(xs, z_all[1])


def _w4a8_pf_kernel_cpt(idx_ref, xq_ref, xs_ref, w_ref, m_ref, o_ref, *,
                        group_size, n_groups):
    """Prefill W4A8 over cpt tiles: same dual-dot recovery as
    _w4a8_pf_kernel, but the fused meta sidecar already carries the
    precomputed zero terms (rows: s_lo | s_hi | z_lo - 8 s_lo | z_hi),
    so the epilogue is two dots against stored constants."""
    gs, ngf = group_size, n_groups
    TOh = w_ref.shape[-1]
    TM = xq_ref.shape[0]
    acc_lo = jnp.zeros((TM, TOh), jnp.float32)
    acc_hi = jnp.zeros((TM, TOh), jnp.float32)
    m = m_ref[0, 0].astype(jnp.float32)  # [4*ngf, TOh]
    for g in range(ngf):
        xg = xq_ref[:, pl.ds(g * gs, gs)]
        b = w_ref[0, 0, pl.ds(g * gs, gs), :]
        lo = b & 0xF
        d1 = jnp.dot(xg, b, preferred_element_type=jnp.int32)
        d2 = jnp.dot(xg, lo, preferred_element_type=jnp.int32)
        acc_lo += d2.astype(jnp.float32) * m[g][None, :]
        acc_hi += (d1 - d2).astype(jnp.float32) * (
            m[ngf + g] * 0.0625
        )[None, :]
    xs = xs_ref[...]  # [TM, ngf] group row-sums
    o_ref[0] = acc_lo + jnp.dot(xs, m[2 * ngf : 3 * ngf])
    o_ref[1] = acc_hi + jnp.dot(xs, m[3 * ngf :])


@functools.partial(
    jax.jit, static_argnames=("group_size", "interpret", "tile_m")
)
def qmm_w4a8_prefill_cpt(x, w_stack, m_stack, layer_idx,
                         group_size: int = 128, interpret: bool = False,
                         tile_m: int = 256):
    """Prefill-sized x [L, IN] @ layer ``layer_idx`` of cpt int4 stacks
    (w [NL, T, IN, TOh] + fused meta [NL, T, 4*ngf, TOh]); returns
    [L, OUT] f32. Per-row dynamic int8 activations (W4A8)."""
    true_L = x.shape[0]
    x, _ = _pad_rows(x, tile_m)
    L, IN = x.shape
    NL, n_tiles, _, TOh = w_stack.shape
    OUTh = n_tiles * TOh
    gs = group_size
    ngf = IN // gs

    xq, sx = _quantize_rows(x)
    xs = jnp.sum(xq.reshape(L, ngf, gs).astype(jnp.float32), axis=-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        # j outer so consecutive m steps reuse the fetched weight block.
        grid=(n_tiles, L // tile_m),
        in_specs=[
            pl.BlockSpec((tile_m, IN), lambda j, m, idx: (m, 0)),
            pl.BlockSpec((tile_m, ngf), lambda j, m, idx: (m, 0)),
            pl.BlockSpec((1, 1, IN, TOh), lambda j, m, idx: (idx[0], j, 0, 0)),
            pl.BlockSpec(
                (1, 1, 4 * ngf, TOh), lambda j, m, idx: (idx[0], j, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (2, tile_m, TOh), lambda j, m, idx: (0, m, j)
        ),
    )
    y = pl.pallas_call(
        functools.partial(
            _w4a8_pf_kernel_cpt, group_size=gs, n_groups=ngf
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, L, OUTh), jnp.float32),
        compiler_params=_compiler_params(),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * L * IN * OUTh,
            bytes_accessed=IN * OUTh + L * IN + L * OUTh * 8,
            transcendentals=0,
        ),
    )(
        jnp.asarray([layer_idx], jnp.int32),
        xq, xs, w_stack, m_stack,
    )
    y = y.transpose(1, 0, 2).reshape(L, 2 * OUTh)
    return (y * sx)[:true_L]


def w4a8_prefill_cpt_supported(x_2d_shape, w_leaf) -> bool:
    """CCT_PREFILL_W4A8 gate for cpt-layout stacks (the decode-default
    layout since r3; same opt-in numerics caveat as the flat gate)."""
    if os.environ.get("CCT_PREFILL_W4A8", "0") != "1":
        return False
    if not backend_ok():
        return False
    L, IN = x_2d_shape
    gs = w_leaf.group_size
    return (
        w_leaf.kind == "int4"
        and w_leaf.layout == "cpt"
        and w_leaf.w.ndim in (3, 4)
        and L > 32
        and IN % 256 == 0
        and IN % gs == 0
        and w_leaf.w.shape[-1] % 128 == 0
    )


@functools.partial(
    jax.jit, static_argnames=("group_size", "interpret", "tile_m")
)
def qmm_w4a8_prefill(x, w_stack, s_stack, z_stack, layer_idx,
                     group_size: int = 128, interpret: bool = False,
                     tile_m: int = 256):
    """Prefill-sized x [L, IN] @ layer ``layer_idx`` of colpack int4 stacks
    (flat [NL, IN, OUTh] or tiled [NL, T, IN, TOh]); returns [L, OUT] f32.
    Per-row dynamic int8 activations (W4A8)."""
    true_L = x.shape[0]
    x, _ = _pad_rows(x, tile_m)
    L, IN = x.shape
    tiled = w_stack.ndim == 4
    if tiled:
        NL, n_tiles, _, TOh = w_stack.shape
        OUTh = n_tiles * TOh
    else:
        NL, _, OUTh = w_stack.shape
        TOh = _pick_tile_out_cp(IN, OUTh)
    gs = group_size
    ngf = IN // gs

    xq, sx = _quantize_rows(x)
    xs = jnp.sum(xq.reshape(L, ngf, gs).astype(jnp.float32), axis=-1)

    kernel = functools.partial(
        _w4a8_pf_kernel, group_size=gs, n_groups=ngf, tiled=tiled,
    )
    w_spec = (
        pl.BlockSpec((1, 1, IN, TOh), lambda j, m, idx: (idx[0], j, 0, 0))
        if tiled
        else pl.BlockSpec((1, IN, TOh), lambda j, m, idx: (idx[0], 0, j))
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        # j outer so consecutive m steps reuse the fetched weight block.
        grid=(OUTh // TOh, L // tile_m),
        in_specs=[
            pl.BlockSpec((tile_m, IN), lambda j, m, idx: (m, 0)),
            pl.BlockSpec((tile_m, ngf), lambda j, m, idx: (m, 0)),
            w_spec,
            pl.BlockSpec(
                (1, 2, ngf, TOh), lambda j, m, idx: (idx[0], 0, 0, j)
            ),
            pl.BlockSpec(
                (1, 2, ngf, TOh), lambda j, m, idx: (idx[0], 0, 0, j)
            ),
        ],
        out_specs=pl.BlockSpec(
            (2, tile_m, TOh), lambda j, m, idx: (0, m, j)
        ),
    )
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, L, OUTh), jnp.float32),
        compiler_params=_compiler_params(),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * L * IN * OUTh,
            bytes_accessed=IN * OUTh + L * IN + L * OUTh * 8,
            transcendentals=0,
        ),
    )(
        jnp.asarray([layer_idx], jnp.int32),
        xq, xs, w_stack, s_stack, z_stack,
    )
    y = y.transpose(1, 0, 2).reshape(L, 2 * OUTh)
    return (y * sx)[:true_L]


def w4a8_prefill_supported(x_2d_shape, w_leaf) -> bool:
    """Gate for the prefill W4A8 kernel: opt-in via CCT_PREFILL_W4A8=1
    (activation int8 quantization is a numerics change vs the bf16
    dequant path; validate task metrics before defaulting)."""
    if os.environ.get("CCT_PREFILL_W4A8", "0") != "1":
        return False
    if not backend_ok():
        return False
    L, IN = x_2d_shape
    gs = w_leaf.group_size
    return (
        w_leaf.kind == "int4"
        and w_leaf.layout == "colpack"
        and L > 32
        and IN % 256 == 0
        and IN % gs == 0
        and w_leaf.w.shape[-1] % 128 == 0
    )


# --------------------------------------------------------------------------
# W8A8 tiled matvec (the 128k-vocab head)
# --------------------------------------------------------------------------
#
# The head is a single [4096, 128256] int8 weight — 0.5 GB read per decoded
# token, the second-largest byte stream after the layer stack. The XLA
# barriered int8 dot runs it at ~276 GB/s; this kernel streams the same
# bytes through the Pallas tile pipeline used by the W4A8 layer kernels
# (contiguous [T, IN, TO] blocks, one int8 MXU dot + f32 scale epilogue
# per block). The wrapper pads OUT to a tile multiple; callers slice the
# pad columns off before any argmax.


def _w8a8_kernel(x_ref, w_ref, s_ref, o_ref):
    d = jnp.dot(x_ref[...], w_ref[0], preferred_element_type=jnp.int32)
    o_ref[...] = d.astype(jnp.float32) * s_ref[0, 0].astype(jnp.float32)


def _w8a8_kernel_ms(x_ref, *refs, streams):
    S = streams
    for i in range(S):
        w_ref, s_ref = refs[2 * i], refs[2 * i + 1]
        o_ref = refs[2 * S + i]
        d = jnp.dot(x_ref[...], w_ref[0], preferred_element_type=jnp.int32)
        o_ref[...] = d.astype(jnp.float32) * s_ref[0, 0].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def qmm_w8a8_tiled(x, w_tiled, s_tiled, interpret: bool = False):
    """x [L, IN] @ tiled int8 weight [T, IN, TO] (scales [T, TO] f32).

    Returns [L, T*TO] f32 — the caller slices off any OUT padding. Per-row
    dynamic activation quantization as in the W4A8 kernels.
    """
    x, true_L = _pad_rows(x)
    L, IN = x.shape
    T, _, TO = w_tiled.shape
    # Mosaic requires a block's last two dims to divide (8, 128) or equal
    # the array dims; a (1, TO) block over [T, TO] scales violates the
    # sublane rule (interpret mode does not check this), so carry the
    # scales as [T, 1, TO] and take full (1, TO) trailing blocks.
    s_tiled = s_tiled.reshape(T, 1, TO)
    xq, sx = _quantize_rows(x)
    cost = pl.CostEstimate(
        flops=2 * L * IN * T * TO,
        bytes_accessed=T * IN * TO + L * IN + L * T * TO * 4,
        transcendentals=0,
    )
    S = _STREAMS if (_STREAMS > 1 and T % _STREAMS == 0) else 1
    if S > 1:
        Ts = T // S
        in_specs = [pl.BlockSpec((L, IN), lambda j: (0, 0))]
        operands = []
        for i in range(S):
            off = i * Ts
            in_specs += [
                pl.BlockSpec(
                    (1, IN, TO), lambda j, off=off: (j + off, 0, 0)
                ),
                pl.BlockSpec((1, 1, TO), lambda j, off=off: (j + off, 0, 0)),
            ]
            operands += [w_tiled, s_tiled]
        parts = pl.pallas_call(
            functools.partial(_w8a8_kernel_ms, streams=S),
            grid_spec=pl.GridSpec(
                grid=(Ts,),
                in_specs=in_specs,
                out_specs=[
                    pl.BlockSpec((L, TO), lambda j: (0, j))
                    for _ in range(S)
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((L, Ts * TO), jnp.float32)
                for _ in range(S)
            ],
            compiler_params=_compiler_params(
                _stream_vmem_bytes(
                    S,
                    IN * TO,
                    # per-stream sides: [1, 1, TO] f32 scales + [L, TO]
                    # f32 output block.
                    side_bytes=TO * 4 + L * TO * 4,
                    fixed_bytes=L * IN,
                )
            ),
            interpret=interpret,
            cost_estimate=cost,
        )(xq, *operands)
        y = jnp.concatenate(parts, axis=-1)
        return (y * sx)[:true_L]

    grid_spec = pl.GridSpec(
        grid=(T,),
        in_specs=[
            pl.BlockSpec((L, IN), lambda j: (0, 0)),
            pl.BlockSpec((1, IN, TO), lambda j: (j, 0, 0)),
            pl.BlockSpec((1, 1, TO), lambda j: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((L, TO), lambda j: (0, j)),
    )
    y = pl.pallas_call(
        _w8a8_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, T * TO), jnp.float32),
        compiler_params=_compiler_params(),
        interpret=interpret,
        cost_estimate=cost,
    )(xq, w_tiled, s_tiled)
    return (y * sx)[:true_L]


def cpt_enabled() -> bool:
    """cpt decode layout for the layer stacks (contiguous weight tiles +
    fused metadata sidecar; see qmm_w4a8_cpt). Default ON: measured
    92.0/92.4 tok/s vs 89.8 flat-colpack on hardware (r3 batch,
    results/tpu_batch_r3/), token parity via tests/test_gates_e2e.py.
    CCT_QMM_CPT=0 restores the flat v3 layout."""
    return os.environ.get("CCT_QMM_CPT", "1") == "1"


def tiled_head_enabled() -> bool:
    """Tiled vocab-head repack (tiled8 int8 / colpack_tiled int4).

    Default ON — hardware-validated in the round-2 TPU batch (int4 head:
    83.7 -> 90.0 tok/s on the north-star config). CCT_TILED_HEAD=0 opts
    out, restoring the rowmajor XLA int8 dot / flat colpack kernel."""
    return os.environ.get("CCT_TILED_HEAD", "1") != "0"


def w8a8_tiled_supported(x_2d_shape, w_leaf) -> bool:
    if not backend_ok():
        return False
    L, IN = x_2d_shape
    return w_leaf.kind == "int8" and L <= 32 and IN % 256 == 0


def w4a8_cpt_supported(x_2d_shape, w_leaf) -> bool:
    """Gate for the TILED column-packed head kernel (layout ==
    'colpack_tiled', w [T, in, TOh])."""
    if not backend_ok():
        return False
    L, IN = x_2d_shape
    TOh = w_leaf.w.shape[-1]
    gs = w_leaf.group_size
    return (
        w_leaf.kind == "int4"
        and L <= 32
        and IN % 256 == 0
        and TOh % 128 == 0
        and IN % gs == 0
    )


def w4a8_cp_supported(x_2d_shape, w_leaf) -> bool:
    """Gate for the column-packed kernel (leaf layout == 'colpack')."""
    if not backend_ok():
        return False
    L, IN = x_2d_shape
    OUTh = w_leaf.w.shape[-1]
    gs = w_leaf.group_size
    return (
        w_leaf.kind == "int4"
        and L <= 32
        and IN % 256 == 0
        and OUTh % 128 == 0
        and OUTh <= 16384
        and IN % gs == 0
    )


def w4a8_supported(x_2d_shape, w_leaf) -> bool:
    """Gate for the dual-dot kernel: decode-sized activations, MXU-aligned
    dims, 8-aligned group blocks, and a VMEM-friendly output width (the
    128k-vocab head takes the native-int8-dot path instead)."""
    if not backend_ok():
        return False
    L, IN = x_2d_shape
    OUT = w_leaf.w.shape[-1]
    gs = w_leaf.group_size
    return (
        w_leaf.kind == "int4"
        and L <= 32
        and IN % 256 == 0
        and OUT % 128 == 0
        and OUT <= 32768
        and (IN // 2) % gs == 0
    )


# Back-compat alias consumed by older call sites/tests.
def qmm_supported(x_2d_shape, w_leaf) -> bool:
    return w4a8_supported(x_2d_shape, w_leaf)
