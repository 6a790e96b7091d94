"""Pallas TPU kernel: fused dequantize + matmul for weight-only int8/int4.

The decode hot path is weight-bandwidth-bound: at batch 1 every token reads
all weights once. The XLA fallback (ops/linear.py) materializes the
dequantized bf16 weights in HBM each step — 4x (int4) the optimal traffic.
This kernel streams the *packed* weights through VMEM in (TI x TO) tiles,
dequantizes on-chip, and accumulates partial matmuls in an f32 VMEM scratch,
so HBM traffic is the packed bytes only.

TPU-native replacement for the reference's ``aten._weight_int4pack_mm`` CUDA
kernel (reference: quantize.py:414-425, SURVEY.md §2.9).

Layouts (matching quantization/weight_quant.py):
  int8: w  int8 [in, out], scales f32 [out];  y = (x @ w) * scales
  int4: w  uint8 [in//2, out] — two nibbles per byte along the *in* axis
        (row 2r holds low nibbles, row 2r+1 high); scales/zeros [in/gs, out];
        dequant = (q - 8) * scale + zero
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_OUT = 256
TILE_IN = 512


def _int8_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Mosaic lacks direct int8->bf16 casts; hop through int32/f32.
    w = w_ref[...].astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
    acc_ref[...] += jnp.dot(
        x_ref[...], w, preferred_element_type=jnp.float32
    )

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = (acc_ref[...] * s_ref[...]).astype(o_ref.dtype)


def _int4_kernel(x_lo_ref, x_hi_ref, w_ref, s_ref, z_ref, o_ref, acc_ref,
                 *, group_size):
    # Half-split packing: the packed byte block [TIh, TO] carries weight rows
    # [i*TIh, (i+1)*TIh) in its low nibbles and rows [IN/2 + i*TIh, ...) in
    # its high nibbles, so unpacking is two masked casts — no sublane
    # interleave/relayout. Each grid step therefore contracts TWO row tiles:
    #   acc += x_lo @ deq(lo) + x_hi @ deq(hi)
    # s/z refs: [IN/gs, TO] f32 full; sliced at 8-aligned group offsets.
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    TIh, TO = w_ref.shape
    ng = TIh // group_size  # groups per half-tile (multiple of 8 by _tiles)
    half_groups = s_ref.shape[0] // 2
    packed = w_ref[...].astype(jnp.int32)
    lo = (packed & 0x0F).astype(jnp.float32).astype(jnp.bfloat16)
    hi = ((packed >> 4) & 0x0F).astype(jnp.float32).astype(jnp.bfloat16)

    def deq(q, g0):
        s = s_ref[pl.ds(g0, ng), :].astype(jnp.bfloat16)
        z = z_ref[pl.ds(g0, ng), :].astype(jnp.bfloat16)
        return (q.reshape(ng, group_size, TO) - 8.0) * s[:, None, :] + z[
            :, None, :
        ]

    w_lo = deq(lo, i * ng).reshape(TIh, TO)
    w_hi = deq(hi, half_groups + i * ng).reshape(TIh, TO)
    acc_ref[...] += jnp.dot(
        x_lo_ref[...], w_lo, preferred_element_type=jnp.float32
    ) + jnp.dot(x_hi_ref[...], w_hi, preferred_element_type=jnp.float32)

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _pad_rows(x, mult: int = 8):
    L = x.shape[0]
    pad = (-L) % mult
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, L


def _tiles(IN: int, OUT: int, group_size: int):
    # For int4, each grid step processes a HALF-tile of TIh rows from each
    # half; scale-row slice starts must be provably 8-aligned, so TIh spans
    # 8 groups (or a whole half, where the only start is 0).
    if group_size == 1:  # int8: no group constraint
        ti = TILE_IN if IN % TILE_IN == 0 else IN
    else:
        ti = 8 * group_size
        if (IN // 2) % ti != 0:
            ti = IN // 2
    to = TILE_OUT if OUT % TILE_OUT == 0 else (
        128 if OUT % 128 == 0 else OUT
    )
    if ti >= 8192 and to > 128 and OUT % 128 == 0:
        to = 128  # bound VMEM for full-IN fallback tiles
    return ti, to


@functools.partial(jax.jit, static_argnames=("group_size",))
def qmm_int4(x, w_packed, scales, zeros, group_size: int = 128):
    """x [L, IN] @ int4-packed weights -> [L, OUT] (f32 accumulation)."""
    x, true_L = _pad_rows(x)
    L, IN = x.shape
    OUT = w_packed.shape[1]
    TIh, TO = _tiles(IN, OUT, group_size)
    grid = (OUT // TO, (IN // 2) // TIh)
    kernel = functools.partial(_int4_kernel, group_size=group_size)
    xb = x.astype(jnp.bfloat16)
    x_lo = xb[:, : IN // 2]
    x_hi = xb[:, IN // 2 :]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, TIh), lambda j, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, TIh), lambda j, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TIh, TO), lambda j, i: (i, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (IN // group_size, TO), lambda j, i: (0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (IN // group_size, TO), lambda j, i: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (L, TO), lambda j, i: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, OUT), x.dtype),
        scratch_shapes=[pltpu.VMEM((L, TO), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * L * IN * OUT,
            bytes_accessed=IN * OUT // 2 + L * IN * 2 + L * OUT * 2,
            transcendentals=0,
        ),
    )(x_lo, x_hi, w_packed, scales, zeros)[:true_L]


@jax.jit
def qmm_int8(x, w, scales):
    """x [L, IN] @ int8 weights * scales -> [L, OUT]."""
    x, true_L = _pad_rows(x)
    L, IN = x.shape
    OUT = w.shape[1]
    TI, TO = _tiles(IN, OUT, 1)
    grid = (OUT // TO, IN // TI)
    return pl.pallas_call(
        _int8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, TI), lambda j, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, TO), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TO), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (L, TO), lambda j, i: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, OUT), x.dtype),
        scratch_shapes=[pltpu.VMEM((L, TO), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * L * IN * OUT,
            bytes_accessed=IN * OUT + L * IN * 2 + L * OUT * 2,
            transcendentals=0,
        ),
    )(x.astype(jnp.bfloat16), w, scales.reshape(1, OUT).astype(jnp.float32))[
        :true_L
    ]


def _w4a8_kernel(xq_ref, xs_ref, w_ref, s_ref, z_ref, o_ref, *, group_size):
    """int4 weights on the int8 MXU (W4A8).

    One grid step per output tile: loop over quantization groups, unpack one
    group's packed bytes (small int32 intermediates), and issue a native
    int8 x int8 -> int32 MXU dot per (group, nibble-half). The affine
    epilogue uses
        y_g = s_g * (xq . q) + (z_g - 8 s_g) * rowsum(xq)
    so scales/zeros never touch full weight tiles, and all slicing indices
    are static. Grid-step count stays tiny (per-step overhead on this
    backend is ~5us, so many small steps dominate runtime).
    """
    INh, TO = w_ref.shape
    ngh = INh // group_size
    L = xq_ref.shape[0]
    acc = jnp.zeros((L, TO), jnp.float32)
    for g in range(ngh):
        pk = w_ref[g * group_size : (g + 1) * group_size, :].astype(jnp.int32)
        for qv, gidx, col0 in (
            ((pk & 0x0F), g, g * group_size),
            (((pk >> 4) & 0x0F), ngh + g, INh + g * group_size),
        ):
            q = qv.astype(jnp.int8)
            xg = xq_ref[:, col0 : col0 + group_size]
            dot = jnp.dot(xg, q, preferred_element_type=jnp.int32).astype(
                jnp.float32
            )
            sg = s_ref[gidx]
            zg = z_ref[gidx]
            rs = xs_ref[gidx]
            acc += dot * sg[None, :] + rs[:, None] * (zg - 8.0 * sg)[None, :]
    o_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("group_size",))
def qmm_w4a8(x, w_packed, scales, zeros, group_size: int = 128):
    """x [L, IN] @ int4-packed weights via the int8 MXU.

    Activation rows are dynamically quantized to int8 (per-row scale,
    absorbed in the epilogue outside the kernel).
    """
    x, true_L = _pad_rows(x)
    L, IN = x.shape
    INh = IN // 2
    OUT = w_packed.shape[1]
    n_groups_total = IN // group_size
    # Output tile bounded by VMEM: packed block INh x TO u8 (double-buffered).
    TO = 256 if (INh * 256 <= 2 << 20 and OUT % 256 == 0) else 128

    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(absmax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    xq = jax.lax.optimization_barrier(xq)
    xs = jnp.sum(
        xq.reshape(L, n_groups_total, group_size).astype(jnp.float32), axis=-1
    ).T  # [n_groups_total, L]

    kernel = functools.partial(_w4a8_kernel, group_size=group_size)
    y = pl.pallas_call(
        kernel,
        grid=(OUT // TO,),
        in_specs=[
            pl.BlockSpec((L, IN), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (n_groups_total, L), lambda j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((INh, TO), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (n_groups_total, TO), lambda j: (0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n_groups_total, TO), lambda j: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (L, TO), lambda j: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, OUT), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * L * IN * OUT,
            bytes_accessed=IN * OUT // 2 + L * IN + L * OUT * 4,
            transcendentals=0,
        ),
    )(xq, xs, w_packed, scales.astype(jnp.float32), zeros.astype(jnp.float32))
    return (y * sx)[:true_L]


def qmm_supported(x_2d_shape, w_leaf) -> bool:
    """Shape/backend gate for the VPU-dequant fused kernel (decode sizes)."""
    if jax.default_backend() != "tpu":
        return False
    L, IN = x_2d_shape
    if L > 32:  # prefill-sized: dequant-once + MXU wins
        return False
    OUT = w_leaf.w.shape[1]
    if w_leaf.kind == "int4" and IN % w_leaf.group_size != 0:
        return False
    return IN % 128 == 0 and OUT % 128 == 0


def w4a8_supported(x_2d_shape, w_leaf) -> bool:
    """Gate for the int8-MXU int4 kernel: group blocks must be 8-aligned and
    the tile set must fit the compiler's VMEM budget (very wide outputs such
    as the 128k-vocab head take the XLA dequant path instead)."""
    if jax.default_backend() != "tpu":
        return False
    L, IN = x_2d_shape
    OUT = w_leaf.w.shape[1]
    gs = w_leaf.group_size
    return (
        w_leaf.kind == "int4"
        and L <= 32
        and IN % 256 == 0
        and OUT % 128 == 0
        and OUT <= 32768
        and (IN // 2) % (8 * gs) == 0
    )
