#!/usr/bin/env python
"""TPU perf probe for the decode hot path (round-2 kernel tuning).

Stages (select with --stage, comma-separated):
  basics : Mosaic feature probes (int8 bitwise ops, int4 dtype, int16 hops)
  micro  : time current qmm_w4a8 / w8a8 on decode shapes + raw-stream and
           unpack-only kernels to locate the bottleneck
  v2     : dual-dot W4A8 kernel (signed-hi packing, no hi-nibble unpack)
  attn   : decode attention at north-star sizes

Run on the TPU (one process only). Prints timings as JSON lines.
"""

import argparse
import functools
import json
import time

import numpy as np

from cold_compress_tpu.utils.jax_setup import setup_jax

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def timeit(fn, args_sets, warmup=2, iters=12):
    for i in range(max(warmup, 1)):
        jax.block_until_ready(fn(*args_sets[i % len(args_sets)]))
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        outs.append(fn(*args_sets[i % len(args_sets)]))
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def report(name, secs, bytes_streamed=None, **extra):
    rec = {"probe": name, "ms": round(secs * 1e3, 3)}
    if bytes_streamed:
        rec["GBps"] = round(bytes_streamed / secs / 1e9, 1)
    rec.update(extra)
    print(json.dumps(rec), flush=True)


# ---------------------------------------------------------------- basics

def stage_basics():
    # 1. int8 bitwise AND inside pallas
    def k_and(x_ref, o_ref):
        o_ref[...] = x_ref[...] & 0xF

    x = jnp.arange(-128, 128, dtype=jnp.int8).reshape(2, 128)
    x = jnp.tile(x, (16, 1))
    try:
        out = pl.pallas_call(
            k_and, out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int8)
        )(x)
        ok = bool(
            np.array_equal(np.asarray(out), np.asarray(x) & 0xF)
        )
        report("int8_and_pallas", 0, supported=ok)
    except Exception as e:  # noqa: BLE001
        report("int8_and_pallas", 0, supported=False, err=str(e)[:200])

    # 2. int8 arithmetic shift right inside pallas
    def k_shr(x_ref, o_ref):
        o_ref[...] = x_ref[...] >> 4

    try:
        out = pl.pallas_call(
            k_shr, out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int8)
        )(x)
        ok = bool(np.array_equal(np.asarray(out), np.asarray(x) >> 4))
        report("int8_shr_pallas", 0, supported=ok)
    except Exception as e:  # noqa: BLE001
        report("int8_shr_pallas", 0, supported=False, err=str(e)[:200])

    # 3. int16 hop
    def k_i16(x_ref, o_ref):
        v = x_ref[...].astype(jnp.int16)
        o_ref[...] = ((v >> 4) & 0xF).astype(jnp.int8)

    try:
        out = pl.pallas_call(
            k_i16, out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int8)
        )(x)
        ref = ((np.asarray(x).astype(np.int16) >> 4) & 0xF).astype(np.int8)
        report("int16_hop_pallas", 0,
               supported=bool(np.array_equal(np.asarray(out), ref)))
    except Exception as e:  # noqa: BLE001
        report("int16_hop_pallas", 0, supported=False, err=str(e)[:200])

    # 4. native int4 dtype dot in XLA
    try:
        w4 = jnp.ones((256, 256), jnp.int4)
        xq = jnp.ones((8, 256), jnp.int8)
        y = jax.jit(
            lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        )(xq, w4)
        jax.block_until_ready(y)
        report("int4_dtype_dot", 0, supported=True,
               val=int(np.asarray(y)[0, 0]))
    except Exception as e:  # noqa: BLE001
        report("int4_dtype_dot", 0, supported=False, err=str(e)[:200])

    # 5. int8 dot straight from a passed int8 ref inside pallas (sanity)
    def k_dot(x_ref, w_ref, o_ref):
        o_ref[...] = jnp.dot(
            x_ref[...], w_ref[...], preferred_element_type=jnp.int32
        )

    try:
        xs = jnp.ones((8, 256), jnp.int8)
        ws = jnp.full((256, 256), 3, jnp.int8)
        y = pl.pallas_call(
            k_dot, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int32)
        )(xs, ws)
        report("int8_dot_pallas", 0, supported=True,
               val=int(np.asarray(y)[0, 0]))
    except Exception as e:  # noqa: BLE001
        report("int8_dot_pallas", 0, supported=False, err=str(e)[:200])


# ---------------------------------------------------------------- micro

DECODE_SHAPES = [
    (4096, 14336),
    (14336, 4096),
    (4096, 4096),
]


def _mk_int4(IN, OUT, seed):
    rng = np.random.RandomState(seed)
    w = jnp.asarray(rng.randint(0, 256, size=(IN // 2, OUT), dtype=np.uint8))
    gs = 128
    ng = IN // gs
    s = jnp.asarray(rng.rand(ng, OUT).astype(np.float32) * 0.01)
    z = jnp.asarray(rng.rand(ng, OUT).astype(np.float32) * 0.001)
    return w, s, z


def stage_micro():
    from cold_compress_tpu.ops.pallas_qmm import qmm_w4a8
    from cold_compress_tpu.ops.linear import QuantizedWeight, w8a8_matmul

    rng = np.random.RandomState(0)
    for IN, OUT in DECODE_SHAPES:
        w, s, z = _mk_int4(IN, OUT, 1)
        xs = [
            jnp.asarray(rng.randn(8, IN).astype(np.float32) / 32)
            for _ in range(8)
        ]
        f = jax.jit(lambda x, w=w, s=s, z=z: qmm_w4a8(x, w, s, z))
        t = timeit(f, [(x,) for x in xs])
        report(f"qmm_w4a8_{IN}x{OUT}", t, bytes_streamed=IN * OUT // 2)

    # w8a8 at lm_head size
    IN, OUT = 4096, 128256
    w8 = jnp.asarray(rng.randint(-127, 127, size=(IN, OUT), dtype=np.int8))
    leaf = QuantizedWeight(
        w=w8, scales=jnp.ones((OUT,), jnp.float32), kind="int8"
    )
    xs = [
        jnp.asarray(rng.randn(8, IN).astype(np.float32) / 32)
        for _ in range(4)
    ]
    f = jax.jit(lambda x: w8a8_matmul(x, leaf))
    t = timeit(f, [(x,) for x in xs], iters=8)
    report("w8a8_lm_head", t, bytes_streamed=IN * OUT)

    # raw stream kernel: read u8 tiles, emit per-tile row-sum
    IN, OUT = 4096, 14336
    INh = IN // 2
    TO = 256

    def k_stream(w_ref, o_ref):
        o_ref[...] = jnp.sum(
            w_ref[...].astype(jnp.int32), axis=0, keepdims=True
        )

    w, _, _ = _mk_int4(IN, OUT, 2)
    f = jax.jit(
        lambda w: pl.pallas_call(
            k_stream,
            grid=(OUT // TO,),
            in_specs=[
                pl.BlockSpec((INh, TO), lambda j: (0, j),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((1, TO), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, OUT), jnp.int32),
        )(w)
    )
    ws = [w, jnp.asarray(np.asarray(w) ^ 1)]
    t = timeit(f, [(x,) for x in ws])
    report("stream_only_u8", t, bytes_streamed=INh * OUT)

    # unpack-only kernel: current 6-op unpack, reduce to keep it honest
    def k_unpack(w_ref, o_ref):
        p = w_ref[...].astype(jnp.int32)
        lo = (p & 0xF).astype(jnp.int8)
        hi = ((p >> 4) & 0xF).astype(jnp.int8)
        o_ref[...] = jnp.sum(
            lo.astype(jnp.int32) + hi.astype(jnp.int32), axis=0,
            keepdims=True,
        )

    f = jax.jit(
        lambda w: pl.pallas_call(
            k_unpack,
            grid=(OUT // TO,),
            in_specs=[
                pl.BlockSpec((INh, TO), lambda j: (0, j),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((1, TO), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, OUT), jnp.int32),
        )(w)
    )
    t = timeit(f, [(x,) for x in ws])
    report("unpack_i32_u8", t, bytes_streamed=INh * OUT)

    # empty-ish pallas launch overhead
    def k_tiny(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1

    xt = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(
        lambda x: pl.pallas_call(
            k_tiny, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
        )(x)
    )
    t = timeit(f, [(xt,), (xt + 1,)], iters=50)
    report("pallas_launch_overhead", t)


# ---- v2b: dual-dot W4A8 --------------------------------------------------
# Byte (k, o) packs weight rows k (lo nibble, unsigned q) and INh+k (hi
# nibble stored SIGNED as q-8), so b = ((q_hi-8)<<4) | q_lo as int8. The hi
# plane never needs unpacking: feed b straight to the int8 MXU against the
# hi activation columns and cancel the lo cross-term:
#      dot(x_hi, b) = 16 * dot(x_hi, hi_signed) + dot(x_hi, lo_plane)
# Dots per group: dot(x_lo, l), dot(x_hi, b), dot(x_hi, l) => 3 dots but
# only ONE unpack (l = b & 0xF). VPU unpack work drops ~6x (1 op/byte if
# Mosaic has int8 `&`, else 3 via an int32 hop); MXU work x1.5 (it's idle).


def _w4a8_v2b_kernel(xlo_ref, xhi_ref, xsl_ref, xsh_ref, w_ref,
                     cl_ref, ch_ref, czl_ref, czh_ref, o_ref,
                     *, group_size, use_i8_and):
    INh, TO = w_ref.shape
    ngh = INh // group_size
    L = xlo_ref.shape[0]
    acc = jnp.zeros((L, TO), jnp.float32)
    for g in range(ngh):
        sl = slice(g * group_size, (g + 1) * group_size)
        b = w_ref[sl, :]
        if use_i8_and:
            l = b & 0xF
        else:
            l = (b.astype(jnp.int32) & 0xF).astype(jnp.int8)
        xlo = xlo_ref[:, sl]
        xhi = xhi_ref[:, sl]
        dot_ll = jnp.dot(xlo, l, preferred_element_type=jnp.int32).astype(
            jnp.float32
        )
        dot_hb = jnp.dot(xhi, b, preferred_element_type=jnp.int32).astype(
            jnp.float32
        )
        dot_hl = jnp.dot(xhi, l, preferred_element_type=jnp.int32).astype(
            jnp.float32
        )
        dot_hh = (dot_hb - dot_hl) * 0.0625  # exact in f32
        acc += (
            dot_ll * cl_ref[g][None, :]
            + dot_hh * ch_ref[g][None, :]
            + xsl_ref[g][:, None] * czl_ref[g][None, :]
            + xsh_ref[g][:, None] * czh_ref[g][None, :]
        )
    o_ref[...] = acc


@functools.partial(
    jax.jit, static_argnames=("group_size", "use_i8_and", "tile_out")
)
def qmm_w4a8_v2b(x, w_signed, scales, zeros, group_size=128,
                 use_i8_and=True, tile_out=256):
    """scales/zeros: [IN/gs, OUT] with groups 0..ngh-1 = lo rows (0..INh),
    groups ngh.. = hi rows (INh..IN). Packing: byte k = lo row k nibble low,
    hi row INh+k nibble high SIGNED (value q_hi - 8)."""
    L, IN = x.shape
    INh = IN // 2
    OUT = w_signed.shape[1]
    ngh = INh // group_size

    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(absmax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    xq = jax.lax.optimization_barrier(xq)
    xlo = xq[:, :INh]
    xhi = xq[:, INh:]
    rs = lambda a: jnp.sum(  # noqa: E731
        a.reshape(L, ngh, group_size).astype(jnp.float32), axis=-1
    ).T
    xsl, xsh = rs(xlo), rs(xhi)

    s_lo, s_hi = scales[:ngh], scales[ngh:]
    z_lo, z_hi = zeros[:ngh], zeros[ngh:]
    cl = s_lo
    ch = s_hi
    czl = z_lo - 8.0 * s_lo
    czh = z_hi  # hi already stored as q-8

    TO = tile_out
    kernel = functools.partial(
        _w4a8_v2b_kernel, group_size=group_size, use_i8_and=use_i8_and
    )
    y = pl.pallas_call(
        kernel,
        grid=(OUT // TO,),
        in_specs=[
            pl.BlockSpec((L, INh), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, INh), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ngh, L), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ngh, L), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((INh, TO), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ngh, TO), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ngh, TO), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ngh, TO), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ngh, TO), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, TO), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, OUT), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * L * IN * OUT,
            bytes_accessed=IN * OUT // 2 + L * IN + L * OUT * 4,
            transcendentals=0,
        ),
    )(xq[:, :INh], xhi, xsl, xsh, w_signed, cl, ch, czl, czh)
    return y * sx


def _repack_signed(w_u8):
    """uint8 (hi<<4|lo, both unsigned) -> int8 with signed hi nibble."""
    return jnp.asarray(
        (np.asarray(w_u8) ^ 0x80).view(np.int8)
    )


def stage_v2b(use_i8_and=True):
    from cold_compress_tpu.ops.pallas_qmm import qmm_w4a8

    rng = np.random.RandomState(0)
    for IN, OUT in DECODE_SHAPES:
        w, s, z = _mk_int4(IN, OUT, 1)
        ws = _repack_signed(w)
        xs = [
            jnp.asarray(rng.randn(8, IN).astype(np.float32) / 32)
            for _ in range(8)
        ]
        f2 = jax.jit(
            lambda x, w=ws, s=s, z=z: qmm_w4a8_v2b(
                x, w, s, z, use_i8_and=use_i8_and
            )
        )
        # numerics vs existing kernel
        y_ref = np.asarray(qmm_w4a8(xs[0], w, s, z))
        y_new = np.asarray(f2(xs[0]))
        err = float(
            np.max(np.abs(y_ref - y_new))
            / max(1e-9, float(np.max(np.abs(y_ref))))
        )
        t = timeit(f2, [(x,) for x in xs])
        report(
            f"qmm_w4a8_v2b_{IN}x{OUT}", t, bytes_streamed=IN * OUT // 2,
            rel_err=round(err, 6), i8and=use_i8_and,
        )


# ---------------------------------------------------------------- attn

def stage_attn():
    from cold_compress_tpu.ops.attention import gqa_attention

    rng = np.random.RandomState(0)
    B, H, KVH, D, S = 1, 32, 8, 128, 2048
    qs = [
        jnp.asarray(rng.randn(B, H, 1, D).astype(np.float32) / 16).astype(
            jnp.bfloat16
        )
        for _ in range(6)
    ]
    k = jnp.asarray(rng.randn(B, KVH, S, D).astype(np.float32) / 16).astype(
        jnp.bfloat16
    )
    v = jnp.asarray(rng.randn(B, KVH, S, D).astype(np.float32) / 16).astype(
        jnp.bfloat16
    )
    mask = jnp.ones((B, KVH, 1, 1, S), bool)
    f = jax.jit(
        lambda q: gqa_attention(q, k, v, mask=mask, return_attn=True)[0]
    )
    t = timeit(f, [(q,) for q in qs], iters=20)
    report("decode_attn_S2048_retattn", t,
           bytes_streamed=2 * B * KVH * S * D * 2)
    f = jax.jit(
        lambda q: gqa_attention(q, k, v, mask=mask, return_attn=False)[0]
    )
    t = timeit(f, [(q,) for q in qs], iters=20)
    report("decode_attn_S2048", t, bytes_streamed=2 * B * KVH * S * D * 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="basics,micro")
    args = ap.parse_args()
    report("backend", 0, backend=jax.default_backend())
    for st in args.stage.split(","):
        t0 = time.time()
        if st == "basics":
            stage_basics()
        elif st == "micro":
            stage_micro()
        elif st == "v2b" or st == "v2":
            stage_v2b(use_i8_and=True)
        elif st == "v2b_i32":
            stage_v2b(use_i8_and=False)
        elif st == "attn":
            stage_attn()
        print(json.dumps({"stage": st, "wall_s": round(time.time() - t0, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
