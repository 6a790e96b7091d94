"""Probe 13: why does big-cache chunked decode attention stream at
~116-155 GB/s when the one-shot kernel and the weight stream reach
~470-632 GB/s on the same part? (PERF.md round-4: the 32k full-cache legs
are the last rows where the reference is ahead.)

Hypotheses, one variant each (all at the 32k full-cache shape
B=1, KVH=8, C=32768, D=128, bf16 cache = 134 MB K+V per layer):

  cur        quantized_decode_attention as-is (grid (B, NC) chunked,
             e/aux outputs allocated, meta stacked outside) — calibrates
             the probe against the end-to-end 22.95 tok/s leg.
  dma_strided  minimal grid kernel, K/V chunk blocks cut from the cache's
             native [B, KVH, C, D] layout (per-head slabs strided 8 MB
             apart), no compute. Pins the strided-block DMA rate.
  dma_flat   same bytes, same grid, but the source pre-laid as
             [NC, KVH, chunk, D] so every block is one contiguous slab.
             If flat >> strided, the fix is a chunk-major cache layout.
  attn_flat  full online-softmax attention (bf16 dots, mask from a
             count scalar, NO e/aux outputs, NO meta stream) over the
             chunk-major layout — the candidate V2 kernel.
  oneshot8   the existing one-shot kernel at C=32768 with an int8 cache
             (K+V = 67 MB in VMEM, CCT_ATTN_OS_BUDGET_MB=96) — does a
             single fat step still stream at speed at this size?

Run on hardware:  python scripts/perf_probe13.py [--variants cur,...]
"""

import argparse
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cold_compress_tpu.utils.jax_setup import setup_jax

setup_jax()

INTERP = os.environ.get("CCT_PALLAS_INTERPRET", "0") == "1"

B, KVH, D = 1, 8, 128
C = 32768
CHUNK = 2048
NC = C // CHUNK
ITERS = 64
NEG_INF = -1e30


def bench(fn, *args, iters=ITERS):
    """Median-of-3 of (scan over `iters` in-program repeats), host-transfer
    barrier, per-iteration seconds. Varies a dummy input per iteration so
    the tunnel cannot coalesce identical calls (PERF.md methodology)."""

    @jax.jit
    def run(off, args):
        def body(carry, i):
            out = fn(i + off, *args)
            return carry + out.astype(jnp.float32).sum(), None

        tot, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(iters, dtype=jnp.int32)
        )
        return tot

    _ = float(np.asarray(run(jnp.int32(0), args)))  # compile+warm
    ts = []
    for rep in range(3):
        # Distinct `off` per call: identical repeated RPCs get coalesced by
        # the tunnel and report fake rates (PERF.md methodology).
        t0 = time.perf_counter()
        _ = float(np.asarray(run(jnp.int32(rep + 1), args)))
        ts.append((time.perf_counter() - t0) / iters)
    return sorted(ts)[1]


def mk_inputs(bits):
    rng = np.random.RandomState(0)
    if bits == 16:
        k = jnp.asarray(
            rng.randn(B, KVH, C, D).astype(np.float32) / 8, jnp.bfloat16
        )
        v = jnp.asarray(
            rng.randn(B, KVH, C, D).astype(np.float32) / 8, jnp.bfloat16
        )
        scales = None
    else:
        k = jnp.asarray(rng.randint(0, 256, (B, KVH, C, D)), jnp.uint8)
        v = jnp.asarray(rng.randint(0, 256, (B, KVH, C, D)), jnp.uint8)
        scales = jnp.full((B, KVH, C), 0.01, jnp.float32)
    q = jnp.asarray(rng.randn(B, KVH * 4, 1, D).astype(np.float32) / 8,
                    jnp.bfloat16)
    mask = jnp.broadcast_to(jnp.arange(C) < C - 99, (B, KVH, C))
    return q, k, v, scales, mask


# --------------------------------------------------------------------- cur
def variant_cur(bits):
    from cold_compress_tpu.ops.pallas_decode_attn import (
        quantized_decode_attention,
    )

    q, k, v, scales, mask = mk_inputs(bits)
    zeros = None if bits == 16 else jnp.zeros((B, KVH, C), jnp.float32)

    def fn(i, q, k, v, mask):
        qi = q + (i.astype(jnp.bfloat16) * 0)  # vary per iteration
        y, _ = quantized_decode_attention(
            qi, k, v, scales, zeros, scales, zeros, mask,
            bits=bits, need_attn=False, chunked=True,
        )
        return y

    sec = bench(fn, q, k, v, mask)
    kv_bytes = 2 * KVH * C * D * (2 if bits == 16 else 1)
    print(
        f"cur{bits}: {sec * 1e6:.1f} us/layer, "
        f"{kv_bytes / sec / 1e9:.0f} GB/s effective (K+V bytes only)"
    )


# ------------------------------------------------------------- dma kernels
def _dma_kernel(kq_ref, vq_ref, o_ref, acc_ref):
    nc = pl.program_id(1)

    @pl.when(nc == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Touch one sublane row of each block so the DMA cannot be elided;
    # arithmetic is negligible next to the stream.
    acc_ref[...] += (
        kq_ref[0, 0, 0:8, :].astype(jnp.float32)
        + vq_ref[0, 0, 0:8, :].astype(jnp.float32)
    )

    @pl.when(nc == NC - 1)
    def _fin():
        o_ref[...] = acc_ref[...]


def variant_dma(bits, flat):
    q, k, v, scales, mask = mk_inputs(bits)
    if flat:
        # Chunk-major relayout once, outside the timed region.
        k = k.reshape(B, KVH, NC, CHUNK, D).transpose(
            0, 2, 1, 3, 4
        ).reshape(B * NC, KVH, CHUNK, D)
        v = v.reshape(B, KVH, NC, CHUNK, D).transpose(
            0, 2, 1, 3, 4
        ).reshape(B * NC, KVH, CHUNK, D)
        kv_spec = pl.BlockSpec(
            (1, KVH, CHUNK, D), lambda b, c: (c, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        kernel = lambda kr, vr, o, a: _dma_kernel(kr, vr, o, a)  # noqa: E731
    else:
        kv_spec = pl.BlockSpec(
            (1, KVH, CHUNK, D), lambda b, c: (b, 0, c, 0),
            memory_space=pltpu.VMEM,
        )
        kernel = _dma_kernel
    call = pl.pallas_call(
        kernel,
        grid=(B, NC),
        in_specs=[kv_spec, kv_spec],
        out_specs=pl.BlockSpec((8, D), lambda b, c: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
        interpret=INTERP,
    )

    def fn(i, k, v):
        return call(k, v) + i.astype(jnp.float32)

    sec = bench(fn, k, v)
    kv_bytes = 2 * KVH * C * D * (2 if bits == 16 else 1)
    name = "dma_flat" if flat else "dma_strided"
    print(
        f"{name}{bits}: {sec * 1e6:.1f} us/layer, "
        f"{kv_bytes / sec / 1e9:.0f} GB/s"
    )


# ------------------------------------------------------------- attn_flat
def _attn_flat_kernel(cnt_ref, q_ref, kq_ref, vq_ref, o_ref,
                      acc_ref, m_ref, l_ref, *, scale):
    nc = pl.program_id(1)

    @pl.when(nc == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    base = nc * CHUNK
    cnt = cnt_ref[0]
    live_row = (
        jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1) + base < cnt
    )  # [1, CHUNK]
    for h in range(KVH):
        q = q_ref[0, h]  # [8, D] bf16
        s = jax.lax.dot_general(
            q, kq_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [8, CHUNK]
        s = jnp.where(live_row, s, NEG_INF)
        m_prev = m_ref[h, :, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        e = jnp.where(live_row, jnp.exp(s - m_new), 0.0)
        corr = jnp.exp(m_prev - m_new)
        l_new = l_ref[h, :, 0:1] * corr + jnp.sum(e, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            e.astype(jnp.bfloat16), vq_ref[0, h],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_new = acc_ref[h] * corr + pv
        acc_ref[h] = acc_new
        m_ref[h] = jnp.broadcast_to(m_new, m_ref[h].shape)
        l_ref[h] = jnp.broadcast_to(l_new, l_ref[h].shape)

        @pl.when(nc == NC - 1)
        def _fin():
            o_ref[0, h] = acc_new / jnp.maximum(l_new, 1e-30)


def variant_attn_flat(bits):
    assert bits == 16
    q, k, v, scales, mask = mk_inputs(bits)
    qf = q.reshape(B, KVH, 4, D)
    qf = jnp.pad(qf, ((0, 0), (0, 0), (0, 4), (0, 0))).astype(jnp.bfloat16)
    k = k.reshape(B, KVH, NC, CHUNK, D).transpose(
        0, 2, 1, 3, 4
    ).reshape(B * NC, KVH, CHUNK, D)
    v = v.reshape(B, KVH, NC, CHUNK, D).transpose(
        0, 2, 1, 3, 4
    ).reshape(B * NC, KVH, CHUNK, D)
    cnt = jnp.full((1,), C - 99, jnp.int32)

    kv_spec = pl.BlockSpec(
        (1, KVH, CHUNK, D), lambda b, c: (c, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    call = pl.pallas_call(
        functools.partial(_attn_flat_kernel, scale=1.0 / math.sqrt(D)),
        grid=(B, NC),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, KVH, 8, D), lambda b, c: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            kv_spec,
            kv_spec,
        ],
        out_specs=pl.BlockSpec((1, KVH, 8, D), lambda b, c: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, KVH, 8, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((KVH, 8, D), jnp.float32),
            pltpu.VMEM((KVH, 8, 128), jnp.float32),
            pltpu.VMEM((KVH, 8, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
        interpret=INTERP,
    )

    def fn(i, qf, k, v, cnt):
        return call(cnt, qf + (i.astype(jnp.bfloat16) * 0), k, v)

    sec = bench(fn, qf, k, v, cnt)
    kv_bytes = 2 * KVH * C * D * 2
    print(
        f"attn_flat16: {sec * 1e6:.1f} us/layer, "
        f"{kv_bytes / sec / 1e9:.0f} GB/s"
    )

    # Parity vs the XLA math path on the same inputs (one shot, f32).
    kk = k.reshape(B, NC, KVH, CHUNK, D).transpose(0, 2, 1, 3, 4).reshape(
        B, KVH, C, D
    )
    vv = v.reshape(B, NC, KVH, CHUNK, D).transpose(0, 2, 1, 3, 4).reshape(
        B, KVH, C, D
    )
    qr = qf[:, :, :4].astype(jnp.float32)
    s = jnp.einsum("bhgd,bhcd->bhgc", qr, kk.astype(jnp.float32))
    s = s / math.sqrt(D)
    s = jnp.where(jnp.arange(C)[None, None, None, :] < C - 99, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    want = jnp.einsum("bhgc,bhcd->bhgd", p, vv.astype(jnp.float32))
    got = call(cnt, qf, k, v)[:, :, :4]
    err = float(jnp.max(jnp.abs(got - want)))
    print(f"attn_flat16 parity vs XLA math: max|diff|={err:.2e}")


# --------------------------------------------------------------- oneshot8
def variant_oneshot8():
    os.environ["CCT_ATTN_OS_BUDGET_MB"] = "96"
    from cold_compress_tpu.ops.pallas_decode_attn import (
        quantized_decode_attention,
    )

    quantized_decode_attention.clear_cache()
    q, k, v, scales, mask = mk_inputs(8)
    zeros = jnp.zeros((B, KVH, C), jnp.float32)

    def fn(i, q, k, v, mask):
        y, _ = quantized_decode_attention(
            q + (i.astype(jnp.bfloat16) * 0), k, v, scales, zeros, scales,
            zeros, mask, bits=8, need_attn=False, chunked=False,
        )
        return y

    try:
        sec = bench(fn, q, k, v, mask)
        kv_bytes = 2 * KVH * C * D
        print(
            f"oneshot8 (67MB in VMEM): {sec * 1e6:.1f} us/layer, "
            f"{kv_bytes / sec / 1e9:.0f} GB/s"
        )
    except Exception as e:  # vmem OOM is an answer too
        print(f"oneshot8: FAILED {type(e).__name__}: {str(e)[:300]}")


def variant_v2(bits):
    """Production entry with CCT_ATTN_V2=1 (slim kernel): 32k-kv8 rides the
    one-shot path (67 MB <= the 72 MB v2 budget, NC=1); 32k-bf16 chunks at
    8192 (4 fat steps). CCT_ATTN_CHUNK/CCT_ATTN_V2_OS_MB sweep via env."""
    os.environ["CCT_ATTN_V2"] = "1"
    from cold_compress_tpu.ops.pallas_decode_attn import (
        quantized_decode_attention,
    )

    quantized_decode_attention.clear_cache()
    q, k, v, scales, mask = mk_inputs(bits)
    zeros = None if bits == 16 else jnp.zeros((B, KVH, C), jnp.float32)

    def fn(i, q, k, v, mask):
        y, _ = quantized_decode_attention(
            q + (i.astype(jnp.bfloat16) * 0), k, v, scales, zeros, scales,
            zeros, mask, bits=bits, need_attn=False,
        )
        return y

    try:
        sec = bench(fn, q, k, v, mask)
        kv_bytes = 2 * KVH * C * D * (2 if bits == 16 else 1)
        print(
            f"v2_{bits} (chunk={os.environ.get('CCT_ATTN_CHUNK', 'auto')}, "
            f"os_mb={os.environ.get('CCT_ATTN_V2_OS_MB', '72')}): "
            f"{sec * 1e6:.1f} us/layer, {kv_bytes / sec / 1e9:.0f} GB/s"
        )
    except Exception as e:
        print(f"v2_{bits}: FAILED {type(e).__name__}: {str(e)[:300]}")
    finally:
        quantized_decode_attention.clear_cache()
        del os.environ["CCT_ATTN_V2"]


ALL = {
    "cur16": lambda: variant_cur(16),
    "cur8": lambda: variant_cur(8),
    "dma_strided16": lambda: variant_dma(16, flat=False),
    "dma_flat16": lambda: variant_dma(16, flat=True),
    "dma_strided8": lambda: variant_dma(8, flat=False),
    "dma_flat8": lambda: variant_dma(8, flat=True),
    "attn_flat16": lambda: variant_attn_flat(16),
    "oneshot8": variant_oneshot8,
    "v2_16": lambda: variant_v2(16),
    "v2_8": lambda: variant_v2(8),
}

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=",".join(ALL))
    args = ap.parse_args()
    for name in args.variants.split(","):
        try:
            ALL[name]()
        except Exception as e:
            # One variant must not kill the rest (the dma_strided8 leg
            # trips a jax-internal mlir lowering-cache KeyError on this
            # backend — r5 batch B).
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
    print("RESULT_OK")
