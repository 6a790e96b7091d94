#!/usr/bin/env python
"""In-graph kernel timing: the axon tunnel adds ~3.5 ms per host dispatch,
so individual pallas_call timings are meaningless. Here each kernel runs
``iters`` times inside one jitted fori_loop (sequential via an accumulator
dependency) and the per-iteration time is the whole-program time / iters.

Stages: micro (current w4a8 + w8a8 + stream/unpack), v2b (dual-dot), attn.
"""

import argparse
import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.append(str(Path(__file__).parent))
sys.path.append(str(Path(__file__).parent.parent))
from cold_compress_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from perf_probe import _mk_int4, _repack_signed, qmm_w4a8_v2b  # noqa: E402

ITERS = 48


MIN_WORKING_SET = 512 << 20  # cycle > on-chip capacity so HBM must stream


def graph_time(call, x0, extra_args, iters=ITERS, reps=3):
    """call(x, *per_iter_args) -> array. Returns per-iteration seconds.

    Two traps on this backend (hard-won in round 1):
      * identical (executable, inputs) host calls are coalesced and replayed
        -> every rep uses a different x0;
      * a single weight matrix stays resident on-chip across loop
        iterations -> multi-TB/s fantasy numbers. Each per-iteration arg is
        replicated K times (working set > MIN_WORKING_SET) and the loop
        scans over the stack exactly like the model's scan-over-layers.
    The fixed dispatch cost is removed by differencing full vs quarter
    loop lengths.
    """
    bytes_per_iter = sum(
        a.size * a.dtype.itemsize for a in extra_args
    )
    K = max(2, min(64, -(-MIN_WORKING_SET // max(bytes_per_iter, 1))))
    stacks = []
    for a in extra_args:
        base = np.asarray(a)
        copies = [base]
        rng = np.random.RandomState(17)
        for _ in range(K - 1):
            if base.dtype in (np.uint8, np.int8):
                copies.append(
                    base ^ np.asarray(rng.randint(1, 3), base.dtype)
                )
            else:
                copies.append(base * (1.0 + 1e-3 * rng.rand()))
        stacks.append(jnp.asarray(np.stack(copies)))

    iters = max(iters, 1024)  # dispatch (~3.5 ms) amortizes to ~3 us/iter

    @jax.jit
    def run(x0, *stks):
        def body(carry, i):
            acc, x = carry
            args_i = [
                jax.lax.dynamic_index_in_dim(
                    s, i % K, axis=0, keepdims=False
                )
                for s in stks
            ]
            y = call(x + acc * 1e-20, *args_i)  # acc-dep serializes
            return (acc + jnp.sum(y).astype(jnp.float32), x), None

        (acc, _), _ = jax.lax.scan(
            body, (jnp.float32(0.0), x0), jnp.arange(iters)
        )
        return acc

    xs = [x0 + 0.001 * (r + 1) for r in range(reps + 1)]
    jax.block_until_ready(run(xs[-1], *stacks))  # compile
    ts = []
    for xr in xs[:reps]:
        t0 = time.perf_counter()
        jax.block_until_ready(run(xr, *stacks))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / iters


def report(name, secs, bytes_streamed=None, **extra):
    rec = {"probe": name, "us": round(secs * 1e6, 1)}
    if bytes_streamed:
        rec["GBps"] = round(bytes_streamed / secs / 1e9, 1)
    rec.update(extra)
    print(json.dumps(rec), flush=True)


SHAPES = [(4096, 14336), (14336, 4096), (4096, 4096), (4096, 6144)]


def stage_micro():
    from cold_compress_tpu.ops.pallas_qmm import qmm_w4a8
    from cold_compress_tpu.ops.linear import QuantizedWeight, w8a8_matmul

    rng = np.random.RandomState(0)
    for IN, OUT in SHAPES:
        w, s, z = _mk_int4(IN, OUT, 1)
        x0 = jnp.asarray(rng.randn(8, IN).astype(np.float32) / 32)
        t = graph_time(
            lambda x, w, s, z: qmm_w4a8(x, w, s, z), x0, (w, s, z)
        )
        report(f"g_w4a8_{IN}x{OUT}", t, bytes_streamed=IN * OUT // 2)

    IN, OUT = 4096, 128256
    w8 = jnp.asarray(rng.randint(-127, 127, size=(IN, OUT), dtype=np.int8))
    sc = jnp.ones((OUT,), jnp.float32)
    x0 = jnp.asarray(rng.randn(8, IN).astype(np.float32) / 32)

    def w8call(x, w, sc):
        leaf = QuantizedWeight(w=w, scales=sc, kind="int8")
        return w8a8_matmul(x, leaf)

    t = graph_time(w8call, x0, (w8, sc), iters=16)
    report("g_w8a8_lm_head", t, bytes_streamed=IN * OUT)


def stage_streams():
    rng = np.random.RandomState(0)
    IN, OUT = 4096, 14336
    INh = IN // 2
    TO = 256
    w, _, _ = _mk_int4(IN, OUT, 2)

    # Each kernel takes a small varying x operand so the pallas_call is not
    # loop-invariant (XLA would hoist a pure function of the constant w out
    # of the timing loop).
    def _stream_call(kernel, w_arr):
        def call(x, w):
            return pl.pallas_call(
                kernel,
                grid=(OUT // TO,),
                in_specs=[
                    pl.BlockSpec((1, 128), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((INh, TO), lambda j: (0, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, TO), lambda j: (0, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, OUT), jnp.int32),
            )(x, w)

        return call, w_arr

    def k_stream(x_ref, w_ref, o_ref):
        o_ref[...] = jnp.sum(
            w_ref[...].astype(jnp.int32), axis=0, keepdims=True
        ) + x_ref[0, 0].astype(jnp.int32)

    x0 = jnp.zeros((1, 128), jnp.float32)
    call, warr = _stream_call(k_stream, w)
    t = graph_time(call, x0, (warr,))
    report("g_stream_only_u8", t, bytes_streamed=INh * OUT)

    def k_unpack(x_ref, w_ref, o_ref):
        p = w_ref[...].astype(jnp.int32)
        lo = (p & 0xF).astype(jnp.int8)
        hi = ((p >> 4) & 0xF).astype(jnp.int8)
        o_ref[...] = jnp.sum(
            lo.astype(jnp.int32) + hi.astype(jnp.int32), axis=0,
            keepdims=True,
        ) + x_ref[0, 0].astype(jnp.int32)

    call, warr = _stream_call(k_unpack, w)
    t = graph_time(call, x0, (warr,))
    report("g_unpack_i32", t, bytes_streamed=INh * OUT)

    # int8-native single-op unpack (supported per basics probe)
    def k_unpack8(x_ref, w_ref, o_ref):
        lo = w_ref[...] & 0xF
        o_ref[...] = jnp.sum(
            lo.astype(jnp.int32), axis=0, keepdims=True
        ) + x_ref[0, 0].astype(jnp.int32)

    call, warr = _stream_call(k_unpack8, _repack_signed(w))
    t = graph_time(call, x0, (warr,))
    report("g_unpack_i8and", t, bytes_streamed=INh * OUT)


def stage_v2b():
    from cold_compress_tpu.ops.pallas_qmm import qmm_w4a8

    rng = np.random.RandomState(0)
    for IN, OUT in SHAPES:
        w, s, z = _mk_int4(IN, OUT, 1)
        ws = _repack_signed(w)
        x0 = jnp.asarray(rng.randn(8, IN).astype(np.float32) / 32)
        # numerics check once (host dispatch ok)
        y_ref = np.asarray(qmm_w4a8(x0, w, s, z))
        y_new = np.asarray(qmm_w4a8_v2b(x0, ws, s, z))
        err = float(np.max(np.abs(y_ref - y_new))
                    / max(1e-9, float(np.max(np.abs(y_ref)))))
        t = graph_time(
            lambda x, w, s, z: qmm_w4a8_v2b(x, w, s, z), x0, (ws, s, z)
        )
        report(f"g_v2b_{IN}x{OUT}", t, bytes_streamed=IN * OUT // 2,
               rel_err=round(err, 6))


def stage_stacked():
    """THE decode-path measurement: the whole [K, ...] weight stack is the
    pallas operand and the layer index is scalar-prefetched, so no per-step
    slice copy exists (unlike graph_time, whose harness slices outside the
    kernel — that's what the model's scan used to do and what stage_micro
    still measures)."""
    from cold_compress_tpu.ops.pallas_qmm import qmm_w4a8_stacked

    rng = np.random.RandomState(0)
    shapes = [(4096, 14336), (14336, 4096), (4096, 4096), (4096, 6144)]
    tiles = {(4096, 14336): (256, 512, 1024, 1792, 3584)}
    iters = 1024
    for IN, OUT in shapes:
        nbytes = IN * OUT // 2
        K = max(2, min(32, -(-MIN_WORKING_SET // nbytes)))
        wr = np.random.RandomState(1)
        w = jnp.asarray(
            wr.randint(0, 256, size=(K, IN // 2, OUT), dtype=np.uint8)
            .view(np.int8)
        )
        s = jnp.asarray(
            np.full((K, IN // 128, OUT), 0.02 / 8, np.float32)
        )
        z = jnp.asarray(np.zeros((K, IN // 128, OUT), np.float32))
        x0 = jnp.asarray(rng.randn(8, IN).astype(np.float32) / 32)
        for to in tiles.get((IN, OUT), (None,)):
            if to is not None and OUT % to:
                continue

            @functools.partial(jax.jit, static_argnames=("to",))
            def run(x0, w, s, z, to=None):
                def body(carry, i):
                    acc, x = carry
                    y = qmm_w4a8_stacked(
                        x + acc * 1e-20, w, s, z, i % K, tile_out=to
                    )
                    return (acc + jnp.sum(y).astype(jnp.float32), x), None

                (acc, _), _ = jax.lax.scan(
                    body, (jnp.float32(0.0), x0), jnp.arange(iters)
                )
                return acc

            try:
                jax.block_until_ready(run(x0 + 1.0, w, s, z, to=to))
                ts = []
                for r in range(3):
                    xr = x0 + 0.001 * (r + 1)
                    t0 = time.perf_counter()
                    jax.block_until_ready(run(xr, w, s, z, to=to))
                    ts.append(time.perf_counter() - t0)
                t = float(np.median(ts)) / iters
                report(f"g_stk_{IN}x{OUT}_to{to}", t, bytes_streamed=nbytes)
            except Exception as e:  # noqa: BLE001
                report(f"g_stk_{IN}x{OUT}_to{to}", 1.0, error=str(e)[:200])


def stage_attn():
    from cold_compress_tpu.ops.attention import gqa_attention

    rng = np.random.RandomState(0)
    B, H, KVH, D, S = 1, 32, 8, 128, 2048
    k = jnp.asarray(rng.randn(B, KVH, S, D).astype(np.float32) / 16).astype(
        jnp.bfloat16
    )
    v = jnp.asarray(rng.randn(B, KVH, S, D).astype(np.float32) / 16).astype(
        jnp.bfloat16
    )
    mask = jnp.ones((B, KVH, 1, 1, S), bool)
    q0 = jnp.asarray(rng.randn(B, H, 1, D).astype(np.float32) / 16).astype(
        jnp.bfloat16
    )
    for ra in (True, False):
        t = graph_time(
            lambda q, k, v: gqa_attention(
                q, k, v, mask=mask, return_attn=ra
            )[0],
            q0, (k, v),
        )
        report(f"g_decode_attn_S{S}_ra{int(ra)}", t,
               bytes_streamed=2 * B * KVH * S * D * 2)


def stage_prefill():
    """flash_prefill vs chunked XLA prefill at the north-star shape.
    Direct host timing: one call is tens of ms, dispatch is noise."""
    from cold_compress_tpu.ops.attention import prefill_attention
    from cold_compress_tpu.ops.pallas_prefill import flash_prefill

    rng = np.random.RandomState(0)
    B, KVH, G, D, P = 1, 8, 4, 128, 8192
    H = KVH * G

    def mk(seed):
        r = np.random.RandomState(seed)
        q = jnp.asarray(r.randn(B, H, P, D).astype(np.float32) / 8).astype(
            jnp.bfloat16
        )
        k = jnp.asarray(r.randn(B, KVH, P, D).astype(np.float32) / 8).astype(
            jnp.bfloat16
        )
        v = jnp.asarray(r.randn(B, KVH, P, D).astype(np.float32) / 8).astype(
            jnp.bfloat16
        )
        return q, k, v

    sets = [mk(s) for s in range(3)]
    plen = jnp.int32(P - 64)
    valid = jnp.broadcast_to(jnp.arange(P)[None, :] < plen, (B, P))

    for nm, fn in (
        ("flash_prefill_sum", jax.jit(
            lambda q, k, v: flash_prefill(q, k, v, plen, need_summary=True)
        )),
        ("flash_prefill_nosum", jax.jit(
            lambda q, k, v: flash_prefill(q, k, v, plen, need_summary=False)
        )),
        ("chunked_prefill_sum", jax.jit(
            lambda q, k, v: prefill_attention(
                q, k, v, valid, plen, need_summary=True
            )
        )),
    ):
        try:
            jax.block_until_ready(fn(*sets[-1]))
            ts = []
            for s in sets:
                t0 = time.perf_counter()
                jax.block_until_ready(fn(*s))
                ts.append(time.perf_counter() - t0)
            t = float(np.median(ts))
            report(nm, t, toks_per_s=round(P / t, 1))
        except Exception as e:  # noqa: BLE001
            report(nm, 1.0, error=str(e)[:300])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="micro,streams,v2b,attn")
    args = ap.parse_args()
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    for st in args.stage.split(","):
        t0 = time.time()
        dict(micro=stage_micro, streams=stage_streams, v2b=stage_v2b,
             attn=stage_attn, prefill=stage_prefill,
             stacked=stage_stacked)[st]()
        print(json.dumps({"stage": st, "wall_s": round(time.time() - t0, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
