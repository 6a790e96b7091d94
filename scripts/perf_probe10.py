"""Probe: decompose the quantized-KV decode gap (73.9 vs 89.7 tok/s, r2).

The cache_bits=8 bench streams HALF the cache bytes of the bf16 run yet
decodes ~2.4 ms/token slower. Suspects: the in-kernel dequant VPU work, the
per-step [B, KVH, 8, C] f32 meta build in the wrapper (stack + pad hits HBM
every step), the e/aux round-trip for pooled probabilities, and the
row-requant insert in decode_update. This probe times each stage on the real
north-star shapes (B=1, KVH=8, D=128, C=2048 = heavy_hitter 25% of 8k),
32 calls per token inside one jitted scan (per-call dispatch never pollutes
the numbers — PERF.md methodology).

Legs (all: ms per 32-layer "token"):
  attn16 / attn8 / attn4     fused decode attention alone, need_attn=True
  attn8_noattn               bits=8, need_attn=False (e/aux cost)
  upd16 / upd8               heavy_hitter decode_update alone
  full16 / full8             update + attention (the real per-layer pair)

Run on TPU:  python scripts/perf_probe10.py [--legs attn16,attn8,...]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from cold_compress_tpu.caches import CacheSpec, decode_update, get_cache_strategy
from cold_compress_tpu.caches.base import quantize_rows
from cold_compress_tpu.models.transformer import init_caches
from cold_compress_tpu.models.config import ModelConfig
from cold_compress_tpu.ops.pallas_decode_attn import (
    quantized_decode_attention,
)
from cold_compress_tpu.ops.pallas_qmm import force_interpret

import os

B, KVH, H, D = 1, 8, 32, 128
C = int(os.environ.get("P10_C", "2048"))
NL = int(os.environ.get("P10_NL", "32"))
REPEATS = int(os.environ.get("P10_REPEATS", "16"))


def make_cache(bits):
    cfg = ModelConfig.from_name("Meta-Llama-3-8B-Instruct").replace(
        n_layer=1, block_size=8192, max_length=8192
    )
    spec = CacheSpec(
        cache_strategy="heavy_hitter",
        max_cache_length=C,
        max_seq_length=8192,
        global_tokens=4,
        recent_window=10,
        prompt_compression_strategy="heavy_hitter",
        cache_bits=bits,
    )
    caches = init_caches(cfg, (spec,), B, jnp.bfloat16, stacked=False)
    cache = caches[0]
    # Fill the cache with plausible contents: mask all true, pos ascending.
    rng = np.random.default_rng(0)
    kf = jnp.asarray(rng.normal(size=(B, KVH, C, D)).astype(np.float32))
    vf = jnp.asarray(rng.normal(size=(B, KVH, C, D)).astype(np.float32))
    upd = dict(
        pos=jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32), (B, KVH, C)),
        mask=jnp.ones((B, KVH, C), bool),
        cache_ct=jnp.full((B, KVH), C, jnp.int32),
    )
    if bits:
        kq, ks, kz = quantize_rows(kf, bits)
        vq, vs, vz = quantize_rows(vf, bits)
        cache = cache.replace(
            k=kq, v=vq, k_scales=ks, k_zeros=kz, v_scales=vs, v_zeros=vz,
            **upd,
        )
    else:
        cache = cache.replace(
            k=kf.astype(jnp.bfloat16), v=vf.astype(jnp.bfloat16), **upd
        )
    # Heavy-hitter history state must look live.
    extra = {
        k: (jnp.abs(v) + 0.1 if v.dtype != jnp.int32 else v)
        for k, v in cache.extra.items()
    }
    return cache.replace(extra=extra), spec


def time_leg(fn, args, label):
    runj = jax.jit(fn)
    np.asarray(jax.tree.leaves(runj(*args))[0])  # compile + warmup
    t0 = time.perf_counter()
    out = runj(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t = (time.perf_counter() - t0) / REPEATS
    print(f"{label:14s} {t*1e3:8.3f} ms/token "
          f"({t/NL*1e6:7.1f} us/layer)", flush=True)


def attn_leg(bits, need_attn=True, chunked=None):
    cache, spec = make_cache(bits)
    rng = np.random.default_rng(1)
    q0 = jnp.asarray(
        rng.normal(size=(B, H, 1, D)).astype(np.float32), jnp.bfloat16
    )

    def run(cache, q0):
        def body(q, _):
            y, attn = quantized_decode_attention(
                q, cache.k, cache.v, cache.k_scales, cache.k_zeros,
                cache.v_scales, cache.v_zeros, cache.mask,
                bits=bits or 16, need_attn=need_attn,
                interpret=force_interpret(), chunked=chunked,
            )
            q = q + y.astype(q.dtype) * jnp.bfloat16(1e-6)
            if attn is not None:
                q = q + jnp.sum(attn).astype(q.dtype) * jnp.bfloat16(1e-9)
            return q, ()

        q, _ = jax.lax.scan(body, q0, jnp.arange(NL * REPEATS))
        return q

    label = f"attn{bits or 16}" + ("" if need_attn else "_na")
    if chunked is not None:
        label += "_c" if chunked else "_os"
    time_leg(run, (cache, q0), label)


def update_leg(bits, with_attn=False):
    cache, spec = make_cache(bits)
    strategy = get_cache_strategy("heavy_hitter")
    rng = np.random.default_rng(2)
    q0 = jnp.asarray(
        rng.normal(size=(B, H, 1, D)).astype(np.float32), jnp.bfloat16
    )
    k0 = jnp.asarray(
        rng.normal(size=(B, KVH, 1, D)).astype(np.float32), jnp.bfloat16
    )

    def run(cache, q0, k0):
        def body(carry, i):
            cache, q = carry
            cache2, kc, vc, mask = decode_update(
                strategy, cache, C + i, k0 + q[:, :1, :, :] * 1e-6,
                k0 * 0.5, token=None,
            )
            if with_attn:
                y, attn = quantized_decode_attention(
                    q, cache2.k, cache2.v, cache2.k_scales, cache2.k_zeros,
                    cache2.v_scales, cache2.v_zeros, cache2.mask,
                    bits=bits or 16, need_attn=True,
                    interpret=force_interpret(),
                )
                cache2 = strategy.update_state(
                    cache2.spec, cache2, C + i, attn[:, :, 0],
                    is_prefill=False,
                )
                q = q + y.astype(q.dtype) * jnp.bfloat16(1e-6)
            return (cache2, q), ()

        (cache, q), _ = jax.lax.scan(
            body, (cache, q0), jnp.arange(NL * REPEATS)
        )
        return q

    label = ("full" if with_attn else "upd") + f"{bits or 16}"
    time_leg(run, (cache, q0, k0), label)


LEGS = {
    "attn16": lambda: attn_leg(None),
    "attn8": lambda: attn_leg(8),
    "attn4": lambda: attn_leg(4),
    "attn8_na": lambda: attn_leg(8, need_attn=False),
    "attn16_na": lambda: attn_leg(None, need_attn=False),
    # One-shot (chunked=False): C=2048 K+V (8.4 MB) fits the one-step
    # VMEM budget; the 4-chunk grid measured 73.6 us/layer = 114 GB/s
    # effective — step-overhead-bound, not byte-bound.
    "attn16_os": lambda: attn_leg(None, chunked=False),
    "attn8_os": lambda: attn_leg(8, chunked=False),
    "attn4_os": lambda: attn_leg(4, chunked=False),
    "upd16": lambda: update_leg(None),
    "upd8": lambda: update_leg(8),
    "full16": lambda: update_leg(None, with_attn=True),
    "full8": lambda: update_leg(8, with_attn=True),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", default=",".join(LEGS))
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}  shapes B={B} KVH={KVH} "
          f"D={D} C={C}", flush=True)
    for leg in args.legs.split(","):
        LEGS[leg.strip()]()


if __name__ == "__main__":
    main()
