"""Probe: honest XLA dot streaming rate — the plateau narrative's anchor.

PERF.md's roofline ("weights at XLA's 712 GB/s ⇒ ~145 tok/s") rests on an
r1 measurement of a fused XLA int8 dot that predates the honest-timing
methodology (varied inputs, host barrier, scan-internal repeats). probe8's
pure-DMA Pallas floor is 632 GB/s — if the honest XLA number is also ~630,
the "plateau" is simply this part's achievable HBM rate through any
engine, the realistic decode ceiling drops accordingly, and the remaining
integration work should target the non-weight 4.2 ms instead.

Variants (Llama-3-8B fused decode shapes, NL=32 layers per scanned token):
  i8    int8 weights [NL, IN, OUT], barriered int8 MXU dot per projection
        (w8a8_matmul's exact recipe: dynamic activation quant outside the
        dot, optimization_barrier fences) — 2x the int4 bytes
  bf16  bf16 weights, plain dot — 4x the int4 bytes

Run on TPU:  python scripts/perf_probe12.py --variant {i8,bf16}
             P12_REPEATS=32 P12_NL=32 override the defaults.
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

NL = int(os.environ.get("P12_NL", "32"))
REPEATS = int(os.environ.get("P12_REPEATS", "32"))
D, F = 4096, 14336
# (IN, OUT): fused Llama-3-8B decode projections (full widths).
SHAPES = [(D, 6144), (D, D), (D, 2 * F), (F, D)]


def build(variant, rng):
    stacks = []
    for IN, OUT in SHAPES:
        if variant == "i8":
            w = rng.integers(-128, 128, (NL, IN, OUT), dtype=np.int8)
            s = rng.uniform(0.005, 0.02, (NL, OUT)).astype(np.float32)
            stacks.append((jax.device_put(jnp.asarray(w)),
                           jax.device_put(jnp.asarray(s))))
            gb = IN * OUT * NL / 1e9
        else:
            w = (rng.standard_normal((NL, IN, OUT)) * 0.02).astype(
                np.float32
            )
            stacks.append(
                (jax.device_put(jnp.asarray(w).astype(jnp.bfloat16)),)
            )
            gb = 2 * IN * OUT * NL / 1e9
        print(f"  ({IN},{OUT}) {variant}: {gb:.2f} GB", flush=True)
    return stacks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="i8", choices=["i8", "bf16"])
    args = ap.parse_args()
    bytes_per_w = 1 if args.variant == "i8" else 2
    total_gb = sum(IN * OUT for IN, OUT in SHAPES) * NL * bytes_per_w / 1e9
    print(f"backend: {jax.default_backend()} variant={args.variant} "
          f"NL={NL} streamed={total_gb:.2f} GB", flush=True)
    rng = np.random.default_rng(0)
    stacks = build(args.variant, rng)

    def proj(stacks, p, x, li):
        if args.variant == "i8":
            w, s = stacks[p]
            wl = jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)
            sl = jax.lax.dynamic_index_in_dim(s, li, 0, keepdims=False)
            absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
            sx = jnp.maximum(absmax, 1e-8) / 127.0
            xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
            xq = jax.lax.optimization_barrier(xq)
            acc = jax.lax.dot_general(
                xq, wl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = jax.lax.optimization_barrier(acc)
            return acc.astype(jnp.float32) * sx * sl[None, :]
        (w,) = stacks[p]
        wl = jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), wl, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # Stacks as arguments (closure constants = compile-time GB copies).
    def run(stacks, x0, x20):
        def body(carry, i):
            x, x2 = carry
            li = i % NL
            y0 = proj(stacks, 0, x, li)
            y1 = proj(stacks, 1, x, li)
            y2 = proj(stacks, 2, x, li)
            y3 = proj(stacks, 3, x2, li)
            x = x + y1.astype(x.dtype) * 1e-6
            x = x.at[:, 0].add(
                (jnp.sum(y0, axis=1) + jnp.sum(y3, axis=1)) * 1e-9
            )
            x2 = x2 + y2[:, :F].astype(x2.dtype) * 1e-6
            return (x, x2), ()

        (x, x2), _ = jax.lax.scan(body, (x0, x20), jnp.arange(NL * REPEATS))
        return x, x2

    runj = jax.jit(run)
    for seed in (3, 4):
        r = np.random.default_rng(seed)
        x0 = jnp.asarray(r.normal(size=(1, D)).astype(np.float32))
        x20 = jnp.asarray(r.normal(size=(1, F)).astype(np.float32))
        t0 = time.perf_counter()
        np.asarray(runj(stacks, x0, x20)[0])
        t = (time.perf_counter() - t0) / REPEATS
        tag = "warmup" if seed == 3 else "timed "
        print(
            f"{tag} {args.variant}: {t*1e3:8.3f} ms/token "
            f"({t/NL*1e6:7.1f} us/layer, {total_gb/t:.2f} GB/s effective)",
            flush=True,
        )


if __name__ == "__main__":
    main()
