"""Probe: where do the W4A8 kernel's ~5.4 us/step go?

Variants, all stacked + scalar-prefetch + tile-major (contiguous blocks),
timed over the 4 fused Llama-3-8B decode shapes x 32 layers at L=1:

  onedot   — ONE int8 dot per block, no nibble mask, no group scales
             (math is wrong; times the (DMA + single dot + store) floor).
  nomask   — colpack two dots but the second reuses the raw byte (drops the
             VPU `& 0xF`); isolates the mask cost.
  w8a8     — honest per-channel int8: one dot over int8 weights (2x bytes,
             1x dots per byte); if ~bytes/1.7TB/s it's a real alternative.

Compare against perf_probe6 'colpack tiled: 248 us/layer'.

Run on TPU: python scripts/perf_probe7.py --variant {onedot,nomask,w8a8}
"""

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

NL, D, F = 32, 4096, 14336
GS = 128
SHAPES = [(D, 6144), (D, D), (D, 2 * F), (F, D)]
REPEATS = 64
L = 1


def pick_tile(IN, OUTc, budget=3_700_000):
    for cand in (1024, 512, 256, 128):
        if OUTc % cand == 0 and IN * cand <= budget:
            return cand
    return 128


def _kernel(idx_ref, x_ref, w_ref, o_ref, *, two_dots, mask):
    b = w_ref[0, 0]
    d1 = jnp.dot(x_ref[...], b, preferred_element_type=jnp.int32)
    acc = d1.astype(jnp.float32)
    if two_dots:
        lo = (b & 0xF) if mask else b
        d2 = jnp.dot(x_ref[...], lo, preferred_element_type=jnp.int32)
        acc = acc + d2.astype(jnp.float32) * 0.0625
    o_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("two_dots", "mask"))
def qmm_probe(x, w_tiled, layer_idx, two_dots=False, mask=False):
    Lx, IN = x.shape
    NLx, T, _, TO = w_tiled.shape
    xq = jnp.clip(jnp.round(x), -127, 127).astype(jnp.int8)
    xq = jax.lax.optimization_barrier(xq)
    kern = functools.partial(_kernel, two_dots=two_dots, mask=mask)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((Lx, IN), lambda j, idx: (0, 0)),
            pl.BlockSpec((1, 1, IN, TO), lambda j, idx: (idx[0], j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((Lx, TO), lambda j, idx: (0, j)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Lx, T * TO), jnp.float32),
    )(jnp.asarray([layer_idx], jnp.int32), xq, w_tiled)


def build(variant):
    rng = np.random.default_rng(0)
    out = []
    for IN, OUT in SHAPES:
        OUTc = OUT if variant == "w8a8" else OUT // 2
        TO = pick_tile(IN, OUTc)
        T = OUTc // TO
        w = rng.integers(-128, 128, (NL, T, IN, TO), dtype=np.int64)
        out.append(jnp.asarray(w.astype(np.int8)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--variant", default="onedot", choices=["onedot", "nomask", "w8a8"]
    )
    args = ap.parse_args()
    two_dots = args.variant in ("nomask",)
    mask = False
    print(f"backend: {jax.default_backend()}  variant={args.variant}",
          flush=True)
    stacks = build(args.variant)
    # L rows: 8-pad like the real kernel's non-bd x operand.
    Lp = 8

    def run(ws, x0):
        def body(x, i):
            h = x
            for w, (IN, OUT) in zip(ws, SHAPES):
                y = qmm_probe(
                    h[:, :IN], w, i % NL, two_dots=two_dots, mask=mask
                )
                h = h + jnp.pad(
                    y[:, :D].astype(jnp.bfloat16),
                    ((0, 0), (0, h.shape[1] - min(D, y.shape[1]))),
                )[:, : h.shape[1]] * 1e-6
            return h, ()

        x, _ = jax.lax.scan(body, x0, jnp.arange(NL * REPEATS))
        return x

    runj = jax.jit(run)
    x0s = [
        jnp.asarray(
            np.random.default_rng(i).normal(size=(Lp, F)).astype(np.float32)
        )
        for i in range(2)
    ]
    np.asarray(runj(stacks, x0s[0]))
    t0 = time.perf_counter()
    np.asarray(runj(stacks, x0s[1]))
    t = (time.perf_counter() - t0) / REPEATS
    gb = sum(w.size for w in stacks) / 1e9
    print(
        f"{args.variant}: {t*1e3:8.3f} ms/token ({t/NL*1e6:7.1f} us/layer, "
        f"{gb/t:.2f} GB/s effective)",
        flush=True,
    )


if __name__ == "__main__":
    main()
