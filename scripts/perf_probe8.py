"""Probe: decompose the W4A8 decode weight stream (248 us/layer measured).

Per-step time at default tiles is ~5.4 us for a ~2 MB block (~430 GB/s
effective), while the same part streams >=712 GB/s for a fused XLA dot.
Candidates: DMA floor itself, dot latency serializing with DMA, or the
16 MB default scoped-vmem limit capping block size / double buffering.

Variants (all stacked + scalar-prefetch + tile-major contiguous blocks,
timed over the 4 fused Llama-3-8B decode shapes x 32 layers, L=1):

  dma      — kernel consumes the block with a trivial row-slice store:
             times (DMA stream + store) alone, no MXU work.
  onedot   — ONE int8 dot per block (math wrong; floor of DMA + 1 dot).
  cp2      — two dots + nibble mask (the real colpack math, re-measured
             here so all variants share a harness).
Each runs at the default tile budget (TO<=1024 @ <=3.7MB) AND at fat
tiles (TO up to 4096, vmem_limit_bytes=100MB).

Run on TPU: python scripts/perf_probe8.py --variant {dma,onedot,cp2} \
    [--fat]
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
# colpack halves the output axis.
SHAPES = [(D, 6144 // 2), (D, D // 2), (D, 2 * F // 2), (F, D // 2)]
REPEATS = 64
VMEM_FAT = 100 * 1024 * 1024


def pick_tile(IN, OUTc, budget):
    for cand in (4096, 2048, 1024, 512, 256, 128):
        if OUTc % cand == 0 and IN * cand <= budget:
            return cand
    return 128


def _kernel(idx_ref, x_ref, w_ref, o_ref, *, variant):
    b = w_ref[0, 0]
    if variant == "dma":
        o_ref[...] = b[: o_ref.shape[0], :].astype(jnp.float32)
        return
    d1 = jnp.dot(x_ref[...], b, preferred_element_type=jnp.int32)
    acc = d1.astype(jnp.float32)
    if variant == "cp2":
        lo = b & 0xF
        d2 = jnp.dot(x_ref[...], lo, preferred_element_type=jnp.int32)
        acc = acc + d2.astype(jnp.float32) * 0.0625
    o_ref[...] = acc


def _kernel2(idx_ref, x_ref, wa_ref, wb_ref, oa_ref, ob_ref, *, variant):
    """Dual-stream: two independent weight inputs per grid step — two
    block DMAs in flight if the single-pipeline rate is the cap."""
    for w_ref, o_ref in ((wa_ref, oa_ref), (wb_ref, ob_ref)):
        b = w_ref[0, 0]
        if variant == "dma2":
            o_ref[...] = b[: o_ref.shape[0], :].astype(jnp.float32)
            continue
        d1 = jnp.dot(x_ref[...], b, preferred_element_type=jnp.int32)
        acc = d1.astype(jnp.float32)
        if variant == "cp2x2":
            lo = b & 0xF
            d2 = jnp.dot(x_ref[...], lo, preferred_element_type=jnp.int32)
            acc = acc + d2.astype(jnp.float32) * 0.0625
        o_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("variant", "fat", "par"))
def qmm_probe(x, w_tiled, layer_idx, variant="cp2", fat=False, par=False):
    Lx, IN = x.shape
    xq = jnp.clip(jnp.round(x), -127, 127).astype(jnp.int8)
    xq = jax.lax.optimization_barrier(xq)
    # par: mark the tile grid megacore-parallel — v5e has 2 cores and a
    # sequential ("arbitrary") grid runs on ONE of them; output tiles are
    # independent so the split is legal.
    kw = {}
    if fat:
        kw["vmem_limit_bytes"] = VMEM_FAT
    if par:
        kw["dimension_semantics"] = ("parallel",)
    params = pltpu.CompilerParams(**kw) if kw else None
    if variant in ("dma2", "cp2x2", "onedot2"):
        # Split tiles into two independent streams (even/odd halves).
        NLx, T, _, TO = w_tiled.shape
        Th = T // 2
        wa = w_tiled[:, :Th]
        wb = w_tiled[:, Th:]
        kern = functools.partial(_kernel2, variant=variant)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Th,),
            in_specs=[
                pl.BlockSpec((Lx, IN), lambda j, idx: (0, 0)),
                pl.BlockSpec(
                    (1, 1, IN, TO), lambda j, idx: (idx[0], j, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, IN, TO), lambda j, idx: (idx[0], j, 0, 0)
                ),
            ],
            out_specs=[
                pl.BlockSpec((Lx, TO), lambda j, idx: (0, j)),
                pl.BlockSpec((Lx, TO), lambda j, idx: (0, j)),
            ],
        )
        ya, yb = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((Lx, Th * TO), jnp.float32),
                jax.ShapeDtypeStruct((Lx, Th * TO), jnp.float32),
            ],
            compiler_params=params,
        )(jnp.asarray([layer_idx], jnp.int32), xq, wa, wb)
        return jnp.concatenate([ya, yb], axis=-1)
    NLx, T, _, TO = w_tiled.shape
    kern = functools.partial(_kernel, variant=variant)
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
        compiler_params=params,
    )(jnp.asarray([layer_idx], jnp.int32), xq, w_tiled)


def build(fat):
    rng = np.random.default_rng(0)
    budget = 14_000_000 if fat else 3_700_000
    out = []
    for IN, OUTc in SHAPES:
        TO = pick_tile(IN, OUTc, budget)
        T = OUTc // TO
        w = rng.integers(-128, 128, (NL, T, IN, TO), dtype=np.int8)
        out.append(jnp.asarray(w))
        print(f"  shape ({IN},{OUTc}): TO={TO} T={T} "
              f"block={IN*TO/1e6:.2f}MB", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="cp2",
                    choices=["dma", "onedot", "cp2",
                             "dma2", "onedot2", "cp2x2"])
    ap.add_argument("--fat", action="store_true")
    ap.add_argument("--parallel", action="store_true",
                    help="dimension_semantics=('parallel',): split the "
                    "tile grid across the v5e's 2 megacores")
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}  variant={args.variant} "
          f"fat={args.fat} parallel={args.parallel}", flush=True)
    stacks = build(args.fat)
    Lp = 8

    def run(ws, x0):
        def body(x, i):
            h = x
            for w, (IN, OUTc) in zip(ws, SHAPES):
                y = qmm_probe(h[:, :IN], w, i % NL, variant=args.variant,
                              fat=args.fat, par=args.parallel)
                h = h + jnp.pad(
                    y[:, : min(D, y.shape[1])].astype(jnp.bfloat16),
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
        f"{args.variant} fat={args.fat}: {t*1e3:8.3f} ms/token "
        f"({t/NL*1e6:7.1f} us/layer, {gb/t:.2f} GB/s effective)",
        flush=True,
    )


if __name__ == "__main__":
    main()
