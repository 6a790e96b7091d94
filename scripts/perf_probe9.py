"""Probe: does fusing a layer's 4 weight streams into ONE Pallas program
beat 4 separate pallas_calls?

perf_probe8 decomposes the per-grid-step cost (DMA floor, dot serialization,
tile size). This probe tests the remaining hypothesis: per-PROGRAM cost —
each pallas_call boundary drains and refills the DMA pipeline, and the
decode layer pays 4 boundaries (wqkv, wo, w13, w2). One program whose grid
walks all four weight stacks back-to-back keeps a single continuous
pipeline.

Mechanics: 4 weight inputs with phase-clamped index maps. During steps
outside a weight's phase its block index is held constant, so Mosaic
issues no new DMA for it (revisiting semantics); `pl.when` guards compute
and stores. Activations are full-block constant-index inputs.

If `mega` sustains materially higher effective GB/s than `sep`, the
round-3 integration is a per-layer megakernel (attention stays a separate
program; the dependency chain wqkv->attn->wo splits the layer anyway, but
wo+w13 and w13+w2 fusions follow the same recipe).

Run on TPU:  python scripts/perf_probe9.py --variant {sep,mega}
CPU parity:  python scripts/perf_probe9.py --check   (interpret mode)
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
# (IN, OUT_colpacked): the 4 fused Llama-3-8B decode projections (colpack
# halves the output axis; see ops/pallas_qmm.py).
SHAPES = [(D, 6144 // 2), (D, D // 2), (D, 2 * F // 2), (F, D // 2)]
REPEATS = 64
BUDGET = 3_700_000  # default tile budget (matches the production kernel)


def pick_tile(IN, OUTc, budget=BUDGET):
    for cand in (4096, 2048, 1024, 512, 256, 128):
        if OUTc % cand == 0 and IN * cand <= budget:
            return cand
    return 128


TILES = [pick_tile(IN, OUTc) for IN, OUTc in SHAPES]
TCOUNTS = [OUTc // to for (_, OUTc), to in zip(SHAPES, TILES)]
STARTS = [sum(TCOUNTS[:i]) for i in range(len(TCOUNTS))]
GRID = sum(TCOUNTS)


def _cp2(x, b):
    d1 = jnp.dot(x, b, preferred_element_type=jnp.int32)
    lo = b & 0xF
    d2 = jnp.dot(x, lo, preferred_element_type=jnp.int32)
    return d1.astype(jnp.float32) + d2.astype(jnp.float32) * 0.0625


def _kernel_sep(idx_ref, x_ref, w_ref, o_ref):
    o_ref[...] = _cp2(x_ref[...], w_ref[0, 0])


def _kernel_mega(idx_ref, x_ref, x2_ref, w0_ref, w1_ref, w2_ref, w3_ref,
                 o0_ref, o1_ref, o2_ref, o3_ref):
    j = pl.program_id(0)
    ws = (w0_ref, w1_ref, w2_ref, w3_ref)
    os_ = (o0_ref, o1_ref, o2_ref, o3_ref)
    for p in range(4):
        start, cnt = STARTS[p], TCOUNTS[p]
        xr = x2_ref if SHAPES[p][0] == F else x_ref

        @pl.when(jnp.logical_and(j >= start, j < start + cnt))
        def _(p=p, xr=xr):
            os_[p][...] = _cp2(xr[...], ws[p][0, 0])


def _clamped(start, cnt):
    # Hold the block index at the phase edge outside [start, start+cnt):
    # same index as the previous step => Mosaic skips the DMA.
    def imap(j, idx):
        t = jnp.clip(j - start, 0, cnt - 1)
        return (idx[0], t, 0, 0)

    return imap


def _clamped_out(start, cnt):
    def imap(j, idx):
        return (0, jnp.clip(j - start, 0, cnt - 1))

    return imap


@functools.partial(jax.jit, static_argnames=("interpret",))
def layer_sep(x, x2, stacks, layer_idx, interpret=False):
    """4 separate pallas_calls (the production structure)."""
    outs = []
    for p, w in enumerate(stacks):
        IN, OUTc = SHAPES[p]
        TO, T = TILES[p], TCOUNTS[p]
        xr = x2 if IN == F else x
        xq = jnp.clip(jnp.round(xr), -127, 127).astype(jnp.int8)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((xq.shape[0], IN), lambda j, idx: (0, 0)),
                pl.BlockSpec(
                    (1, 1, IN, TO), lambda j, idx: (idx[0], j, 0, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (xq.shape[0], TO), lambda j, idx: (0, j)
            ),
        )
        outs.append(
            pl.pallas_call(
                _kernel_sep,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(
                    (xq.shape[0], OUTc), jnp.float32
                ),
                interpret=interpret,
            )(jnp.asarray([layer_idx], jnp.int32), xq, w)
        )
    return outs


@functools.partial(jax.jit, static_argnames=("interpret",))
def layer_mega(x, x2, stacks, layer_idx, interpret=False):
    """All 4 weight streams in ONE program, phases back-to-back."""
    Lp = x.shape[0]
    xq = jnp.clip(jnp.round(x), -127, 127).astype(jnp.int8)
    x2q = jnp.clip(jnp.round(x2), -127, 127).astype(jnp.int8)
    in_specs = [
        pl.BlockSpec((Lp, D), lambda j, idx: (0, 0)),
        pl.BlockSpec((Lp, F), lambda j, idx: (0, 0)),
    ]
    for p, (IN, _) in enumerate(SHAPES):
        in_specs.append(
            pl.BlockSpec(
                (1, 1, IN, TILES[p]), _clamped(STARTS[p], TCOUNTS[p])
            )
        )
    out_specs = [
        pl.BlockSpec((Lp, TILES[p]), _clamped_out(STARTS[p], TCOUNTS[p]))
        for p in range(4)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(GRID,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    # All 4 operand streams' blocks are live at once (phase-clamped index
    # maps still allocate each operand's double-buffer): ~2 * (3 * 2.1 MB
    # + 3.67 MB) ≈ 20 MB of scoped vmem — above Mosaic's 16 MB default
    # (the r3 batch OOM). Raise the limit explicitly.
    params = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
    return pl.pallas_call(
        _kernel_mega,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Lp, OUTc), jnp.float32)
            for _, OUTc in SHAPES
        ],
        compiler_params=params,
        interpret=interpret,
    )(jnp.asarray([layer_idx], jnp.int32), xq, x2q, *stacks)


def build():
    rng = np.random.default_rng(0)
    out = []
    for p, (IN, OUTc) in enumerate(SHAPES):
        TO, T = TILES[p], TCOUNTS[p]
        w = rng.integers(-128, 128, (NL, T, IN, TO), dtype=np.int8)
        out.append(jnp.asarray(w))
        print(f"  shape ({IN},{OUTc}): TO={TO} T={T} "
              f"block={IN*TO/1e6:.2f}MB", flush=True)
    print(f"  mega grid: {GRID} steps, phase starts {STARTS}", flush=True)
    return out


def check_parity():
    """Interpret-mode: mega must produce exactly sep's outputs."""
    jax.config.update("jax_platforms", "cpu")
    global NL
    NL = 2
    stacks = build()
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(8, D)).astype(np.float32)) * 3
    x2 = jnp.asarray(rng.normal(size=(8, F)).astype(np.float32)) * 3
    a = layer_sep(x, x2, stacks, 1, interpret=True)
    b = layer_mega(x, x2, stacks, 1, interpret=True)
    for p, (ya, yb) in enumerate(zip(a, b)):
        np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))
        print(f"  phase {p}: parity ok {ya.shape}")
    print("mega == sep (interpret)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="mega", choices=["sep", "mega"])
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    if args.check:
        check_parity()
        return
    print(f"backend: {jax.default_backend()}  variant={args.variant}",
          flush=True)
    stacks = build()
    fn = layer_sep if args.variant == "sep" else layer_mega

    def run(stacks, x0, x20):
        def body(carry, i):
            x, x2 = carry
            outs = fn(x, x2, stacks, i % NL)
            # Thread a dependency through both activations so layers
            # serialize like the real model (cheap VPU work only). EVERY
            # output must be consumed: an unused pallas_call result is
            # dead code and XLA deletes the whole kernel — the r3 batch's
            # "sep 910 GB/s" was exactly this artifact (2 of 4 streams
            # DCE'd). Output widths are colpack-halved, so clamp.
            w1 = min(D, outs[1].shape[1])
            w3 = min(D, outs[3].shape[1])
            x = x.at[:, :w1].add(outs[1][:, :w1].astype(jnp.float32) * 1e-6)
            x = x.at[:, 0].add(
                (jnp.sum(outs[0], axis=1) + jnp.sum(outs[2], axis=1)) * 1e-9
            )
            x2 = x2.at[:, :w3].add(outs[3][:, :w3].astype(jnp.float32) * 1e-6)
            return (x, x2), ()

        (x, x2), _ = jax.lax.scan(body, (x0, x20), jnp.arange(NL * REPEATS))
        return x, x2

    runj = jax.jit(run)
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.normal(size=(8, D)).astype(np.float32))
    x20 = jnp.asarray(rng.normal(size=(8, F)).astype(np.float32))
    np.asarray(runj(stacks, x0, x20)[0])
    rng = np.random.default_rng(4)
    x0 = jnp.asarray(rng.normal(size=(8, D)).astype(np.float32))
    x20 = jnp.asarray(rng.normal(size=(8, F)).astype(np.float32))
    t0 = time.perf_counter()
    np.asarray(runj(stacks, x0, x20)[0])
    t = (time.perf_counter() - t0) / REPEATS
    gb = sum(w.size for w in stacks) / 1e9
    print(
        f"{args.variant}: {t*1e3:8.3f} ms/token "
        f"({t/NL*1e6:7.1f} us/layer, {gb/t:.2f} GB/s effective)",
        flush=True,
    )


if __name__ == "__main__":
    main()
