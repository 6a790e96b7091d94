"""Probe: (a) tile-major (contiguous-DMA) colpack weight storage,
(b) pure grid-step overhead.

Hypothesis from perf_probe5: the W4A8 decode kernel is step/DMA-bound, not
MXU-bound (rowpack 9.0 ms vs colpack 8.2 ms despite 1.5x less MXU work;
effective stream ~390 GB/s vs the ~1.7 TB/s this part sustains). The flat
layout's [IN, TOh] blocks are STRIDED in HBM (TOh-byte rows, stride OUTh).
Tile-major storage [NL, T, IN, TOh] makes each block one contiguous span.

Run on TPU: python scripts/perf_probe6.py [--tile big]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from cold_compress_tpu.ops.pallas_qmm import (  # noqa: E402
    _pick_tile_out_cp,
    qmm_w4a8_cp_stacked,
)

NL, D, F = 32, 4096, 14336
GS = 128
SHAPES = [(D, 6144), (D, D), (D, 2 * F), (F, D)]
REPEATS = 64
L = 1


def build_tiled(big):
    rng = np.random.default_rng(0)
    out = []
    for IN, OUT in SHAPES:
        OUTh = OUT // 2
        TOh = _pick_tile_out_cp(IN, OUTh)
        if big:
            for cand in (2048, 1024, 512, 256):
                if OUTh % cand == 0 and IN * cand <= 7_400_000:
                    TOh = cand
                    break
        T = OUTh // TOh
        w = rng.integers(-128, 128, (NL, T, IN, TOh), dtype=np.int64)
        s = np.full((NL, 2, IN // GS, OUTh), 0.01)
        z = np.zeros((NL, 2, IN // GS, OUTh))
        out.append(
            (
                jnp.asarray(w.astype(np.int8)),
                jnp.asarray(s, jnp.bfloat16),
                jnp.asarray(z, jnp.bfloat16),
            )
        )
    return out


def make_run():
    def run(stacks, x0):
        def body(x, i):
            h = x
            for (w, s, z), (IN, OUT) in zip(stacks, SHAPES):
                y = qmm_w4a8_cp_stacked(
                    h[:, :IN], w, s, z, i % NL, group_size=GS
                )
                h = h + jnp.pad(
                    y[:, :D].astype(jnp.bfloat16),
                    ((0, 0), (0, h.shape[1] - min(D, OUT))),
                )[:, : h.shape[1]] * 1e-6
            return h, ()

        x, _ = jax.lax.scan(body, x0, jnp.arange(NL * REPEATS))
        return x

    return jax.jit(run)


def step_overhead_probe():
    """N-step grid over a tiny block: measures fixed per-step cost."""

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 1.0

    def run_steps(n, x):
        f = pl.pallas_call(
            kern,
            grid=(n,),
            in_specs=[pl.BlockSpec((8, 128), lambda j: (0, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda j: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )

        def body(h, _):
            return f(h) + 1e-6, ()

        return jax.jit(
            lambda x0: jax.lax.scan(body, x0, jnp.arange(REPEATS))[0]
        )(x)

    xs = [
        jnp.asarray(np.random.default_rng(i).normal(size=(8, 128)),
                    jnp.float32)
        for i in range(2)
    ]
    times = {}
    for n in (16, 256):
        np.asarray(run_steps(n, xs[0]))
        t0 = time.perf_counter()
        np.asarray(run_steps(n, xs[1]))
        times[n] = (time.perf_counter() - t0) / REPEATS
    per_step = (times[256] - times[16]) / (256 - 16)
    print(
        f"grid-step overhead: {per_step*1e6:.2f} us/step "
        f"(16 steps {times[16]*1e6:.1f} us, 256 steps {times[256]*1e6:.1f} us)",
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", default="default", choices=["default", "big"])
    ap.add_argument("--steps_probe", action="store_true")
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}", flush=True)
    if args.steps_probe:
        step_overhead_probe()
        return
    x0s = [
        jnp.asarray(
            np.random.default_rng(i).normal(size=(L, F)).astype(np.float32)
        )
        for i in range(2)
    ]
    stacks = build_tiled(args.tile == "big")
    fn = make_run()
    np.asarray(fn(stacks, x0s[0]))
    t0 = time.perf_counter()
    np.asarray(fn(stacks, x0s[1]))
    t = (time.perf_counter() - t0) / REPEATS
    print(
        f"colpack tiled ({args.tile}): {t*1e3:8.3f} ms/token "
        f"({t/NL*1e6:7.1f} us/layer)",
        flush=True,
    )


if __name__ == "__main__":
    main()
