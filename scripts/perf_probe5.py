"""Probe: row-packed 3-dot W4A8 kernel vs column-packed 2-dot (colpack).

Times a scan over the 32 fused Llama-3-8B decode matmul shapes
(wqkv, wo, w13, w2) at L=1 in both layouts. Identical bytes streamed; the
colpack kernel does 2 int8 dots over OUT/2 per tile instead of 3 over IN/2
(= 1.5x fewer MXU passes), and at L=1 its block-diagonal operand needs one
row per group instead of eight.

Methodology (see scripts/perf_probe3.py): all REPEATS token-steps live
inside ONE program with a carried data dependency; stacks ride as jit
arguments; completion barrier is a host transfer.

Run on TPU: python scripts/perf_probe5.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from cold_compress_tpu.ops.pallas_qmm import (  # noqa: E402
    qmm_w4a8_cp_stacked,
    qmm_w4a8_stacked,
)

NL, D, F = 32, 4096, 14336
GS = 128
SHAPES = [(D, 6144), (D, D), (D, 2 * F), (F, D)]
REPEATS = 64
L = 1


def build(kind):
    rng = np.random.default_rng(0)
    out = []
    for IN, OUT in SHAPES:
        if kind == "row":
            w = rng.integers(-128, 128, (NL, IN // 2, OUT), dtype=np.int64)
            s = np.full((NL, IN // GS, OUT), 0.01)
            z = np.zeros((NL, IN // GS, OUT))
        else:
            w = rng.integers(-128, 128, (NL, IN, OUT // 2), dtype=np.int64)
            s = np.full((NL, 2, IN // GS, OUT // 2), 0.01)
            z = np.zeros((NL, 2, IN // GS, OUT // 2))
        out.append(
            (
                jnp.asarray(w.astype(np.int8)),
                jnp.asarray(s, jnp.bfloat16),
                jnp.asarray(z, jnp.bfloat16),
            )
        )
    return out


def make_run(fn):
    def run(stacks, x0):
        def body(x, i):
            h = x
            for (w, s, z), (IN, OUT) in zip(stacks, SHAPES):
                y = fn(h[:, :IN], w, s, z, i % NL, group_size=GS)
                h = h + jnp.pad(
                    y[:, :D].astype(jnp.bfloat16),
                    ((0, 0), (0, h.shape[1] - min(D, OUT))),
                )[:, : h.shape[1]] * 1e-6
            return h, ()

        x, _ = jax.lax.scan(body, x0, jnp.arange(NL * REPEATS))
        return x

    return jax.jit(run)


def timeit(fn, stacks, x0s):
    np.asarray(fn(stacks, x0s[0]))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(fn(stacks, x0s[1]))
    return (time.perf_counter() - t0) / REPEATS


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    x0s = [
        jnp.asarray(
            np.random.default_rng(i).normal(size=(L, F)).astype(np.float32)
        )
        for i in range(2)
    ]
    for name, kind, fn in [
        ("rowpack 3-dot", "row", qmm_w4a8_stacked),
        ("colpack 2-dot", "col", qmm_w4a8_cp_stacked),
    ]:
        stacks = build(kind)
        t = timeit(make_run(fn), stacks, x0s)
        per_layer = t / NL
        print(
            f"{name}: {t*1e3:8.3f} ms/token  ({per_layer*1e6:7.1f} us/layer)",
            flush=True,
        )


if __name__ == "__main__":
    main()
