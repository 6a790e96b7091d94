"""Probe: is decode weight-streaming dispatch-bound?

Times a scan over 32 layers of the real Llama-3-8B decode matmul shapes in
two arrangements with identical total bytes/FLOPs:

  A (current): wq, wk, wv, wo, w1, w3, w2  -> 7 pallas calls/layer
  B (fused):   wqkv, wo, w13, w2           -> 4 pallas calls/layer

If B is materially faster, per-call overhead matters and the fused stacked
layout is worth wiring into the model. Inputs vary per step (identical
repeated calls coalesce on this backend and time as fake).

Run on TPU: python scripts/perf_probe3.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from cold_compress_tpu.ops.pallas_qmm import qmm_w4a8_stacked  # noqa: E402

NL, D, HD, KVD, F = 32, 4096, 4096, 1024, 14336
GS = 128


def mk_stack(rng, IN, OUT):
    # Random packed bytes are fine — the probe times streaming, not math.
    w = jnp.asarray(
        rng.integers(-128, 128, (NL, IN // 2, OUT), dtype=np.int64).astype(
            np.int8
        )
    )
    s = jnp.full((NL, IN // GS, OUT), 0.01, jnp.bfloat16)
    z = jnp.zeros((NL, IN // GS, OUT), jnp.bfloat16)
    return w, s, z


def build(shapes):
    rng = np.random.default_rng(0)
    return [mk_stack(rng, i, o) for i, o in shapes]


REPEATS = 64


def make_run(shapes):
    # Stacks are jit ARGUMENTS (not closed-over constants) so the remote
    # compiler does not have to ingest GBs of captured weight bytes.
    # All REPEATS token-steps live INSIDE one program with a carried data
    # dependency — separate same-program calls coalesce on this backend and
    # time as fake multi-TB/s numbers even with varying inputs.
    def run(stacks, x0):
        def body(x, i):
            h = x
            for (w, s, z), (IN, OUT) in zip(stacks, shapes):
                y = qmm_w4a8_stacked(h[:, :IN], w, s, z, i % NL, group_size=GS)
                # Feed a reduced view forward so nothing is dead code.
                h = h + jnp.pad(
                    y[:, :D].astype(jnp.bfloat16),
                    ((0, 0), (0, h.shape[1] - min(D, OUT))),
                )[:, : h.shape[1]] * 1e-6
            return h, ()

        x, _ = jax.lax.scan(body, x0, jnp.arange(NL * REPEATS))
        return x

    return jax.jit(run)


def timeit(fn, stacks, x0s):
    # block_until_ready is unreliable through the axon tunnel — a host
    # transfer of the result is the only honest completion barrier.
    np.asarray(fn(stacks, x0s[0]))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(fn(stacks, x0s[1]))
    return (time.perf_counter() - t0) / REPEATS


def main():
    X = F  # widest input; slices views for smaller INs
    x0s = [
        jax.random.normal(jax.random.PRNGKey(i), (1, X), jnp.bfloat16)
        for i in range(1, 9)
    ]
    variants = {
        "A_7calls": [(D, HD), (D, KVD), (D, KVD), (D, D), (D, F), (D, F), (F, D)],
        "B_4calls": [(D, HD + 2 * KVD), (D, D), (D, 2 * F), (F, D)],
    }
    for name, shapes in variants.items():
        stacks = build(shapes)
        fn = make_run(shapes)
        dt = timeit(fn, stacks, x0s)
        gb = sum(NL * i * o / 2 for i, o in shapes) / 1e9
        print(
            f"{name}: {dt * 1e3:.3f} ms/token  "
            f"({gb:.2f} GB packed, {gb / dt:.0f} GB/s)"
        )


if __name__ == "__main__":
    main()
