"""Probe: honest per-layer rates of the PRODUCTION decode weight kernels.

perf_probe9's `sep` leg timed bare probe kernels and (as first run) let XLA
dead-code-eliminate 2 of the 4 streams — its number was fiction. This probe
times the real entry points (`qmm_w4a8_cp_stacked` flat colpack = today's
default, `qmm_w4a8_cpt` = the contiguous-tile + fused-sidecar layout) on the
exact Llama-3-8B decode shapes, 4 projections back-to-back per layer inside
one jitted scan, with EVERY output folded into the carry so nothing is DCE'd.

This includes everything the model pays per projection: row quantization,
block-diagonal activation build, the kernel, output scale-back. The delta
vs perf_probe8's bare-stream numbers (631 GB/s dma / 573 GB/s cp2 on the w2
shape) is the per-call overhead the integration must attack.

Run on TPU:  python scripts/perf_probe11.py --variant {v3,cpt}
             P11_REPEATS=32 P11_NL=32 override the defaults.
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from cold_compress_tpu.ops.pallas_qmm import (
    _pick_tile_out_cp,
    qmm_w4a8_cp_stacked,
    qmm_w4a8_cpt,
)

NL = int(os.environ.get("P11_NL", "32"))
REPEATS = int(os.environ.get("P11_REPEATS", "32"))
D, F = 4096, 14336
GS = 128
# (IN, OUTh): fused Llama-3-8B decode projections, colpack-halved outputs.
SHAPES = [(D, 6144 // 2), (D, D // 2), (D, 2 * F // 2), (F, D // 2)]
PACKED_GB = sum(IN * OUTh for IN, OUTh in SHAPES) * NL / 1e9


def build(variant, rng):
    """Per-projection stacks in the requested layout (random bytes —
    bandwidth doesn't care about values)."""
    stacks = []
    for IN, OUTh in SHAPES:
        ngf = IN // GS
        w = jnp.asarray(
            rng.integers(-128, 128, (NL, IN, OUTh), dtype=np.int8)
        )
        s = jnp.asarray(
            rng.uniform(0.005, 0.02, (NL, 2, ngf, OUTh)).astype(np.float32)
        ).astype(jnp.bfloat16)
        z = jnp.asarray(
            rng.uniform(-0.1, 0.1, (NL, 2, ngf, OUTh)).astype(np.float32)
        ).astype(jnp.bfloat16)
        if variant == "cpt":
            TOh = _pick_tile_out_cp(IN, OUTh)
            T = OUTh // TOh
            wt = w.reshape(NL, IN, T, TOh).transpose(0, 2, 1, 3)
            sf, zf = s.astype(jnp.float32), z.astype(jnp.float32)
            meta = jnp.concatenate(
                [sf[:, 0], sf[:, 1], zf[:, 0] - 8.0 * sf[:, 0], zf[:, 1]],
                axis=1,
            ).astype(jnp.bfloat16)
            mt = meta.reshape(NL, 4 * ngf, T, TOh).transpose(0, 2, 1, 3)
            stacks.append((jax.device_put(wt), jax.device_put(mt)))
        else:
            stacks.append(
                (jax.device_put(w), jax.device_put(s), jax.device_put(z))
            )
        print(f"  ({IN},{OUTh}) {variant}: {IN*OUTh*NL/1e9:.2f} GB packed",
              flush=True)
    return stacks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="cpt", choices=["v3", "cpt"])
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()} variant={args.variant} "
          f"NL={NL} packed={PACKED_GB:.2f} GB", flush=True)
    rng = np.random.default_rng(0)
    stacks = build(args.variant, rng)

    def proj(stacks, p, x, li):
        if args.variant == "cpt":
            w, m = stacks[p]
            return qmm_w4a8_cpt(
                x, w, m, li, group_size=GS, interpret=args.interpret
            )
        w, s, z = stacks[p]
        return qmm_w4a8_cp_stacked(
            x, w, s, z, li, group_size=GS, interpret=args.interpret
        )

    # Stacks ride as ARGUMENTS: a closure would bake 3.7 GB of weights into
    # the jitted program as captured constants (compile-time copy, the r3
    # batch's p11 timeout).
    def run(stacks, x0, x20):
        def body(carry, i):
            x, x2 = carry
            li = i % NL
            y0 = proj(stacks, 0, x, li)       # wqkv  [L, 6144]
            y1 = proj(stacks, 1, x, li)       # wo    [L, 4096]
            y2 = proj(stacks, 2, x, li)       # w13   [L, 28672]
            y3 = proj(stacks, 3, x2, li)      # w2    [L, 4096]
            # Consume every output (DCE guard) and serialize layers.
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
            f"({t/NL*1e6:7.1f} us/layer, {PACKED_GB/t:.2f} GB/s effective)",
            flush=True,
        )


if __name__ == "__main__":
    main()
