"""De-risk the TP decode kernels on ONE chip: Mosaic-compile and run the
exact per-shard weight layouts `parallel/tp_decode.py` generates.

Multi-chip hardware isn't available, so the TP path has only ever run on the
virtual CPU mesh / interpret mode — and rounds 1-2 proved twice that
interpret mode does not catch Mosaic block-shape violations. The per-shard
programs, however, are plain single-device kernels: column-parallel shards
are colpack repacks at OUT/tp, row-parallel shards slice IN/tp, the head
shards tile vocab/tp. This script builds every distinct shard leaf at real
Llama-3-8B dimensions via tp_decode's own _col_local/_row_local/_head_local,
pushes each through ops.linear.linear (the production dispatch), and checks
parity against the XLA dequant matmul.

Also covers the cpt repack of each eligible shard (to_cpt) — the layout the
single-chip path now defaults to — so enabling cpt under TP later is
pre-validated.

Run on TPU:  python scripts/tp_shard_compile.py [--tp 2 4 8]
Exit code 0 = every leg compiled, ran, and matched.
"""

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from cold_compress_tpu.ops.linear import (
    dequantize_weight,
    linear,
    to_cpt,
    to_tiled_int8,
)
from cold_compress_tpu.ops.pallas_qmm import (
    w4a8_cp_supported,
    w4a8_cpt2_supported,
    w4a8_cpt_supported,
    w8a8_tiled_supported,
)
from cold_compress_tpu.parallel.tp_decode import (
    _col_local,
    _head_local,
    _row_local,
)
from cold_compress_tpu.quantization.weight_quant import (
    quantize_weight_int4,
    quantize_weight_int8,
)

D, F, V = 4096, 14336, 128256
# (name, IN, OUT, kind): the distinct Llama-3-8B projection shapes.
PROJS = [
    ("wq", D, D, "col"),
    ("wk", D, 1024, "col"),
    ("w1", D, F, "col"),
    ("wo", D, D, "row"),
    ("w2", F, D, "row"),
]
L = 8  # decode rows (padded batch lane count)


def check(label, leaf, x, supported, failures):
    """Run linear() on the shard leaf; compare to the XLA dequant matmul."""
    path = "kernel" if supported else "xla-fallback"
    try:
        y = np.asarray(linear(x, leaf)).astype(np.float64)
        ref = np.asarray(
            x.astype(jnp.float32)
            @ dequantize_weight(leaf, jnp.float32)
        ).astype(np.float64)
        scale = max(np.abs(ref).max(), 1e-6)
        err = np.abs(y - ref).max() / scale
        ok = err < 0.05  # int8 activation quantization noise
        print(f"  {label:34s} [{path:12s}] rel_err={err:.4f} "
              f"{'ok' if ok else 'FAIL'}", flush=True)
        if not ok:
            failures.append((label, f"rel_err={err:.4f}"))
    except Exception as e:  # noqa: BLE001 — report and continue the sweep
        print(f"  {label:34s} [{path:12s}] ERROR {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        failures.append((label, str(e)[:200]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tp", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument("--cpu", action="store_true",
                    help="plumbing check on CPU (xla-fallback paths only; "
                    "does NOT touch the chip another process may hold)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    failures = []

    # Storage-layout leaves once per projection (rowpack int4).
    leaves = {}
    for name, IN, OUT, kind in PROJS:
        leaves[name] = (
            quantize_weight_int4(
                rng.normal(size=(IN, OUT)).astype(np.float32) * 0.02
            ),
            IN, OUT, kind,
        )
    head_f = rng.normal(size=(D, V)).astype(np.float32) * 0.02
    head4 = quantize_weight_int4(head_f)
    head8 = quantize_weight_int8(head_f)

    for tp in args.tp:
        print(f"=== tp={tp}", flush=True)
        for name, (leaf, IN, OUT, kind) in leaves.items():
            shard = (
                _col_local(leaf, 0, tp)
                if kind == "col"
                else _row_local(leaf, 0, tp)
            )
            x = jnp.asarray(
                rng.normal(size=(L, shard.w.shape[-2])).astype(np.float32),
                jnp.bfloat16,
            )
            sup = w4a8_cp_supported(x.shape, shard)
            check(f"{name} {kind} {tuple(shard.w.shape)}", shard, x,
                  sup, failures)
            # cpt repack of the same shard (future TP default).
            try:
                cpt = to_cpt(shard)
            except AssertionError as e:
                print(f"  {name} cpt: repack unsupported ({e})", flush=True)
                continue
            sup = w4a8_cpt2_supported(x.shape, cpt)
            check(f"{name} cpt {tuple(cpt.w.shape)}", cpt, x, sup, failures)

        xh = jnp.asarray(
            rng.normal(size=(L, D)).astype(np.float32), jnp.bfloat16
        )
        h4 = _head_local(head4, 0, tp)  # colpack_tiled under tiled default
        sup = (
            w4a8_cpt_supported(xh.shape, h4)
            if h4.layout == "colpack_tiled"
            else w4a8_cp_supported(xh.shape, h4)
        )
        check(f"head int4 {h4.layout} {tuple(h4.w.shape)}", h4, xh,
              sup, failures)
        h8 = _head_local(head8, 0, tp)
        if h8.layout != "tiled8":
            h8 = to_tiled_int8(h8)
        sup = w8a8_tiled_supported(xh.shape, h8)
        check(f"head int8 {h8.layout} {tuple(h8.w.shape)}", h8, xh,
              sup, failures)

    if failures:
        print(f"{len(failures)} FAILURES:")
        for label, msg in failures:
            print(f"  {label}: {msg}")
        sys.exit(1)
    print("all shard layouts compiled + matched", flush=True)


if __name__ == "__main__":
    main()
