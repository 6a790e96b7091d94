#!/usr/bin/env python
"""Plot decode throughput vs context length for full vs compressed caches.

Counterpart of the reference's blog-post perf chart (reference:
charts/blogpost_perf.py, which hard-codes its published numbers). This one
runs bench.py across contexts/strategies and plots the measured results; pass
--from_json to plot a previously saved sweep instead.
"""

import argparse
import json
import subprocess
import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def run_sweep(contexts, strategies, weight_bits):
    rows = []
    for ctx in contexts:
        for strat in strategies:
            cmd = [
                sys.executable, "bench.py", "--context", str(ctx),
                "--strategy", strat, "--weight_bits", str(weight_bits),
                "--decode_tokens", "128",
            ]
            out = subprocess.run(cmd, capture_output=True, text=True)
            for line in out.stdout.splitlines()[::-1]:
                try:
                    rows.append(json.loads(line))
                    break
                except json.JSONDecodeError:
                    continue
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--contexts", nargs="+", type=int,
                    default=[2048, 4096, 8192])
    ap.add_argument("--strategies", nargs="+",
                    default=["full", "heavy_hitter"])
    ap.add_argument("--weight_bits", type=int, default=8)
    ap.add_argument("--from_json", type=Path, default=None)
    ap.add_argument("--save_json", type=Path,
                    default=Path("charts/bench_sweep.json"))
    ap.add_argument("--out", type=Path, default=Path("charts/bench_perf.png"))
    args = ap.parse_args()

    if args.from_json:
        rows = json.loads(args.from_json.read_text())
    else:
        rows = run_sweep(args.contexts, args.strategies, args.weight_bits)
        args.save_json.write_text(json.dumps(rows, indent=2))

    plt.figure(figsize=(6, 4))
    for strat in sorted({r["config"]["strategy"] for r in rows}):
        pts = sorted(
            (r["config"]["context"], r["value"])
            for r in rows
            if r["config"]["strategy"] == strat
        )
        plt.plot(*zip(*pts), "o-", label=strat)
    plt.axhline(70, color="gray", ls="--", label="reference (A100, compiled)")
    plt.xlabel("Context length")
    plt.ylabel("Decode tokens/sec")
    plt.legend()
    plt.grid(alpha=0.3)
    plt.tight_layout()
    plt.savefig(args.out, dpi=150)
    print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
