#!/usr/bin/env python
"""Plot per-step attention loss of debug_* runs vs compression ratio.

Counterpart of the reference's analysis chart (reference:
charts/attention_loss.py): reads ``results/**/pg19_metrics.json`` (or any
task metrics containing ``attention_loss``) produced by eval.py with a
``debug_<strategy>`` cache and draws loss-vs-budget curves.
"""

import argparse
import json
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def collect(results_root: Path, task: str):
    rows = []
    for fn in results_root.rglob(f"{task}_metrics.json"):
        data = json.loads(fn.read_text())
        loss_keys = [k for k in data if k.startswith("attention_loss")]
        if not loss_keys:
            continue
        run = fn.parent.name
        budget = None
        for part in run.split("__"):
            if part.startswith("max_cache_length="):
                budget = part.split("=", 1)[1]
        rows.append(
            {
                "run": run,
                "budget": budget,
                "attention_loss": data.get("attention_loss_avg")
                or data.get("attention_loss"),
                "compression": data.get("compression_ratio_avg"),
            }
        )
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", type=Path, default=Path("results"))
    ap.add_argument("--task", default="pg19")
    ap.add_argument("--out", type=Path, default=Path("charts/attention_loss.png"))
    args = ap.parse_args()

    rows = [r for r in collect(args.results, args.task) if r["attention_loss"]]
    if not rows:
        print("No attention_loss results found; run eval.py with a debug_* "
              "cache strategy first.")
        return
    rows.sort(key=lambda r: r["compression"] or 0)
    xs = [r["compression"] for r in rows]
    ys = [r["attention_loss"] for r in rows]
    plt.figure(figsize=(6, 4))
    plt.plot(xs, ys, "o-")
    plt.xlabel("Compression ratio")
    plt.ylabel("Attention loss (1 - recovered mass)")
    plt.title(f"Attention loss vs compression ({args.task})")
    plt.grid(alpha=0.3)
    plt.tight_layout()
    plt.savefig(args.out, dpi=150)
    print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
