#!/usr/bin/env python
"""Collect bench JSON lines from a TPU batch's logs into one sweep file.

The r3 batches ran bench.py per-leg with logs under results/tpu_batch_r*/;
this pulls every successful `{"metric": ...}` line out of those logs so
charts/bench_perf.py --from_json can plot the measured sweep without
re-claiming the chip (reference counterpart hard-codes its numbers,
charts/blogpost_perf.py).

Usage: python charts/collect_batch_rows.py results/tpu_batch_r4 \
           [--out charts/bench_sweep.json]
"""

import argparse
import json
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log_dir", type=Path)
    ap.add_argument("--out", type=Path,
                    default=Path("charts/bench_sweep.json"))
    args = ap.parse_args()

    rows, seen = [], set()
    for log in sorted(args.log_dir.glob("*.log")):
        if any(t in log.stem for t in ("driver", "summary", "ping")):
            continue  # aggregated copies of per-leg lines
        for line in log.read_text().splitlines()[::-1]:
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            if row.get("metric") != "decode_toks_per_sec":
                continue
            if row.get("error") or not row.get("value"):
                break  # failed leg: nothing to collect
            cfg = row.get("config", {})
            key = (
                cfg.get("model"), cfg.get("strategy"), cfg.get("context"),
                cfg.get("cache_bits"), cfg.get("batch"),
                cfg.get("budget_frac"),
            )
            if key not in seen:  # later logs win (sorted order = reruns)
                seen.add(key)
                row["_leg"] = log.stem
                rows.append(row)
            break
    rows.sort(key=lambda r: (str(r["config"].get("strategy")),
                             r["config"].get("context") or 0))
    args.out.write_text(json.dumps(rows, indent=2))
    print(f"Wrote {args.out} ({len(rows)} rows)")
    for r in rows:
        c = r["config"]
        print(f"  {r['_leg']:16s} {c.get('strategy'):14s} ctx={c.get('context')} "
              f"kv={c.get('cache_bits')} b={c.get('batch')} "
              f"frac={c.get('budget_frac')} -> {r['value']} tok/s")


if __name__ == "__main__":
    main()
