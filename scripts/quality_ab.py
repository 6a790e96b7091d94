#!/usr/bin/env python
"""Quality A/B matrix on the trained TinyByteLM fixture.

Runs eval.py (the real CLI surface) over the accuracy-bearing configuration
matrix and emits one markdown table — the repo's first task metrics from
non-random weights:

  * weight precision: bf16 / int8 / int4 / int4-GPTQ   (full cache)
  * KV-cache quantization: cache_bits 16/8/4/2          (full cache)
  * compression: full vs heavy_hitter @ 25%             (bf16)

Reference claims being checked in kind (scaled down): int8/int4 KV cache is
near-lossless while int2 seriously degrades (reference README.md:150), and
compression holds task quality (reference charts/llama3_performance_graphs).

Usage: python scripts/quality_ab.py [--device cpu|tpu] [--num_samples 8]
"""

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent.resolve()
CKPT_DIR = REPO / "tests/fixtures/TinyByteLM-hf"

CONFIGS = [
    # (label, checkpoint, extra eval.py args)
    ("bf16 full", "model.npz", []),
    ("bf16 heavy_hitter@0.25", "model.npz",
     ["--cache_strategy", "heavy_hitter", "--max_cache_length", "0.25",
      "--prompt_compression_strategy", "heavy_hitter"]),
    ("bf16 recent_global@0.25", "model.npz",
     ["--cache_strategy", "recent_global", "--max_cache_length", "0.25",
      "--prompt_compression_strategy", "recent_global"]),
    ("bf16 l2@0.25", "model.npz",
     ["--cache_strategy", "l2", "--max_cache_length", "0.25",
      "--prompt_compression_strategy", "l2"]),
    ("bf16 full cache_bits=8", "model.npz", ["--cache_bits", "8"]),
    ("bf16 full cache_bits=4", "model.npz", ["--cache_bits", "4"]),
    ("bf16 full cache_bits=2", "model.npz", ["--cache_bits", "2"]),
    # int8-MXU decode-attention dots (default-on candidate): adds per-row
    # query/prob quantization on top of the kv8 cache quantization.
    ("bf16 full cache_bits=8 i8dot", "model.npz",
     ["--cache_bits", "8"], {"CCT_ATTN_I8DOT": "1"}),
    ("int8 full", "model_int8.npz", []),
    ("int4 full", "model_int4.g64.npz", []),
    # Staged prefill kernel (int8 activations x packed int4 bytes): a
    # numerics change at prefill — the ppl delta vs "int4 full" is its
    # task-quality validation (PERF.md staged-kernel table).
    ("int4 full prefill_w4a8", "model_int4.g64.npz", [],
     {"CCT_PREFILL_W4A8": "1"}),
    ("int4-gptq full", "model_int4-gptq.g64.npz", []),
]

# Strategy comparison with all attention spans inside the fixture's trained
# context (SEQ=1024 in scripts/train_tiny.py): prompt 512 + labels 512.
# The main matrix teacher-forces 1024 labels, so full-cache spans reach
# ~1536 — length extrapolation dominates and compressed caches (spans
# <= 512) come out *ahead* of full. In-domain, the ordering is honest:
# compression can only lose information vs full.
INDOMAIN_CONFIGS = [
    ("bf16 full (1k)", "model.npz", ["--seq_length", "512"]),
    ("bf16 heavy_hitter@0.25 (1k)", "model.npz",
     ["--seq_length", "512",
      "--cache_strategy", "heavy_hitter", "--max_cache_length", "0.25",
      "--prompt_compression_strategy", "heavy_hitter"]),
    ("bf16 heavy_hitter@0.5 (1k)", "model.npz",
     ["--seq_length", "512",
      "--cache_strategy", "heavy_hitter", "--max_cache_length", "0.5",
      "--prompt_compression_strategy", "heavy_hitter"]),
    ("bf16 recent_global@0.25 (1k)", "model.npz",
     ["--seq_length", "512",
      "--cache_strategy", "recent_global", "--max_cache_length", "0.25",
      "--prompt_compression_strategy", "recent_global"]),
    ("bf16 recent_global@0.5 (1k)", "model.npz",
     ["--seq_length", "512",
      "--cache_strategy", "recent_global", "--max_cache_length", "0.5",
      "--prompt_compression_strategy", "recent_global"]),
    ("bf16 l2@0.5 (1k)", "model.npz",
     ["--seq_length", "512",
      "--cache_strategy", "l2", "--max_cache_length", "0.5",
      "--prompt_compression_strategy", "l2"]),
    # FastGen hybrid: compression set by min_recovery_frac, not budget.
    ("bf16 fastgen mrf=0.85 (1k)", "model.npz",
     ["--seq_length", "512", "--cache_config", "fastgen"]),
    ("bf16 fastgen mrf=0.7 (1k)", "model.npz",
     ["--seq_length", "512", "--cache_config", "fastgen",
      "--min_recovery_frac", "0.7"]),
    # Prompt-compressor A/B: decode strategy fixed (recent_global@0.5),
    # ONLY the prefill compressor varies — isolates compressor quality.
    *[
        (f"bf16 rg@0.5 + {pc} compressor (1k)", "model.npz",
         ["--seq_length", "512",
          "--cache_strategy", "recent_global", "--max_cache_length", "0.5",
          "--prompt_compression_strategy", pc])
        for pc in ("heavy_hitter", "l2", "keep_it_odd", "random")
    ],
]

TASKS = ["localtext", "localcode"]


def run_one(label, ckpt, extra, device, num_samples, out_root, env=None):
    import os

    out_dir = out_root / label.replace(" ", "_").replace("@", "")
    cmd = [
        sys.executable, "eval.py",
        "--checkpoint_path", str(CKPT_DIR / ckpt),
        "--model_name", "TinyByteLM",
        "--tasks", *TASKS,
        "--num_samples", str(num_samples),
        "--device", device,
        "--out_dir", str(out_dir),
        # The driver exists to measure, not resume: without this a rerun
        # into existing out_dirs silently reuses stale metrics.
        "--overwrite",
    ] + extra
    print(f">>> {label}: {' '.join(cmd)}", flush=True)
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                       timeout=7200,
                       env={**os.environ, **env} if env else None)
    if r.returncode != 0:
        print(r.stdout[-2000:])
        print(r.stderr[-2000:])
        return {"error": f"rc={r.returncode}"}
    row = {}
    for task in TASKS:
        mfile = out_dir / f"{task}_metrics.json"
        if not mfile.exists():
            row[task] = {"error": "no metrics"}
            continue
        m = json.loads(mfile.read_text())

        def scalar(v):
            if isinstance(v, list):
                return sum(v) / len(v) if v else None
            return v

        if task == "localtext":
            row["ppl"] = scalar(m.get("ppl_avg", m.get("ppl")))
            row["compression"] = m.get("compression_ratio_avg")
        else:
            row["em"] = m.get("ExactMatch")
            row["lev"] = m.get("Levenshtein")
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--num_samples", type=int, default=8)
    ap.add_argument("--out", type=Path,
                    default=REPO / "results" / "quality_ab")
    ap.add_argument(
        "--filter", default=None,
        help="Only run configs whose label contains this substring "
        "(merges into the existing summary.json instead of replacing it).",
    )
    ap.add_argument(
        "--matrix", default="main", choices=["main", "indomain"],
        help="main: precision/cache-bits/strategy at the default lengths; "
        "indomain: strategy comparison with spans inside the trained "
        "context (see INDOMAIN_CONFIGS).",
    )
    args = ap.parse_args()
    global TASKS
    if args.matrix == "indomain":
        configs = INDOMAIN_CONFIGS
        args.out = args.out / "indomain"
        TASKS = ["localtext"]  # ppl is the in-domain signal
    else:
        configs = CONFIGS
    args.out.mkdir(parents=True, exist_ok=True)

    rows = {}
    if args.filter:
        configs = [c for c in configs if args.filter in c[0]]
        prev = args.out / "summary.json"
        if prev.exists():
            rows = json.loads(prev.read_text())
    for cfg_row in configs:
        label, ckpt, extra = cfg_row[:3]
        env = cfg_row[3] if len(cfg_row) > 3 else None
        if args.device == "cpu" and env and any(
            k in env for k in ("CCT_ATTN_I8DOT", "CCT_PREFILL_W4A8")
        ):
            # Kernel-gated rows are only meaningful through the Pallas
            # kernels; on CPU that requires interpret mode (backend_ok
            # gate) — without it they silently measure the XLA math path.
            env = {**env, "CCT_PALLAS_INTERPRET": "1"}
        rows[label] = run_one(label, ckpt, extra, args.device,
                              args.num_samples, args.out, env=env)
        print(f"    -> {rows[label]}", flush=True)

    (args.out / "summary.json").write_text(json.dumps(rows, indent=2))
    lines = [
        "| config | localtext PPL (bytes) | localcode EM | localcode Lev |",
        "|---|---|---|---|",
    ]
    def fmt(v):
        return f"{v:.3f}" if isinstance(v, (int, float)) else ""

    for label, r in rows.items():
        if r.get("ppl") is None and "em" not in r:
            lines.append(f"| {label} | {r} | | |")
        else:
            lines.append(
                f"| {label} | {fmt(r.get('ppl'))} |"
                f" {fmt(r.get('em'))} | {fmt(r.get('lev'))} |"
            )
    table = "\n".join(lines)
    (args.out / "summary.md").write_text(table + "\n")
    print(table)


if __name__ == "__main__":
    main()
