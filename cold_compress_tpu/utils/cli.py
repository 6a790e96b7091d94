"""CLI argument groups and YAML config overlay.

Ports the reference's three argparse groups (reference: cache.py:13-118
``add_cache_arguments``, generation_utils.py:50-76
``add_generation_arguments``) and the cache-config YAML overlay
(reference: generation_utils.py:79-91) so existing configs work unchanged.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import yaml

CACHE_STRATEGIES = [
    "full",
    "random",
    "recent_global",
    "heavy_hitter",
    "l2",
    "hybrid",
    "keep_it_odd",
]
ALL_STRATEGIES = CACHE_STRATEGIES + [f"debug_{s}" for s in CACHE_STRATEGIES]


def add_cache_arguments(parser: argparse.ArgumentParser):
    group = parser.add_argument_group("cache_args")
    group.add_argument(
        "--max_cache_length",
        type=float,
        default=[1.0],
        nargs="+",
        help="Cache size per layer: fraction of max seq length if <= 1, else "
        "absolute. Tiled/extended across layers per --cache_length_pattern.",
    )
    group.add_argument(
        "--cache_bits",
        default=None,
        type=int,
        choices=[2, 4, 8],
        help="Quantize the KV cache to this many bits.",
    )
    group.add_argument(
        "--cache_length_pattern",
        default="tile",
        choices=["tile", "repeat", "funnel", "pyramid"],
    )
    group.add_argument(
        "--cache_strategy",
        default=["full"],
        nargs="+",
        choices=ALL_STRATEGIES,
    )
    group.add_argument(
        "--cache_strategy_pattern",
        default="tile",
        choices=["tile", "repeat"],
        help="How to apply the cache_strategy across layers.",
    )
    parser.add_argument(
        "--feed_long_prompts",
        default=False,
        action="store_true",
        help="If True and |prompt| > max_cache_length, prefill with "
        "prompt[:budget] and feed the rest token-by-token.",
    )
    group.add_argument(
        "--prompt_compression_strategy",
        default=["recent_global"],
        nargs="+",
        help="Strategy for compressing a prompt that exceeds the cache budget.",
    )
    group.add_argument(
        "--global_tokens",
        default=1,
        type=int,
        help="Number of initial (attention-sink) tokens always kept.",
    )
    group.add_argument(
        "--recent_window",
        default=10,
        type=float,
        help="Recently generated tokens spared from eviction "
        "(fraction of budget if < 1).",
    )
    group.add_argument(
        "--history_window_size",
        default=1,
        type=int,
        help="Attention-history window for heavy-hitter scoring "
        "(1 = unbounded accumulation).",
    )
    group.add_argument(
        "--attn_thresholding",
        default=False,
        action="store_true",
        help="Record binary (attention >= uniform) indicators instead of raw "
        "probabilities.",
    )
    parser.add_argument(
        "--hybrid_strategies",
        default=None,
        help="Hybrid (FastGen) strategy menu; set via a cache_config YAML.",
    )
    parser.add_argument(
        "--min_recovery_frac",
        default=0.9,
        type=float,
        help="Minimum recovered attention fraction for hybrid (FastGen) "
        "profiling.",
    )


def add_generation_arguments(parser: argparse.ArgumentParser):
    group = parser.add_argument_group("generation_args")
    group.add_argument(
        "--checkpoint_path",
        type=Path,
        default=Path("checkpoints/meta-llama/Meta-Llama-3-8B-Instruct/model.npz"),
        help="Model checkpoint path (.npz from scripts/convert_hf_checkpoint.py).",
    )
    group.add_argument(
        "--model_name",
        type=str,
        default=None,
        help="Override architecture name (default: checkpoint parent dir).",
    )
    group.add_argument("--profile", type=Path, default=None, help="Profile path.")
    group.add_argument(
        "--compile",
        action="store_true",
        help="Accepted for reference-CLI parity; XLA always compiles the "
        "prefill/decode graphs.",
    )
    group.add_argument(
        "--device", type=str, default=None, help="cpu | tpu (default: auto)"
    )
    group.add_argument(
        "--attn_top_k",
        type=float,
        default=1.0,
        help="Fraction of top-K attentions over which to aggregate values "
        "during decode.",
    )
    group.add_argument(
        "--tp",
        type=int,
        default=1,
        help="Tensor-parallel degree over the device mesh.",
    )
    group.add_argument(
        "--tp_kernels",
        action="store_true",
        help="Run tensor parallelism as an explicit shard_map with "
        "per-device Pallas kernels (parallel/tp_decode.py) instead of "
        "GSPMD sharding annotations. Keeps the W4A8/W8A8 decode kernels "
        "running under --tp (GSPMD cannot partition Pallas custom calls, "
        "so the annotation path falls back to XLA dequant matmuls).",
    )
    group.add_argument(
        "--pp",
        type=int,
        default=1,
        help="Pipeline-parallel degree for prefill: layer stages over the "
        "mesh, prompt streamed as causal sequence-chunk microbatches "
        "(parallel/pp.py). Needs homogeneous per-layer cache specs.",
    )
    group.add_argument(
        "--sp",
        type=int,
        default=1,
        help="Sequence-parallel degree for prefill: prompt query blocks "
        "shard over the mesh, K/V all-gather over ICI, summaries psum "
        "(parallel/sp.py). Decode proceeds from replicated caches. "
        "Mutually exclusive with --tp/--dp for now.",
    )
    group.add_argument(
        "--dp",
        type=int,
        default=1,
        help="Data-parallel degree (shards the batch axis; pair with "
        "--batch_size in eval.py).",
    )


def merge_cache_config(args: argparse.Namespace) -> argparse.Namespace:
    """Overlay cache_configs/<name>.yaml onto parsed args
    (reference: generation_utils.py:79-91)."""
    if not getattr(args, "cache_config", None):
        return args
    name = args.cache_config
    if not name.endswith(".yaml"):
        name += ".yaml"
    candidates = [
        Path(name),
        Path(__file__).resolve().parents[2] / "cache_configs" / name,
    ]
    for path in candidates:
        if path.exists():
            with open(path) as f:
                overlay = yaml.safe_load(f)
            return argparse.Namespace(**{**vars(args), **overlay})
    raise FileNotFoundError(f"Cache config not found: {name}")
