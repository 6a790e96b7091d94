#!/usr/bin/env python
"""Single-prompt generation CLI (development / vibe-testing entry point).

TPU-native counterpart of the reference driver (reference: generate.py:54-204)
with the same flags and output sections (generation, perf, bandwidth, KV-cache
statistics). Additional flag ``--random_weights <model-name>`` runs without a
checkpoint (random-initialized weights + byte tokenizer) for smoke tests and
throughput measurement.
"""

import argparse
import os
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

from cold_compress_tpu.utils.jax_setup import setup_jax

setup_jax()

from cold_compress_tpu.models import transformer as T
from cold_compress_tpu.models.config import ModelConfig
from cold_compress_tpu.runtime.engine import (
    build_cache_specs,
    cache_compatibility,
    compute_max_seq_length,
    load_model,
)
from cold_compress_tpu.runtime.generate import generate
from cold_compress_tpu.runtime.stats import get_cache_stats, print_stats
from cold_compress_tpu.tokenizer import encode, get_tokenizer
from cold_compress_tpu.utils.cli import (
    add_cache_arguments,
    add_generation_arguments,
    merge_cache_config,
)


def main(args) -> None:
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    is_chat = (
        "chat" in str(args.checkpoint_path).lower()
        or "instruct" in str(args.checkpoint_path).lower()
    )

    t0 = time.time()
    if args.random_weights:
        cfg = ModelConfig.from_name(args.random_weights)
        params = T.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        rope = T.make_rope_table(cfg)
        tokenizer = get_tokenizer(None, "byte")
    else:
        checkpoint_path = Path(args.checkpoint_path)
        assert checkpoint_path.is_file(), checkpoint_path
        cfg, params, rope = load_model(
            checkpoint_path, model_name=args.model_name
        )
        tokenizer_path = checkpoint_path.parent / "tokenizer.model"
        if not tokenizer_path.is_file():
            tokenizer_path = checkpoint_path.parent
        tokenizer = get_tokenizer(
            tokenizer_path, checkpoint_path, is_chat=is_chat
        )
    print(f"Time to load model: {time.time() - t0:.02f} seconds")

    prompt_ids = encode(tokenizer, args.prompt, is_chat=is_chat)
    terminator_ids = tokenizer.get_terminator_ids()

    model_size = T.model_size_bytes(params)
    print(f"{model_size / 1e9:.02f} GB of (non-embedding) parameters.")

    max_prompt_length, max_seq_length = compute_max_seq_length(
        cfg, [len(prompt_ids)], args.max_new_tokens
    )
    if len(prompt_ids) >= max_seq_length:
        # Keep room for at least one generated token; the eval harness
        # filters over-long examples instead (evals/task.py), but this CLI
        # is a debug tool and should degrade gracefully.
        keep = max_seq_length - min(args.max_new_tokens, max_seq_length // 2)
        print(
            f"WARNING: prompt ({len(prompt_ids)} tokens) exceeds the model "
            f"context ({cfg.block_size}); truncating to {keep} tokens."
        )
        prompt_ids = prompt_ids[:keep]
        max_prompt_length = keep
    max_new_tokens = min(args.max_new_tokens, max_seq_length - max_prompt_length)

    token_ids = None
    if "hybrid" in args.cache_strategy:
        token_ids = {
            "special": tokenizer.special_ids(),
            "punctuation": tokenizer.punctuation_ids(),
        }
    specs = build_cache_specs(
        cfg, vars(args), max_seq_length, token_ids=token_ids
    )
    caches = T.init_caches(cfg, specs, batch_size=1)
    if T.is_stacked(caches):
        params = T.stack_layer_params(params)
        if args.tp == 1:
            # Fused q|k|v and w1|w3 projections cut per-layer dispatch
            # overhead; TP shards the per-projection output axes, so the
            # sharded path keeps them separate (models/transformer.py).
            params = T.fuse_layer_params(params)
            from cold_compress_tpu.ops.pallas_qmm import (
                force_interpret,
                tiled_head_enabled,
            )
            if jax.default_backend() == "tpu" or force_interpret():
                # Column-packed int4 layout halves the decode kernel's MXU
                # work (ops/pallas_qmm.py). No-op for bf16/int8 weights.
                params = T.colpack_layer_params(params)
                if tiled_head_enabled():
                    params = T.tile_output_head(params)

    tp_ctx = None
    if args.tp > 1 and getattr(args, "tp_kernels", False):
        # Explicit shard_map TP: per-device local weight repacks keep the
        # Pallas decode kernels running (parallel/tp_decode.py). GSPMD
        # cannot partition Pallas custom calls.
        from cold_compress_tpu.parallel.tp_decode import prepare_tp

        tp_ctx = prepare_tp(cfg, params, args.tp)
        print(f"Tensor-parallel (shard_map kernels) over {args.tp} devices")
    elif args.tp > 1 and getattr(args, "sp", 1) == 1:
        # Shard weights column/row-wise and caches on the KV-head axis over
        # a (1, tp) mesh; GSPMD inserts the two per-layer all-reduces the
        # reference wires by hand (reference: generate.py:79-86, tp.py:171).
        # (--sp N --tp M takes the sp x tp branch below instead.)
        from cold_compress_tpu.parallel.mesh import shard_model

        mesh, params, caches = shard_model(cfg, params, caches, tp=args.tp)
        print(f"Tensor-parallel over {args.tp} devices: {mesh}")

    pp_mesh = None
    if getattr(args, "pp", 1) > 1:
        assert args.tp == 1 and getattr(args, "sp", 1) == 1
        from cold_compress_tpu.parallel.pp import make_pp_mesh

        assert T.is_stacked(caches), (
            "--pp needs homogeneous per-layer cache specs (stacked layout)"
        )
        pp_mesh = make_pp_mesh(args.pp)
        print(f"Pipeline-parallel prefill over {args.pp} stages")

    sp_mesh = None
    if getattr(args, "sp", 1) > 1:
        from cold_compress_tpu.parallel.sp import (
            make_sp_mesh,
            make_sp_tp_mesh,
            sp_supported,
        )

        assert sp_supported(caches)  # covers every strategy incl. hybrid
        if args.tp > 1:
            # 2-D sp x tp: sp shards prefill query blocks, tp shards
            # heads/FFN columns; decode runs over the tp-head-sharded
            # caches under GSPMD (parallel/sp.py::sp_tp_prefill — dense
            # weights only; quantized runs take --tp alone).
            assert tp_ctx is None, "--sp with --tp uses GSPMD; drop --tp_kernels"
            from cold_compress_tpu.ops.linear import is_quantized as _isq

            assert not any(
                map(_isq, jax.tree.leaves(params, is_leaf=_isq))
            ), "--sp with --tp requires dense (bf16) weights"
            sp_mesh = make_sp_tp_mesh(args.sp, args.tp)
            print(
                f"Sequence x tensor parallel prefill over "
                f"{args.sp}x{args.tp} devices"
            )
        else:
            sp_mesh = make_sp_mesh(args.sp)
            print(f"Sequence-parallel prefill over {args.sp} devices")

    if args.profile:
        try:
            jax.profiler.start_trace(str(args.profile))
        except Exception as e:
            print(f"Profiling unavailable on this backend: {e}")
            args.profile = None

    seq, info, caches = generate(
        cfg,
        params,
        rope,
        caches,
        prompt_ids,
        max_new_tokens,
        terminator_ids=terminator_ids,
        attn_top_k=args.attn_top_k,
        feed_long_prompts=args.feed_long_prompts,
        sp_mesh=sp_mesh,
        pp_mesh=pp_mesh,
        tp_ctx=tp_ctx,
    )

    if args.profile:
        jax.profiler.stop_trace()

    perf_stats = info["perf_stats"]
    print("\n==========\n")
    print("GENERATION:")
    print(tokenizer.decode(seq[info["prompt_length"] :]))
    print("\n==========\n")
    print("PERFORMANCE:")
    tokens_per_second = perf_stats["total_toks_per_sec"]
    print(
        f"Time: {perf_stats['total_seconds']:.02f} sec total, "
        f"{tokens_per_second:.02f} tokens/sec, "
        f"{perf_stats['decode_tokens']} tokens"
    )
    print(f"Bandwidth: {model_size * tokens_per_second / 1e9:.02f} GB/s")
    print(f"Memory used: {perf_stats['memory_used_gb']:.02f} GB")
    print("\n==========\n")
    print("DETAILED PERFORMANCE:")
    print_stats(perf_stats)
    print("\n==========\n")
    print("KV CACHE STATISTICS:")
    print_stats(
        get_cache_stats(caches, info["prompt_length"], info["num_generated"])
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Run simple single-prompt generation "
        "(for development and debugging purposes)."
    )
    parser.add_argument(
        "--prompt",
        type=str,
        default="long_prompt_short_output.txt",
        help="Input prompt; *.txt loads from ./prompts.",
    )
    parser.add_argument(
        "--max_new_tokens", type=int, default=512, help="Max new tokens."
    )
    parser.add_argument(
        "--cache_config",
        type=str,
        default=None,
        help="Name of a YAML file in ./cache_configs.",
    )
    parser.add_argument(
        "--random_weights",
        type=str,
        default=None,
        help="Skip checkpoint loading: run the named architecture with "
        "random weights and a byte tokenizer.",
    )
    add_generation_arguments(parser)
    add_cache_arguments(parser)
    args = merge_cache_config(parser.parse_args())

    if args.prompt.endswith(".txt"):
        prompt_fn = Path(__file__).resolve().parent / "prompts" / args.prompt
        args.prompt = prompt_fn.read_text().strip()

    cache_compatibility(vars(args))
    main(args)
