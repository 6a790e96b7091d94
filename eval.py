#!/usr/bin/env python
"""Evaluation driver for KV-cache compression strategies.

TPU-native counterpart of the reference eval driver (reference:
eval.py:136-448): per task — encode prompts, size the cache (max seq length
for full/hybrid/debug strategies, median estimate otherwise), generate per
example with cache resets between examples, aggregate perf + cache stats,
compute task metrics, and dump JSON/CSV results with resume support. Result
directories encode the relevant cache hyper-parameters.
"""

import argparse
import os
import json
import math
import re
import shutil
import sys
import time
from collections import Counter, defaultdict
from pathlib import Path
from typing import List, Optional

import jax
import numpy as np

from cold_compress_tpu.utils.jax_setup import setup_jax

setup_jax()

from cold_compress_tpu.caches import get_cache_strategy
from cold_compress_tpu.evals.task import TASK_MAPPING, AutoTask
from cold_compress_tpu.models import transformer as T
from cold_compress_tpu.models.config import ModelConfig
from cold_compress_tpu.runtime.engine import (
    build_cache_specs,
    cache_compatibility,
    load_model,
    min_cache_length,
)
from cold_compress_tpu.runtime.generate import (
    generate,
    generate_batch,
    reset_caches,
)
from cold_compress_tpu.runtime.stats import get_cache_stats
from cold_compress_tpu.tokenizer import encode, get_tokenizer
from cold_compress_tpu.utils.cli import (
    add_cache_arguments,
    add_generation_arguments,
    merge_cache_config,
)


def flatten_dict(in_dict: dict) -> dict:
    out = {}
    for k, v in in_dict.items():
        if isinstance(v, dict):
            for kk, vv in v.items():
                out[f"{k}_{kk}"] = vv
        else:
            out[k] = v
    return out


def compress_list(l):
    if len(l) < 3:
        return [str(x) for x in l]
    counter = Counter(l)
    return [f"{k}x{v}" for k, v in counter.items()]


def args_to_str(args) -> str:
    """Results-dir name from the cache kwargs relevant to the chosen
    strategies (reference: eval.py:81-133)."""
    if "debug" in args.cache_strategy[0]:
        debug_suffix = "__debug"
        cache_strategy = [
            re.sub(r"debug_+", "", cs).strip() for cs in args.cache_strategy
        ]
    else:
        cache_strategy = args.cache_strategy
        debug_suffix = ""
    relevant = set()
    for cs in cache_strategy:
        relevant.update(get_cache_strategy(cs).relevant_kwargs)
    relevant.update({"cache_length_pattern", "cache_strategy_pattern"})
    if getattr(args, "attn_top_k", 1.0) != 1.0:
        relevant.add("attn_top_k")

    def process_num(n):
        if isinstance(n, float) and int(n) == n:
            return int(n)
        return n

    args_dict = vars(args).copy()
    if "hybrid_strategies" in args_dict and args_dict["hybrid_strategies"]:
        args_dict["hybrid_strategies"] = [
            x["strategy"] for x in args_dict["hybrid_strategies"]
        ]
    parts = []
    for k, v in args_dict.items():
        if k not in relevant:
            continue
        if isinstance(v, list):
            parts.append(
                f"{k}=" + ",".join(compress_list([process_num(m) for m in v]))
            )
        else:
            parts.append(f"{k}={process_num(v)}")
    return "__".join(sorted(parts)) + debug_suffix


def _prepared_params(args, params_box, stacked: bool):
    """Transform the weight tree for the stacked (scan-over-layers) path
    ONCE per eval invocation, not once per task.

    The per-task re-transform held the raw AND transformed trees alive for
    the whole run (2x model bytes steady-state, plus transform transients)
    — at 8B-int4 scale that exhausted the chip's HBM (r3 eval_8b batch).
    The box caches the prepared tree and drops the raw reference, so
    steady-state is 1x model bytes. All tasks in one invocation share
    args, so the stacking decision and transform key are invariant.

    Each transform stage is synced (block_until_ready) and its input tree
    dropped before the next stage runs: with everything dispatched async,
    raw+stacked+fused trees coexisted (~3x packed bytes ≈ 15 GB at
    8B-int4) and the r4 eval_8b leg OOM'd the 16 GB chip during prefill
    (results/tpu_batch_r4/eval_8b2.log). Sequenced, the peak is 2x."""
    import jax

    if not stacked:
        assert "raw" in params_box, (
            "Stacking decision changed between tasks of one invocation — "
            "the raw tree was already dropped."
        )
        return params_box["raw"]
    single = args.tp == 1 and args.dp == 1
    key = "stacked_fused" if single else "stacked"
    if key not in params_box:
        p = params_box.pop("raw")

        def step(fn, tree):
            out = jax.block_until_ready(fn(tree))
            return out

        p = step(T.stack_layer_params, p)
        if single:
            p = step(T.fuse_layer_params, p)  # see generate.py
            from cold_compress_tpu.ops.pallas_qmm import (
                force_interpret,
                tiled_head_enabled,
            )
            if jax.default_backend() == "tpu" or force_interpret():
                p = step(T.colpack_layer_params, p)
                if tiled_head_enabled():
                    p = step(T.tile_output_head, p)
        params_box[key] = p
    return params_box[key]


def run_task(
    args,
    task,
    cfg: ModelConfig,
    params_box,
    rope,
    tokenizer,
    is_chat: bool,
    terminator_ids: List[int],
):
    aggregate = defaultdict(list)
    predictions, all_probs = [], []
    task_metrics = {}

    test = task.get_test()
    if len(test) == 0:
        print(f"No test data for {type(task).__name__}; skipping.")
        return None, None, None

    prompts = [r["prompt"] for r in test]
    inputs = [encode(tokenizer, p, is_chat=is_chat) for p in prompts]

    if task.requires_perplexity:
        label_ids = [
            encode(tokenizer, r["labels"][0], is_chat=False, bos=False)
            for r in test
        ]
        max_seq_length = min(
            max(len(i) + len(l) for i, l in zip(inputs, label_ids)),
            cfg.block_size,
        )
    else:
        label_ids = None
        max_seq_length = min(
            max(len(i) for i in inputs) + task.max_tokens, cfg.block_size
        )

    # Cache sizing: full/hybrid/debug get the max sequence length; compressed
    # strategies the median estimate (reference: eval.py:186-197).
    median_seq_length = int(
        np.median([len(i) for i in inputs]) + task.max_tokens / 2
    )
    target_length = (
        max_seq_length
        if any(
            x in {"full", "hybrid"} or "debug" in x
            for x in args.cache_strategy
        )
        else min(median_seq_length, max_seq_length)
    )
    token_ids = None
    if "hybrid" in args.cache_strategy:
        token_ids = {
            "special": tokenizer.special_ids(),
            "punctuation": tokenizer.punctuation_ids(),
        }
    specs = build_cache_specs(
        cfg, vars(args), target_length, token_ids=token_ids
    )
    # Batched generation for generation tasks (a TPU-native extension — the
    # reference is batch-1 only, README.md:536-537); perplexity /
    # prompt-feeding modes stay single-lane.
    use_batch = (
        args.batch_size > 1
        and not task.requires_perplexity
        and not args.feed_long_prompts
        and not args.decode_first_token
    )
    bs = args.batch_size if use_batch else 1
    # Params BEFORE caches (mirrors bench.py): the repack chain's
    # transients plus live KV buffers OOM'd the chip at 8B scale.
    params = _prepared_params(
        args, params_box, stacked=len(set(specs)) == 1
    )
    caches = T.init_caches(cfg, specs, batch_size=bs)
    tp_ctx = None
    if args.tp > 1 and getattr(args, "tp_kernels", False):
        if args.dp > 1:
            assert use_batch and bs % args.dp == 0, (
                "--tp_kernels --dp shards batch lanes: needs --batch_size "
                "divisible by dp (and a batchable task config)"
            )
        from cold_compress_tpu.parallel.tp_decode import prepare_tp

        tp_ctx = prepare_tp(cfg, params, args.tp, dp=args.dp)
    elif (args.tp > 1 or args.dp > 1) and getattr(args, "sp", 1) == 1:
        # (--sp N --tp M takes the sp x tp branch below instead.)
        from cold_compress_tpu.parallel.mesh import shard_model

        _, params, caches = shard_model(
            cfg, params, caches, tp=args.tp, dp=args.dp
        )
    pp_mesh = None
    if getattr(args, "pp", 1) > 1:
        assert args.tp == 1 and args.dp == 1 and not use_batch
        from cold_compress_tpu.parallel.pp import make_pp_mesh

        assert T.is_stacked(caches), "--pp needs homogeneous cache specs"
        pp_mesh = make_pp_mesh(args.pp)
    sp_mesh = None
    if getattr(args, "sp", 1) > 1:
        assert args.dp == 1 and not use_batch, (
            "--sp composes with --tp (2-D sp x tp) on single-lane runs; "
            "dp/batched lanes take --tp/--dp alone"
        )
        from cold_compress_tpu.parallel.sp import (
            make_sp_mesh,
            make_sp_tp_mesh,
            sp_supported,
        )

        assert sp_supported(caches)
        if args.tp > 1:
            assert tp_ctx is None, "--sp with --tp uses GSPMD; drop --tp_kernels"
            from cold_compress_tpu.ops.linear import is_quantized as _isq

            assert not any(
                map(_isq, jax.tree.leaves(params, is_leaf=_isq))
            ), "--sp with --tp requires dense (bf16) weights"
            sp_mesh = make_sp_tp_mesh(args.sp, args.tp)
        else:
            sp_mesh = make_sp_mesh(args.sp)
    mcl = min_cache_length(specs)

    # Pin one prefill bucket per task (the longest prompt's power-of-two
    # bucket). Per-bucket prefill graphs cost minutes of XLA compile each on
    # a cold cache; padding a short prompt costs milliseconds of MXU time
    # (VERDICT r1 weak #6). --per_prompt_buckets restores per-prompt
    # power-of-two bucketing.
    task_bucket = None
    if inputs and not args.per_prompt_buckets:
        from cold_compress_tpu.runtime.generate import bucket_length

        task_bucket = bucket_length(max(len(i) for i in inputs))

    if args.profile:
        try:
            jax.profiler.start_trace(str(args.profile))
        except Exception as e:
            print(f"Profiling unavailable on this backend: {e}")
            args.profile = None

    if use_batch:
        for start in range(0, len(inputs), bs):
            group = list(range(start, min(start + bs, len(inputs))))
            batch_prompts = [inputs[j] for j in group]
            # Pad the final partial batch by repeating the last prompt; the
            # surplus lanes are computed and discarded.
            batch_prompts += [batch_prompts[-1]] * (bs - len(group))
            max_new_tokens = min(
                task.max_tokens,
                max_seq_length - max(len(p) for p in batch_prompts),
            )
            assert max_new_tokens > 0, "Prompt too long for batch"
            seqs, info, caches = generate_batch(
                cfg,
                params,
                rope,
                caches,
                batch_prompts,
                max_new_tokens,
                terminator_ids=terminator_ids,
                attn_top_k=args.attn_top_k,
                prefill_bucket=task_bucket,
                tp_ctx=tp_ctx,
            )
            for k, v in info["perf_stats"].items():
                aggregate[k].append(v)
            cache_stats = get_cache_stats(
                caches,
                int(np.mean(info["prompt_lengths"])),
                int(np.mean(info["num_generated"])),
            )
            for k, v in cache_stats.items():
                aggregate[k].append(v)
            for lane, j in enumerate(group):
                y = seqs[lane][info["prompt_lengths"][lane] :]
                if y and y[-1] in terminator_ids:
                    y = y[:-1]
                pred = tokenizer.decode(y)
                if args.debug:
                    print(f"Prediction: {pred}")
                predictions.append(pred)
                if task.requires_logits:
                    vocab = tokenizer.get_vocab()
                    probs = np.asarray(info["final_probs"][lane])
                    all_probs.append(
                        {
                            tok: float(probs[idx])
                            for idx, tok in enumerate(vocab[: len(probs)])
                            if len(tok) <= 3
                        }
                    )
            caches = reset_caches(caches)
            done = group[-1] + 1
            if done % 10 < bs:
                print(
                    f"  {done}/{len(inputs)} examples; agg decode tok/s="
                    f"{np.mean(aggregate['decode_toks_per_sec']):.1f}"
                )
        inputs = []  # the per-example loop below is skipped

    for i, input_ids in enumerate(inputs):
        prompt_length = len(input_ids)
        max_new_tokens = min(task.max_tokens, max_seq_length - prompt_length)
        assert max_new_tokens > 0, f"Prompt too long: {prompt_length}"
        # Teacher forcing follows the label length, so clip labels to the
        # generation budget — otherwise a byte-level task (chars == tokens)
        # can force positions past block_size / the RoPE table and the
        # aggregate ppl is dominated by out-of-range garbage.
        next_tokens = (
            None if label_ids is None else label_ids[i][:max_new_tokens]
        )

        seq, info, caches = generate(
            cfg,
            params,
            rope,
            caches,
            input_ids,
            max_new_tokens,
            next_tokens=next_tokens,
            terminator_ids=terminator_ids if next_tokens is None else None,
            attn_top_k=args.attn_top_k,
            feed_long_prompts=args.feed_long_prompts,
            decode_first_token=args.decode_first_token,
            min_cache_length=mcl,
            prefill_bucket=task_bucket,
            sp_mesh=sp_mesh,
            pp_mesh=pp_mesh,
            tp_ctx=tp_ctx,
        )
        for k, v in info["perf_stats"].items():
            aggregate[k].append(v)

        if next_tokens is not None:
            nll = -np.log(np.maximum(np.asarray(info["emitted_probs"]), 1e-20))
            # Labels can outrun the decode budget (model context); slots past
            # num_generated carry no probability — trim them so the aggregate
            # ppl reflects only teacher-forced steps that actually ran.
            nll = nll[: int(info.get("num_generated", len(nll)))]
            # Non-finite teacher-forced steps indicate a numerics bug
            # (NaN probabilities), not data — count them loudly rather
            # than silently filtering, so ppl can't look healthy while a
            # kernel emits garbage.
            n_bad = int(np.sum(~np.isfinite(nll)))
            if n_bad:
                print(
                    f"WARNING: {n_bad}/{len(nll)} teacher-forced steps "
                    "produced non-finite NLL (dropped from ppl)",
                    file=sys.stderr,
                )
                aggregate["ppl_nonfinite_steps"].append(n_bad)
                nll = nll[np.isfinite(nll)]
            for k in range(500, len(nll), 500):
                aggregate[f"ppl@{k}"].append(float(np.exp(np.mean(nll[:k]))))
            if len(nll):
                aggregate["ppl"].append(float(np.exp(np.mean(nll))))

        cache_stats = get_cache_stats(
            caches, info["prompt_length"], info["num_generated"]
        )
        for k, v in cache_stats.items():
            aggregate[k].append(v)

        if not task.requires_perplexity:
            y = seq[info["prompt_length"] :]
            if y and y[-1] in terminator_ids:
                y = y[:-1]
            pred = tokenizer.decode(y)
            if args.debug:
                print(f"Prediction: {pred}")
            predictions.append(pred)
            if task.requires_logits:
                vocab = tokenizer.get_vocab()
                probs = np.asarray(info["final_probs"])
                # Keep only short token strings (answer letters) — the dense
                # vocab->prob dict the reference builds (eval.py:267-270) is
                # wasteful at 128k vocab.
                all_probs.append(
                    {
                        tok: float(probs[idx])
                        for idx, tok in enumerate(vocab[: len(probs)])
                        if len(tok) <= 3
                    }
                )

        caches = reset_caches(caches)
        if (i + 1) % 10 == 0:
            print(
                f"  {i + 1}/{len(inputs)} examples; "
                f"decode tok/s={np.mean(aggregate['decode_toks_per_sec']):.1f}"
            )

    if args.profile:
        jax.profiler.stop_trace()

    print(
        f"Average tokens/sec: "
        f"{np.mean(aggregate['total_toks_per_sec']):.2f}"
    )
    task_metrics["max_memory_gb"] = float(
        np.max(aggregate["memory_used_gb"])
    )

    for k, v in aggregate.items():
        task_metrics[k] = sum(v) / len(v)
        if "toks_per_sec" in k:
            task_metrics[k] = list(v)
            sv = sorted(v)
            cutoff = math.ceil(len(sv) / 10)
            task_metrics[f"{k}_top_10p"] = sum(sv[-cutoff:]) / cutoff
        if k == "total_seconds":
            task_metrics[f"{k}_min"] = min(v)
            task_metrics[f"{k}_max"] = max(v)
            task_metrics[f"{k}_median"] = float(np.median(v))

    if task.requires_perplexity:
        pred_rows = None
    else:
        pred_units = all_probs if task.requires_logits else predictions
        task_metrics.update(flatten_dict(task.test_metrics(pred_units)))
        pred_rows = list(zip(prompts, predictions))

    task_args = {
        "max_cache_length": [s.max_cache_length for s in specs],
        "cache_strategy": [s.cache_strategy for s in specs],
        "target_length": target_length,
    }
    return task_metrics, pred_rows, task_args


def main(args, out_dir: Path):
    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    if args.random_weights:
        cfg = ModelConfig.from_name(args.random_weights)
        import jax.numpy as jnp

        if args.random_quantize:
            from cold_compress_tpu.quantization.weight_quant import (
                random_quantized_params,
            )

            params = random_quantized_params(
                cfg,
                mode=args.random_quantize,
                head_mode="int4" if args.random_quantize == "int4" else "int8",
            )
        else:
            params = T.init_params(
                cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16
            )
        rope = T.make_rope_table(cfg)
        tokenizer = get_tokenizer(None, "byte")
        is_chat = False
    else:
        checkpoint_path = Path(args.checkpoint_path)
        assert checkpoint_path.is_file(), checkpoint_path
        cfg, params, rope = load_model(
            checkpoint_path, model_name=args.model_name
        )
        tokenizer_path = checkpoint_path.parent / "tokenizer.model"
        if not tokenizer_path.is_file():
            tokenizer_path = checkpoint_path.parent
        is_chat = (
            "chat" in str(checkpoint_path).lower()
            or "instruct" in str(checkpoint_path).lower()
        )
        tokenizer = get_tokenizer(
            tokenizer_path, checkpoint_path, is_chat=is_chat
        )

    terminator_ids = tokenizer.get_terminator_ids()
    task_kwargs = {
        "model_max_length": cfg.max_length,
        "num_samples": args.num_samples,
        "tokenizer": tokenizer.encode_prompt if is_chat else tokenizer.encode,
    }
    if args.seq_length is not None:
        task_kwargs["seq_length"] = args.seq_length
    if args.ruler_context_sentences is not None:
        task_kwargs["context_sentences"] = args.ruler_context_sentences

    tasks = args.tasks
    eval_tasks = {}
    for name in tasks:
        kw = dict(task_kwargs)
        if name not in ("pg19", "localtext"):
            kw.pop("seq_length", None)
        if not name.startswith("ruler"):
            kw.pop("context_sentences", None)
        try:
            eval_tasks[name] = AutoTask.from_name(name, **kw)
        except Exception as e:
            print(f"Task {name} unavailable: {e}")

    params_box = {"raw": params}
    del params  # run_task owns the tree via the box (see _prepared_params)
    task_metrics = defaultdict(dict)
    args_fn = out_dir / "args.json"
    for task_name, task in eval_tasks.items():
        print(f"Running task {task_name} ...")
        task_out_fn = out_dir / f"{task_name}_metrics.json"
        if task_out_fn.exists() and not args.overwrite:
            print(f"Task {task_name} already evaluated. Skipping.")
            task_metrics[task_name] = json.loads(task_out_fn.read_text())
            continue
        metrics, pred_rows, task_args = run_task(
            args, task, cfg, params_box, rope, tokenizer, is_chat,
            terminator_ids,
        )
        if metrics is None:
            continue
        task_metrics[task_name] = metrics
        if pred_rows is not None:
            import csv

            with open(out_dir / f"{task_name}_predictions.csv", "w") as fd:
                w = csv.writer(fd)
                w.writerow(["prompt", "prediction"])
                w.writerows(pred_rows)
        task_out_fn.write_text(json.dumps(metrics, indent=4, default=str))
        (out_dir / f"{task_name}_args.json").write_text(
            json.dumps(task_args, indent=4, default=str)
        )
        if not args_fn.exists():
            args_fn.write_text(
                json.dumps(
                    {k: str(v) for k, v in vars(args).items()}, indent=4
                )
            )
    (out_dir / "all_metrics.json").write_text(
        json.dumps(task_metrics, indent=4, default=str)
    )
    # Machine-readable completion marker for batch idempotence (the TPU
    # batch scripts skip a leg whose log carries it — without one, eval
    # legs re-ran on every batch restart; with --overwrite that wiped
    # finished metrics, which is how the r4 q128 files were lost).
    print("ALL_TASKS_DONE")


def setup(args) -> Path:
    sub_dir = args_to_str(args) if args.out_dir is None else args.out_dir
    model_dir = (
        args.random_weights
        if args.random_weights
        else Path(args.checkpoint_path).parent.name
    )
    out_dir = (
        Path(__file__).parent
        / "results"
        / model_dir
        / "__".join(compress_list(args.cache_strategy))
        / str(sub_dir)
    )
    print(f"Saving to {out_dir}")
    if out_dir.exists() and args.overwrite:
        shutil.rmtree(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    cache_compatibility(vars(args))
    return out_dir


def add_eval_args(parser):
    parser.add_argument(
        "--tasks",
        type=str,
        nargs="+",
        default=["truthfulqa"],
        choices=list(TASK_MAPPING.keys()) + ["all"],
    )
    parser.add_argument("--out_dir", type=Path, default=None)
    parser.add_argument("--debug", default=False, action="store_true")
    parser.add_argument(
        "--num_samples",
        type=int,
        default=-1,
        help="Examples per task (-1 = all).",
    )
    parser.add_argument("--overwrite", default=False, action="store_true")
    parser.add_argument(
        "--seq_length", type=int, default=None, help="PG19 context length."
    )
    parser.add_argument(
        "--ruler_context_sentences",
        type=int,
        default=None,
        help="Synthetic RULER context size (filler sentences) when running "
        "offline-synthesized RULER tasks.",
    )
    parser.add_argument("--cache_config", type=str, default=None)
    parser.add_argument(
        "--decode_first_token", default=False, action="store_true"
    )
    parser.add_argument(
        "--random_weights",
        type=str,
        default=None,
        help="Run with a random-weight model (smoke testing).",
    )
    parser.add_argument(
        "--random_quantize",
        type=str,
        default=None,
        choices=["int8", "int4"],
        help="Materialize --random_weights directly in quantized form "
        "(an 8B bf16 init does not fit one chip's HBM; throughput and "
        "harness behavior do not depend on weight values).",
    )
    parser.add_argument(
        "--per_prompt_buckets",
        default=False,
        action="store_true",
        help="Pad each prompt to its own power-of-two bucket instead of one "
        "task-wide bucket (more prefill graphs to compile, less padding).",
    )
    parser.add_argument(
        "--batch_size",
        type=int,
        default=1,
        help="Lanes per generate_batch call for generation tasks (beyond "
        "reference parity; pairs with --dp to shard the batch axis).",
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Evaluation harness for KV-cache compression strategies."
    )
    add_eval_args(parser)
    add_generation_arguments(parser)
    add_cache_arguments(parser)
    args = merge_cache_config(parser.parse_args())
    if args.tasks == ["all"]:
        args.tasks = list(TASK_MAPPING.keys())
    out_dir = setup(args)
    main(args, out_dir)
