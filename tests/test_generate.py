"""Generation-runtime tests: on-device loop semantics, teacher forcing,
terminators, long-prompt feeding, cache spec construction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cold_compress_tpu.models.transformer import layer_cache as LV

from cold_compress_tpu.models import transformer as T
from cold_compress_tpu.runtime.engine import (
    build_cache_specs,
    cache_compatibility,
    min_cache_length,
)
from cold_compress_tpu.runtime.generate import generate, reset_caches


def setup(cfg, strategy="full", C=1.0, **kw):
    specs = build_cache_specs(
        cfg,
        {
            "cache_strategy": [strategy],
            "max_cache_length": [C],
            "prompt_compression_strategy": [
                "heavy_hitter" if strategy == "heavy_hitter" else "recent_global"
            ],
            **kw,
        },
        max_seq_length=128,
    )
    return T.init_caches(cfg, specs, 1, jnp.float32)


def test_generate_greedy_deterministic(tiny_model):
    cfg, params, rope = tiny_model
    caches = setup(cfg)
    prompt = list(range(1, 11))
    seq1, info1, caches = generate(cfg, params, rope, caches, prompt, 16)
    caches = reset_caches(caches)
    seq2, info2, _ = generate(cfg, params, rope, caches, prompt, 16)
    assert seq1 == seq2
    assert len(seq1) == 10 + 16
    assert info1["num_generated"] == 16


def test_decode_loop_matches_stepwise(tiny_model):
    """The fused on-device while_loop must emit exactly what manual
    step-by-step decoding emits."""
    cfg, params, rope = tiny_model
    caches = setup(cfg)
    prompt = list(range(1, 9))
    seq, info, _ = generate(cfg, params, rope, caches, prompt, 12)

    caches = setup(cfg)
    toks = jnp.asarray([prompt + [0] * 8], jnp.int32)  # pad to bucket 16
    logits, caches = T.prefill(cfg, params, rope, caches, toks, 8)
    manual = [int(jnp.argmax(logits, -1)[0])]
    pos = 8
    for _ in range(11):
        tok = jnp.asarray([manual[-1]], jnp.int32)
        logits, caches = T.decode_step(
            cfg, params, rope, caches, tok, jnp.int32(pos)
        )
        manual.append(int(jnp.argmax(logits, -1)[0]))
        pos += 1
    assert seq[8:] == manual


def test_terminator_stops_generation(tiny_model):
    cfg, params, rope = tiny_model
    caches = setup(cfg)
    prompt = list(range(1, 9))
    # Find what the model wants to emit, then declare it a terminator.
    seq, _, _ = generate(cfg, params, rope, caches, prompt, 12)
    second = seq[9]  # first decoded-by-loop token
    caches = setup(cfg)
    seq2, info, _ = generate(
        cfg, params, rope, caches, prompt, 12, terminator_ids=[second]
    )
    # Generation stops at (and includes) the terminator.
    assert seq2[-1] == second
    assert len(seq2) < len(seq) or seq[-1] == second


def test_teacher_forcing_ppl_mode(tiny_model):
    """next_tokens forces the emitted sequence and records per-token probs."""
    cfg, params, rope = tiny_model
    caches = setup(cfg)
    prompt = list(range(1, 9))
    forced = [5, 7, 11, 13, 17]
    seq, info, _ = generate(
        cfg, params, rope, caches, prompt, 3, next_tokens=forced
    )
    assert seq == prompt + forced
    probs = info["emitted_probs"]
    assert len(probs) == len(forced)
    assert all(0.0 <= p <= 1.0 for p in probs)
    # Teacher-forced tokens must ignore terminators.
    caches = setup(cfg)
    seq2, _, _ = generate(
        cfg,
        params,
        rope,
        caches,
        prompt,
        3,
        next_tokens=forced,
        terminator_ids=[7],
    )
    assert seq2 == prompt + forced


def test_feed_long_prompts(tiny_model):
    """Prompt beyond the min cache length is split and fed via decode."""
    cfg, params, rope = tiny_model
    caches = setup(cfg, strategy="recent_global", C=16, global_tokens=2)
    prompt = list(range(1, 33))  # 32 tokens, budget 16
    seq, info, _ = generate(
        cfg, params, rope, caches, prompt, 4, feed_long_prompts=True
    )
    # The prompt part of the sequence is preserved verbatim.
    assert seq[:32] == prompt
    assert info["prompt_length"] == 15  # min_cache_length - 1
    assert len(seq) == 36


def test_prompt_exactly_cache_length_edge(tiny_model):
    """|prompt| == min cache length triggers the split-by-one edge case
    (reference: generation_utils.py:428-434)."""
    cfg, params, rope = tiny_model
    caches = setup(cfg, strategy="recent_global", C=16, global_tokens=2)
    prompt = list(range(1, 17))  # exactly 16
    seq, info, _ = generate(cfg, params, rope, caches, prompt, 4)
    assert seq[:16] == prompt
    assert info["prompt_length"] == 15


def test_compressed_prompt_generation(tiny_model):
    """Generation with |prompt| > budget runs through prompt compression."""
    cfg, params, rope = tiny_model
    caches = setup(cfg, strategy="recent_global", C=16, global_tokens=2)
    prompt = list(range(1, 41))  # 40 > 16
    seq, info, caches = generate(cfg, params, rope, caches, prompt, 8)
    assert len(seq) == 48
    assert int(LV(caches, 0).cache_ct[0, 0]) == 16  # saturated at budget


def test_heavy_hitter_end_to_end(tiny_model):
    cfg, params, rope = tiny_model
    caches = setup(
        cfg, strategy="heavy_hitter", C=16, global_tokens=1, recent_window=4
    )
    prompt = list(range(1, 41))
    seq, info, caches = generate(cfg, params, rope, caches, prompt, 8)
    assert len(seq) == 48
    assert int(LV(caches, 0).extra["attn_counter"]) > 0


def test_build_cache_specs_patterns(tiny_cfg):
    specs = build_cache_specs(
        tiny_cfg,
        {"cache_strategy": ["full"], "max_cache_length": [0.5]},
        max_seq_length=100,
    )
    assert all(s.max_cache_length == 56 for s in specs)  # round(50) -> mult of 8

    specs = build_cache_specs(
        tiny_cfg,
        {
            "cache_strategy": ["recent_global", "l2"],
            "max_cache_length": [32, 64],
            "cache_strategy_pattern": "repeat",
        },
        max_seq_length=128,
    )
    assert [s.cache_strategy for s in specs] == ["recent_global", "l2"]
    assert min_cache_length(specs) == 32

    # Fractional recent_window resolves per layer.
    specs = build_cache_specs(
        tiny_cfg,
        {
            "cache_strategy": ["recent_global"],
            "max_cache_length": [64],
            "recent_window": 0.25,
        },
        max_seq_length=128,
    )
    assert all(s.recent_window == 16 for s in specs)


def test_cache_compatibility_checks():
    with pytest.raises(AssertionError):
        cache_compatibility(
            {
                "max_cache_length": [0.5],
                "cache_strategy": ["heavy_hitter"],
                "prompt_compression_strategy": ["recent_global"],
            }
        )
    with pytest.raises(AssertionError):
        cache_compatibility(
            {
                "max_cache_length": [0.5],
                "cache_strategy": ["full"],
                "prompt_compression_strategy": ["full"],
            }
        )


def test_merge_cache_config_yaml():
    import argparse

    from cold_compress_tpu.utils.cli import merge_cache_config

    args = argparse.Namespace(
        cache_config="heavy_hitter", cache_strategy=["full"], global_tokens=1
    )
    merged = merge_cache_config(args)
    assert merged.cache_strategy == ["heavy_hitter"]
    assert merged.global_tokens == 4
    assert merged.history_window_size == 400
