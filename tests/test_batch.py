"""Batched generation: B lanes with unequal prompt lengths must reproduce
the corresponding single-prompt runs token-for-token (per-lane positions,
per-lane compression, per-lane terminators)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cold_compress_tpu.caches import CacheSpec
from cold_compress_tpu.models import transformer as T
from cold_compress_tpu.models.config import ModelConfig
from cold_compress_tpu.runtime.generate import generate, generate_batch

MAX_SEQ = 64


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig.from_name("TestTiny")
    params = T.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rope = T.make_rope_table(cfg)
    return cfg, params, rope


def make_caches(cfg, strategy, C, B, pcs="recent_global"):
    specs = tuple(
        CacheSpec(
            cache_strategy=strategy,
            max_cache_length=C,
            max_seq_length=MAX_SEQ,
            global_tokens=2,
            recent_window=4,
            prompt_compression_strategy=pcs,
        )
        for _ in range(cfg.n_layer)
    )
    caches = T.init_caches(cfg, specs, B, jnp.float32)
    return caches


PROMPTS = [
    list(range(5, 25)),          # 20 tokens
    list(range(40, 73)),         # 33 tokens
    list(range(7, 47)),          # 40 tokens
]


@pytest.mark.parametrize(
    "strategy,C,pcs",
    [
        ("full", MAX_SEQ, "recent_global"),
        ("recent_global", 24, "recent_global"),
        ("l2", 24, "l2"),
        ("heavy_hitter", 24, "heavy_hitter"),
    ],
)
def test_batched_matches_sequential(setup, strategy, C, pcs):
    cfg, params, rope = setup
    n_new = 8
    # Shared prefill bucket so batched and single runs see identical padding.
    bucket = 64 if strategy == "full" else 64

    singles = []
    for p in PROMPTS:
        caches = make_caches(cfg, strategy, C, 1, pcs)
        stacked = T.is_stacked(caches)
        ps = T.stack_layer_params(params) if stacked else params
        seq, info, _ = generate(
            cfg, ps, rope, caches, p, n_new, prefill_bucket=bucket
        )
        singles.append(seq)

    caches = make_caches(cfg, strategy, C, len(PROMPTS), pcs)
    ps = T.stack_layer_params(params) if T.is_stacked(caches) else params
    seqs, info, _ = generate_batch(
        cfg, ps, rope, caches, PROMPTS, n_new, prefill_bucket=bucket
    )

    assert info["perf_stats"]["batch_size"] == len(PROMPTS)
    for b, (got, want) in enumerate(zip(seqs, singles)):
        assert got == want, f"lane {b} diverged: {got} vs {want}"


def test_batched_terminators_stop_lanes_independently(setup):
    cfg, params, rope = setup
    caches = make_caches(cfg, "recent_global", 24, 2)
    ps = T.stack_layer_params(params) if T.is_stacked(caches) else params
    # Run once to find what each lane generates, then rerun using lane 0's
    # second generated token as a terminator: lane 0 must stop early, lane 1
    # must keep generating (unless it happens to emit the same token).
    prompts = [PROMPTS[0], PROMPTS[1]]
    seqs, info, _ = generate_batch(
        cfg, ps, rope, caches, prompts, 8, prefill_bucket=64
    )
    lane0_gen = seqs[0][len(prompts[0]):]
    term = lane0_gen[2]
    caches = make_caches(cfg, "recent_global", 24, 2)
    seqs2, info2, _ = generate_batch(
        cfg, ps, rope, caches, prompts, 8, prefill_bucket=64,
        terminator_ids=[term],
    )
    gen0 = seqs2[0][len(prompts[0]):]
    assert gen0 == lane0_gen[: 3], "lane 0 should stop at its terminator"
    if term not in seqs[1][len(prompts[1]):]:
        assert seqs2[1] == seqs[1], "lane 1 should be unaffected"


def test_batched_single_lane_matches_generate(setup):
    cfg, params, rope = setup
    caches = make_caches(cfg, "recent_global", 24, 1)
    ps = T.stack_layer_params(params) if T.is_stacked(caches) else params
    seq, _, _ = generate(
        cfg, ps, rope, caches, PROMPTS[0], 6, prefill_bucket=32
    )
    caches = make_caches(cfg, "recent_global", 24, 1)
    seqs, _, _ = generate_batch(
        cfg, ps, rope, caches, [PROMPTS[0]], 6, prefill_bucket=32
    )
    assert seqs[0] == seq
