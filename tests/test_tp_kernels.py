"""shard_map tensor-parallel decode/prefill (parallel/tp_decode.py).

Validates the per-device-kernel TP run mode against single-device runs:
bf16 exactly, and the quantized path (per-shard colpack repacks + Pallas
kernels in interpret mode) within activation-quantization tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cold_compress_tpu.models import transformer as T
from cold_compress_tpu.models.config import ModelConfig
from cold_compress_tpu.parallel.tp_decode import prepare_tp
from cold_compress_tpu.quantization.weight_quant import quantize_params
from cold_compress_tpu.runtime.engine import build_cache_specs
from cold_compress_tpu.runtime.generate import generate

PROMPT = np.random.RandomState(2).randint(2, 500, size=200).tolist()
FORCED = np.random.RandomState(3).randint(2, 500, size=8).tolist()

GATES = ("CCT_PALLAS_INTERPRET", "CCT_FUSED_EVICT", "CCT_TILED_HEAD",
         "CCT_PREFILL_W4A8")


@pytest.fixture(scope="module")
def tp_model():
    # TestKernel widened so tp=2 divides the KV heads and the local head
    # dim stays kernel-aligned (128).
    cfg = ModelConfig.from_name("TestKernel").replace(
        dim=512, n_head=4, n_kv_head=2
    )
    assert cfg.head_dim == 128
    params = T.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rope = T.make_rope_table(cfg)
    return cfg, params, rope


def make_caches(cfg):
    specs = build_cache_specs(
        cfg,
        {
            "cache_strategy": ["heavy_hitter"],
            "max_cache_length": [0.25],
            "prompt_compression_strategy": ["heavy_hitter"],
            "global_tokens": 4,
            "recent_window": 10,
        },
        max_seq_length=512,
    )
    return T.init_caches(cfg, specs, 1, jnp.bfloat16)


def run_single(cfg, params, rope, env, monkeypatch, teacher=False,
               decode_layout=False):
    for k in GATES:
        monkeypatch.delenv(k, raising=False)
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    jax.clear_caches()
    p = T.stack_layer_params(params)
    if decode_layout:
        p = T.colpack_layer_params(p)
        if env.get("CCT_TILED_HEAD") == "1":
            p = T.tile_output_head(p)
    kw = dict(prefill_bucket=512)
    if teacher:
        kw["next_tokens"] = FORCED
    seq, info, _ = generate(
        cfg, p, rope, make_caches(cfg), PROMPT, 8, **kw
    )
    return seq, np.asarray(info["emitted_probs"], np.float64), np.asarray(
        info["final_probs"], np.float64
    )


def run_tp(cfg, params, rope, env, tp, monkeypatch, teacher=False):
    for k in GATES:
        monkeypatch.delenv(k, raising=False)
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    jax.clear_caches()
    ctx = prepare_tp(cfg, params, tp)
    kw = dict(prefill_bucket=512, tp_ctx=ctx)
    if teacher:
        kw["next_tokens"] = FORCED
    seq, info, _ = generate(
        cfg, params, rope, make_caches(cfg), PROMPT, 8, **kw
    )
    return seq, np.asarray(info["emitted_probs"], np.float64), np.asarray(
        info["final_probs"], np.float64
    )


def test_tp_bf16_matches_single(tp_model, monkeypatch):
    """Dense weights: column/row sharding + psums are the same math as the
    single-device dots (up to f32 partial-sum order)."""
    cfg, params, rope = tp_model
    s0, e0, f0 = run_single(cfg, params, rope, {}, monkeypatch)
    s1, e1, f1 = run_tp(cfg, params, rope, {}, 2, monkeypatch)
    assert s1 == s0
    np.testing.assert_allclose(f1, f0, atol=2e-2)


def test_tp_bf16_four_way(monkeypatch):
    cfg = ModelConfig.from_name("TestKernel").replace(
        dim=512, n_head=4, n_kv_head=4
    )
    params = T.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.bfloat16)
    rope = T.make_rope_table(cfg)
    # Teacher-forced: 4-way psum partial-sum order can legitimately flip a
    # near-tied greedy pick, so compare per-step probabilities instead.
    s0, e0, f0 = run_single(cfg, params, rope, {}, monkeypatch, teacher=True)
    s1, e1, f1 = run_tp(cfg, params, rope, {}, 4, monkeypatch, teacher=True)
    assert s1 == s0
    np.testing.assert_allclose(e1, e0, atol=2e-2)
    np.testing.assert_allclose(f1, f0, atol=2e-2)


@pytest.mark.parametrize("head_mode", ["int8", "int4"])
def test_tp_int4_kernels_match_single_device(tp_model, monkeypatch,
                                             head_mode):
    """int4 layers under TP ride the SAME Pallas kernels as tp=1 (per-shard
    colpack), here in interpret mode. Row-parallel W4A8 quantizes
    activations per local IN segment, so compare teacher-forced step probs
    with tolerance."""
    cfg, params, rope = tp_model
    qp = quantize_params(
        params, mode="int4", group_size=128, output_mode=head_mode
    )
    env = {
        "CCT_PALLAS_INTERPRET": "1",
        "CCT_FUSED_EVICT": "1",
        "CCT_TILED_HEAD": "1",
    }
    s0, e0, f0 = run_single(cfg, qp, rope, env, monkeypatch, teacher=True,
                            decode_layout=True)
    s1, e1, f1 = run_tp(cfg, qp, rope, env, 2, monkeypatch, teacher=True)
    assert s1 == s0  # teacher-forced: both emit the forced stream
    np.testing.assert_allclose(e1, e0, atol=5e-2)
    np.testing.assert_allclose(f1, f0, atol=5e-2)


def test_tp_batched_matches_single(tp_model, monkeypatch):
    """generate_batch under shard_map TP: per-lane positions/terminators
    ride the replicated loop state; tokens must match the single-device
    batched run."""
    from cold_compress_tpu.runtime.generate import generate_batch

    cfg, params, rope = tp_model
    prompts = [PROMPT[:120], PROMPT[:77]]

    def batch_caches():
        specs = build_cache_specs(
            cfg,
            {
                "cache_strategy": ["heavy_hitter"],
                "max_cache_length": [0.25],
                "prompt_compression_strategy": ["heavy_hitter"],
                "global_tokens": 4,
                "recent_window": 10,
            },
            max_seq_length=512,
        )
        return T.init_caches(cfg, specs, 2, jnp.bfloat16)

    for k in GATES:
        monkeypatch.delenv(k, raising=False)
    jax.clear_caches()
    p = T.stack_layer_params(params)
    seqs0, _, _ = generate_batch(
        cfg, p, rope, batch_caches(), prompts, 8, prefill_bucket=512
    )
    ctx = prepare_tp(cfg, params, 2)
    seqs1, _, _ = generate_batch(
        cfg, params, rope, batch_caches(), prompts, 8,
        prefill_bucket=512, tp_ctx=ctx,
    )
    assert seqs1 == seqs0


def test_dp_tp_batched_matches_single(tp_model, monkeypatch):
    """2-D (dp=2, tp=2) mesh: batch lanes shard over dp, heads over tp;
    per-lane early termination must see every lane's done flag through the
    dp all_gather. Tokens match the single-device batched run."""
    from cold_compress_tpu.runtime.generate import generate_batch

    cfg, _, rope = tp_model
    # f32 weights: bf16 psum reordering can legitimately flip a near-tied
    # greedy pick late in generation; f32 keeps the comparison exact.
    params = T.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    prompts = [PROMPT[:120], PROMPT[:77], PROMPT[:150], PROMPT[:50]]

    def batch_caches():
        specs = build_cache_specs(
            cfg,
            {
                "cache_strategy": ["heavy_hitter"],
                "max_cache_length": [0.25],
                "prompt_compression_strategy": ["heavy_hitter"],
                "global_tokens": 4,
                "recent_window": 10,
            },
            max_seq_length=512,
        )
        return T.init_caches(cfg, specs, 4, jnp.float32)

    for k in GATES:
        monkeypatch.delenv(k, raising=False)
    jax.clear_caches()
    p = T.stack_layer_params(params)
    seqs0, _, _ = generate_batch(
        cfg, p, rope, batch_caches(), prompts, 8, prefill_bucket=512
    )
    ctx = prepare_tp(cfg, params, 2, dp=2)
    seqs1, _, _ = generate_batch(
        cfg, params, rope, batch_caches(), prompts, 8,
        prefill_bucket=512, tp_ctx=ctx,
    )
    assert seqs1 == seqs0


def test_tp_int4_xla_fallback_matches(tp_model, monkeypatch):
    """Without the interpret override (plain CPU) the TP path must still be
    numerically right via its local XLA dequant fallbacks."""
    cfg, params, rope = tp_model
    qp = quantize_params(
        params, mode="int4", group_size=128, output_mode="int8"
    )
    s0, e0, f0 = run_single(cfg, qp, rope, {}, monkeypatch, teacher=True)
    s1, e1, f1 = run_tp(cfg, qp, rope, {}, 2, monkeypatch, teacher=True)
    np.testing.assert_allclose(e1, e0, atol=2e-2)
    np.testing.assert_allclose(f1, f0, atol=2e-2)
