"""Fused q|k|v / w1|w3 projections must be numerically identical to the
unfused layout (concatenation along the output axis leaves every output
column's dot product — and its quantization metadata — unchanged)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cold_compress_tpu.caches import CacheSpec
from cold_compress_tpu.models import transformer as T
from cold_compress_tpu.models.config import ModelConfig
from cold_compress_tpu.ops.linear import is_quantized
from cold_compress_tpu.runtime.generate import generate

MAX_SEQ = 64


def make_caches(cfg, B=1):
    specs = tuple(
        CacheSpec(
            cache_strategy="heavy_hitter",
            max_cache_length=24,
            max_seq_length=MAX_SEQ,
            global_tokens=2,
            recent_window=4,
            prompt_compression_strategy="heavy_hitter",
        )
        for _ in range(cfg.n_layer)
    )
    return T.init_caches(cfg, specs, B, jnp.float32)


def run(cfg, params, rope, stacked_fused: bool):
    ps = T.stack_layer_params(params)
    if stacked_fused:
        ps = T.fuse_layer_params(ps)
    caches = make_caches(cfg)
    seq, info, _ = generate(
        cfg, ps, rope, caches, list(range(5, 40)), 8, prefill_bucket=64
    )
    return seq


@pytest.mark.parametrize("quantized", [False, True])
def test_fused_matches_unfused(quantized):
    cfg = ModelConfig.from_name("TestTiny")
    params = T.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    if quantized:
        from cold_compress_tpu.quantization.weight_quant import (
            quantize_params,
        )

        params = quantize_params(params, mode="int4", group_size=32)
    rope = T.make_rope_table(cfg)
    ref = run(cfg, params, rope, stacked_fused=False)
    fused = run(cfg, params, rope, stacked_fused=True)
    assert ref == fused


def test_fuse_layer_params_structure():
    cfg = ModelConfig.from_name("TestTiny")
    params = T.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    stacked = T.stack_layer_params(params)
    fused = T.fuse_layer_params(stacked)
    attn = fused["layers"]["attn"]
    assert "wqkv" in attn and "wq" not in attn
    D = cfg.dim
    assert attn["wqkv"].shape == (
        cfg.n_layer,
        D,
        (cfg.n_head + 2 * cfg.n_kv_head) * cfg.head_dim,
    )
    ffn = fused["layers"]["ffn"]
    assert "w13" in ffn and "w1" not in ffn
    assert ffn["w13"].shape == (
        cfg.n_layer,
        D,
        2 * cfg.intermediate_size,
    )
    # Fusing twice is a no-op (idempotent on already-fused trees).
    again = T.fuse_layer_params(fused)
    assert again["layers"]["attn"]["wqkv"].shape == attn["wqkv"].shape


def test_fused_quantized_metadata():
    cfg = ModelConfig.from_name("TestTiny")
    from cold_compress_tpu.quantization.weight_quant import quantize_params

    params = quantize_params(
        T.init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32),
        mode="int4",
        group_size=32,
    )
    stacked = T.stack_layer_params(params)
    fused = T.fuse_layer_params(stacked)
    leaf = fused["layers"]["attn"]["wqkv"]
    assert is_quantized(leaf)
    ref = stacked["layers"]["attn"]
    np.testing.assert_array_equal(
        np.asarray(leaf.w[..., : ref["wq"].w.shape[-1]]),
        np.asarray(ref["wq"].w),
    )
    np.testing.assert_array_equal(
        np.asarray(leaf.scales[..., -ref["wv"].scales.shape[-1] :]),
        np.asarray(ref["wv"].scales),
    )
