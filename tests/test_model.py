"""Model-core correctness: decode/prefill consistency, padding invariance,
RoPE scaling, config registry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cold_compress_tpu.models.transformer import layer_cache as LV

from cold_compress_tpu.caches.base import CacheSpec
from cold_compress_tpu.models import transformer as T
from cold_compress_tpu.models.config import ModelConfig


def full_specs(cfg, C):
    return tuple(
        CacheSpec(cache_strategy="full", max_cache_length=C, max_seq_length=C)
        for _ in range(cfg.n_layer)
    )


def test_config_registry_fuzzy():
    cfg = ModelConfig.from_name("checkpoints/meta-llama/Meta-Llama-3-8B-Instruct")
    assert cfg.n_kv_head == 8 and cfg.vocab_size == 128256
    cfg2 = ModelConfig.from_name("Qwen2-7B-Instruct")
    assert cfg2.attention_bias and cfg2.n_kv_head == 4
    with pytest.raises(ValueError):
        ModelConfig.from_name("no-such-model-zzz")


def test_decode_matches_prefill(tiny_model):
    """Incremental decoding with a full cache must reproduce the logits of a
    single long prefill (the reference's core contract: masked fixed-size
    cache attention == causal attention)."""
    cfg, params, rope = tiny_model
    C = 64
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0, cfg.vocab_size)

    # One-shot prefill over the first 12 tokens, then decode 4.
    caches = T.init_caches(cfg, full_specs(cfg, C), 1, jnp.float32)
    logits, caches = T.prefill(cfg, params, rope, caches, toks[:, :12], 12)
    for i in range(12, 16):
        logits, caches = T.decode_step(
            cfg, params, rope, caches, toks[:, i], jnp.int32(i)
        )

    # Reference: prefill over all 16 tokens at once.
    caches2 = T.init_caches(cfg, full_specs(cfg, C), 1, jnp.float32)
    # prefill consumes tokens[0..16) and returns logits at position 15;
    # decode path above fed token 15 at pos 15 -> same prediction point.
    logits_ref, _ = T.prefill(cfg, params, rope, caches2, toks, 16)

    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(logits_ref), rtol=2e-4, atol=2e-4
    )


def test_prefill_padding_invariance(tiny_model):
    """Prefill over a padded buffer must equal prefill over the exact prompt."""
    cfg, params, rope = tiny_model
    toks = jax.random.randint(jax.random.PRNGKey(2), (1, 10), 0, cfg.vocab_size)
    padded = jnp.pad(toks, ((0, 0), (0, 22)))  # pad id 0 beyond prompt_len

    caches_a = T.init_caches(cfg, full_specs(cfg, 64), 1, jnp.float32)
    la, ca = T.prefill(cfg, params, rope, caches_a, toks, 10)
    caches_b = T.init_caches(cfg, full_specs(cfg, 64), 1, jnp.float32)
    lb, cb = T.prefill(cfg, params, rope, caches_b, padded, 10)

    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-5, atol=1e-5)
    # Padded slots must be masked out and uncounted.
    assert int(LV(cb, 0).cache_ct[0, 0]) == 10
    assert not bool(LV(cb, 0).mask[0, 0, 10:].any())

    # And decoding after the padded prefill matches the unpadded path.
    nxt = jnp.argmax(la, -1).astype(jnp.int32)
    da, _ = T.decode_step(cfg, params, rope, ca, nxt, jnp.int32(10))
    db, _ = T.decode_step(cfg, params, rope, cb, nxt, jnp.int32(10))
    np.testing.assert_allclose(np.asarray(da), np.asarray(db), rtol=1e-5, atol=1e-5)


def test_gqa_vs_mha_equivalence():
    """A GQA model with duplicated KV heads must equal full MHA attention."""
    from cold_compress_tpu.ops.attention import gqa_attention

    key = jax.random.PRNGKey(0)
    B, H, KVH, L, S, D = 2, 4, 2, 1, 8, 16
    q = jax.random.normal(key, (B, H, L, D))
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, KVH, S, D))
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, KVH, S, D))
    out, _ = gqa_attention(q, k, v)
    k_rep = jnp.repeat(k, H // KVH, axis=1)
    v_rep = jnp.repeat(v, H // KVH, axis=1)
    out_ref, _ = gqa_attention(q, k_rep, v_rep)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), rtol=1e-5, atol=1e-5)


def test_attention_probs_sum_to_one():
    from cold_compress_tpu.ops.attention import gqa_attention

    key = jax.random.PRNGKey(3)
    B, H, KVH, S, D = 1, 4, 2, 12, 8
    q = jax.random.normal(key, (B, H, 1, D))
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, KVH, S, D))
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, KVH, S, D))
    mask = jnp.arange(S)[None, None, None, None, :] < 7
    _, attn = gqa_attention(q, k, v, mask=mask, return_attn=True)
    assert attn.shape == (B, KVH, 1, S)
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, rtol=1e-5)
    assert float(attn[..., 7:].sum()) < 1e-6


def test_rope_llama31_scaling():
    from cold_compress_tpu.models.config import RopeScaling
    from cold_compress_tpu.models.rope import precompute_freqs_cis

    plain = precompute_freqs_cis(64, 32, 500000.0)
    scaled = precompute_freqs_cis(
        64, 32, 500000.0, RopeScaling(original_max_position_embeddings=32)
    )
    assert plain.shape == scaled.shape == (64, 16, 2)
    # Low-frequency (late) components get divided by factor -> different.
    assert not np.allclose(np.asarray(plain), np.asarray(scaled))
    # Highest-frequency component is untouched.
    np.testing.assert_allclose(
        np.asarray(plain[:, 0]), np.asarray(scaled[:, 0]), rtol=1e-6
    )


def test_attn_top_k_decode(tiny_model):
    """attn_top_k=1.0 and a top_k that covers all unmasked slots must agree."""
    from cold_compress_tpu.ops.attention import gqa_attention

    key = jax.random.PRNGKey(5)
    B, H, KVH, S, D = 1, 4, 2, 16, 8
    q = jax.random.normal(key, (B, H, 1, D))
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, KVH, S, D))
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, KVH, S, D))
    full, _ = gqa_attention(q, k, v)
    # top_k = S is the dense path; top_k = S via fraction 1.0 -> equal
    sparse, _ = gqa_attention(q, k, v, attn_top_k=1.0)
    np.testing.assert_allclose(np.asarray(full), np.asarray(sparse), rtol=1e-5)
    # Half the slots: output is a valid convex combination of values.
    half, _ = gqa_attention(q, k, v, attn_top_k=0.5)
    assert np.isfinite(np.asarray(half)).all()


def test_tied_embeddings_forward():
    cfg = ModelConfig.from_name("TestTiny").replace(tie_word_embeddings=True)
    params = T.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    assert params["output"] is None
    rope = T.make_rope_table(cfg)
    caches = T.init_caches(cfg, full_specs(cfg, 32), 1, jnp.float32)
    logits, _ = T.prefill(
        cfg, params, rope, caches, jnp.array([[1, 2, 3]]), 3
    )
    assert logits.shape == (1, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
