"""Golden-checkpoint validation: convert a real HF-format Llama checkpoint
(built locally with `transformers`, no network) and assert our model's
logits against the HF implementation's. Any RoPE-permutation, transpose, or
weight-mapping bug in scripts/convert_hf_checkpoint.py flips these
(reference converter: scripts/convert_hf_checkpoint.py:82-170)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cold_compress_tpu.models import transformer as T  # noqa: E402
from cold_compress_tpu.runtime.engine import load_model  # noqa: E402

import sys
from pathlib import Path

sys.path.append(str(Path(__file__).resolve().parent.parent / "scripts"))
from convert_hf_checkpoint import (  # noqa: E402
    convert_hf_checkpoint,
    permute_rope,
)

VOCAB, DIM, HEADS, KV, FFN, LAYERS = 512, 64, 4, 2, 128, 2


def build_hf_model(seed=0, attention_bias=False, tie=False):
    torch.manual_seed(seed)
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB,
        hidden_size=DIM,
        intermediate_size=FFN,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        num_key_value_heads=KV,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        attention_bias=attention_bias,
        tie_word_embeddings=tie,
    )
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    # Round weights through bf16 so the HF forward (f32) and our forward
    # (f32 from bf16 checkpoint storage) see identical effective weights —
    # keeps the logit comparison tight without hiding layout bugs.
    with torch.no_grad():
        for p in model.parameters():
            p.data = p.data.to(torch.bfloat16).to(torch.float32)
    return model


def hf_last_logits(model, ids):
    with torch.no_grad():
        out = model(torch.tensor([ids], dtype=torch.long)).logits
    return out[0, -1].float().numpy()


def our_last_logits(npz_path, ids, model_name="TestTiny"):
    cfg, params, rope = load_model(
        str(npz_path), precision=jnp.float32, model_name=model_name
    )
    from cold_compress_tpu.caches import CacheSpec

    specs = tuple(
        CacheSpec(
            cache_strategy="full", max_cache_length=64, max_seq_length=64
        )
        for _ in range(cfg.n_layer)
    )
    caches = T.init_caches(cfg, specs, 1, jnp.float32)
    if T.is_stacked(caches):
        params = T.stack_layer_params(params)
    tokens = jnp.asarray([ids], jnp.int32)
    logits, _ = T.prefill(
        cfg, params, rope, caches, tokens, jnp.int32(len(ids))
    )
    return np.asarray(logits[0])


IDS = [1, 5, 99, 210, 7, 450, 33, 12, 301, 17, 2, 64]


def assert_logits_close(got, want):
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    assert int(np.argmax(got)) == int(np.argmax(want))


def test_hf_safetensors_roundtrip(tmp_path):
    """HF half-split RoPE path: q/k weights must be permuted to the
    interleaved layout our rope module uses."""
    model = build_hf_model(seed=0)
    ckpt = tmp_path / "TestTiny"
    model.save_pretrained(ckpt, safe_serialization=True)
    npz = convert_hf_checkpoint(ckpt)
    for n in (4, 9, len(IDS)):  # several lengths: position-dependent bugs
        assert_logits_close(
            our_last_logits(npz, IDS[:n]), hf_last_logits(model, IDS[:n])
        )


def test_qwen2_attention_bias_roundtrip(tmp_path):
    """Real Qwen2 architecture: q/k/v projection biases (no o bias) must
    ride the same RoPE permutation as the weight rows. HF zero-initializes
    biases, so they are randomized here — with zeros this golden would
    pass even if the converter dropped or mis-permuted every bias."""
    torch.manual_seed(1)
    cfg_hf = transformers.Qwen2Config(
        vocab_size=VOCAB,
        hidden_size=DIM,
        intermediate_size=FFN,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        num_key_value_heads=KV,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
    )
    model = transformers.Qwen2ForCausalLM(cfg_hf)
    model.eval()
    with torch.no_grad():
        for n, p in model.named_parameters():
            if n.endswith(".bias"):
                p.data = torch.randn_like(p.data) * 0.5
            p.data = p.data.to(torch.bfloat16).to(torch.float32)
    assert any(
        n.endswith("q_proj.bias") for n, _ in model.named_parameters()
    ), "Qwen2 config stopped emitting qkv biases; test needs updating"
    ckpt = tmp_path / "TestTiny"
    model.save_pretrained(ckpt, safe_serialization=True)
    npz = convert_hf_checkpoint(ckpt)
    assert_logits_close(
        our_last_logits(npz, IDS), hf_last_logits(model, IDS)
    )


def test_tied_embedding_fallback(tmp_path):
    """No lm_head in the checkpoint -> output head reuses the embedding."""
    model = build_hf_model(seed=2, tie=True)
    ckpt = tmp_path / "TestTiny"
    model.save_pretrained(ckpt, safe_serialization=True)
    npz = convert_hf_checkpoint(ckpt)
    assert_logits_close(
        our_last_logits(npz, IDS[:8]), hf_last_logits(model, IDS[:8])
    )


def test_rope_scaling_llama31_matches_hf(tmp_path):
    """Llama-3.1 RoPE frequency scaling: our smooth low/high-frequency
    interpolation (models/transformer.py::precompute_freqs_cis, reference
    model.py:124-130) must match HF's ``rope_type='llama3'`` exactly —
    none of the other golden tests exercise the scaling branch, so a bug
    in the wavelength thresholds or smooth factor would pass them all."""
    scaling = dict(
        factor=8.0,
        low_freq_factor=1.0,
        high_freq_factor=4.0,
        original_max_position_embeddings=32,
    )
    torch.manual_seed(4)
    cfg_hf = transformers.LlamaConfig(
        vocab_size=VOCAB,
        hidden_size=DIM,
        intermediate_size=FFN,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        num_key_value_heads=KV,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        rope_scaling=dict(rope_type="llama3", **scaling),
    )
    model = transformers.LlamaForCausalLM(cfg_hf)
    model.eval()
    with torch.no_grad():
        for p in model.parameters():
            p.data = p.data.to(torch.bfloat16).to(torch.float32)
    ckpt = tmp_path / "TestTiny"
    model.save_pretrained(ckpt, safe_serialization=True)
    npz = convert_hf_checkpoint(ckpt)

    from cold_compress_tpu.models.config import RopeScaling

    cfg, params, _ = load_model(
        str(npz), precision=jnp.float32, model_name="TestTiny"
    )
    cfg = cfg.replace(rope_scaling=RopeScaling(**scaling))
    rope = T.make_rope_table(cfg)
    from cold_compress_tpu.caches import CacheSpec

    specs = tuple(
        CacheSpec(
            cache_strategy="full", max_cache_length=64, max_seq_length=64
        )
        for _ in range(cfg.n_layer)
    )
    caches = T.init_caches(cfg, specs, 1, jnp.float32)
    if T.is_stacked(caches):
        params = T.stack_layer_params(params)
    # Positions past original_max/4 hit all three scaling regimes for
    # head_dim 16 at theta 1e4 (wavelengths span 6.3 .. 628).
    ids = (IDS * 5)[:48]
    logits, _ = T.prefill(
        cfg, params, rope, caches, jnp.asarray([ids], jnp.int32),
        jnp.int32(len(ids)),
    )
    assert_logits_close(np.asarray(logits[0]), hf_last_logits(model, ids))


def test_meta_consolidated_roundtrip(tmp_path):
    """Meta 'original/consolidated.00.pth' path: weights are already
    RoPE-interleaved, so the converter must NOT permute them."""
    model = build_hf_model(seed=3)
    sd = model.state_dict()
    head_dim = DIM // HEADS
    meta = {}
    for i in range(LAYERS):
        p = f"model.layers.{i}."
        m = f"layers.{i}."
        meta[m + "attention.wq.weight"] = torch.tensor(
            permute_rope(sd[p + "self_attn.q_proj.weight"].numpy(), HEADS,
                         head_dim)
        )
        meta[m + "attention.wk.weight"] = torch.tensor(
            permute_rope(sd[p + "self_attn.k_proj.weight"].numpy(), KV,
                         head_dim)
        )
        meta[m + "attention.wv.weight"] = sd[p + "self_attn.v_proj.weight"]
        meta[m + "attention.wo.weight"] = sd[p + "self_attn.o_proj.weight"]
        meta[m + "feed_forward.w1.weight"] = sd[p + "mlp.gate_proj.weight"]
        meta[m + "feed_forward.w3.weight"] = sd[p + "mlp.up_proj.weight"]
        meta[m + "feed_forward.w2.weight"] = sd[p + "mlp.down_proj.weight"]
        meta[m + "attention_norm.weight"] = sd[p + "input_layernorm.weight"]
        meta[m + "ffn_norm.weight"] = sd[p + "post_attention_layernorm.weight"]
    meta["tok_embeddings.weight"] = sd["model.embed_tokens.weight"]
    meta["norm.weight"] = sd["model.norm.weight"]
    meta["output.weight"] = sd["lm_head.weight"]

    ckpt = tmp_path / "TestTiny"
    (ckpt / "original").mkdir(parents=True)
    torch.save(meta, ckpt / "original" / "consolidated.00.pth")
    npz = convert_hf_checkpoint(ckpt)
    assert_logits_close(
        our_last_logits(npz, IDS), hf_last_logits(model, IDS)
    )
