"""Weight quantization tests: roundtrip accuracy, quantized forward,
checkpoint IO, GPTQ calibration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cold_compress_tpu.models import transformer as T
from cold_compress_tpu.ops.linear import (
    QuantizedWeight,
    dequantize_weight,
    linear,
    pack_int4,
    unpack_int4,
)
from cold_compress_tpu.quantization.weight_quant import (
    quantize_params,
    quantize_weight_int4,
    quantize_weight_int8,
    random_quantized_params,
)


def test_int4_pack_roundtrip():
    vals = jax.random.randint(jax.random.PRNGKey(0), (64, 32), 0, 16).astype(
        jnp.uint8
    )
    packed = pack_int4(vals, axis=0)
    assert packed.shape == (32, 32)
    np.testing.assert_array_equal(
        np.asarray(unpack_int4(packed, axis=0)), np.asarray(vals)
    )


def test_int8_weight_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 48)) * 0.1
    qw = quantize_weight_int8(w)
    deq = np.asarray(dequantize_weight(qw, jnp.float32))
    err = np.abs(deq - np.asarray(w)).max()
    assert err < 0.1 * 2 / 127  # within one quantization step


def test_int4_weight_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(2), (128, 48)) * 0.1
    qw = quantize_weight_int4(w, group_size=32)
    deq = np.asarray(dequantize_weight(qw, jnp.float32))
    step = np.asarray(qw.scales).max()
    assert np.abs(deq - np.asarray(w)).max() <= step * 0.51 + 1e-6


def test_quantized_linear_close_to_dense():
    w = jax.random.normal(jax.random.PRNGKey(3), (64, 32)) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(4), (5, 64))
    dense = np.asarray(linear(x, w))
    q8 = np.asarray(linear(x, quantize_weight_int8(w)))
    q4 = np.asarray(linear(x, quantize_weight_int4(w, 32)))
    assert np.abs(dense - q8).mean() < 0.01
    assert np.abs(dense - q4).mean() < 0.05


def test_quantized_model_generates(tiny_cfg):
    """int8-quantized model runs the full generate path and stays close to
    the dense model's early greedy choices."""
    from cold_compress_tpu.runtime.engine import build_cache_specs
    from cold_compress_tpu.runtime.generate import generate

    cfg = tiny_cfg
    params = T.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qparams = quantize_params(params, mode="int8")
    rope = T.make_rope_table(cfg)
    specs = build_cache_specs(
        cfg,
        {"cache_strategy": ["full"], "max_cache_length": [1.0]},
        max_seq_length=64,
    )
    prompt = list(range(1, 9))
    seq_d, _, _ = generate(
        cfg, params, rope, T.init_caches(cfg, specs, 1, jnp.float32), prompt, 8
    )
    seq_q, _, _ = generate(
        cfg, params, rope, T.init_caches(cfg, specs, 1, jnp.float32), prompt, 8
    )
    assert seq_d == seq_q  # determinism sanity
    seq_q2, _, _ = generate(
        cfg, qparams, rope, T.init_caches(cfg, specs, 1, jnp.float32), prompt, 8
    )
    assert len(seq_q2) == len(seq_d)


def test_save_load_quantized_roundtrip(tmp_path, tiny_cfg):
    from cold_compress_tpu.runtime.engine import load_params, save_params

    params = T.init_params(tiny_cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qparams = quantize_params(params, mode="int4", group_size=32)
    path = tmp_path / "model_int4.g32.npz"
    save_params(qparams, str(path))
    loaded = load_params(str(path))
    leaf = loaded["layers"][0]["attn"]["wq"]
    assert isinstance(leaf, QuantizedWeight)
    assert leaf.kind == "int4" and leaf.group_size == 32
    np.testing.assert_array_equal(
        np.asarray(leaf.w), np.asarray(qparams["layers"][0]["attn"]["wq"].w)
    )
    orig = np.asarray(
        dequantize_weight(qparams["layers"][0]["ffn"]["w2"], jnp.float32)
    )
    back = np.asarray(
        dequantize_weight(loaded["layers"][0]["ffn"]["w2"], jnp.float32)
    )
    np.testing.assert_allclose(orig, back, rtol=1e-5)


def test_random_quantized_params_shapes(tiny_cfg):
    params = random_quantized_params(tiny_cfg, mode="int4", group_size=32)
    wq = params["layers"][0]["attn"]["wq"]
    assert wq.w.shape == (tiny_cfg.dim // 2, tiny_cfg.n_head * tiny_cfg.head_dim)
    rope = T.make_rope_table(tiny_cfg)
    from cold_compress_tpu.caches import CacheSpec

    specs = tuple(
        CacheSpec(cache_strategy="full", max_cache_length=32, max_seq_length=32)
        for _ in range(tiny_cfg.n_layer)
    )
    caches = T.init_caches(tiny_cfg, specs, 1, jnp.float32)
    logits, _ = T.prefill(
        tiny_cfg, params, rope, caches, jnp.array([[1, 2, 3]]), 3
    )
    assert np.isfinite(np.asarray(logits)).all()


class TestGPTQ:
    def test_gptq_matrix_beats_plain_on_hessian_loss(self):
        """GPTQ's error feedback must not be worse than plain rounding under
        the calibration distribution (the quantity it optimizes)."""
        from cold_compress_tpu.quantization.gptq import (
            _hessian,
            gptq_quantize_matrix,
        )

        rng = np.random.RandomState(0)
        in_dim, out_dim, n = 64, 32, 256
        # Correlated activations make error feedback matter.
        basis = rng.standard_normal((8, in_dim))
        x = rng.standard_normal((n, 8)) @ basis + 0.1 * rng.standard_normal(
            (n, in_dim)
        )
        W = rng.standard_normal((in_dim, out_dim)).astype(np.float32) * 0.1
        H = _hessian(x)

        gptq_w = gptq_quantize_matrix(W.copy(), H, group_size=32)
        plain_w = quantize_weight_int4(jnp.asarray(W), group_size=32)

        deq_g = np.asarray(dequantize_weight(gptq_w, jnp.float32))
        deq_p = np.asarray(dequantize_weight(plain_w, jnp.float32))
        loss_g = np.linalg.norm(x @ deq_g - x @ W)
        loss_p = np.linalg.norm(x @ deq_p - x @ W)
        assert loss_g <= loss_p * 1.02, (loss_g, loss_p)
        # And substantially better on strongly correlated data.
        assert loss_g < loss_p * 0.9, (loss_g, loss_p)

    def test_gptq_end_to_end_tiny(self, tiny_cfg):
        from cold_compress_tpu.quantization.gptq import gptq_quantize_params

        params = T.init_params(
            tiny_cfg, jax.random.PRNGKey(0), dtype=jnp.float32
        )
        rope = T.make_rope_table(tiny_cfg)
        qparams = gptq_quantize_params(
            tiny_cfg,
            params,
            rope,
            group_size=32,
            n_samples=2,
            seq_length=16,
            verbose=False,
        )
        leaf = qparams["layers"][0]["ffn"]["w2"]
        assert isinstance(leaf, QuantizedWeight) and leaf.kind == "int4"
        # Quantized model still runs.
        from cold_compress_tpu.caches import CacheSpec

        specs = tuple(
            CacheSpec(
                cache_strategy="full", max_cache_length=32, max_seq_length=32
            )
            for _ in range(tiny_cfg.n_layer)
        )
        caches = T.init_caches(tiny_cfg, specs, 1, jnp.float32)
        logits, _ = T.prefill(
            tiny_cfg, qparams, rope, caches, jnp.array([[1, 2, 3]]), 3
        )
        assert np.isfinite(np.asarray(logits)).all()


def test_w8a8_matmul_close_to_dequant():
    """Dynamic-activation int8 matmul (the TPU MXU path) must track the
    dequantized reference within dynamic-quantization error."""
    from cold_compress_tpu.ops.linear import w8a8_matmul

    key = jax.random.PRNGKey(7)
    w = jax.random.normal(key, (256, 128)) * 0.05
    x = jax.random.normal(jax.random.fold_in(key, 1), (4, 256))
    qw = quantize_weight_int8(w)
    ref = np.asarray(x @ dequantize_weight(qw, jnp.float32))
    got = np.asarray(w8a8_matmul(x, qw))
    denom = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / denom < 0.02


def test_qmm_w4a8_stacked_matches_dequant():
    """Dual-dot Pallas kernel (interpret mode) == dequantize + matmul, for
    both the single-layer wrapper and the scalar-prefetch stacked variant."""
    from cold_compress_tpu.ops.pallas_qmm import qmm_w4a8, qmm_w4a8_stacked
    from cold_compress_tpu.quantization.weight_quant import (
        quantize_weight_int4,
    )

    rng = np.random.RandomState(0)
    IN, OUT, L = 256, 128, 3
    leaves = [
        quantize_weight_int4(
            jnp.asarray(rng.randn(IN, OUT).astype(np.float32) * 0.05),
            group_size=128,
        )
        for _ in range(L)
    ]
    x = jnp.asarray(rng.randn(8, IN).astype(np.float32))
    w_stack = jnp.stack([lf.w for lf in leaves])
    s_stack = jnp.stack([lf.scales for lf in leaves])
    z_stack = jnp.stack([lf.zeros for lf in leaves])
    for i, leaf in enumerate(leaves):
        ref = np.asarray(x @ dequantize_weight(leaf, jnp.float32))
        got1 = np.asarray(
            qmm_w4a8(x, leaf.w, leaf.scales, leaf.zeros, interpret=True)
        )
        got2 = np.asarray(
            qmm_w4a8_stacked(
                x, w_stack, s_stack, z_stack, jnp.int32(i), interpret=True
            )
        )
        denom = np.abs(ref).max() + 1e-9
        assert np.abs(got1 - ref).max() / denom < 0.02, f"layer {i} single"
        assert np.abs(got2 - ref).max() / denom < 0.02, f"layer {i} stacked"


def test_half_split_pack_layout():
    """pack_int4 byte r must hold row r (low nibble, unsigned) and row
    r + n/2 (high nibble stored SIGNED as q-8), the layout the dual-dot
    Pallas kernel depends on: dot(x, byte) = 16*dot(x, hi-8) + dot(x, lo)."""
    vals = jnp.arange(16, dtype=jnp.uint8).reshape(8, 2) % 16
    packed = pack_int4(vals, axis=0)
    assert packed.shape == (4, 2)
    assert packed.dtype == jnp.int8
    b = np.asarray(packed).astype(np.int32)
    lo = b & 0x0F
    hi_signed = b >> 4  # arithmetic shift recovers q_hi - 8
    np.testing.assert_array_equal(lo, np.asarray(vals[:4]))
    np.testing.assert_array_equal(hi_signed + 8, np.asarray(vals[4:]))
    # The MXU identity the kernel exploits.
    np.testing.assert_array_equal(b, 16 * hi_signed + lo)
