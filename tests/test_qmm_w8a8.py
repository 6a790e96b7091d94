"""Tiled W8A8 head kernel tests: repack roundtrip, interpret-mode kernel vs
dequantize+matmul, and the model-level tiling hook.

The tiled8 layout reshapes the int8 vocab head [in, out] into contiguous
HBM blocks [T, in, TO] (OUT zero-padded to a tile multiple) so the Pallas
one-dot kernel (ops/pallas_qmm.py::qmm_w8a8_tiled) streams it instead of
the barriered XLA int8 dot. TPU-native replacement for the reference's
``WeightOnlyInt8Linear`` head matmul (reference: quantize.py:371-404).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cold_compress_tpu.models import transformer as T
from cold_compress_tpu.ops.linear import (
    QuantizedWeight,
    dequantize_weight,
    linear,
    to_tiled_int8,
)
from cold_compress_tpu.ops.pallas_qmm import qmm_w8a8_tiled
from cold_compress_tpu.quantization.weight_quant import quantize_weight_int8


def _leaf(rng, IN, OUT):
    return quantize_weight_int8(
        jnp.asarray(rng.randn(IN, OUT).astype(np.float32) * 0.05)
    )


def test_tiled8_dequant_roundtrip():
    """Repack (with OUT padding) then dequantize == original dequantize."""
    rng = np.random.RandomState(0)
    leaf = _leaf(rng, 256, 300)  # 300 pads to 4 tiles of 256
    t8 = to_tiled_int8(leaf, tile_out=256)
    assert t8.layout == "tiled8"
    assert t8.w.shape == (4, 256, 256)
    assert t8.out_true == 300
    np.testing.assert_array_equal(
        np.asarray(dequantize_weight(t8, jnp.float32)),
        np.asarray(dequantize_weight(leaf, jnp.float32)),
    )


@pytest.mark.parametrize("L", [1, 3, 8])
def test_qmm_w8a8_tiled_matches_dequant(L):
    rng = np.random.RandomState(1)
    IN, OUT = 512, 384
    leaf = _leaf(rng, IN, OUT)
    t8 = to_tiled_int8(leaf, tile_out=128)
    x = jnp.asarray(rng.randn(L, IN).astype(np.float32))
    ref = np.asarray(x @ dequantize_weight(leaf, jnp.float32))
    got = np.asarray(
        qmm_w8a8_tiled(x, t8.w, t8.scales, interpret=True)
    )[:, :OUT]
    denom = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / denom < 0.02


@pytest.mark.parametrize("streams", [2, 4])
def test_qmm_w8a8_tiled_multistream(streams, monkeypatch):
    """CCT_QMM_STREAMS splits the tile range over N DMA pipelines; math
    must be identical to the single-stream path."""
    import cold_compress_tpu.ops.pallas_qmm as Q

    rng = np.random.RandomState(7)
    IN, OUT = 512, 1024
    leaf = _leaf(rng, IN, OUT)
    t8 = to_tiled_int8(leaf, tile_out=128)  # T = 8 tiles
    x = jnp.asarray(rng.randn(3, IN).astype(np.float32))
    ref = np.asarray(qmm_w8a8_tiled(x, t8.w, t8.scales, interpret=True))
    monkeypatch.setattr(Q, "_STREAMS", streams)
    Q.qmm_w8a8_tiled.clear_cache()
    got = np.asarray(qmm_w8a8_tiled(x, t8.w, t8.scales, interpret=True))
    np.testing.assert_array_equal(got, ref)
    Q.qmm_w8a8_tiled.clear_cache()


@pytest.mark.parametrize("streams", [2, 3])
def test_qmm_cp_multistream(streams, monkeypatch):
    import cold_compress_tpu.ops.pallas_qmm as Q
    from cold_compress_tpu.ops.linear import to_colpack
    from cold_compress_tpu.quantization.weight_quant import (
        quantize_weight_int4,
    )

    rng = np.random.RandomState(8)
    IN, OUT = 512, 1536  # OUTh=768, TOh=128 -> T=6 (divisible by 2 and 3)
    leaf = quantize_weight_int4(
        jnp.asarray(rng.randn(IN, OUT).astype(np.float32) * 0.05),
        group_size=128,
    )
    cp = to_colpack(leaf)
    x = jnp.asarray(rng.randn(1, IN).astype(np.float32))
    from cold_compress_tpu.ops.pallas_qmm import qmm_w4a8_cp_stacked

    ref = np.asarray(
        qmm_w4a8_cp_stacked(
            x, cp.w[None], cp.scales[None], cp.zeros[None], 0,
            interpret=True, tile_out=128,
        )
    )
    monkeypatch.setattr(Q, "_STREAMS", streams)
    Q.qmm_w4a8_cp_stacked.clear_cache()
    got = np.asarray(
        qmm_w4a8_cp_stacked(
            x, cp.w[None], cp.scales[None], cp.zeros[None], 0,
            interpret=True, tile_out=128,
        )
    )
    np.testing.assert_array_equal(got, ref)
    Q.qmm_w4a8_cp_stacked.clear_cache()


def test_linear_tiled8_fallback_matches_rowmajor():
    """Off-TPU, linear() on a tiled8 leaf takes the dequantize path and
    matches the rowmajor result bit-for-bit (same dequantized weights)."""
    rng = np.random.RandomState(2)
    leaf = _leaf(rng, 256, 300)
    t8 = to_tiled_int8(leaf, tile_out=128)
    x = jnp.asarray(rng.randn(4, 256).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(linear(x, t8)), np.asarray(linear(x, leaf))
    )


def test_tile_output_head_hook():
    """tile_output_head converts only an int8 rowmajor head, and logits
    from the tiled head match the untiled ones exactly (CPU fallback)."""
    from cold_compress_tpu.models.config import ModelConfig
    from cold_compress_tpu.quantization.weight_quant import quantize_params

    cfg = ModelConfig.from_name("TestTiny")
    params = T.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    params = quantize_params(params, mode="int4", group_size=32)
    tiled = T.tile_output_head(params, tile_out=128)
    assert isinstance(tiled["output"], QuantizedWeight)
    assert tiled["output"].layout == "tiled8"
    # int4 layer leaves untouched
    assert tiled["layers"][0]["attn"]["wq"].layout == "rowpack"
    x = jnp.asarray(np.random.RandomState(3).randn(2, cfg.dim), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(linear(x, tiled["output"])),
        np.asarray(linear(x, params["output"])),
    )
    # idempotent / no-op on already-tiled or bf16 heads
    again = T.tile_output_head(tiled, tile_out=128)
    assert again["output"] is tiled["output"]


class TestColpackTiledHead:
    """int4 head path: tiled colpack repack + kernel parity + hook."""

    def _leaf4(self, rng, IN, OUT, gs=64):
        from cold_compress_tpu.quantization.weight_quant import (
            quantize_weight_int4,
        )

        return quantize_weight_int4(
            jnp.asarray(rng.randn(IN, OUT).astype(np.float32) * 0.05),
            group_size=gs,
        )

    def test_dequant_roundtrip_with_padding(self):
        from cold_compress_tpu.ops.linear import to_colpack_tiled

        rng = np.random.RandomState(0)
        leaf = self._leaf4(rng, 256, 320)  # pads to 2*tile_out mult
        cpt = to_colpack_tiled(leaf, tile_out=128)
        assert cpt.layout == "colpack_tiled"
        assert cpt.out_true == 320
        assert cpt.w.shape[0] * cpt.w.shape[2] * 2 >= 320
        np.testing.assert_array_equal(
            np.asarray(dequantize_weight(cpt, jnp.float32)),
            np.asarray(dequantize_weight(leaf, jnp.float32)),
        )

    @pytest.mark.parametrize("L", [1, 8])
    def test_kernel_matches_dequant(self, L):
        from cold_compress_tpu.ops.linear import to_colpack_tiled
        from cold_compress_tpu.ops.pallas_qmm import qmm_w4a8_cp_stacked

        rng = np.random.RandomState(1)
        IN, OUT = 512, 768
        leaf = self._leaf4(rng, IN, OUT)
        cpt = to_colpack_tiled(leaf, tile_out=128)
        x = jnp.asarray(rng.randn(L, IN).astype(np.float32))
        ref = np.asarray(x @ dequantize_weight(leaf, jnp.float32))
        got = np.asarray(
            qmm_w4a8_cp_stacked(
                x, cpt.w[None], cpt.scales[None], cpt.zeros[None], 0,
                group_size=cpt.group_size, interpret=True,
            )
        )[:, :OUT]
        denom = np.abs(ref).max() + 1e-9
        assert np.abs(got - ref).max() / denom < 0.02

    def test_tile_output_head_int4(self):
        from cold_compress_tpu.models.config import ModelConfig
        from cold_compress_tpu.quantization.weight_quant import (
            quantize_params,
        )

        cfg = ModelConfig.from_name("TestTiny")
        params = T.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        params = quantize_params(
            params, mode="int4", group_size=32, output_mode="int4"
        )
        assert params["output"].kind == "int4"
        tiled = T.tile_output_head(params, tile_out=64)
        assert tiled["output"].layout == "colpack_tiled"
        x = jnp.asarray(
            np.random.RandomState(3).randn(2, cfg.dim), jnp.float32
        )
        np.testing.assert_allclose(
            np.asarray(linear(x, tiled["output"])),
            np.asarray(linear(x, params["output"])),
            rtol=1e-5, atol=1e-5,
        )
