"""Column-packed (colpack) W4A8 kernel tests: repack roundtrip, interpret-
mode kernel vs dequantize+matmul, and the model-level repack hook.

The colpack layout packs the two nibbles of a byte as output columns
(j, j + out/2) of one input row so the Pallas kernel recovers both output
halves from TWO int8 dots (ops/pallas_qmm.py), replacing the rowpack
scheme's three. TPU-native replacement for the reference's
``aten._weight_int4pack_mm`` (reference: quantize.py:414-425).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cold_compress_tpu.models import transformer as T
from cold_compress_tpu.ops.linear import (
    dequantize_weight,
    is_quantized,
    to_colpack,
)
from cold_compress_tpu.ops.pallas_qmm import qmm_w4a8_cp_stacked
from cold_compress_tpu.quantization.weight_quant import quantize_weight_int4


def _leaf(rng, IN, OUT, gs=128):
    return quantize_weight_int4(
        jnp.asarray(rng.randn(IN, OUT).astype(np.float32) * 0.05),
        group_size=gs,
    )


def test_colpack_dequant_roundtrip():
    rng = np.random.RandomState(0)
    leaf = _leaf(rng, 256, 256)
    cp = to_colpack(leaf)
    assert cp.layout == "colpack"
    assert cp.w.shape == (256, 128)
    assert cp.scales.shape == (2, 2, 128)
    np.testing.assert_array_equal(
        np.asarray(dequantize_weight(cp, jnp.float32)),
        np.asarray(dequantize_weight(leaf, jnp.float32)),
    )


@pytest.mark.parametrize("L", [1, 3, 8])
def test_qmm_cp_matches_dequant(L):
    """Interpret-mode colpack kernel == dequantize + matmul for the stacked
    layout, at L=1 (decode), ragged, and padded row counts."""
    rng = np.random.RandomState(1)
    IN, OUT, NL = 512, 256, 3
    leaves = [_leaf(rng, IN, OUT) for _ in range(NL)]
    cps = [to_colpack(lf) for lf in leaves]
    x = jnp.asarray(rng.randn(L, IN).astype(np.float32))
    w_stack = jnp.stack([lf.w for lf in cps])
    s_stack = jnp.stack([lf.scales for lf in cps])
    z_stack = jnp.stack([lf.zeros for lf in cps])
    for i, leaf in enumerate(leaves):
        ref = np.asarray(x @ dequantize_weight(leaf, jnp.float32))
        got = np.asarray(
            qmm_w4a8_cp_stacked(
                x, w_stack, s_stack, z_stack, jnp.int32(i), interpret=True
            )
        )
        denom = np.abs(ref).max() + 1e-9
        assert np.abs(got - ref).max() / denom < 0.02, f"layer {i}"


def test_qmm_cp_multi_chunk():
    """IN large enough that the kernel's chunk loop runs > 1 iteration
    (ngf=16 groups vs ngc capped at 128//8=16 for L=8 ... use L=8, IN=4096
    -> ngf=32, ngc=16, 2 chunks)."""
    rng = np.random.RandomState(2)
    IN, OUT = 4096, 256
    leaf = _leaf(rng, IN, OUT)
    cp = to_colpack(leaf)
    x = jnp.asarray(rng.randn(8, IN).astype(np.float32) * 0.3)
    ref = np.asarray(x @ dequantize_weight(leaf, jnp.float32))
    got = np.asarray(
        qmm_w4a8_cp_stacked(
            x, cp.w[None], cp.scales[None], cp.zeros[None], 0,
            interpret=True,
        )
    )
    denom = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / denom < 0.02


def test_colpack_layer_params_generation_equivalence():
    """colpack_layer_params repacks every int4 layer leaf; generation via
    the XLA fallback (dequantize path) matches the rowpack run exactly."""
    from cold_compress_tpu.caches import CacheSpec
    from cold_compress_tpu.models.config import ModelConfig
    from cold_compress_tpu.quantization.weight_quant import quantize_params
    from cold_compress_tpu.runtime.generate import generate

    cfg = ModelConfig.from_name("TestTiny")
    params = T.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    params = quantize_params(params, mode="int4", group_size=32)
    rope = T.make_rope_table(cfg)
    specs = tuple(
        CacheSpec(
            cache_strategy="full", max_cache_length=64, max_seq_length=64
        )
        for _ in range(cfg.n_layer)
    )

    def run(ps):
        caches = T.init_caches(cfg, specs, 1, jnp.float32)
        seq, _, _ = generate(
            cfg, ps, rope, caches, list(range(5, 40)), 8, prefill_bucket=64
        )
        return seq

    fused = T.fuse_layer_params(T.stack_layer_params(params))
    cp = T.colpack_layer_params(fused)

    kinds = [
        leaf.layout
        for leaf in jax.tree.leaves(cp["layers"], is_leaf=is_quantized)
        if is_quantized(leaf) and leaf.kind == "int4"
    ]
    from cold_compress_tpu.ops.pallas_qmm import cpt_enabled

    expected = "cpt" if cpt_enabled() else "colpack"
    assert kinds and all(k == expected for k in kinds)
    assert run(fused) == run(cp)


@pytest.mark.parametrize("L", [256, 300])
def test_qmm_prefill_matches_dequant(L):
    """Prefill W4A8 kernel (large-M tiles, per-group dual dots) vs
    dequantize + matmul, including a non-tile-multiple row count."""
    from cold_compress_tpu.ops.pallas_qmm import qmm_w4a8_prefill

    rng = np.random.RandomState(9)
    IN, OUT, NL = 512, 512, 2
    leaves = [_leaf(rng, IN, OUT) for _ in range(NL)]
    cps = [to_colpack(lf) for lf in leaves]
    w = jnp.stack([c.w for c in cps])
    s = jnp.stack([c.scales for c in cps])
    z = jnp.stack([c.zeros for c in cps])
    x = jnp.asarray(rng.randn(L, IN).astype(np.float32) * 0.3)
    for i, leaf in enumerate(leaves):
        ref = np.asarray(x @ dequantize_weight(leaf, jnp.float32))
        got = np.asarray(
            qmm_w4a8_prefill(
                x, w, s, z, jnp.int32(i), interpret=True, tile_m=128
            )
        )
        denom = np.abs(ref).max() + 1e-9
        # W4A8: activation int8 quantization adds ~1/255 per-row error on
        # top of the int4 weight error the reference comparison carries.
        assert np.abs(got - ref).max() / denom < 0.03, f"layer {i}"


@pytest.mark.parametrize("L,tile", [(64, 128), (300, 64)])
def test_matmul_cpt_xla_matches_dequant(L, tile):
    """Prefill-sized XLA matmul over cpt tiles (no packed-transpose
    round-trip) vs dequantize_weight + matmul, including a
    non-tile-multiple row count."""
    from cold_compress_tpu.ops.linear import matmul_cpt_xla, to_cpt

    rng = np.random.RandomState(3)
    IN, OUT = 256, 1024
    cpt = to_cpt(to_colpack(_leaf(rng, IN, OUT, gs=64)), tile_out=tile)
    x = jnp.asarray(rng.randn(L, IN).astype(np.float32) * 0.3).astype(
        jnp.bfloat16
    )
    ref = np.asarray(
        (x @ dequantize_weight(cpt, jnp.bfloat16)).astype(jnp.float32)
    )
    got = np.asarray(matmul_cpt_xla(x, cpt).astype(jnp.float32))
    np.testing.assert_allclose(got, ref, atol=2e-2 * np.abs(ref).max())


@pytest.mark.parametrize("L", [256, 300])
def test_qmm_prefill_cpt_matches_dequant(L):
    """Prefill W4A8 kernel over cpt stacks (fused meta sidecar) vs
    dequantize + matmul."""
    from cold_compress_tpu.ops.linear import to_cpt
    from cold_compress_tpu.ops.pallas_qmm import qmm_w4a8_prefill_cpt

    rng = np.random.RandomState(11)
    IN, OUT, NL = 512, 512, 2
    leaves = [_leaf(rng, IN, OUT) for _ in range(NL)]
    cpts = [to_cpt(to_colpack(lf), tile_out=128) for lf in leaves]
    w = jnp.stack([c.w for c in cpts])
    m = jnp.stack([c.scales for c in cpts])
    x = jnp.asarray(rng.randn(L, IN).astype(np.float32) * 0.3)
    for i, leaf in enumerate(leaves):
        ref = np.asarray(x @ dequantize_weight(leaf, jnp.float32))
        got = np.asarray(
            qmm_w4a8_prefill_cpt(
                x, w, m, jnp.int32(i), interpret=True, tile_m=128
            )
        )
        denom = np.abs(ref).max() + 1e-9
        assert np.abs(got - ref).max() / denom < 0.03, f"layer {i}"


def _cpt_split_fixture(rng, IN=512, OUT=1024, NL=2, S=2, tile=128):
    """Stacked cpt leaf + its split-buffer twin (shared idx placeholder)."""
    import dataclasses

    from cold_compress_tpu.ops.linear import to_cpt, to_cpt_split

    leaves = [_leaf(rng, IN, OUT) for _ in range(NL)]
    cpts = [to_cpt(to_colpack(lf), tile_out=tile) for lf in leaves]
    stacked = dataclasses.replace(
        cpts[0], w=jnp.stack([c.w for c in cpts]),
        scales=jnp.stack([c.scales for c in cpts]),
    )
    return leaves, stacked, to_cpt_split(stacked, S)


@pytest.mark.parametrize("L", [1, 8])
def test_qmm_cpt_split_matches_cpt(L):
    """Split-buffer multi-stream decode kernel == single-buffer cpt kernel
    (identical per-tile math and output column order)."""
    from cold_compress_tpu.ops.pallas_qmm import (
        qmm_w4a8_cpt,
        qmm_w4a8_cpt_split,
    )

    rng = np.random.RandomState(21)
    _, stacked, split = _cpt_split_fixture(rng)
    x = jnp.asarray(rng.randn(L, 512).astype(np.float32) * 0.3)
    for i in range(2):
        ref = np.asarray(
            qmm_w4a8_cpt(x, stacked.w, stacked.scales, i, interpret=True)
        )
        got = np.asarray(
            qmm_w4a8_cpt_split(
                x, list(split.w), list(split.scales), i, interpret=True
            )
        )
        np.testing.assert_array_equal(got, ref, err_msg=f"layer {i}")


def test_cpt_split_dequant_roundtrip():
    """dequantize_weight over resolved cpt_split parts is bit-identical to
    the unsplit cpt dequant (the XLA fallback path every non-decode shape
    takes); rowpack-vs-cpt sidecar rounding is covered with tolerance by
    test_matmul_cpt_xla_matches_dequant."""
    import dataclasses

    rng = np.random.RandomState(22)
    _, stacked, split = _cpt_split_fixture(rng)
    for i in range(2):
        one = dataclasses.replace(split, idx=jnp.int32(i)).resolved()
        ref = dataclasses.replace(stacked, idx=jnp.int32(i)).resolved()
        assert isinstance(one.w, tuple) and one.w[0].ndim == 3
        np.testing.assert_array_equal(
            np.asarray(dequantize_weight(one, jnp.float32)),
            np.asarray(dequantize_weight(ref, jnp.float32)),
        )


@pytest.mark.parametrize("L", [1, 300])
def test_linear_cpt_split_dispatch(L, monkeypatch):
    """ops.linear routes cpt_split leaves through the split decode kernel
    (L=1) and the per-part prefill kernel with column-order fixup (L=300,
    CCT_PREFILL_W4A8=1); both match the rowpack dequant reference."""
    import dataclasses

    from cold_compress_tpu.ops.linear import linear

    monkeypatch.setenv("CCT_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("CCT_PREFILL_W4A8", "1")
    rng = np.random.RandomState(23)
    leaves, stacked, split = _cpt_split_fixture(rng)
    x = jnp.asarray(rng.randn(L, 512).astype(np.float32) * 0.3)
    for i in range(2):
        leaf_i = dataclasses.replace(split, idx=jnp.int32(i))
        ref = np.asarray(x @ dequantize_weight(leaves[i], jnp.float32))
        got = np.asarray(linear(x, leaf_i).astype(jnp.float32))
        denom = np.abs(ref).max() + 1e-9
        assert np.abs(got - ref).max() / denom < 0.03, f"layer {i}"


def test_colpack_layer_params_split_routing(monkeypatch):
    """CCT_QMM_SPLIT=2 at repack time splits eligible stacked cpt leaves;
    generation through the dispatch (interpret kernels) matches the
    unsplit run token-for-token."""
    from cold_compress_tpu.caches import CacheSpec
    from cold_compress_tpu.models.config import ModelConfig
    from cold_compress_tpu.quantization.weight_quant import quantize_params
    from cold_compress_tpu.runtime.generate import generate

    cfg = ModelConfig.from_name("TestTiny")
    params = T.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    params = quantize_params(params, mode="int4", group_size=32)
    rope = T.make_rope_table(cfg)
    specs = tuple(
        CacheSpec(
            cache_strategy="full", max_cache_length=64, max_seq_length=64
        )
        for _ in range(cfg.n_layer)
    )

    def run(ps):
        caches = T.init_caches(cfg, specs, 1, jnp.float32)
        seq, _, _ = generate(
            cfg, ps, rope, caches, list(range(5, 40)), 8, prefill_bucket=64
        )
        return seq

    fused = T.fuse_layer_params(T.stack_layer_params(params))
    from cold_compress_tpu.ops import pallas_qmm

    monkeypatch.setattr(pallas_qmm, "_TILE_ENV", 32)
    monkeypatch.setenv("CCT_QMM_SPLIT", "2")
    monkeypatch.setenv("CCT_PALLAS_INTERPRET", "1")
    cp = T.colpack_layer_params(fused)
    layouts = {
        leaf.layout
        for leaf in jax.tree.leaves(cp["layers"], is_leaf=is_quantized)
        if is_quantized(leaf) and leaf.kind == "int4"
    }
    assert run(fused) == run(cp), layouts


@pytest.mark.parametrize("L", [1, 9])
def test_qmm_cpt_inkq_matches_outofkernel(L):
    """In-kernel activation quantization (CCT_QMM_INKQ path) is
    bit-identical to the out-of-kernel prologue/epilogue: same per-row
    scale formula, same block-diagonal layout, scale folded into the
    store. L=9 exercises the row-padding path (padded rows quantize to
    zeros and are sliced off)."""
    from cold_compress_tpu.ops.pallas_qmm import qmm_w4a8_cpt

    rng = np.random.RandomState(33)
    _, stacked, _ = _cpt_split_fixture(rng)
    x = jnp.asarray(rng.randn(L, 512).astype(np.float32) * 0.3)
    for i in range(2):
        ref = np.asarray(
            qmm_w4a8_cpt(
                x, stacked.w, stacked.scales, i, interpret=True, inkq=False
            )
        )
        got = np.asarray(
            qmm_w4a8_cpt(
                x, stacked.w, stacked.scales, i, interpret=True, inkq=True
            )
        )
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6,
                                   err_msg=f"layer {i}")


def test_qmm_cpt_inkq_partial_chunk():
    """inkq prologue with ngf % ngc != 0 (production w1/w3: IN=14336 ->
    chunks 32,32,32,16): the partial chunk writes only its ng*gs columns
    and the tile body must read exactly those."""
    import dataclasses

    from cold_compress_tpu.ops.linear import to_cpt
    from cold_compress_tpu.ops.pallas_qmm import qmm_w4a8_cpt

    rng = np.random.RandomState(77)
    IN, OUT, L = 1792, 512, 9  # pads to L=16 -> ngc=8, chunks (8, 6)
    leaves = [_leaf(rng, IN, OUT) for _ in range(2)]
    cpts = [to_cpt(to_colpack(lf), tile_out=128) for lf in leaves]
    stacked = dataclasses.replace(
        cpts[0], w=jnp.stack([c.w for c in cpts]),
        scales=jnp.stack([c.scales for c in cpts]),
    )
    x = jnp.asarray(rng.randn(L, IN).astype(np.float32) * 0.3)
    ref = np.asarray(
        qmm_w4a8_cpt(x, stacked.w, stacked.scales, 1, interpret=True,
                     inkq=False)
    )
    got = np.asarray(
        qmm_w4a8_cpt(x, stacked.w, stacked.scales, 1, interpret=True,
                     inkq=True)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
