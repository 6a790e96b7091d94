"""End-to-end wiring parity for the hardware Pallas paths, on CPU.

``CCT_PALLAS_INTERPRET=1`` flips every Pallas routing gate
(ops/pallas_qmm.py::backend_ok) to accept the CPU backend and runs the
kernels in interpret mode, so the EXACT program that runs on TPU hardware
— param repacks (stack/fuse/colpack/tiled head), the Pallas W4A8/W8A8
matmuls, the fused decode-attention kernel, the fused heavy-hitter evict,
and the flash(+summaries) prefill — executes here end-to-end through the
real ``generate()`` loop.

The kernel unit tests (test_qmm_cp, test_decode_attn, test_fused_evict,
test_pallas_prefill, test_qmm_w8a8) pin each kernel's math in isolation;
these tests pin the PLUMBING between them: repack layouts and scale
planes, padded-vocab-column slicing, scan-over-layers kernel indices, and
cache wiring. A wiring bug (wrong scale plane, pad slice off-by-one,
swapped nibble planes) produces garbage logits that the tolerances below
catch immediately.

The TestKernel config is the smallest architecture satisfying every
kernel alignment gate (dim % 256, head_dim % 128, prefill bucket % 512).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cold_compress_tpu.models import transformer as T
from cold_compress_tpu.models.config import ModelConfig
from cold_compress_tpu.quantization.weight_quant import quantize_params
from cold_compress_tpu.runtime.engine import build_cache_specs
from cold_compress_tpu.runtime.generate import generate

ALL_GATES = (
    "CCT_PALLAS_INTERPRET",
    "CCT_FUSED_EVICT",
    "CCT_TILED_HEAD",
    "CCT_PREFILL_W4A8",
    "CCT_QMM_CPT",
    "CCT_QMM_INKQ",
    "CCT_ATTN_I8DOT",
    "CCT_ATTN_V2",
    "CCT_ATTN_V2_OS_MB",
)

PROMPT = np.random.RandomState(0).randint(2, 500, size=300).tolist()
FORCED = np.random.RandomState(1).randint(2, 500, size=8).tolist()


@pytest.fixture(scope="module")
def kernel_model():
    cfg = ModelConfig.from_name("TestKernel")
    params = T.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rope = T.make_rope_table(cfg)
    return cfg, params, rope


def make_caches(cfg, cache_bits=None):
    specs = build_cache_specs(
        cfg,
        {
            "cache_strategy": ["heavy_hitter"],
            "max_cache_length": [0.25],  # 128 of 512: C % 128 == 0
            "prompt_compression_strategy": ["heavy_hitter"],
            "global_tokens": 4,
            "recent_window": 10,
            "cache_bits": cache_bits,
        },
        max_seq_length=512,
    )
    return T.init_caches(cfg, specs, 1, jnp.bfloat16)


def run(cfg, params, rope, env, *, cache_bits=None, teacher_force=False,
        monkeypatch=None):
    """One fresh generate() under the given gate env.

    Gate state is read at trace time, so stale jit caches from a previous
    env must be dropped (jax.clear_caches) before each run.
    """
    for k in ALL_GATES:
        monkeypatch.delenv(k, raising=False)
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    jax.clear_caches()

    p = T.fuse_layer_params(T.stack_layer_params(params))
    if env.get("CCT_PALLAS_INTERPRET") == "1":
        # Same prep the CLIs run when the Pallas paths are routable
        # (generate.py / bench.py / eval.py).
        p = T.colpack_layer_params(p)
        if env.get("CCT_TILED_HEAD") == "1":
            p = T.tile_output_head(p)
    caches = make_caches(cfg, cache_bits=cache_bits)
    kw = dict(prefill_bucket=512)
    if teacher_force:
        kw["next_tokens"] = FORCED
    seq, info, _ = generate(cfg, p, rope, caches, PROMPT, 8, **kw)
    return (
        seq,
        np.asarray(info["emitted_probs"], dtype=np.float64),
        np.asarray(info["final_probs"], dtype=np.float64),
    )


def test_bf16_hardware_paths_match_xla(kernel_model, monkeypatch):
    """bf16 weights + bf16 cache: flash(+summary) prefill, the fused decode
    attention kernel (bits=16), and the fused HH evict are the same math as
    the XLA paths — greedy tokens must agree and per-step probabilities
    must match to rounding."""
    cfg, params, rope = kernel_model
    s0, e0, f0 = run(cfg, params, rope, {}, monkeypatch=monkeypatch)
    s1, e1, f1 = run(
        cfg, params, rope,
        {"CCT_PALLAS_INTERPRET": "1", "CCT_FUSED_EVICT": "1"},
        monkeypatch=monkeypatch,
    )
    assert s1 == s0
    np.testing.assert_allclose(f1, f0, atol=2e-2)


@pytest.mark.parametrize("head_mode", ["int8", "int4"])
def test_int4_decode_kernels_match_dequant(kernel_model, monkeypatch,
                                           head_mode):
    """int4 layers (colpack, scan-indexed) + tiled vocab head: the Pallas
    W4A8 path quantizes activations to int8, so compare teacher-forced
    per-step probabilities against the XLA dequant baseline with a
    tolerance far below wiring-bug scale."""
    cfg, params, rope = kernel_model
    qp = quantize_params(
        params, mode="int4", group_size=128, output_mode=head_mode
    )
    s0, e0, f0 = run(cfg, qp, rope, {}, teacher_force=True,
                     monkeypatch=monkeypatch)
    s1, e1, f1 = run(
        cfg, qp, rope,
        {
            "CCT_PALLAS_INTERPRET": "1",
            "CCT_FUSED_EVICT": "1",
            "CCT_TILED_HEAD": "1",
        },
        teacher_force=True, monkeypatch=monkeypatch,
    )
    assert s1 == s0  # teacher-forced: sequences are the forced tokens
    np.testing.assert_allclose(e1, e0, atol=5e-2)
    np.testing.assert_allclose(f1, f0, atol=5e-2)


def test_int4_cpt_layout_end_to_end(kernel_model, monkeypatch):
    """CCT_QMM_CPT=1: layer stacks repacked to contiguous weight tiles +
    fused metadata sidecar (to_cpt / qmm_w4a8_cpt). The sidecar stores the
    zero-point terms pre-subtracted in bf16 — one extra rounding vs the v3
    path, far below the int4 quantization noise the tolerance tracks."""
    cfg, params, rope = kernel_model
    qp = quantize_params(params, mode="int4", group_size=128,
                         output_mode="int4")
    s0, e0, f0 = run(cfg, qp, rope, {}, teacher_force=True,
                     monkeypatch=monkeypatch)
    s1, e1, f1 = run(
        cfg, qp, rope,
        {
            "CCT_PALLAS_INTERPRET": "1",
            "CCT_TILED_HEAD": "1",
            "CCT_QMM_CPT": "1",
        },
        teacher_force=True, monkeypatch=monkeypatch,
    )
    assert s1 == s0
    np.testing.assert_allclose(e1, e0, atol=5e-2)
    np.testing.assert_allclose(f1, f0, atol=5e-2)


def test_quantized_cache_decode_attention(kernel_model, monkeypatch):
    """cache_bits=8: the decode-attention kernel dequantizes the packed
    cache in VMEM; the XLA baseline materializes it in HBM. Same quantized
    values, so only dequant rounding differs."""
    cfg, params, rope = kernel_model
    s0, e0, f0 = run(cfg, params, rope, {}, cache_bits=8,
                     teacher_force=True, monkeypatch=monkeypatch)
    # i8dot defaults ON for int8 caches since r4; pin it off here so this
    # stays a pure dequant-kernel-vs-math parity check (the i8dot paths
    # have their own exact A/Bs in test_decode_attn.py).
    s1, e1, f1 = run(
        cfg, params, rope,
        {"CCT_PALLAS_INTERPRET": "1", "CCT_ATTN_I8DOT": "0"},
        cache_bits=8, teacher_force=True, monkeypatch=monkeypatch,
    )
    np.testing.assert_allclose(e1, e0, atol=2e-2)
    np.testing.assert_allclose(f1, f0, atol=2e-2)
    # And the default (i8dot) int8-cache route end-to-end: int8-MXU score
    # and value dots add per-row query/prob quantization — wider tolerance,
    # same greedy behavior expected at this scale.
    s2, e2, f2 = run(
        cfg, params, rope, {"CCT_PALLAS_INTERPRET": "1"},
        cache_bits=8, teacher_force=True, monkeypatch=monkeypatch,
    )
    np.testing.assert_allclose(e2, e0, atol=8e-2)
    np.testing.assert_allclose(f2, f0, atol=8e-2)


def test_prefill_w4a8_kernel_end_to_end(kernel_model, monkeypatch):
    """CCT_PREFILL_W4A8: prefill-sized W4A8 Pallas matmuls (int8
    activations at L=512) against the bf16-dequant prefill baseline."""
    cfg, params, rope = kernel_model
    qp = quantize_params(
        params, mode="int4", group_size=128, output_mode="int8"
    )
    s0, e0, f0 = run(cfg, qp, rope, {}, teacher_force=True,
                     monkeypatch=monkeypatch)
    s1, e1, f1 = run(
        cfg, qp, rope,
        {"CCT_PALLAS_INTERPRET": "1", "CCT_PREFILL_W4A8": "1"},
        teacher_force=True, monkeypatch=monkeypatch,
    )
    np.testing.assert_allclose(e1, e0, atol=8e-2)
    np.testing.assert_allclose(f1, f0, atol=8e-2)


def test_int4_cpt_inkq_end_to_end(kernel_model, monkeypatch):
    """CCT_QMM_INKQ=1 on top of the cpt layout: activation quantization,
    block-diagonal layout, and the scale epilogue run inside the kernel's
    grid step 0 (VMEM scratch). Same math as the out-of-kernel prologue
    (bit-level parity is test_qmm_cpt_inkq_matches_outofkernel); this
    drives the wiring through generate()."""
    cfg, params, rope = kernel_model
    qp = quantize_params(params, mode="int4", group_size=128,
                         output_mode="int4")
    s0, e0, f0 = run(
        cfg, qp, rope,
        {
            "CCT_PALLAS_INTERPRET": "1",
            "CCT_TILED_HEAD": "1",
            "CCT_QMM_CPT": "1",
        },
        teacher_force=True, monkeypatch=monkeypatch,
    )
    s1, e1, f1 = run(
        cfg, qp, rope,
        {
            "CCT_PALLAS_INTERPRET": "1",
            "CCT_TILED_HEAD": "1",
            "CCT_QMM_CPT": "1",
            "CCT_QMM_INKQ": "1",
        },
        teacher_force=True, monkeypatch=monkeypatch,
    )
    assert s1 == s0
    np.testing.assert_allclose(e1, e0, atol=1e-3)
    np.testing.assert_allclose(f1, f0, atol=1e-3)


def _full_caches(cfg, cache_bits=None):
    # full strategy: need_attn=False through the decode path, so the v2
    # slim kernel routes. C = max_seq = 1024 is chunk-aligned (2 x 512).
    specs = build_cache_specs(
        cfg,
        {
            "cache_strategy": ["full"],
            "max_cache_length": [1.0],
            "prompt_compression_strategy": ["full"],
            "cache_bits": cache_bits,
        },
        max_seq_length=1024,
    )
    return T.init_caches(cfg, specs, 1, jnp.bfloat16)


@pytest.mark.parametrize("cache_bits", [None, 8])
def test_attn_v2_end_to_end(kernel_model, cache_bits, monkeypatch):
    """CCT_ATTN_V2=1 (slim decode attention, separate scale/zero/mask
    operands, no meta stack) through generate() on a full cache: greedy
    tokens and per-step probabilities match the XLA baseline, in both the
    one-shot (NC=1) and forced-chunked (CCT_ATTN_V2_OS_MB=0) routings."""
    cfg, params, rope = kernel_model

    def run_full(env):
        for k in ALL_GATES:
            monkeypatch.delenv(k, raising=False)
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        jax.clear_caches()
        p = T.fuse_layer_params(T.stack_layer_params(params))
        if env.get("CCT_PALLAS_INTERPRET") == "1":
            p = T.colpack_layer_params(p)
        caches = _full_caches(cfg, cache_bits=cache_bits)
        seq, info, _ = generate(
            cfg, p, rope, caches, PROMPT, 8, prefill_bucket=512,
            next_tokens=FORCED,
        )
        return seq, np.asarray(info["emitted_probs"], dtype=np.float64)

    s0, e0 = run_full({})
    s1, e1 = run_full({"CCT_PALLAS_INTERPRET": "1", "CCT_ATTN_V2": "1"})
    np.testing.assert_allclose(e1, e0, atol=8e-2)
    s2, e2 = run_full({
        "CCT_PALLAS_INTERPRET": "1",
        "CCT_ATTN_V2": "1",
        "CCT_ATTN_V2_OS_MB": "0",
    })
    np.testing.assert_allclose(e2, e0, atol=8e-2)
