"""Aggregate-quality criterion for the Pallas kernel gates.

test_gates_e2e pins wiring with per-step probability tolerances (atol 5e-2)
— wide enough to hide small systematic numerics drift. This file adds the
missing aggregate criterion: teacher-forced NLL on REAL text with the
TRAINED TinyByteLM fixture, all hardware gates on vs the XLA dequant
baseline. A systematic numerics bug in the W4A8/cpt/tiled-head/quantized-
cache paths shows up as a mean-NLL shift long before any single step trips
the per-step tolerance.

Two assertions per configuration:
  * the model is actually good on the text (mean NLL far below the uniform
    6.24 nats/byte) — guards against comparing two garbage runs; and
  * |mean NLL(gates) - mean NLL(baseline)| is within the int4-activation
    rounding budget.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from pathlib import Path

from cold_compress_tpu.models import transformer as T
from cold_compress_tpu.runtime.engine import build_cache_specs, load_model
from cold_compress_tpu.runtime.generate import generate

REPO = Path(__file__).parent.parent
CKPT = REPO / "tests" / "fixtures" / "TinyByteLM-hf" / "model_int4.g64.npz"

ALL_GATES = (
    "CCT_PALLAS_INTERPRET",
    "CCT_FUSED_EVICT",
    "CCT_TILED_HEAD",
    "CCT_PREFILL_W4A8",
    "CCT_QMM_CPT",
)

# Real English text the fixture was NOT trained on verbatim but matches its
# corpus domain (repo markdown). Byte tokenizer: ids are the bytes.
TEXT = (REPO / "BENCHMARK.md").read_text()[:400]
TOKENS = list(TEXT.encode("utf-8"))
PROMPT, FORCED = TOKENS[:256], TOKENS[256:352]  # 96 teacher-forced steps


@pytest.fixture(scope="module")
def trained_int4():
    cfg, params, rope = load_model(str(CKPT), model_name="TinyByteLM")
    return cfg, params, rope


def run_nll(cfg, params, rope, env, monkeypatch):
    for k in ALL_GATES:
        monkeypatch.delenv(k, raising=False)
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    jax.clear_caches()
    p = T.fuse_layer_params(T.stack_layer_params(params))
    if env.get("CCT_PALLAS_INTERPRET") == "1":
        p = T.colpack_layer_params(p)
        if env.get("CCT_TILED_HEAD") == "1":
            p = T.tile_output_head(p)
    specs = build_cache_specs(
        cfg,
        {
            "cache_strategy": ["full"],
            "max_cache_length": [1.0],
            "prompt_compression_strategy": ["full"],
        },
        max_seq_length=512,
    )
    caches = T.init_caches(cfg, specs, 1, jnp.bfloat16)
    _, info, _ = generate(
        cfg, p, rope, caches, PROMPT, len(FORCED),
        prefill_bucket=512, next_tokens=FORCED,
    )
    probs = np.asarray(info["emitted_probs"], np.float64)[: len(FORCED)]
    return float(np.mean(-np.log(np.maximum(probs, 1e-20))))


def test_gates_preserve_teacher_forced_nll(trained_int4, monkeypatch):
    cfg, params, rope = trained_int4
    base = run_nll(cfg, params, rope, {}, monkeypatch)
    gated = run_nll(
        cfg, params, rope,
        {
            "CCT_PALLAS_INTERPRET": "1",
            "CCT_TILED_HEAD": "1",
            "CCT_QMM_CPT": "1",
            "CCT_PREFILL_W4A8": "1",
        },
        monkeypatch,
    )
    # Trained: far below uniform ln(512) = 6.24 nats/byte.
    assert base < 3.0, f"baseline NLL {base:.3f} looks untrained"
    assert gated < 3.0, f"gated NLL {gated:.3f} looks untrained"
    # Aggregate parity: the kernel paths change activation rounding only.
    assert abs(gated - base) < 0.02, (base, gated)
