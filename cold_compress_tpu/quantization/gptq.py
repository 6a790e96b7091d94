"""GPTQ: Hessian-based int4 weight quantization with calibration.

The reference's GPTQ path is broken (reference: GPTQ.py:16-19 imports symbols
that no longer exist; SURVEY.md §2 row 10). This is a working re-implementation
of the algorithm (Frantar et al., arXiv:2210.17323) designed for the
functional JAX engine: instead of tracing an fx graph (reference: GPTQ.py:132
``GenericGPTQRunner(fx.Interpreter)``), calibration is an explicit
layer-by-layer forward pass that accumulates per-linear input Hessians and
quantizes each weight with error feedback, propagating activations through the
already-quantized layers (standard sequential GPTQ).

Output format matches ``weight_quant.quantize_weight_int4`` (group-wise affine
uint4, nibble-packed) so GPTQ checkpoints run on the same inference path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import transformer as T
from ..models.config import ModelConfig
from ..models.rope import apply_rotary_emb
from ..ops.linear import QuantizedWeight, dequantize_weight, pack_int4

# --------------------------------------------------------------------------
# Core GPTQ matrix quantization
# --------------------------------------------------------------------------


def gptq_quantize_matrix(
    W: np.ndarray,  # [in, out] float
    H: np.ndarray,  # [in, in] Hessian ~ 2 X^T X
    group_size: int = 128,
    percdamp: float = 0.01,
):
    """Quantize W column-block-wise (along the input axis) with error
    feedback through the inverse-Hessian Cholesky factor."""
    from .weight_quant import effective_group_size

    in_dim, out_dim = W.shape
    group_size = effective_group_size(in_dim, group_size)
    W = W.astype(np.float32).copy()
    H = H.astype(np.float64).copy()

    dead = np.diag(H) == 0
    H[dead, dead] = 1.0
    W[dead, :] = 0.0

    damp = percdamp * np.mean(np.diag(H))
    H[np.arange(in_dim), np.arange(in_dim)] += damp

    # Hinv upper Cholesky factor of H^-1 (as in the reference algorithm).
    Hinv = np.linalg.cholesky(np.linalg.inv(H), upper=True)

    Q = np.zeros((in_dim, out_dim), np.uint8)
    scales = np.zeros((in_dim // group_size, out_dim), np.float32)
    zeros = np.zeros((in_dim // group_size, out_dim), np.float32)

    for g0 in range(0, in_dim, group_size):
        g1 = min(g0 + group_size, in_dim)
        # Group quantization params from the (error-compensated) weights.
        block = W[g0:g1, :]
        mn = block.min(axis=0)
        mx = block.max(axis=0)
        s = np.maximum(mx - mn, 1e-6) / 15.0
        z = mn + s * 8.0
        gi = g0 // group_size
        scales[gi] = s
        zeros[gi] = z
        for i in range(g0, g1):
            w = W[i, :]
            q = np.clip(np.round((w - mn) / s), 0, 15)
            Q[i, :] = q.astype(np.uint8)
            dq = (q - 8.0) * s + z
            err = (w - dq) / Hinv[i, i]
            if i + 1 < in_dim:
                W[i + 1 :, :] -= np.outer(Hinv[i, i + 1 :], err)

    packed = np.asarray(pack_int4(jnp.asarray(Q), axis=0))
    return QuantizedWeight(
        w=jnp.asarray(packed),
        scales=jnp.asarray(scales, jnp.bfloat16),
        zeros=jnp.asarray(zeros, jnp.bfloat16),
        kind="int4",
        group_size=group_size,
    )


def _hessian(x: np.ndarray) -> np.ndarray:
    """H = 2 X^T X over all calibration rows. x: [N, in]."""
    xf = x.astype(np.float32).reshape(-1, x.shape[-1])
    return 2.0 * (xf.T @ xf).astype(np.float64)


# --------------------------------------------------------------------------
# Sequential layer-by-layer calibration
# --------------------------------------------------------------------------


def gptq_quantize_params(
    cfg: ModelConfig,
    params,
    rope,
    group_size: int = 128,
    n_samples: int = 8,
    seq_length: int = 512,
    calibration_tokens: Optional[np.ndarray] = None,
    seed: int = 1234,
    verbose: bool = True,
):
    """Quantize all linears to int4 with GPTQ.

    ``calibration_tokens``: [n_samples, seq_length] int array; random tokens
    are used if none are provided (callers with real data should pass task
    prompts — see evals/).
    """
    if calibration_tokens is None:
        rng = np.random.RandomState(seed)
        calibration_tokens = rng.randint(
            0, cfg.vocab_size, size=(n_samples, seq_length)
        )
    tokens = jnp.asarray(calibration_tokens, jnp.int32)
    N, L = tokens.shape

    freqs = rope[:L]
    x = np.asarray(T._embed(params, tokens), np.float32)  # [N, L, D]

    def lin(w_leaf, a, bias=None):
        out = np.asarray(a, np.float32) @ np.asarray(
            dequantize_weight(w_leaf, jnp.float32)
        )
        if bias is not None:
            out = out + np.asarray(bias, np.float32)
        return out

    new_layers = []
    for li, lp in enumerate(params["layers"]):
        a = np.asarray(
            T.rms_norm(jnp.asarray(x), lp["attention_norm"], cfg.norm_eps),
            np.float32,
        )
        H_qkv = _hessian(a)
        wq_q = gptq_quantize_matrix(
            np.asarray(lp["attn"]["wq"], np.float32), H_qkv, group_size
        )
        wk_q = gptq_quantize_matrix(
            np.asarray(lp["attn"]["wk"], np.float32), H_qkv, group_size
        )
        wv_q = gptq_quantize_matrix(
            np.asarray(lp["attn"]["wv"], np.float32), H_qkv, group_size
        )

        # Forward attention with the quantized projections (full causal, no
        # cache — calibration only).
        q = lin(wq_q, a, lp["attn"].get("bq")).reshape(
            N, L, cfg.n_head, cfg.head_dim
        )
        k = lin(wk_q, a, lp["attn"].get("bk")).reshape(
            N, L, cfg.n_kv_head, cfg.head_dim
        )
        v = lin(wv_q, a, lp["attn"].get("bv")).reshape(
            N, L, cfg.n_kv_head, cfg.head_dim
        )
        q = np.asarray(apply_rotary_emb(jnp.asarray(q), freqs))
        k = np.asarray(apply_rotary_emb(jnp.asarray(k), freqs))
        from ..ops.attention import prefill_attention

        y, _ = prefill_attention(
            jnp.asarray(q).transpose(0, 2, 1, 3),
            jnp.asarray(k).transpose(0, 2, 1, 3),
            jnp.asarray(v).transpose(0, 2, 1, 3),
            jnp.ones((N, L), bool),
            jnp.int32(L),
        )
        y = np.asarray(y, np.float32).transpose(0, 2, 1, 3).reshape(N, L, -1)

        H_wo = _hessian(y)
        wo_q = gptq_quantize_matrix(
            np.asarray(lp["attn"]["wo"], np.float32), H_wo, group_size
        )
        x = x + lin(wo_q, y)

        b = np.asarray(
            T.rms_norm(jnp.asarray(x), lp["ffn_norm"], cfg.norm_eps),
            np.float32,
        )
        H_ffn = _hessian(b)
        w1_q = gptq_quantize_matrix(
            np.asarray(lp["ffn"]["w1"], np.float32), H_ffn, group_size
        )
        w3_q = gptq_quantize_matrix(
            np.asarray(lp["ffn"]["w3"], np.float32), H_ffn, group_size
        )
        h = np.asarray(
            jax.nn.silu(jnp.asarray(lin(w1_q, b)))
        ) * lin(w3_q, b)
        H_w2 = _hessian(h)
        w2_q = gptq_quantize_matrix(
            np.asarray(lp["ffn"]["w2"], np.float32), H_w2, group_size
        )
        x = x + lin(w2_q, h)

        attn = {"wq": wq_q, "wk": wk_q, "wv": wv_q, "wo": wo_q}
        for bias in ("bq", "bk", "bv"):
            if bias in lp["attn"]:
                attn[bias] = lp["attn"][bias]
        new_layers.append(
            {
                "attn": attn,
                "ffn": {"w1": w1_q, "w3": w3_q, "w2": w2_q},
                "attention_norm": lp["attention_norm"],
                "ffn_norm": lp["ffn_norm"],
            }
        )
        if verbose:
            print(f"  GPTQ: layer {li + 1}/{cfg.n_layer} done")

    out_p = params["output"]
    if out_p is not None:
        xf = np.asarray(
            T.rms_norm(jnp.asarray(x), params["norm"], cfg.norm_eps),
            np.float32,
        )
        out_p = gptq_quantize_matrix(
            np.asarray(out_p, np.float32), _hessian(xf), group_size
        )
    return {
        "tok_embeddings": params["tok_embeddings"],
        "layers": new_layers,
        "norm": params["norm"],
        "output": out_p,
    }
