"""Weight-only quantization: int8 per-channel and int4 group-wise.

TPU-native counterpart of the reference quantization handlers
(reference: quantize.py:333-404 int8, quantize.py:407-529 int4). Instead of
swapping nn.Module classes, weight leaves in the params pytree are replaced by
self-describing dicts consumed by ``ops.linear``:

  int8: {"kind": "int8", "w": int8 [in, out], "scales": f32 [out]}
  int4: {"kind": "int4", "w": uint8 [in//2, out] (nibble-packed along in),
         "scales"/"zeros": f32 [in//group_size, out], "group_size": int}

The int4 affine convention is dequant = (q - 8) * scale + zero, equivalent to
the reference's min/max affine form (quantize.py:133-176).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..ops.linear import QuantizedWeight, pack_int4

QUANTIZABLE = ("wq", "wk", "wv", "wo", "w1", "w2", "w3")


def effective_group_size(in_dim: int, group_size: int) -> int:
    """Largest divisor of in_dim that is <= group_size (dims like
    stories15M's 288 are not multiples of 128)."""
    g = min(group_size, in_dim)
    while in_dim % g != 0:
        g -= 1
    return g


def quantize_weight_int8(w: jax.Array):
    """Symmetric per-output-channel int8 (reference: quantize.py:25-57)."""
    wf = np.asarray(w, np.float32)
    scales = np.maximum(np.abs(wf).max(axis=0), 1e-8) / 127.0
    q = np.clip(np.round(wf / scales[None, :]), -128, 127).astype(np.int8)
    return QuantizedWeight(
        w=jnp.asarray(q), scales=jnp.asarray(scales, jnp.float32), kind="int8"
    )


def quantize_weight_int4(w: jax.Array, group_size: int = 128):
    """Group-wise affine uint4 along the input axis, nibble-packed
    (reference: quantize.py:133-176 ``group_quantize_tensor``)."""
    wf = np.asarray(w, np.float32)
    in_dim, out_dim = wf.shape
    group_size = effective_group_size(in_dim, group_size)
    g = wf.reshape(in_dim // group_size, group_size, out_dim)
    mn = g.min(axis=1)
    mx = g.max(axis=1)
    scales = np.maximum(mx - mn, 1e-6) / 15.0
    zeros = mn + scales * 8.0
    q = np.clip(
        np.round((g - mn[:, None, :]) / scales[:, None, :]), 0, 15
    ).astype(np.uint8)
    q = q.reshape(in_dim, out_dim)
    packed = np.asarray(pack_int4(jnp.asarray(q), axis=0))
    # bf16 scale/zero storage halves the metadata streamed per decode token
    # (~0.2 GB on an 8B model); the reference's int4 path stores
    # scales_and_zeros as bf16 too (reference: quantize.py:133-176).
    return QuantizedWeight(
        w=jnp.asarray(packed),
        scales=jnp.asarray(scales, jnp.bfloat16),
        zeros=jnp.asarray(zeros, jnp.bfloat16),
        kind="int4",
        group_size=group_size,
    )


def quantize_params(
    params,
    mode: str = "int8",
    group_size: int = 128,
    quantize_output: bool = True,
    output_mode: str = "int8",
):
    """Quantize all linear weights in a params pytree
    (reference: quantize.py:347-368,468-529 — handlers walk nn.Linears; here
    we walk the pytree).

    The vocabulary head defaults to int8 even in int4 mode: logits are always
    computed for a single position, where the native int8 MXU path runs at
    memory speed, while an int4 head that wide would fall back to
    materializing dequantized weights every step.
    """

    def qz(w, m=None):
        m = m or mode
        if w is None or isinstance(w, QuantizedWeight):
            return w
        if m == "int8":
            return quantize_weight_int8(w)
        if m == "int4":
            return quantize_weight_int4(w, group_size)
        raise ValueError(f"Unknown quantization mode: {m}")

    out = {
        "tok_embeddings": params["tok_embeddings"],  # embeddings stay bf16
        "norm": params["norm"],
        "output": qz(params["output"], output_mode)
        if quantize_output
        else params["output"],
        "layers": [],
    }
    for lp in params["layers"]:
        attn = {k: qz(v) if k in QUANTIZABLE else v for k, v in lp["attn"].items()}
        ffn = {k: qz(v) if k in QUANTIZABLE else v for k, v in lp["ffn"].items()}
        out["layers"].append(
            {
                "attn": attn,
                "ffn": ffn,
                "attention_norm": lp["attention_norm"],
                "ffn_norm": lp["ffn_norm"],
            }
        )
    return out


def random_quantized_params(
    cfg: ModelConfig,
    seed: int = 0,
    mode: str = "int4",
    group_size: int = 128,
    dtype=jnp.bfloat16,
    head_mode: str = "int8",
):
    """Random weights created directly in quantized form.

    For benchmarking real model sizes without checkpoints (throughput does not
    depend on weight values): an 8B bf16 init would not even fit in one v5e
    chip's HBM, so packed buffers are materialized directly.
    """
    rng = np.random.RandomState(seed)
    D, H, KVH, hd, I = (
        cfg.dim,
        cfg.n_head,
        cfg.n_kv_head,
        cfg.head_dim,
        cfg.intermediate_size,
    )

    def rand_bytes(shape, dtype):
        # rng.bytes is ~20x faster than rng.randint for multi-GB buffers.
        n = int(np.prod(shape))
        return np.frombuffer(rng.bytes(n), dtype=np.uint8).astype(
            dtype, copy=False
        ).reshape(shape)

    def rand_q(in_dim, out_dim):
        if mode == "int8":
            return QuantizedWeight(
                w=jnp.asarray(
                    (rand_bytes((in_dim, out_dim), np.uint8) % 255).astype(
                        np.int8
                    )
                    - 127
                ),
                scales=jnp.full((out_dim,), 0.02 / 127, jnp.float32),
                kind="int8",
            )
        assert mode == "int4"
        gs = effective_group_size(in_dim, group_size)
        # Random bytes are equally random reinterpreted in the signed-hi
        # int8 packing (ops/linear.py::pack_int4).
        return QuantizedWeight(
            w=jnp.asarray(
                rand_bytes((in_dim // 2, out_dim), np.uint8).view(np.int8)
            ),
            scales=jnp.full((in_dim // gs, out_dim), 0.02 / 8, jnp.bfloat16),
            zeros=jnp.zeros((in_dim // gs, out_dim), jnp.bfloat16),
            kind="int4",
            group_size=gs,
        )

    layers = []
    for i in range(cfg.n_layer):
        layer = {
            "attn": {
                "wq": rand_q(D, H * hd),
                "wk": rand_q(D, KVH * hd),
                "wv": rand_q(D, KVH * hd),
                "wo": rand_q(H * hd, D),
            },
            "ffn": {
                "w1": rand_q(D, I),
                "w3": rand_q(D, I),
                "w2": rand_q(I, D),
            },
            "attention_norm": jnp.ones((D,), dtype),
            "ffn_norm": jnp.ones((D,), dtype),
        }
        if cfg.attention_bias:
            layer["attn"]["bq"] = jnp.zeros((H * hd,), dtype)
            layer["attn"]["bk"] = jnp.zeros((KVH * hd,), dtype)
            layer["attn"]["bv"] = jnp.zeros((KVH * hd,), dtype)
        layers.append(layer)
    emb = (
        rng.standard_normal((cfg.vocab_size, D)).astype(np.float32) * 0.02
    ).astype(np.float16)

    def rand_q8(in_dim, out_dim):
        return QuantizedWeight(
            w=jnp.asarray(
                (rand_bytes((in_dim, out_dim), np.uint8) % 255).astype(np.int8)
                - 127
            ),
            scales=jnp.full((out_dim,), 0.02 / 127, jnp.float32),
            kind="int8",
        )

    return {
        "tok_embeddings": jnp.asarray(emb, dtype),
        "layers": layers,
        "norm": jnp.ones((D,), dtype),
        # Vocab head in int8 (see quantize_params): single-position logits
        # ride the native int8 MXU path at any weight mode; --head_bits 4
        # switches it to int4 (tiled colpack kernel halves head bytes).
        "output": None
        if cfg.tie_word_embeddings
        else (
            rand_q(D, cfg.vocab_size)
            if head_mode == "int4"
            else rand_q8(D, cfg.vocab_size)
        ),
    }
