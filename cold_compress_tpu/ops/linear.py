"""Linear/projection ops with pluggable weight formats.

A weight leaf is either a plain array ``[in, out]`` (bf16/f32) or a dict
describing a quantized weight (produced by ``cold_compress_tpu.quantization``):

  int8 per-channel (reference: quantize.py:333-404):
      {"kind": "int8", "w": int8 [in, out], "scales": f32 [out]}
  int4 group-wise (reference: quantize.py:407-529):
      {"kind": "int4", "w": uint8/int8 packed [in//2, out] (two nibbles per
       byte along the *in* axis), "scales": f32 [n_groups, out],
       "zeros": f32 [n_groups, out], "group_size": int}

``linear`` dispatches on the leaf type so the same model code runs dense or
quantized. The XLA path dequantizes inline (fused by the compiler); a Pallas
dequant-matmul kernel is used on TPU for the int4 path (ops/pallas_qmm.py).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class QuantizedWeight:
    """Self-describing quantized weight leaf (kind/group_size are static so
    the pytree jits cleanly)."""

    w: jax.Array
    scales: jax.Array
    zeros: Optional[jax.Array] = None
    kind: str = field(default="int8", metadata=dict(static=True))
    group_size: int = field(default=128, metadata=dict(static=True))


def is_quantized(x) -> bool:
    return isinstance(x, QuantizedWeight)


def unpack_int4(packed: jax.Array, axis: int = 0) -> jax.Array:
    """Unpack two 4-bit values per byte along ``axis`` (low nibble first).

    Values are unsigned in [0, 15] stored in an int8/uint8 carrier.
    """
    p = packed.astype(jnp.uint8)
    lo = (p & 0x0F).astype(jnp.int8)
    hi = ((p >> 4) & 0x0F).astype(jnp.int8)
    stacked = jnp.stack([lo, hi], axis=axis + 1)
    new_shape = list(packed.shape)
    new_shape[axis] = new_shape[axis] * 2
    return stacked.reshape(new_shape)


def pack_int4(vals: jax.Array, axis: int = 0) -> jax.Array:
    """Pack pairs of 4-bit values (in [0,15]) into bytes along ``axis``."""
    shape = list(vals.shape)
    assert shape[axis] % 2 == 0
    shape[axis] //= 2
    pair_shape = shape[: axis + 1] + [2] + shape[axis + 1 :]
    v = vals.astype(jnp.uint8).reshape(pair_shape)
    lo = jnp.take(v, 0, axis=axis + 1)
    hi = jnp.take(v, 1, axis=axis + 1)
    return (lo | (hi << 4)).astype(jnp.uint8)


def dequantize_weight(w_leaf, dtype=jnp.bfloat16) -> jax.Array:
    """Materialize a quantized weight leaf as a dense [in, out] array."""
    if not is_quantized(w_leaf):
        return w_leaf.astype(dtype)
    if w_leaf.kind == "int8":
        return (
            w_leaf.w.astype(jnp.float32) * w_leaf.scales[None, :]
        ).astype(dtype)
    if w_leaf.kind == "int4":
        gs = w_leaf.group_size
        w = unpack_int4(w_leaf.w, axis=0).astype(jnp.float32)  # [in, out]
        in_dim, out_dim = w.shape
        w = w.reshape(in_dim // gs, gs, out_dim)
        # Affine: x_deq = (q - 8) * scale + zero  (mid-point convention shared
        # with the KV-cache quantizer; reference quantize.py:133-176 uses an
        # equivalent min/max affine form).
        w = (w - 8.0) * w_leaf.scales[:, None, :] + w_leaf.zeros[:, None, :]
        return w.reshape(in_dim, out_dim).astype(dtype)
    raise ValueError(f"Unknown quantized weight kind: {w_leaf.kind}")


def linear(x: jax.Array, w_leaf, bias=None) -> jax.Array:
    """Compute ``x @ w (+ bias)`` for a dense or quantized weight leaf.

    x: [..., in]; returns [..., out].
    """
    if is_quantized(w_leaf):
        w = dequantize_weight(w_leaf, dtype=x.dtype)
    else:
        w = w_leaf
    y = jax.lax.dot_general(
        x,
        w,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
