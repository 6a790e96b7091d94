"""Rotary position embeddings with Llama-3.1 frequency scaling.

Interleaved-pair convention matching the reference
(reference: model.py:460-519); HF checkpoints are permuted into this layout by
the converter (scripts/convert_hf_checkpoint.py in the reference,
``models/convert.py`` here).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import RopeScaling


def precompute_freqs_cis(
    seq_len: int,
    n_elem: int,
    base: float = 10000.0,
    rope_scaling: Optional[RopeScaling] = None,
) -> jax.Array:
    """Return [seq_len, n_elem//2, 2] (cos, sin) table in f32
    (reference: model.py:460-504)."""
    freqs = 1.0 / (
        base ** (np.arange(0, n_elem, 2)[: n_elem // 2] / n_elem)
    )
    if rope_scaling is not None:
        assert rope_scaling.rope_type == "llama3", (
            "Only Llama 3.1 scaling is supported"
        )
        low_wl = (
            rope_scaling.original_max_position_embeddings
            / rope_scaling.low_freq_factor
        )
        high_wl = (
            rope_scaling.original_max_position_embeddings
            / rope_scaling.high_freq_factor
        )
        scaled = []
        for f in freqs:
            wl = 2 * math.pi / f
            if wl < high_wl:
                scaled.append(f)
            elif wl > low_wl:
                scaled.append(f / rope_scaling.factor)
            else:
                smooth = (
                    rope_scaling.original_max_position_embeddings / wl
                    - rope_scaling.low_freq_factor
                ) / (
                    rope_scaling.high_freq_factor - rope_scaling.low_freq_factor
                )
                scaled.append((1 - smooth) * f / rope_scaling.factor + smooth * f)
        freqs = np.array(scaled)
    t = np.arange(seq_len)
    angles = np.outer(t, freqs)
    table = np.stack([np.cos(angles), np.sin(angles)], axis=-1)
    return jnp.asarray(table, dtype=jnp.float32)


def apply_rotary_emb(x: jax.Array, freqs: jax.Array) -> jax.Array:
    """x: [B, L, H, D]; freqs: [L, D//2, 2] shared across the batch, or
    [B, L, D//2, 2] per-lane (batched decode at different positions).
    Interleaved-pair rotation (reference: model.py:507-519)."""
    B, L, H, D = x.shape
    xf = x.astype(jnp.float32).reshape(B, L, H, D // 2, 2)
    if freqs.ndim == 4:  # per-lane table
        cos = freqs[:, :, None, :, 0]
        sin = freqs[:, :, None, :, 1]
    else:
        cos = freqs[None, :, None, :, 0]
        sin = freqs[None, :, None, :, 1]
    x0 = xf[..., 0]
    x1 = xf[..., 1]
    out = jnp.stack([x0 * cos - x1 * sin, x1 * cos + x0 * sin], axis=-1)
    return out.reshape(B, L, H, D).astype(x.dtype)
