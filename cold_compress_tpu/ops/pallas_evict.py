"""Pallas TPU kernel: fused heavy-hitter eviction step.

The XLA expression of the eviction decision (windowed-average scores,
protected-slot masking, argmin, history zeroing — caches/heavy_hitter.py)
is ~10 small dependent ops over [B, H, C] buffers; inside the decode step
each costs a sequencing slot far exceeding its byte cost (~24 us/layer
measured via scripts/perf_probe4.py). This kernel does the whole decision
in one pass: one grid step per batch element, everything resident in VMEM.

Outputs the evicted slot index per head (lane-broadcast, sliced by the
wrapper) plus the zeroed history buffers. Covers the common decode config
(history_window_size == 1, no attention thresholding); other configs take
the XLA path (caches/heavy_hitter.py::eviction_idx).

Reference: cache.py:725-765 (_eviction_idx protocol, score → argmin).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _evict_kernel(ipos_ref, num_ref, denom_ref, pos_ref, idx_ref,
                  num_out_ref, denom_out_ref, *, global_tokens,
                  recent_window):
    """One batch element: num/denom/pos [1, H, C] -> idx [1, H, 128]."""
    ipos = ipos_ref[pl.program_id(0)]
    num = num_ref[0]            # [H, C] f32
    denom = denom_ref[0]        # [H, C] i32
    pos = pos_ref[0]            # [H, C] i32

    avg = num / jnp.maximum(denom, 1).astype(jnp.float32)
    protected = jnp.logical_or(
        pos < global_tokens, pos >= ipos - recent_window
    )
    avg = jnp.where(protected, 1.0, avg)
    avg = jnp.where(pos == -1, 0.0, avg)
    idx = jnp.argmin(avg, axis=-1).astype(jnp.int32)  # [H]

    H, C = num.shape
    hit = (
        jax.lax.broadcasted_iota(jnp.int32, (H, C), 1) == idx[:, None]
    )
    num_out_ref[0] = jnp.where(hit, 0.0, num)
    denom_out_ref[0] = jnp.where(hit, 0, denom)
    idx_ref[0] = jnp.broadcast_to(idx[:, None], (H, 128))


@functools.partial(
    jax.jit, static_argnames=("global_tokens", "recent_window", "interpret")
)
def fused_hh_evict(num, denom, pos, input_pos, *, global_tokens: int,
                   recent_window: int, interpret: bool = False):
    """Fused heavy-hitter eviction (W == 1, unthresholded).

    num [B,H,C] f32, denom [B,H,C] i32, pos [B,H,C] i32, input_pos [B] i32
    (per-lane positions for batched generation).
    Returns (idx [B,H] i32, num', denom') — history zeroed at idx.
    """
    B, H, C = num.shape
    kernel = functools.partial(
        _evict_kernel, global_tokens=global_tokens,
        recent_window=recent_window,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, C), lambda b, ipos: (b, 0, 0)),
            pl.BlockSpec((1, H, C), lambda b, ipos: (b, 0, 0)),
            pl.BlockSpec((1, H, C), lambda b, ipos: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, H, 128), lambda b, ipos: (b, 0, 0)),
            pl.BlockSpec((1, H, C), lambda b, ipos: (b, 0, 0)),
            pl.BlockSpec((1, H, C), lambda b, ipos: (b, 0, 0)),
        ],
    )
    idx, num2, denom2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, H, C), jnp.float32),
            jax.ShapeDtypeStruct((B, H, C), jnp.int32),
        ],
        interpret=interpret,
    )(
        jnp.broadcast_to(
            jnp.asarray(input_pos, jnp.int32).reshape(-1), (B,)
        ),
        num, denom, pos,
    )
    return idx[:, :, 0], num2, denom2


def fused_evict_supported(spec, state) -> bool:
    """Gate: TPU, single-slot history, unthresholded, lane-aligned C.
    Opt-in via CCT_FUSED_EVICT=1 until Mosaic-validated on the real chip
    (the tunnel was down when this kernel landed); default stays the XLA
    path so the driver's bench never rides an uncompiled kernel."""
    import os

    if os.environ.get("CCT_FUSED_EVICT", "0") != "1":
        return False
    from .pallas_qmm import backend_ok

    if not backend_ok():
        return False
    C = state.pos.shape[-1]
    return (
        spec.history_window_size == 1
        and not spec.attn_thresholding
        and C % 128 == 0
        and state.extra["attn_num"].ndim == 3
    )
