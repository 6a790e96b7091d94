"""Fused heavy-hitter eviction kernel vs the XLA reference path.

The kernel (ops/pallas_evict.py) must reproduce caches/heavy_hitter.py::
eviction_idx exactly for the gated config (W == 1, unthresholded):
same argmin slot, same zeroed history. Reference: cache.py:725-765.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cold_compress_tpu.caches.base import CacheSpec, init_state
from cold_compress_tpu.caches.heavy_hitter import HeavyHitterCache
from cold_compress_tpu.ops.pallas_evict import fused_hh_evict


def _spec(C=128, g=4, w=8):
    return CacheSpec(
        cache_strategy="heavy_hitter",
        max_cache_length=C,
        max_seq_length=4 * C,
        global_tokens=g,
        recent_window=w,
        history_window_size=1,
    )


def _state(rng, spec, B=1, H=4, D=16, fill=None):
    state = init_state(
        spec, B, H, D, dtype=jnp.float32,
        extra=HeavyHitterCache.init_extra(spec, B, H, D),
    )
    C = spec.max_cache_length
    fill = C if fill is None else fill
    pos = np.full((B, H, C), -1, np.int32)
    pos[:, :, :fill] = np.arange(fill)[None, None, :]
    num = rng.rand(B, H, C).astype(np.float32) * 2.0
    denom = rng.randint(1, 9, size=(B, H, C)).astype(np.int32)
    return state.replace(
        pos=jnp.asarray(pos),
        extra={
            **state.extra,
            "attn_num": jnp.asarray(num),
            "attn_denom": jnp.asarray(denom),
        },
    )


@pytest.mark.parametrize("B,fill", [(1, 128), (2, 128), (1, 100)])
def test_fused_matches_xla(B, fill):
    rng = np.random.RandomState(0)
    spec = _spec()
    state = _state(rng, spec, B=B, fill=fill)
    ipos = jnp.full((B, 1, 1), 200, jnp.int32)

    idx_ref, state_ref = HeavyHitterCache.eviction_idx(spec, state, ipos)
    idx_f, num_f, denom_f = fused_hh_evict(
        state.extra["attn_num"],
        state.extra["attn_denom"],
        state.pos,
        jnp.full((B,), 200, jnp.int32),
        global_tokens=spec.global_tokens,
        recent_window=spec.recent_window,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(idx_f), np.asarray(idx_ref))
    np.testing.assert_array_equal(
        np.asarray(num_f), np.asarray(state_ref.extra["attn_num"])
    )
    np.testing.assert_array_equal(
        np.asarray(denom_f), np.asarray(state_ref.extra["attn_denom"])
    )


def test_fused_prefers_empty_and_protects():
    """Empty slots (pos == -1) win the argmin; globals and the recent
    window never get evicted even with zero attention mass."""
    spec = _spec(C=128, g=4, w=8)
    rng = np.random.RandomState(1)
    state = _state(rng, spec, fill=100)
    # zero attention on a global slot and a recent slot: still protected
    num = np.asarray(state.extra["attn_num"]).copy()
    num[:, :, 2] = 0.0    # global (pos 2 < 4)
    num[:, :, 99] = 0.0   # recent (pos 99 >= 100 - 8)
    ipos = jnp.full((1,), 100, jnp.int32)
    idx, _, _ = fused_hh_evict(
        jnp.asarray(num), state.extra["attn_denom"], state.pos, ipos,
        global_tokens=4, recent_window=8, interpret=True,
    )
    # empty slots exist at >= 100 -> argmin must pick one of them
    assert (np.asarray(idx) >= 100).all()


def test_fused_per_lane_positions():
    """B=2 with different input_pos per lane protects different windows."""
    spec = _spec(C=128, g=0, w=4)
    rng = np.random.RandomState(2)
    state = _state(rng, spec, B=2, fill=128)
    num = np.zeros((2, 4, 128), np.float32)
    num[0, :, 120] = 0.0  # lane 0: pos 120 recent iff ipos0 - 4 <= 120
    denom = np.ones((2, 4, 128), np.int32)
    ipos = jnp.asarray([124, 400], jnp.int32)  # lane 1: nothing recent
    idx, _, _ = fused_hh_evict(
        jnp.asarray(num), jnp.asarray(denom), state.pos, ipos,
        global_tokens=0, recent_window=4, interpret=True,
    )
    ref0, _ = HeavyHitterCache.eviction_idx(
        spec, state.replace(
            extra={**state.extra, "attn_num": jnp.asarray(num),
                   "attn_denom": jnp.asarray(denom)},
        ),
        jnp.asarray([124, 400], jnp.int32).reshape(2, 1, 1),
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref0))
