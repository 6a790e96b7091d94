"""Cache-strategy unit tests against hand-computed eviction decisions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cold_compress_tpu.caches import (
    CacheSpec,
    compression_ratio,
    decode_update,
    get_cache_strategy,
    prefill_update,
    reset_state,
)

B, H, D = 1, 2, 8


def make(strategy, C=8, **kw):
    spec = CacheSpec(
        cache_strategy=strategy, max_cache_length=C, max_seq_length=64, **kw
    )
    cls = get_cache_strategy(strategy)
    return cls, cls.init(spec, B, H, D, jnp.float32)


def row(pos, val=None):
    """A distinguishable [B,H,1,D] K/V row encoding its position."""
    v = float(pos if val is None else val)
    return jnp.full((B, H, 1, D), v, jnp.float32)


def fill_n(cls, state, n, start=0):
    for i in range(start, start + n):
        state, *_ = decode_update(cls, state, jnp.int32(i), row(i), row(i))
    return state


class TestFullCache:
    def test_appends_in_order(self):
        cls, state = make("full", C=8)
        state = fill_n(cls, state, 5)
        np.testing.assert_array_equal(
            np.asarray(state.pos[0, 0]), [0, 1, 2, 3, 4, -1, -1, -1]
        )
        assert int(state.cache_ct[0, 0]) == 5
        np.testing.assert_array_equal(
            np.asarray(state.mask[0, 0]),
            [True] * 5 + [False] * 3,
        )
        # K rows landed in their slots.
        assert float(state.k[0, 0, 3, 0]) == 3.0


class TestRecentGlobal:
    def test_evicts_oldest_non_global(self):
        cls, state = make("recent_global", C=4, global_tokens=2)
        # Prefill fills slots contiguously (globals land in slots < g; the
        # decode path never inserts into global slots, matching reference
        # cache.py:552-556).
        P = 4
        k = jnp.ones((B, H, P, D))
        pos = jnp.arange(P, dtype=jnp.int32)
        state = prefill_update(
            cls, state, pos[None, None], k, k, jnp.ones((1, 1, P), bool)
        )  # pos [0,1,2,3]
        state, *_ = decode_update(cls, state, jnp.int32(4), row(4), row(4))
        # Slot of pos=2 (oldest beyond the 2 globals) is overwritten.
        np.testing.assert_array_equal(np.asarray(state.pos[0, 0]), [0, 1, 4, 3])
        state, *_ = decode_update(cls, state, jnp.int32(5), row(5), row(5))
        np.testing.assert_array_equal(np.asarray(state.pos[0, 0]), [0, 1, 4, 5])
        # Count saturates at budget.
        assert int(state.cache_ct[0, 0]) == 4


class TestL2:
    def test_evicts_highest_norm_key(self):
        cls, state = make("l2", C=4, global_tokens=1, recent_window=1)
        # keys with distinct norms: pos0 norm 1, pos1 norm 9 (big), pos2 norm 2, pos3 norm 3
        norms = [1.0, 9.0, 2.0, 3.0]
        for i, n in enumerate(norms):
            state, *_ = decode_update(
                cls, state, jnp.int32(i), row(i, n / np.sqrt(D)), row(i)
            )
        # Next insert: slot with the largest key norm (pos=1) is evicted
        # (global slot 0 protected; recent window protects pos>=4).
        state, *_ = decode_update(cls, state, jnp.int32(4), row(4, 0.5), row(4))
        np.testing.assert_array_equal(np.asarray(state.pos[0, 0]), [0, 4, 2, 3])

    def test_head_specific_evictions_differ(self):
        cls, state = make("l2", C=4, global_tokens=0, recent_window=1)
        # Give head 0 and head 1 different norm profiles.
        for i in range(4):
            k = jnp.zeros((B, H, 1, D), jnp.float32)
            k = k.at[:, 0].set(float(i + 1))  # head0: increasing norms
            k = k.at[:, 1].set(float(4 - i))  # head1: decreasing norms
            state, *_ = decode_update(cls, state, jnp.int32(i), k, row(i))
        state, *_ = decode_update(cls, state, jnp.int32(4), row(4, 0.1), row(4))
        # head0 evicts pos3 (largest norm, pos within window excluded: recent
        # window protects pos >= 3... use pos 2 then). Just assert they differ.
        assert not np.array_equal(
            np.asarray(state.pos[0, 0]), np.asarray(state.pos[0, 1])
        )


class TestRandom:
    def test_protects_global_and_recent(self):
        cls, state = make("random", C=6, global_tokens=2, recent_window=2)
        state = fill_n(cls, state, 6)
        for step in range(6, 20):
            state, *_ = decode_update(
                cls, state, jnp.int32(step), row(step), row(step)
            )
            pos = np.asarray(state.pos[0, 0])
            # Globals always survive.
            assert pos[0] == 0 and pos[1] == 1
            # The just-inserted token is present.
            assert step in pos

    def test_deterministic_given_counter(self):
        cls, s1 = make("random", C=6, global_tokens=1, recent_window=1)
        _, s2 = make("random", C=6, global_tokens=1, recent_window=1)
        s1 = fill_n(cls, s1, 10)
        s2 = fill_n(cls, s2, 10)
        np.testing.assert_array_equal(np.asarray(s1.pos), np.asarray(s2.pos))


class TestKeepItOdd:
    def test_prefers_evicting_even_positions(self):
        cls, state = make("keep_it_odd", C=4, global_tokens=0, recent_window=1)
        state = fill_n(cls, state, 4)  # pos 0..3
        state, *_ = decode_update(cls, state, jnp.int32(4), row(4), row(4))
        pos = np.asarray(state.pos[0, 0])
        # An even position was evicted (0 or 2), odd ones retained.
        assert 1 in pos and 3 in pos and 4 in pos


def prefill_4(cls, state):
    """Seed 4 tokens through the prefill path (the realistic flow; a pure
    decode fill with zero attention history ties empty and filled slots at
    score 0.0, exactly as in reference cache.py:749)."""
    P = 4
    k = jnp.ones((B, H, P, D))
    pos = jnp.arange(P, dtype=jnp.int32)
    return prefill_update(
        cls, state, pos[None, None], k, k, jnp.ones((1, 1, P), bool)
    )


class TestHeavyHitter:
    def spec_kw(self):
        return dict(global_tokens=1, recent_window=1, history_window_size=1)

    def test_evicts_lowest_attention(self):
        cls, state = make("heavy_hitter", C=4, **self.spec_kw())
        state = prefill_4(cls, state)
        # Feed attention history: slot for pos=2 consistently cold.
        attn = jnp.array([[[0.4, 0.3, 0.01, 0.29]]] * H).reshape(1, H, 4)
        for step in range(3):
            state = cls.update_state(
                state.spec, state, jnp.int32(4 + step), attn, is_prefill=False
            )
        state, *_ = decode_update(cls, state, jnp.int32(4), row(4), row(4))
        np.testing.assert_array_equal(np.asarray(state.pos[0, 0]), [0, 1, 4, 3])
        # History at the claimed slot was zeroed.
        assert float(state.extra["attn_num"][0, 0, 2]) == 0.0
        assert int(state.extra["attn_denom"][0, 0, 2]) == 0

    def test_protects_global_and_recent(self):
        cls, state = make("heavy_hitter", C=4, **self.spec_kw())
        state = prefill_4(cls, state)
        # Make the global token (pos 0) and most recent (pos 3) coldest.
        attn = jnp.array([[[0.0, 0.5, 0.5, 0.0]]] * H).reshape(1, H, 4)
        state = cls.update_state(state.spec, state, jnp.int32(4), attn, False)
        state, *_ = decode_update(cls, state, jnp.int32(4), row(4), row(4))
        pos = np.asarray(state.pos[0, 0])
        assert 0 in pos and 3 in pos  # survived

    def test_windowed_history(self):
        cls, state = make(
            "heavy_hitter",
            C=4,
            global_tokens=0,
            recent_window=1,
            history_window_size=2,
        )
        state = prefill_4(cls, state)
        assert state.extra["attn_num"].shape == (B, H, 4, 2)
        a1 = jnp.full((1, H, 4), 0.25)
        state = cls.update_state(state.spec, state, jnp.int32(4), a1, False)
        a2 = jnp.array([[[0.7, 0.1, 0.1, 0.1]]] * H).reshape(1, H, 4)
        state = cls.update_state(state.spec, state, jnp.int32(5), a2, False)
        num = np.asarray(state.extra["attn_num"][0, 0])
        np.testing.assert_allclose(num[0], [0.25, 0.7])


class TestQuantizedCache:
    @pytest.mark.parametrize("bits", [8, 4, 2])
    def test_roundtrip_storage(self, bits):
        cls, state = make("full", C=8, cache_bits=bits)
        vals = jax.random.normal(jax.random.PRNGKey(0), (B, H, 1, D))
        state, k_out, v_out, mask = decode_update(
            cls, state, jnp.int32(0), vals, vals
        )
        got = np.asarray(k_out[0, :, 0])
        want = np.asarray(vals[0, :, 0])
        tol = {8: 0.02, 4: 0.25, 2: 0.9}[bits]
        np.testing.assert_allclose(got, want, atol=tol)
        # Packed storage is smaller.
        assert state.k.dtype == jnp.uint8
        assert state.k.shape[-1] == D // {8: 1, 4: 2, 2: 4}[bits]

    def test_quantized_compression_ratio(self):
        cls, state = make("full", C=8, cache_bits=4)
        state = fill_n(cls, state, 8)
        # 8 tokens kept at 4/16 bits out of seq_len-1=15 -> ratio (15-2)/15
        r = float(compression_ratio(state, jnp.int32(16)))
        np.testing.assert_allclose(r, (15 - 8 * 4 / 16) / 15, rtol=1e-5)


class TestPrefillPath:
    def test_prefill_fill_and_reset(self):
        cls, state = make("full", C=8)
        P = 6
        k = jax.random.normal(jax.random.PRNGKey(1), (B, H, P, D))
        pos = jnp.arange(P, dtype=jnp.int32)
        valid = pos < 5
        state = prefill_update(cls, state, pos[None, None], k, k, valid[None, None])
        assert int(state.cache_ct[0, 0]) == 5
        np.testing.assert_array_equal(
            np.asarray(state.pos[0, 0]), [0, 1, 2, 3, 4, -1, -1, -1]
        )
        state2 = reset_state(state)
        assert int(state2.cache_ct.sum()) == 0
        assert np.all(np.asarray(state2.pos) == -1)
        assert not np.any(np.asarray(state2.mask))

    def test_reset_recurses_into_analysis_shadow(self):
        # Regression (ADVICE r1): reset must restore the shadow cache's
        # pos=-1 / scales=1e-6 sentinels and the -1 loss-buffer sentinel,
        # not tree-zero them.
        cls, state = make(
            "debug_heavy_hitter", C=8, global_tokens=1, cache_bits=8
        )
        state = fill_n(cls, state, 4)
        shadow = state.extra["shadow"]
        assert int(shadow.cache_ct.sum()) > 0
        state2 = reset_state(state)
        shadow2 = state2.extra["shadow"]
        assert np.all(np.asarray(shadow2.pos) == -1)
        assert int(shadow2.cache_ct.sum()) == 0
        np.testing.assert_allclose(np.asarray(shadow2.k_scales), 1e-6)
        assert np.all(np.asarray(state2.extra["attention_losses"]) == -1.0)
        assert int(state2.extra["attention_loss_ctr"]) == 0

    def test_decode_fills_empty_slots_first(self):
        cls, state = make("recent_global", C=8, global_tokens=1)
        P = 4
        k = jnp.ones((B, H, P, D))
        pos = jnp.arange(P, dtype=jnp.int32)
        state = prefill_update(
            cls, state, pos[None, None], k, k, jnp.ones((1, 1, P), bool)
        )
        state, *_ = decode_update(cls, state, jnp.int32(4), row(4), row(4))
        np.testing.assert_array_equal(
            np.asarray(state.pos[0, 0]), [0, 1, 2, 3, 4, -1, -1, -1]
        )
