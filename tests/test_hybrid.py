"""FastGen hybrid cache + analysis (debug_) cache tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cold_compress_tpu.models.transformer import layer_cache as LV

from cold_compress_tpu.caches import CacheSpec, get_cache_strategy
from cold_compress_tpu.caches.hybrid import (
    HybridCache,
    _menu_tables,
    _special_token_mask,
    normalize_hybrid_strategies,
)
from cold_compress_tpu.models import transformer as T
from cold_compress_tpu.runtime.engine import build_cache_specs
from cold_compress_tpu.runtime.generate import generate, reset_caches

MENU = [
    {"strategy": "window", "recent_window": 0.1},
    {"strategy": "special_punc_heavy_hitter", "heavy_hitter_frac": 0.25},
    {
        "strategy": "window_heavy_hitter",
        "heavy_hitter_frac": 0.5,
        "recent_window": 0.1,
    },
    {"strategy": "full"},
]
TOKEN_IDS = {"special": [[256], [257]], "punctuation": [46, 44, 33]}


def hybrid_setup(cfg, min_recovery=0.85, C=96):
    specs = build_cache_specs(
        cfg,
        {
            "cache_strategy": ["hybrid"],
            "max_cache_length": [1.0],
            "prompt_compression_strategy": ["full"],
            "global_tokens": 2,
            "hybrid_strategies": MENU,
            "min_recovery_frac": min_recovery,
        },
        max_seq_length=C,
        token_ids=TOKEN_IDS,
    )
    return specs, T.init_caches(cfg, specs, 1, jnp.float32)


class TestHybrid:
    def test_special_token_mask_multitoken(self):
        spec = CacheSpec(
            token_ids_special=((5,), (7, 8, 9)), token_ids_punc=()
        )
        toks = jnp.asarray([[1, 5, 2, 7, 8, 9, 7, 8, 3]])
        mask = np.asarray(_special_token_mask(spec, toks))[0]
        # Single id 5 and the full 7-8-9 subsequence match; partial 7-8 does
        # not (reference: cache.py:1021-1034 exact-subsequence semantics).
        np.testing.assert_array_equal(
            mask,
            [False, True, False, True, True, True, False, False, False],
        )

    def test_menu_tables_budgets(self):
        spec = CacheSpec(
            max_cache_length=100,
            hybrid_strategies=normalize_hybrid_strategies(MENU),
        )
        t = _menu_tables(spec)
        np.testing.assert_array_equal(
            np.asarray(t["window_len"]), [10, 0, 10, 0]
        )
        np.testing.assert_array_equal(
            np.asarray(t["hh_budget"]), [0, 25, 50, 0]
        )
        assert bool(t["is_full"][3])

    def test_full_strategy_always_qualifies(self, tiny_model):
        """With min_recovery > any compressive score, every head falls to
        'full' (score 1.0)."""
        cfg, params, rope = tiny_model
        specs, caches = hybrid_setup(cfg, min_recovery=0.999)
        prompt = [256] + list(range(1, 52))
        _, _, caches = generate(cfg, params, rope, caches, prompt, 8)
        sidx = np.asarray(LV(caches, 0).extra["strategy_idx"])
        assert np.all(sidx == 3)  # 'full' is menu index 3
        # Full keeps every prompt token + decoded tokens.
        assert int(LV(caches, 0).cache_ct[0, 0]) >= 52

    def test_low_recovery_picks_most_compressive(self, tiny_model):
        cfg, params, rope = tiny_model
        specs, caches = hybrid_setup(cfg, min_recovery=0.01)
        prompt = [256] + list(range(1, 52))
        _, _, caches = generate(cfg, params, rope, caches, prompt, 8)
        sidx = np.asarray(LV(caches, 0).extra["strategy_idx"])
        assert np.all(sidx == 0)  # first (most compressive) entry qualifies

    def test_budget_enforced_during_decode(self, tiny_model):
        """Heads on a compressive policy stop growing at their budget."""
        cfg, params, rope = tiny_model
        specs, caches = hybrid_setup(cfg, min_recovery=0.01, C=96)
        prompt = [256] + list(range(1, 40))
        _, info, caches = generate(cfg, params, rope, caches, prompt, 40)
        st = LV(caches, 0)
        # window strategy budget: global(2) + round(0.1 * 96)=10
        assert int(st.cache_ct.max()) <= 12 + int(st.extra["num_punc"][0]) + int(
            st.extra["num_special"][0]
        )

    def test_variable_length_heads(self, tiny_model):
        """Different heads may carry different token counts (the hybrid is
        the only variable-length cache, reference: cache.py:799)."""
        cfg, params, rope = tiny_model
        specs, caches = hybrid_setup(cfg, min_recovery=0.9)
        prompt = [256] + list(range(1, 60)) + [46]
        _, _, caches = generate(cfg, params, rope, caches, prompt, 8)
        ct = np.asarray(LV(caches, 0).cache_ct)
        assert ct.min() > 0

    def test_dummy_slot_drop_at_exact_occupancy(self):
        """Regression (VERDICT r1 weak #5): a non-inserting (punc-only) head
        at exact occupancy C must leave its cache byte-identical — slot C-1
        holds a real row there, and the dummy-slot scatter used to overwrite
        its K/V while a sibling 'full' head appends normally."""
        C, KVH, D = 8, 2, 4
        menu = [{"strategy": "special_punc"}, {"strategy": "full"}]
        spec = CacheSpec(
            cache_strategy="hybrid",
            max_cache_length=C,
            max_seq_length=64,
            global_tokens=2,
            hybrid_strategies=normalize_hybrid_strategies(menu),
            token_ids_special=((9,),),
            token_ids_punc=(46,),
        )
        state = HybridCache.init(spec, 1, KVH, D, jnp.float32)
        # Hand-fill every slot of both heads: pos 0..C-1, distinguishable K/V.
        kbuf = jnp.arange(C, dtype=jnp.float32)[None, None, :, None]
        kbuf = jnp.broadcast_to(kbuf, (1, KVH, C, D))
        extra = dict(state.extra)
        extra["strategy_idx"] = jnp.asarray([[0, 1]], jnp.int32)
        # punc head: 2 kept punc tokens -> budget = 2 global + 2 punc = 4 < C
        extra["punc_mask"] = (
            jnp.zeros((1, KVH, C), bool).at[0, 0, 2:4].set(True)
        )
        extra["num_punc"] = jnp.asarray([2], jnp.int32)
        state = state.replace(
            k=kbuf,
            v=kbuf + 100.0,
            pos=jnp.broadcast_to(jnp.arange(C)[None, None], (1, KVH, C)),
            mask=jnp.ones((1, KVH, C), bool),
            cache_ct=jnp.full((1, KVH), C, jnp.int32),
            extra=extra,
        )
        before = tuple(
            np.asarray(x).copy()
            for x in (state.k, state.v, state.pos, state.mask)
        )
        new_row = jnp.full((1, KVH, 1, D), 99.0, jnp.float32)
        state2, *_ = HybridCache.decode_update(
            state, jnp.int32(C), new_row, new_row,
            token=jnp.asarray([5], jnp.int32),  # not punctuation
        )
        # Punc head (0): byte-identical everywhere, occupancy unchanged.
        for got, want in zip(
            (state2.k, state2.v, state2.pos, state2.mask), before
        ):
            np.testing.assert_array_equal(np.asarray(got)[0, 0], want[0, 0])
        assert int(state2.cache_ct[0, 0]) == C
        # Full head (1): appended into the clamped last slot, ct stays at C.
        assert float(np.asarray(state2.k)[0, 1, C - 1, 0]) == 99.0
        assert int(np.asarray(state2.pos)[0, 1, C - 1]) == C
        assert int(state2.cache_ct[0, 1]) == C

    def test_strategy_histogram_sums_to_one(self, tiny_model):
        cfg, params, rope = tiny_model
        specs, caches = hybrid_setup(cfg)
        prompt = [256] + list(range(1, 40))
        _, _, caches = generate(cfg, params, rope, caches, prompt, 4)
        hist = np.asarray(
            HybridCache.strategy_histogram(LV(caches, 0).spec, LV(caches, 0))
        )
        np.testing.assert_allclose(hist.sum(), 1.0, rtol=1e-6)


class TestAnalysisCache:
    def setup_debug(self, cfg, inner="heavy_hitter", C=24):
        specs = build_cache_specs(
            cfg,
            {
                "cache_strategy": [f"debug_{inner}"],
                "max_cache_length": [C],
                "prompt_compression_strategy": [
                    "heavy_hitter" if inner == "heavy_hitter" else "recent_global"
                ],
                "global_tokens": 2,
                "recent_window": 4,
            },
            max_seq_length=96,
        )
        return T.init_caches(cfg, specs, 1, jnp.float32)

    def test_attention_loss_recorded(self, tiny_model):
        cfg, params, rope = tiny_model
        caches = self.setup_debug(cfg)
        prompt = list(range(1, 41))
        _, info, caches = generate(cfg, params, rope, caches, prompt, 16)
        st = LV(caches, 0)
        ctr = int(st.extra["attention_loss_ctr"])
        assert ctr == 15  # decode-loop steps (first token comes from prefill)
        losses = np.asarray(st.extra["attention_losses"][:ctr])
        assert np.all(losses >= -1e-5) and np.all(losses <= 1.0)
        # Shadow saturated at its budget while the outer kept everything.
        assert int(st.extra["shadow"].cache_ct[0, 0]) == 24
        # Prompt + 15 decode-loop insertions (the final generated token is
        # never fed back into the cache, same as the reference loop).
        assert int(st.cache_ct[0, 0]) == 40 + 15

    def test_full_budget_shadow_has_no_loss(self, tiny_model):
        """A shadow with budget >= sequence keeps everything: loss ~ 0."""
        cfg, params, rope = tiny_model
        caches = self.setup_debug(cfg, inner="recent_global", C=96)
        prompt = list(range(1, 21))
        _, _, caches = generate(cfg, params, rope, caches, prompt, 8)
        st = LV(caches, 0)
        ctr = int(st.extra["attention_loss_ctr"])
        losses = np.asarray(st.extra["attention_losses"][:ctr])
        np.testing.assert_allclose(losses, 0.0, atol=1e-3)

    def test_debug_registry_resolution(self):
        cls = get_cache_strategy("debug_l2")
        assert cls.name == "debug_l2"
        assert cls.inner_strategy.name == "l2"
        with pytest.raises(ValueError):
            get_cache_strategy("debug_bogus")


class TestProfilePassParity:
    """The fused one-pass profiling must match a dense reference exactly.

    The dense reference materializes the full [B, KVH, P, P] probability
    matrix and computes each strategy's recovered mass with explicit
    per-query window masks — the direct transcription of the math the
    reference's mask stack implements (reference: cache.py:1066-1168)."""

    def _dense_reference(self, spec, q, k, valid, prompt_len, special, punc):
        from cold_compress_tpu.caches.hybrid import (
            NEG_INF,
            _strategy_base_cols,
        )
        import math as pymath

        B, H, P, D = q.shape
        KVH = k.shape[1]
        G = H // KVH
        menu = spec.hybrid_strategies
        input_pos = jnp.arange(P, dtype=jnp.int32)
        scale = 1.0 / pymath.sqrt(D)

        qg = q.reshape(B, KVH, G, P, D).astype(jnp.bfloat16)
        scores = (
            jnp.einsum(
                "bkgld,bksd->bkgls", qg, k.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        causal = input_pos[None, :] <= input_pos[:, None]
        scores = jnp.where(causal[None, None, None], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1).mean(axis=2)  # [B,KVH,P,P]

        plen = jnp.broadcast_to(
            jnp.atleast_1d(jnp.asarray(prompt_len, jnp.int32)), (B,)
        )
        q_valid = (input_pos[None, :] < plen[:, None]).astype(jnp.float32)
        colsum = jnp.einsum("bkqs,bq->bks", probs, q_valid)
        denom = jnp.maximum(plen[:, None] - input_pos[None, :], 1).astype(
            jnp.float32
        )
        cum_attn = colsum / denom[:, None, :]

        sums = []
        for s in menu:
            base = _strategy_base_cols(
                spec, s, cum_attn, special, punc, input_pos, valid,
                prompt_len, P,
            )  # [B,KVH,P]
            m = jnp.broadcast_to(base[:, :, None, :], probs.shape)
            if "window" in s.strategy:
                w = max(1, int(s.recent_window * P))
                in_window = jnp.logical_and(
                    input_pos[None, :] >= input_pos[:, None] + 1 - w,
                    input_pos[None, :] <= input_pos[:, None],
                )  # [q, s]
                m = jnp.logical_or(m, in_window[None, None])
            per_q = jnp.sum(jnp.where(m, probs, 0.0), axis=-1)  # [B,KVH,P]
            sums.append(jnp.einsum("bkq,bq->bk", per_q, q_valid))
        n_q = jnp.maximum(plen, 1).astype(jnp.float32)
        return cum_attn, jnp.stack(sums) / n_q[None, :, None]

    @pytest.mark.parametrize("prompt_len,P", [(96, 96), (70, 96), (40, 96)])
    def test_one_pass_matches_dense(self, prompt_len, P):
        from cold_compress_tpu.caches.hybrid import _profile_pass

        B, KVH, G, D = 2, 2, 2, 16
        H = KVH * G
        menu = normalize_hybrid_strategies(
            [
                {"strategy": "special"},
                {"strategy": "special_punc"},
                {"strategy": "window", "recent_window": 0.1},
                # A second, distinct window length exercises the
                # multi-accumulator (uniq_w) path.
                {
                    "strategy": "window_heavy_hitter",
                    "recent_window": 0.3,
                    "heavy_hitter_frac": 0.25,
                },
                {
                    "strategy": "special_punc_heavy_hitter",
                    "heavy_hitter_frac": 0.3,
                },
                {"strategy": "full"},
            ]
        )
        spec = CacheSpec(
            cache_strategy="hybrid",
            max_cache_length=P,
            max_seq_length=P,
            global_tokens=3,
            hybrid_strategies=menu,
        )
        key = jax.random.PRNGKey(7)
        kq, kk, ks, kp = jax.random.split(key, 4)
        q = jax.random.normal(kq, (B, H, P, D), jnp.float32)
        k = jax.random.normal(kk, (B, KVH, P, D), jnp.float32)
        valid = jnp.arange(P)[None, :] < jnp.asarray(
            [prompt_len, max(prompt_len - 9, 1)]
        )[:, None]
        special = jax.random.bernoulli(ks, 0.05, (B, P)) & valid
        punc = jax.random.bernoulli(kp, 0.15, (B, P)) & valid
        plens = jnp.asarray([prompt_len, max(prompt_len - 9, 1)], jnp.int32)

        # Chunk smaller than P so the scan actually streams (and pads:
        # 96 is not a multiple of 40).
        got_cum, got_scores = _profile_pass(
            spec, q, k, valid, plens, special, punc, chunk_size=40
        )
        want_cum, want_scores = self._dense_reference(
            spec, q, k, valid, plens, special, punc
        )
        np.testing.assert_allclose(
            np.asarray(got_cum), np.asarray(want_cum), rtol=2e-4, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(got_scores), np.asarray(want_scores),
            rtol=2e-4, atol=2e-5,
        )


def test_dummy_slot_drop_quantized_byte_identity():
    """skip=drop in store_kv_rows must preserve PACKED bytes and scale
    sidecars exactly for dropping heads on a quantized cache (the r4
    rewrite replaced the full-cache revert select with a per-row
    write-back; this pins the quantized path it must not disturb)."""
    C, KVH, D = 8, 2, 4
    menu = [{"strategy": "special_punc"}, {"strategy": "full"}]
    spec = CacheSpec(
        cache_strategy="hybrid",
        max_cache_length=C,
        max_seq_length=64,
        global_tokens=2,
        cache_bits=8,
        hybrid_strategies=normalize_hybrid_strategies(menu),
        token_ids_special=((9,),),
        token_ids_punc=(46,),
    )
    state = HybridCache.init(spec, 1, KVH, D, jnp.float32)
    rng = np.random.RandomState(0)
    extra = dict(state.extra)
    extra["strategy_idx"] = jnp.asarray([[0, 1]], jnp.int32)
    extra["punc_mask"] = (
        jnp.zeros((1, KVH, C), bool).at[0, 0, 2:4].set(True)
    )
    extra["num_punc"] = jnp.asarray([2], jnp.int32)
    state = state.replace(
        k=jnp.asarray(rng.randint(0, 256, state.k.shape), state.k.dtype),
        v=jnp.asarray(rng.randint(0, 256, state.v.shape), state.v.dtype),
        k_scales=jnp.asarray(rng.rand(1, KVH, C), jnp.float32),
        k_zeros=jnp.asarray(rng.rand(1, KVH, C), jnp.float32),
        v_scales=jnp.asarray(rng.rand(1, KVH, C), jnp.float32),
        v_zeros=jnp.asarray(rng.rand(1, KVH, C), jnp.float32),
        pos=jnp.broadcast_to(jnp.arange(C)[None, None], (1, KVH, C)),
        mask=jnp.ones((1, KVH, C), bool),
        cache_ct=jnp.full((1, KVH), C, jnp.int32),
        extra=extra,
    )
    before = {
        f: np.asarray(getattr(state, f)).copy()
        for f in ("k", "v", "k_scales", "k_zeros", "v_scales", "v_zeros",
                  "pos", "mask")
    }
    new_row = jnp.full((1, KVH, 1, D), 0.37, jnp.float32)
    state2, *_ = HybridCache.decode_update(
        state, jnp.int32(C), new_row, new_row,
        token=jnp.asarray([5], jnp.int32),
    )
    # Punc head (0): every buffer byte-identical.
    for f, want in before.items():
        np.testing.assert_array_equal(
            np.asarray(getattr(state2, f))[0, 0], want[0, 0], err_msg=f
        )
    assert int(state2.cache_ct[0, 0]) == C
    # Full head (1): the appended row dequantizes back to ~0.37.
    from cold_compress_tpu.caches.base import materialize_kv

    kf, _ = materialize_kv(state2, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(kf)[0, 1, C - 1], 0.37, atol=0.01
    )


def test_flash_profile_matches_xla_profile():
    """Fused flash profiling kernel (interpret) == the streaming XLA
    profile pass: attention output, cum, and per-window accumulators."""
    from cold_compress_tpu.caches.hybrid import (
        _profile_partial,
        _profile_windows,
    )
    from cold_compress_tpu.ops.attention import prefill_attention
    from cold_compress_tpu.ops.pallas_prefill import flash_profile

    B, KVH, G, P, D = 1, 2, 2, 512, 128
    H = KVH * G
    rng = np.random.RandomState(11)
    q = jnp.asarray(rng.randn(B, H, P, D).astype(np.float32) / 8)
    k = jnp.asarray(rng.randn(B, KVH, P, D).astype(np.float32) / 8)
    v = jnp.asarray(rng.randn(B, KVH, P, D).astype(np.float32) / 8)
    plen = jnp.int32(P - 37)
    valid = (jnp.arange(P) < plen)[None]
    spec = CacheSpec(
        max_cache_length=P,
        hybrid_strategies=normalize_hybrid_strategies(
            [{"strategy": "window", "recent_window": 0.1},
             {"strategy": "window_heavy_hitter", "recent_window": 0.25,
              "heavy_hitter_frac": 0.25},
             {"strategy": "full"}]
        ),
    )
    _, uniq_w = _profile_windows(spec, P)
    assert len(uniq_w) == 2
    y1, cum1, w1 = flash_profile(
        q, k, v, plen, window_lens=tuple(uniq_w), interpret=True
    )
    cum0, w0 = _profile_partial(spec, q, k, plen)
    y0, _ = prefill_attention(q, k, v, valid, plen)
    scale = np.abs(np.asarray(cum0)).max() + 1e-9
    assert np.abs(np.asarray(cum1) - np.asarray(cum0)).max() / scale < 5e-3
    assert np.abs(np.asarray(w1) - np.asarray(w0)).max() / scale < 5e-3
    yd = np.abs(np.asarray(y1, np.float32) - np.asarray(y0, np.float32))
    # bf16 kernel vs the (f32-capable) XLA path on valid rows only.
    assert yd[:, :, : int(plen)].max() < 0.03


def test_hybrid_generation_flash_vs_xla_profile(tiny_model, monkeypatch):
    """End-to-end hybrid generation through the fused flash-profile path
    (interpret) must pick the same policies and emit the same tokens as
    the XLA profile pass."""
    cfg, params, rope = tiny_model
    specs, _ = hybrid_setup(cfg)
    prompt = [256] + list(range(1, 40)) + [46, 7, 257, 9]

    def run():
        _, caches = hybrid_setup(cfg)
        seq, _, caches = generate(cfg, params, rope, caches, prompt, 8)
        return seq, np.asarray(LV(caches, 0).extra["strategy_idx"]).tolist()

    seq_xla, pol_xla = run()
    monkeypatch.setenv("CCT_PALLAS_INTERPRET", "1")
    seq_flash, pol_flash = run()
    assert pol_flash == pol_xla
    assert seq_flash == seq_xla
