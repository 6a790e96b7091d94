"""Fused flash+summary prefill kernel vs the exact chunked XLA path
(interpret mode on CPU — same kernel code Mosaic compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cold_compress_tpu.ops.attention import prefill_attention
from cold_compress_tpu.ops.pallas_prefill import flash_prefill

B, KVH, G, D = 2, 2, 2, 128
H = KVH * G
P = 512


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, P, D).astype(np.float32) / 8).astype(
        jnp.bfloat16
    )
    k = jnp.asarray(rng.randn(B, KVH, P, D).astype(np.float32) / 8).astype(
        jnp.bfloat16
    )
    v = jnp.asarray(rng.randn(B, KVH, P, D).astype(np.float32) / 8).astype(
        jnp.bfloat16
    )
    return q, k, v


@pytest.mark.parametrize("plen", [P, 300, [300, 477]])
def test_matches_chunked_reference(qkv, plen):
    q, k, v = qkv
    plen_arr = jnp.asarray(plen, jnp.int32)
    valid = (
        jnp.arange(P)[None, :]
        < jnp.atleast_1d(plen_arr)[:, None]
    )
    valid = jnp.broadcast_to(valid, (B, P))
    y_ref, s_ref = prefill_attention(
        q, k, v, valid, plen_arr, need_summary=True
    )
    y, s = flash_prefill(
        q, k, v, plen_arr, need_summary=True, block_q=128, block_k=128,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )
    for key in ("cum_mean", "obs_mean"):
        np.testing.assert_allclose(
            np.asarray(s[key]), np.asarray(s_ref[key]), atol=2e-3, rtol=2e-2
        )


def test_no_summary_path(qkv):
    q, k, v = qkv
    y_ref, _ = prefill_attention(
        q, k, v, jnp.ones((B, P), bool), jnp.int32(P), need_summary=False
    )
    y, s = flash_prefill(
        q, k, v, jnp.int32(P), need_summary=False, block_q=128,
        block_k=128, interpret=True,
    )
    assert s is None
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_summary_sums_to_attention_mass(qkv):
    """cum_mean * queries-that-see-key summed over keys == #valid queries
    (each query row's probabilities sum to 1)."""
    q, k, v = qkv
    plen = 400
    _, s = flash_prefill(
        q, k, v, jnp.int32(plen), need_summary=True, block_q=128,
        block_k=128, interpret=True,
    )
    pos = np.arange(P)
    denom = np.maximum(plen - pos, 1)
    total = (np.asarray(s["cum_mean"]) * denom[None, None, :]).sum(-1)
    np.testing.assert_allclose(total, plen, rtol=1e-3)
