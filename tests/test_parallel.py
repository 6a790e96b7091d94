"""Tensor-parallel sharding tests on the 8-device virtual CPU mesh:
sharded execution must be numerically identical to single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cold_compress_tpu.caches import CacheSpec
from cold_compress_tpu.models import transformer as T
from cold_compress_tpu.models.config import ModelConfig
from cold_compress_tpu.parallel.mesh import (
    cache_pspecs,
    make_mesh,
    param_pspecs,
    shard_caches,
    shard_params,
    validate_tp,
)


@pytest.fixture(scope="module")
def tp_setup():
    cfg = ModelConfig.from_name("TestTiny").replace(
        n_head=8, n_kv_head=4, dim=128, intermediate_size=256
    )
    params = T.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rope = T.make_rope_table(cfg)
    return cfg, params, rope


def make_caches(cfg, strategy="recent_global", C=32, B=1):
    specs = tuple(
        CacheSpec(
            cache_strategy=strategy,
            max_cache_length=C,
            max_seq_length=64,
            global_tokens=2,
            recent_window=4,
            prompt_compression_strategy="recent_global",
        )
        for _ in range(cfg.n_layer)
    )
    return T.init_caches(cfg, specs, B, jnp.float32)


def run_generation(cfg, params, rope, caches, prompt, steps, pos0):
    logits, caches = T.prefill(
        cfg, params, rope, caches, prompt, prompt.shape[1]
    )
    toks = [jnp.argmax(logits, -1).astype(jnp.int32)]
    for i in range(steps):
        logits, caches = T.decode_step(
            cfg, params, rope, caches, toks[-1], jnp.int32(pos0 + i)
        )
        toks.append(jnp.argmax(logits, -1).astype(jnp.int32))
    return np.asarray(logits), [np.asarray(t) for t in toks], caches


def test_tp_sharded_matches_single_device(tp_setup):
    """tp=4, dp=2 sharded generation == unsharded (GSPMD inserts the
    all-reduces tp.py wires manually — reference tp.py:134-160)."""
    cfg, params, rope = tp_setup
    assert len(jax.devices()) >= 8
    validate_tp(cfg, 4)
    mesh = make_mesh(tp=4, dp=2)

    B = 2
    prompt = jnp.tile(jnp.arange(1, 13, dtype=jnp.int32)[None], (B, 1))

    caches = make_caches(cfg, B=B)
    ref_logits, ref_toks, _ = run_generation(
        cfg, params, rope, caches, prompt, 6, 12
    )

    sp = shard_params(params, mesh, cfg)
    sc = shard_caches([c for c in _as_list(make_caches(cfg, B=B))], mesh)
    sc = sc if not isinstance(sc, tuple) or len(sc) > 1 else sc
    with mesh:
        got_logits, got_toks, got_caches = run_generation(
            cfg, sp, rope, _restack(sc), prompt, 6, 12
        )

    np.testing.assert_allclose(ref_logits, got_logits, rtol=2e-4, atol=2e-4)
    for a, b in zip(ref_toks, got_toks):
        np.testing.assert_array_equal(a, b)


def _as_list(caches):
    from cold_compress_tpu.runtime.stats import unstack_caches

    return unstack_caches(caches)


def _restack(cache_list):
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs), *cache_list)


def test_param_pspecs_cover_tree(tp_setup):
    cfg, params, _ = tp_setup
    specs = param_pspecs(cfg, params)
    # Column-sharded projections put 'tp' on the output dim; row-sharded on
    # the input dim (the tp.py scheme).
    from jax.sharding import PartitionSpec as P

    assert specs["layers"][0]["attn"]["wq"] == P(None, "tp")
    assert specs["layers"][0]["attn"]["wo"] == P("tp", None)
    assert specs["layers"][0]["ffn"]["w1"] == P(None, "tp")
    assert specs["layers"][0]["ffn"]["w2"] == P("tp", None)
    assert specs["norm"] == P()


def test_cache_pspecs_shard_kv_heads(tp_setup):
    cfg, params, rope = tp_setup
    cache = _as_list(make_caches(cfg))[0]
    specs = cache_pspecs(cache)
    from jax.sharding import PartitionSpec as P

    assert specs.k == P("dp", "tp", None, None)
    assert specs.pos == P("dp", "tp", None)
    assert specs.cache_ct == P("dp", "tp")


def test_validate_tp_rejects_bad_degree(tp_setup):
    cfg, _, _ = tp_setup
    with pytest.raises(AssertionError):
        validate_tp(cfg, 3)


def test_quantized_params_shard(tp_setup):
    """Quantized leaves shard consistently with their payload layout."""
    from cold_compress_tpu.quantization.weight_quant import quantize_params

    cfg, params, rope = tp_setup
    qparams = quantize_params(params, mode="int4", group_size=32)
    mesh = make_mesh(tp=4, dp=2)
    sp = shard_params(qparams, mesh, cfg)
    wq = sp["layers"][0]["attn"]["wq"]
    # int4 packed weight [in//2, out]: sharded on out.
    assert wq.w.sharding.spec == jax.sharding.PartitionSpec(None, "tp")
    assert wq.scales.sharding.spec == jax.sharding.PartitionSpec(None, "tp")

    caches = make_caches(cfg, B=2)
    prompt = jnp.tile(jnp.arange(1, 9, dtype=jnp.int32)[None], (2, 1))
    with mesh:
        sc = _restack(shard_caches(_as_list(caches), mesh))
        logits, _ = T.prefill(cfg, sp, rope, sc, prompt, 8)
    assert np.isfinite(np.asarray(logits)).all()
