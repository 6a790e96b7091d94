"""Probe: where do the non-layer-weight milliseconds of a decode step go?

bench.py measures ~13.2 ms/token; scripts/perf_probe3.py attributes ~9.1 ms
to the 32 layers' weight streams. This times the remaining suspects in
isolation, each as an in-program lax.scan with a carried data dependency
(separate same-program calls coalesce over the tunnel; only a host transfer
is an honest completion barrier — see perf_probe3.py):

  a) lm_head: [1, 4096] @ int8 [4096, 128256] via ops/linear (W8A8 path)
  b) heavy_hitter decode_update on a C=2048 cache (x32 layers)
  c) bf16-cache chunked decode attention (x32 layers)

Run on TPU: python scripts/perf_probe4.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

REPEATS = 64
NL = 32
D, KVH, HD, C, VOCAB = 4096, 8, 128, 2048, 128256
INTERPRET = False  # set True for CPU smoke-tests


def timed(name, fn, *args, reps=REPEATS):
    np.asarray(jax.jit(fn)(*args))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(jax.jit(fn)(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt * 1e3:.3f} ms/token")
    return dt


def probe_lm_head():
    from cold_compress_tpu.ops.linear import QuantizedWeight, linear

    rng = np.random.default_rng(0)
    w = QuantizedWeight(
        w=jnp.asarray(rng.integers(-127, 127, (D, VOCAB), np.int64), jnp.int8),
        scales=jnp.full((VOCAB,), 0.01, jnp.float32),
        kind="int8",
    )

    def run(w_, x0):
        def body(x, _):
            y = linear(x, w_)
            # Feed a reduced view forward so nothing is dead code.
            return x + y[:, :1].astype(x.dtype) * 1e-9, ()

        x, _ = jax.lax.scan(body, x0, None, length=REPEATS)
        return x

    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, D), jnp.bfloat16)
    timed("a_lm_head_w8a8", run, w, x0)


def probe_cache_update():
    from cold_compress_tpu.caches import CacheSpec, decode_update
    from cold_compress_tpu.caches import get_cache_strategy
    from cold_compress_tpu.caches.base import init_state

    spec = CacheSpec(
        cache_strategy="heavy_hitter",
        max_cache_length=C,
        max_seq_length=8192,
        global_tokens=4,
        recent_window=10,
    )
    strategy = get_cache_strategy("heavy_hitter")
    state = init_state(
        spec, 1, KVH, HD, dtype=jnp.bfloat16,
        extra=strategy.init_extra(spec, 1, KVH, HD),
    )
    state = state.replace(
        mask=jnp.ones_like(state.mask),
        pos=jnp.broadcast_to(jnp.arange(C, dtype=state.pos.dtype), state.pos.shape),
        cache_ct=jnp.full_like(state.cache_ct, C),
    )
    state = jax.tree.map(lambda x: jnp.stack([x] * NL), state)

    def run(st, kv0):
        def body(carry, i):
            st_i = jax.tree.map(lambda x: x[i % NL], st)
            kv = carry
            st2, *_ = decode_update(
                strategy, st_i, jnp.array([4000], jnp.int32), kv, kv + 1
            )
            return kv + st2.k[0, 0, :1, :1] * 1e-9, ()

        out, _ = jax.lax.scan(body, kv0, jnp.arange(REPEATS * NL))
        return out

    kv0 = jax.random.normal(jax.random.PRNGKey(2), (1, KVH, 1, HD), jnp.bfloat16)
    timed("b_heavy_hitter_update_x32", run, state, kv0)


def probe_attention():
    from cold_compress_tpu.ops.pallas_decode_attn import (
        quantized_decode_attention,
    )

    rng = np.random.default_rng(3)
    k = jnp.asarray(rng.standard_normal((1, KVH, C, HD)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, KVH, C, HD)), jnp.bfloat16)
    mask = jnp.ones((1, KVH, C), bool)

    def run(k_, v_, q0):
        def body(q, _):
            out, attn = quantized_decode_attention(
                q, k_, v_, None, None, None, None, mask,
                bits=16, need_attn=True, interpret=INTERPRET,
            )
            upd = out * 1e-9 + attn.sum() * 1e-12
            return (q + upd.astype(q.dtype)), ()

        q, _ = jax.lax.scan(body, q0, None, length=REPEATS * NL)
        return q

    q0 = jnp.asarray(rng.standard_normal((1, 32, 1, HD)) / 8, jnp.bfloat16)
    timed("c_decode_attention_x32", run, k, v, q0, reps=REPEATS)


if __name__ == "__main__":
    probe_lm_head()
    probe_cache_update()
    probe_attention()
