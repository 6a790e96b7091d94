"""Pipeline-parallel (PP) prefill over a device mesh.

Layer stages shard over a 'pp' mesh axis; the prompt streams through the
pipeline as SEQUENCE CHUNKS (microbatches). Causality makes this exact
with zero redundant compute: chunks arrive in order, so when stage s runs
layer l on chunk c it attends against the K/V rows of chunks 0..c that
the same stage produced on earlier ticks (kept in a per-layer K/V buffer;
future positions are excluded by the causal mask, so the buffer can be
full-length and zero-initialized).

Schedule: GPipe over ticks t = 0 .. NC + S - 2; stage s is active for
chunks t - s in [0, NC). Activation chunks hop stages via
``lax.ppermute`` each tick. Per-key attention-summary partials (raw
cum/obs sums, ops/attention.py::chunked_prefill_partial) accumulate
across ticks; after the last tick every stage finalizes and runs the
standard compression + cache fill for ITS layers only. The stacked cache
state is emitted with a P('pp') layer-axis out-spec, so shard_map
reassembles the full per-layer cache pytree — ready for any decode path.

The reference has no pipeline parallelism (SURVEY §2.8); batch-1 decode
gains nothing from PP (bubble-bound), but prefill pipelining is the
TPU-native way to spread LAYER weights across chips while keeping each
chip's attention local — complementary to sp (activation sharding) and
tp (head sharding).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..caches import get_cache_strategy, get_prompt_compressor
from ..models import transformer as T
from ..models.config import ModelConfig
from ..ops.attention import chunked_prefill_partial, finalize_summary


def make_pp_mesh(pp: int, devices=None) -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= pp
    return Mesh(np.asarray(devices[:pp]), axis_names=("pp",))


@partial(jax.jit, static_argnames=("cfg", "mesh", "chunk", "obs_len"))
def pp_prefill(
    cfg: ModelConfig,
    params,
    rope: jax.Array,
    caches,  # STACKED CacheState (homogeneous specs; [NL, ...] leaves)
    tokens: jax.Array,  # [B, P]
    prompt_len: jax.Array,
    mesh: Mesh,
    chunk: int = 64,
    obs_len: int = 16,
) -> Tuple[jax.Array, object]:
    """Pipeline-parallel prefill. Returns (last-position logits [B, vocab]
    f32, stacked caches — layer axis resharded across the pp stages)."""
    B, Pfull = tokens.shape
    S = mesh.shape["pp"]
    NL = cfg.n_layer
    assert NL % S == 0, f"n_layer {NL} % pp {S} != 0"
    assert Pfull % chunk == 0, f"bucket {Pfull} % chunk {chunk} != 0"
    Lloc = NL // S
    NC = Pfull // chunk
    assert T.is_stacked(caches), "pp_prefill wants the stacked cache layout"
    layers = T.stack_layer_params(params)["layers"]
    spec = caches.spec
    strategy = get_cache_strategy(spec.cache_strategy)
    compressor = get_prompt_compressor(spec.prompt_compression_strategy)
    assert not hasattr(strategy, "profile_prefill"), (
        "hybrid profiling needs full attention maps; use sp or single-device"
    )

    plen = jnp.asarray(prompt_len, jnp.int32)
    freqs = rope[:Pfull]
    KVH, hd = cfg.n_kv_head, cfg.head_dim

    def f(slim, layers_loc, tokens_full, freqs_full, caches_loc, plen):
        stage = jax.lax.axis_index("pp")
        input_pos = jnp.arange(Pfull, dtype=jnp.int32)
        plen_b = jnp.broadcast_to(jnp.atleast_1d(plen), (B,))
        valid = input_pos[None, :] < plen_b[:, None]
        D = cfg.dim

        # Per-local-layer K/V accumulation buffers + summary partials.
        kbuf = jnp.zeros((Lloc, B, KVH, Pfull, hd), jnp.float32)
        vbuf = jnp.zeros_like(kbuf)
        cum = jnp.zeros((Lloc, B, KVH, Pfull), jnp.float32)
        obs = jnp.zeros_like(cum)
        x_pipe = jnp.zeros((B, chunk, D), jnp.float32)
        x_embed_all = T._embed(slim, tokens_full)  # [B, P, D]

        def tick(t, carry):
            kbuf, vbuf, cum, obs, x_pipe, x_last = carry
            # Stage s works on chunk c = t - s this tick.
            c = t - stage
            active = jnp.logical_and(c >= 0, c < NC)
            c_clamped = jnp.clip(c, 0, NC - 1)
            off = c_clamped * chunk

            # Stage 0 sources chunk t from the embeddings; others take the
            # activation chunk that arrived from the previous stage.
            x_src = jax.lax.dynamic_slice_in_dim(
                x_embed_all, jnp.clip(t, 0, NC - 1) * chunk, chunk, axis=1
            )
            x = jnp.where(stage == 0, x_src, x_pipe)

            freqs_c = jax.lax.dynamic_slice_in_dim(
                freqs_full, off, chunk, axis=0
            )

            def layer_body(carry_l, li):
                x, kbuf, vbuf, cum, obs = carry_l
                lp = T._layer_view(layers_loc, li)
                xr = T.rms_norm(x, lp["attention_norm"], cfg.norm_eps)
                q, k, v = T._qkv(cfg, lp["attn"], xr, freqs_c)
                # Append this chunk's K/V at its global offset (masked out
                # again on inactive ticks below).
                kb = jax.lax.dynamic_update_slice(
                    kbuf[li], k.astype(jnp.float32), (0, 0, off, 0)
                )
                vb = jax.lax.dynamic_update_slice(
                    vbuf[li], v.astype(jnp.float32), (0, 0, off, 0)
                )
                y, cum_p, obs_p = chunked_prefill_partial(
                    q, kb.astype(k.dtype), vb.astype(v.dtype), plen,
                    q_offset=off, need_summary=True, obs_len=obs_len,
                    chunk_size=chunk,
                )
                gate = active.astype(jnp.float32)
                kbuf = kbuf.at[li].set(jnp.where(active, kb, kbuf[li]))
                vbuf = vbuf.at[li].set(jnp.where(active, vb, vbuf[li]))
                cum = cum.at[li].add(gate * cum_p)
                obs = obs.at[li].add(gate * obs_p)
                y = y.transpose(0, 2, 1, 3).reshape(
                    B, chunk, cfg.n_head * hd
                )
                attn_out = T.linear(y, lp["attn"]["wo"])
                x = T._block(cfg, lp, x, attn_out)
                return (x, kbuf, vbuf, cum, obs), None

            (x_out, kbuf, vbuf, cum, obs), _ = jax.lax.scan(
                layer_body,
                (x, kbuf, vbuf, cum, obs),
                jnp.arange(Lloc),
            )

            # Track the final hidden chunk leaving the LAST stage when it
            # contains position plen-1.
            pos_c = off + jnp.arange(chunk)
            sel = jnp.logical_and(
                pos_c[None, :] == (plen_b - 1)[:, None],
                jnp.logical_and(active, stage == S - 1),
            ).astype(x_out.dtype)
            x_last = x_last + jnp.einsum("bl,bld->bd", sel, x_out)

            # Hop activations to the next stage (ring; last->first is junk
            # that stage 0 never reads).
            x_send = jnp.where(active, x_out, x_pipe)
            x_next = jax.lax.ppermute(
                x_send, "pp", [(i, (i + 1) % S) for i in range(S)]
            )
            return kbuf, vbuf, cum, obs, x_next, x_last

        x_last0 = jnp.zeros((B, cfg.dim), jnp.float32)
        kbuf, vbuf, cum, obs, _, x_last = jax.lax.fori_loop(
            0, NC + S - 1, tick,
            (kbuf, vbuf, cum, obs, x_pipe, x_last0),
        )

        # Finalize summaries and fill this stage's caches (standard
        # compression + fill, layer-local).
        def fill_body(cache, inp):
            kb, vb, cum_l, obs_l = inp
            summary = finalize_summary(cum_l, obs_l, plen_b, Pfull, obs_len)
            return T.fill_from_kv(
                strategy, compressor, cache, kb, vb, summary,
                input_pos, valid, plen,
            )

        new_caches = jax.lax.scan(
            lambda _, inp: (None, fill_body(inp[0], inp[1:])),
            None,
            (caches_loc, kbuf, vbuf, cum, obs),
        )[1]

        # Last hidden state lives on the last stage only; psum broadcasts.
        x_last = jax.lax.psum(x_last, "pp")
        xn = T.rms_norm(x_last[:, None], slim["norm"], cfg.norm_eps)
        out_w = slim["output"]
        if out_w is None:
            logits = jnp.einsum(
                "bld,vd->blv", xn, slim["tok_embeddings"]
            ).astype(jnp.float32)[:, 0]
        else:
            logits = jnp.einsum("bld,dv->blv", xn, out_w).astype(
                jnp.float32
            )[:, 0]
        return logits, new_caches

    slim = {
        "tok_embeddings": params["tok_embeddings"],
        "norm": params["norm"],
        "output": params["output"],
    }
    rep = lambda tree: jax.tree.map(lambda _: P(), tree)  # noqa: E731
    layer_specs = jax.tree.map(lambda _: P("pp"), layers)
    cache_specs = jax.tree.map(
        lambda x: P("pp", *([None] * (x.ndim - 1))), caches
    )
    logits, new_caches = shard_map(
        f,
        mesh=mesh,
        in_specs=(rep(slim), layer_specs, P(), P(), cache_specs, P()),
        out_specs=(P(), cache_specs),
        check_vma=False,
    )(slim, layers, tokens, freqs, caches, plen)
    return logits, new_caches
