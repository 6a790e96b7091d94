"""Generation runtime: compiled prefill + on-device decode loop.

TPU-native counterpart of the reference generation loop
(reference: generation_utils.py:145-217,399-531). The key design change: the
reference runs a Python loop dispatching one compiled decode step per token;
here the whole decode loop is a single jitted ``lax.while_loop`` computation —
zero host round-trips per token, cache buffers donated so XLA updates them in
place in HBM. Teacher forcing (perplexity tasks), terminator early-exit,
long-prompt feeding, and per-step probability capture all live inside the
loop.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import transformer as T
from ..models.config import ModelConfig


def greedy(logits: jax.Array) -> jax.Array:
    """Greedy next-token choice (reference: generation_utils.py:136-142)."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def logits_to_probs(
    logits: jax.Array, temperature: float = 1.0, top_k: Optional[int] = None
) -> jax.Array:
    """Temperature/top-k shaping (reference: generation_utils.py:125-133)."""
    logits = logits / max(temperature, 1e-5)
    if top_k is not None:
        k = min(top_k, logits.shape[-1])
        pivot = jax.lax.top_k(logits, k)[0][..., -1:]
        logits = jnp.where(logits < pivot, -jnp.inf, logits)
    return jax.nn.softmax(logits, axis=-1)


def sample(
    key: jax.Array,
    logits: jax.Array,
    temperature: float = 0.0,
    top_k: Optional[int] = None,
) -> jax.Array:
    """Greedy when temperature == 0, else categorical over shaped probs."""
    if temperature == 0.0:
        return greedy(logits)
    probs = logits_to_probs(logits, temperature, top_k)
    return jax.random.categorical(key, jnp.log(probs + 1e-20), axis=-1).astype(
        jnp.int32
    )


# --------------------------------------------------------------------------
# Jitted computations
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("caches",))
def _prefill_jit(cfg, params, rope, caches, tokens, prompt_len):
    logits, caches = T.prefill(cfg, params, rope, caches, tokens, prompt_len)
    # Fold the greedy pick + probabilities into the compiled program: on some
    # backends (the axon tunnel) tiny eager follow-up ops are fragile, and
    # they cost a dispatch each regardless.
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), probs, caches


@jax.jit
def _logits_post_jit(logits):
    """Greedy pick + probabilities from prefill logits (sp path — the
    single-device path folds this into _prefill_jit)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), probs


@partial(jax.jit, donate_argnames=("caches",))
def _reset_jit(caches):
    from ..caches import reset_state

    return reset_state(caches)


def decode_loop_core(
    cfg: ModelConfig,
    step_fn,
    caches,
    first_token: jax.Array,  # [B]
    start_pos: jax.Array,  # scalar int32
    prefix: jax.Array,  # [max_steps] int32, -1 where not teacher-forced
    terminators: jax.Array,  # [T] int32, padded with -1
    max_steps: int,
    all_done=jnp.all,
):
    """Device-side decode loop shared by the single-device jit and the
    shard_map tensor-parallel path (parallel/tp_decode.py).

    ``step_fn(caches, token, pos) -> (logits, caches)`` supplies the model
    step; everything else (teacher forcing, terminators, prob recording) is
    identical across run modes. ``all_done(done_bool_vec) -> scalar bool``
    decides loop exit — the dp-sharded path passes a reducer that gathers
    the lane mask over the batch axis (a collective, so it runs in the loop
    BODY and rides the carry into ``cond``).

    Returns (tokens [max_steps+1, B] — slot 0 is ``first_token``; emitted
    probs [max_steps, B] — probability assigned to each emitted/forced token;
    n_steps generated; final-step probability vector [B, vocab]; caches).
    """
    B = first_token.shape[0]
    V = cfg.vocab_size
    tokens_buf = jnp.full((max_steps + 1, B), -1, jnp.int32)
    tokens_buf = tokens_buf.at[0].set(first_token)
    probs_buf = jnp.zeros((max_steps, B), jnp.float32)
    last_probs = jnp.zeros((B, V), jnp.float32)

    def cond(carry):
        i, stop = carry[0], carry[1]
        return jnp.logical_and(i < max_steps, jnp.logical_not(stop))

    def body(carry):
        i, stop, done, cur_tok, caches, tokens_buf, probs_buf, last_probs = (
            carry
        )
        logits, caches = step_fn(caches, cur_tok, start_pos + i)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        forced = prefix[i]
        teacher = forced >= 0
        next_tok = jnp.where(teacher, forced, greedy(logits))
        p_emit = probs[jnp.arange(B), next_tok]
        is_term = jnp.logical_and(
            jnp.any(next_tok[:, None] == terminators[None, :], axis=-1),
            jnp.logical_not(teacher),
        )
        # Record unless this lane already finished.
        rec_tok = jnp.where(done, -1, next_tok)
        tokens_buf = tokens_buf.at[i + 1].set(rec_tok)
        probs_buf = probs_buf.at[i].set(jnp.where(done, 0.0, p_emit))
        last_probs = jnp.where(done[:, None], last_probs, probs)
        done = jnp.logical_or(done, is_term)
        return (
            i + 1, all_done(done), done, next_tok, caches, tokens_buf,
            probs_buf, last_probs,
        )

    (i, _, done, _, caches, tokens_buf, probs_buf, last_probs) = (
        jax.lax.while_loop(
            cond,
            body,
            (
                jnp.int32(0),
                jnp.asarray(False),
                jnp.zeros((B,), bool),
                first_token,
                caches,
                tokens_buf,
                probs_buf,
                last_probs,
            ),
        )
    )
    return tokens_buf, probs_buf, i, last_probs, caches


@partial(
    jax.jit,
    static_argnames=("cfg", "max_steps", "attn_top_k"),
    donate_argnames=("caches",),
)
def _decode_loop_jit(
    cfg: ModelConfig,
    params,
    rope,
    caches,
    first_token: jax.Array,
    start_pos: jax.Array,
    prefix: jax.Array,
    terminators: jax.Array,
    max_steps: int,
    attn_top_k: float = 1.0,
):
    """Single-program decode loop on the default device(s)."""

    def step_fn(caches, tok, pos):
        return T.decode_step(
            cfg, params, rope, caches, tok, pos, attn_top_k=attn_top_k
        )

    return decode_loop_core(
        cfg, step_fn, caches, first_token, start_pos, prefix, terminators,
        max_steps,
    )


# --------------------------------------------------------------------------
# Host-level generate()
# --------------------------------------------------------------------------


def bucket_length(n: int, minimum: int = 16) -> int:
    """Round up to a power of two to bound prefill recompiles."""
    b = minimum
    while b < n:
        b *= 2
    return b


def generate(
    cfg: ModelConfig,
    params,
    rope,
    caches,
    prompt: Sequence[int],
    max_new_tokens: int,
    *,
    next_tokens: Optional[Sequence[int]] = None,
    terminator_ids: Optional[Sequence[int]] = None,
    feed_long_prompts: bool = False,
    decode_first_token: bool = False,
    attn_top_k: float = 1.0,
    min_cache_length: Optional[int] = None,
    pad_id: int = 0,
    prefill_bucket: Optional[int] = None,
    sp_mesh=None,
    pp_mesh=None,
    tp_ctx=None,
) -> Tuple[List[int], Dict[str, Any], Any]:
    """Generate greedily from a prompt; returns (sequence, info, caches).

    Mirrors reference generation_utils.py:399-531 including its edge cases:

    * ``next_tokens``: full teacher forcing (perplexity tasks) — every decode
      step emits the provided token and records its probability.
    * ``feed_long_prompts``: when |prompt| > min cache length - 1, prefill
      only the first ``min_cache_length - 1`` tokens and feed the remainder
      through the decode path one token at a time.
    * |prompt| == min_cache_length: decrement the prompt by one and feed the
      last token through decode so eviction state exists before overflow.
    * ``decode_first_token``: route the last prompt token through decode.

    ``info`` carries perf stats (prefill/decode tok/s, seconds), the emitted
    token probabilities, and the final-step vocab distribution (logit tasks).
    """
    from ..models.transformer import is_stacked

    prompt = list(map(int, prompt))
    prompt_length = len(prompt)
    terminator_ids = list(terminator_ids or [])

    specs = (
        [caches.spec] if is_stacked(caches) else [c.spec for c in caches]
    )
    min_cache_length = min_cache_length or min(
        s.max_cache_length for s in specs
    )
    max_prompt_len = min_cache_length - 1
    prefix: List[int] = []
    if (
        feed_long_prompts and prompt_length > max_prompt_len
    ) or prompt_length == min_cache_length:
        prompt, prefix = prompt[:max_prompt_len], prompt[max_prompt_len:]
        max_new_tokens += len(prefix)
        prompt_length = len(prompt)
    if decode_first_token:
        prompt, extra = prompt[:-1], prompt[-1:]
        prefix = extra + prefix
        max_new_tokens += 1
        prompt_length = len(prompt)

    if next_tokens is not None:  # teacher forcing for PPL
        next_tokens = list(map(int, next_tokens))
        max_new_tokens = len(next_tokens)
        forced_first = next_tokens[0]
        prefix = next_tokens[1:]
    elif prefix:
        forced_first = prefix[0]
        prefix = prefix[1:]
    else:
        forced_first = None

    # ---- prefill ---------------------------------------------------------
    # Direct-fill caches (full / hybrid / debug_*) write all P padded slots,
    # so the padding bucket must not exceed their cache length.
    direct_fill = [
        s.max_cache_length
        for s in specs
        if s.cache_strategy in ("full", "hybrid")
        or s.cache_strategy.startswith("debug_")
    ]
    P = prefill_bucket or bucket_length(prompt_length)
    if direct_fill and P > min(direct_fill):
        P = min(direct_fill)
        assert P >= prompt_length, (
            f"Prompt ({prompt_length} tokens) exceeds the smallest "
            f"direct-fill cache length ({P})."
        )
    if sp_mesh is not None:
        # Sequence-parallel prefill shards query blocks over the mesh; the
        # bucket must split evenly across devices.
        sp = sp_mesh.shape["sp"]
        P = -(-P // sp) * sp
    padded = prompt + [pad_id] * (P - prompt_length)
    tokens = jnp.asarray([padded], dtype=jnp.int32)

    t0 = time.perf_counter()
    if pp_mesh is not None:
        from ..parallel.pp import pp_prefill

        logits, caches = pp_prefill(
            cfg, params, rope, caches, tokens,
            jnp.int32(prompt_length), pp_mesh,
            chunk=min(64, P),
        )
        greedy_tok, prefill_probs = _logits_post_jit(logits)
    elif sp_mesh is not None:
        if "tp" in sp_mesh.shape and sp_mesh.shape["tp"] > 1:
            # 2-D sequence x tensor parallel prefill: query blocks shard
            # over 'sp', heads/FFN columns over 'tp'. Caches come back
            # head-sharded on 'tp' — the decode loop below compiles over
            # them under GSPMD (parallel/sp.py::sp_tp_prefill).
            from ..parallel.sp import sp_tp_prefill

            logits, caches = sp_tp_prefill(
                cfg, params, rope, caches, tokens,
                jnp.int32(prompt_length), sp_mesh,
            )
        else:
            from ..parallel.sp import sp_prefill

            logits, caches = sp_prefill(
                cfg, params, rope, caches, tokens,
                jnp.int32(prompt_length), sp_mesh,
            )
        greedy_tok, prefill_probs = _logits_post_jit(logits)
    elif tp_ctx is not None:
        # shard_map tensor parallelism: per-device Pallas kernels over the
        # same local weight shards the decode loop streams
        # (parallel/tp_decode.py).
        from ..parallel.tp_decode import tp_prefill

        assert is_stacked(caches), "tp_ctx requires the stacked-layer layout"
        logits, caches = tp_prefill(
            cfg, tp_ctx.mesh, tp_ctx.slim, tp_ctx.layers, tp_ctx.head,
            rope, caches, tokens, jnp.int32(prompt_length),
        )
        greedy_tok, prefill_probs = _logits_post_jit(logits)
    else:
        greedy_tok, prefill_probs, caches = _prefill_jit(
            cfg, params, rope, caches, tokens, jnp.int32(prompt_length)
        )
    prefill_probs = np.asarray(jax.block_until_ready(prefill_probs))
    t1 = time.perf_counter()

    if forced_first is not None:
        first_token = jnp.asarray([forced_first], jnp.int32)
    else:
        first_token = greedy_tok
    first_prob = float(prefill_probs[0, int(first_token[0])])

    # ---- decode loop -----------------------------------------------------
    max_steps = max(max_new_tokens - 1, 0)
    prefix_np = np.full((max(max_steps, 1),), -1, np.int32)
    if prefix:
        prefix_np[: len(prefix[:max_steps])] = prefix[:max_steps]
    prefix_arr = jnp.asarray(prefix_np)
    term_arr = jnp.asarray(
        terminator_ids if terminator_ids else [-7], jnp.int32
    )

    if max_steps > 0:
        if tp_ctx is not None:
            from ..parallel.tp_decode import tp_decode_loop

            tokens_buf, probs_buf, n_steps, last_probs, caches = (
                tp_decode_loop(
                    cfg, tp_ctx.mesh, tp_ctx.slim, tp_ctx.layers,
                    tp_ctx.head, rope, caches, first_token,
                    jnp.int32(prompt_length), prefix_arr, term_arr,
                    max_steps, attn_top_k,
                )
            )
        else:
            tokens_buf, probs_buf, n_steps, last_probs, caches = (
                _decode_loop_jit(
                    cfg,
                    params,
                    rope,
                    caches,
                    first_token,
                    jnp.int32(prompt_length),
                    prefix_arr,
                    term_arr,
                    max_steps,
                    attn_top_k,
                )
            )
        tokens_buf = np.asarray(jax.block_until_ready(tokens_buf))
        t2 = time.perf_counter()
        gen = [int(t) for t in tokens_buf[:, 0] if int(t) != -1]
        n_steps = int(n_steps)
        probs_np = np.asarray(probs_buf)
        emitted_probs = [first_prob] + [
            float(p) for p in probs_np[:n_steps, 0]
        ]
        last_probs = np.asarray(last_probs)[0]
    else:
        t2 = t1
        gen = [int(np.asarray(first_token)[0])]
        n_steps = 0
        emitted_probs = [first_prob]
        last_probs = prefill_probs[0]

    # Trim trailing terminator like the reference (it includes the terminator
    # in ``seq``; we keep it too for parity with decode_n_tokens:208-211).
    seq = prompt + gen

    prefill_seconds = t1 - t0
    decode_seconds = max(t2 - t1, 1e-9)
    decode_tokens = n_steps + 1
    total_seconds = t2 - t0
    perf_stats = {
        "prefill_tokens": prompt_length,
        "decode_tokens": decode_tokens,
        "prefill_toks_per_sec": prompt_length / max(prefill_seconds, 1e-9),
        "decode_toks_per_sec": decode_tokens / decode_seconds,
        "total_toks_per_sec": decode_tokens / max(total_seconds, 1e-9),
        "total_seconds": total_seconds,
        "prefill_seconds": prefill_seconds,
        "decode_seconds": decode_seconds,
        "decode_seconds_frac_of_total": decode_seconds
        / max(total_seconds, 1e-9),
        "memory_used_gb": _device_memory_gb(),
    }
    info = {
        "perf_stats": perf_stats,
        "emitted_probs": emitted_probs,
        "final_probs": last_probs,
        "prompt_length": prompt_length,
        "num_generated": len(gen),
    }
    return seq, info, caches


def generate_batch(
    cfg: ModelConfig,
    params,
    rope,
    caches,
    prompts: Sequence[Sequence[int]],
    max_new_tokens: int,
    *,
    terminator_ids: Optional[Sequence[int]] = None,
    attn_top_k: float = 1.0,
    pad_id: int = 0,
    prefill_bucket: Optional[int] = None,
    tp_ctx=None,
) -> Tuple[List[List[int]], Dict[str, Any], Any]:
    """Batched greedy generation: B prompts of different lengths decode in
    lock-step with per-lane positions, per-lane terminator early-exit, and
    per-lane cache state (the batch axis threads through every cache op).

    The reference is strictly batch-1 (model.py:189 "Fixed for now",
    README.md:536-537 lists batching as future work) — this is a TPU-native
    extension: lanes share one compiled program and the weight streaming
    cost of each decode step.

    Caches must have been built with ``batch_size == len(prompts)``. Returns
    ``(sequences, info, caches)`` where ``sequences[b]`` is prompt +
    generation for lane b and ``info['perf_stats']`` reports aggregate
    throughput across lanes.
    """
    prompts = [list(map(int, p)) for p in prompts]
    B = len(prompts)
    lens = [len(p) for p in prompts]
    terminator_ids = list(terminator_ids or [])

    from ..models.transformer import is_stacked

    specs = (
        [caches.spec] if is_stacked(caches) else [c.spec for c in caches]
    )
    min_cache_length = min(s.max_cache_length for s in specs)
    # Lanes whose prompt exactly fills the smallest cache shave one token and
    # force it through decode (same edge the single-prompt path handles —
    # eviction state must exist before overflow).
    forced_first = [-1] * B
    for b in range(B):
        if lens[b] == min_cache_length:
            forced_first[b] = prompts[b][-1]
            lens[b] -= 1

    direct_fill = [
        s.max_cache_length
        for s in specs
        if s.cache_strategy in ("full", "hybrid")
        or s.cache_strategy.startswith("debug_")
    ]
    P = prefill_bucket or bucket_length(max(lens))
    if direct_fill and P > min(direct_fill):
        P = min(direct_fill)
    assert P >= max(lens), (
        f"Longest prompt ({max(lens)} tokens) exceeds the prefill bucket "
        f"({P})."
    )
    tokens = jnp.asarray(
        [p[: lens[b]] + [pad_id] * (P - lens[b]) for b, p in enumerate(prompts)],
        dtype=jnp.int32,
    )
    plen = jnp.asarray(lens, jnp.int32)

    t0 = time.perf_counter()
    if tp_ctx is not None:
        from ..parallel.tp_decode import tp_prefill

        assert is_stacked(caches), "tp_ctx requires the stacked-layer layout"
        logits, caches = tp_prefill(
            cfg, tp_ctx.mesh, tp_ctx.slim, tp_ctx.layers, tp_ctx.head,
            rope, caches, tokens, plen,
        )
        greedy_tok, prefill_probs = _logits_post_jit(logits)
    else:
        greedy_tok, prefill_probs, caches = _prefill_jit(
            cfg, params, rope, caches, tokens, plen
        )
    prefill_probs = np.asarray(jax.block_until_ready(prefill_probs))
    t1 = time.perf_counter()

    forced_arr = np.asarray(forced_first, np.int32)
    first_token = jnp.where(
        jnp.asarray(forced_arr) >= 0, jnp.asarray(forced_arr), greedy_tok
    )
    first_np = np.asarray(first_token)
    first_probs = [
        float(prefill_probs[b, int(first_np[b])]) for b in range(B)
    ]

    max_steps = max(max_new_tokens - 1, 0)
    prefix_arr = jnp.full((max(max_steps, 1),), -1, jnp.int32)
    term_arr = jnp.asarray(
        terminator_ids if terminator_ids else [-7], jnp.int32
    )

    if max_steps > 0:
        if tp_ctx is not None:
            from ..parallel.tp_decode import tp_decode_loop

            tokens_buf, probs_buf, n_steps, last_probs, caches = (
                tp_decode_loop(
                    cfg, tp_ctx.mesh, tp_ctx.slim, tp_ctx.layers,
                    tp_ctx.head, rope, caches, first_token, plen,
                    prefix_arr, term_arr, max_steps, attn_top_k,
                )
            )
        else:
            tokens_buf, probs_buf, n_steps, last_probs, caches = (
                _decode_loop_jit(
                    cfg,
                    params,
                    rope,
                    caches,
                    first_token,
                    plen,
                    prefix_arr,
                    term_arr,
                    max_steps,
                    attn_top_k,
                )
            )
        tokens_buf = np.asarray(jax.block_until_ready(tokens_buf))
        t2 = time.perf_counter()
        gens = [
            [int(t) for t in tokens_buf[:, b] if int(t) != -1]
            for b in range(B)
        ]
        probs_np = np.asarray(probs_buf)
        emitted_probs = [
            [first_probs[b]]
            + [float(p) for p in probs_np[: len(gens[b]) - 1, b]]
            for b in range(B)
        ]
        last_probs = np.asarray(last_probs)
    else:
        t2 = t1
        gens = [[int(first_np[b])] for b in range(B)]
        emitted_probs = [[first_probs[b]] for b in range(B)]
        last_probs = prefill_probs

    seqs = [prompts[b][: lens[b]] + gens[b] for b in range(B)]

    prefill_seconds = t1 - t0
    decode_seconds = max(t2 - t1, 1e-9)
    decode_tokens_total = sum(len(g) for g in gens)
    total_seconds = t2 - t0
    perf_stats = {
        "batch_size": B,
        "prefill_tokens": int(sum(lens)),
        "decode_tokens": decode_tokens_total,
        "prefill_toks_per_sec": sum(lens) / max(prefill_seconds, 1e-9),
        "decode_toks_per_sec": decode_tokens_total / decode_seconds,
        "total_toks_per_sec": decode_tokens_total / max(total_seconds, 1e-9),
        "total_seconds": total_seconds,
        "prefill_seconds": prefill_seconds,
        "decode_seconds": decode_seconds,
        "decode_seconds_frac_of_total": decode_seconds
        / max(total_seconds, 1e-9),
        "memory_used_gb": _device_memory_gb(),
    }
    info = {
        "perf_stats": perf_stats,
        "emitted_probs": emitted_probs,
        "final_probs": last_probs,
        "prompt_lengths": lens,
        "num_generated": [len(g) for g in gens],
    }
    return seqs, info, caches


def _device_memory_gb() -> float:
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "peak_bytes_in_use" in stats:
            return stats["peak_bytes_in_use"] / 1e9
        if stats and "bytes_in_use" in stats:
            return stats["bytes_in_use"] / 1e9
    except Exception:
        pass
    return 0.0


def reset_caches(caches):
    """Fresh cache states for a new example (reference: cache.py:229-239).

    Runs as a compiled program with donated buffers (in-place zeroing).
    """
    from ..models.transformer import is_stacked

    if is_stacked(caches):
        return _reset_jit(caches)
    return tuple(_reset_jit(c) for c in caches)
