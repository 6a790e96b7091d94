"""Fused prefill attention with per-key summaries (Pallas TPU).

The compression strategies need per-key *summaries* of the prompt attention
map (SnapKV's observation-window mean, the heavy-hitter query-averaged mass
— reference prompt_compression.py:170-194, cache.py:703-704). The XLA
chunked path materializes per-chunk probability tiles in HBM (~4 GB of
traffic at 8k context); this kernel keeps everything in VMEM:

* GQA-native: query rows carry the G group heads folded into the row axis
  ([B, KVH, P*G, D], position-major), so K/V are never repeated
  (the reference repeat_interleaves, model.py:395-400).
* One grid step per (batch, kv_head, q_block). The whole K/V for the
  (b, kvh) program fits VMEM at serving context lengths (8k x 128 x bf16 =
  2 MB), so the causal inner loop just slices it — no k-streaming pipeline.
* Pass 1: online-softmax flash over key blocks -> y (never materializes
  probabilities). Pass 2 (with_summary only): recompute scores per key
  block, normalize with the finished (m, l), pool over G, and accumulate
  weighted column sums for the two query-weight vectors (validity and
  observation window). The summary output block depends only on (b, kvh),
  so consecutive q_block grid steps revisit it in VMEM.

Numerics match ops/attention.py::_chunked_prefill (row softmax is exact —
keys are never truncated).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_vmem_params(P, D, G, BQ, n_sums):
    """Explicit scoped-vmem limit for the flash kernels: the whole K/V for
    one (b, kvh) program stays VMEM-resident by design, which passes
    Mosaic's 16 MB default only up to ~16k context (the 32k bench leg
    failed compile: 17 MB needed). Budget = K+V + q/y tiles + the
    full-P weight rows and summary outputs + slack."""
    need = (
        2 * P * D * 2               # K + V (bf16)
        + 2 * BQ * G * D * 2        # q + y tiles
        + 2 * 8 * P * G * 4         # wc + wo weight rows
        + n_sums * 8 * P * 4        # summary output blocks
    )
    # Mosaic's stack accounting runs well above the raw block sum and the
    # runtime trims the granted limit (P=65536, r5 batch A: raw sum
    # ~55 MB, stack demand 74.78 MB, and a 77 MB request was granted as
    # 73.62 — still 1.15 MB short): size with 50% headroom. VMEM is
    # ~128 MB and this kernel runs standalone, so over-asking is free.
    need = need + need // 2 + 12 * 2**20
    if need <= 16 * 2**20:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(need, 120 * 2**20)
    )


def _kernel(q_ref, k_ref, v_ref, wc_ref, wo_ref, y_ref, cum_ref, obs_ref,
            *win_refs, BQ, BK, G, scale, with_summary, with_obs=True,
            window_lens=()):
    qb = pl.program_id(2)
    P = k_ref.shape[2]
    D = k_ref.shape[3]
    R = BQ * G  # query rows in this tile (position-major: r = i*G + g)

    if with_summary:
        @pl.when(qb == 0)
        def _():
            cum_ref[...] = jnp.zeros_like(cum_ref)
            obs_ref[...] = jnp.zeros_like(obs_ref)
            for wr in win_refs:
                wr[...] = jnp.zeros_like(wr)

    q = q_ref[0, 0]  # [R, D] bf16
    # Global query position per row and causal column limit.
    row_pos = qb * BQ + jax.lax.broadcasted_iota(jnp.int32, (R, BK), 0) // G

    n_kb = qb * BQ // BK + (BQ + BK - 1) // BK  # causal: keys <= last q pos

    def masked_scores(kb):
        k_blk = k_ref[0, 0, pl.ds(kb * BK, BK), :]  # [BK, D]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [R, BK]
        col_pos = kb * BK + jax.lax.broadcasted_iota(jnp.int32, (R, BK), 1)
        return jnp.where(col_pos <= row_pos, s, NEG_INF)

    # ---- pass 1: online softmax -> y --------------------------------------
    def body(kb, carry):
        m, l, acc = carry
        s = masked_scores(kb)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)  # [R, BK]
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        v_blk = v_ref[0, 0, pl.ds(kb * BK, BK), :]
        pv = jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc * alpha + pv
        return m_new, l, acc

    m0 = jnp.full((R, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((R, 1), jnp.float32)
    acc0 = jnp.zeros((R, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_kb, body, (m0, l0, acc0))
    y_ref[0, 0] = (acc / l).astype(y_ref.dtype)

    # ---- pass 2: normalized column sums (summaries) -----------------------
    if with_summary:
        # Row-expanded query weights ([1, R], already folded with the 1/G
        # group pooling outside the kernel — Mosaic supports no
        # sublane<->lane reshape, so the [BQ] -> [R] expansion can't happen
        # here). The 1/l softmax normalization rides on p instead, where the
        # [R, 1] broadcast is layout-natural.
        wc_rows = wc_ref[0, 0, pl.ds(qb * R, R)][None, :]  # [1, R]
        wo_rows = wo_ref[0, 0, pl.ds(qb * R, R)][None, :]
        inv_l = 1.0 / l  # [R, 1]

        def body2(kb, _):
            s = masked_scores(kb)
            p = jnp.exp(s - m) * inv_l  # [R, BK]
            cum_blk = jnp.dot(
                wc_rows, p, preferred_element_type=jnp.float32
            )  # [1, BK]
            cum_ref[0, 0, 0, pl.ds(kb * BK, BK)] += cum_blk[0]
            if with_obs:
                obs_blk = jnp.dot(
                    wo_rows, p, preferred_element_type=jnp.float32
                )
                obs_ref[0, 0, 0, pl.ds(kb * BK, BK)] += obs_blk[0]
            if window_lens:
                # Hybrid (FastGen) profiling: per distinct recent-window
                # length w, the column mass restricted to keys inside the
                # query's window — pooled/validity-weighted exactly like
                # cum (caches/hybrid.py::_profile_partial's wcols).
                col_pos = kb * BK + jax.lax.broadcasted_iota(
                    jnp.int32, (R, BK), 1
                )
                for wi, w in enumerate(window_lens):
                    in_win = jnp.logical_and(
                        col_pos <= row_pos, col_pos > row_pos - w
                    )
                    win_blk = jnp.dot(
                        wc_rows, jnp.where(in_win, p, 0.0),
                        preferred_element_type=jnp.float32,
                    )
                    win_refs[wi][0, 0, 0, pl.ds(kb * BK, BK)] += win_blk[0]
            return 0

        jax.lax.fori_loop(0, n_kb, body2, 0)


@functools.partial(
    jax.jit,
    static_argnames=("need_summary", "obs_len", "block_q", "block_k",
                     "interpret"),
)
def flash_prefill(
    q: jax.Array,  # [B, H, P, D]
    k: jax.Array,  # [B, KVH, P, D]
    v: jax.Array,
    prompt_len: jax.Array,  # scalar or [B]
    need_summary: bool = True,
    obs_len: int = 16,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
):
    """Returns (y [B, H, P, D], summary | None) matching
    ops/attention.py::prefill_attention's contract."""
    B, H, P, D = q.shape
    KVH = k.shape[1]
    G = H // KVH
    scale = 1.0 / math.sqrt(D)
    BQ = min(block_q, P)
    BK = min(block_k, P)
    assert P % BQ == 0 and P % BK == 0

    plen = jnp.broadcast_to(
        jnp.atleast_1d(jnp.asarray(prompt_len, jnp.int32)), (B,)
    )
    pos = jnp.arange(P, dtype=jnp.int32)
    # Row-expanded query weights [B, 8, P*G] (row p*G + g <- position p),
    # pre-folded with the 1/G group pooling; sublane dim padded to the
    # Mosaic min tile (row 0 is read).
    wc1 = (pos[None, :] < plen[:, None]).astype(jnp.float32) / G
    wo1 = jnp.logical_and(
        pos[None, :] >= plen[:, None] - obs_len, pos[None, :] < plen[:, None]
    ).astype(jnp.float32) / G
    expand = lambda a: jnp.broadcast_to(  # noqa: E731
        jnp.repeat(a, G, axis=-1)[:, None], (B, 8, P * G)
    )
    wc = expand(wc1)
    wo = expand(wo1)

    # Fold group heads into the query-position rows: [B, KVH, P*G, D].
    qf = (
        q.reshape(B, KVH, G, P, D)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, KVH, P * G, D)
        .astype(jnp.bfloat16)
    )
    kf = k.astype(jnp.bfloat16)
    vf = v.astype(jnp.bfloat16)

    kernel = functools.partial(
        _kernel, BQ=BQ, BK=BK, G=G, scale=scale, with_summary=need_summary
    )
    R = BQ * G
    grid = (B, KVH, P // BQ)
    y, cum, obs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, R, D), lambda b, h, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P, D), lambda b, h, j: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P, D), lambda b, h, j: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, P * G), lambda b, h, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, P * G), lambda b, h, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, R, D), lambda b, h, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            # Sublane dim padded to 8 (Mosaic min-tile); row 0 is the data.
            pl.BlockSpec((1, 1, 8, P), lambda b, h, j: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, P), lambda b, h, j: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, KVH, P * G, D), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, KVH, 8, P), jnp.float32),
            jax.ShapeDtypeStruct((B, KVH, 8, P), jnp.float32),
        ],
        compiler_params=_flash_vmem_params(P, D, G, BQ, 2),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(3 if need_summary else 2) * B * H * P * P * D,
            bytes_accessed=2 * (B * H * P * D * 2 + B * KVH * P * D * 2),
            transcendentals=B * H * P * P * (2 if need_summary else 1),
        ),
    )(qf, kf, vf, wc, wo)

    y = (
        y.reshape(B, KVH, P, G, D)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, H, P, D)
        .astype(q.dtype)
    )
    cum = cum[:, :, 0]
    obs = obs[:, :, 0]
    if not need_summary:
        return y, None
    obs_count = jnp.maximum(jnp.minimum(obs_len, plen), 1).astype(jnp.float32)
    denom = jnp.maximum(plen[:, None] - pos[None, :], 1).astype(jnp.float32)
    summary = {
        "obs_mean": obs / obs_count[:, None, None],
        "cum_mean": cum / denom[:, None, :],
    }
    return y, summary


@functools.partial(
    jax.jit,
    static_argnames=("window_lens", "block_q", "block_k", "interpret"),
)
def flash_profile(
    q: jax.Array,  # [B, H, P, D]
    k: jax.Array,  # [B, KVH, P, D]
    v: jax.Array,
    prompt_len: jax.Array,  # scalar or [B]
    window_lens: tuple = (),
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
):
    """Fused attention + FastGen profiling: ONE flash pass returns
    (y [B, H, P, D], cum [B, KVH, P], wcols [W, B, KVH, P]) where cum and
    wcols are the RAW hybrid profile accumulators
    (caches/hybrid.py::_profile_partial's contract). The XLA profile pass
    materializes per-chunk f32 probability tiles in HBM (~32 GB of
    traffic at 8k — hybrid prefill measured 157 tok/s vs the 6.9k of
    non-profiled prefill, r4 batch A); here probabilities never leave
    VMEM and the window masks are [R, BK]-local iota compares."""
    B, H, P, D = q.shape
    KVH = k.shape[1]
    G = H // KVH
    scale = 1.0 / math.sqrt(D)
    BQ = min(block_q, P)
    BK = min(block_k, P)
    assert P % BQ == 0 and P % BK == 0
    W = len(window_lens)

    plen = jnp.broadcast_to(
        jnp.atleast_1d(jnp.asarray(prompt_len, jnp.int32)), (B,)
    )
    pos = jnp.arange(P, dtype=jnp.int32)
    wc1 = (pos[None, :] < plen[:, None]).astype(jnp.float32) / G
    expand = lambda a: jnp.broadcast_to(  # noqa: E731
        jnp.repeat(a, G, axis=-1)[:, None], (B, 8, P * G)
    )
    wc = expand(wc1)

    qf = (
        q.reshape(B, KVH, G, P, D)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, KVH, P * G, D)
        .astype(jnp.bfloat16)
    )
    kf = k.astype(jnp.bfloat16)
    vf = v.astype(jnp.bfloat16)

    kernel = functools.partial(
        _kernel, BQ=BQ, BK=BK, G=G, scale=scale, with_summary=True,
        with_obs=False, window_lens=tuple(window_lens),
    )
    R = BQ * G
    grid = (B, KVH, P // BQ)
    sum_spec = pl.BlockSpec((1, 1, 8, P), lambda b, h, j: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    sum_shape = jax.ShapeDtypeStruct((B, KVH, 8, P), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, R, D), lambda b, h, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P, D), lambda b, h, j: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P, D), lambda b, h, j: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, P * G), lambda b, h, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, P * G), lambda b, h, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, R, D), lambda b, h, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            sum_spec,
            sum_spec,
        ] + [sum_spec] * W,
        out_shape=[
            jax.ShapeDtypeStruct((B, KVH, P * G, D), jnp.bfloat16),
            sum_shape,
            sum_shape,
        ] + [sum_shape] * W,
        compiler_params=_flash_vmem_params(P, D, G, BQ, 2 + W),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(3 + W) * B * H * P * P * D,
            bytes_accessed=2 * (B * H * P * D * 2 + B * KVH * P * D * 2),
            transcendentals=2 * B * H * P * P,
        ),
    )(qf, kf, vf, wc, wc)
    y, cum = outs[0], outs[1]
    wcols = outs[3:]

    y = (
        y.reshape(B, KVH, P, G, D)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, H, P, D)
        .astype(q.dtype)
    )
    cum = cum[:, :, 0]
    wstack = (
        jnp.stack([wr[:, :, 0] for wr in wcols])
        if W
        else jnp.zeros((0, B, KVH, P), jnp.float32)
    )
    return y, cum, wstack


def flash_prefill_supported(q_shape, need_summary: bool = True) -> bool:
    """Gate: real TPU, MXU-aligned head dim, block-divisible padded length."""
    from .pallas_qmm import backend_ok

    if not backend_ok():
        return False
    B, H, P, D = q_shape
    return (
        D % 128 == 0
        and P % 512 == 0
        and P >= 512
        # K/V residency cap (see _flash_vmem_params): past ~64k context
        # the one-shot design stops fitting even with a raised limit.
        and 2 * P * D * 2 + 2 * 8 * P * 4 * 4 <= 100 * 2**20
    )
