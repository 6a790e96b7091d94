#!/bin/bash
# Round-4 TPU batch C: follow-ups that depend on batch B's outcomes —
# the staged prefill W4A8 kernel's perf leg (its numerics validation runs
# on CPU via scripts/quality_ab.py), the fat-tile weight-stream retry
# PERF.md prescribes (TO=2048 under a raised vmem limit), stream/split
# compositions for the 528 -> >=580 GB/s weight-stream goal (VERDICT
# item 6), and a final plain bench.py so the driver's BENCH_r04 capture
# starts from a warm compile cache.
set -u
OUT=/root/repo/results/tpu_batch_r4
mkdir -p "$OUT"
cd /root/repo
SUM=$OUT/summary_c.log

ping_tpu() {
  timeout 420 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.full((256, 256), 2.0, jnp.bfloat16)
assert float(np.asarray(x @ x).sum()) > 0
print('ping ok')
" > "$OUT/ping.log" 2>&1
}

run() {
  name=$1; shift
  if [ -f "$OUT/$name.log" ] && grep -q '"metric"\|RESULT_OK' "$OUT/$name.log"; then
    echo "=== $name: already done, skipping" | tee -a "$SUM"
    return
  fi
  if [ -n "${DEADLINE_EPOCH:-}" ] && [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; then
    echo "=== $name: SKIPPED (past DEADLINE_EPOCH; freeing the chip)" | tee -a "$SUM"
    return
  fi
  echo "=== $name: $*" | tee -a "$SUM"
  timeout "${LEG_TIMEOUT:-2400}" "$@" > "$OUT/$name.log" 2>&1
  rc=$?
  tail -5 "$OUT/$name.log" | grep -v WARNING | tee -a "$SUM"
  echo "--- rc=$rc" | tee -a "$SUM"
  ok=""
  for attempt in 1 2 3 4 5 6; do
    if ping_tpu; then ok=1; break; fi
    echo "    ping $attempt failed after $name; retrying" | tee -a "$SUM"
    sleep 120
  done
  if [ -z "$ok" ]; then
    echo "!!! tunnel wedged after $name — aborting batch" | tee -a "$SUM"
    exit 1
  fi
}

echo "=== BATCH R4C start $(date -u +%FT%TZ)" | tee -a "$SUM"

# 0. eval_8b retry under the sequenced-repack + caches-after-params
#    eval.py fix (batch B's attempt OOM'd during prefill: async repack
#    chain held raw+stacked+fused trees ≈ 3x packed bytes).
LEG_TIMEOUT=5400 run eval_8b3 python -u eval.py \
  --random_weights Meta-Llama-3-8B-Instruct --random_quantize int4 \
  --tasks rulerniah rulerqa localtext --num_samples 2 \
  --cache_strategy heavy_hitter --max_cache_length 0.25 \
  --prompt_compression_strategy heavy_hitter \
  --out_dir results/eval_8b_tpu --overwrite

# 0b. Train the head_dim-128 fixture on-chip (TinyByteLM's head_dim=64
#     cannot route through the decode-attention kernels — D%128 gate —
#     so every TinyByteLM kv-quant ppl row measured the XLA math path,
#     not the kernels the production 8B config runs).
LEG_TIMEOUT=3600 run train128 python -u scripts/train_tiny.py --model TinyByteLM128

# 0c. KV-quant quality through the REAL kernel path (C=1024 aligned,
#     head_dim=128, CCT_ATTN_DEBUG prints the routing witness):
#     bf16 vs kv8 vs kv8+i8dot vs kv4 vs kv4+i8dot.
Q128="tests/fixtures/TinyByteLM128-hf/model.npz"
QOUT=/root/repo/results/quality_kv128
qeval() { # qeval <name> <cache_bits|-> [VAR=val ...]
  name=$1; bits=$2; shift 2
  extra=()
  [ "$bits" != "-" ] && extra=(--cache_bits "$bits")
  run "$name" env CCT_ATTN_DEBUG=1 "$@" python -u eval.py \
    --checkpoint_path "$Q128" --model_name TinyByteLM128 \
    --tasks localtext --num_samples 8 --seq_length 512 \
    --out_dir "$QOUT/$name" --overwrite "${extra[@]}"
}
qeval q128_bf16  -
qeval q128_kv8   8
qeval q128_kv8i8 8 CCT_ATTN_I8DOT=1
qeval q128_kv4   4
qeval q128_kv4i8 4 CCT_ATTN_I8DOT=1

# 1. Prefill W4A8 (decode path unchanged; read prefill_toks_per_sec from
#    the config blob — baseline ~6.8k tok/s @8k).
run bench_pw4a8   env CCT_PREFILL_W4A8=1 python -u bench.py

# 2. Fat-tile weight-stream retry (PERF.md: "Retry only with
#    CCT_QMM_VMEM_MB=100"; default tiles break double-buffering at
#    4.2 MB blocks under the 16 MB limit).
run bench_fattile env CCT_QMM_VMEM_MB=100 CCT_QMM_TILE=2048 python -u bench.py

# (split/stream compositions dropped: batch B refuted the split-buffer
#  layout outright — split2 89.37, split4 71.41 vs 98.03 single-stream.)

# 3. In-kernel activation quantization: the per-projection glue
#    (quantize + block-diag layout + scale epilogue) moves into the
#    kernel's grid step 0 so it overlaps the first weight-block DMAs —
#    targets the 0.56 ms/token production-vs-bare-kernel gap (PERF.md).
run bench_inkq    env CCT_QMM_INKQ=1 python -u bench.py
run bench_inkq8  env CCT_QMM_INKQ=1 CCT_ATTN_I8DOT=1 python -u bench.py --cache_bits 8

# 3b. Fixed-ABSOLUTE-budget compressed legs: the reference's flat
#     decode-vs-context curve holds the compressed cache CONSTANT
#     (0.52 GB at every context, blogpost_perf.py:12); our fractional
#     25% budget grows with context (32k leg: 68.9 tok/s at a 8192-row
#     cache). max_cache_length > 1 is absolute (engine parity), so
#     budget 2048 = the 8k default's cache at every context.
run bench31_16k_b2k python -u bench.py --model Meta-Llama-3.1-8B-Instruct --context 16384 --budget_frac 2048
run bench31_32k_b2k python -u bench.py --model Meta-Llama-3.1-8B-Instruct --context 32768 --budget_frac 2048

# 4. Long-context full-cache attention levers (16k measured 45.68 with
#    adaptive 2048-chunks; reference compiled full @16k = 50.18; roofline
#    ~80 — the chunked kernel is far off its DMA roof). A/B the staged
#    multi-stream KV DMA and a forced 4096-wide chunk (4 grid steps).
run bench16kf_s2   env CCT_ATTN_STREAMS=2 python -u bench.py --model Meta-Llama-3.1-8B-Instruct --context 16384 --strategy full
run bench16kf_c4   env CCT_ATTN_CHUNK=4096 python -u bench.py --model Meta-Llama-3.1-8B-Instruct --context 16384 --strategy full
run bench16kf_s2c4 env CCT_ATTN_STREAMS=2 CCT_ATTN_CHUNK=4096 python -u bench.py --model Meta-Llama-3.1-8B-Instruct --context 16384 --strategy full

echo "=== BATCH R4C DONE $(date -u +%FT%TZ)" | tee -a "$SUM"

# 5. Leave the chip on the driver's exact configuration: one plain run so
#    BENCH_r04's compile is a cache hit.
run bench_final   python -u bench.py

echo "=== BATCH R4C DONE(2) $(date -u +%FT%TZ)" | tee -a "$SUM"
