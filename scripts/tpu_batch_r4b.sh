#!/bin/bash
# Round-4 TPU batch B: A/Bs for the two new kernels staged this round —
# the split-buffer multi-stream cpt weight layout (CCT_QMM_SPLIT, VERDICT
# item 6: 528 -> >=580 GB/s weight stream) and the int8-MXU decode
# attention (CCT_ATTN_I8DOT, VERDICT item 5: kv8 >= bf16, measured 106.62
# once in batch A) — plus the plain-kv8 row batch A lost to a tunnel
# wedge and the i8dot task-quality row on trained TinyByteLM weights.
set -u
OUT=/root/repo/results/tpu_batch_r4
mkdir -p "$OUT"
cd /root/repo
SUM=$OUT/summary_b.log

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

echo "=== BATCH R4B start $(date -u +%FT%TZ)" | tee -a "$SUM"

# 0. Fresh default-headline leg (warms the compile cache, confirms the
#    defaults still land ~98; batch A measured 98.66 twice).
run bench_base3   python -u bench.py

# 1. eval_8b retry, EARLY this time (batch A hit RESOURCE_EXHAUSTED
#    immediately after the 32kf OOM crash — run it before any OOM-risky
#    32k leg; bench.py now also repacks before allocating caches).
LEG_TIMEOUT=5400 run eval_8b2 python -u eval.py \
  --random_weights Meta-Llama-3-8B-Instruct --random_quantize int4 \
  --tasks rulerniah rulerqa localtext --num_samples 2 \
  --cache_strategy heavy_hitter --max_cache_length 0.25 \
  --prompt_compression_strategy heavy_hitter \
  --out_dir results/eval_8b_tpu --overwrite

# 2. Plain kv8 (batch A's leg died in a wedge; r3 one-shot ref: 94.97)
#    + i8dot repeatability/composition (batch A: kv8 i8dot 106.62).
run bench_kv8b    python -u bench.py --cache_bits 8
run bench_kv8i8b  env CCT_ATTN_I8DOT=1 python -u bench.py --cache_bits 8
run bench_kv4i8   env CCT_ATTN_I8DOT=1 python -u bench.py --cache_bits 4

# 3. Hybrid decode after the per-row drop write-back (batch A with the
#    full-cache revert selects: 54.79 tok/s; target ~= full's 70.7).
run bench_hybrid2 python -u bench.py --strategy hybrid

# 4. Split-buffer multi-stream weight DMA A/B (baseline 98.66 / 497.7
#    GB/s from batch A; probe8's pure-DMA floor is 632).
run bench_split2  env CCT_QMM_SPLIT=2 python -u bench.py
run bench_split4  env CCT_QMM_SPLIT=4 python -u bench.py
run bench_combo   env CCT_QMM_SPLIT=2 CCT_ATTN_I8DOT=1 python -u bench.py --cache_bits 8

# 5. Batch-A legs lost to tunnel wedges + genuine long-context rows.
run bench_4kf2    python -u bench.py --context 4096 --strategy full

# 5a. Full-cache 16k under adaptive attention chunks (batch A measured
#     41.65 with fixed 512-wide chunks = 32 grid steps; reference
#     compiled full @16k = 50.18, blogpost_perf.py:7).
run bench31_16kf2 python -u bench.py --model Meta-Llama-3.1-8B-Instruct --context 16384 --strategy full

# 5b. 32k legs (batch A failed compile: flash_prefill scoped-vmem OOM at
#     P=32768, fixed by the explicit vmem limit). OOM-risky: keep LAST
#     among bench legs.
LEG_TIMEOUT=3600 run bench31_32k2  python -u bench.py --model Meta-Llama-3.1-8B-Instruct --context 32768
LEG_TIMEOUT=3600 run bench31_32kf2 python -u bench.py --model Meta-Llama-3.1-8B-Instruct --context 32768 --strategy full

# 6. KV-quantization quality on trained weights (TinyByteLM, TPU), all
#    rows re-run on the CURRENT corpus (the r4 corpus-budget fix changed
#    the eval text, so r3's absolute ppls are not comparable): bf16
#    baseline + cache_bits 8/4/2 + the kv8 i8dot row. i8dot stays
#    default-eligible only if its ppl matches plain kv8.
LEG_TIMEOUT=10800 run quality_kv python scripts/quality_ab.py \
  --matrix main --device tpu

echo "=== BATCH R4B DONE $(date -u +%FT%TZ)" | tee -a "$SUM"
