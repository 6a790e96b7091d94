#!/bin/bash
# Round-3 TPU batch G: re-measure the README perf table on the new
# defaults (one-shot decode attention + segment-wise sub-byte dequant),
# genuine 16k contexts via Llama-3.1 (batch E's "16k" silently clamped
# to Llama-3's 8k block_size), full-cache one-shot with the raised vmem
# budget, and the eval_8b retry with the param-box OOM fix + RULER
# synthesis sizing fix. Run AFTER tpu_batch_r3f.sh.
set -u
mkdir -p /tmp/r3batch /root/repo/results/tpu_batch_r3
cd /root/repo
SUM=/tmp/r3batch/summary_g.log

ping_tpu() {
  timeout 420 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.full((256, 256), 2.0, jnp.bfloat16)
assert float(np.asarray(x @ x).sum()) > 0
print('ping ok')
" > /tmp/r3batch/ping.log 2>&1
}

run() {
  name=$1; shift
  if [ -n "${DEADLINE_EPOCH:-}" ] && [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; then
    echo "=== $name: SKIPPED (past DEADLINE_EPOCH; freeing the chip)" | tee -a "$SUM"
    return
  fi
  echo "=== $name: $*" | tee -a "$SUM"
  timeout "${LEG_TIMEOUT:-2400}" "$@" > "/tmp/r3batch/$name.log" 2>&1
  rc=$?
  tail -5 "/tmp/r3batch/$name.log" | grep -v WARNING | tee -a "$SUM"
  echo "--- rc=$rc" | tee -a "$SUM"
  cp "/tmp/r3batch/$name.log" /root/repo/results/tpu_batch_r3/ 2>/dev/null
  cp "$SUM" /root/repo/results/tpu_batch_r3/ 2>/dev/null
  ok=""
  for attempt in 1 2 3 4 5 6; do
    if ping_tpu; then ok=1; break; fi
    echo "    ping $attempt failed after $name; retrying" | tee -a "$SUM"
    sleep 120
  done
  if [ -z "$ok" ]; then
    echo "!!! tunnel wedged after $name — aborting batch" | tee -a "$SUM"
    cp "$SUM" /root/repo/results/tpu_batch_r3/ 2>/dev/null
    exit 1
  fi
}

echo "=== BATCH G start $(date -u +%FT%TZ)" | tee -a "$SUM"

# 1. New-default headline, twice (the "done" criterion wants 2 in a row).
run bench_base   python -u bench.py
run bench_base2  python -u bench.py

# 2. Perf-table rows on the new defaults.
run bench_5pct   python -u bench.py --budget_frac 0.05
run bench_full   python -u bench.py --strategy full
run bench_kv4b   python -u bench.py --cache_bits 4
run bench_b4     python -u bench.py --batch 4
run bench_b8     python -u bench.py --batch 8
run bench_4k     python -u bench.py --context 4096
run bench_2k     python -u bench.py --context 2048
run bench_2kf    python -u bench.py --context 2048 --strategy full
run bench_4kf    python -u bench.py --context 4096 --strategy full

# 3. Genuine long-context rows (Llama-3.1 rope scaling).
run bench31_16k  python -u bench.py --model Meta-Llama-3.1-8B-Instruct --context 16384
run bench31_16kf python -u bench.py --model Meta-Llama-3.1-8B-Instruct --context 16384 --strategy full
LEG_TIMEOUT=3600 run bench31_32k python -u bench.py --model Meta-Llama-3.1-8B-Instruct --context 32768

# 4. 8B-scale eval retry (param-box OOM fix + RULER sizing fix).
LEG_TIMEOUT=5400 run eval_8b python -u eval.py \
  --random_weights Meta-Llama-3-8B-Instruct --random_quantize int4 \
  --tasks rulerniah rulerqa localtext --num_samples 2 \
  --cache_strategy heavy_hitter --max_cache_length 0.25 \
  --prompt_compression_strategy heavy_hitter \
  --out_dir results/eval_8b_tpu --overwrite

echo "=== BATCH G DONE $(date -u +%FT%TZ)" | tee -a "$SUM"
cp "$SUM" /root/repo/results/tpu_batch_r3/ 2>/dev/null
