#!/bin/bash
# Round-4 TPU batch F: hardware validation of the manual double-buffered
# decode-attention kernel (CCT_ATTN_MANUAL=1) — one program per batch
# element, explicit make_async_copy prefetch of chunk c+1 during chunk
# c's compute, no per-chunk grid steps. Targets the chunked-kernel gap:
# full@16k 45.68 (ref 50.18), full@32k 22.95 (ref 30.03), ~116 GB/s
# effective vs ~600 roof. Interpret-mode parity: tests/test_decode_attn.py
# ::test_manual_pipeline_matches_one_shot.
set -u
OUT=/root/repo/results/tpu_batch_r4
mkdir -p "$OUT"
cd /root/repo
SUM=$OUT/summary_f.log

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

echo "=== BATCH R4F start $(date -u +%FT%TZ)" | tee -a "$SUM"

# Cheap compile sanity first (8k full bf16 forces chunked via OS_BUDGET=0
# so the manual kernel actually routes; also an overhead datapoint vs
# batch E's bench8k_forcechunk).
run bench8k_manual env CCT_ATTN_MANUAL=1 CCT_ATTN_OS_BUDGET_MB=0 python -u bench.py --cache_bits 16 --strategy full

# The targets.
run bench16kf_man env CCT_ATTN_MANUAL=1 python -u bench.py --model Meta-Llama-3.1-8B-Instruct --context 16384 --strategy full --cache_bits 16
run bench32kf_man env CCT_ATTN_MANUAL=1 python -u bench.py --model Meta-Llama-3.1-8B-Instruct --context 32768 --strategy full --cache_bits 16
run bench32kf_man_kv8 env CCT_ATTN_MANUAL=1 python -u bench.py --model Meta-Llama-3.1-8B-Instruct --context 32768 --strategy full --cache_bits 8

# Batched long-context serving row (first-class batch axis the
# reference lacks): aggregate throughput at 16k under compression.
run bench16k_b2 python -u bench.py --model Meta-Llama-3.1-8B-Instruct --context 16384 --batch 2

echo "=== BATCH R4F DONE $(date -u +%FT%TZ)" | tee -a "$SUM"

# Leave the chip warm on the driver's configuration.
run bench_final3 python -u bench.py
echo "=== BATCH R4F DONE(2) $(date -u +%FT%TZ)" | tee -a "$SUM"
