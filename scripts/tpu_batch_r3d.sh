#!/bin/bash
# Round-3 TPU batch D: reruns of the legs batch C lost (probe11 constants
# bug), the TP shard-shape Mosaic compile check, and the 8B-scale eval —
# VERDICT r2 items 5 and 7. Run AFTER tpu_batch_r3b.sh (one process holds
# the chip).
set -u
mkdir -p /tmp/r3batch /root/repo/results/tpu_batch_r3
cd /root/repo
SUM=/tmp/r3batch/summary_d.log

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
  if ! ping_tpu; then
    echo "!!! tunnel wedged after $name — aborting batch" | tee -a "$SUM"
    cp "$SUM" /root/repo/results/tpu_batch_r3/ 2>/dev/null
    exit 1
  fi
}

echo "=== BATCH D start $(date -u +%FT%TZ)" | tee -a "$SUM"

# 1. Honest production-kernel rates (the closure-constants bug is fixed).
run p11_cpt      python -u scripts/perf_probe11.py --variant cpt
run p11_v3       python -u scripts/perf_probe11.py --variant v3

# 2. TP per-shard Mosaic compile + parity on one chip (VERDICT item 7).
run tp_shard     python -u scripts/tp_shard_compile.py

# 3. 8B-scale eval through the real harness on the chip (VERDICT item 5).
LEG_TIMEOUT=5400 run eval_8b python -u eval.py \
  --random_weights Meta-Llama-3-8B-Instruct --random_quantize int4 \
  --tasks rulerniah rulerqa localtext --num_samples 2 \
  --cache_strategy heavy_hitter --max_cache_length 0.25 \
  --out_dir results/eval_8b_tpu --overwrite

echo "=== BATCH D DONE $(date -u +%FT%TZ)" | tee -a "$SUM"
cp "$SUM" /root/repo/results/tpu_batch_r3/ 2>/dev/null
