#!/bin/bash
# Round-3 TPU batch F2: the legs batch F lost to a tunnel outage —
# kv8/kv2 on the new defaults, the fixed FastGen-hybrid leg, probe12
# roofline anchors, and the ATTN_STREAMS confirm pair.
set -u
mkdir -p /tmp/r3batch /root/repo/results/tpu_batch_r3
cd /root/repo
SUM=/tmp/r3batch/summary_f2.log

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

echo "=== BATCH F2 start $(date -u +%FT%TZ)" | tee -a "$SUM"

run bench_kv8    python -u bench.py --cache_bits 8
run bench_kv2    python -u bench.py --cache_bits 2
run bench_hybrid python -u bench.py --strategy hybrid
run p12_i8       python -u scripts/perf_probe12.py --variant i8
run p12_bf16     python -u scripts/perf_probe12.py --variant bf16
run bench_as2b   env CCT_ATTN_STREAMS=2 python -u bench.py

echo "=== BATCH F2 DONE $(date -u +%FT%TZ)" | tee -a "$SUM"
cp "$SUM" /root/repo/results/tpu_batch_r3/ 2>/dev/null
