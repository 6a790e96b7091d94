#!/bin/bash
# Round-3 TPU batch F: A/Bs for fixes landed during batch E —
# segment-wise sub-byte decode attention (bench_kv4/kv8), the fixed
# FastGen-hybrid bench leg, and the probe12 honest XLA-dot re-measure
# that anchors the plateau roofline. Run AFTER tpu_batch_r3e.sh.
set -u
mkdir -p /tmp/r3batch /root/repo/results/tpu_batch_r3
cd /root/repo
SUM=/tmp/r3batch/summary_f.log

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

echo "=== BATCH F start $(date -u +%FT%TZ)" | tee -a "$SUM"

# 0. One-shot decode attention (batch E's p10: the 4-chunk grid runs at
#    73.6 us/layer = ~114 GB/s effective — step-overhead-bound; one fat
#    step fits VMEM at C=2048). Kernel A/B then end-to-end.
run p10_oneshot  python -u scripts/perf_probe10.py --legs attn16_os,attn8_os,attn4_os,attn16,attn8
run bench_os     env CCT_ATTN_ONESHOT=1 python -u bench.py
run bench_os_kv8 env CCT_ATTN_ONESHOT=1 python -u bench.py --cache_bits 8

# 1. Segment-wise sub-byte decode attention (commit 0f5f8a0).
run bench_kv4    python -u bench.py --cache_bits 4
run bench_kv8    python -u bench.py --cache_bits 8
run bench_kv2    python -u bench.py --cache_bits 2

# 2. FastGen hybrid on hardware (bench fix: direct-fill budget + menu).
run bench_hybrid python -u bench.py --strategy hybrid

# 3. Honest XLA-dot streaming anchor (roofline re-measure).
run p12_i8       python -u scripts/perf_probe12.py --variant i8
run p12_bf16     python -u scripts/perf_probe12.py --variant bf16

# 4. Confirm the ATTN_STREAMS=2 edge before flipping the default.
run bench_as2b   env CCT_ATTN_STREAMS=2 python -u bench.py
run bench_base2  python -u bench.py

echo "=== BATCH F DONE $(date -u +%FT%TZ)" | tee -a "$SUM"
cp "$SUM" /root/repo/results/tpu_batch_r3/ 2>/dev/null
