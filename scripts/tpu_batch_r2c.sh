#!/bin/bash
# Follow-up batch: quantized-KV decode (VERDICT r1 item 3 done-criterion:
# --cache_bits >= bf16-cache number), plus a base repeat ("prints >= 70
# twice in a row", item 1). Runs after tpu_batch_r2b.sh.
set -u
mkdir -p /tmp/r2batch /root/repo/results/tpu_batch_r2
cd /root/repo
SUM=/tmp/r2batch/summary.log

ping_tpu() {
  timeout 420 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.full((256, 256), 2.0, jnp.bfloat16)
assert float(np.asarray(x @ x).sum()) > 0
print('ping ok')
" > /tmp/r2batch/ping.log 2>&1
}

run() {
  name=$1; shift
  if [ -n "${DEADLINE_EPOCH:-}" ] && [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; then
    echo "=== $name: SKIPPED (past DEADLINE_EPOCH; freeing the chip)" | tee -a "$SUM"
    return
  fi
  echo "=== $name: $*" | tee -a "$SUM"
  timeout 1800 "$@" > "/tmp/r2batch/$name.log" 2>&1
  rc=$?
  tail -3 "/tmp/r2batch/$name.log" | grep -v WARNING | tee -a "$SUM"
  echo "--- rc=$rc" | tee -a "$SUM"
  cp "/tmp/r2batch/$name.log" /root/repo/results/tpu_batch_r2/ 2>/dev/null
  cp "$SUM" /root/repo/results/tpu_batch_r2/ 2>/dev/null
  if ! ping_tpu; then
    echo "!!! tunnel wedged after $name — aborting batch" | tee -a "$SUM"
    cp "$SUM" /root/repo/results/tpu_batch_r2/ 2>/dev/null
    exit 1
  fi
}

run bench_cb8    python -u bench.py --cache_bits 8
run bench_cb4    python -u bench.py --cache_bits 4
run bench_base2  python -u bench.py
run bench_32k    python -u bench.py --model Meta-Llama-3.1-8B-Instruct --context 32768

echo "ALL DONE (r2c)" | tee -a "$SUM"
cp "$SUM" /root/repo/results/tpu_batch_r2/
