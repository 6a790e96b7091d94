#!/bin/bash
# Round-5 TPU batch D — finalization (run after batches A-C):
#   * re-measure the README context table on the PROMOTED defaults
#     (whatever batch B validated becomes the no-env-flag behavior);
#   * refresh charts/bench_sweep.json rows the table quotes;
#   * leave the chip warm on the driver's default config so the
#     end-of-round BENCH capture compiles from cache.
set -u
OUT=/root/repo/results/tpu_batch_r5
mkdir -p "$OUT"
cd /root/repo
SUM=$OUT/summary_d.log

ping_tpu() {
  timeout 420 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.full((256, 256), 2.0, jnp.bfloat16)
assert float(np.asarray(x @ x).sum()) > 0
print('ping ok')
" > "$OUT/ping.log" 2>&1
}

commit_results() {
  git add -f "$OUT" charts/bench_sweep.json 2>/dev/null
  git commit -q -m "$1" 2>/dev/null || true
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
  tail -6 "$OUT/$name.log" | grep -v WARNING | tee -a "$SUM"
  echo "--- rc=$rc" | tee -a "$SUM"
  commit_results "r5 batch D: $name leg artifacts"
  ok=""
  for attempt in 1 2 3 4 5 6; do
    if ping_tpu; then ok=1; break; fi
    echo "    ping $attempt failed after $name; retrying" | tee -a "$SUM"
    sleep 120
  done
  if [ -z "$ok" ]; then
    echo "!!! tunnel wedged after $name — aborting batch" | tee -a "$SUM"
    commit_results "r5 batch D: aborted after $name (tunnel wedged)"
    exit 1
  fi
}

echo "=== BATCH R5D start $(date -u +%FT%TZ)" | tee -a "$SUM"

V31="--model Meta-Llama-3.1-8B-Instruct"

# Promoted-default context table (no env flags: measures shipping code).
run d_8kf_kv8   python -u bench.py --strategy full --cache_bits 8
run d_16kf_kv8  python -u bench.py $V31 --context 16384 --strategy full --cache_bits 8
run d_16kf_bf16 python -u bench.py $V31 --context 16384 --strategy full --cache_bits 16
run d_32kf_kv8  python -u bench.py $V31 --context 32768 --strategy full --cache_bits 8
run d_32kf_bf16 python -u bench.py $V31 --context 32768 --strategy full --cache_bits 16
LEG_TIMEOUT=3600 run d_65kf_kv8 python -u bench.py $V31 --context 65536 --strategy full --cache_bits 8

# Compressed rows at the same contexts (flat-curve story on defaults).
run d_16k_hh python -u bench.py $V31 --context 16384
run d_32k_hh python -u bench.py $V31 --context 32768

# Leave the compile cache warm on the driver's exact default.
run d_final python -u bench.py

echo "=== BATCH R5D DONE $(date -u +%FT%TZ)" | tee -a "$SUM"
commit_results "r5 batch D: complete"
