#!/bin/bash
# Round-5 TPU batch B — the decode-attention kernel campaign:
#   1. perf_probe13: decomposes the big-cache chunk-grid kernel's
#      ~116-155 GB/s (strided vs flat DMA, slim v2, 67 MB one-shot).
#   2. CCT_ATTN_V2 A/Bs at every long-context full-cache row the
#      reference leads (16k bf16, 32k kv8/bf16, 65k kv8/bf16) plus a
#      headline-config guard leg (8k hh kv8 must not regress).
#   3. Quiet re-runs of batch-A legs whose measured window overlapped
#      host-side CPU work (bench_default read 53.88 vs the 98-108 band —
#      host contention starves the tunnel; see repo memory).
set -u
OUT=/root/repo/results/tpu_batch_r5
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

commit_results() {
  git add -f "$OUT" 2>/dev/null
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
  tail -12 "$OUT/$name.log" | grep -v WARNING | tee -a "$SUM"
  echo "--- rc=$rc" | tee -a "$SUM"
  commit_results "r5 batch B: $name leg artifacts"
  ok=""
  for attempt in 1 2 3 4 5 6; do
    if ping_tpu; then ok=1; break; fi
    echo "    ping $attempt failed after $name; retrying" | tee -a "$SUM"
    sleep 120
  done
  if [ -z "$ok" ]; then
    echo "!!! tunnel wedged after $name — aborting batch" | tee -a "$SUM"
    commit_results "r5 batch B: aborted after $name (tunnel wedged)"
    exit 1
  fi
}

echo "=== BATCH R5B start $(date -u +%FT%TZ)" | tee -a "$SUM"

# 1. Kernel decomposition probe (RESULT_OK line marks completion).
run probe13 python -u scripts/perf_probe13.py

# 2. v2 slim kernel through the production entry, per target row.
V31="--model Meta-Llama-3.1-8B-Instruct"
run bench16kf_v2   env CCT_ATTN_V2=1 python -u bench.py $V31 --context 16384 --strategy full --cache_bits 16
run bench16kf_v2k8 env CCT_ATTN_V2=1 python -u bench.py $V31 --context 16384 --strategy full --cache_bits 8
run bench32kf_v2k8 env CCT_ATTN_V2=1 python -u bench.py $V31 --context 32768 --strategy full --cache_bits 8
run bench32kf_v2   env CCT_ATTN_V2=1 python -u bench.py $V31 --context 32768 --strategy full --cache_bits 16
run bench_v2_guard env CCT_ATTN_V2=1 python -u bench.py
# XLA-einsum fallback datapoint at the 32k bf16 row (the module header's
# "~240 GB/s" claim, end-to-end).
run bench32kf_xla env CCT_ATTN_DISABLE=1 python -u bench.py $V31 --context 32768 --strategy full --cache_bits 16
LEG_TIMEOUT=3600 run bench65kf_v2k8 env CCT_ATTN_V2=1 python -u bench.py $V31 --context 65536 --strategy full --cache_bits 8
LEG_TIMEOUT=3600 run bench65kf_v2 env CCT_ATTN_V2=1 python -u bench.py $V31 --context 65536 --strategy full --cache_bits 16

# 2b. 65k compressed rows (batch A's bench65k_b2k/hh failed on the
# flash_prefill vmem estimate, fixed same-day; their error JSON matches
# the idempotence grep so they need fresh names).
LEG_TIMEOUT=3600 run bench65k_b2k2 python -u bench.py $V31 --context 65536 --budget_frac 2048
LEG_TIMEOUT=3600 run bench65kf_kv8b python -u bench.py $V31 --context 65536 --strategy full --cache_bits 8

# 3. Quiet re-runs of contaminated batch-A windows.
run bench_default2 python -u bench.py
run bench8kf_kv8b python -u bench.py --strategy full --cache_bits 8
run bench_hybrid_kv8b python -u bench.py --strategy hybrid --cache_bits 8

# 4. Rope-table truncation A/B (flat-curve attribution, VERDICT r4 #3):
#    batch A's bench31_8k_b2k ran the full 67 MB Llama-3.1 table (92.69);
#    bench.py now truncates the table to the benched context.
run bench31_8k_b2k2 python -u bench.py $V31 --context 8192 --budget_frac 2048

echo "=== BATCH R5B DONE $(date -u +%FT%TZ)" | tee -a "$SUM"
commit_results "r5 batch B: complete"

# Appended mid-batch (EOF append; earlier byte offsets untouched):
# the XLA fallback at 16k bf16 — if the einsum path beats the chunked
# kernel for big bf16 caches, routing becomes measurement-driven.
run bench16kf_xla env CCT_ATTN_DISABLE=1 python -u bench.py $V31 --context 16384 --strategy full --cache_bits 16
echo "=== BATCH R5B DONE(2) $(date -u +%FT%TZ)" | tee -a "$SUM"
commit_results "r5 batch B: appended xla leg complete"
