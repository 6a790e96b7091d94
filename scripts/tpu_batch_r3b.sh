#!/bin/bash
# Round-3 TPU measurement batch C: decode-step decomposition + staged-kernel
# hardware revalidation + scaling curves (VERDICT r2 items 1-3, 6, 8).
#
# Ordering: known-good bench first (fallback number), then the decomposition
# probes that decide this round's integration work, then the staged-kernel
# A/Bs, then scaling curves, riskiest (new Mosaic programs / big contexts)
# last. Health ping between entries; abort on a wedged tunnel.
set -u
mkdir -p /tmp/r3batch /root/repo/results/tpu_batch_r3
cd /root/repo
SUM=/tmp/r3batch/summary.log

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
  tail -4 "/tmp/r3batch/$name.log" | grep -v WARNING | tee -a "$SUM"
  echo "--- rc=$rc" | tee -a "$SUM"
  cp "/tmp/r3batch/$name.log" /root/repo/results/tpu_batch_r3/ 2>/dev/null
  cp "$SUM" /root/repo/results/tpu_batch_r3/summary_c.log 2>/dev/null
  if ! ping_tpu; then
    echo "!!! tunnel wedged after $name — aborting batch" | tee -a "$SUM"
    cp "$SUM" /root/repo/results/tpu_batch_r3/summary_c.log 2>/dev/null
    exit 1
  fi
}

echo "=== BATCH C start $(date -u +%FT%TZ)" | tee -a "$SUM"

# 0. Known-good first. cpt layout is now the default (92.0/92.4 measured);
#    bench_v3 confirms the flag still restores the old path.
run bench_base   python -u bench.py
run bench_v3     env CCT_QMM_CPT=0 python -u bench.py

# 1. Decode decomposition — decides the round's perf integration work.
run p11_cpt      python -u scripts/perf_probe11.py --variant cpt
run p11_v3       python -u scripts/perf_probe11.py --variant v3
run p9_sep       python -u scripts/perf_probe9.py --variant sep
run p9_mega      python -u scripts/perf_probe9.py --variant mega
run p10_all      python -u scripts/perf_probe10.py

# 2. Staged-kernel revalidation (fixes landed after the r2 batch died).
run bench_s2     env CCT_QMM_STREAMS=2 python -u bench.py
run bench_as2    env CCT_ATTN_STREAMS=2 python -u bench.py
run bench_head8  python -u bench.py --head_bits 8
run parity_evict python -u scripts/parity_fused_evict.py
run bench_evict  env CCT_FUSED_EVICT=1 python -u bench.py
run bench_pf4    env CCT_PREFILL_W4A8=1 python -u bench.py

# 3. Quantized KV cache + hybrid/FastGen on hardware (VERDICT items 3, 6).
run bench_kv8    python -u bench.py --cache_bits 8
run bench_kv4    python -u bench.py --cache_bits 4
run bench_hybrid python -u bench.py --strategy hybrid

# 4. Scaling curves the r2 batch skipped (VERDICT item 8).
run bench_full   python -u bench.py --strategy full
run bench_b2     python -u bench.py --batch 2
run bench_b4     python -u bench.py --batch 4
run bench_b8     python -u bench.py --batch 8
run bench_4k     python -u bench.py --context 4096
run bench_16k    python -u bench.py --context 16384
run bench_16kf   python -u bench.py --context 16384 --strategy full

echo "=== BATCH C DONE $(date -u +%FT%TZ)" | tee -a "$SUM"
cp "$SUM" /root/repo/results/tpu_batch_r3/summary_c.log 2>/dev/null
