#!/bin/bash
# Trimmed round-2 batch: gate-decision runs first (the A/Bs that decide which
# staged kernels become defaults), then parity, then probes. Same harness as
# tpu_batch_r2.sh (health ping between entries, abort on wedge, logs mirrored
# into results/tpu_batch_r2/).
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

# Gate decisions first.
run bench_base   python -u bench.py
run bench_head8  env CCT_TILED_HEAD=1 python -u bench.py
run bench_head4  env CCT_TILED_HEAD=1 python -u bench.py --head_bits 4
run bench_evict  env CCT_FUSED_EVICT=1 CCT_TILED_HEAD=1 python -u bench.py --head_bits 4
run bench_s2     env CCT_QMM_STREAMS=2 CCT_TILED_HEAD=1 python -u bench.py --head_bits 4
run bench_as2    env CCT_ATTN_STREAMS=2 CCT_QMM_STREAMS=2 CCT_TILED_HEAD=1 python -u bench.py --head_bits 4
run bench_all    env CCT_FUSED_EVICT=1 CCT_ATTN_STREAMS=2 CCT_QMM_STREAMS=2 CCT_TILED_HEAD=1 python -u bench.py --head_bits 4

# Parity on hardware.
run parity_evict python -u scripts/parity_fused_evict.py

# Probes (the 430 GB/s plateau).
run probe_dma    python -u scripts/perf_probe8.py --variant dma
run probe_dma2   python -u scripts/perf_probe8.py --variant dma2
run probe_cp2    python -u scripts/perf_probe8.py --variant cp2
run probe_cp2x2  python -u scripts/perf_probe8.py --variant cp2x2
run probe9_sep   python -u scripts/perf_probe9.py --variant sep
run probe9_mega  python -u scripts/perf_probe9.py --variant mega

# Prefill W4A8 + scaling evidence.
run bench_pf48   env CCT_PREFILL_W4A8=1 CCT_TILED_HEAD=1 python -u bench.py --head_bits 4
run bench_b4     python -u bench.py --batch 4
run bench_full   python -u bench.py --strategy full
run bench_16k    python -u bench.py --model Meta-Llama-3.1-8B-Instruct --context 16384

# Riskiest last (scoped-vmem wedge risk).
run bench_s4     env CCT_QMM_STREAMS=4 CCT_QMM_VMEM_MB=100 CCT_TILED_HEAD=1 python -u bench.py --head_bits 4

echo "ALL DONE" | tee -a "$SUM"
cp "$SUM" /root/repo/results/tpu_batch_r2/
