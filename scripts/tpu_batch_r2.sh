#!/bin/bash
# Round-2 TPU measurement batch: run everything queued while the tunnel was
# down. Sequential (one process holds the chip). Logs under /tmp/r2batch and
# mirrored to results/tpu_batch_r2/ so evidence survives the container.
#
# Ordering is deliberate: secure the known-good bench number FIRST, then
# cheap A/Bs and parity, then the exploratory probes, and the riskiest
# programs (fat tiles — the r2 tunnel wedge came from a scoped-vmem-OOM
# remote compile) LAST. A health ping runs between entries and the script
# aborts on a wedged tunnel instead of queueing 40-minute hangs.
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
  timeout 2400 "$@" > "/tmp/r2batch/$name.log" 2>&1
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

# 0. Known-good baseline first: confirms health and records the number the
#    round can always fall back to.
run bench_base   python -u bench.py            # current default path

# 1. Decode parity: fused evict kernel must not change generated tokens
run parity_evict python -u scripts/parity_fused_evict.py

# 2. Bench A/B (features are opt-in until Mosaic-validated here)
run bench_head8  env CCT_TILED_HEAD=1 python -u bench.py
run bench_head4  env CCT_TILED_HEAD=1 python -u bench.py --head_bits 4
run bench_evict  env CCT_FUSED_EVICT=1 CCT_TILED_HEAD=1 python -u bench.py --head_bits 4
run bench_s2     env CCT_QMM_STREAMS=2 CCT_TILED_HEAD=1 python -u bench.py --head_bits 4
run bench_as2    env CCT_ATTN_STREAMS=2 CCT_QMM_STREAMS=2 CCT_TILED_HEAD=1 python -u bench.py --head_bits 4
run bench_full   python -u bench.py --strategy full   # 48 tok/s anomaly recheck

# 2b. Prefill W4A8 kernel (opt-in numerics change: int8 activations)
run bench_pf48   env CCT_PREFILL_W4A8=1 CCT_TILED_HEAD=1 python -u bench.py --head_bits 4

# 3. Scaling evidence: batch aggregate + long-context (Llama-3.1 ropes)
run bench_b4     python -u bench.py --batch 4
run bench_b8     python -u bench.py --batch 8
run bench_16k    python -u bench.py --model Meta-Llama-3.1-8B-Instruct --context 16384
run bench_32k    python -u bench.py --model Meta-Llama-3.1-8B-Instruct --context 32768
run bench_full16k python -u bench.py --model Meta-Llama-3.1-8B-Instruct --context 16384 --strategy full

# 4. Weight-stream decomposition probes (the big lever: 8.2 ms/token)
run probe_dma    python -u scripts/perf_probe8.py --variant dma
run probe_onedot python -u scripts/perf_probe8.py --variant onedot
run probe_cp2    python -u scripts/perf_probe8.py --variant cp2
run probe_dma2   python -u scripts/perf_probe8.py --variant dma2
run probe_cp2x2  python -u scripts/perf_probe8.py --variant cp2x2
run probe9_sep   python -u scripts/perf_probe9.py --variant sep
run probe9_mega  python -u scripts/perf_probe9.py --variant mega

# 5. Riskiest last: fat tiles drove the r2 scoped-vmem wedge.
run bench_s4     env CCT_QMM_STREAMS=4 CCT_QMM_VMEM_MB=100 CCT_TILED_HEAD=1 python -u bench.py --head_bits 4
run probe_cp2_fat python -u scripts/perf_probe8.py --variant cp2 --fat

echo "ALL DONE" | tee -a "$SUM"
cp "$SUM" /root/repo/results/tpu_batch_r2/
