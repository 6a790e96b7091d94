#!/bin/bash
# Round-3 TPU batch E: the legs batch C lost when its wedge-probe
# false-alarmed after p9_sep — staged-kernel gate A/Bs, quantized-KV +
# hybrid on hardware, scaling curves — plus the eval_8b rerun with the
# required --prompt_compression_strategy flag (VERDICT r2 items 2, 3, 5,
# 6, 8) and the post-vmem-fix p9_mega / p10 decomposition probes.
set -u
mkdir -p /tmp/r3batch /root/repo/results/tpu_batch_r3
cd /root/repo
SUM=/tmp/r3batch/summary_e.log

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
  # The tunnel has ~10-minute unhealthy windows that recover on their own
  # (two batches aborted on transient wedges) — ping up to 6 times over
  # ~20 min before declaring a real wedge.
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

echo "=== BATCH E start $(date -u +%FT%TZ)" | tee -a "$SUM"

# 1. Staged-kernel gate A/Bs (fixes landed after the r2 batch died).
#    bench_s2 measured 91.38 in the first attempt (multi-stream vmem fix
#    compiles + runs; slightly under the 92.3 cpt default) — not repeated.
run bench_as2    env CCT_ATTN_STREAMS=2 python -u bench.py
run bench_head8  python -u bench.py --head_bits 8
run parity_evict python -u scripts/parity_fused_evict.py
run bench_evict  env CCT_FUSED_EVICT=1 python -u bench.py
run bench_pf4    env CCT_PREFILL_W4A8=1 python -u bench.py

# 2. Quantized KV cache + hybrid/FastGen on hardware (VERDICT items 3, 6).
run bench_kv8    python -u bench.py --cache_bits 8
run bench_kv4    python -u bench.py --cache_bits 4
run bench_hybrid python -u bench.py --strategy hybrid

# 3. Scaling curves the r2+r3c batches never reached (VERDICT item 8).
run bench_full   python -u bench.py --strategy full
run bench_b2     python -u bench.py --batch 2
run bench_b4     python -u bench.py --batch 4
run bench_b8     python -u bench.py --batch 8
run bench_4k     python -u bench.py --context 4096
run bench_16k    python -u bench.py --context 16384
run bench_16kf   python -u bench.py --context 16384 --strategy full

# 4. Decomposition probes (p9_mega's vmem-limit fix landed after batch B).
run p9_mega      python -u scripts/perf_probe9.py --variant mega
run p10_all      python -u scripts/perf_probe10.py

# 5. 8B-scale eval through the real harness (VERDICT item 5) — rerun with
#    the prompt-compression flag the heavy_hitter strategy requires.
LEG_TIMEOUT=5400 run eval_8b python -u eval.py \
  --random_weights Meta-Llama-3-8B-Instruct --random_quantize int4 \
  --tasks rulerniah rulerqa localtext --num_samples 2 \
  --cache_strategy heavy_hitter --max_cache_length 0.25 \
  --prompt_compression_strategy heavy_hitter \
  --out_dir results/eval_8b_tpu --overwrite

echo "=== BATCH E DONE $(date -u +%FT%TZ)" | tee -a "$SUM"
cp "$SUM" /root/repo/results/tpu_batch_r3/ 2>/dev/null
