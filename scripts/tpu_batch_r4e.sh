#!/bin/bash
# Round-4 TPU batch E: 32k full-cache attention levers. The 32k full leg
# measured 22.95 tok/s with the chunked kernel streaming ~116 GB/s
# effective vs a ~600 GB/s roof (PERF.md); the reference's compiled full
# @32k-equivalent is 30.03 (blogpost_perf.py). Levers, cheapest win first:
#   - kv8 (+i8dot): halves the streamed bytes on a path already measured
#     ppl-lossless on trained weights — the serving-default answer even if
#     the kernel never reaches its DMA roof.
#   - CCT_ATTN_STREAMS / CCT_ATTN_CHUNK: the same overlap levers batch D
#     A/Bs at 16k, applied at 32k.
#   - CCT_ATTN_OS_BUDGET_MB=0 forces chunked even at 8k (diagnostic: the
#     per-chunk overhead at a context where the one-shot number (98) and
#     roofline are both known pins the chunk-path fixed cost).
set -u
OUT=/root/repo/results/tpu_batch_r4
mkdir -p "$OUT"
cd /root/repo
SUM=$OUT/summary_e.log

ping_tpu() {
  timeout 420 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.full((256, 256), 2.0, jnp.bfloat16)
assert float(np.asarray(x @ x).sum()) > 0
print('ping ok')
" > "$OUT/ping.log" 2>&1
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
  tail -5 "$OUT/$name.log" | grep -v WARNING | tee -a "$SUM"
  echo "--- rc=$rc" | tee -a "$SUM"
  ok=""
  for attempt in 1 2 3 4 5 6; do
    if ping_tpu; then ok=1; break; fi
    echo "    ping $attempt failed after $name; retrying" | tee -a "$SUM"
    sleep 120
  done
  if [ -z "$ok" ]; then
    echo "!!! tunnel wedged after $name — aborting batch" | tee -a "$SUM"
    exit 1
  fi
}

echo "=== BATCH R4E start $(date -u +%FT%TZ)" | tee -a "$SUM"

# 1. Serving answer: int8 KV on the full cache at 32k (i8dot defaults on
#    for bits=8). Bytes halve; target >= 30.03 (reference full @32k).
run bench32kf_kv8 python -u bench.py --model Meta-Llama-3.1-8B-Instruct --context 32768 --strategy full --cache_bits 8

# 1b. Plain kv8 control at 16k: batch D's lever legs run under the new
#     kv8 default, so this pins the no-lever kv8 number they compare to.
run bench16kf_kv8 python -u bench.py --model Meta-Llama-3.1-8B-Instruct --context 16384 --strategy full --cache_bits 8

# 1c. Manual double-buffered kernel (CCT_ATTN_MANUAL, commit 4011c5c) at
#     the 32k target — pulled forward from batch F (same leg names; F
#     skips them if already done).
run bench32kf_man env CCT_ATTN_MANUAL=1 python -u bench.py --model Meta-Llama-3.1-8B-Instruct --context 32768 --strategy full --cache_bits 16
run bench32kf_man_kv8 env CCT_ATTN_MANUAL=1 python -u bench.py --model Meta-Llama-3.1-8B-Instruct --context 32768 --strategy full --cache_bits 8

# 2. Overlap levers at 32k (apply whichever 16k A/B wins too).
# (--cache_bits 16 so the A/B is against batch B's bf16 22.95, not the
#  new kv8 default.)
run bench32kf_s2 env CCT_ATTN_STREAMS=2 python -u bench.py --model Meta-Llama-3.1-8B-Instruct --context 32768 --strategy full --cache_bits 16
run bench32kf_c4 env CCT_ATTN_CHUNK=4096 python -u bench.py --model Meta-Llama-3.1-8B-Instruct --context 32768 --strategy full --cache_bits 16

# 3. Diagnostic: force chunked at 8k where one-shot measured 98.0 — the
#    delta prices the chunk-path overhead with everything else equal.
run bench8k_forcechunk env CCT_ATTN_OS_BUDGET_MB=0 python -u bench.py --cache_bits 16

# 4. Re-run the TinyByteLM128 kernel-path quality A/B (batch C ran it but
#    the metrics files were lost with that workspace — only the tok/s
#    logs were committed). Cheap legs; metrics land in
#    results/quality_kv128/ and get committed this time.
Q128="tests/fixtures/TinyByteLM128-hf/model.npz"
QOUT=/root/repo/results/quality_kv128
qeval() { # qeval <name> <cache_bits|-> [VAR=val ...]
  name=$1; bits=$2; shift 2
  extra=()
  [ "$bits" != "-" ] && extra=(--cache_bits "$bits")
  run "$name" env CCT_ATTN_DEBUG=1 "$@" python -u eval.py \
    --checkpoint_path "$Q128" --model_name TinyByteLM128 \
    --tasks localtext --num_samples 8 --seq_length 512 \
    --out_dir "$QOUT/$name" --overwrite "${extra[@]}"
}
qeval q128_bf16b  -
qeval q128_kv8b   8
qeval q128_kv8i8b 8 CCT_ATTN_I8DOT=1
qeval q128_kv4b   4
qeval q128_kv4i8b 4 CCT_ATTN_I8DOT=1

echo "=== BATCH R4E DONE $(date -u +%FT%TZ)" | tee -a "$SUM"
