#!/bin/bash
# Round-5 TPU batch C — eval_8b at meaningful breadth (VERDICT r4 #5):
# 3 arms (full / heavy_hitter@0.25 / hybrid) x 5 tasks (rulerniah,
# rulerqa, rulervt, rulercwe, localtext) x 25 samples, 8B int4, random
# weights (air-gapped: accuracy columns are vacuous by construction and
# documented so in QUALITY.md; the perf and ppl-sanity columns are real).
# Reference sweep shape: experiments/eval_all.sh:8-24.
# Metrics are committed inside each leg (repo memory: workspace resets
# lose results; results/ is gitignored -> git add -f).
set -u
OUT=/root/repo/results/tpu_batch_r5
mkdir -p "$OUT"
cd /root/repo
SUM=$OUT/summary_c.log

ping_tpu() {
  timeout 420 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.full((256, 256), 2.0, jnp.bfloat16)
assert float(np.asarray(x @ x).sum()) > 0
print('ping ok')
" > "$OUT/ping.log" 2>&1
}

commit_results() {
  git add -f "$OUT" results/Meta-Llama-3-8B-Instruct 2>/dev/null
  git commit -q -m "$1" 2>/dev/null || true
}

run() {
  name=$1; shift
  if [ -f "$OUT/$name.log" ] && grep -q 'ALL_TASKS_DONE\|"metric"\|RESULT_OK' "$OUT/$name.log"; then
    echo "=== $name: already done, skipping" | tee -a "$SUM"
    return
  fi
  echo "=== $name: $*" | tee -a "$SUM"
  timeout "${LEG_TIMEOUT:-7200}" "$@" > "$OUT/$name.log" 2>&1
  rc=$?
  tail -8 "$OUT/$name.log" | grep -v WARNING | tee -a "$SUM"
  echo "--- rc=$rc" | tee -a "$SUM"
  commit_results "r5 batch C: $name leg artifacts"
  ok=""
  for attempt in 1 2 3 4 5 6; do
    if ping_tpu; then ok=1; break; fi
    echo "    ping $attempt failed after $name; retrying" | tee -a "$SUM"
    sleep 120
  done
  if [ -z "$ok" ]; then
    echo "!!! tunnel wedged after $name — aborting batch" | tee -a "$SUM"
    commit_results "r5 batch C: aborted after $name (tunnel wedged)"
    exit 1
  fi
}

echo "=== BATCH R5C start $(date -u +%FT%TZ)" | tee -a "$SUM"

TASKS="rulerniah rulerqa rulervt rulercwe localtext"
COMMON="--random_weights Meta-Llama-3-8B-Instruct --random_quantize int4 --num_samples 25"

# NOTE: no --overwrite. Per-task metrics are resume-safe (a completed
# {task}_metrics.json is skipped on re-run) so a wedge mid-arm costs only
# the in-flight task, and finished metrics can never be wiped by a re-run
# (the r4 q128 metrics were lost exactly that way).
# eval.py nests: results/<model>/<strategy>/<out_dir>.
run eval8b_hh python -u eval.py $COMMON --tasks $TASKS \
  --cache_strategy heavy_hitter --max_cache_length 0.25 \
  --prompt_compression_strategy heavy_hitter \
  --out_dir eval_8b_r5

run eval8b_full python -u eval.py $COMMON --tasks $TASKS \
  --cache_strategy full \
  --out_dir eval_8b_r5

run eval8b_hybrid python -u eval.py $COMMON --tasks $TASKS \
  --cache_config fastgen \
  --out_dir eval_8b_r5

echo "=== BATCH R5C DONE $(date -u +%FT%TZ)" | tee -a "$SUM"
commit_results "r5 batch C: eval_8b 3-arm x 5-task x n=25 metrics complete"
