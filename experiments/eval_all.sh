#!/bin/bash
# Full eval sweep: strategies x tasks x cache budgets, fanned over device
# slots (reference: experiments/eval_all.sh).
set -e
CKPT=${1:-checkpoints/meta-llama/Meta-Llama-3-8B-Instruct/model.npz}
SLOTS=${2:-1}
python parallelize_evals.py \
  --cache_configs full recent_global heavy_hitter l2 \
  --tasks rulerqa rulerniah rulervt rulercwe musique qmsum squality \
          triviaqa truthfulqa scrollsquality dolomites \
  --cache_sizes 0.75 0.5 0.25 0.1 0.05 \
  --num_samples 500 \
  --checkpoint_path "$CKPT" \
  --num_slots "$SLOTS"
