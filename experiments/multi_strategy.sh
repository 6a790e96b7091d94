#!/bin/bash
# Alternate local (sliding window) and global (heavy hitter) layers
# (reference: experiments/multi_strategy.sh).
set -e
CKPT=${1:-checkpoints/meta-llama/Meta-Llama-3-8B-Instruct/model.npz}
python eval.py --checkpoint_path "$CKPT" \
  --tasks rulerniah --num_samples 100 \
  --cache_config local_global --max_cache_length 0.25
