#!/bin/bash
# Layerwise budget shapes: uniform tile vs pyramid vs funnel
# (reference: experiments/variable_compression.sh).
set -e
CKPT=${1:-checkpoints/meta-llama/Meta-Llama-3-8B-Instruct/model.npz}
for pattern in tile pyramid funnel; do
  python eval.py --checkpoint_path "$CKPT" \
    --tasks rulerqa --num_samples 100 \
    --cache_strategy heavy_hitter --prompt_compression_strategy heavy_hitter \
    --max_cache_length 0.25 --cache_length_pattern $pattern \
    --global_tokens 4 --recent_window 10
done
