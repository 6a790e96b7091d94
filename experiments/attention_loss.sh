#!/bin/bash
# Attention-loss analysis: debug heavy_hitter vs the full-cache oracle on PG19
# at budgets 0.25 / 0.5 / 0.75 (reference: experiments/attention_loss.sh).
set -e
CKPT=${1:-checkpoints/meta-llama/Meta-Llama-3-8B-Instruct/model.npz}
for frac in 0.25 0.5 0.75; do
  python eval.py --checkpoint_path "$CKPT" \
    --tasks pg19 --seq_length 8192 --num_samples 50 \
    --cache_strategy debug_heavy_hitter \
    --prompt_compression_strategy heavy_hitter \
    --max_cache_length $frac --global_tokens 4 --recent_window 10
done
python charts/attention_loss.py --task pg19
