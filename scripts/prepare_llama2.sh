#!/bin/bash
# Fetch + convert meta-llama/Llama-2-7b-chat-hf (override with HF=<org/repo>).
# (reference: scripts/prepare_llama2.sh)
set -euo pipefail

: "${HF:=meta-llama/Llama-2-7b-chat-hf}"
bash scripts/prepare.sh "$HF"
