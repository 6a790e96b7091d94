#!/bin/bash
# Fetch + convert meta-llama/Meta-Llama-3-8B-Instruct (override with HF=<org/repo>).
# (reference: scripts/prepare_llama3.sh)
set -euo pipefail

: "${HF:=meta-llama/Meta-Llama-3-8B-Instruct}"
bash scripts/prepare.sh "$HF"
