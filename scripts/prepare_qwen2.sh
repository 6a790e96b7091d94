#!/bin/bash
# Fetch + convert Qwen/Qwen2-1.5B-Instruct (override with HF=<org/repo>).
# (reference: scripts/prepare_qwen2.sh)
set -euo pipefail

: "${HF:=Qwen/Qwen2-1.5B-Instruct}"
bash scripts/prepare.sh "$HF"
