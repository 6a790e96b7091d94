#!/bin/bash
# Fetch + convert any HF model: ./scripts/prepare.sh <org/repo>
# (reference: scripts/prepare.sh)
set -euo pipefail

REPO_ID="$1"
python scripts/download.py --repo_id "$REPO_ID"
python scripts/convert_hf_checkpoint.py --checkpoint_dir "checkpoints/$REPO_ID"
