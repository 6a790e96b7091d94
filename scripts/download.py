#!/usr/bin/env python
"""Download a HuggingFace model snapshot into checkpoints/<repo_id>
(reference: scripts/download.py:12-37)."""

import argparse
import os
from pathlib import Path


def hf_download(repo_id: str, hf_token=None, ignore_safetensors=False):
    from huggingface_hub import snapshot_download

    local_dir = Path("checkpoints") / repo_id
    os.makedirs(local_dir, exist_ok=True)
    ignore = ["*.safetensors"] if ignore_safetensors else []
    snapshot_download(
        repo_id,
        local_dir=local_dir,
        local_dir_use_symlinks=False,
        token=hf_token,
        ignore_patterns=ignore,
    )
    return local_dir


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Download HF model snapshot.")
    parser.add_argument(
        "--repo_id", type=str, default="meta-llama/Meta-Llama-3-8B-Instruct"
    )
    parser.add_argument(
        "--hf_token", type=str, default=os.environ.get("HF_TOKEN")
    )
    parser.add_argument("--ignore_safetensors", action="store_true")
    args = parser.parse_args()
    hf_download(args.repo_id, args.hf_token, args.ignore_safetensors)
