#!/usr/bin/env python
"""Convert a HuggingFace checkpoint to the native npz format.

TPU-native counterpart of the reference converter (reference:
scripts/convert_hf_checkpoint.py:24-170). Differences driven by the engine
design: q/k/v stay separate (no wqkv fusion — see models/transformer.py) and
weights are transposed to [in, out] for direct x @ w matmuls; the RoPE
permutation from HF's half-split layout to the interleaved convention is the
same.

Handles: sharded .safetensors / .bin via *.index.json, single-file models,
Llama-3's original/consolidated.00.pth (already interleaved; tokenizer.model
copied alongside), tied-embedding lm_head fallback, Qwen2 attention biases.
"""

import argparse
import json
import re
import shutil
import sys
from pathlib import Path

import ml_dtypes
import numpy as np

sys.path.append(str(Path(__file__).parent.parent.resolve()))

from cold_compress_tpu.models.config import ModelConfig
from cold_compress_tpu.runtime.engine import save_params

HF_WEIGHT_MAP = {
    "model.embed_tokens.weight": "tok_embeddings",
    "model.layers.{}.self_attn.q_proj.weight": ("layers.{}.attn.wq", "w"),
    "model.layers.{}.self_attn.k_proj.weight": ("layers.{}.attn.wk", "w"),
    "model.layers.{}.self_attn.v_proj.weight": ("layers.{}.attn.wv", "w"),
    "model.layers.{}.self_attn.o_proj.weight": ("layers.{}.attn.wo", "w"),
    "model.layers.{}.self_attn.q_proj.bias": ("layers.{}.attn.bq", "b"),
    "model.layers.{}.self_attn.k_proj.bias": ("layers.{}.attn.bk", "b"),
    "model.layers.{}.self_attn.v_proj.bias": ("layers.{}.attn.bv", "b"),
    "model.layers.{}.self_attn.rotary_emb.inv_freq": None,
    "model.layers.{}.mlp.gate_proj.weight": ("layers.{}.ffn.w1", "w"),
    "model.layers.{}.mlp.up_proj.weight": ("layers.{}.ffn.w3", "w"),
    "model.layers.{}.mlp.down_proj.weight": ("layers.{}.ffn.w2", "w"),
    "model.layers.{}.input_layernorm.weight": "layers.{}.attention_norm",
    "model.layers.{}.post_attention_layernorm.weight": "layers.{}.ffn_norm",
    "model.norm.weight": "norm",
    "lm_head.weight": ("output", "w"),
}

# Meta "original" format (Llama-3 consolidated.pth) — already RoPE-interleaved.
META_WEIGHT_MAP = {
    "tok_embeddings.weight": "tok_embeddings",
    "layers.{}.attention.wq.weight": ("layers.{}.attn.wq", "w_nopermute"),
    "layers.{}.attention.wk.weight": ("layers.{}.attn.wk", "w_nopermute"),
    "layers.{}.attention.wv.weight": ("layers.{}.attn.wv", "w_nopermute"),
    "layers.{}.attention.wo.weight": ("layers.{}.attn.wo", "w_nopermute"),
    "layers.{}.feed_forward.w1.weight": ("layers.{}.ffn.w1", "w_nopermute"),
    "layers.{}.feed_forward.w3.weight": ("layers.{}.ffn.w3", "w_nopermute"),
    "layers.{}.feed_forward.w2.weight": ("layers.{}.ffn.w2", "w_nopermute"),
    "layers.{}.attention_norm.weight": "layers.{}.attention_norm",
    "layers.{}.ffn_norm.weight": "layers.{}.ffn_norm",
    "norm.weight": "norm",
    "output.weight": ("output", "w"),
    "rope.freqs": None,
}


def permute_rope(w: np.ndarray, n_head: int, head_dim: int) -> np.ndarray:
    """HF half-split RoPE layout -> interleaved pairs
    (reference: scripts/convert_hf_checkpoint.py:109-114)."""
    dim = w.shape[-1] if w.ndim == 2 else 1
    if w.ndim == 2:
        return (
            w.reshape(n_head, 2, head_dim // 2, dim)
            .transpose(0, 2, 1, 3)
            .reshape(n_head * head_dim, dim)
        )
    return (
        w.reshape(n_head, 2, head_dim // 2)
        .transpose(0, 2, 1)
        .reshape(n_head * head_dim)
    )


def _to_numpy(t):
    import torch

    if isinstance(t, torch.Tensor):
        return t.to(torch.float32).numpy()
    return np.asarray(t, np.float32)


def load_state_files(checkpoint_dir: Path):
    """Collect all weight files (index-sharded, single-file, or meta
    consolidated)."""
    original = checkpoint_dir / "original"
    meta_files = (
        sorted(
            f
            for f in original.iterdir()
            if re.match(r"^consolidated\.\d{2}\.pth$", f.name)
        )
        if original.is_dir()
        else []
    )
    if meta_files:
        if len(meta_files) > 1:
            raise ValueError(
                "Merging multiple consolidated.NN.pth shards is not supported."
            )
        return meta_files, META_WEIGHT_MAP

    index_files = list(checkpoint_dir.glob("*.index.json"))
    if index_files:
        with open(index_files[0]) as f:
            bin_index = json.load(f)
        files = sorted(
            {checkpoint_dir / b for b in bin_index["weight_map"].values()}
        )
    elif (checkpoint_dir / "pytorch_model.bin").exists():
        files = [checkpoint_dir / "pytorch_model.bin"]
    else:
        files = [checkpoint_dir / "model.safetensors"]
    return files, HF_WEIGHT_MAP


def convert_hf_checkpoint(checkpoint_dir: Path, model_name=None) -> Path:
    out_path = checkpoint_dir / "model.npz"
    if out_path.exists():
        print(f"Model already exists at {out_path}")
        return out_path

    model_name = model_name or checkpoint_dir.name
    cfg = ModelConfig.from_name(model_name)
    print(f"Model config: {cfg}")

    files, weight_map = load_state_files(checkpoint_dir)
    merged = {}
    for file in files:
        if str(file).endswith(".safetensors"):
            from safetensors.torch import load_file

            merged.update(load_file(str(file)))
        else:
            import torch

            merged.update(
                torch.load(
                    str(file), map_location="cpu", mmap=True, weights_only=True
                )
            )

    flat = {}
    for key, value in merged.items():
        # Only the layer index is abstracted — a bare \d+ substitution would
        # also hit the digits in meta-format names like feed_forward.w1.
        abstract = (
            re.sub(r"layers\.(\d+)\.", "layers.{}.", key)
            if "layers" in key
            else key
        )
        if abstract not in weight_map:
            print(f"  skipping unmapped key {key}")
            continue
        target = weight_map[abstract]
        if target is None:
            continue
        layer_num = re.search(r"\d+", key).group(0) if "layers" in key else None
        arr = _to_numpy(value)
        if isinstance(target, tuple):
            name, kind = target
            if kind in ("w", "w_nopermute") and "wq" in name and kind == "w":
                arr = permute_rope(arr, cfg.n_head, cfg.head_dim)
            elif kind == "w" and "wk" in name:
                arr = permute_rope(arr, cfg.n_kv_head, cfg.head_dim)
            elif kind == "b" and name.endswith("bq"):
                arr = permute_rope(arr, cfg.n_head, cfg.head_dim)
            elif kind == "b" and name.endswith("bk"):
                arr = permute_rope(arr, cfg.n_kv_head, cfg.head_dim)
            if kind in ("w", "w_nopermute"):
                arr = arr.T  # torch [out, in] -> ours [in, out]
            name = name.format(layer_num) if layer_num is not None else name
        else:
            name = (
                target.format(layer_num) if layer_num is not None else target
            )
        # Compact lossless storage: bf16 matches both the checkpoint source
        # dtype and load/compute precision. (float16 here would clip bf16
        # outliers >65504 to inf and flush subnormals — ADVICE r1.)
        flat[name] = arr.astype(ml_dtypes.bfloat16)

    # Tied-embedding fallback (reference: convert_hf_checkpoint.py:156-160).
    tied = "output" not in flat
    params = _nest(flat, cfg, tied)

    # Llama-3: copy the tiktoken model next to the checkpoint.
    original = checkpoint_dir / "original"
    if (original / "tokenizer.model").exists() and not (
        checkpoint_dir / "tokenizer.model"
    ).exists():
        shutil.copy(
            original / "tokenizer.model", checkpoint_dir / "tokenizer.model"
        )

    print(f"Saving checkpoint to {out_path}")
    save_params(params, str(out_path))
    return out_path


def _nest(flat, cfg: ModelConfig, tied: bool):
    layers = []
    for i in range(cfg.n_layer):
        attn = {
            k: flat[f"layers.{i}.attn.{k}"]
            for k in ("wq", "wk", "wv", "wo")
        }
        for b in ("bq", "bk", "bv"):
            if f"layers.{i}.attn.{b}" in flat:
                attn[b] = flat[f"layers.{i}.attn.{b}"]
        layers.append(
            {
                "attn": attn,
                "ffn": {
                    k: flat[f"layers.{i}.ffn.{k}"] for k in ("w1", "w2", "w3")
                },
                "attention_norm": flat[f"layers.{i}.attention_norm"],
                "ffn_norm": flat[f"layers.{i}.ffn_norm"],
            }
        )
    return {
        "tok_embeddings": flat["tok_embeddings"],
        "layers": layers,
        "norm": flat["norm"],
        "output": None if tied else flat["output"],
    }


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Convert a HuggingFace checkpoint to native npz."
    )
    parser.add_argument(
        "--checkpoint_dir",
        type=Path,
        default=Path("checkpoints/meta-llama/Meta-Llama-3-8B-Instruct"),
    )
    parser.add_argument("--model_name", type=str, default=None)
    args = parser.parse_args()
    convert_hf_checkpoint(args.checkpoint_dir, args.model_name)
