#!/usr/bin/env python
"""Weight-quantization CLI: rewrite a checkpoint as int8 / int4 / int4-gptq.

Reference-parity driver (reference: quantize.py:656-741): reads model.npz,
writes model_int8.npz or model_int4.g<groupsize>.npz next to it. The GPTQ
mode runs Hessian-based calibration (cold_compress_tpu/quantization/gptq.py)
— functional here, unlike the reference where the GPTQ import chain is broken
(SURVEY.md §2 row 10).
"""

import argparse
import time
from pathlib import Path

import jax

from cold_compress_tpu.quantization.weight_quant import quantize_params
from cold_compress_tpu.runtime.engine import load_model, save_params


def quantize(
    checkpoint_path: Path,
    mode: str = "int8",
    groupsize: int = 128,
    calibration_tasks=None,
    calibration_limit: int = 10,
    calibration_seq_length: int = 512,
    model_name=None,
    head_bits: int | None = None,
) -> None:
    # Default the vocab head to the body's bit width — the reference int4
    # path quantizes ALL Linears including the head (reference
    # quantize.py:437-455), and bench.py's headline config is an int4 head.
    if head_bits is None:
        head_bits = 4 if mode.startswith("int4") else 8
    t0 = time.time()
    cfg, params, rope = load_model(checkpoint_path, model_name=model_name)
    print(f"Loaded model in {time.time() - t0:.02f}s")

    dir_name = checkpoint_path.parent
    base_name = checkpoint_path.stem

    if mode == "int8":
        print(
            "Quantizing model weights for int8 weight-only symmetric "
            "per-channel quantization"
        )
        quantized = quantize_params(
            params, mode="int8", output_mode=f"int{head_bits}"
        )
        new_path = dir_name / f"{base_name}_int8.npz"
    elif mode == "int4":
        print(
            f"Quantizing model weights for int4 weight-only affine "
            f"per-channel groupwise quantization (groupsize={groupsize})"
        )
        quantized = quantize_params(
            params, mode="int4", group_size=groupsize,
            output_mode=f"int{head_bits}",
        )
        new_path = dir_name / f"{base_name}_int4.g{groupsize}.npz"
    elif mode == "int4-gptq":
        from cold_compress_tpu.quantization.gptq import gptq_quantize_params

        print(
            f"Quantizing model weights for int4 using GPTQ calibration "
            f"(groupsize={groupsize})"
        )
        quantized = gptq_quantize_params(
            cfg,
            params,
            rope,
            group_size=groupsize,
            n_samples=calibration_limit,
            seq_length=calibration_seq_length,
        )
        new_path = dir_name / f"{base_name}_int4-gptq.g{groupsize}.npz"
    else:
        raise ValueError(
            f"Invalid quantization mode {mode} "
            "(needs to be one of int8, int4, int4-gptq)"
        )

    print(f"Writing quantized weights to {new_path}")
    save_params(quantized, str(new_path))
    print(f"Quantization complete took {time.time() - t0:.02f} seconds")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Quantize a model checkpoint.")
    parser.add_argument(
        "--checkpoint_path",
        type=Path,
        default=Path("checkpoints/meta-llama/Meta-Llama-3-8B-Instruct/model.npz"),
    )
    parser.add_argument("--model_name", type=str, default=None)
    parser.add_argument(
        "--mode",
        "-q",
        type=str,
        default="int8",
        choices=["int8", "int4", "int4-gptq"],
    )
    parser.add_argument("--groupsize", type=int, default=128)
    parser.add_argument(
        "--head_bits", type=int, default=None, choices=[8, 4],
        help="Vocab-head weight bits. Default matches --mode (int4 modes "
        "quantize the head to 4 bits like the reference; int8 keeps an "
        "int8 head). 4 halves the decode head byte stream via the tiled "
        "colpack kernel.",
    )
    parser.add_argument("--calibration_limit", type=int, default=10)
    parser.add_argument("--calibration_seq_length", type=int, default=512)
    parser.add_argument(
        "--device",
        type=str,
        default="cpu",
        help="Quantization is host-side work; default cpu leaves the TPU free.",
    )
    args = parser.parse_args()
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    quantize(
        args.checkpoint_path,
        args.mode,
        args.groupsize,
        calibration_limit=args.calibration_limit,
        calibration_seq_length=args.calibration_seq_length,
        model_name=args.model_name,
        head_bits=args.head_bits,
    )
