#!/usr/bin/env python
"""Hyper-parameter sweep driver: re-run eval.py's main over a grid
(reference: eval_multi.py:31-75)."""

import argparse

from cold_compress_tpu.utils.cli import (
    add_cache_arguments,
    add_generation_arguments,
    merge_cache_config,
)
from eval import add_eval_args, main as eval_main, setup

HPARAMS = {
    "max_cache_length": [[8192], [4096], [2048], [1024], [512], [256], [128]],
    "min_recovery_frac": [0.5, 0.6, 0.7, 0.8, 0.9, 0.95],
}

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Sweep a hyper-parameter for a KV-cache compression "
        "algorithm."
    )
    parser.add_argument(
        "--hparam",
        default="max_cache_length",
        help="The hyper-parameter to sweep.",
    )
    add_eval_args(parser)
    add_generation_arguments(parser)
    add_cache_arguments(parser)
    args = merge_cache_config(parser.parse_args())

    assert args.hparam in HPARAMS, (
        f"Set {args.hparam} in the HPARAMS dictionary first."
    )
    if args.tasks == ["all"]:
        from cold_compress_tpu.evals.task import TASK_MAPPING

        args.tasks = list(TASK_MAPPING.keys())

    for v in HPARAMS[args.hparam]:
        exp_args = argparse.Namespace(**vars(args))
        print(f"Setting {args.hparam} to {v}")
        setattr(exp_args, args.hparam, v)
        out_dir = setup(exp_args)
        eval_main(exp_args, out_dir)
