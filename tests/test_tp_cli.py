"""CLI-level tensor parallelism: `generate.py --tp N` on the virtual CPU
mesh must produce the same generation as --tp 1 (reference run mode:
generate.py:79-86, tp.py:171-176), and the stacked (scan-over-layers)
param/cache layouts must shard correctly."""

import os
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def run_cli(extra):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.pop("JAX_PLATFORMS", None)  # never force cpu via env (axon wedge)
    cmd = [
        sys.executable,
        str(REPO / "generate.py"),
        "--device", "cpu",
        "--random_weights", "TestTiny",
        "--prompt", "tell me a story",
        "--max_new_tokens", "12",
        "--cache_strategy", "recent_global",
        "--max_cache_length", "0.5",
        "--global_tokens", "2",
    ] + extra
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, timeout=600, env=env
    )
    assert out.returncode == 0, out.stderr[-2000:]
    gen = out.stdout.split("GENERATION:")[1].split("==========")[0].strip()
    return gen


def test_tp_cli_matches_single_device():
    base = run_cli(["--tp", "1"])
    tp2 = run_cli(["--tp", "2"])
    assert base == tp2


def test_tp_kernels_cli_matches_single_device():
    """--tp_kernels runs the explicit shard_map path (per-device repacks +
    Pallas-capable kernels, parallel/tp_decode.py); generation must match
    the single-device run."""
    base = run_cli(["--tp", "1"])
    tp2 = run_cli(["--tp", "2", "--tp_kernels"])
    assert base == tp2


def test_sp_cli_matches_single_device():
    """--sp 4 shards the prefill query blocks; generation must match the
    single-device run (same greedy tokens)."""
    base = run_cli(["--sp", "1"])
    sp4 = run_cli(["--sp", "4"])
    assert base == sp4


def test_stacked_param_and_cache_sharding():
    """Stacked (scan) layouts get layer-axis-prefixed specs and shard
    end-to-end numerically identically to unsharded execution."""
    from cold_compress_tpu.caches import CacheSpec
    from cold_compress_tpu.models import transformer as T
    from cold_compress_tpu.models.config import ModelConfig
    from cold_compress_tpu.parallel.mesh import (
        cache_pspecs,
        param_pspecs,
        shard_model,
    )
    from cold_compress_tpu.runtime.generate import generate
    from jax.sharding import PartitionSpec as P

    cfg = ModelConfig.from_name("TestTiny").replace(
        n_head=8, n_kv_head=4, dim=128, intermediate_size=256
    )
    params = T.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    specs = tuple(
        CacheSpec(
            cache_strategy="recent_global",
            max_cache_length=24,
            max_seq_length=64,
            global_tokens=2,
            recent_window=4,
            prompt_compression_strategy="recent_global",
        )
        for _ in range(cfg.n_layer)
    )
    caches = T.init_caches(cfg, specs, 1, jnp.float32)
    assert T.is_stacked(caches)
    stacked = T.stack_layer_params(params)

    pspecs = param_pspecs(cfg, stacked)
    assert pspecs["layers"]["attn"]["wq"] == P(None, None, "tp")
    assert pspecs["layers"]["ffn"]["w2"] == P(None, "tp", None)
    cspecs = cache_pspecs(caches)
    assert cspecs.k == P(None, "dp", "tp", None, None)
    assert cspecs.pos == P(None, "dp", "tp", None)

    rope = T.make_rope_table(cfg)
    prompt = list(range(5, 40))
    ref_seq, _, _ = generate(
        cfg, stacked, rope, caches, prompt, 8, prefill_bucket=64
    )

    caches2 = T.init_caches(cfg, specs, 1, jnp.float32)
    mesh, sp, sc = shard_model(cfg, stacked, caches2, tp=4, dp=1)
    with mesh:
        got_seq, _, _ = generate(
            cfg, sp, rope, sc, prompt, 8, prefill_bucket=64
        )
    assert got_seq == ref_seq


def test_pp_cli_matches_single_device():
    """--pp 2 pipelines the prefill over layer stages; generation must
    match the single-device run."""
    base = run_cli([])
    pp2 = run_cli(["--pp", "2"])
    assert base == pp2
