"""TPU parity check: fused heavy-hitter eviction kernel vs the XLA path.

Generates the same sequence twice in subprocesses (CCT_FUSED_EVICT=1 / 0)
on a small-but-realistic config and asserts identical tokens. The fused
kernel changes no math — any divergence is a Mosaic lowering bug.

Run on TPU: python scripts/parity_fused_evict.py
"""

import os
import subprocess
import sys

CHILD = """
import sys
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from cold_compress_tpu.utils.jax_setup import setup_jax
setup_jax()
from cold_compress_tpu.caches import CacheSpec
from cold_compress_tpu.models import transformer as T
from cold_compress_tpu.models.config import ModelConfig
from cold_compress_tpu.quantization.weight_quant import random_quantized_params
from cold_compress_tpu.runtime.generate import generate

cfg = ModelConfig.from_name("Meta-Llama-3-8B-Instruct").replace(
    n_layer=2, block_size=2048, max_length=2048
)
params = random_quantized_params(cfg, mode="int4")
params["layers"] = params["layers"][: cfg.n_layer]
rope = T.make_rope_table(cfg)
C = 512
specs = tuple(
    CacheSpec(cache_strategy="heavy_hitter", max_cache_length=C,
              max_seq_length=2048, global_tokens=4, recent_window=10,
              prompt_compression_strategy="heavy_hitter")
    for _ in range(cfg.n_layer)
)
caches = T.init_caches(cfg, specs, 1, jnp.bfloat16)
if T.is_stacked(caches):
    params = T.fuse_layer_params(T.stack_layer_params(params))
    if jax.default_backend() == "tpu":
        params = T.colpack_layer_params(params)
        params = T.tile_output_head(params)
rng = np.random.RandomState(0)
prompt = rng.randint(5, cfg.vocab_size - 5, size=1000).tolist()
seq, _, _ = generate(cfg, params, rope, caches, prompt, 48,
                     prefill_bucket=1024)
print("TOKENS:" + ",".join(map(str, seq[-48:])), flush=True)
"""


def run(fused: str) -> str:
    env = dict(os.environ, CCT_FUSED_EVICT=fused)
    r = subprocess.run(
        [sys.executable, "-u", "-c", CHILD], env=env,
        capture_output=True, text=True, timeout=2100,
    )
    for line in r.stdout.splitlines():
        if line.startswith("TOKENS:"):
            return line
    print(r.stdout[-2000:], file=sys.stderr)
    print(r.stderr[-2000:], file=sys.stderr)
    raise SystemExit(f"child (fused={fused}) produced no tokens")


def main():
    a = run("1")
    b = run("0")
    assert a == b, f"fused evict diverged:\n  fused: {a}\n  xla:   {b}"
    print("PARITY OK —", a[:80], "...")


if __name__ == "__main__":
    main()
