#!/usr/bin/env python
"""Train the TinyByteLM fixture and export it as a HuggingFace checkpoint.

The environment has no network access, so the repo cannot download a trained
checkpoint to validate the accuracy-bearing pipeline (convert -> quantize ->
eval) with non-random weights. This script closes that gap offline: it trains
a ~5M-param byte-level Llama-architecture LM on locally available text
(Python stdlib sources + license texts), then

  1. saves the native npz checkpoint (``runtime/engine.save_params``),
  2. exports a genuine HF-format checkpoint (config.json + model.safetensors
     with HF weight names, [out, in] orientation, and the half-split RoPE
     layout) under tests/fixtures/,
  3. round-trips that export through scripts/convert_hf_checkpoint.py and
     asserts logits parity — so the committed fixture exercises the same
     converter path a real Llama/Qwen checkpoint does (reference:
     scripts/convert_hf_checkpoint.py:82-170).

Train on TPU when available (seconds); CPU works but takes ~1-2 h at the
default 3000 steps.

Usage:  python scripts/train_tiny.py [--steps 3000] [--out tests/fixtures]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent.resolve()))

from cold_compress_tpu.models import transformer as T
from cold_compress_tpu.models.config import ModelConfig

SEQ = 1024
BATCH = 32


# --------------------------------------------------------------------------
# Corpus: deterministic train/held-out split over local text files
# --------------------------------------------------------------------------


def load_corpus(max_mb: float = 24.0):
    """Train/held-out byte streams from the shared deterministic split
    (cold_compress_tpu/utils/local_corpus.py — the held-out bucket feeds the
    Local* eval tasks and never enters training)."""
    from cold_compress_tpu.utils.local_corpus import load_split

    train_parts, val_parts = load_split(max_mb)
    train = np.frombuffer(b"\n\n".join(train_parts), np.uint8)
    val = np.frombuffer(b"\n\n".join(val_parts), np.uint8)
    return train, val


# --------------------------------------------------------------------------
# Training-mode forward (all-position logits; no KV caches)
# --------------------------------------------------------------------------


def lm_logits(cfg: ModelConfig, params, rope, tokens):
    """[B, L] int32 -> [B, L, vocab] f32 logits, plain causal attention."""
    B, L = tokens.shape
    x = T._embed(params, tokens)
    freqs = rope[:L]
    causal = jnp.tril(jnp.ones((L, L), bool))
    scale = 1.0 / np.sqrt(cfg.head_dim)

    def layer(x, lp):
        h = T.rms_norm(x, lp["attention_norm"], cfg.norm_eps)
        q, k, v = T._qkv(cfg, lp["attn"], h, freqs)  # [B,H,L,hd]/[B,KVH,..]
        rep = cfg.n_head // cfg.n_kv_head
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
        s = jnp.where(causal[None, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        y = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        y = y.transpose(0, 2, 1, 3).reshape(B, L, cfg.n_head * cfg.head_dim)
        x = x + y @ lp["attn"]["wo"]
        h = T.rms_norm(x, lp["ffn_norm"], cfg.norm_eps)
        f = lp["ffn"]
        x = x + (jax.nn.silu(h @ f["w1"]) * (h @ f["w3"])) @ f["w2"]
        return x, None

    stacked = T.stack_layer_params(params)["layers"]
    x, _ = jax.lax.scan(
        lambda c, lp: layer(c, lp), x, stacked
    )
    return T._logits(cfg, params, x)


def loss_fn(cfg, params, rope, tokens):
    logits = lm_logits(cfg, params, rope, tokens)  # [B, L, V]
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return nll.mean()


# --------------------------------------------------------------------------
# HF export (inverse of scripts/convert_hf_checkpoint.py)
# --------------------------------------------------------------------------


def unpermute_rope(w: np.ndarray, n_head: int, head_dim: int) -> np.ndarray:
    """Interleaved RoPE pairs -> HF half-split layout ([out, in] weight)."""
    dim = w.shape[-1]
    return (
        w.reshape(n_head, head_dim // 2, 2, dim)
        .transpose(0, 2, 1, 3)
        .reshape(n_head * head_dim, dim)
    )


def export_hf(cfg: ModelConfig, params, out_dir: Path):
    import ml_dtypes
    import torch
    from safetensors.torch import save_file

    out_dir.mkdir(parents=True, exist_ok=True)

    def t(a):  # native [in, out] f32 -> HF [out, in] bf16 torch tensor
        a = np.asarray(a, np.float32).T.copy()
        return torch.from_numpy(a).to(torch.bfloat16)

    sd = {"model.embed_tokens.weight": torch.from_numpy(
        np.asarray(params["tok_embeddings"], np.float32)
    ).to(torch.bfloat16)}
    for i, lp in enumerate(params["layers"]):
        pre = f"model.layers.{i}."
        wq = np.asarray(lp["attn"]["wq"], np.float32).T
        wk = np.asarray(lp["attn"]["wk"], np.float32).T
        sd[pre + "self_attn.q_proj.weight"] = torch.from_numpy(
            unpermute_rope(wq, cfg.n_head, cfg.head_dim)
        ).to(torch.bfloat16)
        sd[pre + "self_attn.k_proj.weight"] = torch.from_numpy(
            unpermute_rope(wk, cfg.n_kv_head, cfg.head_dim)
        ).to(torch.bfloat16)
        sd[pre + "self_attn.v_proj.weight"] = t(lp["attn"]["wv"])
        sd[pre + "self_attn.o_proj.weight"] = t(lp["attn"]["wo"])
        sd[pre + "mlp.gate_proj.weight"] = t(lp["ffn"]["w1"])
        sd[pre + "mlp.up_proj.weight"] = t(lp["ffn"]["w3"])
        sd[pre + "mlp.down_proj.weight"] = t(lp["ffn"]["w2"])
        sd[pre + "input_layernorm.weight"] = torch.from_numpy(
            np.asarray(lp["attention_norm"], np.float32)
        ).to(torch.bfloat16)
        sd[pre + "post_attention_layernorm.weight"] = torch.from_numpy(
            np.asarray(lp["ffn_norm"], np.float32)
        ).to(torch.bfloat16)
    sd["model.norm.weight"] = torch.from_numpy(
        np.asarray(params["norm"], np.float32)
    ).to(torch.bfloat16)
    sd["lm_head.weight"] = t(params["output"])
    save_file(sd, str(out_dir / "model.safetensors"))

    hf_cfg = {
        "architectures": ["LlamaForCausalLM"],
        "hidden_size": cfg.dim,
        "intermediate_size": cfg.intermediate_size,
        "num_attention_heads": cfg.n_head,
        "num_key_value_heads": cfg.n_kv_head,
        "num_hidden_layers": cfg.n_layer,
        "vocab_size": cfg.vocab_size,
        "max_position_embeddings": cfg.block_size,
        "rope_theta": cfg.rope_base,
        "rms_norm_eps": cfg.norm_eps,
        "torch_dtype": "bfloat16",
        "model_type": "llama",
        "tie_word_embeddings": False,
    }
    (out_dir / "config.json").write_text(json.dumps(hf_cfg, indent=2))
    print(f"HF export: {out_dir} "
          f"({sum(v.numel() for v in sd.values())/1e6:.2f}M params)")


# --------------------------------------------------------------------------


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--out", type=Path, default=Path("tests/fixtures"))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--model", default="TinyByteLM",
        help="Registry config to train (e.g. TinyByteLM128, the "
        "head_dim-128 variant whose shapes route through the Pallas "
        "decode-attention kernels).",
    )
    ap.add_argument(
        "--device", default="auto", choices=["auto", "cpu", "tpu"],
        help="cpu forces the host backend in-process (JAX_PLATFORMS is "
        "ignored once the axon plugin registers; see tests/conftest.py).",
    )
    args = ap.parse_args()
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import optax

    cfg = ModelConfig.from_name(args.model)
    print(f"backend: {jax.default_backend()}  cfg: {cfg.name} "
          f"L={cfg.n_layer} D={cfg.dim}")
    train, val = load_corpus()
    print(f"corpus: train {train.size/1e6:.1f} MB, held-out "
          f"{val.size/1e6:.1f} MB")

    params = T.init_params(cfg, jax.random.PRNGKey(args.seed), jnp.float32)
    rope = T.make_rope_table(cfg).astype(jnp.float32)

    warmup = min(100, max(1, args.steps // 4))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup, args.steps, args.lr * 0.1
    )
    opt = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adamw(sched, weight_decay=0.01)
    )
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(cfg, p, rope, tokens)
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def batch(rng):
        idx = rng.integers(0, train.size - SEQ - 1, BATCH)
        return jnp.asarray(
            np.stack([train[i : i + SEQ] for i in idx]).astype(np.int32)
        )

    @jax.jit
    def val_loss(params, tokens):
        return loss_fn(cfg, params, rope, tokens)

    rng = np.random.default_rng(args.seed)
    vrng = np.random.default_rng(12345)
    vidx = vrng.integers(0, val.size - SEQ - 1, BATCH)
    vtokens = jnp.asarray(
        np.stack([val[i : i + SEQ] for i in vidx]).astype(np.int32)
    )

    t0 = time.time()
    for s in range(args.steps):
        params, opt_state, loss = step(params, opt_state, batch(rng))
        if s % 200 == 0 or s == args.steps - 1:
            vl = float(val_loss(params, vtokens))
            print(
                f"step {s:5d}  train {float(loss):.4f}  "
                f"val {vl:.4f} ({vl/np.log(2):.3f} bits/byte)  "
                f"{time.time()-t0:.0f}s",
                flush=True,
            )

    # ---- save native + HF export -------------------------------------
    from cold_compress_tpu.runtime.engine import save_params

    import ml_dtypes

    params_np = jax.tree.map(
        lambda a: np.asarray(a, np.float32), params
    )
    hf_dir = args.out / f"{args.model}-hf"
    export_hf(cfg, params_np, hf_dir)

    # Round-trip through the real converter and check logits parity.
    from scripts.convert_hf_checkpoint import convert_hf_checkpoint

    npz = convert_hf_checkpoint(hf_dir, model_name=args.model)
    from cold_compress_tpu.runtime.engine import load_model

    cfg2, params2, rope2 = load_model(npz, model_name=args.model)
    probe = vtokens[:2, :128]
    ref = np.asarray(lm_logits(cfg, params, rope, probe))
    got = np.asarray(
        lm_logits(
            cfg2,
            jax.tree.map(
                lambda a: a.astype(jnp.float32)
                if hasattr(a, "astype")
                else a,
                params2,
            ),
            rope2.astype(jnp.float32),
            probe,
        )
    )
    # bf16 storage of f32-trained weights: small but nonzero error.
    err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
    print(f"converter round-trip rel err: {err:.4f}")
    assert err < 0.05, "HF round-trip logits diverged"
    print("round-trip parity ok")


if __name__ == "__main__":
    main()
