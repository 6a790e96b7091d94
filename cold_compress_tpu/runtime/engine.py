"""Engine utilities: per-layer cache-spec construction, compatibility checks,
checkpoint save/load.

Mirrors the reference's cache setup pipeline (reference:
generation_utils.py:324-388 ``setup_caches``, cache.py:121-139
``cache_compatibility``, generation_utils.py:534-566 ``load_model``) in a
functional style: the output is a tuple of ``CacheSpec`` (static) from which
``transformer.init_caches`` builds the state pytrees.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

_BF16 = np.dtype(ml_dtypes.bfloat16)

from ..caches import CacheSpec, get_cache_strategy
from ..ops.linear import QuantizedWeight
from ..caches.patterns import apply_pattern, normalize_cache_length
from ..models import transformer as T
from ..models.config import ModelConfig


def cache_compatibility(args: Dict[str, Any]) -> None:
    """Startup validation (reference: cache.py:121-139)."""
    for length, cache_strat, prompt_strat in zip(
        args["max_cache_length"],
        args["cache_strategy"],
        args["prompt_compression_strategy"],
    ):
        if cache_strat == "heavy_hitter":
            assert prompt_strat == "heavy_hitter", (
                "Heavy Hitter cache strategy must be run with "
                "--prompt_compression_strategy heavy_hitter to return attention."
            )
        if cache_strat in {"full", "hybrid"}:
            assert length == 1.0, (
                f"{cache_strat} cache strategy only supports "
                "max_cache_length=1.0."
            )


def build_cache_specs(
    cfg: ModelConfig,
    cache_kwargs: Dict[str, Any],
    max_seq_length: int,
    token_ids: Optional[Dict[str, Any]] = None,
) -> Tuple[CacheSpec, ...]:
    """Normalize lengths/strategies across layers and build per-layer specs.

    Mirrors reference generation_utils.py:324-388: fraction→absolute lengths,
    tile/repeat/pyramid/funnel patterns, per-layer recent windows, and the
    global-token budget check.
    """
    kw = dict(cache_kwargs)
    lengths = [
        normalize_cache_length(l, max_seq_length)
        for l in _as_list(kw.get("max_cache_length", [1.0]))
    ]
    lengths = apply_pattern(
        lengths,
        cfg.n_layer,
        kw.get("cache_length_pattern", "tile"),
        max_seq_length=max_seq_length,
    )
    strategies = apply_pattern(
        _as_list(kw.get("cache_strategy", ["full"])),
        cfg.n_layer,
        kw.get("cache_strategy_pattern", "tile"),
    )
    from ..caches import get_cache_strategy

    for s in set(strategies):
        get_cache_strategy(s)  # fail fast on unknown names
    prompt_strategies = apply_pattern(
        _as_list(kw.get("prompt_compression_strategy", ["recent_global"])),
        cfg.n_layer,
        kw.get("cache_strategy_pattern", "tile"),
    )

    recent = kw.get("recent_window", 10)
    if not isinstance(recent, (list, tuple)):
        if recent <= 1:
            recent = [max(1, int(recent * l)) for l in lengths]
        else:
            recent = [max(1, min(int(recent), l)) for l in lengths]

    global_tokens = int(kw.get("global_tokens", 1))
    assert global_tokens <= min(lengths), (
        "Global tokens must be less than max_cache_length."
    )

    hybrid_strategies = ()
    if kw.get("hybrid_strategies"):
        from ..caches.hybrid import normalize_hybrid_strategies

        hybrid_strategies = normalize_hybrid_strategies(
            kw["hybrid_strategies"]
        )
    token_ids = token_ids or kw.get("token_ids") or {}
    token_ids_special = tuple(
        tuple(int(t) for t in seq) for seq in token_ids.get("special", ())
    )
    token_ids_punc = tuple(int(t) for t in token_ids.get("punctuation", ()))

    specs = []
    for i in range(cfg.n_layer):
        specs.append(
            CacheSpec(
                cache_strategy=strategies[i],
                max_cache_length=int(lengths[i]),
                max_seq_length=int(max_seq_length),
                global_tokens=global_tokens,
                recent_window=int(recent[i]),
                cache_bits=kw.get("cache_bits"),
                history_window_size=int(kw.get("history_window_size", 1)),
                attn_thresholding=bool(kw.get("attn_thresholding", False)),
                prompt_compression_strategy=prompt_strategies[i],
                min_recovery_frac=float(kw.get("min_recovery_frac", 0.9)),
                hybrid_strategies=hybrid_strategies,
                token_ids_special=token_ids_special,
                token_ids_punc=token_ids_punc,
            )
        )
    return tuple(specs)


def _as_list(x):
    return list(x) if isinstance(x, (list, tuple)) else [x]


def min_cache_length(specs: Sequence[CacheSpec]) -> int:
    return min(s.max_cache_length for s in specs)


def compute_max_seq_length(
    cfg: ModelConfig, prompt_lens: Sequence[int], max_new_tokens: int
) -> Tuple[int, int]:
    """(max prompt length, clamped max seq length)
    (reference: generation_utils.py:94-113)."""
    max_prompt = max(prompt_lens)
    max_seq = max_prompt + max_new_tokens
    if max_seq > cfg.block_size:
        max_seq = cfg.block_size
    return max_prompt, max_seq


# --------------------------------------------------------------------------
# Checkpoint IO — flat npz of the params pytree
# --------------------------------------------------------------------------


def _flatten(params, prefix=""):
    flat = {}
    if isinstance(params, QuantizedWeight):
        flat[prefix + "w"] = np.asarray(params.w)

        def put(key, val):  # bf16 scales need the tagged-uint16 view too
            arr = np.asarray(val)
            if arr.dtype == _BF16:
                flat[key + "#bf16"] = arr.view(np.uint16)
            else:
                flat[key] = arr

        put(prefix + "scales", params.scales)
        if params.zeros is not None:
            put(prefix + "zeros", params.zeros)
        flat[prefix + "qmeta"] = np.array(
            [4 if params.kind == "int4" else 8, params.group_size]
        )
    elif isinstance(params, dict):
        for k, v in params.items():
            flat.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            flat.update(_flatten(v, f"{prefix}{i}/"))
    elif params is None:
        flat[prefix[:-1] + "#none"] = np.zeros((0,))
    else:
        arr = np.asarray(params)
        if arr.dtype == _BF16:
            # npz round-trips bf16 only as raw void bytes; store a uint16
            # view under a tagged key so load restores the dtype.
            flat[prefix[:-1] + "#bf16"] = arr.view(np.uint16)
        else:
            flat[prefix[:-1]] = arr
    return flat


def save_params(params, path: str) -> None:
    """Save a params pytree (including quantized dict leaves) to .npz."""
    flat = _flatten(params)
    # Scalars like group_size are stored as 0-d arrays.
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_params(path: str, dtype=None):
    """Rebuild the nested params pytree saved by ``save_params``."""
    data = np.load(path, allow_pickle=False)
    tree: Dict[str, Any] = {}
    for key in data.files:
        is_none = key.endswith("#none")
        is_bf16 = key.endswith("#bf16")
        base = key[: -len("#none")] if is_none else (
            key[: -len("#bf16")] if is_bf16 else key
        )
        parts = base.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if is_none:
            node[parts[-1]] = None
        else:
            arr = data[key]
            if is_bf16:
                arr = arr.view(_BF16)
            if arr.ndim == 0 and arr.dtype.kind in "iu":
                node[parts[-1]] = int(arr)
            else:
                if dtype is not None and (
                    arr.dtype.kind == "f" or arr.dtype == _BF16
                ):
                    arr = arr.astype(dtype)
                node[parts[-1]] = jnp.asarray(arr)
        # 'kind' for quantized leaves is stored as bytes; handled below.
    return _listify(tree)


def _listify(node):
    if isinstance(node, dict):
        if "qmeta" in node:
            bits, group_size = (int(x) for x in np.asarray(node["qmeta"]))
            w = node["w"]
            if bits == 4 and w.dtype == jnp.uint8:
                # Legacy unsigned-nibble checkpoints -> signed-hi packing.
                from ..ops.linear import to_signed_pack

                w = to_signed_pack(w)
            return QuantizedWeight(
                w=w,
                scales=node["scales"],
                zeros=node.get("zeros"),
                kind=f"int{bits}",
                group_size=group_size,
            )
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [
                _listify(node[str(i)]) for i in range(len(keys))
            ]
        return {k: _listify(v) for k, v in node.items()}
    return node


def load_model(
    checkpoint_path: str,
    precision=jnp.bfloat16,
    model_name: Optional[str] = None,
):
    """Load (cfg, params, rope) from a converted checkpoint.

    Model architecture resolves from the checkpoint's parent directory name,
    like the reference (generation_utils.py:534-537). Quantized checkpoints
    are self-describing (weight leaves are dicts with a ``kind`` tag), so no
    filename-based module swapping is needed.
    """
    path = Path(checkpoint_path)
    name = model_name or path.parent.name
    cfg = ModelConfig.from_name(name)
    params = load_params(str(path), dtype=precision)
    rope = T.make_rope_table(cfg)
    return cfg, params, rope
