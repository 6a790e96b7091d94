"""Cache/run statistics aggregation and pretty-printing
(reference: model.py:245-263 ``get_cache_stats``,
generation_utils.py:23-47 ``print_stats``)."""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Dict, Sequence

import numpy as np

from ..caches import cache_memory_gb


def unstack_caches(caches):
    """Per-layer cache list from either layout (host-side views)."""
    import jax

    from ..models.transformer import is_stacked

    if not is_stacked(caches):
        return list(caches)
    n_layer = jax.tree.leaves(caches)[0].shape[0]
    return [jax.tree.map(lambda x: x[i], caches) for i in range(n_layer)]


def get_cache_stats(caches, prompt_len: int, gen_len: int) -> Dict[str, Any]:
    caches = unstack_caches(caches)
    stats: Dict[str, Any] = {}
    final_seq_len = prompt_len + gen_len
    avgs = defaultdict(list)
    mem_total = 0.0
    for layer_idx, cache in enumerate(caches):
        # Host-side numpy (reference semantics: cache.py:271-281) — avoids
        # per-layer eager device programs during eval loops.
        n = max(final_seq_len - 1, 1)
        extra = getattr(cache, "extra", None) or {}
        # debug_* analysis caches: the outer cache keeps everything (ratio
        # ~0 by construction); report the shadow compressed cache's ratio,
        # like the reference's KVCacheAnalysis does (cache.py:1407-1420).
        ratio_cache = extra.get("shadow", cache)
        size = np.asarray(ratio_cache.cache_ct).astype(np.float64)
        if ratio_cache.spec.cache_bits is not None:
            size = size * (ratio_cache.spec.cache_bits / 16.0)
        layer_stats = {
            "compression_ratio": float(np.mean((n - size) / n)),
        }
        extra_stats = getattr(cache, "extra", None) or {}
        if "attention_losses" in extra_stats:
            losses = np.asarray(extra_stats["attention_losses"])
            ctr = int(extra_stats["attention_loss_ctr"])
            if ctr > 0:
                layer_stats["attention_loss"] = float(losses[:ctr].mean())
                # Running-average curve every 500 decode steps
                # (reference: cache.py:1415-1419 ``attention_loss@k``).
                for k in range(500, ctr, 500):
                    layer_stats[f"attention_loss@{k}"] = float(
                        losses[:k].mean()
                    )
        if "strategy_idx" in extra_stats:
            sidx = np.asarray(extra_stats["strategy_idx"])
            layer_stats["avg_strategy_idx"] = float(sidx.mean())
        mem_total += cache_memory_gb(cache)
        for k, v in layer_stats.items():
            stats[f"{k}_{layer_idx}"] = v
            avgs[k].append(v)
    for k, v in avgs.items():
        stats[f"{k}_avg"] = sum(v) / len(v)
    stats["cache_memory_gb"] = mem_total
    return stats


def snake_to_capitalized(s: str) -> str:
    return " ".join(word.capitalize() for word in s.split("_"))


def print_stats(stats_dict: Dict[str, Any]) -> None:
    layered: Dict[str, list] = {}
    flat: Dict[str, Any] = {}
    for key, value in stats_dict.items():
        parts = key.rsplit("_", 1)
        if len(parts) == 2 and parts[1].isdigit():
            layered.setdefault(snake_to_capitalized(parts[0]), []).append(
                (int(parts[1]), value)
            )
        else:
            flat[snake_to_capitalized(key)] = value
    for key, value in flat.items():
        try:
            print(f"{key}: {value:.02f}")
        except (TypeError, ValueError):
            print(f"{key}: {value}")
    for stat in sorted(layered):
        layers = ", ".join(
            f"{l}={v:.02f}" for l, v in sorted(layered[stat])
        )
        print(f"{stat} By Layer: {layers}")
