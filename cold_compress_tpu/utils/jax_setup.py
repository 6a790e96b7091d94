"""Process-level JAX configuration.

Enables the persistent compilation cache so the multi-minute XLA compiles of
the 8B prefill/decode graphs happen once per (shape, config) rather than once
per process — the TPU analogue of the reference's Inductor ``fx_graph_cache``
(reference: generate.py:28).
"""

from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "CCT_COMPILE_CACHE", os.path.expanduser("~/.cache/cct_jax_cache")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
