"""Device mesh + sharding rules: TPU-native tensor parallelism.

Replaces the reference's NCCL/torchrun tensor parallelism (reference:
tp.py:23-176) with a ``jax.sharding.Mesh`` over ICI and PartitionSpec
annotations; XLA's GSPMD inserts the per-layer all-reduces that tp.py
registers as forward hooks (tp.py:134-138,156-160).

Sharding scheme (parity with tp.py:59-176):
  * wq/wk/wv, w1/w3: column-wise → output dim sharded on the ``tp`` axis;
  * wo, w2: row-wise → input dim sharded on ``tp`` (psum after, via GSPMD);
  * KV caches: sharded on the KV-head axis — eviction scoring is per-head
    local (SURVEY.md §5.7), so every cache strategy composes with TP at zero
    extra communication;
  * batch on the ``dp`` axis (the reference has no in-model batch axis —
    job-level DP only; here it is first-class).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..caches.base import CacheState
from ..models.config import ModelConfig
from ..ops.linear import QuantizedWeight, is_quantized


def make_mesh(
    tp: int = 1, dp: int = 1, devices=None
) -> Mesh:
    """Build a (dp, tp) mesh with tp innermost so it rides ICI.

    Multi-host (DCN) layout: when the runtime spans multiple processes
    (``jax.distributed`` initialized on a pod slice or across slices),
    the data-parallel axis is placed across hosts and tensor parallelism
    stays within each host — tp traffic is two all-reduces per layer per
    token (latency-critical, must ride ICI), while dp needs no in-model
    communication at all (each lane decodes independently; the reference's
    job-level DP, parallelize_evals.py, has the same property).
    """
    if devices is None:
        if jax.process_count() > 1:
            from jax.experimental import mesh_utils

            assert tp <= jax.local_device_count(), (
                f"tp={tp} must fit within one host's "
                f"{jax.local_device_count()} devices so its all-reduces "
                "ride ICI; shard dp across hosts instead."
            )
            try:
                dev_array = mesh_utils.create_hybrid_device_mesh(
                    mesh_shape=(dp // jax.process_count(), tp),
                    dcn_mesh_shape=(jax.process_count(), 1),
                )
            except ValueError:
                # No slice metadata (CPU/gloo dryrun): lay dp across
                # processes by hand so each tp row stays process-local.
                devs = sorted(
                    jax.devices(), key=lambda d: (d.process_index, d.id)
                )
                dev_array = np.asarray(devs[: dp * tp]).reshape(dp, tp)
            return Mesh(dev_array, axis_names=("dp", "tp"))
        devices = jax.devices()
    assert len(devices) >= tp * dp, (
        f"Need {tp * dp} devices, have {len(devices)}"
    )
    dev_array = np.asarray(devices[: tp * dp]).reshape(dp, tp)
    return Mesh(dev_array, axis_names=("dp", "tp"))


def _weight_spec(role: str, leaf):
    """PartitionSpec (or dict of specs) for a dense or quantized weight leaf.

    role: 'col' (shard output dim), 'row' (shard input dim), 'rep'.
    Quantized dict leaves shard their payload consistently:
      int8: w [in, out], scales [out]
      int4: w [in//2, out] (packed along in), scales/zeros [n_groups, out]
    """
    if leaf is None:
        return None
    if is_quantized(leaf):
        if role == "rep":
            return {"w": P(), "scales": P(), "zeros": P()}
        col = role == "col"
        spec = {"w": P(None, "tp") if col else P("tp", None)}
        if leaf.kind == "int8":
            spec["scales"] = P("tp") if col else P(None)
            spec["zeros"] = None
        else:  # int4: scales/zeros are [n_groups(in), out]
            gspec = P(None, "tp") if col else P("tp", None)
            spec["scales"] = gspec
            spec["zeros"] = gspec
        return spec
    if role == "col":
        return P(None, "tp")
    if role == "row":
        return P("tp", None)
    return P()


def _layer_pspecs(lp, stacked: bool):
    """Spec tree for one layer dict (or the stacked all-layers dict: same
    structure with a leading layer axis on every array, so every spec gets a
    leading None)."""
    attn = {
        "wq": _weight_spec("col", lp["attn"]["wq"]),
        "wk": _weight_spec("col", lp["attn"]["wk"]),
        "wv": _weight_spec("col", lp["attn"]["wv"]),
        "wo": _weight_spec("row", lp["attn"]["wo"]),
    }
    for b in ("bq", "bk", "bv"):
        if b in lp["attn"]:
            attn[b] = P("tp")
    spec = {
        "attn": attn,
        "ffn": {
            "w1": _weight_spec("col", lp["ffn"]["w1"]),
            "w3": _weight_spec("col", lp["ffn"]["w3"]),
            "w2": _weight_spec("row", lp["ffn"]["w2"]),
        },
        "attention_norm": P(),
        "ffn_norm": P(),
    }
    if stacked:
        spec = _prefix_none(spec)
    return spec


def _prefix_none(node):
    """Prepend a None (layer) axis to every PartitionSpec in a spec tree."""
    if isinstance(node, P):
        return P(None, *node)
    if isinstance(node, dict):
        return {k: _prefix_none(v) for k, v in node.items()}
    if node is None:
        return None
    return node


def param_pspecs(cfg: ModelConfig, params) -> dict:
    """PartitionSpec pytree matching the params layout — list-of-layers or
    stacked scan-over-layers (tp.py's scheme expressed as specs)."""
    layers = params["layers"]
    if isinstance(layers, list):
        layer_specs = [_layer_pspecs(lp, stacked=False) for lp in layers]
    else:  # stacked: one spec tree with a leading layer axis
        layer_specs = _layer_pspecs(layers, stacked=True)
    return {
        "tok_embeddings": _weight_spec("rep", params["tok_embeddings"]),
        "layers": layer_specs,
        "norm": P(),
        "output": _weight_spec("col", params["output"])
        if params["output"] is not None
        else None,
    }


def cache_pspecs(state: CacheState) -> CacheState:
    """Spec pytree for a cache state: batch on dp, KV heads on tp.

    Head-axis sharding needs no cross-device communication for any strategy:
    scores, argmin eviction, and history updates are head-local. Handles both
    per-layer states ([B, KVH, ...] leaves) and the stacked scan-over-layers
    state ([L, B, KVH, ...] leaves).
    """
    stacked = state.pos.ndim == 4  # [L, B, KVH, C]
    off = 1 if stacked else 0
    B, KVH = state.pos.shape[off], state.pos.shape[off + 1]
    lead = (None,) * off

    def leaf_spec(x):
        if x is None:
            return None
        if (
            x.ndim >= off + 2
            and x.shape[off] == B
            and x.shape[off + 1] == KVH
        ):
            return P(*lead, "dp", "tp", *([None] * (x.ndim - off - 2)))
        return P(*([None] * x.ndim))

    return jax.tree.map(leaf_spec, state)


def tree_place(node, spec_node, mesh: Mesh):
    """Recursively device_put arrays per a parallel spec tree.

    Hand-rolled (rather than jax.tree.map) because params mix array leaves
    with None / str / int metadata that pytree mapping would reject.
    """
    if is_quantized(node):
        return QuantizedWeight(
            w=jax.device_put(node.w, NamedSharding(mesh, spec_node["w"])),
            scales=jax.device_put(
                node.scales, NamedSharding(mesh, spec_node["scales"])
            ),
            zeros=None
            if node.zeros is None
            else jax.device_put(
                node.zeros, NamedSharding(mesh, spec_node["zeros"])
            ),
            kind=node.kind,
            group_size=node.group_size,
        )
    if isinstance(node, dict):
        return {
            k: tree_place(v, spec_node[k], mesh) for k, v in node.items()
        }
    if isinstance(node, (list, tuple)):
        out = [tree_place(v, s, mesh) for v, s in zip(node, spec_node)]
        return type(node)(out)
    if node is None or spec_node is None or not hasattr(node, "ndim"):
        return node
    return jax.device_put(node, NamedSharding(mesh, spec_node))


def shard_params(params, mesh: Mesh, cfg: ModelConfig):
    """Place params on the mesh with TP shardings."""
    return tree_place(params, param_pspecs(cfg, params), mesh)


def _shard_one_cache(state: CacheState, mesh: Mesh) -> CacheState:
    specs = cache_pspecs(state)
    leaves, treedef = jax.tree.flatten(state)
    spec_leaves = jax.tree.leaves(specs, is_leaf=lambda s: isinstance(s, P))
    placed = [
        jax.device_put(x, NamedSharding(mesh, s))
        for x, s in zip(leaves, spec_leaves)
    ]
    return jax.tree.unflatten(treedef, placed)


def shard_caches(caches, mesh: Mesh):
    """Place caches on the mesh. Accepts a list/tuple of per-layer states or
    a single stacked (scan-over-layers) CacheState."""
    if isinstance(caches, CacheState):
        return _shard_one_cache(caches, mesh)
    return tuple(_shard_one_cache(state, mesh) for state in caches)


def shard_model(cfg: ModelConfig, params, caches, tp: int, dp: int = 1,
                devices=None):
    """One-call CLI entry: build the mesh and place params + caches with TP
    (head/column) and DP (batch) shardings. Works for both the unrolled and
    stacked layer layouts (reference run mode: generate.py:79-86, tp.py:171).
    """
    validate_tp(cfg, tp)
    mesh = make_mesh(tp=tp, dp=dp, devices=devices)
    return mesh, shard_params(params, mesh, cfg), shard_caches(caches, mesh)


def validate_tp(cfg: ModelConfig, tp: int) -> None:
    assert cfg.n_kv_head % tp == 0, (
        f"TP degree {tp} must divide n_kv_head={cfg.n_kv_head} so KV caches "
        "shard evenly on the head axis."
    )
    assert cfg.n_head % tp == 0 and cfg.intermediate_size % tp == 0
