"""Tensor-parallel sharding rules for transformer parameter trees.

For the large text encoders (OpenLLaMA-7B/13B, Mistral-7B — the reference
runs them single-GPU, languagemodel.py:10-62) the TPU build shards
attention heads and MLP widths over the mesh 'model' axis.  Idiomatic
XLA-collectives style: annotate parameter shardings (Megatron layout —
column-parallel QKV/fc1, row-parallel out-proj/fc2) and let pjit insert the
all-reduces; no hand-written collectives.

``transformer_tp_rules`` matches the parameter names used by every
transformer in this package (clip.ResidualAttentionBlock, dino.DinoBlock,
seq_autoencoder.TorchEncoderLayer share the qkv/out_proj/c_fc|fc1/c_proj|fc2
naming).
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uml_tpu.core.meshes import MODEL_AXIS

# parameter-name regex -> PartitionSpec for its 'kernel' / bias
# Megatron-style: split the hidden-expanding matmuls by column, the
# hidden-contracting ones by row (psum inserted on the row-parallel output).
_DEFAULT_RULES = [
    (r"\bqkv\b", "col"),
    (r"\bc_fc\b|\bfc1\b|\blinear1\b", "col"),
    (r"\bout_proj\b|\battn_out\b", "row"),
    (r"\bc_proj\b|\bfc2\b|\blinear2\b", "row"),
]


def transformer_tp_rules():
    return list(_DEFAULT_RULES)


def _spec_for(path: str, leaf_name: str, ndim: int, rules) -> P:
    for pattern, kind in rules:
        if re.search(pattern, path):
            if leaf_name in ("kernel", "kernel_q8") and ndim == 2:
                # int8 kernels (models.llama.Q8Dense) shard exactly like
                # their float twins
                return P(None, MODEL_AXIS) if kind == "col" else P(MODEL_AXIS, None)
            if leaf_name in ("bias", "scale") and ndim == 1 and kind == "col":
                # per-output-channel quant scales follow the output dim,
                # i.e. the bias rule: split for col-parallel, replicated
                # for row-parallel
                return P(MODEL_AXIS)
            return P()  # row-parallel bias/scale and scalars replicated
    return P()  # everything else replicated


def infer_sharding_tree(params, rules=None):
    """PartitionSpec pytree for a transformer parameter tree."""
    rules = rules if rules is not None else _DEFAULT_RULES

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, f"{path}/{k}") for k, v in tree.items()}
        leaf_name = path.rsplit("/", 1)[-1]
        parent = path.rsplit("/", 1)[0]
        return _spec_for(parent, leaf_name, getattr(tree, "ndim", 0), rules)

    return walk(params, "")


def apply_tp_sharding(params, mesh: Mesh, rules=None):
    """device_put a parameter tree with tensor-parallel shardings.

    Synced: an unsynced bulk weight put through a transfer relay trickles
    ~50x slower and stalls later H2D transfers (core.meshes.staged_put)."""
    specs = infer_sharding_tree(params, rules)
    return jax.block_until_ready(jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    ))
