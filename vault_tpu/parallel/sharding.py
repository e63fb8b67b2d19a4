"""Tensor-parallel parameter sharding rules (mesh axis "model").

The reference has no TP (SURVEY.md §2.8) — this is the TPU-native extra:
Megatron-style column/row partitioning of every encoder layer, expressed as
PartitionSpecs; XLA/GSPMD inserts the ICI collectives.

Rules (leaf-path based, applied to stacked (L, ...) layer params):
  * q/k/v and mlp_in weights: shard the OUTPUT dim ("column parallel") —
    heads/intermediate split across "model";
  * attn_out and mlp_out weights: shard the INPUT dim ("row parallel") —
    partial sums all-reduced by GSPMD;
  * matching biases sharded on output dim where the output is sharded;
  * embeddings, LayerNorms, poolers, heads: replicated.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLUMN_W = {"q", "k", "v", "mlp_in",
            # Llama tower (models/llama.py): SwiGLU in-projections
            "gate", "up"}
ROW_W = {"attn_out", "mlp_out",
         # Llama tower: attention output + SwiGLU down-projection
         "o", "down"}


def _spec_for(path_keys, leaf) -> P:
    names = [getattr(k, "key", getattr(k, "idx", None)) for k in path_keys]
    # find the sublayer name ("q", "mlp_out", ...) and the param name ("w"/"b")
    sub = None
    for n in names:
        if n in COLUMN_W or n in ROW_W:
            sub = n
    param = names[-1]
    ndim = getattr(leaf, "ndim", 0)
    # int8-quantized linears (ops/quantize.py) shard like their fp originals:
    # w_q/w_q8 follow w; the per-OUT-channel w_scale (..., 1, out) follows the
    # out dim — sharded for column-parallel, replicated for row-parallel
    # (where the sharded dim is the contraction dim, not out).
    if sub in COLUMN_W:
        if param in ("w", "w_q", "w_q8", "b", "w_scale"):
            return P(*([None] * (ndim - 1) + ["model"]))     # (..., in, OUT)
    if sub in ROW_W:
        if param in ("w", "w_q", "w_q8"):
            # (..., IN, out): shard the contraction dim
            return P(*([None] * (ndim - 2) + ["model", None]))
        if param in ("b", "w_scale"):
            return P()
    return P()


def vault_param_specs(params) -> Any:
    """Pytree of PartitionSpecs matching ``params`` under the TP rules."""
    return jax.tree_util.tree_map_with_path(_spec_for, params)


def shard_params(mesh: Mesh, params):
    specs = vault_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)
