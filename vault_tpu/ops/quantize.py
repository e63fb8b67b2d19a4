"""Int8 weight-only quantization for serving.

Production-serving extra (no reference counterpart): linear weights are
stored int8 with per-output-channel fp scales, halving weight HBM traffic —
the dominant cost at small serving batches.  Dequantization fuses into the
matmul's operand load under XLA.  Embeddings, LayerNorms, biases, convs and
position grids stay fp (tiny, and precision-critical).

``vault_tpu.ops.nn.linear`` consumes quantized params transparently (keys
``w_q`` + ``w_scale`` instead of ``w``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

# sublayer names whose (in, out)-shaped weights are worth quantizing
QUANT_SUBLAYERS = {"q", "k", "v", "attn_out", "mlp_in", "mlp_out",
                   "o", "gate", "up", "down"}


def quantize_weight(w: jax.Array):
    """(..., in, out) fp -> (int8 values, per-out-channel fp32 scales)."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)      # (..., 1, out)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize_weight(q: jax.Array, scale: jax.Array,
                      dtype=jnp.bfloat16) -> jax.Array:
    return (q.astype(jnp.float32) * scale).astype(dtype)


def quantize_linear_params(p: dict) -> dict:
    q, scale = quantize_weight(p["w"])
    out = {"w_q": q, "w_scale": scale}
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantize_model_params(params, path_filter=None):
    """Quantize every encoder linear (QUANT_SUBLAYERS) in a model pytree.
    Returns a new pytree with {w_q, w_scale} replacing {w} at those sites."""

    def walk(node, key=None):
        if isinstance(node, dict):
            if key in QUANT_SUBLAYERS and "w" in node and node["w"].ndim >= 2:
                if path_filter is None or path_filter(key):
                    return quantize_linear_params(node)
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


def quantized_bytes(params) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
