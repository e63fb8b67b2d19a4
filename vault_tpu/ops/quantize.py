"""Int8 quantization for serving: weight-only (w8) and weight+activation
(w8a8).

Production-serving extra (no reference counterpart).  Two modes:

  * **w8** (weight-only): linear weights stored int8 with per-output-channel
    fp scales, halving weight HBM traffic — the dominant cost at small
    serving batches.  Dequantization fuses into the matmul's operand load
    under XLA (and runs in-VMEM in the fused Pallas kernels).  Matmuls
    still run bf16 on the MXU.
  * **w8a8**: activations are ALSO quantized — dynamically, per row
    (absmax over the feature dim) at each linear — so the matmul itself is
    int8 x int8 -> int32 on the MXU's double-rate int8 path (v5e: 394 TOPS
    vs 197 bf16 TFLOP/s).  This targets the serving forward's compute
    floor, which the bf16 path already runs at ~87% of peak
    (docs/BENCHMARKS.md "MFU accounting") — halving the matmul time is the
    only remaining lever.  Inference-only: the round/clip in the activation
    quant has zero gradient.

Embeddings, LayerNorms, biases, convs, position grids and the attention
scores/context matmuls (d=64 shapes, bandwidth-bound) stay fp — tiny
and/or precision-critical either way.

``vault_tpu.ops.nn.linear`` consumes both forms transparently: pytree keys
``w_q``/``w_scale`` select w8, ``w_q8``/``w_scale`` select w8a8 — the mode
is encoded in the (jit-static) tree structure, so no config plumbing is
needed anywhere between ``quantize_model_params`` and the matmul."""

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


def quantize_activation(x: jax.Array):
    """(..., rows, features) fp -> (int8 values, per-row fp32 scales).

    Dynamic symmetric per-row quantization: each row is scaled by its own
    absmax so outliers in one token don't crush the resolution of others.
    The dequant factor for a w8a8 matmul output is the OUTER PRODUCT
    row_scale * w_scale (both sides' scales factor out of the int32 dot)."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)   # (..., rows, 1)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_linear_params(p: dict, mode: str = "w8") -> dict:
    q, scale = quantize_weight(p["w"])
    out = {("w_q8" if mode == "w8a8" else "w_q"): q, "w_scale": scale}
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantize_model_params(params, path_filter=None, mode: str = "w8"):
    """Quantize every encoder linear (QUANT_SUBLAYERS) in a model pytree.
    Returns a new pytree with {w_q, w_scale} (mode="w8") or {w_q8, w_scale}
    (mode="w8a8") replacing {w} at those sites."""
    if mode not in ("w8", "w8a8"):
        raise ValueError(f"unknown quantization mode {mode!r}")

    def walk(node, key=None):
        if isinstance(node, dict):
            if key in QUANT_SUBLAYERS and "w" in node and node["w"].ndim >= 2:
                if path_filter is None or path_filter(key):
                    return quantize_linear_params(node, mode)
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


def quantized_bytes(params) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
