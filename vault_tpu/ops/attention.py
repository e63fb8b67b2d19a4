"""Multi-head self-attention core.

Numerics mirror HF BERT/ViLT self-attention (modeling_vilt.py ViltSelfAttention):
scores = q k^T / sqrt(head_dim) + additive bias; softmax (fp32); probs @ v.

Two execution paths, selected via ``use_pallas``:
  * XLA path (default; always available, used on CPU test meshes).
  * Pallas fused kernel (TPU; see vault_tpu/ops/pallas_attention.py) that keeps
    the whole (L, L) score tile in VMEM and fuses mask-add + softmax + pv into
    one kernel — the co-encoder hot loop identified in SURVEY.md §3 runs here.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """(B, L, H) -> (B, heads, L, head_dim)."""
    b, l, h = x.shape
    return x.reshape(b, l, num_heads, h // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """(B, heads, L, head_dim) -> (B, L, H)."""
    b, n, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, n * d)


def attend_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array],
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
) -> jax.Array:
    """Reference XLA attention. q/k/v: (B, heads, L, D); bias broadcastable to
    (B, heads, Lq, Lk)."""
    head_dim = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(head_dim))
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    if not deterministic and dropout_rate > 0.0:
        keep = 1.0 - dropout_rate
        mask = jax.random.bernoulli(dropout_rng, keep, probs.shape)
        probs = jnp.where(mask, probs / keep, 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


@jax.custom_vjp
def _pallas_attend(q, k, v, bias):
    from vault_tpu.ops.pallas_attention import fused_attention_batched

    return fused_attention_batched(q, k, v, bias)


def _pallas_attend_fwd(q, k, v, bias):
    return _pallas_attend(q, k, v, bias), (q, k, v, bias)


def _pallas_attend_bwd(residuals, g):
    # backward recomputed through the XLA path (flash-style recompute: the
    # forward never materialized probs, so the bwd re-derives them)
    q, k, v, bias = residuals
    _, vjp = jax.vjp(lambda q, k, v: attend_xla(q, k, v, bias), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_pallas_attend.defvjp(_pallas_attend_fwd, _pallas_attend_bwd)


def attend(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array],
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    use_pallas: bool = False,
) -> jax.Array:
    if use_pallas and deterministic:
        if bias is None:
            b, _, l, _ = q.shape
            bias = jnp.zeros((b, 1, 1, l), jnp.float32)
        return _pallas_attend(q, k, v, bias)
    return attend_xla(q, k, v, bias, dropout_rng, dropout_rate, deterministic)
