"""Pallas TPU fused attention for the ViLT/BERT encoder hot loop.

The co-encoder's 12-layer self-attention over ~269 tokens (40 text + 1 CLS +
228 patches) is the #1 hot loop (SURVEY.md §3, "Hot loops, ranked").  At this
sequence length the whole (L, L) score matrix fits comfortably in VMEM
(269x269 fp32 = 283 KB), so a single fused kernel per (batch, head) —
QK^T -> mask add -> softmax -> PV, with no HBM round-trip for scores — beats
the unfused XLA path that materializes probs in HBM.

Layout: grid (B, H); each program owns one head's (L, D) q/k/v tiles and the
(1, L) additive bias row.  fp32 accumulation on the MXU via
``preferred_element_type``; softmax computed in fp32 regardless of input
dtype.  Falls back to interpreter mode off-TPU so CPU tests exercise the same
code path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref):
    q = q_ref[0, 0]            # (L, D)
    k = k_ref[0, 0]            # (L, D)
    v = v_ref[0, 0]            # (L, D)
    d = q.shape[-1]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (L, L)
    scores = scores * (1.0 / (d ** 0.5))
    scores = scores + bias_ref[0, 0].astype(jnp.float32)   # (1, L) broadcast

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)

    out = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _attn_kernel_batched(q_ref, k_ref, v_ref, bias_ref, out_ref):
    """One program per BATCH row; heads iterated in-kernel (v5e has a single
    TensorCore, so a fine (B, H) grid only adds program-switch overhead —
    measured slower than XLA; this shape beats it by keeping the fp32 score
    tile in VMEM across the whole head loop)."""
    h = q_ref.shape[1]
    d = q_ref.shape[-1]
    bias_row = bias_ref[0, 0].astype(jnp.float32)        # (1, L)

    def head(i, _):
        q = q_ref[0, i]                                   # (L, D)
        k = k_ref[0, i]
        v = v_ref[0, i]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        scores = scores * (1.0 / (d ** 0.5)) + bias_row
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0, i] = out.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, h, head, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention_batched(q: jax.Array, k: jax.Array, v: jax.Array,
                            bias: jax.Array | None,
                            interpret: bool | None = None) -> jax.Array:
    """grid (B,) variant; bias (B, 1, 1, L) or None."""
    b, h, l, d = q.shape
    if bias is None:
        bias = jnp.zeros((b, 1, 1, l), jnp.float32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    spec = pl.BlockSpec((1, h, l, d), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 1, 1, l), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _attn_kernel_batched,
        grid=(b,),
        in_specs=[spec, spec, spec, bias_spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, l, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * l * l * d,
            bytes_accessed=4 * b * h * l * d * q.dtype.itemsize,
            transcendentals=b * h * l * l,
        ),
    )(q, k, v, bias)


def _attn_kernel_dotbatch(q_ref, k_ref, v_ref, bias_ref, out_ref):
    """One program per BATCH row; all heads in ONE batched dot_general.

    Rationale (measured, docs/BENCHMARKS.md): the (B, H) grid (192 programs)
    and the in-kernel fori_loop over heads (16 programs x 12 sequential small
    dots) both lose to XLA — per-program/per-iteration overhead dominates
    when each head's matmul is only (256,64)x(64,256).  A single batched dot
    lets Mosaic stream all 12 heads' tiles through the MXU back-to-back."""
    q = q_ref[0]               # (H, L, D)
    k = k_ref[0]
    v = v_ref[0]
    d = q.shape[-1]
    # scores: batch over heads, contract D -> (H, L, L) fp32
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / (d ** 0.5))
    scores = scores + bias_ref[0, 0].astype(jnp.float32)   # (1, L) broadcast
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention_dotbatch(q: jax.Array, k: jax.Array, v: jax.Array,
                             bias: jax.Array | None,
                             interpret: bool | None = None) -> jax.Array:
    """grid (B,) with heads as a dot_general batch dim; bias (B,1,1,L)."""
    b, h, l, d = q.shape
    if bias is None:
        bias = jnp.zeros((b, 1, 1, l), jnp.float32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    spec = pl.BlockSpec((1, h, l, d), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 1, 1, l), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _attn_kernel_dotbatch,
        grid=(b,),
        in_specs=[spec, spec, spec, bias_spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, l, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * l * l * d,
            bytes_accessed=4 * b * h * l * d * q.dtype.itemsize,
            transcendentals=b * h * l * l,
        ),
    )(q, k, v, bias)


def _attn_kernel_gqa(q_ref, k_ref, v_ref, bias_ref, out_ref, *, rep):
    """One program per BATCH row, GQA-aware dotbatch (models/llama.py).

    q heads are folded into their K/V group — (H, L, D) -> (kvh, rep*L,
    D), exploiting head index = group*rep + r — so ONE batched dot over
    the kvh groups serves all H query heads against the UNREPEATED K/V
    (the XLA path's grouped einsum, moved into VMEM with the fp32 score
    tile never touching HBM).  The bias block is the full 2-D (Lq, Lk)
    causal+padding mask (the encoder kernels above take a (1, L) row —
    a causal tower needs the per-query-row mask), tiled across the rep
    fold in-register.  Numerics match _gqa_attend / attend_xla: fp32
    scores and softmax, same contraction orders, bf16 cast at PV."""
    h, l, d = q_ref.shape[1:]
    kvh = h // rep
    q = q_ref[0].reshape(kvh, rep * l, d)
    k = k_ref[0]                                    # (kvh, L, D)
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)         # (kvh, rep*L, L)
    scores = scores * (1.0 / (d ** 0.5))
    b2 = bias_ref[0, 0].astype(jnp.float32)         # (Lq, Lk)
    scores = scores + jnp.tile(b2, (rep, 1))[None]  # row r*L+lq <- b2[lq]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)         # (kvh, rep*L, D)
    out_ref[0] = out.astype(out_ref.dtype).reshape(h, l, d)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention_gqa(q: jax.Array, k: jax.Array, v: jax.Array,
                        bias: jax.Array,
                        interpret: bool | None = None) -> jax.Array:
    """Grouped-query attention kernel: q (B, H, L, D), k/v (B, kvh, L, D)
    with kvh dividing H, bias (B, 1, Lq, Lk) additive (causal+padding).
    Returns (B, H, L, D).  rep == H // kvh; rep == 1 degrades to plain
    multi-head with a 2-D bias."""
    b, h, l, d = q.shape
    kvh = k.shape[1]
    rep = h // kvh
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    q_spec = pl.BlockSpec((1, h, l, d), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, kvh, l, d), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 1, l, l), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel_gqa, rep=rep),
        grid=(b,),
        in_specs=[q_spec, kv_spec, kv_spec, bias_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, l, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * l * l * d,
            bytes_accessed=(2 * b * h * l * d
                            + 2 * b * kvh * l * d) * q.dtype.itemsize,
            transcendentals=b * h * l * l,
        ),
    )(q, k, v, bias)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    bias: jax.Array | None, interpret: bool | None = None) -> jax.Array:
    """q/k/v: (B, H, L, D); bias: (B, 1, 1, L) additive or None."""
    b, h, l, d = q.shape
    if bias is None:
        bias = jnp.zeros((b, 1, 1, l), jnp.float32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    grid = (b, h)
    qkv_spec = pl.BlockSpec((1, 1, l, d), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 1, 1, l), lambda i, j: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _attn_kernel,
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, l, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * l * l * d,
            bytes_accessed=(3 * b * h * l * d + b * h * l * d) * q.dtype.itemsize,
            transcendentals=b * h * l * l,
        ),
    )(q, k, v, bias)
