"""Functional NN primitives shared by all towers.

Numerical contract matches HF PyTorch modules (SURVEY.md §2.7):
  * LayerNorm: eps inside sqrt, elementwise affine.
  * GELU: exact (erf-based), HF ACT2FN["gelu"].
  * Linear: ``x @ w + b`` with weights stored (in, out) — the torch->jax
    converter transposes torch's (out, in) layout.

All matmuls take ``preferred_element_type=jnp.float32`` so bf16 params/inputs
still accumulate in fp32 on the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def linear(params, x: jax.Array) -> jax.Array:
    """Dense layer. params = {"w": (in, out), "b": (out,) [optional]}, the
    int8 weight-only form {"w_q": int8, "w_scale": (..., 1, out)}, or the
    w8a8 form {"w_q8": int8, "w_scale"} — all produced by
    vault_tpu.ops.quantize.  w8 dequant fuses into the matmul's operand
    load; w8a8 additionally quantizes ``x`` per row and runs the matmul as
    int8 x int8 -> int32 on the MXU's double-rate int8 path
    (serving-only: the activation round/clip has zero gradient)."""
    if "w_q8" in params:
        from vault_tpu.ops.quantize import quantize_activation

        xq, xs = quantize_activation(x)
        y = jnp.matmul(xq, params["w_q8"], preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (xs * params["w_scale"])
        b = params.get("b")
        if b is not None:
            y = y + b
        return y.astype(x.dtype) if x.dtype == jnp.bfloat16 else y
    if "w_q" in params:
        w = (params["w_q"].astype(jnp.float32) * params["w_scale"]).astype(
            x.dtype if x.dtype == jnp.bfloat16 else jnp.float32)
    else:
        w = params["w"]
    y = jnp.matmul(x, w, preferred_element_type=jnp.float32)
    b = params.get("b")
    if b is not None:
        y = y + b
    return y.astype(x.dtype) if x.dtype == jnp.bfloat16 else y


def layer_norm(params, x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """LayerNorm over the last dim, fp32 statistics."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"] + params["bias"]
    return y.astype(x.dtype)


def act_fn(name: str):
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "gelu_new" or name == "gelu_pytorch_tanh":
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "relu":
        return jax.nn.relu
    raise ValueError(f"unknown activation {name!r}")


def dropout(rng: Optional[jax.Array], x: jax.Array, rate: float, deterministic: bool) -> jax.Array:
    if deterministic or rate == 0.0:
        return x
    assert rng is not None, "dropout needs an rng when not deterministic"
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def dropout_mask(rng: jax.Array, shape, rate: float,
                 dtype=jnp.float32) -> jax.Array:
    """Pre-scaled inverted-dropout mask in {0, 1/keep} — the SAME bernoulli
    draw as :func:`dropout`, for kernels that apply dropout inside a fused
    region (ops/pallas_mlp.py ``fused_mlp_postln_block(drop_mask=...)``), so
    fused and XLA paths see an identical stream."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, jnp.asarray(1.0 / keep, dtype),
                     jnp.zeros((), dtype))


# ---------------------------------------------------------------------------
# Initializers (HF-compatible: normal(0, initializer_range), zeros bias,
# LayerNorm ones/zeros — modeling_vilt.py _init_weights, same for BERT).
# ---------------------------------------------------------------------------

def init_linear(rng, in_dim: int, out_dim: int, stddev: float = 0.02, bias: bool = True):
    p = {"w": jax.random.normal(rng, (in_dim, out_dim), jnp.float32) * stddev}
    if bias:
        p["b"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def init_layer_norm(dim: int):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def init_embedding(rng, num: int, dim: int, stddev: float = 0.02, padding_idx: Optional[int] = None):
    w = jax.random.normal(rng, (num, dim), jnp.float32) * stddev
    if padding_idx is not None:
        w = w.at[padding_idx].set(0.0)
    return w


def maybe_remat(fn, remat, static_argnums=()):
    """Wrap an encoder-layer body in jax.checkpoint per the `remat` knob.

    remat: False = store scan activations; True = full per-layer remat
    (recompute everything in bwd); "dots" = remat with the dots_saveable
    policy — matmul outputs are kept, only the cheap elementwise chains
    (LayerNorm/GELU/softmax) recompute, trading a little activation memory
    for skipping the matmul recompute FLOPs of full remat.
    """
    if remat == "dots":
        return jax.checkpoint(
            fn, static_argnums=static_argnums,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    if remat:
        return jax.checkpoint(fn, static_argnums=static_argnums)
    return fn
