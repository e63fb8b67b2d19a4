"""Fused LN -> MLP -> residual block kernel (Mosaic/Pallas, TPU).

Motivation (measured, scripts/ablate_encoder.py on v5e, B=16 L=256 bf16):
the 12-layer co-encoder block runs 6.75 ms of which the matmul sequence
alone is 4.30 ms and softmax only 0.16 ms — the remaining ~2.3 ms is
LayerNorm/GELU elementwise HBM passes that XLA does not fuse into the
matmuls.  This kernel computes the whole pre-LN ViLT MLP block

    out = x + gelu(LN(x) @ W1 + b1) @ W2 + b2

tiled over rows with both weight matrices resident in VMEM, so per layer it
reads x once and writes out once — the (rows, 4H) intermediate (25 MB at
bench geometry) never touches HBM, and the LN/GELU elementwise work happens
in-register between the two in-kernel matmuls.

Numerics match the XLA path (ops/nn.py): fp32 LN statistics, fp32 matmul
accumulation, exact (erf) GELU in fp32, bf16 casts at the same points.
Backward is flash-style recompute through the XLA path via custom_vjp
(vault_tpu/ops/attention.py uses the same pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vault_tpu.ops.nn import act_fn, layer_norm, linear

ROW_TILE = 256  # (ROW_TILE, 4H) fp32 intermediate ~3 MB at H=768 -> fits VMEM


def _pick_row_tile(rows: int, pref: int) -> int:
    """Largest divisor of ``rows`` that is <= ``pref``.

    Never exceeds ``pref``, so the per-program (tile, 4H) intermediate
    stays within the measured VMEM envelope for EVERY shape — the old
    ``tile = rows`` fallback for non-dividing row counts could build one
    giant program (e.g. B=24, L=40 -> a (960, 3072) fp32 intermediate)
    and overflow scoped VMEM at compile time."""
    if rows % pref == 0:
        return pref
    return max(t for t in range(1, min(pref, rows) + 1) if rows % t == 0)


def _mlp_block_xla(ln_p, p_in, p_out, x, eps, act, m=None):
    """The reference XLA composition (vilt.py _encoder_layer MLP half).
    ``m``: optional pre-scaled dropout mask applied to the MLP output."""
    y = layer_norm(ln_p, x, eps)
    mlp = linear(p_out, act_fn(act)(linear(p_in, y)))
    if m is not None:
        mlp = mlp * m
    return x + mlp


def _erf_approx(x):
    """Abramowitz & Stegun 7.1.26 rational erf, |abs error| <= 1.5e-7 —
    Mosaic lowers neither erf nor erfc, and 1.5e-7 is ~4 orders below bf16
    output resolution (parity tests vs exact-erf GELU pass at 2e-5)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _kernel_act(name: str):
    """In-kernel activation; exact (erf) GELU via the A&S approximation."""
    if name == "gelu":
        return lambda x: 0.5 * x * (1.0 + _erf_approx(x * (2.0 ** -0.5)))
    return act_fn(name)


def _mlp_kernel(x_ref, g_ref, bta_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                *rest, eps, act):
    m_ref = rest[0] if len(rest) == 2 else None
    out_ref = rest[-1]
    x = x_ref[...]                                   # (R, H)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[0] + bta_ref[0]
    y = y.astype(x.dtype)
    h = jnp.dot(y, w1_ref[...], preferred_element_type=jnp.float32)
    h = h + b1_ref[0]
    h = _kernel_act(act)(h).astype(x.dtype)
    o = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    o = o + b2_ref[0]
    if m_ref is not None:  # dropout on the MLP output, inside the fusion
        o = o * m_ref[...].astype(jnp.float32)
    out_ref[...] = o.astype(x.dtype) + x


@functools.partial(jax.jit,
                   static_argnames=("eps", "act", "interpret", "row_tile"))
def fused_mlp_block_fwd(gamma, beta, w1, b1, w2, b2, x, m=None,
                        eps: float = 1e-12, act: str = "gelu",
                        interpret: bool | None = None,
                        row_tile: int = ROW_TILE) -> jax.Array:
    """x: (..., H) -> same shape.  Rows are tiled at ``row_tile``; row
    counts that don't divide use the largest divisor <= row_tile
    (_pick_row_tile), so the per-program intermediate never exceeds the
    measured VMEM envelope.  ``m``: optional pre-scaled dropout mask on
    the MLP output."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = x.shape
    h_dim = shape[-1]
    rows = x.size // h_dim
    x2 = x.reshape(rows, h_dim)
    tile = _pick_row_tile(rows, row_tile)
    grid = (rows // tile,)
    row_spec = pl.BlockSpec((tile, h_dim), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    vecs = [v.reshape(1, -1) for v in (gamma, beta, b1, b2)]
    g2, bta2, b1_2, b2_2 = vecs
    operands = [x2, g2, bta2, w1, b1_2, w2, b2_2]
    in_specs = [row_spec, full(g2), full(bta2), full(w1), full(b1_2),
                full(w2), full(b2_2)]
    if m is not None:
        operands.append(m.reshape(rows, h_dim))
        in_specs.append(row_spec)
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, eps=eps, act=act),
        grid=grid,
        in_specs=in_specs,
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((rows, h_dim), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * rows * h_dim * w1.shape[1],
            bytes_accessed=(2 * rows * h_dim * x.dtype.itemsize
                            + w1.size * w1.dtype.itemsize
                            + w2.size * w2.dtype.itemsize),
            transcendentals=rows * w1.shape[1],
        ),
    )(*operands)
    return out.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused_mlp(gamma, beta, w1, b1, w2, b2, x, eps, act):
    return fused_mlp_block_fwd(gamma, beta, w1, b1, w2, b2, x,
                               eps=eps, act=act)


def _fused_mlp_fwd(gamma, beta, w1, b1, w2, b2, x, eps, act):
    return (_fused_mlp(gamma, beta, w1, b1, w2, b2, x, eps, act),
            (gamma, beta, w1, b1, w2, b2, x))


def _fused_mlp_bwd(eps, act, residuals, g):
    gamma, beta, w1, b1, w2, b2, x = residuals
    if act == "gelu":
        # fused backward kernel (recompute-in-VMEM; see
        # fused_mlp_block_bwd below)
        dgamma, dbeta, dw1, db1, dw2, db2, dx = fused_mlp_block_bwd(
            gamma, beta, w1, b1, w2, b2, x, g, eps=eps)
        return dgamma, dbeta, dw1, db1, dw2, db2, dx

    def f(gamma, beta, w1, b1, w2, b2, x):
        return _mlp_block_xla({"scale": gamma, "bias": beta},
                              {"w": w1, "b": b1}, {"w": w2, "b": b2},
                              x, eps, act)

    _, vjp = jax.vjp(f, gamma, beta, w1, b1, w2, b2, x)
    return vjp(g)


_fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _fused_mlp_m(gamma, beta, w1, b1, w2, b2, x, m, eps, act):
    return fused_mlp_block_fwd(gamma, beta, w1, b1, w2, b2, x, m,
                               eps=eps, act=act)


def _fused_mlp_m_fwd(gamma, beta, w1, b1, w2, b2, x, m, eps, act):
    return (_fused_mlp_m(gamma, beta, w1, b1, w2, b2, x, m, eps, act),
            (gamma, beta, w1, b1, w2, b2, x, m))


def _fused_mlp_m_bwd(eps, act, residuals, g):
    gamma, beta, w1, b1, w2, b2, x, m = residuals
    if act == "gelu":
        out = fused_mlp_block_bwd(gamma, beta, w1, b1, w2, b2, x, g, m,
                                  eps=eps)
        return (*out, None)  # the mask is a constant of the draw

    def f(gamma, beta, w1, b1, w2, b2, x):
        return _mlp_block_xla({"scale": gamma, "bias": beta},
                              {"w": w1, "b": b1}, {"w": w2, "b": b2},
                              x, eps, act, m)

    _, vjp = jax.vjp(f, gamma, beta, w1, b1, w2, b2, x)
    return (*vjp(g), None)


_fused_mlp_m.defvjp(_fused_mlp_m_fwd, _fused_mlp_m_bwd)


def fused_mlp_block(ln_p, p_in, p_out, x, eps: float = 1e-12,
                    act: str = "gelu", drop_mask=None) -> jax.Array:
    """Drop-in for the pre-LN MLP half of a ViLT encoder layer.  Fp weights,
    int8 weight-only ({w_q, w_scale}) and w8a8 ({w_q8, w_scale}) quantized
    weights (ops/quantize.py) each have a fused kernel; anything else falls
    back to XLA.  ``drop_mask``: optional pre-scaled dropout mask on the
    MLP output (fp-weight kernels only; quantized weights with a mask fall
    back)."""
    if "w" in p_in and "w" in p_out:
        if drop_mask is None:
            return _fused_mlp(ln_p["scale"], ln_p["bias"], p_in["w"],
                              p_in["b"], p_out["w"], p_out["b"], x, eps, act)
        return _fused_mlp_m(ln_p["scale"], ln_p["bias"], p_in["w"],
                            p_in["b"], p_out["w"], p_out["b"], x, drop_mask,
                            eps, act)
    if "w_q" in p_in and "w_q" in p_out and drop_mask is None:
        return _fused_mlp_q8(ln_p["scale"], ln_p["bias"],
                             p_in["w_q"], p_in["w_scale"], p_in["b"],
                             p_out["w_q"], p_out["w_scale"], p_out["b"],
                             x, eps, act)
    if "w_q8" in p_in and "w_q8" in p_out and drop_mask is None:
        return _fused_mlp_w8a8(ln_p["scale"], ln_p["bias"],
                               p_in["w_q8"], p_in["w_scale"], p_in["b"],
                               p_out["w_q8"], p_out["w_scale"], p_out["b"],
                               x, eps, act)
    return _mlp_block_xla(ln_p, p_in, p_out, x, eps, act, drop_mask)


# ---------------------------------------------------------------------------
# Fused LN -> QKV projection ("fuselnqkv")
# ---------------------------------------------------------------------------

def _ln_qkv_xla(ln_p, wqkv, bqkv, x, eps):
    y = layer_norm(ln_p, x, eps)
    return linear({"w": wqkv, "b": bqkv}, y)


def _ln_qkv_kernel(x_ref, g_ref, bta_ref, w_ref, b_ref, out_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = (y * g_ref[0] + bta_ref[0]).astype(x_ref.dtype)
    o = jnp.dot(y, w_ref[...], preferred_element_type=jnp.float32)
    out_ref[...] = (o + b_ref[0]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret", "row_tile"))
def fused_ln_qkv_fwd(gamma, beta, wqkv, bqkv, x, eps: float = 1e-12,
                     interpret: bool | None = None,
                     row_tile: int = ROW_TILE) -> jax.Array:
    """x: (..., H) -> (..., 3H): LayerNorm computed in-kernel feeding one
    (H, 3H) matmul — the LN tensor never round-trips HBM and Q/K/V leave as
    one contiguous write (the remaining LN pass of the ablation's 2.3 ms
    after fusemlp takes the MLP-side one)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = x.shape
    h_dim = shape[-1]
    out_dim = wqkv.shape[1]
    rows = x.size // h_dim
    x2 = x.reshape(rows, h_dim)
    tile = _pick_row_tile(rows, row_tile)
    in_spec = pl.BlockSpec((tile, h_dim), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile, out_dim), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    g2, bta2, b2 = (v.reshape(1, -1) for v in (gamma, beta, bqkv))
    out = pl.pallas_call(
        functools.partial(_ln_qkv_kernel, eps=eps),
        grid=(rows // tile,),
        in_specs=[in_spec, full(g2), full(bta2), full(wqkv), full(b2)],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((rows, out_dim), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * h_dim * out_dim,
            bytes_accessed=(rows * (h_dim + out_dim) * x.dtype.itemsize
                            + wqkv.size * wqkv.dtype.itemsize),
            transcendentals=0,
        ),
    )(x2, g2, bta2, wqkv, b2)
    return out.reshape(*shape[:-1], out_dim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_ln_qkv(gamma, beta, wqkv, bqkv, x, eps):
    return fused_ln_qkv_fwd(gamma, beta, wqkv, bqkv, x, eps)


def _fused_ln_qkv_fwd(gamma, beta, wqkv, bqkv, x, eps):
    return (_fused_ln_qkv(gamma, beta, wqkv, bqkv, x, eps),
            (gamma, beta, wqkv, bqkv, x))


def _fused_ln_qkv_bwd(eps, residuals, g):
    gamma, beta, wqkv, bqkv, x = residuals

    def f(gamma, beta, wqkv, bqkv, x):
        return _ln_qkv_xla({"scale": gamma, "bias": beta}, wqkv, bqkv, x, eps)

    _, vjp = jax.vjp(f, gamma, beta, wqkv, bqkv, x)
    return vjp(g)


_fused_ln_qkv.defvjp(_fused_ln_qkv_fwd, _fused_ln_qkv_bwd)


def _ln_qkv_kernel_w8a8(x_ref, g_ref, bta_ref, wq_ref, s_ref, b_ref,
                        out_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = ((y * g_ref[0] + bta_ref[0]).astype(x_ref.dtype)).astype(jnp.float32)
    yq, ys = _rowquant(y)
    o = jnp.dot(yq, wq_ref[...], preferred_element_type=jnp.int32)
    of = o.astype(jnp.float32) * (ys * s_ref[...]) + b_ref[0]
    out_ref[...] = of.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret", "row_tile"))
def fused_ln_qkv_fwd_w8a8(gamma, beta, wqkv_q, sqkv, bqkv, x,
                          eps: float = 1e-12, interpret: bool | None = None,
                          row_tile: int = ROW_TILE) -> jax.Array:
    """w8a8 LN->QKV: LN + per-row activation quant + ONE (H, 3H) int8
    matmul in-kernel.  On the bf16 path fuselnqkv lost 0.18 ms to XLA's
    matmul (BENCHMARKS.md "attention-side fusion"); the int8 MXU path
    re-opens the question — the entry-LN HBM pass (0.20 ms/12 layers) and
    the activation quantization both stay in VMEM here."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = x.shape
    h_dim = shape[-1]
    out_dim = wqkv_q.shape[1]
    rows = x.size // h_dim
    x2 = x.reshape(rows, h_dim)
    tile = _pick_row_tile(rows, row_tile)
    in_spec = pl.BlockSpec((tile, h_dim), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile, out_dim), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    g2, bta2, b2 = (v.reshape(1, -1) for v in (gamma, beta, bqkv))
    s2 = sqkv.reshape(1, -1)
    out = pl.pallas_call(
        functools.partial(_ln_qkv_kernel_w8a8, eps=eps),
        grid=(rows // tile,),
        in_specs=[in_spec, full(g2), full(bta2), full(wqkv_q), full(s2),
                  full(b2)],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((rows, out_dim), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * h_dim * out_dim,
            bytes_accessed=(rows * (h_dim + out_dim) * x.dtype.itemsize
                            + wqkv_q.size),
            transcendentals=0,
        ),
    )(x2, g2, bta2, wqkv_q, s2, b2)
    return out.reshape(*shape[:-1], out_dim)


def fused_ln_qkv(ln_p, pq, pk, pv, x, eps: float = 1e-12):
    """Drop-in for LN(ln_before) + Q/K/V projections of a pre-LN layer;
    returns the (..., 3H) concat to be split by the caller.  Fp weights and
    w8a8 ({w_q8, w_scale}) weights run fused kernels; other quantized
    forms fall back to the XLA path."""
    if all("w_q8" in p for p in (pq, pk, pv)):
        wq = jnp.concatenate([pq["w_q8"], pk["w_q8"], pv["w_q8"]], axis=1)
        s = jnp.concatenate(
            [p["w_scale"] for p in (pq, pk, pv)], axis=-1)
        b = jnp.concatenate(
            [p.get("b", jnp.zeros((p["w_q8"].shape[1],), jnp.float32))
             for p in (pq, pk, pv)])
        return fused_ln_qkv_fwd_w8a8(ln_p["scale"], ln_p["bias"], wq,
                                     s.reshape(-1), b, x, eps)
    if any("w" not in p for p in (pq, pk, pv)):
        y = layer_norm(ln_p, x, eps)
        return jnp.concatenate(
            [linear(pq, y), linear(pk, y), linear(pv, y)], axis=-1)
    wqkv = jnp.concatenate([pq["w"], pk["w"], pv["w"]], axis=1)
    bqkv = jnp.concatenate(
        [p.get("b", jnp.zeros((p["w"].shape[1],), p["w"].dtype))
         for p in (pq, pk, pv)])
    return _fused_ln_qkv(ln_p["scale"], ln_p["bias"], wqkv, bqkv, x, eps)


# ---------------------------------------------------------------------------
# Fused MLP-block BACKWARD kernel
# ---------------------------------------------------------------------------
#
# The XLA backward of the MLP block (under per-layer remat) rematerializes
# y/h1/a and streams da/dh1/dy through HBM — ~240 MB of activation traffic
# per layer at bench geometry.  This kernel recomputes the forward chain
# in VMEM from the x tile and emits, per row tile:
#   dx     (residual + LN backward)           — the data-path gradient
#   dh1, a, y                                  — the minimal activations the
#                                               weight-grad matmuls need
# plus dgamma/dbeta accumulated across the sequential grid.  The weight
# grads themselves (dW1 = y^T dh1, dW2 = a^T g, db1, db2) stay in XLA —
# they are pure matmuls/reductions XLA already runs at the MXU floor.

# Scoped-VMEM vs MXU-efficiency tradeoff: 64 rows measured fastest
# (36.6 ms/train-step vs 39.3 at 32) and compiles in the real training
# program; in rare fusion contexts XLA pins the kernel's big outputs in
# VMEM (S(1)) and the 16 MB scoped budget overflows -- set
# VAULT_MLP_BWD_TILE=32 there (scripts/ablate_train.py does).
import os as _os
BWD_ROW_TILE = int(_os.environ.get("VAULT_MLP_BWD_TILE", "64"))
# Scoped-VMEM budget for the backward kernels: the default compiler limit is
# 16 MB, and in some fusion contexts XLA pins kernel outputs in VMEM (S(1))
# pushing the 64-row-tile kernels to ~17 MB.  Raising the per-kernel limit
# (Mosaic CompilerParams.vmem_limit_bytes) keeps the fast tile everywhere
# instead of dropping to the ~7% slower 32-row tile.
BWD_VMEM_LIMIT = int(_os.environ.get("VAULT_MLP_BWD_VMEM_MB", "32")) * (1 << 20)


def _gelu_grad(h):
    """d/dh [0.5 h (1+erf(h/sqrt2))] = 0.5(1+erf(h/sqrt2)) + h phi(h),
    with the A&S erf (Mosaic has no erf primitive)."""
    cdf = 0.5 * (1.0 + _erf_approx(h * (2.0 ** -0.5)))
    pdf = jnp.exp(-0.5 * h * h) * (1.0 / (2.0 * jnp.pi) ** 0.5)
    return cdf + h * pdf


def _mlp_bwd_kernel(x_ref, g_ref, gamma_ref, bta_ref, w1_ref, b1_ref,
                    w2_ref, *rest, eps):
    m_ref = rest[0] if len(rest) == 7 else None
    dx_ref, dh1_ref, a_ref, y_ref, dgamma_ref, dbeta_ref = rest[-6:]
    x = x_ref[...].astype(jnp.float32)                     # (R, H)
    g = g_ref[...].astype(jnp.float32)
    gamma = gamma_ref[0]
    # ---- recompute the forward chain in VMEM (mask-independent: the mask
    # only scales the block OUTPUT, so it enters backward as g*m)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * rstd
    y = xhat * gamma + bta_ref[0]
    yc = y.astype(x_ref.dtype)
    h1 = jnp.dot(yc, w1_ref[...],
                 preferred_element_type=jnp.float32) + b1_ref[0]
    a = (0.5 * h1 * (1.0 + _erf_approx(h1 * (2.0 ** -0.5))))
    ac = a.astype(x_ref.dtype)
    # ---- backward
    gm = g if m_ref is None else g * m_ref[...].astype(jnp.float32)
    gc = gm.astype(x_ref.dtype)
    da = jax.lax.dot_general(gc, w2_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # gm @ W2^T
    dh1 = da * _gelu_grad(h1)
    dh1c = dh1.astype(x_ref.dtype)
    dy = jax.lax.dot_general(dh1c, w1_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # dh1 @ W1^T
    dxhat = dy * gamma
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = (dxhat - m1 - xhat * m2) * rstd
    dx_ref[...] = (g + dx_ln).astype(dx_ref.dtype)         # + residual path
    dh1_ref[...] = dh1c
    a_ref[...] = ac
    y_ref[...] = yc
    # ---- LN param grads accumulate across the (sequential) grid
    part_g = jnp.sum(dy * xhat, axis=0, keepdims=True)
    part_b = jnp.sum(dy, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dgamma_ref[...] = jnp.zeros_like(dgamma_ref)
        dbeta_ref[...] = jnp.zeros_like(dbeta_ref)

    dgamma_ref[...] += part_g
    dbeta_ref[...] += part_b


@functools.partial(jax.jit, static_argnames=("eps", "interpret", "row_tile"))
def fused_mlp_block_bwd(gamma, beta, w1, b1, w2, b2, x, g, m=None,
                        eps: float = 1e-12, interpret: bool | None = None,
                        row_tile: int = BWD_ROW_TILE):
    """Gradients of ``x + m*(gelu(LN(x)@W1+b1)@W2+b2)`` w.r.t. every input
    (``m``: optional pre-scaled dropout mask, treated as a constant).
    Returns (dgamma, dbeta, dw1, db1, dw2, db2, dx)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = x.shape
    h_dim = shape[-1]
    inner = w1.shape[1]
    rows = x.size // h_dim
    x2 = x.reshape(rows, h_dim)
    g2 = g.reshape(rows, h_dim)
    tile = _pick_row_tile(rows, row_tile)
    row_h = pl.BlockSpec((tile, h_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    row_i = pl.BlockSpec((tile, inner), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    acc = pl.BlockSpec((1, h_dim), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    gam2, bta2, b1_2 = (v.reshape(1, -1) for v in (gamma, beta, b1))
    operands = [x2, g2, gam2, bta2, w1, b1_2, w2]
    in_specs = [row_h, row_h, full(gam2), full(bta2), full(w1),
                full(b1_2), full(w2)]
    m2 = None
    if m is not None:
        m2 = m.reshape(rows, h_dim)
        operands.append(m2)
        in_specs.append(row_h)
    dx, dh1, a, y, dgamma, dbeta = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, eps=eps),
        grid=(rows // tile,),
        in_specs=in_specs,
        out_specs=[row_h, row_i, row_i, row_h, acc, acc],
        out_shape=[
            jax.ShapeDtypeStruct((rows, h_dim), x.dtype),
            jax.ShapeDtypeStruct((rows, inner), x.dtype),
            jax.ShapeDtypeStruct((rows, inner), x.dtype),
            jax.ShapeDtypeStruct((rows, h_dim), x.dtype),
            jax.ShapeDtypeStruct((1, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((1, h_dim), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=BWD_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * rows * h_dim * inner,
            bytes_accessed=(rows * (4 * h_dim + 2 * inner) * x.dtype.itemsize
                            + (w1.size + w2.size) * w1.dtype.itemsize),
            transcendentals=2 * rows * inner,
        ),
    )(*operands)
    # weight grads: plain matmuls at the MXU floor (XLA); with a mask the
    # MLP-output cotangent is g*m
    gm2 = g2 if m2 is None else (g2.astype(jnp.float32)
                                 * m2.astype(jnp.float32)).astype(g2.dtype)
    dw1 = jnp.matmul(y.T, dh1, preferred_element_type=jnp.float32
                     ).astype(w1.dtype)
    db1 = jnp.sum(dh1.astype(jnp.float32), axis=0).astype(b1.dtype)
    dw2 = jnp.matmul(a.T, gm2, preferred_element_type=jnp.float32
                     ).astype(w2.dtype)
    db2 = jnp.sum(gm2.astype(jnp.float32), axis=0).astype(b2.dtype)
    return (dgamma.reshape(-1).astype(gamma.dtype),
            dbeta.reshape(-1).astype(beta.dtype),
            dw1, db1, dw2, db2, dx.reshape(shape))


# ---------------------------------------------------------------------------
# Int8 weight-only variant of the fused MLP block
# ---------------------------------------------------------------------------
#
# ops/quantize.py stores encoder linears as {w_q int8, w_scale (1, out)};
# without this kernel a quantized model would silently fall back to the XLA
# composition and LOSE the fused-kernel speed (8.78 vs 7.63 ms at batch 16).
# Dequantization happens in-kernel (int8 weights resident in VMEM at half
# the bytes; the per-program dequant is ~2.4M VPU multiplies against a
# 19 GFLOP matmul).

def _mlp_kernel_q8(x_ref, g_ref, bta_ref, w1q_ref, s1_ref, b1_ref,
                   w2q_ref, s2_ref, b2_ref, out_ref, *, eps, act):
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = (y * g_ref[0] + bta_ref[0]).astype(x.dtype)
    w1 = (w1q_ref[...].astype(jnp.float32) * s1_ref[...]).astype(x.dtype)
    h = jnp.dot(y, w1, preferred_element_type=jnp.float32) + b1_ref[0]
    h = _kernel_act(act)(h).astype(x.dtype)
    w2 = (w2q_ref[...].astype(jnp.float32) * s2_ref[...]).astype(x.dtype)
    o = jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2_ref[0]
    out_ref[...] = o.astype(out_ref.dtype) + x


@functools.partial(jax.jit,
                   static_argnames=("eps", "act", "interpret", "row_tile"))
def fused_mlp_block_fwd_q8(gamma, beta, w1q, s1, b1, w2q, s2, b2, x,
                           eps: float = 1e-12, act: str = "gelu",
                           interpret: bool | None = None,
                           row_tile: int = ROW_TILE) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = x.shape
    h_dim = shape[-1]
    rows = x.size // h_dim
    x2 = x.reshape(rows, h_dim)
    tile = _pick_row_tile(rows, row_tile)
    row_spec = pl.BlockSpec((tile, h_dim), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    g2, bta2, b1_2, b2_2 = (v.reshape(1, -1) for v in (gamma, beta, b1, b2))
    s1_2, s2_2 = s1.reshape(1, -1), s2.reshape(1, -1)
    out = pl.pallas_call(
        functools.partial(_mlp_kernel_q8, eps=eps, act=act),
        grid=(rows // tile,),
        in_specs=[row_spec, full(g2), full(bta2), full(w1q), full(s1_2),
                  full(b1_2), full(w2q), full(s2_2), full(b2_2)],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((rows, h_dim), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * rows * h_dim * w1q.shape[1],
            bytes_accessed=(2 * rows * h_dim * x.dtype.itemsize
                            + w1q.size + w2q.size),
            transcendentals=rows * w1q.shape[1],
        ),
    )(x2, g2, bta2, w1q, s1_2, b1_2, w2q, s2_2, b2_2)
    return out.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _fused_mlp_q8(gamma, beta, w1q, s1, b1, w2q, s2, b2, x, eps, act):
    return fused_mlp_block_fwd_q8(gamma, beta, w1q, s1, b1, w2q, s2, b2, x,
                                  eps, act)


def _fused_mlp_q8_fwd(gamma, beta, w1q, s1, b1, w2q, s2, b2, x, eps, act):
    return (_fused_mlp_q8(gamma, beta, w1q, s1, b1, w2q, s2, b2, x, eps, act),
            (gamma, beta, w1q, s1, b1, w2q, s2, b2, x))


def _fused_mlp_q8_bwd(eps, act, residuals, g):
    gamma, beta, w1q, s1, b1, w2q, s2, b2, x = residuals

    def f(gamma, beta, s1, b1, s2, b2, x):
        return _mlp_block_xla({"scale": gamma, "bias": beta},
                              {"w_q": w1q, "w_scale": s1, "b": b1},
                              {"w_q": w2q, "w_scale": s2, "b": b2},
                              x, eps, act)

    _, vjp = jax.vjp(f, gamma, beta, s1, b1, s2, b2, x)
    dgamma, dbeta, ds1, db1, ds2, db2, dx = vjp(g)
    return dgamma, dbeta, None, ds1, db1, None, ds2, db2, dx


_fused_mlp_q8.defvjp(_fused_mlp_q8_fwd, _fused_mlp_q8_bwd)


# ---------------------------------------------------------------------------
# w8a8 variant of the fused MLP block (int8 MXU serving path)
# ---------------------------------------------------------------------------
#
# ops/quantize.py mode="w8a8" stores encoder linears as {w_q8 int8,
# w_scale}; ops/nn.linear then quantizes activations per row and runs the
# matmul int8 x int8 -> int32 on the MXU's double-rate int8 path
# (scripts/probe_int8_matmul.py measured the deployed MLP matmul pair
# 1.48x faster than bf16 INCLUDING the dynamic requant).  This kernel keeps
# the LN/GELU/quantize elementwise passes fused on top of that: per row
# tile, LN -> per-row absmax quant -> int8 dot -> dequant+bias+GELU ->
# requant -> int8 dot -> dequant+bias -> +residual, with the int8 weights
# (half the bf16 bytes) resident in VMEM and no HBM intermediate.
# Numerics match the XLA w8a8 composition (nn.linear "w_q8" branch): the
# int8 dots are EXACT in int32, so fused-vs-XLA differences come only from
# the erf approximation and fp32-vs-bf16 cast points, same as the other
# kernels.  Inference-only (the activation round has zero gradient); the
# vjp falls back to the XLA composition like the q8 kernels.

def _rowquant(y):
    """fp32 (R, F) -> (int8, per-row fp32 scale), in-kernel.  Delegates to
    ops/quantize.quantize_activation (pure jnp, so it traces inside a Pallas
    kernel body) — ONE definition of the quantization rule keeps the fused
    kernels bit-identical to the XLA w8a8 path (nn.linear) and the TP
    exactness argument (tests/test_tp_serving.py) valid."""
    from vault_tpu.ops.quantize import quantize_activation

    return quantize_activation(y)


def _mlp_kernel_w8a8(x_ref, g_ref, bta_ref, w1q_ref, s1_ref, b1_ref,
                     w2q_ref, s2_ref, b2_ref, out_ref, *, eps, act):
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = ((y * g_ref[0] + bta_ref[0]).astype(x.dtype)).astype(jnp.float32)
    yq, ys = _rowquant(y)
    h = jnp.dot(yq, w1q_ref[...], preferred_element_type=jnp.int32)
    hf = h.astype(jnp.float32) * (ys * s1_ref[...]) + b1_ref[0]
    hf = _kernel_act(act)(hf).astype(x.dtype).astype(jnp.float32)
    hq, hs = _rowquant(hf)
    o = jnp.dot(hq, w2q_ref[...], preferred_element_type=jnp.int32)
    of = o.astype(jnp.float32) * (hs * s2_ref[...]) + b2_ref[0]
    out_ref[...] = of.astype(out_ref.dtype) + x


@functools.partial(jax.jit,
                   static_argnames=("eps", "act", "interpret", "row_tile"))
def fused_mlp_block_fwd_w8a8(gamma, beta, w1q, s1, b1, w2q, s2, b2, x,
                             eps: float = 1e-12, act: str = "gelu",
                             interpret: bool | None = None,
                             row_tile: int = ROW_TILE) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = x.shape
    h_dim = shape[-1]
    rows = x.size // h_dim
    x2 = x.reshape(rows, h_dim)
    tile = _pick_row_tile(rows, row_tile)
    row_spec = pl.BlockSpec((tile, h_dim), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    g2, bta2, b1_2, b2_2 = (v.reshape(1, -1) for v in (gamma, beta, b1, b2))
    s1_2, s2_2 = s1.reshape(1, -1), s2.reshape(1, -1)
    out = pl.pallas_call(
        functools.partial(_mlp_kernel_w8a8, eps=eps, act=act),
        grid=(rows // tile,),
        in_specs=[row_spec, full(g2), full(bta2), full(w1q), full(s1_2),
                  full(b1_2), full(w2q), full(s2_2), full(b2_2)],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((rows, h_dim), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * rows * h_dim * w1q.shape[1],
            bytes_accessed=(2 * rows * h_dim * x.dtype.itemsize
                            + w1q.size + w2q.size),
            transcendentals=rows * w1q.shape[1],
        ),
    )(x2, g2, bta2, w1q, s1_2, b1_2, w2q, s2_2, b2_2)
    return out.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _fused_mlp_w8a8(gamma, beta, w1q, s1, b1, w2q, s2, b2, x, eps, act):
    return fused_mlp_block_fwd_w8a8(gamma, beta, w1q, s1, b1, w2q, s2, b2,
                                    x, eps, act)


def _fused_mlp_w8a8_fwd(gamma, beta, w1q, s1, b1, w2q, s2, b2, x, eps, act):
    return (_fused_mlp_w8a8(gamma, beta, w1q, s1, b1, w2q, s2, b2, x,
                            eps, act),
            (gamma, beta, w1q, s1, b1, w2q, s2, b2, x))


def _fused_mlp_w8a8_bwd(eps, act, residuals, g):
    gamma, beta, w1q, s1, b1, w2q, s2, b2, x = residuals

    def f(gamma, beta, s1, b1, s2, b2, x):
        return _mlp_block_xla({"scale": gamma, "bias": beta},
                              {"w_q8": w1q, "w_scale": s1, "b": b1},
                              {"w_q8": w2q, "w_scale": s2, "b": b2},
                              x, eps, act)

    _, vjp = jax.vjp(f, gamma, beta, s1, b1, s2, b2, x)
    dgamma, dbeta, ds1, db1, ds2, db2, dx = vjp(g)
    return dgamma, dbeta, None, ds1, db1, None, ds2, db2, dx


_fused_mlp_w8a8.defvjp(_fused_mlp_w8a8_fwd, _fused_mlp_w8a8_bwd)


# ---------------------------------------------------------------------------
# Post-LN variant (BERT-style towers): out = LN(x + dropout(MLP(x)))
# ---------------------------------------------------------------------------
#
# Training-mode dropout sits INSIDE this block (BertOutput applies it to the
# MLP output before the residual+LN), which would force the XLA fallback for
# any tower with hidden_dropout_prob > 0 (bert-base trains at 0.1).  Instead
# the caller passes the pre-scaled dropout mask m in {0, 1/keep} — drawn at
# the XLA level with the SAME jax.random.bernoulli call as ops/nn.dropout,
# so fused and XLA paths are stream-identical — and the kernel applies it
# elementwise between the second matmul and the LN.  The big win stays: the
# (rows, 4H) intermediate and the GELU/LN passes never touch HBM; the mask
# adds one (rows, H) read.

def _mlp_postln_xla(ln_p, p_in, p_out, x, eps, act, m=None):
    """The XLA composition (bert.py _encoder_layer MLP half: post-LN,
    modeling_bert.py BertOutput).  ``m``: optional pre-scaled dropout mask."""
    mlp = linear(p_out, act_fn(act)(linear(p_in, x)))
    if m is not None:
        mlp = mlp * m
    return layer_norm(ln_p, x + mlp, eps)


def _mlp_postln_kernel(x_ref, g_ref, bta_ref, w1_ref, b1_ref, w2_ref,
                       b2_ref, *rest, eps, act):
    m_ref = rest[0] if len(rest) == 2 else None
    out_ref = rest[-1]
    x = x_ref[...]                                   # (R, H)
    h = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h = _kernel_act(act)(h + b1_ref[0]).astype(x.dtype)
    o = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    mlp = o + b2_ref[0]
    if m_ref is not None:
        mlp = mlp * m_ref[...].astype(jnp.float32)
    s = x.astype(jnp.float32) + mlp
    mean = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s - mean), axis=-1, keepdims=True)
    y = (s - mean) * jax.lax.rsqrt(var + eps)
    out_ref[...] = (y * g_ref[0] + bta_ref[0]).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("eps", "act", "interpret", "row_tile"))
def fused_mlp_postln_fwd(gamma, beta, w1, b1, w2, b2, x, m=None,
                         eps: float = 1e-12, act: str = "gelu",
                         interpret: bool | None = None,
                         row_tile: int = ROW_TILE) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = x.shape
    h_dim = shape[-1]
    rows = x.size // h_dim
    x2 = x.reshape(rows, h_dim)
    tile = _pick_row_tile(rows, row_tile)
    row_spec = pl.BlockSpec((tile, h_dim), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    g2, bta2, b1_2, b2_2 = (v.reshape(1, -1) for v in (gamma, beta, b1, b2))
    operands = [x2, g2, bta2, w1, b1_2, w2, b2_2]
    in_specs = [row_spec, full(g2), full(bta2), full(w1), full(b1_2),
                full(w2), full(b2_2)]
    if m is not None:
        operands.append(m.reshape(rows, h_dim))
        in_specs.append(row_spec)
    out = pl.pallas_call(
        functools.partial(_mlp_postln_kernel, eps=eps, act=act),
        grid=(rows // tile,),
        in_specs=in_specs,
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((rows, h_dim), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * rows * h_dim * w1.shape[1],
            bytes_accessed=(2 * rows * h_dim * x.dtype.itemsize
                            + w1.size * w1.dtype.itemsize
                            + w2.size * w2.dtype.itemsize),
            transcendentals=rows * w1.shape[1],
        ),
    )(*operands)
    return out.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused_mlp_postln(gamma, beta, w1, b1, w2, b2, x, eps, act):
    return fused_mlp_postln_fwd(gamma, beta, w1, b1, w2, b2, x,
                                eps=eps, act=act)


def _fused_mlp_postln_fwd(gamma, beta, w1, b1, w2, b2, x, eps, act):
    return (_fused_mlp_postln(gamma, beta, w1, b1, w2, b2, x, eps, act),
            (gamma, beta, w1, b1, w2, b2, x))


def _fused_mlp_postln_bwd(eps, act, residuals, g):
    gamma, beta, w1, b1, w2, b2, x = residuals
    if act == "gelu":
        # fused backward kernel (recompute-in-VMEM; fused_mlp_postln_bwd)
        return fused_mlp_postln_block_bwd(gamma, beta, w1, b1, w2, b2, x, g,
                                          eps=eps)

    def f(gamma, beta, w1, b1, w2, b2, x):
        return _mlp_postln_xla({"scale": gamma, "bias": beta},
                               {"w": w1, "b": b1}, {"w": w2, "b": b2},
                               x, eps, act)

    _, vjp = jax.vjp(f, gamma, beta, w1, b1, w2, b2, x)
    return vjp(g)


_fused_mlp_postln.defvjp(_fused_mlp_postln_fwd, _fused_mlp_postln_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _fused_mlp_postln_m(gamma, beta, w1, b1, w2, b2, x, m, eps, act):
    return fused_mlp_postln_fwd(gamma, beta, w1, b1, w2, b2, x, m,
                                eps=eps, act=act)


def _fused_mlp_postln_m_fwd(gamma, beta, w1, b1, w2, b2, x, m, eps, act):
    return (_fused_mlp_postln_m(gamma, beta, w1, b1, w2, b2, x, m, eps, act),
            (gamma, beta, w1, b1, w2, b2, x, m))


def _fused_mlp_postln_m_bwd(eps, act, residuals, g):
    gamma, beta, w1, b1, w2, b2, x, m = residuals
    if act == "gelu":
        out = fused_mlp_postln_block_bwd(gamma, beta, w1, b1, w2, b2, x, g,
                                         m, eps=eps)
        return (*out, None)  # the mask is a constant of the draw

    def f(gamma, beta, w1, b1, w2, b2, x):
        return _mlp_postln_xla({"scale": gamma, "bias": beta},
                               {"w": w1, "b": b1}, {"w": w2, "b": b2},
                               x, eps, act, m)

    _, vjp = jax.vjp(f, gamma, beta, w1, b1, w2, b2, x)
    return (*vjp(g), None)


_fused_mlp_postln_m.defvjp(_fused_mlp_postln_m_fwd, _fused_mlp_postln_m_bwd)


def fused_postln_mlp(lp, cfg, x, rng, deterministic: bool) -> jax.Array:
    """The shared BERT-layer-shaped dispatch (models/bert.py encoder layers
    and models/modules.py cross layers): draw the pre-scaled dropout mask
    with the SAME bernoulli call as ops/nn.dropout — keeping the fused path
    stream-identical to the XLA composition — then run the fused post-LN
    block.  The mask is drawn in x.dtype (the kernel upcasts in-register),
    so bf16 training reads bf16 mask bytes."""
    from vault_tpu.ops.nn import dropout_mask

    mask = None
    if not deterministic and cfg.hidden_dropout_prob > 0.0:
        mask = dropout_mask(rng, x.shape, cfg.hidden_dropout_prob, x.dtype)
    return fused_mlp_postln_block(lp["mlp_ln"], lp["mlp_in"], lp["mlp_out"],
                                  x, cfg.layer_norm_eps, cfg.hidden_act,
                                  drop_mask=mask)


# int8 weight-only post-LN variant — the quantized-serving counterpart of
# _mlp_kernel_q8 for BERT/Tom* towers, so quantize_model_params keeps the
# fused-kernel speed on the text stacks too (not just the pre-LN ViLT
# blocks): dequant in-kernel, int8 weight bytes resident in VMEM.

def _mlp_postln_kernel_q8(x_ref, g_ref, bta_ref, w1q_ref, s1_ref, b1_ref,
                          w2q_ref, s2_ref, b2_ref, out_ref, *, eps, act):
    x = x_ref[...]
    w1 = (w1q_ref[...].astype(jnp.float32) * s1_ref[...]).astype(x.dtype)
    h = jnp.dot(x, w1, preferred_element_type=jnp.float32)
    h = _kernel_act(act)(h + b1_ref[0]).astype(x.dtype)
    w2 = (w2q_ref[...].astype(jnp.float32) * s2_ref[...]).astype(x.dtype)
    o = jnp.dot(h, w2, preferred_element_type=jnp.float32)
    s = x.astype(jnp.float32) + (o + b2_ref[0])
    mean = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s - mean), axis=-1, keepdims=True)
    y = (s - mean) * jax.lax.rsqrt(var + eps)
    out_ref[...] = (y * g_ref[0] + bta_ref[0]).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("eps", "act", "interpret", "row_tile"))
def fused_mlp_postln_fwd_q8(gamma, beta, w1q, s1, b1, w2q, s2, b2, x,
                            eps: float = 1e-12, act: str = "gelu",
                            interpret: bool | None = None,
                            row_tile: int = ROW_TILE) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = x.shape
    h_dim = shape[-1]
    rows = x.size // h_dim
    x2 = x.reshape(rows, h_dim)
    tile = _pick_row_tile(rows, row_tile)
    row_spec = pl.BlockSpec((tile, h_dim), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    g2, bta2, b1_2, b2_2 = (v.reshape(1, -1) for v in (gamma, beta, b1, b2))
    s1_2, s2_2 = s1.reshape(1, -1), s2.reshape(1, -1)
    out = pl.pallas_call(
        functools.partial(_mlp_postln_kernel_q8, eps=eps, act=act),
        grid=(rows // tile,),
        in_specs=[row_spec, full(g2), full(bta2), full(w1q), full(s1_2),
                  full(b1_2), full(w2q), full(s2_2), full(b2_2)],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((rows, h_dim), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * rows * h_dim * w1q.shape[1],
            bytes_accessed=(2 * rows * h_dim * x.dtype.itemsize
                            + w1q.size + w2q.size),
            transcendentals=rows * w1q.shape[1],
        ),
    )(x2, g2, bta2, w1q, s1_2, b1_2, w2q, s2_2, b2_2)
    return out.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _fused_mlp_postln_q8(gamma, beta, w1q, s1, b1, w2q, s2, b2, x, eps, act):
    return fused_mlp_postln_fwd_q8(gamma, beta, w1q, s1, b1, w2q, s2, b2, x,
                                   eps, act)


def _fused_mlp_postln_q8_fwd(gamma, beta, w1q, s1, b1, w2q, s2, b2, x,
                             eps, act):
    return (_fused_mlp_postln_q8(gamma, beta, w1q, s1, b1, w2q, s2, b2, x,
                                 eps, act),
            (gamma, beta, w1q, s1, b1, w2q, s2, b2, x))


def _fused_mlp_postln_q8_bwd(eps, act, residuals, g):
    gamma, beta, w1q, s1, b1, w2q, s2, b2, x = residuals

    def f(gamma, beta, s1, b1, s2, b2, x):
        return _mlp_postln_xla({"scale": gamma, "bias": beta},
                               {"w_q": w1q, "w_scale": s1, "b": b1},
                               {"w_q": w2q, "w_scale": s2, "b": b2},
                               x, eps, act)

    _, vjp = jax.vjp(f, gamma, beta, s1, b1, s2, b2, x)
    dgamma, dbeta, ds1, db1, ds2, db2, dx = vjp(g)
    return dgamma, dbeta, None, ds1, db1, None, ds2, db2, dx


_fused_mlp_postln_q8.defvjp(_fused_mlp_postln_q8_fwd,
                            _fused_mlp_postln_q8_bwd)


# w8a8 post-LN variant — int8 MXU dots for the BERT-tower MLP blocks (see
# the pre-LN w8a8 section above for the scheme).

def _mlp_postln_kernel_w8a8(x_ref, g_ref, bta_ref, w1q_ref, s1_ref, b1_ref,
                            w2q_ref, s2_ref, b2_ref, out_ref, *, eps, act):
    x = x_ref[...]
    xq, xs = _rowquant(x.astype(jnp.float32))
    h = jnp.dot(xq, w1q_ref[...], preferred_element_type=jnp.int32)
    hf = h.astype(jnp.float32) * (xs * s1_ref[...]) + b1_ref[0]
    hf = _kernel_act(act)(hf).astype(x.dtype).astype(jnp.float32)
    hq, hs = _rowquant(hf)
    o = jnp.dot(hq, w2q_ref[...], preferred_element_type=jnp.int32)
    mlp = o.astype(jnp.float32) * (hs * s2_ref[...]) + b2_ref[0]
    s = x.astype(jnp.float32) + mlp
    mean = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s - mean), axis=-1, keepdims=True)
    y = (s - mean) * jax.lax.rsqrt(var + eps)
    out_ref[...] = (y * g_ref[0] + bta_ref[0]).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("eps", "act", "interpret", "row_tile"))
def fused_mlp_postln_fwd_w8a8(gamma, beta, w1q, s1, b1, w2q, s2, b2, x,
                              eps: float = 1e-12, act: str = "gelu",
                              interpret: bool | None = None,
                              row_tile: int = ROW_TILE) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = x.shape
    h_dim = shape[-1]
    rows = x.size // h_dim
    x2 = x.reshape(rows, h_dim)
    tile = _pick_row_tile(rows, row_tile)
    row_spec = pl.BlockSpec((tile, h_dim), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    g2, bta2, b1_2, b2_2 = (v.reshape(1, -1) for v in (gamma, beta, b1, b2))
    s1_2, s2_2 = s1.reshape(1, -1), s2.reshape(1, -1)
    out = pl.pallas_call(
        functools.partial(_mlp_postln_kernel_w8a8, eps=eps, act=act),
        grid=(rows // tile,),
        in_specs=[row_spec, full(g2), full(bta2), full(w1q), full(s1_2),
                  full(b1_2), full(w2q), full(s2_2), full(b2_2)],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((rows, h_dim), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * rows * h_dim * w1q.shape[1],
            bytes_accessed=(2 * rows * h_dim * x.dtype.itemsize
                            + w1q.size + w2q.size),
            transcendentals=rows * w1q.shape[1],
        ),
    )(x2, g2, bta2, w1q, s1_2, b1_2, w2q, s2_2, b2_2)
    return out.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _fused_mlp_postln_w8a8(gamma, beta, w1q, s1, b1, w2q, s2, b2, x,
                           eps, act):
    return fused_mlp_postln_fwd_w8a8(gamma, beta, w1q, s1, b1, w2q, s2, b2,
                                     x, eps, act)


def _fused_mlp_postln_w8a8_fwd(gamma, beta, w1q, s1, b1, w2q, s2, b2, x,
                               eps, act):
    return (_fused_mlp_postln_w8a8(gamma, beta, w1q, s1, b1, w2q, s2, b2,
                                   x, eps, act),
            (gamma, beta, w1q, s1, b1, w2q, s2, b2, x))


def _fused_mlp_postln_w8a8_bwd(eps, act, residuals, g):
    gamma, beta, w1q, s1, b1, w2q, s2, b2, x = residuals

    def f(gamma, beta, s1, b1, s2, b2, x):
        return _mlp_postln_xla({"scale": gamma, "bias": beta},
                               {"w_q8": w1q, "w_scale": s1, "b": b1},
                               {"w_q8": w2q, "w_scale": s2, "b": b2},
                               x, eps, act)

    _, vjp = jax.vjp(f, gamma, beta, s1, b1, s2, b2, x)
    dgamma, dbeta, ds1, db1, ds2, db2, dx = vjp(g)
    return dgamma, dbeta, None, ds1, db1, None, ds2, db2, dx


_fused_mlp_postln_w8a8.defvjp(_fused_mlp_postln_w8a8_fwd,
                              _fused_mlp_postln_w8a8_bwd)


def fused_mlp_postln_block(ln_p, p_in, p_out, x, eps: float = 1e-12,
                           act: str = "gelu", drop_mask=None) -> jax.Array:
    """Drop-in for the post-LN MLP half of a BERT encoder layer.  Fp, int8
    weight-only ({w_q, w_scale}) and w8a8 ({w_q8, w_scale}) quantized
    weights each have a fused kernel, like the pre-LN block.  ``drop_mask``:
    optional pre-scaled dropout mask in {0, 1/keep} applied to the MLP
    output (BertOutput dropout) inside the kernel (fp kernels only;
    quantized weights with a mask fall back)."""
    if "w" in p_in and "w" in p_out:
        if drop_mask is None:
            return _fused_mlp_postln(ln_p["scale"], ln_p["bias"], p_in["w"],
                                     p_in["b"], p_out["w"], p_out["b"], x,
                                     eps, act)
        return _fused_mlp_postln_m(ln_p["scale"], ln_p["bias"], p_in["w"],
                                   p_in["b"], p_out["w"], p_out["b"], x,
                                   drop_mask, eps, act)
    if "w_q" in p_in and "w_q" in p_out and drop_mask is None:
        return _fused_mlp_postln_q8(ln_p["scale"], ln_p["bias"],
                                    p_in["w_q"], p_in["w_scale"], p_in["b"],
                                    p_out["w_q"], p_out["w_scale"],
                                    p_out["b"], x, eps, act)
    if "w_q8" in p_in and "w_q8" in p_out and drop_mask is None:
        return _fused_mlp_postln_w8a8(ln_p["scale"], ln_p["bias"],
                                      p_in["w_q8"], p_in["w_scale"],
                                      p_in["b"],
                                      p_out["w_q8"], p_out["w_scale"],
                                      p_out["b"], x, eps, act)
    return _mlp_postln_xla(ln_p, p_in, p_out, x, eps, act, drop_mask)


# ---------------------------------------------------------------------------
# Fused post-LN MLP-block BACKWARD kernel (BERT towers)
# ---------------------------------------------------------------------------
#
# Same recompute-in-VMEM scheme as _mlp_bwd_kernel, adapted to the post-LN
# dataflow out = LN(x + MLP(x)): the LN backward runs FIRST (producing ds,
# the gradient at the residual sum), then splits into the residual path and
# the MLP chain.  Emits per row tile:
#   dx          = ds + (ds @ W2^T * gelu'(h1)) @ W1^T
#   dh1, a, ds  — the minimal activations the weight-grad matmuls need
# (dW1 = x^T dh1 needs only x, which is the kernel INPUT — one emitted
# tensor fewer than the pre-LN kernel, which must export the normalized y.)

def _mlp_postln_bwd_kernel(x_ref, g_ref, gamma_ref, b1_ref, b2_ref, w1_ref,
                           w2_ref, *rest, eps):
    m_ref = rest[0] if len(rest) == 7 else None
    dx_ref, dh1_ref, a_ref, ds_ref, dgamma_ref, dbeta_ref = rest[-6:]
    x = x_ref[...]                                     # (R, H)
    g = g_ref[...].astype(jnp.float32)
    gamma = gamma_ref[0]
    m = None if m_ref is None else m_ref[...].astype(jnp.float32)
    # ---- recompute the forward chain in VMEM
    h1 = jnp.dot(x, w1_ref[...],
                 preferred_element_type=jnp.float32) + b1_ref[0]
    a = 0.5 * h1 * (1.0 + _erf_approx(h1 * (2.0 ** -0.5)))
    ac = a.astype(x.dtype)
    o = jnp.dot(ac, w2_ref[...], preferred_element_type=jnp.float32)
    mlp = o + b2_ref[0]
    if m is not None:
        mlp = mlp * m
    s = x.astype(jnp.float32) + mlp
    mean = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    shat = (s - mean) * rstd
    # ---- backward: LN first, then the (masked) MLP chain
    dshat = g * gamma
    m1 = jnp.mean(dshat, axis=-1, keepdims=True)
    m2 = jnp.mean(dshat * shat, axis=-1, keepdims=True)
    ds = (dshat - m1 - shat * m2) * rstd
    dmlp = ds if m is None else ds * m   # grad at the pre-dropout MLP output
    dmlpc = dmlp.astype(x.dtype)
    da = jax.lax.dot_general(dmlpc, w2_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # @ W2^T
    dh1 = da * _gelu_grad(h1)
    dh1c = dh1.astype(x.dtype)
    dxm = jax.lax.dot_general(dh1c, w1_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # dh1 @ W1^T
    dx_ref[...] = (ds + dxm).astype(dx_ref.dtype)      # + residual path
    dh1_ref[...] = dh1c
    a_ref[...] = ac
    ds_ref[...] = dmlpc   # dW2 = a^T dmlp, db2 = sum dmlp
    # ---- LN param grads accumulate across the (sequential) grid
    part_g = jnp.sum(g * shat, axis=0, keepdims=True)
    part_b = jnp.sum(g, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dgamma_ref[...] = jnp.zeros_like(dgamma_ref)
        dbeta_ref[...] = jnp.zeros_like(dbeta_ref)

    dgamma_ref[...] += part_g
    dbeta_ref[...] += part_b


@functools.partial(jax.jit, static_argnames=("eps", "interpret", "row_tile"))
def fused_mlp_postln_block_bwd(gamma, beta, w1, b1, w2, b2, x, g, m=None,
                               eps: float = 1e-12,
                               interpret: bool | None = None,
                               row_tile: int = BWD_ROW_TILE):
    """Gradients of ``LN(x + m*(gelu(x@W1+b1)@W2+b2))`` w.r.t. every input
    (``m``: optional pre-scaled dropout mask, treated as a constant).
    Returns (dgamma, dbeta, dw1, db1, dw2, db2, dx)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = x.shape
    h_dim = shape[-1]
    inner = w1.shape[1]
    rows = x.size // h_dim
    x2 = x.reshape(rows, h_dim)
    g2 = g.reshape(rows, h_dim)
    tile = _pick_row_tile(rows, row_tile)
    row_h = pl.BlockSpec((tile, h_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    row_i = pl.BlockSpec((tile, inner), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    acc = pl.BlockSpec((1, h_dim), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    gam2, b1_2, b2_2 = (v.reshape(1, -1) for v in (gamma, b1, b2))
    operands = [x2, g2, gam2, b1_2, b2_2, w1, w2]
    in_specs = [row_h, row_h, full(gam2), full(b1_2), full(b2_2),
                full(w1), full(w2)]
    if m is not None:
        operands.append(m.reshape(rows, h_dim))
        in_specs.append(row_h)
    dx, dh1, a, ds, dgamma, dbeta = pl.pallas_call(
        functools.partial(_mlp_postln_bwd_kernel, eps=eps),
        grid=(rows // tile,),
        in_specs=in_specs,
        out_specs=[row_h, row_i, row_i, row_h, acc, acc],
        out_shape=[
            jax.ShapeDtypeStruct((rows, h_dim), x.dtype),
            jax.ShapeDtypeStruct((rows, inner), x.dtype),
            jax.ShapeDtypeStruct((rows, inner), x.dtype),
            jax.ShapeDtypeStruct((rows, h_dim), x.dtype),
            jax.ShapeDtypeStruct((1, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((1, h_dim), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=BWD_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * rows * h_dim * inner,
            bytes_accessed=(rows * (4 * h_dim + 2 * inner) * x.dtype.itemsize
                            + (w1.size + w2.size) * w1.dtype.itemsize),
            transcendentals=2 * rows * inner,
        ),
    )(*operands)
    # weight grads: plain matmuls at the MXU floor (XLA)
    dw1 = jnp.matmul(x2.T, dh1, preferred_element_type=jnp.float32
                     ).astype(w1.dtype)
    db1 = jnp.sum(dh1.astype(jnp.float32), axis=0).astype(b1.dtype)
    dw2 = jnp.matmul(a.T, ds, preferred_element_type=jnp.float32
                     ).astype(w2.dtype)
    db2 = jnp.sum(ds.astype(jnp.float32), axis=0).astype(b2.dtype)
    return (dgamma.reshape(-1).astype(gamma.dtype),
            dbeta.reshape(-1).astype(beta.dtype),
            dw1, db1, dw2, db2, dx.reshape(shape))
