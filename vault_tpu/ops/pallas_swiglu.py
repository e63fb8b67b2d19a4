"""Fused w8a8 RMSNorm -> SwiGLU -> residual kernel at Llama geometry.

Why this exists (measured ladder, docs/BENCHMARKS.md "Llama" section):
the 8B tower's per-layer cost is 1.3225 ms of which the MLP block
(RMSNorm -> silu(x@Wg) * (x@Wu) @ Wd -> residual, all w8a8) is 0.954 ms —
but the bare int8 matmul chain at the same shapes (including the dynamic
per-row requant) runs in 0.687 ms (328 TFLOP/s).  The ~0.27 ms gap is
elementwise/requant HBM passes XLA schedules around the matmuls.  The
encoder's fused w8a8 MLP kernel (ops/pallas_mlp.py) already eliminates
that class of traffic at H=768 where both weight matrices fit in VMEM;
at Llama geometry (H=4096, I=14336) the three weights are ~56 MB each,
so this kernel TILES the intermediate dimension instead:

  grid = (row_tiles, i_tiles), I innermost
  i == 0:        RMSNorm(x) -> per-row int8 quant into VMEM scratch
  every i:       g = xq @ Wg[:, ti] ; u = xq @ Wu[:, ti]   (int8 MXU)
                 a = silu(g) * u  -> per-(row, i-tile) int8 requant
                 acc += (aq @ Wd[ti, :]) * a_scale         (int8 MXU)
  i == last:     out = x + acc * d_scale

The (rows, I) fp32 intermediate never touches HBM, each weight byte is
read once per ROW TILE (row_tile defaults to 640 = the serving probe's
batch16 x seq40, so once per step at that geometry), and the requant
row-max never makes an extra pass over HBM.

MEASURED OUTCOME (queue part 13, docs/BENCHMARKS.md Llama section): the
kernel wins where it fuses — the isolated MLP chain drops 0.954 ->
0.789 ms/layer (286 TFLOP/s implied) — but LOSES 26% on the deployed
scanned tower (60.13 vs 47.84 ms same-session pair), because (a) a
custom-call operand forces XLA to materialize each layer's ~168 MB
weight slice out of the scan's stacked arrays (~0.4 ms/layer of pure
HBM copy; the XLA dot consumes the slice in its operand load), and
(b) the call is a scheduling barrier that un-overlaps the attention
block's elementwise from the MLP matmuls (+0.13 ms/layer on the flat
layer).  LlamaConfig.mlp_impl therefore stays "xla" by default; use
"pallas" only with flat (unstacked) per-layer weights.

Quantization grouping: the SwiGLU intermediate is quantized per
(row, i-tile) — FINER than the XLA path's per-row-over-all-I
(ops/nn.linear "w_q8" branch), because the row max inside one 2048-wide
tile is <= the row max over all 14336 columns.  Strictly more scale
resolution, so accuracy is bounded by the XLA w8a8 path's; the fused
output is NOT bit-identical to it (tests pin both: exact vs an XLA
reference with the same grouping, bounded vs the per-row path).

Inference-only math (the activation round has zero gradient); the vjp
falls back to the XLA composition like the encoder w8a8 kernels.  The
VAuLT recipe freezes the LM tower anyway (models/vault.py stop_gradient;
reference vault/models/vault/model.py:104-116 freeze_lm).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vault_tpu.ops.pallas_mlp import _pick_row_tile, _rowquant

# batch16 x seq40 = 640 rows in one pass => each weight byte read once per
# step; 14336 = 14 i-tiles of 1024; (4096, 1024) int8 block = 4 MB in VMEM.
# Per i-step at these defaults: ~16 GOP of int8 matmul (41 us at peak) vs
# 12 MB of weight blocks (15 us at HBM speed) — compute-bound with room to
# double-buffer.  Whole-kernel VMEM ~90 MB (24 MB weight blocks + row
# blocks + 13 MB scratch + matmul/elementwise stack), far over the 16 MB
# default scoped-vmem budget (the first on-chip compile OOMed exactly
# there), so the pallas_call carries an explicit vmem_limit_bytes.  The
# env knobs are the queue's retry lever if a remote compile still
# reports VMEM pressure.
ROW_TILE = int(os.environ.get("SWIGLU_ROW_TILE", "640"))
I_TILE = int(os.environ.get("SWIGLU_I_TILE", "1024"))
VMEM_LIMIT = int(os.environ.get("SWIGLU_VMEM_LIMIT", str(100 * 2**20)))


def _rms_norm_f32(w, x, eps):
    """models/llama._rms_norm numerics, kept fp32 for the quant step."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (w * y).astype(x.dtype).astype(jnp.float32)


def swiglu_block_xla(ln_w, p_gate, p_up, p_down, x, eps):
    """The reference XLA composition (models/llama.py _layer MLP half),
    any weight form nn.linear accepts."""
    from vault_tpu.ops.nn import linear
    from vault_tpu.models.llama import _rms_norm

    y = _rms_norm(ln_w, x, eps)
    mlp = jax.nn.silu(linear(p_gate, y)) * linear(p_up, y)
    return x + linear(p_down, mlp)


def swiglu_block_xla_grouped(ln_w, wgq, sg, wuq, su, wdq, sd, x, eps,
                             i_tile: int = I_TILE):
    """XLA composition with the KERNEL's per-(row, i-tile) requant grouping
    and per-tile f32 accumulation order — the exactness reference for the
    fused kernel's parity tests (test-only; loops in Python)."""
    shape = x.shape
    h = shape[-1]
    x2 = x.reshape(-1, h)
    i_dim = wgq.shape[1]
    ti = _pick_row_tile(i_dim, i_tile)
    y = _rms_norm_f32(ln_w, x2, eps)
    xq, xs = _rowquant(y)
    acc = jnp.zeros((x2.shape[0], h), jnp.float32)
    for t0 in range(0, i_dim, ti):
        g = jnp.matmul(xq, wgq[:, t0:t0 + ti],
                       preferred_element_type=jnp.int32)
        g = g.astype(jnp.float32) * (xs * sg[:, t0:t0 + ti])
        u = jnp.matmul(xq, wuq[:, t0:t0 + ti],
                       preferred_element_type=jnp.int32)
        u = u.astype(jnp.float32) * (xs * su[:, t0:t0 + ti])
        a = jax.nn.silu(g) * u
        a = a.astype(x.dtype).astype(jnp.float32)
        aq, asc = _rowquant(a)
        d = jnp.matmul(aq, wdq[t0:t0 + ti, :],
                       preferred_element_type=jnp.int32)
        acc = acc + d.astype(jnp.float32) * asc
    out = x2 + (acc * sd).astype(x.dtype)
    return out.reshape(shape)


def _swiglu_kernel_w8a8(x_ref, ln_ref, wgq_ref, sg_ref, wuq_ref, su_ref,
                        wdq_ref, sd_ref, out_ref, xq_s, xs_s, acc_s, *, eps):
    i = pl.program_id(1)
    n_i = pl.num_programs(1)

    @pl.when(i == 0)
    def _prologue():
        y = _rms_norm_f32(ln_ref[0], x_ref[...], eps)
        xq, xs = _rowquant(y)
        xq_s[...] = xq
        xs_s[...] = xs
        acc_s[...] = jnp.zeros_like(acc_s)

    xq = xq_s[...]
    xs = xs_s[...]
    g = jnp.dot(xq, wgq_ref[...], preferred_element_type=jnp.int32)
    g = g.astype(jnp.float32) * (xs * sg_ref[...])
    u = jnp.dot(xq, wuq_ref[...], preferred_element_type=jnp.int32)
    u = u.astype(jnp.float32) * (xs * su_ref[...])
    a = jax.nn.silu(g) * u
    a = a.astype(x_ref.dtype).astype(jnp.float32)
    aq, asc = _rowquant(a)
    d = jnp.dot(aq, wdq_ref[...], preferred_element_type=jnp.int32)
    acc_s[...] += d.astype(jnp.float32) * asc

    @pl.when(i == n_i - 1)
    def _epilogue():
        x = x_ref[...]
        out_ref[...] = x + (acc_s[...] * sd_ref[...]).astype(x.dtype)


@functools.partial(jax.jit,
                   static_argnames=("eps", "interpret", "row_tile", "i_tile"))
def fused_swiglu_block_fwd_w8a8(ln_w, wgq, sg, wuq, su, wdq, sd, x,
                                eps: float = 1e-5,
                                interpret: bool | None = None,
                                row_tile: int = ROW_TILE,
                                i_tile: int = I_TILE) -> jax.Array:
    """x: (..., H) bf16 -> same shape.  Weights: wgq/wuq (H, I) int8 with
    per-out-column scales sg/su (1, I); wdq (I, H) int8 with sd (1, H) —
    the {w_q8, w_scale} form from ops/quantize (no biases; Llama has none).
    Rows tile at the largest divisor <= row_tile, I at <= i_tile."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = x.shape
    h = shape[-1]
    rows = x.size // h
    i_dim = wgq.shape[1]
    x2 = x.reshape(rows, h)
    tr = _pick_row_tile(rows, row_tile)
    ti = _pick_row_tile(i_dim, i_tile)
    grid = (rows // tr, i_dim // ti)
    row_spec = pl.BlockSpec((tr, h), lambda r, i: (r, 0),
                            memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda r, i: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    ln2 = ln_w.reshape(1, -1)
    sd2 = sd.reshape(1, -1)
    out = pl.pallas_call(
        functools.partial(_swiglu_kernel_w8a8, eps=eps),
        grid=grid,
        in_specs=[
            row_spec,
            const(ln2),
            pl.BlockSpec((h, ti), lambda r, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti), lambda r, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, ti), lambda r, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti), lambda r, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, h), lambda r, i: (i, 0),
                         memory_space=pltpu.VMEM),
            const(sd2),
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((rows, h), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tr, h), jnp.int8),      # xq
            pltpu.VMEM((tr, 1), jnp.float32),   # xs
            pltpu.VMEM((tr, h), jnp.float32),   # down accumulator
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * rows * h * i_dim,
            bytes_accessed=(2 * rows * h * x.dtype.itemsize
                            + (rows // tr) * (wgq.size + wuq.size
                                              + wdq.size)),
            transcendentals=rows * i_dim,
        ),
    )(x2, ln2, wgq, sg.reshape(1, -1), wuq, su.reshape(1, -1), wdq, sd2)
    return out.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _fused_swiglu_w8a8(ln_w, wgq, sg, wuq, su, wdq, sd, x, eps):
    return fused_swiglu_block_fwd_w8a8(ln_w, wgq, sg, wuq, su, wdq, sd, x,
                                       eps=eps)


def _fused_swiglu_w8a8_fwd(ln_w, wgq, sg, wuq, su, wdq, sd, x, eps):
    return (_fused_swiglu_w8a8(ln_w, wgq, sg, wuq, su, wdq, sd, x, eps),
            (ln_w, wgq, sg, wuq, su, wdq, sd, x))


def _fused_swiglu_w8a8_bwd(eps, residuals, g):
    ln_w, wgq, sg, wuq, su, wdq, sd, x = residuals

    def f(ln_w, sg, su, sd, x):
        return swiglu_block_xla(ln_w, {"w_q8": wgq, "w_scale": sg},
                                {"w_q8": wuq, "w_scale": su},
                                {"w_q8": wdq, "w_scale": sd}, x, eps)

    _, vjp = jax.vjp(f, ln_w, sg, su, sd, x)
    dln, dsg, dsu, dsd, dx = vjp(g)
    return dln, None, dsg, None, dsu, None, dsd, dx


_fused_swiglu_w8a8.defvjp(_fused_swiglu_w8a8_fwd, _fused_swiglu_w8a8_bwd)


def swiglu_block(ln_w, p_gate, p_up, p_down, x, eps: float = 1e-5):
    """Drop-in for the Llama layer's MLP half.  w8a8 params ({w_q8,
    w_scale} on all three projections) take the fused kernel; anything
    else falls back to the XLA composition."""
    if "w_q8" in p_gate and "w_q8" in p_up and "w_q8" in p_down:
        return _fused_swiglu_w8a8(ln_w, p_gate["w_q8"], p_gate["w_scale"],
                                  p_up["w_q8"], p_up["w_scale"],
                                  p_down["w_q8"], p_down["w_scale"], x, eps)
    return swiglu_block_xla(ln_w, p_gate, p_up, p_down, x, eps)
