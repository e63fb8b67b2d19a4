"""Fused w8a8 SwiGLU kernel parity (interpreter mode on CPU).

Three contracts:
  * exactness vs the XLA reference with the SAME per-(row, i-tile)
    requant grouping and per-tile accumulation order;
  * a bounded divergence vs the deployed per-row XLA w8a8 path
    (ops/nn.linear "w_q8" branch) — the kernel's grouping is strictly
    finer, so it is a different (better-resolved) quantization;
  * the tiny Llama tower end-to-end with mlp_impl="pallas" (single
    i-tile at tiny geometry => grouping identical to per-row).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vault_tpu.ops.pallas_swiglu import (
    fused_swiglu_block_fwd_w8a8,
    swiglu_block_xla,
    swiglu_block_xla_grouped,
    _fused_swiglu_w8a8,
)
from vault_tpu.ops.quantize import quantize_weight


def _mk(rng, rows, h, i_dim):
    def qw(a, b):
        w = jnp.asarray(rng.normal(size=(a, b)) * 0.05, jnp.float32)
        q, s = quantize_weight(w)
        return q, s

    wgq, sg = qw(h, i_dim)
    wuq, su = qw(h, i_dim)
    wdq, sd = qw(i_dim, h)
    ln = jnp.asarray(1.0 + 0.1 * rng.normal(size=(h,)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(rows, h)) * 0.5, jnp.bfloat16)
    return ln, wgq, sg, wuq, su, wdq, sd, x


@pytest.mark.parametrize("rows,h,i_dim,rt,it", [
    (8, 64, 32, 8, 32),    # single tile both dims
    (8, 64, 32, 4, 16),    # 2 row tiles x 2 i tiles
    (6, 32, 48, 3, 16),    # non-power-of-two tiling
])
def test_fused_matches_grouped_reference(rows, h, i_dim, rt, it):
    rng = np.random.default_rng(0)
    ln, wgq, sg, wuq, su, wdq, sd, x = _mk(rng, rows, h, i_dim)
    ref = swiglu_block_xla_grouped(ln, wgq, sg, wuq, su, wdq, sd, x,
                                   eps=1e-5, i_tile=it)
    out = fused_swiglu_block_fwd_w8a8(ln, wgq, sg, wuq, su, wdq, sd, x,
                                      eps=1e-5, interpret=True,
                                      row_tile=rt, i_tile=it)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-5)


def test_fused_bounded_vs_per_row_path():
    # multi-i-tile geometry: the kernel's per-tile requant differs from
    # the per-row XLA path, but only through int8 rounding at finer
    # scales — bound the drift relative to the output spread.
    rng = np.random.default_rng(1)
    rows, h, i_dim = 8, 64, 64
    ln, wgq, sg, wuq, su, wdq, sd, x = _mk(rng, rows, h, i_dim)
    xla = swiglu_block_xla(ln, {"w_q8": wgq, "w_scale": sg},
                           {"w_q8": wuq, "w_scale": su},
                           {"w_q8": wdq, "w_scale": sd}, x, 1e-5)
    out = fused_swiglu_block_fwd_w8a8(ln, wgq, sg, wuq, su, wdq, sd, x,
                                      eps=1e-5, interpret=True,
                                      row_tile=8, i_tile=16)
    diff = np.abs(np.asarray(out, np.float32) - np.asarray(xla, np.float32))
    spread = np.std(np.asarray(xla, np.float32))
    assert diff.max() <= 0.2 * spread, (diff.max(), spread)


def test_vjp_falls_back_to_xla():
    rng = np.random.default_rng(2)
    ln, wgq, sg, wuq, su, wdq, sd, x = _mk(rng, 4, 32, 16)

    def fused_loss(x):
        return jnp.sum(_fused_swiglu_w8a8(ln, wgq, sg, wuq, su, wdq, sd,
                                          x.astype(jnp.bfloat16),
                                          1e-5).astype(jnp.float32))

    def xla_loss(x):
        return jnp.sum(swiglu_block_xla(
            ln, {"w_q8": wgq, "w_scale": sg}, {"w_q8": wuq, "w_scale": su},
            {"w_q8": wdq, "w_scale": sd}, x.astype(jnp.bfloat16),
            1e-5).astype(jnp.float32))

    xf = x.astype(jnp.float32)
    gf = jax.grad(fused_loss)(xf)
    gx = jax.grad(xla_loss)(xf)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=1e-4)


def test_llama_tower_mlp_impl_pallas():
    # end-to-end tiny tower: intermediate_size below one i-tile =>
    # grouping collapses to per-row, outputs match the XLA path tightly.
    from vault_tpu.models.llama import (tiny_llama_config, init_llama,
                                        llama_apply)
    from vault_tpu.ops.quantize import quantize_model_params
    from dataclasses import replace

    cfg = tiny_llama_config()
    params = init_llama(jax.random.PRNGKey(0), cfg)
    params = quantize_model_params(params, mode="w8a8")
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)))
    mask = jnp.asarray(np.ones((2, 12), np.int32))
    a = llama_apply(params, cfg, ids, mask)
    b = llama_apply(params, replace(cfg, mlp_impl="pallas"), ids, mask)
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32), atol=3e-2)
    assert np.mean(np.abs(np.asarray(a, np.float32)
                          - np.asarray(b, np.float32))) < 3e-3
