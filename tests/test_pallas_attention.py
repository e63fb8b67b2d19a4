"""Fused-attention kernel parity vs the XLA path (interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vault_tpu.ops.attention import attend_xla
from vault_tpu.ops.masks import extend_attention_mask
from vault_tpu.ops.pallas_attention import fused_attention


@pytest.mark.parametrize("b,h,l,d", [(2, 4, 32, 16), (1, 12, 269, 64)])
def test_fused_matches_xla(b, h, l, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    mask = np.ones((b, l), np.int32)
    mask[0, l // 2:] = 0
    bias = extend_attention_mask(jnp.asarray(mask))

    ref = attend_xla(q, k, v, bias)
    out = fused_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_no_bias():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 2, 16, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 16, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 16, 8)), jnp.float32)
    ref = attend_xla(q, k, v, None)
    out = fused_attention(q, k, v, None, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_model_with_pallas_flag():
    # end-to-end: tiny ViLT with use_pallas (interpreted on CPU) matches XLA
    from vault_tpu.config import tiny_vilt_config
    from vault_tpu.models.vilt import init_vilt, vilt_apply

    cfg = tiny_vilt_config()
    params = init_vilt(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (2, 10))
    mask = np.ones((2, 10), np.int64)
    pixels = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    pmask = np.ones((2, 64, 64), np.int64)

    a = vilt_apply(params, cfg, input_ids=jnp.asarray(ids),
                   attention_mask=jnp.asarray(mask),
                   pixel_values=jnp.asarray(pixels),
                   pixel_mask=jnp.asarray(pmask), use_pallas=False)
    b = vilt_apply(params, cfg, input_ids=jnp.asarray(ids),
                   attention_mask=jnp.asarray(mask),
                   pixel_values=jnp.asarray(pixels),
                   pixel_mask=jnp.asarray(pmask), use_pallas=True)
    np.testing.assert_allclose(np.asarray(a.pooler_output),
                               np.asarray(b.pooler_output), atol=1e-5)


@pytest.mark.parametrize("b,h,l,d", [(2, 4, 32, 16), (1, 12, 256, 64)])
def test_fused_batched_matches_xla(b, h, l, d):
    from vault_tpu.ops.pallas_attention import fused_attention_batched

    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    mask = np.ones((b, l), np.int32)
    mask[0, l // 2:] = 0
    bias = extend_attention_mask(jnp.asarray(mask))
    ref = attend_xla(q, k, v, bias)
    out = fused_attention_batched(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_attend_grad_matches_xla():
    from vault_tpu.ops.attention import attend

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(1, 2, 16, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 16, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 16, 8)), jnp.float32)
    bias = extend_attention_mask(jnp.ones((1, 16), jnp.int32))

    def loss(fn_pallas):
        def f(q, k, v):
            return jnp.sum(attend(q, k, v, bias, use_pallas=fn_pallas) ** 2)
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    g_ref = loss(False)
    g_pal = loss(True)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_model_grad_with_pallas_matches_xla():
    from vault_tpu.config import tiny_vilt_config
    from vault_tpu.models.vilt import init_vilt, vilt_apply

    cfg = tiny_vilt_config(image_size=32, patch_size=16, num_patch_tokens=4)
    params = init_vilt(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = dict(
        input_ids=jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6))),
        attention_mask=jnp.ones((2, 6), jnp.int32),
        pixel_values=jnp.asarray(rng.normal(size=(2, 3, 32, 32)), jnp.float32),
        pixel_mask=jnp.ones((2, 32, 32), jnp.int32))

    def loss(p, use_pallas):
        out = vilt_apply(p, cfg, use_pallas=use_pallas, **batch)
        return jnp.sum(out.pooler_output ** 2)

    g_x = jax.grad(lambda p: loss(p, False))(params)
    g_p = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

@pytest.mark.parametrize("b,h,l,d", [(2, 4, 32, 16), (1, 12, 256, 64)])
def test_fused_dotbatch_matches_xla(b, h, l, d):
    from vault_tpu.ops.pallas_attention import fused_attention_dotbatch

    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    mask = np.ones((b, l), np.int32)
    mask[0, l // 2:] = 0
    bias = extend_attention_mask(jnp.asarray(mask))
    ref = attend_xla(q, k, v, bias)
    out = fused_attention_dotbatch(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_parse_attn_impl_and_fused_qkv():
    from vault_tpu.ops.attention import parse_attn_impl, project_qkv

    assert parse_attn_impl(False) == (False, False)
    assert parse_attn_impl(True) == (False, True)
    assert parse_attn_impl("dotbatch") == (False, "dotbatch")
    assert parse_attn_impl("fuseqkv+dotbatch") == (True, "dotbatch")
    assert parse_attn_impl("fuseqkv") == (True, False)

    rng = np.random.default_rng(5)
    h = 24
    lp = {
        name: {"w": jnp.asarray(rng.normal(size=(h, h)), jnp.float32),
               "b": jnp.asarray(rng.normal(size=(h,)), jnp.float32)}
        for name in ("q", "k", "v")
    }
    x = jnp.asarray(rng.normal(size=(2, 7, h)), jnp.float32)
    plain = project_qkv(lp, x, 4, fuse=False)
    fused = project_qkv(lp, x, 4, fuse=True)
    for a, b in zip(plain, fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_model_with_impl_variants():
    # the full impl-selector surface: every variant matches the XLA path
    from vault_tpu.config import tiny_vilt_config
    from vault_tpu.models.vilt import init_vilt, vilt_apply

    cfg = tiny_vilt_config()
    params = init_vilt(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(6)
    batch = dict(
        input_ids=jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 10))),
        attention_mask=jnp.ones((2, 10), jnp.int64),
        pixel_values=jnp.asarray(rng.normal(size=(2, 3, 64, 64)),
                                 jnp.float32),
        pixel_mask=jnp.ones((2, 64, 64), jnp.int64))
    ref = vilt_apply(params, cfg, **batch, use_pallas=False)
    for impl in ("fuseqkv", "dotbatch", "grid", "fuseqkv+dotbatch"):
        out = vilt_apply(params, cfg, **batch, use_pallas=impl)
        np.testing.assert_allclose(np.asarray(out.pooler_output),
                                   np.asarray(ref.pooler_output), atol=1e-5,
                                   err_msg=impl)


def test_fused_mlp_block_matches_xla():
    """fused LN->MLP->residual kernel parity vs the ops/nn composition,
    including a rows % row_tile != 0 shape (single-tile path)."""
    from vault_tpu.ops.pallas_mlp import _mlp_block_xla, fused_mlp_block_fwd

    rng = np.random.default_rng(7)
    for rows, h, inner in ((512, 128, 512), (20, 128, 256)):
        x = jnp.asarray(rng.normal(size=(2, rows // 2, h)), jnp.float32)
        gamma = jnp.asarray(rng.normal(size=(h,)) * 0.1 + 1, jnp.float32)
        beta = jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(h, inner)) * 0.05, jnp.float32)
        b1 = jnp.asarray(rng.normal(size=(inner,)) * 0.05, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(inner, h)) * 0.05, jnp.float32)
        b2 = jnp.asarray(rng.normal(size=(h,)) * 0.05, jnp.float32)
        ref = _mlp_block_xla({"scale": gamma, "bias": beta},
                             {"w": w1, "b": b1}, {"w": w2, "b": b2},
                             x, 1e-12, "gelu")
        out = fused_mlp_block_fwd(gamma, beta, w1, b1, w2, b2, x,
                                  interpret=True, row_tile=256)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)


def test_fused_mlp_grad_matches_xla():
    from vault_tpu.ops.pallas_mlp import _mlp_block_xla, fused_mlp_block

    rng = np.random.default_rng(8)
    h, inner = 128, 256
    x = jnp.asarray(rng.normal(size=(1, 16, h)), jnp.float32)
    ln_p = {"scale": jnp.ones((h,)), "bias": jnp.zeros((h,))}
    p_in = {"w": jnp.asarray(rng.normal(size=(h, inner)) * 0.05, jnp.float32),
            "b": jnp.zeros((inner,), jnp.float32)}
    p_out = {"w": jnp.asarray(rng.normal(size=(inner, h)) * 0.05, jnp.float32),
             "b": jnp.zeros((h,), jnp.float32)}

    def loss(fn):
        def f(ln_p, p_in, p_out, x):
            return jnp.sum(fn(ln_p, p_in, p_out, x, 1e-12, "gelu") ** 2)
        return jax.grad(f, argnums=(0, 1, 2, 3))(ln_p, p_in, p_out, x)

    g_ref = loss(_mlp_block_xla)
    g_pal = loss(fused_mlp_block)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_model_with_fusemlp_impl():
    from vault_tpu.config import tiny_vilt_config
    from vault_tpu.models.vilt import init_vilt, vilt_apply

    cfg = tiny_vilt_config()
    params = init_vilt(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(9)
    batch = dict(
        input_ids=jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 10))),
        attention_mask=jnp.ones((2, 10), jnp.int64),
        pixel_values=jnp.asarray(rng.normal(size=(2, 3, 64, 64)),
                                 jnp.float32),
        pixel_mask=jnp.ones((2, 64, 64), jnp.int64))
    ref = vilt_apply(params, cfg, **batch, use_pallas=False)
    out = vilt_apply(params, cfg, **batch, use_pallas="fusemlp")
    np.testing.assert_allclose(np.asarray(out.pooler_output),
                               np.asarray(ref.pooler_output), atol=1e-5)
    both = vilt_apply(params, cfg, **batch, use_pallas="fuseqkv+fusemlp+dotbatch")
    np.testing.assert_allclose(np.asarray(both.pooler_output),
                               np.asarray(ref.pooler_output), atol=1e-5)


def test_auto_impl_resolves_by_backend():
    from vault_tpu.ops.attention import TPU_DEFAULT_IMPL, parse_impl

    # on the CPU test backend "auto" must resolve to the XLA path
    assert jax.default_backend() != "tpu"
    assert parse_impl("auto") == (False, False, False, False)
    assert parse_impl("false") == (False, False, False, False)
    # the TPU resolution target itself parses to fused kernels, XLA attention
    fuse_qkv, fuse_lnqkv, fuse_mlp, attn = parse_impl(TPU_DEFAULT_IMPL)
    assert (fuse_qkv or fuse_lnqkv) and fuse_mlp and attn is False


def test_fused_ln_qkv_matches_xla():
    from vault_tpu.ops.pallas_mlp import _ln_qkv_xla, fused_ln_qkv_fwd

    rng = np.random.default_rng(10)
    h = 128
    for rows in (512, 20):
        x = jnp.asarray(rng.normal(size=(rows, h)), jnp.float32)
        gamma = jnp.asarray(rng.normal(size=(h,)) * 0.1 + 1, jnp.float32)
        beta = jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.float32)
        w = jnp.asarray(rng.normal(size=(h, 3 * h)) * 0.05, jnp.float32)
        b = jnp.asarray(rng.normal(size=(3 * h,)) * 0.05, jnp.float32)
        ref = _ln_qkv_xla({"scale": gamma, "bias": beta}, w, b, x, 1e-12)
        out = fused_ln_qkv_fwd(gamma, beta, w, b, x, interpret=True,
                               row_tile=256)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)


def test_fused_ln_qkv_grad_matches_xla():
    from vault_tpu.ops.pallas_mlp import _ln_qkv_xla, fused_ln_qkv

    rng = np.random.default_rng(11)
    h = 128
    x = jnp.asarray(rng.normal(size=(2, 8, h)), jnp.float32)
    ln_p = {"scale": jnp.ones((h,)), "bias": jnp.zeros((h,))}
    ps = [{"w": jnp.asarray(rng.normal(size=(h, h)) * 0.05, jnp.float32),
           "b": jnp.asarray(rng.normal(size=(h,)) * 0.05, jnp.float32)}
          for _ in range(3)]

    def ref_fn(ln_p, pq, pk, pv, x):
        from vault_tpu.ops.nn import layer_norm, linear
        y = layer_norm(ln_p, x, 1e-12)
        return jnp.concatenate([linear(pq, y), linear(pk, y),
                                linear(pv, y)], axis=-1)

    def loss(fn):
        def f(ln_p, pq, pk, pv, x):
            return jnp.sum(fn(ln_p, pq, pk, pv, x) ** 2)
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(ln_p, *ps, x)

    g_ref = loss(ref_fn)
    g_pal = loss(lambda ln_p, pq, pk, pv, x: fused_ln_qkv(ln_p, pq, pk, pv,
                                                          x, 1e-12))
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_model_with_fuselnqkv_impl():
    from vault_tpu.config import tiny_vilt_config
    from vault_tpu.models.vilt import init_vilt, vilt_apply

    cfg = tiny_vilt_config()
    params = init_vilt(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(12)
    batch = dict(
        input_ids=jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 10))),
        attention_mask=jnp.ones((2, 10), jnp.int64),
        pixel_values=jnp.asarray(rng.normal(size=(2, 3, 64, 64)),
                                 jnp.float32),
        pixel_mask=jnp.ones((2, 64, 64), jnp.int64))
    ref = vilt_apply(params, cfg, **batch, use_pallas=False)
    out = vilt_apply(params, cfg, **batch, use_pallas="fuselnqkv+fusemlp")
    np.testing.assert_allclose(np.asarray(out.pooler_output),
                               np.asarray(ref.pooler_output), atol=1e-5)


def test_fused_mlp_bwd_kernel_all_grads():
    """fused_mlp_block_bwd (recompute-in-VMEM backward kernel) vs jax.vjp of
    the XLA composition: all 7 gradients, both multi-tile and single-tile
    row counts."""
    from vault_tpu.ops.pallas_mlp import _mlp_block_xla, fused_mlp_block_bwd

    rng = np.random.default_rng(13)
    h, inner = 128, 256
    for rows in (256, 24):
        x = jnp.asarray(rng.normal(size=(rows, h)), jnp.float32)
        g = jnp.asarray(rng.normal(size=(rows, h)), jnp.float32)
        gamma = jnp.asarray(rng.normal(size=(h,)) * 0.2 + 1, jnp.float32)
        beta = jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(h, inner)) * 0.05, jnp.float32)
        b1 = jnp.asarray(rng.normal(size=(inner,)) * 0.02, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(inner, h)) * 0.05, jnp.float32)
        b2 = jnp.asarray(rng.normal(size=(h,)) * 0.02, jnp.float32)

        def f(gamma, beta, w1, b1, w2, b2, x):
            return _mlp_block_xla({"scale": gamma, "bias": beta},
                                  {"w": w1, "b": b1}, {"w": w2, "b": b2},
                                  x, 1e-12, "gelu")

        _, vjp = jax.vjp(f, gamma, beta, w1, b1, w2, b2, x)
        ref = vjp(g)
        out = fused_mlp_block_bwd(gamma, beta, w1, b1, w2, b2, x, g,
                                  eps=1e-12, interpret=True, row_tile=128)
        names = ("dgamma", "dbeta", "dw1", "db1", "dw2", "db2", "dx")
        for name, a, b in zip(names, ref, out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-5, rtol=2e-4,
                                       err_msg=f"{name} rows={rows}")


def test_model_grad_with_fusemlp_matches_xla():
    from vault_tpu.config import tiny_vilt_config
    from vault_tpu.models.vilt import init_vilt, vilt_apply

    cfg = tiny_vilt_config()
    params = init_vilt(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(14)
    batch = dict(
        input_ids=jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 10))),
        attention_mask=jnp.ones((2, 10), jnp.int64),
        pixel_values=jnp.asarray(rng.normal(size=(2, 3, 64, 64)),
                                 jnp.float32),
        pixel_mask=jnp.ones((2, 64, 64), jnp.int64))

    def loss(impl):
        def f(p):
            out = vilt_apply(p, cfg, **batch, use_pallas=impl)
            return jnp.sum(out.pooler_output ** 2)
        return jax.grad(f)(params)

    g_ref = loss(False)
    g_pal = loss("fuseqkv+fusemlp")
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_fused_mlp_postln_matches_xla():
    """Post-LN variant (BERT towers): parity + grads vs the XLA
    composition, and the full BERT tower with fusemlp matches XLA."""
    from vault_tpu.ops.pallas_mlp import (
        _mlp_postln_xla,
        fused_mlp_postln_block,
        fused_mlp_postln_fwd,
    )

    rng = np.random.default_rng(15)
    h, inner = 128, 256
    for rows in (512, 20):
        x = jnp.asarray(rng.normal(size=(rows, h)), jnp.float32)
        gamma = jnp.asarray(rng.normal(size=(h,)) * 0.1 + 1, jnp.float32)
        beta = jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(h, inner)) * 0.05, jnp.float32)
        b1 = jnp.asarray(rng.normal(size=(inner,)) * 0.02, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(inner, h)) * 0.05, jnp.float32)
        b2 = jnp.asarray(rng.normal(size=(h,)) * 0.02, jnp.float32)
        ref = _mlp_postln_xla({"scale": gamma, "bias": beta},
                              {"w": w1, "b": b1}, {"w": w2, "b": b2},
                              x, 1e-12, "gelu")
        out = fused_mlp_postln_fwd(gamma, beta, w1, b1, w2, b2, x,
                                   interpret=True, row_tile=256)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)

    ln_p = {"scale": gamma, "bias": beta}
    p_in, p_out = {"w": w1, "b": b1}, {"w": w2, "b": b2}

    def loss(fn):
        def f(ln_p, p_in, p_out, x):
            return jnp.sum(fn(ln_p, p_in, p_out, x, 1e-12, "gelu") ** 2)
        return jax.grad(f, argnums=(0, 1, 2, 3))(ln_p, p_in, p_out, x)

    for a, b in zip(jax.tree.leaves(loss(_mlp_postln_xla)),
                    jax.tree.leaves(loss(fused_mlp_postln_block))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_bert_tower_with_fusemlp_matches_xla():
    from vault_tpu.config import tiny_text_config
    from vault_tpu.models.bert import bert_apply, init_bert

    cfg = tiny_text_config()
    params = init_bert(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(16)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)))
    mask = jnp.ones((2, 12), jnp.int32)
    ref = bert_apply(params, cfg, input_ids=ids, attention_mask=mask,
                     use_pallas=False)
    out = bert_apply(params, cfg, input_ids=ids, attention_mask=mask,
                     use_pallas="fusemlp")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_mlp_postln_bwd_kernel_all_grads():
    """fused_mlp_postln_block_bwd (recompute-in-VMEM backward kernel for the
    BERT post-LN block) vs jax.vjp of the XLA composition: all 7 gradients,
    multi-tile and single-tile row counts."""
    from vault_tpu.ops.pallas_mlp import (
        _mlp_postln_xla,
        fused_mlp_postln_block_bwd,
    )

    rng = np.random.default_rng(16)
    h, inner = 128, 256
    for rows in (256, 24):
        x = jnp.asarray(rng.normal(size=(rows, h)), jnp.float32)
        g = jnp.asarray(rng.normal(size=(rows, h)), jnp.float32)
        gamma = jnp.asarray(rng.normal(size=(h,)) * 0.2 + 1, jnp.float32)
        beta = jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(h, inner)) * 0.05, jnp.float32)
        b1 = jnp.asarray(rng.normal(size=(inner,)) * 0.02, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(inner, h)) * 0.05, jnp.float32)
        b2 = jnp.asarray(rng.normal(size=(h,)) * 0.02, jnp.float32)

        def f(gamma, beta, w1, b1, w2, b2, x):
            return _mlp_postln_xla({"scale": gamma, "bias": beta},
                                   {"w": w1, "b": b1}, {"w": w2, "b": b2},
                                   x, 1e-12, "gelu")

        _, vjp = jax.vjp(f, gamma, beta, w1, b1, w2, b2, x)
        ref = vjp(g)
        out = fused_mlp_postln_block_bwd(gamma, beta, w1, b1, w2, b2, x, g,
                                         eps=1e-12, interpret=True,
                                         row_tile=128)
        names = ("dgamma", "dbeta", "dw1", "db1", "dw2", "db2", "dx")
        for name, a, b in zip(names, ref, out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-5, rtol=2e-4,
                                       err_msg=f"{name} rows={rows}")


def test_bert_tower_grad_with_fusemlp_matches_xla():
    """Full BERT tower gradient with the post-LN fused kernels (fwd + the
    fused bwd kernel via custom_vjp) matches the XLA path."""
    from vault_tpu.config import tiny_text_config
    from vault_tpu.models.bert import bert_apply, init_bert

    cfg = tiny_text_config()
    params = init_bert(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(17)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 10)))
    mask = jnp.ones((2, 10), jnp.int64)

    def loss(impl):
        def f(p):
            out = bert_apply(p, cfg, ids, mask, use_pallas=impl)
            return jnp.sum(out ** 2)
        return jax.grad(f)(params)

    g_ref = loss(False)
    g_pal = loss("fusemlp")
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_bert_tower_dropout_stream_parity_fused_vs_xla():
    """With hidden dropout ON, the fused post-LN kernel takes the dropout
    mask as an operand drawn with the SAME bernoulli call as the XLA path —
    outputs and gradients must match under the same rng."""
    import dataclasses

    from vault_tpu.config import tiny_text_config
    from vault_tpu.models.bert import bert_apply, init_bert

    cfg = dataclasses.replace(tiny_text_config(), hidden_dropout_prob=0.3,
                              attention_probs_dropout_prob=0.0)
    params = init_bert(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(18)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 10)))
    mask = jnp.ones((2, 10), jnp.int64)
    key = jax.random.PRNGKey(7)

    def run(impl):
        return bert_apply(params, cfg, ids, mask, deterministic=False,
                          rng=key, use_pallas=impl)

    np.testing.assert_allclose(np.asarray(run("fusemlp")),
                               np.asarray(run(False)), atol=2e-5)

    def loss(impl):
        def f(p):
            out = bert_apply(p, cfg, ids, mask, deterministic=False, rng=key,
                             use_pallas=impl)
            return jnp.sum(out ** 2)
        return jax.grad(f)(params)

    for a, b in zip(jax.tree.leaves(loss(False)),
                    jax.tree.leaves(loss("fusemlp"))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_fused_mlp_postln_masked_bwd_kernel():
    """Masked variant of the post-LN backward kernel vs jax.vjp of the
    masked XLA composition."""
    from vault_tpu.ops.pallas_mlp import (
        _mlp_postln_xla,
        fused_mlp_postln_block_bwd,
    )

    rng = np.random.default_rng(19)
    h, inner, rows = 128, 256, 256
    x = jnp.asarray(rng.normal(size=(rows, h)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(rows, h)), jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(h,)) * 0.2 + 1, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(h, inner)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(inner,)) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(inner, h)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(h,)) * 0.02, jnp.float32)
    m = jnp.asarray(rng.integers(0, 2, (rows, h)), jnp.float32) / 0.5

    def f(gamma, beta, w1, b1, w2, b2, x):
        return _mlp_postln_xla({"scale": gamma, "bias": beta},
                               {"w": w1, "b": b1}, {"w": w2, "b": b2},
                               x, 1e-12, "gelu", m)

    _, vjp = jax.vjp(f, gamma, beta, w1, b1, w2, b2, x)
    ref = vjp(g)
    out = fused_mlp_postln_block_bwd(gamma, beta, w1, b1, w2, b2, x, g, m,
                                     eps=1e-12, interpret=True, row_tile=128)
    names = ("dgamma", "dbeta", "dw1", "db1", "dw2", "db2", "dx")
    for name, a, b in zip(names, ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=2e-4, err_msg=name)


def test_vilt_dropout_stream_parity_fused_vs_xla():
    """Pre-LN (ViLT) counterpart of the masked fused block: with hidden
    dropout ON, fused and XLA paths match under the same rng, values and
    gradients."""
    import dataclasses

    from vault_tpu.config import tiny_vilt_config
    from vault_tpu.models.vilt import init_vilt, vilt_apply

    cfg = dataclasses.replace(tiny_vilt_config(), hidden_dropout_prob=0.25,
                              attention_probs_dropout_prob=0.0)
    params = init_vilt(jax.random.PRNGKey(6), cfg)
    rng = np.random.default_rng(20)
    batch = dict(
        input_ids=jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 10))),
        attention_mask=jnp.ones((2, 10), jnp.int64),
        pixel_values=jnp.asarray(rng.normal(size=(2, 3, 64, 64)),
                                 jnp.float32),
        pixel_mask=jnp.ones((2, 64, 64), jnp.int64))
    key = jax.random.PRNGKey(9)

    def run(impl):
        return vilt_apply(params, cfg, **batch, deterministic=False, rng=key,
                          use_pallas=impl)

    np.testing.assert_allclose(np.asarray(run("fusemlp").pooler_output),
                               np.asarray(run(False).pooler_output),
                               atol=2e-5)

    def loss(impl):
        def f(p):
            out = vilt_apply(p, cfg, **batch, deterministic=False, rng=key,
                             use_pallas=impl)
            return jnp.sum(out.pooler_output ** 2)
        return jax.grad(f)(params)

    for a, b in zip(jax.tree.leaves(loss(False)),
                    jax.tree.leaves(loss("fusemlp"))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_cross_encoder_fusemlp_matches_xla():
    """Tom*-family cross-encoder blocks route their post-LN MLP half through
    the fused kernel: values + grads match XLA, dropout on and off."""
    import dataclasses

    from vault_tpu.config import tiny_text_config
    from vault_tpu.models.modules import cross_encoder_apply, init_cross_encoder

    cfg = dataclasses.replace(tiny_text_config(), hidden_dropout_prob=0.2,
                              attention_probs_dropout_prob=0.0)
    params = init_cross_encoder(jax.random.PRNGKey(8), cfg, num_layers=2)
    rng = np.random.default_rng(21)
    querying = jnp.asarray(rng.normal(size=(2, 6, cfg.hidden_size)),
                           jnp.float32)
    queried = jnp.asarray(rng.normal(size=(2, 9, cfg.hidden_size)),
                          jnp.float32)

    for det, key in ((True, None), (False, jax.random.PRNGKey(11))):
        ref = cross_encoder_apply(params, cfg, querying, queried, None,
                                  deterministic=det, rng=key,
                                  use_pallas=False)
        out = cross_encoder_apply(params, cfg, querying, queried, None,
                                  deterministic=det, rng=key,
                                  use_pallas="fusemlp")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, err_msg=f"det={det}")

    def loss(impl):
        def f(p):
            out = cross_encoder_apply(p, cfg, querying, queried, None,
                                      deterministic=False,
                                      rng=jax.random.PRNGKey(11),
                                      use_pallas=impl)
            return jnp.sum(out ** 2)
        return jax.grad(f)(params)

    for a, b in zip(jax.tree.leaves(loss(False)),
                    jax.tree.leaves(loss("fusemlp"))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_pick_row_tile_bounds_vmem():
    """Non-dividing row counts must tile at the largest divisor <= pref —
    never one giant (rows, 4H) program (the VMEM-overflow hazard the old
    `tile = rows` fallback carried, e.g. B=24 x L=40 = 960 rows)."""
    from vault_tpu.ops.pallas_mlp import _pick_row_tile

    assert _pick_row_tile(4096, 256) == 256
    assert _pick_row_tile(960, 256) == 240
    assert _pick_row_tile(100, 256) == 100   # small: one tile, still <= pref
    assert _pick_row_tile(961, 256) == 31    # 31*31: largest divisor wins
    assert _pick_row_tile(997, 256) == 1     # prime: degenerate but bounded
    for rows in (960, 961, 100):
        t = _pick_row_tile(rows, 256)
        assert t <= 256 and rows % t == 0


def test_fused_mlp_nondividing_rows_matches_xla():
    from vault_tpu.ops.pallas_mlp import _mlp_block_xla, fused_mlp_block_fwd

    rng = np.random.default_rng(21)
    h, inner = 128, 256
    for rows in (960, 31):  # 960 -> tile 240; 31 -> tile 31
        x = jnp.asarray(rng.normal(size=(rows, h)), jnp.float32)
        gamma = jnp.asarray(rng.normal(size=(h,)), jnp.float32)
        beta = jnp.asarray(rng.normal(size=(h,)), jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(h, inner)) * 0.05, jnp.float32)
        b1 = jnp.zeros((inner,), jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(inner, h)) * 0.05, jnp.float32)
        b2 = jnp.zeros((h,), jnp.float32)
        got = fused_mlp_block_fwd(gamma, beta, w1, b1, w2, b2, x,
                                  interpret=True)
        ref = _mlp_block_xla({"scale": gamma, "bias": beta},
                             {"w": w1, "b": b1}, {"w": w2, "b": b2},
                             x, 1e-12, "gelu")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)


def test_project_qkv_fused_without_bias():
    """qkv_bias=False models (no 'b' leaves) must work on the fused-QKV
    path — the TPU default impl."""
    from vault_tpu.ops.attention import project_qkv
    from vault_tpu.ops.nn import init_linear

    rng = jax.random.PRNGKey(0)
    lp = {k: init_linear(jax.random.fold_in(rng, i), 64, 64, 0.02,
                         bias=False)
          for i, k in enumerate(("q", "k", "v"))}
    y = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 64)),
                    jnp.float32)
    q1, k1, v1 = project_qkv(lp, y, num_heads=4, fuse=False)
    q2, k2, v2 = project_qkv(lp, y, num_heads=4, fuse=True)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)


def test_parse_impl_rejects_unknown_tokens():
    from vault_tpu.ops.attention import parse_impl

    with pytest.raises(ValueError, match="unknown use_pallas"):
        parse_impl("fuse_mlp+fuseqkv")  # typo must not silently degrade
    assert parse_impl("fuseqkv+fusemlp")[0] is True
    assert parse_impl("dotbatch")[3] == "dotbatch"


def test_fused_mlp_postln_q8_matches_xla():
    """int8 post-LN kernel (quantized BERT/Tom* towers): parity vs the XLA
    composition over the quantized weights — quantized text towers must
    not silently lose the fused path (the pre-LN block already has this)."""
    from vault_tpu.ops.pallas_mlp import (
        _mlp_postln_xla,
        fused_mlp_postln_block,
    )
    from vault_tpu.ops.quantize import quantize_linear_params

    rng = np.random.default_rng(33)
    h, inner = 128, 256
    for rows in (512, 20, 960):
        x = jnp.asarray(rng.normal(size=(rows, h)), jnp.float32)
        ln_p = {"scale": jnp.asarray(rng.normal(size=(h,)), jnp.float32),
                "bias": jnp.asarray(rng.normal(size=(h,)), jnp.float32)}
        p_in = quantize_linear_params(
            {"w": jnp.asarray(rng.normal(size=(h, inner)) * 0.05,
                              jnp.float32),
             "b": jnp.zeros((inner,), jnp.float32)})
        p_out = quantize_linear_params(
            {"w": jnp.asarray(rng.normal(size=(inner, h)) * 0.05,
                              jnp.float32),
             "b": jnp.zeros((h,), jnp.float32)})
        got = fused_mlp_postln_block(ln_p, p_in, p_out, x, 1e-12, "gelu")
        ref = _mlp_postln_xla(ln_p, p_in, p_out, x, 1e-12, "gelu")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)
