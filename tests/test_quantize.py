"""Int8 weight-only quantization: accuracy and size."""

import numpy as np
import jax
import jax.numpy as jnp

from vault_tpu.config import VaultConfig, tiny_text_config, tiny_vilt_config
from vault_tpu.models.vault import init_vault, vault_apply
from vault_tpu.ops.nn import linear
from vault_tpu.ops.quantize import (
    quantize_linear_params,
    quantize_model_params,
    quantized_bytes,
)


def test_quantized_linear_close():
    rng = np.random.default_rng(0)
    p = {"w": jnp.asarray(rng.normal(size=(64, 32)), jnp.float32),
         "b": jnp.asarray(rng.normal(size=(32,)), jnp.float32)}
    x = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)
    ref = linear(p, x)
    out = linear(quantize_linear_params(p), x)
    rel = np.abs(np.asarray(out) - np.asarray(ref)).max() / np.abs(np.asarray(ref)).max()
    assert rel < 0.02, rel


def test_quantized_model_outputs_close_and_smaller():
    cfg = VaultConfig(
        vilt=tiny_vilt_config(image_size=32, patch_size=16, num_patch_tokens=4),
        text_tower=tiny_text_config(num_hidden_layers=2),
    )
    params = init_vault(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = dict(
        input_ids=jnp.asarray(rng.integers(0, cfg.text_tower.vocab_size, (2, 6))),
        attention_mask=jnp.ones((2, 6), jnp.int32),
        pixel_values=jnp.asarray(rng.normal(size=(2, 3, 32, 32)), jnp.float32),
        pixel_mask=jnp.ones((2, 32, 32), jnp.int32),
    )
    ref = vault_apply(params, cfg, **batch).pooler_output
    qparams = quantize_model_params(params)
    out = vault_apply(qparams, cfg, **batch).pooler_output

    # tanh-bounded pooler: small absolute budget
    diff = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert diff < 0.05, diff
    # encoder linears dominate; expect a solid size cut
    assert quantized_bytes(qparams) < 0.7 * quantized_bytes(params)
    # int8 tensors really are int8
    assert qparams["bert"]["layers"]["q"]["w_q"].dtype == jnp.int8


def test_fused_mlp_q8_matches_xla_q8():
    """Int8 fused MLP kernel vs the XLA dequant composition — quantized
    serving must keep the fused-kernel path (ops/pallas_mlp.py q8 variant)."""
    import jax
    import jax.numpy as jnp

    from vault_tpu.ops.pallas_mlp import _mlp_block_xla, fused_mlp_block
    from vault_tpu.ops.quantize import quantize_linear_params

    rng = np.random.default_rng(20)
    h, inner, rows = 128, 256, 48
    x = jnp.asarray(rng.normal(size=(2, rows // 2, h)), jnp.float32)
    ln_p = {"scale": jnp.asarray(rng.normal(size=(h,)) * 0.1 + 1, jnp.float32),
            "bias": jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.float32)}
    p_in = {"w": jnp.asarray(rng.normal(size=(h, inner)) * 0.05, jnp.float32),
            "b": jnp.asarray(rng.normal(size=(inner,)) * 0.02, jnp.float32)}
    p_out = {"w": jnp.asarray(rng.normal(size=(inner, h)) * 0.05, jnp.float32),
             "b": jnp.asarray(rng.normal(size=(h,)) * 0.02, jnp.float32)}
    q_in, q_out = quantize_linear_params(p_in), quantize_linear_params(p_out)

    ref = _mlp_block_xla(ln_p, q_in, q_out, x, 1e-12, "gelu")
    out = fused_mlp_block(ln_p, q_in, q_out, x, 1e-12, "gelu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5,
                               rtol=1e-4)

    # differentiable w.r.t. the fp leaves (scales/biases/LN); int8 leaves
    # are non-differentiable constants
    def loss(ln_p, q_in, q_out):
        return jnp.sum(fused_mlp_block(ln_p, q_in, q_out, x) ** 2)

    g = jax.grad(loss, argnums=(0,))(ln_p, q_in, q_out)[0]
    def ref_loss(ln_p, q_in, q_out):
        return jnp.sum(_mlp_block_xla(ln_p, q_in, q_out, x, 1e-12, "gelu") ** 2)
    g_ref = jax.grad(ref_loss, argnums=(0,))(ln_p, q_in, q_out)[0]
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   rtol=1e-3)


def test_w8a8_linear_close():
    """w8a8: per-row dynamic activation quant + int8 x int8 -> int32 dot."""
    rng = np.random.default_rng(1)
    p = {"w": jnp.asarray(rng.normal(size=(64, 32)), jnp.float32),
         "b": jnp.asarray(rng.normal(size=(32,)), jnp.float32)}
    x = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)
    ref = linear(p, x)
    out = linear(quantize_linear_params(p, mode="w8a8"), x)
    rel = (np.abs(np.asarray(out) - np.asarray(ref)).max()
           / np.abs(np.asarray(ref)).max())
    assert rel < 0.03, rel
    # really int8 on both sides: the output of an int8 dot is exact in
    # int32, so the only error is the two quantization roundings — feeding
    # an already-rowwise-quantized x must reproduce bit-exactly
    from vault_tpu.ops.quantize import quantize_activation

    xq, xs = quantize_activation(x)
    out2 = linear(quantize_linear_params(p, mode="w8a8"),
                  (xq.astype(jnp.float32) * xs))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out),
                               rtol=1e-5, atol=1e-5)


def test_w8a8_model_outputs_close():
    """End-to-end w8a8 vault forward: every encoder linear (QKV, attn_out,
    MLP) runs as an int8 MXU matmul; pooler divergence budget measured at
    base geometry (docs/BENCHMARKS.md): w8 0.035, w8a8 0.049."""
    cfg = VaultConfig(
        vilt=tiny_vilt_config(image_size=32, patch_size=16, num_patch_tokens=4),
        text_tower=tiny_text_config(num_hidden_layers=2),
    )
    params = init_vault(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = dict(
        input_ids=jnp.asarray(rng.integers(0, cfg.text_tower.vocab_size, (2, 6))),
        attention_mask=jnp.ones((2, 6), jnp.int32),
        pixel_values=jnp.asarray(rng.normal(size=(2, 3, 32, 32)), jnp.float32),
        pixel_mask=jnp.ones((2, 32, 32), jnp.int32),
    )
    ref = vault_apply(params, cfg, **batch).pooler_output
    qparams = quantize_model_params(params, mode="w8a8")
    out = jax.jit(lambda p, **b: vault_apply(p, cfg, **b).pooler_output)(
        qparams, **batch)
    diff = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert diff < 0.05, diff
    assert qparams["bert"]["layers"]["q"]["w_q8"].dtype == jnp.int8
    # same size cut as weight-only
    assert quantized_bytes(qparams) < 0.7 * quantized_bytes(params)


def test_fused_mlp_w8a8_matches_xla_w8a8():
    """w8a8 fused kernels (pre-LN and post-LN) vs the XLA composition
    through nn.linear's w_q8 branch — the int8 dots are exact in int32, so
    the only fused-vs-XLA deltas are the erf approximation and cast points
    (same budget as the q8 kernels)."""
    from vault_tpu.ops.pallas_mlp import (
        _mlp_block_xla,
        _mlp_postln_xla,
        fused_mlp_block,
        fused_mlp_postln_block,
    )

    rng = np.random.default_rng(21)
    h, inner, rows = 128, 256, 48
    x = jnp.asarray(rng.normal(size=(2, rows // 2, h)), jnp.float32)
    ln_p = {"scale": jnp.asarray(rng.normal(size=(h,)) * 0.1 + 1, jnp.float32),
            "bias": jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.float32)}
    p_in = {"w": jnp.asarray(rng.normal(size=(h, inner)) * 0.05, jnp.float32),
            "b": jnp.asarray(rng.normal(size=(inner,)) * 0.02, jnp.float32)}
    p_out = {"w": jnp.asarray(rng.normal(size=(inner, h)) * 0.05, jnp.float32),
             "b": jnp.asarray(rng.normal(size=(h,)) * 0.02, jnp.float32)}
    q_in = quantize_linear_params(p_in, mode="w8a8")
    q_out = quantize_linear_params(p_out, mode="w8a8")

    ref = _mlp_block_xla(ln_p, q_in, q_out, x, 1e-12, "gelu")
    out = fused_mlp_block(ln_p, q_in, q_out, x, 1e-12, "gelu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5,
                               rtol=1e-4)
    # and vs the unquantized block: bounded by the quantization error
    fp = _mlp_block_xla(ln_p, p_in, p_out, x, 1e-12, "gelu")
    rel = (np.abs(np.asarray(out) - np.asarray(fp)).max()
           / np.abs(np.asarray(fp)).max())
    assert rel < 0.05, rel

    ref_p = _mlp_postln_xla(ln_p, q_in, q_out, x, 1e-12, "gelu")
    out_p = fused_mlp_postln_block(ln_p, q_in, q_out, x, 1e-12, "gelu")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(ref_p),
                               atol=5e-5, rtol=1e-4)

    # differentiable w.r.t. the fp leaves via the XLA-composition vjp
    g = jax.grad(lambda lp: jnp.sum(
        fused_mlp_block(lp, q_in, q_out, x) ** 2))(ln_p)
    g_ref = jax.grad(lambda lp: jnp.sum(
        _mlp_block_xla(lp, q_in, q_out, x, 1e-12, "gelu") ** 2))(ln_p)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   rtol=1e-3)


def test_project_qkv_fused_quantized_matches_unfused():
    """Quantized QKV fusion (concat weights + per-out scales) must equal the
    three separate quantized linears exactly — same contractions, same
    scales, one activation quantization."""
    from vault_tpu.ops.attention import project_qkv

    rng = np.random.default_rng(3)
    h = 64
    lp_fp = {k: {"w": jnp.asarray(rng.normal(size=(h, h)) * 0.05, jnp.float32),
                 "b": jnp.asarray(rng.normal(size=(h,)) * 0.02, jnp.float32)}
             for k in ("q", "k", "v")}
    y = jnp.asarray(rng.normal(size=(2, 6, h)), jnp.float32)
    for mode in ("w8", "w8a8"):
        lp = {k: quantize_linear_params(p, mode=mode)
              for k, p in lp_fp.items()}
        ref = project_qkv(lp, y, num_heads=4, fuse=False)
        out = project_qkv(lp, y, num_heads=4, fuse=True)
        for a, b in zip(ref, out):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-6, err_msg=mode)


def test_fused_ln_qkv_w8a8_matches_xla():
    """w8a8 fused LN->QKV kernel vs the XLA composition (LN then three
    w8a8 linears): same per-row quantization of the same y, so outputs
    match to fp-rescale tolerance."""
    from vault_tpu.ops.nn import layer_norm, linear
    from vault_tpu.ops.pallas_mlp import fused_ln_qkv

    rng = np.random.default_rng(7)
    h, rows = 128, 48
    x = jnp.asarray(rng.normal(size=(2, rows // 2, h)), jnp.float32)
    ln_p = {"scale": jnp.asarray(rng.normal(size=(h,)) * 0.1 + 1, jnp.float32),
            "bias": jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.float32)}
    lp = {k: quantize_linear_params(
        {"w": jnp.asarray(rng.normal(size=(h, h)) * 0.05, jnp.float32),
         "b": jnp.asarray(rng.normal(size=(h,)) * 0.02, jnp.float32)},
        mode="w8a8") for k in ("q", "k", "v")}

    y = layer_norm(ln_p, x, 1e-12)
    ref = jnp.concatenate(
        [linear(lp["q"], y), linear(lp["k"], y), linear(lp["v"], y)],
        axis=-1)
    out = fused_ln_qkv(ln_p, lp["q"], lp["k"], lp["v"], x, 1e-12)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


def test_quantized_params_checkpoint_roundtrip(tmp_path):
    """Deployment flow: quantize once, save, restore into a quantized
    target — int8 leaves and fp32 scales round-trip through the npz
    checkpoint exactly (training/checkpoint.py)."""
    from vault_tpu.training.checkpoint import restore_checkpoint, save_checkpoint

    cfg = VaultConfig(
        vilt=tiny_vilt_config(image_size=32, patch_size=16, num_patch_tokens=4),
        text_tower=tiny_text_config(num_hidden_layers=1),
    )
    qparams = quantize_model_params(init_vault(jax.random.PRNGKey(0), cfg),
                                    mode="w8a8")
    path = str(tmp_path / "qmodel")
    save_checkpoint(path, {"params": qparams})
    restored = restore_checkpoint(path, {"params": qparams})["params"]
    for a, b in zip(jax.tree.leaves(qparams), jax.tree.leaves(restored)):
        assert np.asarray(a).dtype == np.asarray(b).dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
