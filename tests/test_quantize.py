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
