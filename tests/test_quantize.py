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
