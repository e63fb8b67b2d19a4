"""jax.export round-trip of the flagship forward (tiny geometry)."""

import numpy as np
import jax
import jax.numpy as jnp

from vault_tpu.config import VaultConfig, tiny_text_config, tiny_vilt_config
from vault_tpu.export import export_forward, load_forward
from vault_tpu.models.vault import init_vault, vault_apply


def test_export_roundtrip(tmp_path):
    cfg = VaultConfig(
        vilt=tiny_vilt_config(image_size=32, patch_size=16, num_patch_tokens=4),
        text_tower=tiny_text_config(num_hidden_layers=1),
    )
    params = init_vault(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = dict(
        input_ids=jnp.asarray(rng.integers(0, cfg.text_tower.vocab_size, (2, 6))),
        attention_mask=jnp.ones((2, 6), jnp.int32),
        pixel_values=jnp.asarray(rng.normal(size=(2, 3, 32, 32)), jnp.float32),
        pixel_mask=jnp.ones((2, 32, 32), jnp.int32),
    )

    def fwd(p, b):
        return vault_apply(p, cfg, **b).pooler_output

    ref = fwd(params, batch)

    path = str(tmp_path / "vault_fwd.stablehlo")
    export_forward(fwd, (params, batch), path, platforms=("cpu",))
    assert (tmp_path / "vault_fwd.stablehlo").stat().st_size > 1000

    loaded = load_forward(path)
    out = loaded(params, batch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


import pytest


@pytest.mark.parametrize("mode", ["w8", "w8a8"])
def test_export_quantized_model(tmp_path, mode):
    """Serving composition: int8-quantized weights (weight-only and w8a8)
    exported via jax.export — the int8 dot path must survive StableHLO
    serialization."""
    from vault_tpu.ops.quantize import quantize_model_params

    cfg = VaultConfig(
        vilt=tiny_vilt_config(image_size=32, patch_size=16, num_patch_tokens=4),
        text_tower=tiny_text_config(num_hidden_layers=1),
    )
    params = quantize_model_params(init_vault(jax.random.PRNGKey(0), cfg),
                                   mode=mode)
    rng = np.random.default_rng(0)
    batch = dict(
        input_ids=jnp.asarray(rng.integers(0, cfg.text_tower.vocab_size, (1, 6))),
        attention_mask=jnp.ones((1, 6), jnp.int32),
        pixel_values=jnp.asarray(rng.normal(size=(1, 3, 32, 32)), jnp.float32),
        pixel_mask=jnp.ones((1, 32, 32), jnp.int32),
    )

    def fwd(p, b):
        return vault_apply(p, cfg, **b).pooler_output

    ref = fwd(params, batch)
    path = str(tmp_path / "vault_q.stablehlo")
    export_forward(fwd, (params, batch), path, platforms=("cpu",))
    out = load_forward(path)(params, batch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
