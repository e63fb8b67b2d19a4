"""MLM masking + loss tests, and a descent check through VaultForMaskedLM."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
import torch

from vault_tpu.config import VaultConfig, tiny_text_config, tiny_vilt_config
from vault_tpu.models.vault import init_mlm_head, init_vault, vault_for_mlm
from vault_tpu.training.mlm import IGNORE, mask_tokens, mlm_accuracy, mlm_loss


def test_mask_tokens_properties():
    rng = jax.random.PRNGKey(0)
    ids = jnp.asarray(np.random.default_rng(0).integers(5, 90, (8, 32)))
    special = jnp.zeros_like(ids).at[:, 0].set(1)  # CLS protected
    masked, labels = mask_tokens(rng, ids, special, mask_token_id=4,
                                 vocab_size=99)
    # CLS never selected
    assert (labels[:, 0] == IGNORE).all()
    sel = np.asarray(labels != IGNORE)
    frac = sel.mean()
    assert 0.05 < frac < 0.30, frac
    # labels hold originals at masked positions
    np.testing.assert_array_equal(np.asarray(labels)[sel], np.asarray(ids)[sel])
    # unmasked positions unchanged
    np.testing.assert_array_equal(np.asarray(masked)[~sel], np.asarray(ids)[~sel])


def test_mlm_loss_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 10, 20)).astype(np.float32)
    labels = rng.integers(0, 20, (4, 10))
    labels[:, ::2] = IGNORE
    ref = torch.nn.CrossEntropyLoss(ignore_index=IGNORE)(
        torch.tensor(logits).view(-1, 20), torch.tensor(labels).view(-1))
    ours = mlm_loss(jnp.asarray(logits), jnp.asarray(labels))
    assert abs(float(ours) - float(ref)) < 1e-6


@pytest.mark.slow
def test_mlm_descent():
    cfg = VaultConfig(
        vilt=tiny_vilt_config(image_size=32, patch_size=16, num_patch_tokens=6),
        text_tower=tiny_text_config(num_hidden_layers=1),
    )
    params = init_vault(jax.random.PRNGKey(0), cfg)
    params["mlm"] = init_mlm_head(jax.random.PRNGKey(1), cfg.vilt)
    rng = np.random.default_rng(0)
    batch = dict(
        input_ids=jnp.asarray(rng.integers(5, cfg.vilt.vocab_size, (4, 8))),
        attention_mask=jnp.ones((4, 8), jnp.int32),
        token_type_ids=jnp.zeros((4, 8), jnp.int32),
        pixel_values=jnp.asarray(rng.normal(size=(4, 3, 32, 32)), jnp.float32),
        pixel_mask=jnp.ones((4, 32, 32), jnp.int32),
    )
    labels = jnp.where(jnp.arange(8) % 3 == 0, batch["input_ids"], IGNORE)

    import optax
    tx = optax.adam(1e-2)

    def loss_fn(p):
        logits = vault_for_mlm(p, cfg, batch)
        return mlm_loss(logits, labels)

    state = tx.init(params)
    l0 = None
    for i in range(8):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, upd)
        if l0 is None:
            l0 = float(loss)
    assert float(loss) < l0 * 0.8
    acc = mlm_accuracy(vault_for_mlm(params, cfg, batch), labels)
    assert 0.0 <= float(acc) <= 1.0
