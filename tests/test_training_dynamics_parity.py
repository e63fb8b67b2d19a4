"""Training-DYNAMICS parity: N full optimizer steps of our stack vs the
reference composition rebuilt from HF torch primitives, starting from
identical weights and batches.

Forward parity, gradient parity, and optimizer parity are each asserted
elsewhere; this test closes the integration loop — autograd through
BERT -> ViLT(inputs_embeds) -> classifier + HF-AdamW updates must produce
the same loss CURVE (reference training path:
vault/models/vault/model.py:151-218 + vault/tmsc_utils/trainer.py:319-404).
Dropout off, fp32, correct_bias=True so torch.optim.AdamW is the exact
torch-side optimizer (equivalence proven in test_training.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import torch

from vault_tpu.config import VaultConfig, tiny_text_config, tiny_vilt_config
from vault_tpu.models.convert import bert_params_from_torch, vilt_params_from_torch
from vault_tpu.models.vault import vault_for_classification
from vault_tpu.training.optimizer import hf_adamw

from tests.hf_utils import DeterministicMultinomial, make_hf_bert, make_hf_vilt

N_STEPS = 12
BATCH = 4
SEQ = 10
N_CLASSES = 3
LR = 1e-3


class TorchVault(torch.nn.Module):
    """The reference wiring from HF primitives (model.py:151-218)."""

    def __init__(self, bert, vilt, hidden, n_classes, seed=7):
        super().__init__()
        self.bert, self.vilt = bert, vilt
        torch.manual_seed(seed)
        self.classifier = torch.nn.Linear(hidden, n_classes)

    def forward(self, ids, mask, types, pixels, pmask):
        lm = self.bert(input_ids=ids, attention_mask=mask,
                       token_type_ids=types).last_hidden_state
        out = self.vilt(inputs_embeds=lm, attention_mask=mask,
                        token_type_ids=types, pixel_values=pixels,
                        pixel_mask=pmask)
        return self.classifier(out.pooler_output)


def test_training_curves_match_torch():
    text = tiny_text_config(hidden_dropout_prob=0.0,
                            attention_probs_dropout_prob=0.0)
    cfg = VaultConfig(vilt=tiny_vilt_config(), text_tower=text)

    hf_bert = make_hf_bert(cfg.text_tower, seed=0)
    hf_vilt = make_hf_vilt(cfg.vilt, seed=1)
    hf_vilt.embeddings.text_embeddings.position_embedding_type = "NOT_absolute"
    model = TorchVault(hf_bert, hf_vilt, cfg.vilt.hidden_size, N_CLASSES)

    params = {
        "bert": bert_params_from_torch(hf_bert.state_dict(), cfg.text_tower),
        "vilt": vilt_params_from_torch(hf_vilt.state_dict(),
                                       cfg.resolved_vilt()),
        "head": {"out": {
            "w": jnp.asarray(model.classifier.weight.detach().numpy().T),
            "b": jnp.asarray(model.classifier.bias.detach().numpy()),
        }},
    }

    rng = np.random.default_rng(0)
    batches = []
    for _ in range(N_STEPS):
        ids = rng.integers(0, min(text.vocab_size, cfg.vilt.vocab_size),
                           size=(BATCH, SEQ))
        batches.append(dict(
            ids=ids.astype(np.int64),
            mask=np.ones((BATCH, SEQ), np.int64),
            types=np.zeros((BATCH, SEQ), np.int64),
            pixels=rng.normal(size=(BATCH, 3, 64, 96)).astype(np.float32),
            pmask=np.ones((BATCH, 64, 96), np.int64),
            labels=rng.integers(0, N_CLASSES, BATCH),
        ))

    # ---- our side FIRST: the converted jax params can alias the live torch
    # tensors' memory (torch .numpy() shares buffers and CPU jax can
    # zero-copy), so torch's IN-PLACE AdamW updates must not run before our
    # functional (non-mutating) loop has consumed the initial weights.
    # jitted value_and_grad + hf_adamw(correct_bias=True):
    tx = hf_adamw(LR, 0.9, 0.999, 1e-8, 0.0, correct_bias=True)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch, labels):
        def loss_fn(p):
            logits = vault_for_classification(p, cfg, batch, head_dropout=0.0,
                                              deterministic=True)
            logp = jax.nn.log_softmax(logits)
            return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    our_losses = []
    for b in batches:
        batch = dict(
            input_ids=jnp.asarray(b["ids"], jnp.int32),
            attention_mask=jnp.asarray(b["mask"], jnp.int32),
            token_type_ids=jnp.asarray(b["types"], jnp.int32),
            pixel_values=jnp.asarray(b["pixels"]),
            pixel_mask=jnp.asarray(b["pmask"], jnp.int32),
        )
        params, opt_state, loss = step(params, opt_state, batch,
                                       jnp.asarray(b["labels"]))
        our_losses.append(float(loss))

    # ---- torch side: autograd + torch.optim.AdamW (== HF correct_bias=True)
    opt = torch.optim.AdamW(model.parameters(), lr=LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=0.0)
    torch_losses = []
    model.train()
    ce = torch.nn.CrossEntropyLoss()
    for b in batches:
        with DeterministicMultinomial():
            logits = model(torch.tensor(b["ids"]), torch.tensor(b["mask"]),
                           torch.tensor(b["types"]), torch.tensor(b["pixels"]),
                           torch.tensor(b["pmask"]))
        loss = ce(logits, torch.tensor(b["labels"]))
        opt.zero_grad()
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    # identical first loss (pure forward parity) and matching descent curve;
    # fp32 drift compounds across 12 joint fwd+bwd+update steps, so the
    # tail tolerance is looser than single-forward parity
    np.testing.assert_allclose(our_losses[0], torch_losses[0], atol=1e-5)
    np.testing.assert_allclose(our_losses, torch_losses, atol=5e-3)
    assert our_losses[-1] < our_losses[0]  # the task is being learned
