"""Masked-LM objective utilities.

The reference exposes ``VaultForMaskedLM`` (vault/models/vault/model.py:
467-468) but ships no MLM trainer; this completes the path with standard
BERT-style dynamic masking (15% of non-special tokens; 80% [MASK] / 10%
random / 10% unchanged) and a CE-over-masked-positions loss."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

IGNORE = -100


def mask_tokens(rng, input_ids, special_mask, mask_token_id: int,
                vocab_size: int, mlm_prob: float = 0.15
                ) -> Tuple[jax.Array, jax.Array]:
    """Returns (masked_input_ids, labels); labels are IGNORE except at masked
    positions where they hold the original id."""
    r_sel, r_kind, r_rand = jax.random.split(rng, 3)
    selectable = (special_mask == 0)
    sel = jax.random.bernoulli(r_sel, mlm_prob, input_ids.shape) & selectable
    labels = jnp.where(sel, input_ids, IGNORE)

    kind = jax.random.uniform(r_kind, input_ids.shape)
    rand_ids = jax.random.randint(r_rand, input_ids.shape, 0, vocab_size)
    masked = jnp.where(sel & (kind < 0.8), mask_token_id, input_ids)
    masked = jnp.where(sel & (kind >= 0.8) & (kind < 0.9), rand_ids, masked)
    return masked, labels


def mlm_loss(logits, labels, weight=None):
    """Mean CE over labeled (non-IGNORE) positions."""
    valid = (labels != IGNORE)
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    per = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    w = valid.astype(jnp.float32)
    if weight is not None:
        w = w * weight[:, None]
    return (per * w).sum() / jnp.maximum(w.sum(), 1.0)


def mlm_accuracy(logits, labels) -> jax.Array:
    valid = labels != IGNORE
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels) & valid
    return correct.sum() / jnp.maximum(valid.sum(), 1)
