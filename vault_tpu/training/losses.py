"""Loss functions used by the task trainers.

References:
  * CE default: vault/tmsc_utils/trainer.py:228-242
  * Bloomberg BCE-with-logits: vault/models/vault/trainer.py:39-90
  * MVSA dual-head (two 3-way CE averaged): vault/models/vault/trainer.py:93-203
  * VQA BCE * num_labels: vault/models/vault/trainer.py:211-283

All take an optional per-sample ``weight`` (1 real / 0 pad) so DP-padded
batches (vault_tpu/parallel/mesh.py pad_to_multiple) contribute nothing.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _wmean(per_sample: jax.Array, weight: Optional[jax.Array]) -> jax.Array:
    if weight is None:
        return per_sample.mean()
    w = weight.astype(per_sample.dtype)
    return (per_sample * w).sum() / jnp.maximum(w.sum(), 1.0)


def softmax_cross_entropy(logits, labels, weight=None):
    """torch nn.CrossEntropyLoss(mean) equivalent; labels are int classes."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    per = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return _wmean(per, weight)


def bce_with_logits(logits, labels, weight=None):
    """torch nn.BCEWithLogitsLoss(mean over elements) equivalent."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    per_elem = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    per = per_elem.reshape(per_elem.shape[0], -1).mean(axis=-1)
    return _wmean(per, weight)


def dual_softmax_cross_entropy(logits, labels, weight=None):
    """MVSA un-preprocessed mode: logits (B, 6) split into two 3-way groups
    for (text, image) sentiment; labels (B, 2); losses averaged
    (vault/models/vault/trainer.py:93-203)."""
    n = logits.shape[-1] // 2
    l_text = softmax_cross_entropy(logits[:, :n], labels[:, 0], weight)
    l_img = softmax_cross_entropy(logits[:, n:], labels[:, 1], weight)
    return 0.5 * (l_text + l_img)


def vqa_bce(logits, target_scores, weight=None):
    """ViLT's VQA objective: BCEWithLogits * num_labels over soft answer
    scores (vault/models/vault/trainer.py:211-283)."""
    logits = logits.astype(jnp.float32)
    t = target_scores.astype(jnp.float32)
    per_elem = jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    per = per_elem.mean(axis=-1) * logits.shape[-1]
    return _wmean(per, weight)
