"""Attention-mask math.

The reference exposes ``extend_invert_attention_mask`` (vault/utils.py:53-75)
which turns a 2-D {0,1} mask into a 4-D additive bias with fill ``-1e4``; HF's
``get_extended_attention_mask`` (used by the model forwards the reference
calls) fills with ``finfo(dtype).min``.  We default to the dtype-min semantics
(what the reference's model path actually executes through HF) and expose the
fill value for the utility variant.
"""

from __future__ import annotations

import jax.numpy as jnp


def extend_attention_mask(mask, dtype=jnp.float32, fill=None):
    """(B, L) {0,1} -> (B, 1, 1, L) additive bias (0 keep / fill drop)."""
    if fill is None:
        fill = jnp.finfo(dtype).min
    mask = mask.astype(dtype)
    return ((1.0 - mask) * fill)[:, None, None, :]
