"""ToMe-style token merging: a static-shape serving accelerator.

The joint VAuLT sequence is 40 text + 1 CLS + 215 patch tokens = 256; the
co-encoder's cost is linear in that length for the MLP/QKV matmuls (the
bulk of its FLOPs at L=256/d=64).  Patch tokens are highly redundant —
neighbouring image patches encode near-identical content — so merging
similar patch tokens *before* the co-encoder buys an almost-proportional
forward speedup at a small, opt-in accuracy cost.

Method (Bolya et al., "Token Merging: Your ViT But Faster", arXiv
2210.09461; see also BUS patch summarization, PAPERS.md): bipartite soft
matching.  Tokens are split into alternating sets A/B; each A token finds
its most cosine-similar B token; the r best-matched A tokens are merged
into their targets by size-weighted averaging.  Merged tokens carry a
``size`` (how many originals they represent) and attention becomes
*proportional*: ``softmax(qk/sqrt(d) + log(size_k))``, which makes merging
EXACT for duplicate tokens — merging two identical tokens with log-2 key
bias reproduces the unmerged attention output bit-for-bit in exact
arithmetic (tests/test_token_merge.py asserts this end-to-end).

TPU-native formulation (vs the reference repo's CUDA gather/scatter ToMe):
  * ``r`` and the output length are STATIC — one compiled program;
  * the scatter-add of merged tokens is a one-hot matmul (MXU-friendly),
    not a data-dependent scatter;
  * the log-size key bias rides the existing additive attention-mask path
    (ops/masks.py), so the fused Pallas kernels stay engaged unchanged.

Validity-mask semantics: invalid (padded-patch) tokens are consumed FIRST
with zero merge weight — they vanish from the sequence without
contaminating any valid token — and invalid B tokens never receive normal
merges.  The one exception preserves content rather than leaking padding:
a VALID A row with no valid B target anywhere (possible only when a batch
row has <2 valid tokens) transfers itself into an invalid B slot, which
flips valid — total valid size is conserved exactly in every case.

Serving (``vault_apply(..., merge_patches_to=N)``) AND training
(``TrainArgs.merge_to``, arXiv 2210.09461's own regime): the size-weighted
average is differentiable, and merge DECISIONS (argsort/argmax) are
piecewise-constant in the inputs, so gradients are exact almost everywhere
— tests/test_token_merge_train.py checks them against central finite
differences and trains a dynamics proxy through the merge.  No reference
counterpart (gchochla/VAuLT serves the full 256-token sequence).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_NEG = -1e30


def bipartite_merge_step(x: jax.Array, sizes: jax.Array, mask: jax.Array,
                         r: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One bipartite soft-matching step: (B, L, H) -> (B, L - r, H).

    Args:
      x: token features (already position/modality-embedded).
      sizes: (B, L) float — how many original tokens each row represents.
      mask: (B, L) {0,1} validity.
      r: static number of tokens to remove; clipped to |A| = ceil(L/2).

    Returns (x', sizes', mask') with static length L - r.  Output order is
    [unmerged A tokens, updated B tokens] — a permutation of the input
    survivors, which the (permutation-equivariant) encoder is blind to.
    """
    b, l, h = x.shape
    la = (l + 1) // 2
    r = int(min(r, la))
    if r <= 0:
        return x, sizes, mask
    xa, xb = x[:, 0::2], x[:, 1::2]
    sa, sb = sizes[:, 0::2], sizes[:, 1::2]
    ma = mask[:, 0::2].astype(jnp.float32)
    mb = mask[:, 1::2].astype(jnp.float32)
    lb = xb.shape[1]

    # cosine similarity in fp32 (bf16 dot noise would reorder near-ties)
    fa = xa.astype(jnp.float32)
    fb = xb.astype(jnp.float32)
    na = fa / jnp.maximum(jnp.linalg.norm(fa, axis=-1, keepdims=True), 1e-6)
    nb = fb / jnp.maximum(jnp.linalg.norm(fb, axis=-1, keepdims=True), 1e-6)
    sim_raw = jnp.einsum("bah,bkh->bak", na, nb,
                         preferred_element_type=jnp.float32)
    # valid A must never merge into an invalid B
    sim = jnp.where(mb[:, None, :] > 0, sim_raw, _NEG)

    best = jnp.argmax(sim, axis=-1)                       # (B, la)
    val = jnp.max(sim, axis=-1)
    # pair_ok False = a VALID A row with no valid B target anywhere (only
    # possible when the batch row has <2 valid tokens total, since the
    # valid-first gather packs valid tokens into a contiguous prefix).
    # Such a row must not be silently discarded (ADVICE r3): route it to
    # its most-similar INVALID B slot instead, transferring content, size
    # and validity — the slot flips valid below and content is preserved.
    pair_ok = val > _NEG / 2
    best_inv = jnp.argmax(jnp.where(mb[:, None, :] > 0, _NEG, sim_raw),
                          axis=-1)
    # invalid A tokens are consumed first (zero-weight: they just vanish);
    # no-target valid rows rank strictly last (val == _NEG already)
    rank_val = jnp.where(ma > 0, val, jnp.inf)

    order = jnp.argsort(-rank_val, axis=1)                # merge-first order
    merge_rows = order[:, :r]
    keep_rows = order[:, r:]

    dst = jnp.take_along_axis(jnp.where(pair_ok, best, best_inv),
                              merge_rows, axis=1)         # (B, r)
    w = jnp.take_along_axis(sa * ma, merge_rows, axis=1)  # (B, r)
    src = jnp.take_along_axis(fa, merge_rows[..., None], axis=1)  # (B, r, H)

    onehot = jax.nn.one_hot(dst, lb, dtype=jnp.float32)   # (B, r, lb)
    contrib = jnp.einsum("brk,brh->bkh", onehot * w[..., None], src,
                         preferred_element_type=jnp.float32)
    w_in = jnp.einsum("brk,br->bk", onehot, w)

    sbm = sb * mb                                         # invalid B: weight 0
    num = fb * sbm[..., None] + contrib
    den = sbm + w_in
    xb_new = (num / jnp.maximum(den, 1e-6)[..., None]).astype(x.dtype)
    # a B row carries content if it was valid OR it received a
    # validity-transfer merge from a no-target valid A row (w_in > 0 there
    # implies the transfer: normal merges only ever target valid B, and
    # invalid A rows carry zero weight); other invalid B rows keep their
    # original masked-out content and size >= 1
    receives = (mb > 0) | (w_in > 0)
    xb_new = jnp.where(receives[..., None], xb_new, xb)
    sb_new = jnp.where(receives, den, sb)
    mb_new = receives.astype(mask.dtype)

    xa_keep = jnp.take_along_axis(xa, keep_rows[..., None], axis=1)
    sa_keep = jnp.take_along_axis(sa, keep_rows, axis=1)
    ma_keep = jnp.take_along_axis(mask[:, 0::2], keep_rows, axis=1)

    return (jnp.concatenate([xa_keep, xb_new], axis=1),
            jnp.concatenate([sa_keep, sb_new], axis=1),
            jnp.concatenate([ma_keep, mb_new], axis=1))


def merge_tokens_to(x: jax.Array, mask: jax.Array, target: int
                    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Cascade bipartite merge steps until the (static) length reaches
    ``target``.  One step can remove at most ceil(L/2) tokens, so e.g.
    215 -> 87 takes two steps (215 -> 108 removed? no: 215 -> 107 -> 87).
    Returns (x', sizes', mask') with x'.shape[1] == max(target, 1)."""
    b, l, _ = x.shape
    target = max(int(target), 1)
    sizes = jnp.ones((b, l), jnp.float32)
    while l > target:
        r = min(l - target, (l + 1) // 2)
        x, sizes, mask = bipartite_merge_step(x, sizes, mask, r)
        l = x.shape[1]
    return x, sizes, mask
