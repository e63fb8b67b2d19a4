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
contaminating any valid token — and invalid B tokens never receive merges.

Serving-only by intent: the size-weighted average has a well-defined
gradient, but merge decisions (argsort) are non-differentiable choices and
dropout stream shapes change with L; use it via
``vault_apply(..., merge_patches_to=N)`` at inference.  No reference
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
    sim = jnp.einsum("bah,bkh->bak", na, nb,
                     preferred_element_type=jnp.float32)
    # valid A must never merge into an invalid B
    sim = jnp.where(mb[:, None, :] > 0, sim, _NEG)

    best = jnp.argmax(sim, axis=-1)                       # (B, la)
    val = jnp.max(sim, axis=-1)
    # a merge is real only when a valid target exists; otherwise weight 0
    pair_ok = val > _NEG / 2
    # invalid A tokens are consumed first (zero-weight: they just vanish)
    rank_val = jnp.where(ma > 0, val, jnp.inf)

    order = jnp.argsort(-rank_val, axis=1)                # merge-first order
    merge_rows = order[:, :r]
    keep_rows = order[:, r:]

    dst = jnp.take_along_axis(best, merge_rows, axis=1)   # (B, r)
    w = jnp.take_along_axis(sa * ma * pair_ok.astype(jnp.float32),
                            merge_rows, axis=1)           # (B, r)
    src = jnp.take_along_axis(fa, merge_rows[..., None], axis=1)  # (B, r, H)

    onehot = jax.nn.one_hot(dst, lb, dtype=jnp.float32)   # (B, r, lb)
    contrib = jnp.einsum("brk,brh->bkh", onehot * w[..., None], src,
                         preferred_element_type=jnp.float32)
    w_in = jnp.einsum("brk,br->bk", onehot, w)

    sbm = sb * mb                                         # invalid B: weight 0
    num = fb * sbm[..., None] + contrib
    den = sbm + w_in
    xb_new = (num / jnp.maximum(den, 1e-6)[..., None]).astype(x.dtype)
    # invalid B rows keep their original (masked-out) content and size >= 1
    xb_new = jnp.where(mb[..., None] > 0, xb_new, xb)
    sb_new = jnp.where(mb > 0, den, sb)

    xa_keep = jnp.take_along_axis(xa, keep_rows[..., None], axis=1)
    sa_keep = jnp.take_along_axis(sa, keep_rows, axis=1)
    ma_keep = jnp.take_along_axis(mask[:, 0::2], keep_rows, axis=1)

    return (jnp.concatenate([xa_keep, xb_new], axis=1),
            jnp.concatenate([sa_keep, sb_new], axis=1),
            jnp.concatenate([ma_keep, mask[:, 1::2]], axis=1))


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
