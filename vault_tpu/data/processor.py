"""VaultProcessor: joint text+image preprocessing.

Reference: ``VaultProcessor.from_pretrained`` builds a ViltProcessor whose
text tokenizer is swapped for the BERT tower's (vault/models/vault/
processor.py:6-18), producing ``input_ids / attention_mask / token_type_ids /
pixel_values / pixel_mask``.  Here the processor owns a tokenizer (our native
WordPiece, or any object exposing ``batch_encode``/HF ``__call__``) and the
jax image pipeline (vault_tpu/data/image.py).

TPU-first: ``canvas`` pins pixel_values to one static shape across batches so
the jitted model never recompiles on image geometry (the reference instead
pads per-batch via safe_dict_concat, vault/vl_utils/dataset_utils.py:7-36 —
that dynamic-shape behavior is available with ``canvas=None``).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from vault_tpu.data.image import (
    DEFAULT_CANVAS,
    bucket_canvas,
    crop_stage,
    pad_batch,
    resize_stage,
)


class VaultProcessor:
    def __init__(self, tokenizer, max_length: int = 40,
                 canvas: Optional[Tuple[int, int]] = DEFAULT_CANVAS,
                 safe_images: bool = True, shorter: Optional[int] = None):
        """``canvas``: a fixed (H, W) pins pixel_values to one static shape
        (one jit program ever); ``"auto"`` picks the smallest {384,608}-
        bucketed canvas per batch (at most 4 programs; landscape batches get
        the 13%-faster 384x608 geometry, docs/BENCHMARKS.md); ``None``
        reproduces the reference's dynamic pad-to-batch-max
        (vault/vl_utils/dataset_utils.py:7-36)."""
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.canvas = canvas
        self.safe_images = safe_images
        # resize geometry scales with a custom canvas: shortest edge target is
        # min(canvas, 384) unless given explicitly (384 on the default canvas).
        if shorter is None:
            shorter = (min(canvas) if isinstance(canvas, tuple) else 384)
            shorter = min(shorter, 384)
        self.shorter = shorter
        self.longer = int(1333 / 800 * shorter)

    def encode_text(self, texts: Sequence[str],
                    text_pairs: Optional[Sequence[Optional[str]]] = None,
                    max_length: Optional[int] = None) -> Dict[str, np.ndarray]:
        max_length = max_length or self.max_length
        if hasattr(self.tokenizer, "batch_encode"):
            return self.tokenizer.batch_encode(
                list(texts), text_pairs, max_length=max_length)
        # HF tokenizer fallback (BERTweet etc.)
        kw = dict(padding="max_length", truncation=True, max_length=max_length,
                  return_tensors="np")
        if text_pairs is not None and any(p is not None for p in text_pairs):
            if any(p is None for p in text_pairs):
                # HF rejects None entries inside a pair list (the native
                # batch_encode handles per-element None); encode row-wise so
                # mixed lists behave identically across tokenizer types
                rows = [self.tokenizer(t, p, **kw) if p is not None
                        else self.tokenizer(t, **kw)
                        for t, p in zip(texts, text_pairs)]
                enc = {k: np.concatenate([np.asarray(r[k]) for r in rows])
                       for k in rows[0].keys()}
            else:
                enc = self.tokenizer(list(texts), list(text_pairs), **kw)
        else:
            enc = self.tokenizer(list(texts), **kw)
        out = {k: np.asarray(v, np.int32) for k, v in enc.items()
               if k in ("input_ids", "attention_mask", "token_type_ids")}
        if "token_type_ids" not in out:
            out["token_type_ids"] = np.zeros_like(out["input_ids"])
        return out

    def encode_images(self, images: Sequence[np.ndarray],
                      augment_rng: Optional[np.random.Generator] = None,
                      num_workers: int = 0):
        auto = self.canvas == "auto"
        max_hw = None if auto else self.canvas
        # Crops run serially (they consume the augment rng stream; they are
        # view slices), then the expensive resize+normalize parallelizes
        # across the batch — the native core / PIL release the GIL, so
        # ``num_workers`` threads scale it (the reference's DataLoader
        # num_workers role).  Results are identical for any worker count.
        # Per-image resize_normalize dispatches to the native core
        # (bit-exact PIL resample + fused normalize, ~2x); a zero-copy
        # write-into-canvas variant was measured SLOWER than this simple
        # shape (np.zeros is calloc — pad_batch's copy is cheap), so the
        # collation stays a plain pad_batch.
        from vault_tpu.data.loader import parallel_map

        cropped = [crop_stage(im, safe=self.safe_images,
                              augment_rng=augment_rng) for im in images]
        processed = parallel_map(
            lambda im: resize_stage(im, shorter=self.shorter,
                                    longer=self.longer, max_hw=max_hw),
            cropped, num_workers)
        canvas = bucket_canvas(processed) if auto else self.canvas
        return pad_batch(processed, canvas=canvas)

    def __call__(self, images, texts, text_pairs=None,
                 augment_rng: Optional[np.random.Generator] = None,
                 max_length: Optional[int] = None) -> Dict[str, np.ndarray]:
        if isinstance(texts, str):
            texts = [texts]
        if not isinstance(images, (list, tuple)):
            images = [images]
        enc = self.encode_text(texts, text_pairs, max_length)
        pixel_values, pixel_mask = self.encode_images(images, augment_rng)
        enc["pixel_values"] = pixel_values
        enc["pixel_mask"] = pixel_mask
        return enc
