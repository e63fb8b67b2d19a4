"""Twitter-201X dataset for TomBERT/TomViLT.

Rebuild of vault/models/tombert/dataset.py: target-only encoding
(max_target_length, default 16) PLUS tweet+target pair encoding
(max_total_length, longest-first truncation); images resized to the crop
size, center-cropped, ImageNet-normalized (so the fixed ResNet grid yields
the same region count for every image, :255-300); frozen-ResNet embedding
cache via ``replace_images_with_embeddings`` (:226-238)."""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Union

import numpy as np
import jax

from vault_tpu.data.datasets import load_image_with_fallback, read_twitter201x

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def imagenet_preprocess(image: np.ndarray, crop_size: int = 224) -> np.ndarray:
    """(H, W, 3) uint8 -> (3, crop, crop) float32: resize shortest side to
    crop_size (bilinear, torchvision Resize semantics), center crop,
    ImageNet normalize."""
    import jax.image

    h, w = image.shape[:2]
    # torchvision Resize(int) geometry EXACTLY: short side = crop_size,
    # long side = int(crop_size * long / short) — FLOOR, not round (a 1 px
    # pre-crop difference shifts the center-crop window and thus every
    # cached frozen-ResNet embedding)
    if h <= w:
        nh, nw = crop_size, int(crop_size * w / h)
    else:
        nh, nw = int(crop_size * h / w), crop_size
    # torchvision CenterCrop top/left = int(round((full - crop) / 2.0))
    # host-side work pinned to the CPU backend: with a TPU default backend
    # this per-image, per-shape eager resize would otherwise compile one
    # REMOTE program per distinct source geometry (docs/NOTES.md: ~minutes
    # each through the tunnel, no cache)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        img = jax.image.resize(np.asarray(image, np.float32), (nh, nw, 3),
                               method="bilinear", antialias=True)
        img = np.asarray(img)
    top = int(round((nh - crop_size) / 2.0))
    left = int(round((nw - crop_size) / 2.0))
    img = img[top:top + crop_size, left:left + crop_size]
    img = (img / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    return img.transpose(2, 0, 1).astype(np.float32)


class TomBertTmscDataset:
    def __init__(self, dir: str, kinds: Union[str, Sequence[str]], processor,
                 image_dir: Optional[str] = None, max_total_length: int = 64,
                 max_target_length: int = 16, crop_size: int = 224,
                 label_mapping: Optional[Dict[str, int]] = None,
                 preprocess_on_fetch: bool = False, num_workers: int = 0,
                 entity_map: Optional[Dict[str, str]] = None):
        import os

        if isinstance(kinds, str):
            kinds = [kinds]
        self.name = (os.path.basename(os.path.normpath(dir))
                     + "(" + ",".join(kinds) + ")")
        self.image_dir = image_dir or (os.path.normpath(dir) + "_images")
        self.crop_size = crop_size
        self.examples = read_twitter201x(dir, kinds)
        labels = sorted({e.label for e in self.examples})
        self.label_mapping = label_mapping or {l: i for i, l in enumerate(labels)}
        self.labels = np.asarray(
            [self.label_mapping[e.label] for e in self.examples], np.int32)

        tweets = [e.targetless_tweet for e in self.examples]
        # entity_map: target -> "[entity]" token appended to the target
        # surface before encoding (reference entity_integration,
        # vault/tmsc_utils/dataset.py:260-283)
        emap = entity_map or {}
        targets = [e.target + "/" + emap[e.target] if e.target in emap
                   else e.target for e in self.examples]
        pair_enc = processor.encode_text(tweets, targets,
                                         max_length=max_total_length)
        tgt_enc = processor.encode_text(targets, max_length=max_target_length)
        self.features = {
            "input_ids": pair_enc["input_ids"],
            "attention_mask": pair_enc["attention_mask"],
            "token_type_ids": pair_enc["token_type_ids"],
            "target_input_ids": tgt_enc["input_ids"],
            "target_attention_mask": tgt_enc["attention_mask"],
            "target_type_ids": tgt_enc["token_type_ids"],
        }
        self._err_count = 0
        self.num_workers = num_workers
        # preprocess_on_fetch (reference vault/models/tombert/dataset.py flag):
        # decode + transform per fetch instead of eagerly at init.  The
        # reference's transform is deterministic (Resize+CenterCrop, :255-300
        # — its docstring questions the original TomBERT random crop), so
        # this is purely a memory/CPU-overlap tradeoff, not augmentation.
        self.images: Optional[np.ndarray] = None
        if not preprocess_on_fetch:
            # same thread pool as the lazy path below (decode + resize
            # release the GIL) — a serial loop here ignored num_workers and
            # multiplied construction time on multi-core hosts
            from vault_tpu.data.loader import parallel_map

            def _load(e):
                img, err = load_image_with_fallback(self.image_dir, e.image_bn)
                return imagenet_preprocess(img, crop_size), err

            pairs = parallel_map(_load, list(self.examples), num_workers)
            self._err_count += sum(int(e) for _, e in pairs)
            self.images = np.stack([im for im, _ in pairs])
        self.embeddings: Optional[np.ndarray] = None

    @property
    def num_examples(self) -> int:
        return len(self.examples)

    def num_batches(self, batch_size: int) -> int:
        return (self.num_examples + batch_size - 1) // batch_size

    def replace_images_with_embeddings(self, embeddings: np.ndarray):
        """Frozen-ResNet cache: after the first epoch computes region
        embeddings, batches serve those instead of raw images."""
        self.embeddings = np.asarray(embeddings)

    def batches(self, batch_size: int, shuffle: bool = False,
                rng: Optional[np.random.Generator] = None):
        idx = np.arange(self.num_examples)
        if shuffle:
            (rng or np.random.default_rng()).shuffle(idx)
        for start in range(0, self.num_examples, batch_size):
            sel = idx[start:start + batch_size]
            feats = {k: v[sel] for k, v in self.features.items()}
            if self.embeddings is not None:
                feats["visual_embeddings"] = self.embeddings[sel]
            elif self.images is not None:
                feats["images"] = self.images[sel]
            else:  # preprocess_on_fetch: decode + transform lazily
                from vault_tpu.data.loader import parallel_map

                def load(i):
                    img, err = load_image_with_fallback(
                        self.image_dir, self.examples[i].image_bn)
                    return imagenet_preprocess(img, self.crop_size), err

                pairs = parallel_map(load, list(sel), self.num_workers)
                self._err_count += sum(int(e) for _, e in pairs)
                feats["images"] = np.stack([im for im, _ in pairs])
            yield feats, self.labels[sel]
