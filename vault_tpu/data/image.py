"""Image pipeline: ViltProcessor-equivalent resize/normalize/pad, TPU-first.

Replaces two layers of the reference stack:
  * HF ``ViltImageProcessor``: shortest-edge resize to 384 with the longer
    side capped at 384*1333/800, both floored to multiples of 32; rescale
    1/255; normalize mean=std=0.5 (SURVEY.md §2.7; call site
    vault/models/vault/processor.py:12).
  * ``safe_dict_concat`` batch collation: zero-pad heterogeneous HxW images
    to the per-batch max and emit a pixel_mask
    (vault/vl_utils/dataset_utils.py:7-36).

TPU-first addition: ``pad_to_canvas`` pads every image to one *static* canvas
(default 384x640 — the max ViltProcessor geometry) so jitted programs see a
single shape across all batches instead of one recompile per batch geometry.

Resize uses ``jax.image.resize`` (bicubic + antialiasing, matching PIL's
default resample family); tiny filter differences vs PIL are well inside the
model's 1e-3 output budget and are covered by the processor tests.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

SHORTER = 384
LONGER = int(1333 / 800 * 384)  # 639
SIZE_DIVISOR = 32
IMAGE_MEAN = 0.5
IMAGE_STD = 0.5
# Max canvas under the ViltProcessor geometry: one side 384, the other <= 639
# floored to /32 => 608.  The square 608x608 covers BOTH orientations with one
# static shape; any single image occupies at most 12x19=228 patches of it, and
# the model's valid-first patch gather (vault_tpu/models/vilt.py visual_embed)
# compresses those into the static num_patch_tokens budget, so the encoder
# sequence length does not grow with the canvas — but pixel-space work does:
# the square canvas measured +13% step time over (384, 608) on v5e
# (docs/BENCHMARKS.md).  MAX_CANVAS remains the worst-case static shape;
# the processor default is "auto" ({384,608}-bucketed per batch, <=4 jit
# programs, orientation-homogeneous batches get the fast geometry).
MAX_CANVAS = (608, 608)
DEFAULT_CANVAS = "auto"

# Reference safe-preprocess threshold (vault/models/vault/utils.py:38): crop
# when aspect ratio exceeds (384/32)*(1333/800) so the /32 floor can't zero a
# patch-grid side.
MAX_ASPECT_RATIO = 384 / 32 * 1333 / 800


def target_size(height: int, width: int, shorter: int = SHORTER,
                longer: int = LONGER, divisor: int = SIZE_DIVISOR) -> Tuple[int, int]:
    """HF get_resize_output_image_size semantics (image_processing_vilt.py:92-120)."""
    scale = shorter / min(height, width)
    if height < width:
        nh, nw = shorter, scale * width
    else:
        nh, nw = scale * height, shorter
    if max(nh, nw) > longer:
        s = longer / max(nh, nw)
        nh, nw = s * nh, s * nw
    nh, nw = int(nh + 0.5), int(nw + 0.5)
    return (nh // divisor) * divisor, (nw // divisor) * divisor


def safe_aspect_crop(image: np.ndarray) -> np.ndarray:
    """Center-crop the larger side when the aspect ratio exceeds
    MAX_ASPECT_RATIO — the reference's ``vilt_safe_image_preprocess``
    (vault/models/vault/utils.py:17-48).  image: (H, W, C) array."""
    h, w = image.shape[:2]
    if max(w / h, h / w) <= MAX_ASPECT_RATIO:
        return image
    # offsets use torchvision CenterCrop's int(round(diff / 2.0)) — Python
    # half-to-even on the odd-diff .5 cases — not floor (a 1 px window
    # shift vs the reference on exactly the pathological images this
    # guard exists for)
    if h > w:
        new_h = int(w * MAX_ASPECT_RATIO)
        top = int(round((h - new_h) / 2.0))
        return image[top:top + new_h]
    new_w = int(h * MAX_ASPECT_RATIO)
    left = int(round((w - new_w) / 2.0))
    return image[:, left:left + new_w]


def relative_random_crop(rng: np.random.Generator, image: np.ndarray,
                         ratio: float = 0.9) -> np.ndarray:
    """Random crop to ``ratio`` of each side — train-time augmentation
    (vault/models/vault/utils.py:51-57)."""
    h, w = image.shape[:2]
    ch, cw = int(ratio * h), int(ratio * w)
    top = int(rng.integers(0, h - ch + 1))
    left = int(rng.integers(0, w - cw + 1))
    return image[top:top + ch, left:left + cw]


def rgba_to_rgb(img: np.ndarray) -> np.ndarray:
    """(H, W, 4) uint8 -> (H, W, 3) uint8, alpha-blended onto WHITE like
    skimage.color.rgba2rgb (the reference's conversion,
    vault/tmsc_utils/dataset.py:302) — simply dropping the alpha channel
    would feed the model the (often black) under-color of fully
    transparent pixels instead of the white the reference sees."""
    rgb = img[..., :3].astype(np.float32) / 255.0
    a = img[..., 3:4].astype(np.float32) / 255.0
    out = rgb * a + (1.0 - a)  # white background
    return np.clip(np.rint(out * 255.0), 0, 255).astype(np.uint8)


def _to_rgb_hwc(image: np.ndarray) -> np.ndarray:
    img = np.asarray(image)
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == 1:
        img = np.tile(img, (1, 1, 3))
    elif img.shape[-1] == 4:
        img = rgba_to_rgb(img)
    return img


def resize_normalize(image: np.ndarray, out_hw: Tuple[int, int],
                     mean: float = IMAGE_MEAN, std: float = IMAGE_STD) -> np.ndarray:
    """(H, W, C) uint8/float -> (C, out_h, out_w) float32 normalized.

    Host fast paths, in order: the native C++ core (native/imagecore.cpp —
    a bit-exact reimplementation of PIL's fixed-point bicubic resample with
    the normalize/transpose fused in, ~2x the PIL+numpy path), then PIL
    bicubic (the exact resampler HF's ViltImageProcessor uses, so pixel
    values bit-match HF for uint8 inputs); jax bicubic fallback for float
    inputs / PIL-less environments."""
    img = _to_rgb_hwc(image)
    if img.dtype == np.uint8:
        from vault_tpu.data.native_image import resize_normalize_native

        native = resize_normalize_native(img, out_hw, mean, std)
        if native is not None:
            return native
        try:
            from PIL import Image

            pil = Image.fromarray(img).resize((out_hw[1], out_hw[0]),
                                              Image.BICUBIC)
            resized = np.asarray(pil, np.float32)
            out = (resized / 255.0 - mean) / std
            return out.transpose(2, 0, 1).astype(np.float32)
        except ImportError:
            pass
    resized = jax.image.resize(jnp.asarray(img, jnp.float32),
                               (*out_hw, img.shape[-1]), method="bicubic",
                               antialias=True)
    out = (resized / 255.0 - mean) / std
    return np.asarray(out.transpose(2, 0, 1), np.float32)


def crop_stage(image: np.ndarray, safe: bool = True,
               augment_rng: Optional[np.random.Generator] = None,
               crop_ratio: float = 0.9) -> np.ndarray:
    """[safe-crop] -> [random-crop].  Consumes the augment rng, so callers
    batching images must run this stage SERIALLY (stream determinism); the
    crops themselves are view slices, so that costs nothing."""
    image = np.asarray(image)
    if safe:
        image = safe_aspect_crop(image)
    if augment_rng is not None:
        image = relative_random_crop(augment_rng, image, crop_ratio)
    return image


def resize_stage(image: np.ndarray, shorter: int = SHORTER,
                 longer: Optional[int] = None,
                 max_hw: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """target-size -> resize+normalize.  rng-free and GIL-releasing (native
    core / PIL), so this stage parallelizes across a batch.

    ``max_hw`` clamps ASPECT-PRESERVINGLY: both sides scale by the same
    factor (then /32 floor) when the natural target exceeds the canvas —
    independent per-side clamps would silently distort any non-square
    image on a small fixed canvas (e.g. ``--canvas 384x384``)."""
    if longer is None:
        longer = int(1333 / 800 * shorter)
    h, w = np.asarray(image).shape[:2]
    th, tw = target_size(h, w, shorter, longer)
    if max_hw is not None and (th > max_hw[0] or tw > max_hw[1]):
        s = min(max_hw[0] / th, max_hw[1] / tw)
        th = max(SIZE_DIVISOR, int(th * s) // SIZE_DIVISOR * SIZE_DIVISOR)
        tw = max(SIZE_DIVISOR, int(tw * s) // SIZE_DIVISOR * SIZE_DIVISOR)
    return resize_normalize(np.asarray(image), (th, tw))


def preprocess_image(image: np.ndarray, safe: bool = True,
                     augment_rng: Optional[np.random.Generator] = None,
                     crop_ratio: float = 0.9, shorter: int = SHORTER,
                     longer: Optional[int] = None,
                     max_hw: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Full single-image path: [safe-crop] -> [random-crop] -> resize+normalize.
    ``max_hw`` clamps the (already /32-floored) target to a static canvas; on
    the default 384/639 geometry the floor is always <= 608 so no clamp fires.
    """
    cropped = crop_stage(image, safe, augment_rng, crop_ratio)
    return resize_stage(cropped, shorter, longer, max_hw)


def bucket_canvas_from_sizes(sizes: Sequence[Tuple[int, int]],
                             buckets: Tuple[int, ...] = (SHORTER, 608)
                             ) -> Tuple[int, int]:
    """Smallest bucketed canvas covering every (h, w) in ``sizes``."""
    max_h = max(h for h, _ in sizes)
    max_w = max(w for _, w in sizes)

    def up(v):
        for b in buckets:
            if v <= b:
                return b
        return v  # oversized (custom geometry) — use as-is

    return up(max_h), up(max_w)


def bucket_canvas(images: Sequence[np.ndarray],
                  buckets: Tuple[int, ...] = (SHORTER, 608)) -> Tuple[int, int]:
    """Smallest bucketed canvas covering every image in the batch.

    Each side rounds the batch max up to the next bucket value (384 or 608
    by default), so at most len(buckets)^2 distinct canvases — hence jit
    programs — can ever exist: landscape batches get (384, 608), portrait
    (608, 384), small squares (384, 384), mixed orientations (608, 608).
    Measured on v5e (docs/BENCHMARKS.md): the 608x608 worst case costs +13%
    over (384, 608), so orientation-homogeneous batches win it back."""
    return bucket_canvas_from_sizes([im.shape[1:] for im in images], buckets)


def canvas_key(height: int, width: int,
               buckets: Tuple[int, ...] = (SHORTER, 608),
               shorter: int = SHORTER,
               longer: int = LONGER) -> Tuple[int, int]:
    """Bucketed canvas a raw (height, width) image will occupy after the
    safe-crop + ViltProcessor resize — the grouping key for
    orientation-bucketed batch sampling (loader.py grouped_batch_indices).

    Batches homogeneous in this key always land on their own canvas under
    ``bucket_canvas``, so a landscape-only batch gets the (384, 608)
    geometry that measured 13% faster than the mixed-orientation 608x608
    worst case (docs/BENCHMARKS.md)."""
    if max(width / height, height / width) > MAX_ASPECT_RATIO:
        # safe_aspect_crop clamps the longer side first
        if height > width:
            height = int(width * MAX_ASPECT_RATIO)
        else:
            width = int(height * MAX_ASPECT_RATIO)
    th, tw = target_size(height, width, shorter, longer)

    def up(v):
        for b in buckets:
            if v <= b:
                return b
        return v

    return up(th), up(tw)


def pad_batch(images: Sequence[np.ndarray],
              canvas: Optional[Tuple[int, int]] = None):
    """Collate (C, H_i, W_i) images: zero-pad to the batch max (reference
    ``safe_dict_concat`` semantics) or to a fixed ``canvas`` (TPU static-shape
    mode).  Returns (pixel_values (B,C,H,W) f32, pixel_mask (B,H,W) i32)."""
    if canvas is None:
        max_h = max(im.shape[1] for im in images)
        max_w = max(im.shape[2] for im in images)
    else:
        max_h, max_w = canvas
    b = len(images)
    c = images[0].shape[0]
    pixel_values = np.zeros((b, c, max_h, max_w), np.float32)
    pixel_mask = np.zeros((b, max_h, max_w), np.int32)
    for i, im in enumerate(images):
        _, h, w = im.shape
        if h > max_h or w > max_w:
            raise ValueError(f"image {i} ({h}x{w}) exceeds canvas {max_h}x{max_w}")
        pixel_values[i, :, :h, :w] = im
        pixel_mask[i, :h, :w] = 1
    return pixel_values, pixel_mask
