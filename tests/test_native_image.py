"""Native image core (native/imagecore.cpp): bit-exactness vs PIL's
fixed-point bicubic resample, fused-normalize parity, and integration with
the processor's resize_normalize fast path.  The pixel-parity contract
matters because HF's ViltImageProcessor resamples with PIL (reference call
site vault/models/vault/processor.py:12)."""

import numpy as np
import pytest
from PIL import Image

from vault_tpu.data import native_image
from vault_tpu.data.image import IMAGE_MEAN, IMAGE_STD, resize_normalize


@pytest.fixture(scope="module", autouse=True)
def built():
    assert native_image.build_native_lib(), "native build failed (g++ required)"
    assert native_image.available()


GEOMETRIES = [
    (480, 640, 384, 512),   # downscale, landscape
    (640, 480, 512, 384),   # downscale, portrait
    (100, 100, 384, 384),   # upscale
    (1000, 700, 384, 268),  # strong downscale
    (384, 608, 384, 608),   # identity
    (384, 608, 384, 416),   # width-only
    (500, 416, 384, 416),   # height-only
    (50, 373, 32, 352),     # thin strip
    (7, 9, 384, 608),       # tiny source
]


@pytest.mark.parametrize("h,w,oh,ow", GEOMETRIES)
def test_resize_bit_exact_vs_pil(h, w, oh, ow):
    rng = np.random.default_rng(h * 1000 + w)
    src = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    ref = np.asarray(Image.fromarray(src).resize((ow, oh), Image.BICUBIC))
    out = native_image.resize_rgb8_native(src, (oh, ow))
    np.testing.assert_array_equal(out, ref)


def test_resize_normalize_matches_pil_path():
    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
    out = native_image.resize_normalize_native(src, (384, 512),
                                               IMAGE_MEAN, IMAGE_STD)
    ref = np.asarray(Image.fromarray(src).resize((512, 384), Image.BICUBIC))
    ref = ((ref.astype(np.float32) / 255.0 - IMAGE_MEAN)
           / IMAGE_STD).transpose(2, 0, 1)
    assert out.shape == (3, 384, 512) and out.dtype == np.float32
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_resize_normalize_dispatches_native():
    """The image-pipeline entry must produce identical values whether the
    native core serves the call or the PIL fallback does."""
    rng = np.random.default_rng(1)
    src = rng.integers(0, 256, (300, 500, 3), dtype=np.uint8)
    via_entry = resize_normalize(src, (384, 608))
    ref = np.asarray(Image.fromarray(src).resize((608, 384), Image.BICUBIC))
    ref = ((ref.astype(np.float32) / 255.0 - IMAGE_MEAN)
           / IMAGE_STD).transpose(2, 0, 1)
    np.testing.assert_allclose(via_entry, ref, atol=1e-6)


def test_non_uint8_falls_back():
    src = np.random.default_rng(2).normal(size=(64, 64, 3)).astype(np.float32)
    assert native_image.resize_normalize_native(src, (32, 32), 0.5, 0.5) is None
    out = resize_normalize(src, (32, 32))  # jax fallback path still works
    assert out.shape == (3, 32, 32)


def test_noncontiguous_input_ok():
    rng = np.random.default_rng(3)
    big = rng.integers(0, 256, (200, 300, 3), dtype=np.uint8)
    view = big[10:170, 20:280]  # non-contiguous crop view
    out = native_image.resize_rgb8_native(view, (96, 128))
    ref = np.asarray(Image.fromarray(np.ascontiguousarray(view))
                     .resize((128, 96), Image.BICUBIC))
    np.testing.assert_array_equal(out, ref)


def test_resize_bit_exact_vs_pil_fuzz():
    """Seeded geometry fuzz: 60 random (in, out) size pairs spanning
    up/down-scales, extreme aspect ratios and off-by-one sizes must all
    stay BIT-identical to PIL's fixed-point bicubic."""
    rng = np.random.default_rng(99)
    for _ in range(60):
        h, w = int(rng.integers(4, 700)), int(rng.integers(4, 700))
        oh, ow = int(rng.integers(4, 640)), int(rng.integers(4, 640))
        src = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        ref = np.asarray(Image.fromarray(src).resize((ow, oh), Image.BICUBIC))
        out = native_image.resize_rgb8_native(src, (oh, ow))
        np.testing.assert_array_equal(out, ref, err_msg=f"{(h, w, oh, ow)}")
