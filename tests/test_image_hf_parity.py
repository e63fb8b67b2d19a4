"""Image-pipeline closeness vs HF ViltImageProcessor.

Exact geometry parity is asserted in test_processor.py; here we bound the
pixel-value divergence of our jax bicubic resize vs HF's PIL resample on the
same input (different filter implementations — small differences are expected
and are far below the model's sensitivity)."""

import numpy as np
import pytest

from vault_tpu.data.image import preprocess_image


@pytest.mark.parametrize("hw", [(480, 640), (640, 480), (500, 500)])
def test_pixel_values_close_to_hf(hw):
    from transformers import ViltImageProcessor

    proc = ViltImageProcessor(size={"shortest_edge": 384}, do_pad=False,
                              image_mean=[0.5, 0.5, 0.5], image_std=[0.5, 0.5, 0.5])
    rng = np.random.default_rng(0)
    # smooth image (filter differences dominate on white noise)
    base = rng.normal(size=(8, 8, 3))
    import jax.image

    img = np.asarray(jax.image.resize(base, (*hw, 3), "bicubic"))
    img = ((img - img.min()) / (np.ptp(img) + 1e-9) * 255).astype(np.uint8)

    ref = proc(img, return_tensors="np")["pixel_values"][0]
    ours = preprocess_image(img, safe=False)
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    mae = np.abs(ours - ref).mean()
    assert mae < 0.03, mae  # normalized units (range [-1, 1])
