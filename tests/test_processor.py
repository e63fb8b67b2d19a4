"""Tokenizer + image-pipeline parity tests (SURVEY.md §4 proposal (c))."""

import numpy as np
import pytest

from vault_tpu.data.image import (
    MAX_ASPECT_RATIO,
    pad_batch,
    preprocess_image,
    relative_random_crop,
    resize_normalize,
    safe_aspect_crop,
    target_size,
)
from vault_tpu.data.processor import VaultProcessor
from vault_tpu.text.wordpiece import WordPieceTokenizer

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] the quick brown fox jump ##s ##ed over "
    "lazy dog a cat sat on mat ! . , ' un ##want ##ed run ##ning 1 2 3"
).split()
VOCAB_DICT = {t: i for i, t in enumerate(VOCAB)}


@pytest.fixture(scope="module")
def tok():
    return WordPieceTokenizer(VOCAB_DICT)


@pytest.fixture(scope="module")
def hf_tok(tmp_path_factory):
    from transformers import BertTokenizer

    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return BertTokenizer(str(p), do_lower_case=True)


@pytest.mark.parametrize("text", [
    "The quick brown fox jumps over the lazy dog!",
    "unwanted running",
    "a cat, sat on 1 mat.",
    "UNWANTED ruNNing",
    "completely-unknownword",
])
def test_wordpiece_matches_hf(tok, hf_tok, text):
    assert tok.tokenize(text) == hf_tok.tokenize(text)


def test_encode_matches_hf(tok, hf_tok):
    text = "the quick brown fox"
    ours = tok.encode(text, max_length=12)
    ref = hf_tok(text, padding="max_length", truncation=True, max_length=12)
    assert ours["input_ids"] == ref["input_ids"]
    assert ours["attention_mask"] == ref["attention_mask"]
    assert ours["token_type_ids"] == ref["token_type_ids"]


def test_encode_pair_matches_hf(tok, hf_tok):
    a, b = "the quick brown fox jumps over the lazy dog", "a cat sat on a mat"
    ours = tok.encode(a, b, max_length=16)
    ref = hf_tok(a, b, padding="max_length", truncation=True, max_length=16)
    assert ours["input_ids"] == ref["input_ids"]
    assert ours["token_type_ids"] == ref["token_type_ids"]


def test_added_token_survives(tok):
    # reference adds "$T$" as a placeholder token (experiments/clsf_vault.py:99-100)
    t = WordPieceTokenizer(VOCAB_DICT)
    t.add_tokens(["$T$"])
    toks = t.tokenize("the $T$ jumps")
    assert "$T$" in toks
    ids = t.convert_tokens_to_ids(toks)
    assert t.added_tokens["$T$"] in ids


def test_target_size_matches_hf_rule():
    from transformers.models.vilt.image_processing_vilt import (
        get_resize_output_image_size,
    )

    for h, w in [(480, 640), (640, 480), (384, 384), (1000, 300), (300, 1000),
                 (127, 512), (2000, 150)]:
        img = np.zeros((3, h, w), np.uint8)
        ref = get_resize_output_image_size(img, shorter=384,
                                           longer=int(1333 / 800 * 384),
                                           size_divisor=32,
                                           input_data_format="channels_first")
        assert target_size(h, w) == tuple(ref), (h, w)


def test_safe_aspect_crop_bounds_ratio():
    img = np.random.default_rng(0).integers(0, 255, (40, 4000, 3)).astype(np.uint8)
    out = safe_aspect_crop(img)
    h, w = out.shape[:2]
    assert max(h / w, w / h) <= MAX_ASPECT_RATIO + 1e-6
    # and the resulting grid never collapses to zero patches
    th, tw = target_size(h, w)
    assert th >= 32 and tw >= 32


def test_relative_random_crop():
    rng = np.random.default_rng(0)
    img = np.zeros((100, 200, 3), np.uint8)
    out = relative_random_crop(rng, img, 0.9)
    assert out.shape[:2] == (90, 180)


def test_resize_normalize_range():
    img = np.full((64, 64, 3), 255, np.uint8)
    out = resize_normalize(img, (32, 32))
    assert out.shape == (3, 32, 32)
    np.testing.assert_allclose(out, 1.0, atol=1e-5)  # (255/255 - .5)/.5 = 1


def test_pad_batch_masks():
    a = np.ones((3, 64, 96), np.float32)
    b = np.ones((3, 32, 64), np.float32)
    pv, pm = pad_batch([a, b])
    assert pv.shape == (2, 3, 64, 96)
    assert pm[1, :32, :64].all() and not pm[1, 32:].any()


def test_processor_end_to_end(tok):
    proc = VaultProcessor(tok, max_length=12)
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (480, 640, 3)).astype(np.uint8),
            rng.integers(0, 255, (640, 480, 3)).astype(np.uint8)]
    enc = proc(imgs, ["the quick fox", "a lazy dog"])
    assert enc["input_ids"].shape == (2, 12)
    assert enc["pixel_values"].shape == (2, 3, 608, 608)
    assert enc["pixel_mask"].shape == (2, 608, 608)
    # first image resizes to 384x512 -> mask valid region matches
    assert enc["pixel_mask"][0, :384, :512].all()
    assert not enc["pixel_mask"][0, :, 512:].any()


def test_wordpiece_cased_mode():
    from transformers import BertTokenizer

    import tempfile, os
    vocab = "[PAD] [UNK] [CLS] [SEP] [MASK] The the Cat cat ##s".split()
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "vocab.txt")
        with open(p, "w") as f:
            f.write("\n".join(vocab) + "\n")
        ours = WordPieceTokenizer(p, lowercase=False)
        ref = BertTokenizer(p, do_lower_case=False)
    for text in ("The cat", "Cats the", "The Cat cats"):
        assert ours.tokenize(text) == ref.tokenize(text), text


def test_profiler_trace_smoke(tmp_path):
    import jax.numpy as jnp

    from vault_tpu.utils.profiling import trace

    with trace(str(tmp_path)):
        jnp.ones(8).sum().block_until_ready()
    import os
    assert any("plugins" in r or f for r, d, f in os.walk(tmp_path))


def test_auto_canvas_bucketing():
    """canvas='auto': smallest {384,608}-bucketed canvas per batch —
    landscape (384,608), portrait (608,384), small square (384,384),
    mixed orientations (608,608)."""
    import numpy as np

    from vault_tpu.data.image import bucket_canvas, preprocess_image
    from vault_tpu.data.processor import VaultProcessor
    from vault_tpu.models.pretrained import build_tokenizer

    proc = VaultProcessor(build_tokenizer("bert-base-uncased"), canvas="auto")
    rng = np.random.default_rng(0)

    def img(h, w):
        return rng.integers(0, 255, (h, w, 3)).astype(np.uint8)

    cases = [
        ([img(480, 640)], (384, 608)),            # landscape
        ([img(640, 480)], (608, 384)),            # portrait
        ([img(300, 300)], (384, 384)),            # small square
        ([img(480, 640), img(640, 480)], (608, 608)),   # mixed
    ]
    for images, want in cases:
        pv, pm = proc.encode_images(images)
        assert pv.shape[2:] == want, (pv.shape, want)
        assert pm.shape[1:] == want
        # valid region marked, padding zeroed
        assert pm[0].sum() > 0 and pv[0, :, pm[0] == 0].sum() == 0

    # bucket_canvas unit: oversized custom geometry passes through
    big = [np.zeros((3, 700, 200), np.float32)]
    assert bucket_canvas(big) == (700, 384)


def test_encode_pair_tie_truncation_matches_hf(tok, hf_tok):
    """Equal-length pair under truncation: HF's longest_first trims the
    PAIR on ties (reference leans on this, tombert/dataset.py:186)."""
    a = "the quick brown fox"   # 4 tokens
    b = "a cat sat on"          # 4 tokens
    for ml in (10, 9, 8):       # budgets forcing 1/2/3 removals
        ours = tok.encode(a, b, max_length=ml)
        ref = hf_tok(a, b, padding="max_length", truncation=True,
                     max_length=ml)
        assert ours["input_ids"] == ref["input_ids"], ml
        assert ours["token_type_ids"] == ref["token_type_ids"], ml


def test_mixed_text_pairs_with_hf_tokenizer(hf_tok):
    """encode_text with SOME pairs None must work for HF tokenizers too
    (they reject None entries in a pair list); rows match per-row calls."""
    proc = VaultProcessor(hf_tok, max_length=12, canvas=(32, 32))
    enc = proc.encode_text(["the quick fox", "a cat sat"],
                           text_pairs=["on a mat", None])
    row0 = hf_tok("the quick fox", "on a mat", padding="max_length",
                  truncation=True, max_length=12)
    row1 = hf_tok("a cat sat", padding="max_length", truncation=True,
                  max_length=12)
    assert enc["input_ids"][0].tolist() == row0["input_ids"]
    assert enc["input_ids"][1].tolist() == row1["input_ids"]


def test_rgba_blends_onto_white():
    """RGBA -> RGB must alpha-blend onto white like the reference's
    skimage rgba2rgb, not drop the alpha channel."""
    from vault_tpu.data.image import rgba_to_rgb

    img = np.zeros((2, 2, 4), np.uint8)           # black, fully transparent
    img[0, 0] = (255, 0, 0, 255)                  # opaque red
    img[0, 1] = (0, 0, 0, 128)                    # half-transparent black
    out = rgba_to_rgb(img)
    assert out[0, 0].tolist() == [255, 0, 0]
    assert out[1, 1].tolist() == [255, 255, 255]  # transparent -> white
    assert out[0, 1, 0] == round(255 * (1 - 128 / 255))


def test_center_crop_offsets_match_torchvision():
    """safe_aspect_crop + imagenet_preprocess use torchvision geometry:
    resize long side floors, CenterCrop offset = int(round(diff/2))."""
    from vault_tpu.data.image import MAX_ASPECT_RATIO, safe_aspect_crop
    from vault_tpu.data.tombert_dataset import imagenet_preprocess

    # resize: torchvision Resize(224) on 100x333 -> (224, 745), floor
    out = imagenet_preprocess(np.zeros((100, 333, 3), np.uint8), 224)
    assert out.shape == (3, 224, 224)
    # offsets: pick h so the crop leaves an odd diff whose .5 rounds UP
    # under half-to-even (torchvision: top = int(round(diff / 2.0)))
    new_h = int(8 * MAX_ASPECT_RATIO)           # 8-wide image -> crop target
    h = new_h + 343                             # diff 343 -> 171.5 -> 172
    img = (np.arange(h)[:, None, None] * np.ones((1, 8, 3))).astype(np.int32)
    cropped = safe_aspect_crop(img)
    top = int(round((h - new_h) / 2.0))
    assert top != (h - new_h) // 2              # the case floor gets wrong
    assert cropped.shape[0] == new_h
    assert cropped[0, 0, 0] == top
