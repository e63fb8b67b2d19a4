"""Byte-level BPE parity vs HF RobertaTokenizer on a synthetic vocab."""

import json

import pytest

from vault_tpu.text.bpe import ByteLevelBPE, bytes_to_unicode


@pytest.fixture(scope="module")
def toy(tmp_path_factory):
    """Build a small but real BPE system: start from bytes, add merges."""
    d = tmp_path_factory.mktemp("bpe")
    byte_vocab = list(bytes_to_unicode().values())
    merges = [
        ("Ġ", "t"), ("h", "e"), ("Ġt", "he"), ("i", "n"), ("e", "r"),
        ("a", "n"), ("Ġ", "a"), ("o", "g"), ("Ġ", "d"), ("Ġd", "og"),
        ("c", "a"), ("ca", "t"), ("Ġ", "cat"),
    ]
    vocab_tokens = ["<s>", "<pad>", "</s>", "<unk>", "<mask>"] + byte_vocab + \
        ["".join(m) for m in merges]
    vocab = {t: i for i, t in enumerate(dict.fromkeys(vocab_tokens))}
    vpath = d / "vocab.json"
    mpath = d / "merges.txt"
    vpath.write_text(json.dumps(vocab))
    mpath.write_text("#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n")
    return str(vpath), str(mpath)


def _hf(toy):
    from transformers import RobertaTokenizer

    vpath, mpath = toy
    return RobertaTokenizer(vpath, mpath)


@pytest.mark.parametrize("text", [
    "the cat and the dog",
    "the dinner",
    "cats dogma the",
    "unicode: café ❤",
    " leading and  double  spaces",
    "the_cat and__the dog_",  # '_' is \w but not \p{L}: GPT-2 "other" class
])
def test_tokenize_matches_hf(toy, text):
    ours = ByteLevelBPE(*toy)
    hf = _hf(toy)
    assert ours.tokenize(text) == hf.tokenize(text), text


def test_encode_matches_hf(toy):
    ours = ByteLevelBPE(*toy)
    hf = _hf(toy)
    enc = ours.encode("the cat", max_length=12)
    ref = hf("the cat", padding="max_length", truncation=True, max_length=12)
    assert enc["input_ids"] == ref["input_ids"]
    assert enc["attention_mask"] == ref["attention_mask"]


def test_encode_pair_matches_hf(toy):
    ours = ByteLevelBPE(*toy)
    hf = _hf(toy)
    enc = ours.encode("the cat", "the dog", max_length=16)
    ref = hf("the cat", "the dog", padding="max_length", truncation=True,
             max_length=16)
    assert enc["input_ids"] == ref["input_ids"]


def test_processor_accepts_bpe(toy):
    from vault_tpu.data.processor import VaultProcessor

    proc = VaultProcessor(ByteLevelBPE(*toy), max_length=10, canvas=(64, 64))
    out = proc.encode_text(["the cat", "the dog"])
    assert out["input_ids"].shape == (2, 10)
