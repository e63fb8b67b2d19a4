"""Native fastBPE parity vs HF BertweetTokenizer on synthetic files."""

import pytest

from vault_tpu.text.fastbpe import FastBPE


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("fastbpe")
    # vocab: "<token> <count>" per line (fairseq dict format)
    vocab_tokens = [
        "the</w>", "cat</w>", "do", "g</w>", "run", "ning</w>", "a</w>",
        "c", "at</w>", "t", "h", "e</w>", "o", "d", "n", "i", "g", "r", "u",
        "a", "s</w>", "e",
    ]
    vpath = d / "vocab.txt"
    vpath.write_text("\n".join(f"{t} {100 - i}" for i, t in enumerate(vocab_tokens)) + "\n")
    merges = ["t h", "th e</w>", "c at</w>", "d o", "g </w>", "r u",
              "ru n", "n ing</w>", "n i", "ni n", "nin g</w>", "a </w>"]
    mpath = d / "bpe.codes"
    mpath.write_text("\n".join(f"{m} 1" for m in merges) + "\n")
    return str(vpath), str(mpath)


def _hf(files):
    from transformers import BertweetTokenizer

    return BertweetTokenizer(files[0], files[1], normalization=False)


@pytest.mark.parametrize("text", [
    "the cat",
    "dog running",
    "a the cat dog",
    "unknownword the",
    "cats",
])
def test_tokenize_matches_hf(files, text):
    ours = FastBPE(*files)
    hf = _hf(files)
    assert ours.tokenize(text) == hf.tokenize(text), text


def test_vocab_matches_hf(files):
    ours = FastBPE(*files)
    hf = _hf(files)
    assert ours.vocab == hf.get_vocab()


def test_encode_matches_hf(files):
    ours = FastBPE(*files)
    hf = _hf(files)
    enc = ours.encode("the cat dog", max_length=12)
    ref = hf("the cat dog", padding="max_length", truncation=True,
             max_length=12)
    assert enc["input_ids"] == ref["input_ids"]
    assert enc["attention_mask"] == ref["attention_mask"]


def test_processor_accepts_fastbpe(files):
    from vault_tpu.data.processor import VaultProcessor

    proc = VaultProcessor(FastBPE(*files), max_length=10, canvas=(64, 64))
    out = proc.encode_text(["the cat", "dog running"])
    assert out["input_ids"].shape == (2, 10)


@pytest.mark.parametrize("text", [
    "@john check https://t.co/xyz it's great",
    "I can't believe it… meet at 5 p. m. ok",
    "cannot wait, you're going to love this",
])
def test_normalization_matches_hf(files, text):
    from vault_tpu.text.fastbpe import normalize_tweet

    hf = _hf(files)
    hf.normalization = True
    from nltk.tokenize import TweetTokenizer
    hf.tweetPreprocessor = TweetTokenizer()
    hf.demojizer = None
    assert normalize_tweet(text) == hf.normalizeTweet(text), text
