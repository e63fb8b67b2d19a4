"""Native C++ WordPiece core: build, parity with the Python path, fallback."""

import numpy as np
import pytest

from vault_tpu.text.native import NativeWordPiece, build_native_lib
from vault_tpu.text.wordpiece import WordPieceTokenizer

VOCAB = {t: i for i, t in enumerate(dict.fromkeys(
    "[PAD] [UNK] [CLS] [SEP] [MASK] the quick brown fox jump ##s ##ed over "
    "lazy dog un ##want ! . , ' run ##ning".split()))}


@pytest.fixture(scope="module", autouse=True)
def built():
    assert build_native_lib(), "native build failed (g++ required)"


@pytest.mark.parametrize("text", [
    "The quick brown fox jumps over the lazy dog!",
    "unwanted running",
    "UNWANTED ruNNing...",
    "completely-unknownword",
    "",
])
def test_native_matches_python(text):
    tok = WordPieceTokenizer(VOCAB)
    nat = NativeWordPiece(VOCAB, VOCAB["[UNK]"], lowercase=True)
    assert nat.available
    ids_py = tok.convert_tokens_to_ids(tok.tokenize(text))
    ids_c = nat.tokenize_to_ids(text)
    assert ids_c == ids_py, (text, ids_c, ids_py)


def test_non_ascii_falls_back():
    nat = NativeWordPiece(VOCAB, VOCAB["[UNK]"])
    assert nat.tokenize_to_ids("café 😀") is None


def test_encode_uses_native_transparently():
    tok = WordPieceTokenizer(VOCAB)
    enc = tok.encode("the quick fox", max_length=10)
    assert tok._native is not None and tok._native.available
    # identical result with native disabled
    tok2 = WordPieceTokenizer(VOCAB)
    tok2._native_tried = True  # force python path
    enc2 = tok2.encode("the quick fox", max_length=10)
    assert enc == enc2


def test_native_speedup():
    import time

    tok_fast = WordPieceTokenizer(VOCAB)
    tok_slow = WordPieceTokenizer(VOCAB)
    tok_slow._native_tried = True
    text = "the quick brown fox jumps over the lazy dog " * 8

    def bench(t):
        t.encode(text, max_length=64)  # warm
        t0 = time.perf_counter()
        for _ in range(200):
            t.encode(text, max_length=64)
        return time.perf_counter() - t0

    fast, slow = bench(tok_fast), bench(tok_slow)
    assert fast < slow, (fast, slow)  # native must actually be faster


def test_build_tokenizer_cased_heuristic(tmp_path):
    """do_lower_case resolution: tokenizer_config.json wins; otherwise the
    name heuristic must distinguish bert-base-cased (no lowercasing) from
    bert-base-uncased — the old default lowercased EVERY checkpoint."""
    from vault_tpu.models.pretrained import build_tokenizer

    vocab = "[PAD]\n[UNK]\n[CLS]\n[SEP]\n[MASK]\nHello\nhello\n"
    for name, expect_lower in (("bert-base-cased", False),
                               ("bert-base-uncased", True),
                               ("my-model", True)):
        d = tmp_path / name
        d.mkdir()
        (d / "vocab.txt").write_text(vocab)
        tok = build_tokenizer(str(d))
        assert tok.basic.lowercase == expect_lower, name
    # explicit tokenizer_config overrides the name
    import json
    d = tmp_path / "oddly-named-cased"
    d.mkdir()
    (d / "vocab.txt").write_text(vocab)
    (d / "tokenizer_config.json").write_text(json.dumps(
        {"do_lower_case": True}))
    assert build_tokenizer(str(d)).basic.lowercase is True


def test_native_matches_python_fuzz():
    """Seeded property fuzz over the whole ASCII parity surface: random
    printable strings (punctuation runs, long unknown words, mixed case,
    whitespace runs) and a random larger vocab with ## continuations.
    The native core must agree with the Python path on every input it
    accepts (non-ASCII inputs return None and fall back — excluded by
    construction here)."""
    rng = np.random.default_rng(1234)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    pieces = ["".join(rng.choice(list(alpha), rng.integers(1, 6)))
              for _ in range(120)]
    vocab_tokens = (["[PAD]", "[UNK]", "[CLS]", "[SEP]"] + pieces[:60]
                    + ["##" + p for p in pieces[60:]])
    vocab = {t: i for i, t in enumerate(dict.fromkeys(vocab_tokens))}
    tok = WordPieceTokenizer(vocab)
    nat = NativeWordPiece(vocab, vocab["[UNK]"], lowercase=True)
    assert nat.available

    charset = list(alpha + alpha.upper() + "0123456789" +
                   "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~ \t\n")
    checked = 0
    for _ in range(500):
        n = int(rng.integers(0, 60))
        text = "".join(rng.choice(charset, n))
        ids_c = nat.tokenize_to_ids(text)
        assert ids_c is not None, text  # all-ASCII must not fall back
        ids_py = tok.convert_tokens_to_ids(tok.tokenize(text))
        assert ids_c == ids_py, (repr(text), ids_c, ids_py)
        checked += 1
    assert checked == 500
