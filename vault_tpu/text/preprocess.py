"""Twitter text preprocessing + demojization.

Behavior-equivalent rebuild of the reference's ekphrasis pipeline + tag
handler (vault/utils.py:118-212) and per-LM demojizer selection
(vault/utils.py:18-50).  ekphrasis/emoji aren't available in this
environment, so both are implemented natively with the same output
conventions:

  * url/email/phone/user mentions -> bare tag words ("url", "user", ...)
    (ekphrasis ``normalize`` + the reference's tag_handler mapping
    ``<tag>`` -> ``tag``);
  * hashtags -> ``# seg-ment-ed`` (reference rejoins ekphrasis hashtag
    segments with "-" after a "# " marker, vault/utils.py:155-181);
  * annotation tags (allcaps/elongated/repeated/emphasis/censored) carry no
    surface form — the reference *drops* them in its tag handler, so the
    word itself (lowercased) is all that survives; we lowercase and keep it;
  * common English contractions unpacked (ekphrasis unpack_contractions);
  * emojis -> "(name words)" via unicodedata names, matching
    ``emoji.demojize(..., delimiters=("(", ")")).replace("_", " ")``.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Callable, List, Optional

_URL = re.compile(r"(?:https?://|www\.)\S+", re.IGNORECASE)
_EMAIL = re.compile(r"\b[\w.+-]+@[\w-]+\.[\w.-]+\b")
_PHONE = re.compile(r"(?<!\w)(?:\+?\d{1,3}[ .-]?)?(?:\(?\d{3}\)?[ .-]?)\d{3}[ .-]?\d{4}(?!\w)")
_USER = re.compile(r"@\w+")
_HASHTAG = re.compile(r"#(\w+)")

_CONTRACTIONS = [
    (re.compile(r"\b(can)'t\b", re.I), r"\1 not"),
    (re.compile(r"\b(won)'t\b", re.I), "will not"),
    (re.compile(r"\b(\w+)n't\b", re.I), r"\1 not"),
    (re.compile(r"\b(\w+)'re\b", re.I), r"\1 are"),
    (re.compile(r"\b(\w+)'ll\b", re.I), r"\1 will"),
    (re.compile(r"\b(\w+)'ve\b", re.I), r"\1 have"),
    (re.compile(r"\b(\w+)'m\b", re.I), r"\1 am"),
    (re.compile(r"\b(\w+)'d\b", re.I), r"\1 would"),
]

_TOKEN = re.compile(r"\w+|[^\w\s]")


def _segment_hashtag(body: str) -> List[str]:
    """Split a hashtag body on case/digit boundaries and underscores
    (lightweight stand-in for ekphrasis' corpus segmenter)."""
    parts = re.findall(r"[A-Z]+(?=[A-Z][a-z])|[A-Z]?[a-z]+|[A-Z]+|\d+", body.replace("_", " "))
    return [p.lower() for p in parts] or [body.lower()]


def twitter_preprocessor(normalized_tags: Optional[List[str]] = None,
                         extra_tags: Optional[List[str]] = None) -> Callable[[str], str]:
    normalized_tags = normalized_tags or ["url", "email", "phone", "user"]
    hashtags = (extra_tags is None) or ("hashtag" in extra_tags)

    def process(text: str) -> str:
        if "url" in normalized_tags:
            text = _URL.sub(" url ", text)
        if "email" in normalized_tags:
            text = _EMAIL.sub(" email ", text)
        if "phone" in normalized_tags:
            text = _PHONE.sub(" phone ", text)
        if "user" in normalized_tags:
            text = _USER.sub(" user ", text)
        for pat, rep in _CONTRACTIONS:
            text = pat.sub(rep, text)

        out: List[str] = []
        pos = 0
        for m in _HASHTAG.finditer(text):
            out.extend(t.lower() for t in _TOKEN.findall(text[pos:m.start()]))
            if hashtags:
                out.append("# " + "-".join(_segment_hashtag(m.group(1))))
            else:
                out.append(m.group(1).lower())
            pos = m.end()
        out.extend(t.lower() for t in _TOKEN.findall(text[pos:]))
        return " ".join(out).strip()

    process.log = f"native twitter preprocessor: {normalized_tags}, hashtags={hashtags}"
    return process


def _demojize_en(text: str, delimiters=("(", ")")) -> str:
    out = []
    for ch in text:
        if ord(ch) >= 0x2190:  # arrows/symbols/emoji planes
            try:
                name = unicodedata.name(ch).lower()
            except ValueError:
                out.append(ch)
                continue
            out.append(f"{delimiters[0]}{name}{delimiters[1]}")
        else:
            out.append(ch)
    return "".join(out)


def demojizer_selector(model_name: str, delimiters=("(", ")")) -> Callable[[str], str]:
    """Per-LM emoji policy (vault/utils.py:18-50): BERTweet keeps raw emoji
    (its tokenizer handles them); bert-base-uncased gets English
    descriptions."""
    identity = lambda x: x
    demojize = lambda x: _demojize_en(x, delimiters)
    table = {
        "vinai/bertweet-base": identity,
        "bertweet-base": identity,
        "bert-base-uncased": demojize,
        "bert-base-multilingual-uncased": demojize,
    }
    return table.get(model_name, identity)
