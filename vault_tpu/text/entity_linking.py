"""Entity linking of TMSC targets — rebuild of vault/entity_linking.py.

The reference optionally runs REL (mention detection + entity disambiguation)
over TMSC targets, fetches each entity's first Wikipedia paragraph, caches
results in a JSON file keyed by dir/split/wiki/threshold
(vault/tmsc_utils/dataset.py:185-283), and grows the tokenizer + initializes
each new entity token's embedding as the MAX-POOL of its description's token
embeddings (vault/entity_linking.py:115-148).  README notes the feature gave
no improvement (README.md:28).

REL/wikipedia aren't installable here (zero egress), so the linker backends
are gated: if REL is importable it is used; otherwise ``link`` raises unless
a JSON cache already provides the answers.  The embedding-integration math —
the part that touches the model — is fully implemented and tested.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

logger = logging.getLogger(__name__)


def entities_cache_filename(cache_dir: str, dataset_dir: str,
                            splits: Sequence[str], wiki_version: str,
                            threshold: float) -> str:
    """Cache file keyed by dataset dir/split/wiki/threshold (reference
    convention, vault/tmsc_utils/dataset.py:185-229)."""
    base = os.path.basename(os.path.normpath(dataset_dir))
    name = f"entities_{base}_{'-'.join(splits)}_{wiki_version}_{threshold}.json"
    return os.path.join(cache_dir, name)


def load_entity_cache(path: str) -> Optional[Dict[str, Tuple[Optional[str], Optional[str]]]]:
    """Load cached target -> (entity, description); corrupted files are
    detected and discarded (reference behavior)."""
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            data = json.load(f)
        assert isinstance(data, dict)
        return {k: tuple(v) if v is not None else (None, None)
                for k, v in data.items()}
    except Exception:
        logger.warning("corrupted entity cache at %s; ignoring", path)
        return None


def save_entity_cache(path: str, cache: Dict):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump({k: list(v) for k, v in cache.items()}, f)


class EntityLinker:
    """REL-backed target linker (vault/entity_linking.py:15-112).  Each
    target string maps to (entity_name, first_wikipedia_paragraph) or
    (None, None) below the confidence threshold."""

    def __init__(self, root_dir: str, wiki_version: str = "wiki_2019",
                 threshold: float = 10000.0):
        self.root_dir = root_dir
        self.wiki_version = wiki_version
        self.threshold = threshold
        try:
            from REL.mention_detection import MentionDetection  # noqa: F401

            self._available = True
        except ImportError:
            self._available = False

    @property
    def available(self) -> bool:
        return self._available

    def link(self, targets: Sequence[str]) -> Dict[str, Tuple[Optional[str], Optional[str]]]:
        if not self._available:
            raise RuntimeError(
                "REL is not installed in this environment; provide a JSON "
                "entity cache instead (load_entity_cache)")
        from REL.entity_disambiguation import EntityDisambiguation
        from REL.mention_detection import MentionDetection
        from REL.ner import Cmns
        from REL.utils import process_results

        md = MentionDetection(self.root_dir, self.wiki_version)
        tagger = Cmns(self.root_dir, self.wiki_version, n=5)
        ed = EntityDisambiguation(self.root_dir, self.wiki_version,
                                  {"mode": "eval", "model_path": "ed-wiki-2019"})
        inputs = {t: [t, []] for t in targets}
        mentions, _ = md.find_mentions(inputs, tagger)
        preds, _ = ed.predict(mentions)
        results = process_results(mentions, preds, inputs)
        out: Dict[str, Tuple[Optional[str], Optional[str]]] = {}
        for t in targets:
            spans = results.get(t, [])
            if not spans:
                out[t] = (None, None)
                continue
            # reference semantics (vault/entity_linking.py:88-92): the
            # entity is KEPT below threshold; only the description is
            # withheld — matching OfflineEntityLinker, so cache files from
            # either backend are interchangeable
            ent, conf = spans[0][3], spans[0][5]
            out[t] = (ent, self._describe(ent)
                      if conf >= self.threshold else None)
        return out

    def _describe(self, entity: str) -> Optional[str]:
        try:
            import wikipedia

            done = False
            while not done:
                try:
                    page = wikipedia.WikipediaPage(entity)
                    done = True
                except wikipedia.DisambiguationError as e:
                    entity = str(e).split("\n")[1]
            text = page.content
            return text[: text.find("\n")]
        except Exception:
            return None


class OfflineEntityLinker:
    """REL-shaped linker over a LOCAL alias-dictionary + description store —
    the no-egress backend closing the reference's online loop
    (vault/entity_linking.py:49-112: mention detection -> disambiguation ->
    threshold -> Wikipedia first paragraph with a DisambiguationError retry
    that follows the page's first suggestion).

    Store file (JSON)::

        {"aliases": {"<alias lowercase>": [["Entity_Name", score], ...]},
         "descriptions": {"Entity_Name": "first paragraph ..."},
         "disambiguations": {"Ambiguous_Entity": ["Concrete_Entity", ...]}}

    Mention detection is alias lookup on the normalized target; the
    best-scoring candidate is the disambiguation; candidates below
    ``threshold`` return ``(entity, None)`` exactly like the reference's
    confidence gate (entity kept, description withheld,
    vault/entity_linking.py:88-92); disambiguation-page entities follow
    their first suggestion, mirroring the ``str(e).split("\\n")[1]`` retry.
    """

    def __init__(self, store_path: str, threshold: float = 0.0):
        with open(store_path) as f:
            store = json.load(f)
        self.aliases: Dict[str, List] = store.get("aliases", {})
        self.descriptions: Dict[str, str] = store.get("descriptions", {})
        self.disambiguations: Dict[str, List[str]] = store.get(
            "disambiguations", {})
        self.threshold = threshold

    @staticmethod
    def _normalize(target: str) -> str:
        return " ".join(target.lower().split())

    def _describe(self, entity: str) -> Optional[str]:
        seen = set()
        while entity in self.disambiguations and entity not in seen:
            seen.add(entity)
            options = self.disambiguations[entity]
            if not options:
                return None
            entity = options[0]
        return self.descriptions.get(entity)

    def link(self, targets: Sequence[str]) -> Dict[str, Tuple[Optional[str], Optional[str]]]:
        out: Dict[str, Tuple[Optional[str], Optional[str]]] = {}
        for t in targets:
            cands = self.aliases.get(self._normalize(t), [])
            if not cands:
                out[t] = (None, None)
                continue
            entity, score = max(cands, key=lambda c: c[1])
            if score < self.threshold:
                out[t] = (entity, None)
            else:
                out[t] = (entity, self._describe(entity))
        return out


def build_entity_cache(cache_path: str, targets: Sequence[str],
                       linker) -> Dict[str, Tuple[Optional[str], Optional[str]]]:
    """Run ``linker`` over unseen targets and persist the JSON cache — the
    reference dataset's link-then-cache flow (vault/tmsc_utils/dataset.py:
    185-283) keyed by target string."""
    cache = load_entity_cache(cache_path) or {}
    todo = [t for t in dict.fromkeys(targets) if t not in cache]
    if todo:
        cache.update(linker.link(todo))
        save_entity_cache(cache_path, cache)
    return cache


def integrate_entities_into_embeddings(word_embeddings: jnp.ndarray,
                                       descriptions: List[str],
                                       tokenizer) -> jnp.ndarray:
    """Grow the word-embedding table by len(descriptions) rows, each
    initialized as the max-pool of the description's token embeddings —
    the reference's integrate_entities_into_model math
    (vault/entity_linking.py:115-148).  ``descriptions`` are in the order
    the entity tokens were added (last added = last row)."""
    n_new = len(descriptions)
    if n_new == 0:
        return word_embeddings
    dim = word_embeddings.shape[1]
    new_rows = np.zeros((n_new, dim), np.float32)
    emb = np.asarray(word_embeddings)
    # the reference pools over tokenizer.encode(desc) — WITH the [CLS]/[SEP]
    # special tokens, whose embedding rows participate in the per-dimension
    # max (vault/entity_linking.py:143-144)
    special_ids = []
    for attr in ("cls_token", "sep_token"):
        tok = getattr(tokenizer, attr, None)
        if tok:
            got = tokenizer.convert_tokens_to_ids([tok])
            special_ids.append(got[0] if isinstance(got, (list, tuple))
                               else got)
    for i, description in enumerate(descriptions):  # add-order == row order
        ids = tokenizer.convert_tokens_to_ids(tokenizer.tokenize(description))
        ids = [j for j in list(ids) + special_ids if j < emb.shape[0]]
        if ids:
            new_rows[i] = emb[ids].max(axis=0)
    return jnp.concatenate([word_embeddings, jnp.asarray(new_rows)], axis=0)


def resolve_entities_for_cli(entity_cache: Optional[str],
                             wiki_store: Optional[str], threshold: float,
                             tokenizer, read_targets):
    """Link-then-cache flow shared by both experiment CLIs (reference
    dataset flow, vault/tmsc_utils/dataset.py:185-283): build the JSON
    cache when missing (offline alias store, or REL when importable), load
    it, register "[entity]" tokens on the tokenizer, and return

      (entity_map: target -> "[entity]" token appended to the target text,
       entity_descriptions: descriptions in token-registration order —
       the order integrate_entities_into_embeddings appends rows in).

    ``read_targets`` is a zero-arg callable producing the targets to link
    (only invoked when the cache must be built)."""
    import os

    entity_map: Dict[str, str] = {}
    descriptions: list = []
    if wiki_store and not entity_cache:
        raise ValueError(
            "--wiki_store was given without --entity_cache: the store is "
            "only consulted when building the cache file — pass "
            "--entity_cache <path> to build/use one")
    if not entity_cache or not hasattr(tokenizer, "add_tokens"):
        return entity_map, descriptions

    if not os.path.exists(entity_cache):
        if wiki_store:
            linker = OfflineEntityLinker(wiki_store, threshold)
        else:
            rel = EntityLinker(".", threshold=threshold)
            linker = rel if rel.available else None
        if linker is None:
            # the reference raises from EntityLinker here; silently training
            # with ZERO entities would misreport the requested experiment
            raise RuntimeError(
                f"--entity_cache {entity_cache} does not exist and no linker "
                "is available to build it (REL is not importable and no "
                "--wiki_store was given). Provide an existing cache file or "
                "an offline alias store.")
        build_entity_cache(entity_cache, read_targets(), linker)

    cache = load_entity_cache(entity_cache) or {}
    for tgt, (entity, desc) in cache.items():
        if entity and desc:
            token = f"[{entity}]"  # reference token surface (:270)
            if tokenizer.add_tokens([token]) == 1:
                descriptions.append(desc)
            entity_map[tgt] = token
    return entity_map, descriptions


def integrate_entities_into_vault(params, cfg, entity_descriptions,
                                  tokenizer):
    """Grow the ACTIVE text tower's word-embedding table with entity rows
    (max-pool init, :func:`integrate_entities_into_embeddings`) and bump the
    matching config vocab_size.  Returns ``(params, cfg)``; the input tree
    is not mutated.  One helper shared by both experiment CLIs — the two
    hand-rolled copies had already drifted (in-place vs rebuilt trees)."""
    import dataclasses

    if not entity_descriptions:
        return params, cfg
    target = "bert" if cfg.text_tower is not None else "vilt"
    emb_key = "embeddings" if target == "bert" else "text_embeddings"
    table = integrate_entities_into_embeddings(
        params[target][emb_key]["word"], entity_descriptions, tokenizer)
    params = {**params,
              target: {**params[target],
                       emb_key: {**params[target][emb_key], "word": table}}}
    if target == "bert":
        cfg = dataclasses.replace(cfg, text_tower=dataclasses.replace(
            cfg.text_tower, vocab_size=int(table.shape[0])))
    else:
        cfg = dataclasses.replace(cfg, vilt=dataclasses.replace(
            cfg.vilt, vocab_size=int(table.shape[0])))
    return params, cfg
