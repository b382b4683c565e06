"""Fused document→triples extraction stage.

One Arrow-batched ``mapInPandas`` pass running html→text → clean →
sentence split → dependency parse → SVO extraction per document. The
intermediate token structs never cross the Arrow boundary — nested
list<struct> serialization is the dominant cost of the staged path
(SURVEY.md §1.2 flagged exactly this) — so this narrow, shuffle-free
stage is the throughput path for the 100 TB pipeline. The staged
variants remain for producing the ``sentences`` product table and for
unit-level parity tests.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from .clean import clean_document
from .html_text import extract_article_text
from .parse import parse_document
from .svo import extract_svo

TRIPLES_SCHEMA = ("url string, sent_id int, rdf_idx int, "
                  "subj string, pred string, obj string")


def fused_extract_stage(documents, lexicon: dict[str, str],
                        lemmas: dict[str, str],
                        lang_filter: str | None = "en",
                        normalize: bool = False,
                        verb_lemmas: dict[str, str] | None = None,
                        mention_source: str | None = None,
                        gazetteer: dict[str, str] | None = None):
    """documents(url, warc_ts, html, text, lang) → raw (or, with
    ``normalize=True``, normalized) triples in a single Arrow pass.

    NULL-text pages (no <article>) flow through producing zero rows
    (FIXTURES.md invariant #5). ``normalize=True`` applies the
    preprocess_raw_tuples semantics in-pass via ``normalize_triple_py``
    (parity-pinned against the Column implementation).
    ``mention_source`` ('ner' | 'chunks' | None) applies the
    expand_rdfs mention widening inside the same pass — staged-path
    parity pinned in tests/test_ner_expand.py."""
    lexset = frozenset(lexicon)
    if normalize:
        from .normalize import normalize_triple_py
        vl = verb_lemmas or {}
        non_nouns = frozenset(
            k for k, v in lexicon.items() if not v.startswith("NN"))
    if mention_source not in (None, "ner", "chunks"):
        raise ValueError(f"unknown mention_source: {mention_source!r}")
    if mention_source == "ner":
        from .ner import entity_mentions
        mention_fn = lambda tl: entity_mentions(tl, gazetteer)
    elif mention_source == "chunks":
        from .ner import chunk_mentions
        mention_fn = chunk_mentions
    src = documents
    if lang_filter:
        src = src.filter(src.lang == lang_filter)
    src = src.select("url", "html", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"url": [], "sent_id": [], "rdf_idx": [],
                   "subj": [], "pred": [], "obj": []}
            for url, html, text in zip(pdf["url"], pdf["html"], pdf["text"]):
                if text is None:
                    text = extract_article_text(html)
                if text is None:
                    continue
                cleaned = clean_document(text, lexset)
                for sid, _, toks in parse_document(cleaned, lexicon, lemmas):
                    spans = None
                    if mention_source:
                        spans = [(b, e) for b, e, _l in mention_fn(toks)]
                    for idx, s, p, o in extract_svo(toks, mentions=spans):
                        if normalize:
                            norm = normalize_triple_py(s, p, o, vl, non_nouns)
                            if norm is None:
                                continue
                            s, p, o = norm
                        out["url"].append(url)
                        out["sent_id"].append(sid)
                        out["rdf_idx"].append(idx)
                        out["subj"].append(s)
                        out["pred"].append(p)
                        out["obj"].append(o)
            yield pd.DataFrame({
                "url": pd.Series(out["url"], dtype=object),
                "sent_id": pd.Series(out["sent_id"], dtype="int32"),
                "rdf_idx": pd.Series(out["rdf_idx"], dtype="int32"),
                "subj": pd.Series(out["subj"], dtype=object),
                "pred": pd.Series(out["pred"], dtype=object),
                "obj": pd.Series(out["obj"], dtype=object),
            })

    return src.mapInPandas(run, schema=TRIPLES_SCHEMA)
