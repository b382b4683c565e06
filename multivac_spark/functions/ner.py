"""Deterministic entity-mention tagger — the executor-scale twin of
CoreNLP's ``entitymentions`` annotator for ``expand_rdfs``.

The reference widens RDF node token-lists to cover overlapping entity
mentions (``expand_rdfs``, rdf_parse.py:214-226); the mentions come
from CoreNLP's statistical NER + RegexNER over the ``parse`` dict.
Neither a JVM CoreNLP server nor a model download belongs on a Spark
executor hot path, so this twin produces the same *shape* — a list of
``(tokenBegin, tokenEnd, label)`` spans, non-overlapping, maximal —
from deterministic rules in CoreNLP's own precedence style
(RegexNER/gazetteer overrides > rule NER > numeric classifier):

1. **gazetteer** phrases (longest match wins, case-insensitive) —
   the RegexNER analog; callers supply domain term → label maps;
2. **acronyms** ``[A-Z]{2,6}`` (with optional digits) → ORGANIZATION;
3. **proper-noun runs** (maximal contiguous NNP/NNPS) → ENTITY;
4. **number runs** (contiguous CD) → NUMBER.

``expand_rdfs`` only reads ``tokenBegin``/``tokenEnd``, so labels are
informational (kept for parity with the CoreNLP mention dicts and for
downstream type constraints).
"""

from __future__ import annotations

import re

_ACRONYM = re.compile(r"^[A-Z][A-Z0-9]{1,5}$")


def _is_acronym(text: str) -> bool:
    # ≥2 chars, all caps/digits, at least two letters ("T5" is a model
    # name but "A1" alone is ambiguous — CoreNLP's rule NER is equally
    # conservative about short all-caps tokens)
    return (bool(_ACRONYM.match(text))
            and sum(c.isalpha() for c in text) >= 2)


def entity_mentions(tokens: list[dict],
                    gazetteer: dict[str, str] | None = None
                    ) -> list[tuple[int, int, str]]:
    """Parsed-token list → [(tokenBegin, tokenEnd, label)] spans,
    sorted, non-overlapping (first rule to claim a token wins;
    gazetteer phrases claim greedily longest-first, like RegexNER's
    ``bestMatch`` default)."""
    n = len(tokens)
    if n == 0:
        return []
    texts = [(t.get("text") or "") for t in tokens]
    pos = [(t.get("pos") or "") for t in tokens]
    claimed = [False] * n
    spans: list[tuple[int, int, str]] = []

    def claim(b: int, e: int, label: str) -> None:
        spans.append((b, e, label))
        for j in range(b, e):
            claimed[j] = True

    # 1. gazetteer, longest phrase first
    if gazetteer:
        lowered = [t.lower() for t in texts]
        by_len = sorted(
            ((term.lower().split(), label)
             for term, label in gazetteer.items()),
            key=lambda kv: -len(kv[0]))
        for words, label in by_len:
            w = len(words)
            if w == 0:
                continue
            j = 0
            while j + w <= n:
                if (not any(claimed[j:j + w])
                        and lowered[j:j + w] == words):
                    claim(j, j + w, label)
                    j += w
                else:
                    j += 1

    # 2. acronyms (single-token)
    for j in range(n):
        if not claimed[j] and _is_acronym(texts[j]):
            claim(j, j + 1, "ORGANIZATION")

    # 3. maximal NNP/NNPS runs
    j = 0
    while j < n:
        if pos[j].startswith("NNP") and not claimed[j]:
            b = j
            while (j + 1 < n and pos[j + 1].startswith("NNP")
                   and not claimed[j + 1]):
                j += 1
            claim(b, j + 1, "ENTITY")
        j += 1

    # 4. contiguous CD runs
    j = 0
    while j < n:
        if pos[j] == "CD" and not claimed[j]:
            b = j
            while j + 1 < n and pos[j + 1] == "CD" and not claimed[j + 1]:
                j += 1
            claim(b, j + 1, "NUMBER")
        j += 1

    return sorted(spans)


def chunk_mentions(tokens: list[dict]) -> list[tuple[int, int, str]]:
    """NP-chunk mention source (the weaker inventory the twin used
    before rule NER existed) in the same span shape, so the two
    sources are drop-in interchangeable."""
    from .svo_textacy import _noun_chunks

    offs = []
    pos = 0
    for t in tokens:
        w = t.get("text") or ""
        offs.append((pos, pos + len(w)))
        pos += len(w) + 1
    return [(c.toks[0], c.toks[-1] + 1, "NP")
            for c in _noun_chunks(tokens, offs)]
