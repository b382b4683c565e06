"""Rule-based coreference resolution (flag-gated, default off).

Reference behavior (src/rdf_graph/rdf_extract.py:249-429
``StanfordCoreferenceResolution``): CoreNLP dcoref clusters mentions,
then the *representative* mention text is spliced over every
non-representative mention span, and the document is re-joined. The
reference keeps this optional and off by default
(coref_opt=False, rdf_graph.py:24).

The rebuild's deterministic stand-in (no CoreNLP server at scale):
sentence-initial third-person pronouns (it/they/this/these + optional
copular 'it') are replaced by the most recent preceding sentence's
subject noun phrase — the dominant anaphora pattern in expository
text. Splice-over-span semantics match the reference's restructuring
(replace the mention token span, keep everything else).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from .parse import parse_document, split_sentences, tokenize

PRONOUNS = {"it", "they", "this", "these", "those", "he", "she"}


def _subject_phrase(tokens: list[dict]) -> str | None:
    """The nsubj head and its det/amod/compound dependents, in order."""
    head_idx = next((i for i, t in enumerate(tokens)
                     if t["dep"] == "nsubj"), None)
    if head_idx is None:
        return None
    members = [i for i, t in enumerate(tokens)
               if i == head_idx or (t["head"] == head_idx and
                                    t["dep"] in ("det", "amod", "compound"))]
    return " ".join(tokens[i]["text"] for i in sorted(members))


def resolve_pronouns(text: str, lexicon: dict[str, str],
                     lemmas: dict[str, str]) -> str:
    """Document text → text with sentence-initial pronouns replaced by
    the previous sentence's subject NP."""
    sents = split_sentences(text)
    out: list[str] = []
    last_subject: str | None = None
    for sent in sents:
        words = tokenize(sent)
        if words and words[0].lower() in PRONOUNS and last_subject:
            # splice the representative mention over the pronoun span
            rest = sent.split(None, 1)
            sent = last_subject + (" " + rest[1] if len(rest) > 1 else "")
        parsed = parse_document(sent, lexicon, lemmas)
        if parsed:
            subj = _subject_phrase(parsed[0][2])
            if subj:
                last_subject = subj
        out.append(sent)
    return " ".join(out)


def resolve_coref_stage(df, lexicon: dict[str, str],
                        lemmas: dict[str, str],
                        text_col: str = "clean_text"):
    """Arrow-batched coref stage over cleaned documents (optional,
    mirrors the reference's coref_opt flag)."""
    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[text_col] = [
                None if t is None else resolve_pronouns(t, lexicon, lemmas)
                for t in pdf[text_col]]
            yield pdf[cols]

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    return df.mapInPandas(run, schema=schema)
