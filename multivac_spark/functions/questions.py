"""Question post-processing / clean-up.

Behavioral port of src/data/clean_questions.py:27-139 ``clean_text``:
prefix-regex strip, suffix fixes, ≥20%-real-word threshold against the
vocabulary, last-sentence truncation at 100 tokens, final regex strip,
min-length check, capitalization. The spaCy vocabulary check becomes
the closed synthetic lexicon; the spaCy tokenizer/sentencizer become
the engine's deterministic tokenizer/splitter (functions/parse.py) —
same replacements as everywhere else in the rebuild (no NLP server or
in-process model on executors).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from .parse import split_sentences, tokenize

REGEXES_LIST = [re.compile(r)
                for r in (r"^\(?[a-zA-Z0-9\.\-]+\)\)?,?\s*",
                          r"^[0-9\.\s\-]+\s*",
                          r"^\*\s*",
                          r"^[a-zA-Z]+\.\s+",
                          r"^\)/s*",
                          r"^P[0-9]{1,3}\s*",
                          r"\s*(Numeric)?Citation*")]

REGEXES_DICT = {"?": re.compile(r"\s*\?$"),
                r"\1": re.compile(r"^.*?([a-zA-Z])")}

REGEX_SENTENCES = re.compile(r".*[.?!]\s+(.+[.?!])$")
REGEXES_LIST_FINAL = [re.compile(r"^.+\([1-2][0-9]{3}\)")]

REMOVED_TOKEN = "<REMOVED>"


def clean_question(text: str,
                   lexicon: frozenset[str],
                   min_char_len: int = 2,
                   min_word_threshold: float = 0.20,
                   max_word_len: int = 100,
                   removed_token: str = REMOVED_TOKEN) -> str:
    """One question through the reference chain (clean_questions.py:45-139)."""
    cleaned = text.encode("utf-8", "replace").decode("utf-8")

    for regex in REGEXES_LIST:
        cleaned = regex.sub("", cleaned)
    for update, regex in REGEXES_DICT.items():
        cleaned = regex.sub(update, cleaned)

    toks = tokenize(cleaned)
    n_tokens = len(toks)
    if n_tokens == 0:
        return removed_token
    words = [t for t in toks
             if t.isalpha() and len(t) > min_char_len
             and t.lower() in lexicon]
    if (len(words) / n_tokens) < min_word_threshold:
        return removed_token

    # last-sentence truncation (clean_questions.py:114-123)
    if n_tokens >= max_word_len:
        sents = split_sentences(cleaned)
        if sents:
            cleaned = sents[-1]
    else:
        m = REGEX_SENTENCES.findall(cleaned)
        if m:
            cleaned = m[-1].strip()

    for regex in REGEXES_LIST_FINAL:
        cleaned = regex.sub("", cleaned)

    if len(tokenize(cleaned)) <= min_char_len:
        return removed_token

    cleaned = cleaned.strip()
    if not cleaned:
        return removed_token
    return cleaned[0].upper() + cleaned[1:]


def clean_questions_stage(df, lexicon: frozenset[str],
                          text_col: str = "question"):
    """Arrow-batched stage; rows cleaning to <REMOVED> are dropped."""
    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[text_col] = [
                None if q is None else clean_question(q, lexicon)
                for q in pdf[text_col]]
            yield pdf[cols]

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    out = df.mapInPandas(run, schema=schema)
    return out.filter((out[text_col].isNotNull())
                      & (out[text_col] != REMOVED_TOKEN))
