"""Text-analysis operators for large-scale corpus pipelines.

First-class components alongside the KG pipeline: language-ID (marker
heuristic), quality scoring, token counting, document fingerprinting.
All are pure Column expressions (whole-stage codegen, no Python), and
each has an exact ANSI-SQL twin used as the DuckDB oracle in
``__spark_entry__.py`` — integer-valued outputs wherever possible so
the cross-engine value-hash comparison is float-free.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

STOPWORDS = ["the", "a", "an", "of", "in", "and", "to", "is", "with",
             "this", "each", "every"]

# tiny closed marker sets for the language-ID heuristic (n-gram/marker
# heuristic; deterministic and SQL-twinnable)
LANG_MARKERS = {
    "en": ["the", "and", "with", "this"],
    "de": ["der", "die", "und", "mit"],
    "fr": ["le", "la", "et", "avec"],
    "es": ["el", "los", "y", "con"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokens, empties dropped (mirrors word splitting used
    throughout the reference, e.g. rdf_graph.py:283)."""
    return F.filter(F.split(col, " "), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def char_sum(col: Column) -> Column:
    """Total characters across tokens (with token_count gives avg token
    length without emitting floats)."""
    return F.aggregate(
        F.transform(tokens(col), lambda t: F.length(t)),
        F.lit(0), lambda acc, x: acc + x)


def stopword_count(col: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS
    return F.size(F.filter(tokens(F.lower(col)), lambda t: t.isin(sw)))


def digit_token_count(col: Column) -> Column:
    return F.size(F.filter(tokens(col), lambda t: t.rlike("[0-9]")))


def lang_score(col: Column, markers: list[str]) -> Column:
    return F.size(F.filter(tokens(F.lower(col)), lambda t: t.isin(markers)))


def langid(col: Column) -> Column:
    """Argmax over marker scores; ties resolved by language code order
    (deterministic). Unknown when every score is 0."""
    pairs = [(lang, lang_score(col, m)) for lang, m in
             sorted(LANG_MARKERS.items())]
    best_score = F.greatest(*[s for _, s in pairs])
    result = F.lit("und")
    for lang, score in reversed(pairs):  # earlier langs win ties
        result = F.when((score == best_score) & (best_score > 0),
                        F.lit(lang)).otherwise(result)
    return result


def fingerprint(col: Column, k: int = 5) -> Column:
    """Prefix fingerprint: md5 over the first k tokens — the rebuild's
    analog of the reference's 500-char-prefix dedup probe
    (textparsing.py:70-76)."""
    return F.md5(F.concat_ws(" ", F.slice(tokens(col), 1, k)))
