"""Triple normalization + validity filters — pure Spark built-ins.

Behavioral port of ``RDFGraph.preprocess_raw_tuples`` (src/rdf_graph/
rdf_graph.py:340-402) and the validity predicates of
``RDFExtractor._triple_checks_out`` / ``check_numeric``
(src/rdf_graph/rdf_extract.py:607-673) and the ascii-start filter
(rdf_extract.py:124-128).

Everything here is whole-stage-codegen-friendly Column expressions: the
WordNet-verb-lemmatizer is a broadcast-sized ``map`` literal over the
closed vocabulary (SURVEY.md §7.1 step 6), the single-token-entity POS
check a ``map`` lookup defaulting to NN (nltk ``pos_tag`` stand-in).
No Python UDF appears in this stage.

Reference semantics per part (rdf_graph.py:356-396):
  * tokenize(lower) → drop punctuation tokens
  * predicate: lemmatize each token as a verb; >4 tokens → drop triple;
    multi-token → remove 'be'
  * entity: single-token entities must tag NN*
  * all three parts non-empty → keep
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PUNCT_TOKENS = list("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~")
_PUNCT_SET = set(_PUNCT_TOKENS)
_DIGITS = set("0123456789")
_DIGIT_RE = re.compile(r"[0-9]")


def normalize_triple_py(subj: str, pred: str, obj: str,
                        verb_lemmas: dict[str, str],
                        non_nouns: frozenset[str],
                        max_pred_tokens: int = 4,
                        min_char_len: int = 3):
    """Pure-Python twin of ``normalize_triples`` (same semantics, same
    filters) for the fused extraction stage — lets the whole doc→triple
    path run as ONE Arrow pass with no JVM regex work. Parity with the
    Column implementation is pytest-pinned (test_fused_parity)."""
    s_toks = [t for t in subj.lower().split() if t and t not in _PUNCT_SET]
    o_toks = [t for t in obj.lower().split() if t and t not in _PUNCT_SET]
    p_toks = [verb_lemmas.get(t, t) for t in pred.lower().split()
              if t and t not in _PUNCT_SET]
    if not (1 <= len(p_toks) <= max_pred_tokens):
        return None
    if len(p_toks) > 1:
        p_toks = [t for t in p_toks if t != "be"]
    if not s_toks or not o_toks or not p_toks:
        return None
    if len(s_toks) == 1 and s_toks[0] in non_nouns:
        return None
    if len(o_toks) == 1 and o_toks[0] in non_nouns:
        return None
    s, p, o = " ".join(s_toks), " ".join(p_toks), " ".join(o_toks)
    _search = _DIGIT_RE.search  # C-speed twin of any(ch in _DIGITS)
    for part in (s, p, o):
        if _search(part):
            return None
    if len(s) < min_char_len or len(o) < min_char_len:
        return None
    for part in (s, p, o):
        if not ("a" <= part[0] <= "z"):  # ascii-start, exact rlike("^[a-z]")
            return None
    return s, p, o


def _map_literal(d: dict[str, str]) -> Column:
    kv: list[Column] = []
    for k, v in d.items():
        kv.append(F.lit(k))
        kv.append(F.lit(v))
    return F.create_map(*kv)


def _tokens(col: Column) -> Column:
    """lower → split on spaces → drop punctuation-only tokens
    (word_tokenize(lower) stand-in; parts arrive pre-tokenized,
    space-joined from the extractor)."""
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    return F.filter(toks, lambda t: (t != "") & ~t.isin(_PUNCT_TOKENS))


def normalize_triples(raw: DataFrame,
                      verb_lemmas: dict[str, str],
                      pos_lexicon: dict[str, str],
                      max_pred_tokens: int = 4,
                      min_char_len: int = 3) -> DataFrame:
    """raw_triples(url, sent_id, rdf_idx, subj, pred, obj) → normalized
    triples with the same columns, filtered + canonical-cased."""
    lemma_map = _map_literal(verb_lemmas)
    # Single-token entities must tag NN*; the closed-world tagger defaults
    # unknown tokens to NN, so only the *non-noun* lexicon entries can
    # fail the check — an InSet membership test, not a 1k-entry map.
    non_nouns = sorted(k for k, v in pos_lexicon.items()
                       if not v.startswith("NN"))

    def lemmatize_pred(col: Column) -> Column:
        toks = _tokens(col)
        return F.transform(toks, lambda t: F.coalesce(lemma_map[t], t))

    def norm_ent(col: Column) -> Column:
        return _tokens(col)

    df = (raw
          .withColumn("_s", norm_ent(F.col("subj")))
          .withColumn("_p_lem", lemmatize_pred(F.col("pred")))
          .withColumn("_o", norm_ent(F.col("obj")))
          # relation ≤ max tokens BEFORE 'be'-removal (rdf_graph.py:369-375
          # checks len(tokens) first, then strips 'be'): a 5-token
          # predicate containing 'be' must be dropped, not kept.
          .filter((F.size("_p_lem") >= 1)
                  & (F.size("_p_lem") <= max_pred_tokens))
          # multi-token relations drop 'be' (rdf_graph.py:372-375)
          .withColumn("_p", F.when(F.size("_p_lem") > 1,
                                   F.array_remove(F.col("_p_lem"), "be"))
                             .otherwise(F.col("_p_lem")))
          .drop("_p_lem"))

    # single-token entities must be nouns (rdf_graph.py:380-384)
    def single_tok_is_noun(arr: Column) -> Column:
        return (F.size(arr) != 1) | ~arr.getItem(0).isin(non_nouns)

    df = (df
          # empty parts dropped ('be'-removal can empty a multi-token pred)
          .filter((F.size("_p") >= 1) & (F.size("_s") >= 1)
                  & (F.size("_o") >= 1))
          .filter(single_tok_is_noun(F.col("_s")))
          .filter(single_tok_is_noun(F.col("_o")))
          .withColumn("subj", F.concat_ws(" ", "_s"))
          .withColumn("pred", F.concat_ws(" ", "_p"))
          .withColumn("obj", F.concat_ws(" ", "_o"))
          .drop("_s", "_p", "_o"))

    # validity predicates (rdf_extract.py:607-673, remove_numeric='any';
    # min char length 3) + ascii-start (rdf_extract.py:124-128). These are
    # plain pushdown-able filters on the normalized strings.
    no_digit = (~F.col("subj").rlike("[0-9]")
                & ~F.col("pred").rlike("[0-9]")
                & ~F.col("obj").rlike("[0-9]"))
    long_enough = ((F.length("subj") >= min_char_len)
                   & (F.length("obj") >= min_char_len))
    ascii_start = (F.col("subj").rlike("^[a-z]")
                   & F.col("pred").rlike("^[a-z]")
                   & F.col("obj").rlike("^[a-z]"))
    return df.filter(no_digit & long_enough & ascii_start)
