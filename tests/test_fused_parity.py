"""The fused doc→triples stage must produce exactly the staged path's
triples (extract → clean → parse → svo)."""

from multivac_spark.functions.clean import clean_text_stage
from multivac_spark.functions.fused import fused_extract_stage
from multivac_spark.functions.html_text import extract_text_stage
from multivac_spark.functions.parse import parse_stage
from multivac_spark.functions.svo import extract_triples_stage
from multivac_spark.plans.pipeline import default_lexicons
from multivac_spark.sources import corpus


def test_fused_equals_staged(spark):
    lex, lemmas = default_lexicons()
    docs = corpus.documents_df(spark, 60, partitions=4)

    staged = extract_triples_stage(
        parse_stage(
            clean_text_stage(
                extract_text_stage(docs).filter("lang = 'en'"),
                frozenset(lex)),
            lex, lemmas))
    fused = fused_extract_stage(docs, lex, lemmas, "en")

    a = sorted(tuple(r) for r in staged.collect())
    b = sorted(tuple(r) for r in fused.collect())
    assert a == b
    assert len(a) > 50


def test_fused_normalize_equals_column_normalize(spark):
    from multivac_spark.functions.normalize import normalize_triples
    from multivac_spark.sources import vocab

    lex, lemmas = default_lexicons()
    docs = corpus.documents_df(spark, 60, partitions=4)

    column_path = normalize_triples(
        fused_extract_stage(docs, lex, lemmas, "en"),
        vocab.verb_lemma_table(), lex)
    python_path = fused_extract_stage(
        docs, lex, lemmas, "en", normalize=True,
        verb_lemmas=vocab.verb_lemma_table())

    a = sorted(tuple(r) for r in column_path.collect())
    b = sorted(tuple(r) for r in python_path.collect())
    assert a == b
    assert len(a) > 50
