"""Textacy-path extractor twin (RDFExtractor.extract semantics,
rdf_extract.py:767-833 with the pipeline CLI defaults)."""

from multivac_spark.functions.parse import parse_document
from multivac_spark.functions.svo_textacy import (
    NORM_REGEX_CHARS1, NORM_REGEX_CHARS2, extract_svo_textacy,
    extract_triples_textacy_stage)
from multivac_spark.plans.pipeline import default_lexicons

LEX, LEMMAS = default_lexicons()


def _svo(sentence):
    out = []
    for _, _, toks in parse_document(sentence, LEX, LEMMAS):
        out.extend(extract_svo_textacy(toks))
    return out


def test_basic_triple_lowercased_and_chunk_snapped():
    # subject/object tokens snap to their containing noun chunks and
    # all parts are lower_ (lowercase=True, lemmatize=False defaults)
    assert _svo("The viral genome infects the cell.") == \
        [(0, "the viral genome", "infects", "the cell")]


def test_any_digit_kills_triple():
    # remove_numeric='any' → any digit in a PART drops the triple
    assert _svo("The virus2 infects the cell.") == []
    assert _svo("The virus infects the cell9.") == []


def test_min_char_lengths():
    # len(sub) >= 3 and len(obj) >= 3 on the RAW spans (pre-snap)
    assert _svo("It binds it.") == []


def test_that_subject_repaired_by_preceding_chunk():
    # OBJECTS_TO_REPLACE subject → last chunk occurring before the span
    toks = None
    for _, _, t in parse_document(
            "The virus that infects the cell activates the enzyme.",
            LEX, LEMMAS):
        toks = t
    triples = extract_svo_textacy(toks)
    # whatever verb attachment the parser picks, no triple may keep a
    # bare 'that' subject when a preceding chunk exists
    assert triples
    assert all(s != "that" for _, s, _, _ in triples)


def test_that_without_preceding_chunk_is_kept():
    # reference keeps the span when no preceding chunk qualifies
    assert _svo("that infects the cell.") == \
        [(0, "that", "infects", "the cell")]


def test_normalize_regexes_match_reference_behavior():
    # NORM_REGEX_CHARS1 strips listed punctuation anywhere; CHARS2
    # strips a single leading dash/apostrophe-s token
    assert NORM_REGEX_CHARS1.sub("", "the (viral) genome,") == \
        "the viral genome"
    assert NORM_REGEX_CHARS2.sub("", "- the cell") == "the cell"
    assert NORM_REGEX_CHARS2.sub("", "’s membrane") == "membrane"


def test_no_subject_or_no_object_yields_nothing():
    assert _svo("The virus replicates.") == []  # no dobj


def test_stage_runs_on_spark(spark):
    from multivac_spark.functions.clean import clean_text_stage
    from multivac_spark.functions.html_text import extract_text_stage
    from multivac_spark.functions.parse import parse_stage
    from multivac_spark.sources import corpus

    docs = corpus.documents_df(spark, 60, partitions=4)
    sents = parse_stage(
        clean_text_stage(extract_text_stage(docs).filter("lang='en'"),
                         frozenset(LEX)), LEX, LEMMAS)
    triples = extract_triples_textacy_stage(sents)
    rows = triples.limit(2000).collect()
    assert rows
    for r in rows:
        assert r["subj"] and r["pred"] and r["obj"]
        assert r["subj"] == r["subj"].lower()
        assert not any(c.isdigit() for c in r["subj"] + r["obj"])


def test_pipeline_textacy_extractor_end_to_end(spark):
    """PipelineConfig(extractor='textacy') drives the Phase-II path
    through normalize -> canonicalize -> edges."""
    from multivac_spark.plans.pipeline import PipelineConfig, run_pipeline
    from multivac_spark.sources import corpus

    docs = corpus.documents_df(spark, 80, partitions=4)
    emb = corpus.embeddings_df(spark)
    tables = run_pipeline(spark, docs, emb,
                          PipelineConfig(top_n_ent=2000, top_n_rel=50,
                                         extractor="textacy"))
    trip = tables["triples"]
    n = trip.count()
    assert n > 50
    # textacy-path signature: normalized parts never contain digits and
    # single-word subjects pass the NN check like the primary path
    assert tables["edges"].count() > 0
