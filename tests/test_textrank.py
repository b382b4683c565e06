"""TextRank sentence ranking + TF-IDF answer path (the reference's
third query-generation approach, doc/phase_two_developments.md:110-112;
the QG-Net generator itself is a documented non-goal)."""

import numpy as np

from multivac_spark.operators.textrank import (answer_words,
                                               rank_sentences,
                                               textrank_queries,
                                               textrank_scores)


def test_textrank_kernel_prefers_central_sentence():
    # sentence 0 shares words with both others; 1 and 2 are disjoint
    toks = [["virus", "cell", "genome"],
            ["virus", "membrane", "assay"],
            ["cell", "protein", "binding"]]
    s = textrank_scores(toks)
    assert len(s) == 3
    assert s[0] > s[1] and s[0] > s[2]
    # damped pagerank conserves total mass ~1
    assert abs(s.sum() - 1.0) < 1e-6


def test_textrank_kernel_edge_cases():
    assert textrank_scores([]).shape == (0,)
    assert textrank_scores([["only"]]).tolist() == [1.0]
    # fully disjoint sentences → uniform scores
    s = textrank_scores([["a", "b"], ["c", "d"], ["e", "f"]])
    assert np.allclose(s, s[0])


def test_rank_sentences_spark(spark):
    rows = []
    for d in range(3):
        url = f"https://h/{d}"
        rows += [(url, 0, "the virus infects the cell and the genome"),
                 (url, 1, "the virus replicates in the cell"),
                 (url, 2, "unrelated filler words entirely disjoint here")]
    sents = spark.createDataFrame(rows, "url string, sent_id int, text string")
    ranked = rank_sentences(sents, top_k=2)
    out = ranked.collect()
    assert len(out) == 6  # 2 per doc
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["url"], []).append(r)
    for url, rs in per_doc.items():
        rs = sorted(rs, key=lambda r: r["rank"])
        # the two virus/cell sentences outrank the disjoint filler
        assert {r["sent_id"] for r in rs} == {0, 1}
        assert rs[0]["textrank_milli"] >= rs[1]["textrank_milli"]


def test_textrank_queries_end_to_end(spark):
    from multivac_spark.functions.parse import fused_sentences_stage
    from multivac_spark.plans.pipeline import default_lexicons
    from multivac_spark.sources import corpus

    from multivac_spark.functions.html_text import extract_text_stage

    lex, lemmas = default_lexicons()
    docs = corpus.documents_df(spark, 40, partitions=4)
    sents = fused_sentences_stage(docs, lex, lemmas, "en")
    extracted = (extract_text_stage(docs)
                 .filter("text IS NOT NULL").select("url", "text"))
    q = textrank_queries(sents, extracted, top_k=2)
    rows = q.collect()
    assert rows
    for r in rows:
        assert 1 <= r["rank"] <= 2
        assert r["answer"]  # a TF-IDF answer token was selected
