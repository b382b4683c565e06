"""Parser gold-exactness + SVO extractor parity vs the oracle
(FIXTURES.md invariant #2 at unit level)."""

import numpy as np

from multivac_spark.functions import parse as P
from multivac_spark.functions import svo as S
from multivac_spark.functions.clean import clean_document
from multivac_spark.sources import corpus, vocab

from .oracle_ref import substitute_rdfs_oracle


def _lexicons():
    lex = vocab.pos_lexicon()
    lemmas = dict(vocab.verb_lemma_table())
    for concept, variants in vocab.noun_variants().items():
        for v in variants:
            lemmas.setdefault(v, concept)
    return lex, lemmas


def test_parser_reproduces_gold_parse_on_grammar_sentences():
    lex, lemmas = _lexicons()
    rng = np.random.RandomState(123)
    mismatches = 0
    total = 0
    for _ in range(300):
        gold = corpus.gen_sentence_tokens(rng)
        text = corpus.render_sentence(gold)
        words = P.tokenize(text)
        parsed = P.parse_tokens(words, lex, lemmas)
        total += 1
        gold_cmp = [(t["i"], t["text"], t["pos"], t["head"], t["dep"])
                    for t in gold]
        mine_cmp = [(t["i"], t["text"], t["pos"], t["head"], t["dep"])
                    for t in parsed]
        if gold_cmp != mine_cmp:
            mismatches += 1
            if mismatches <= 3:
                print("GOLD:", gold_cmp)
                print("MINE:", mine_cmp)
    assert mismatches == 0, f"{mismatches}/{total} sentences mis-parsed"


def test_svo_matches_oracle_on_gold_tokens():
    rng = np.random.RandomState(7)
    for _ in range(500):
        gold = corpus.gen_sentence_tokens(rng)
        mine = S.extract_svo(gold)
        oracle = substitute_rdfs_oracle(gold)
        assert mine == oracle, f"\nmine={mine}\noracle={oracle}\ntoks={gold}"


def test_svo_matches_oracle_on_noisy_parsed_sentences():
    """Run clean→split→tokenize→parse, then compare the two SVO
    implementations on whatever the parser produced (noise included)."""
    lex, lemmas = _lexicons()
    lexset = frozenset(lex)
    checked = 0
    for i in range(80):
        row = corpus.gen_document(i)
        from multivac_spark.functions.html_text import extract_article_text
        text = extract_article_text(row["html"])
        if text is None:
            continue
        cleaned = clean_document(text, lexset)
        for _, _, toks in P.parse_document(cleaned, lex, lemmas):
            assert S.extract_svo(toks) == substitute_rdfs_oracle(toks)
            checked += 1
    assert checked > 200


def test_pipeline_triples_recall_vs_gold():
    """End-to-end P/R ≥ 0.95 at sf0.01 scale (FIXTURES.md invariant #2):
    pipeline triples vs gold-derived triples (gold = oracle SVO over the
    grammar's gold parses), 1000 documents."""
    lex, lemmas = _lexicons()
    lexset = frozenset(lex)
    from multivac_spark.functions.html_text import extract_article_text

    gold_set = set()
    mine_set = set()
    for i in range(1000):
        row, gold = corpus.gen_document(i, with_gold=True)
        for toks in gold:
            for idx, s, p, o in substitute_rdfs_oracle(toks):
                gold_set.add((row["url"], s, p, o))
        text = extract_article_text(row["html"])
        if text is None:
            assert not gold
            continue
        cleaned = clean_document(text, lexset)
        for sid, _, toks in P.parse_document(cleaned, lex, lemmas):
            for idx, s, p, o in S.extract_svo(toks):
                mine_set.add((row["url"], s, p, o))

    tp = len(gold_set & mine_set)
    precision = tp / max(len(mine_set), 1)
    recall = tp / max(len(gold_set), 1)
    print(f"precision={precision:.4f} recall={recall:.4f} "
          f"gold={len(gold_set)} mine={len(mine_set)}")
    assert precision >= 0.95, precision
    assert recall >= 0.95, recall


def test_fused_sentences_stage_matches_staged_path(spark):
    """fused_sentences_stage (one Arrow crossing) produces exactly the
    staged extract→clean→parse output, row for row and token for
    token."""
    from multivac_spark.functions.clean import clean_text_stage
    from multivac_spark.functions.html_text import extract_text_stage
    from multivac_spark.functions.parse import (fused_sentences_stage,
                                                parse_stage)
    from multivac_spark.plans.pipeline import default_lexicons
    from multivac_spark.sources import corpus

    lex, lemmas = default_lexicons()
    docs = corpus.documents_df(spark, 150, partitions=4)
    staged = parse_stage(
        clean_text_stage(extract_text_stage(docs).filter("lang = 'en'"),
                         frozenset(lex)), lex, lemmas)
    fused = fused_sentences_stage(docs, lex, lemmas, "en")

    a = sorted((r["url"], r["sent_id"], r["text"],
                tuple(tuple(t) for t in r["tokens"]))
               for r in staged.collect())
    b = sorted((r["url"], r["sent_id"], r["text"],
                tuple(tuple(t) for t in r["tokens"]))
               for r in fused.collect())
    assert len(a) > 100
    assert a == b
