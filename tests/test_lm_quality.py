"""Bigram-LM quality scoring (textops.train_bigram_lm / lm_score) —
the CCNet-style LM-filtering op for web-pipeline curation."""

import math

from multivac_spark.operators import textops


def test_lm_score_hand_computed(spark):
    train = spark.createDataFrame(
        [(0, "a b a b"), (2, "a b c")], "doc_id long, text string")
    lm = textops.train_bigram_lm(train)
    # counts: bigrams (a,b):3 (b,a):1 (b,c):1; unigrams a:3 b:3 c:1; V=3
    assert lm["vocab_n"] == 3
    bg = {(r["w1"], r["w2"]): r["c2"] for r in lm["bigrams"].collect()}
    assert bg == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}

    score_docs = spark.createDataFrame(
        [(10, "a b"),          # seen bigram: ln((3+1)/(3+3))
         (11, "z q"),          # fully unseen: ln(1/3)
         (12, "a"),            # no bigram → 0
         (13, "c a")],         # unseen pair, seen words: ln(1/(1+3))
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["lm_score_e4"])
           for r in textops.lm_score(score_docs, lm).collect()}
    assert got[10] == (1, math.floor(math.log(4 / 6) * 10_000))
    assert got[11] == (1, math.floor(math.log(1 / 3) * 10_000))
    assert got[12] == (0, 0)
    assert got[13] == (1, math.floor(math.log(1 / 4) * 10_000))


def test_lm_score_separates_in_domain_from_shuffled(spark):
    """The curation property: in-domain text outscores scrambled text
    under a model trained on the same domain."""
    import numpy as np

    from multivac_spark.sources import corpus

    docs = corpus.documents_df(spark, 60).filter("text IS NOT NULL OR html IS NOT NULL")
    from multivac_spark.functions.html_text import extract_text_stage
    texts = extract_text_stage(docs).filter("text IS NOT NULL") \
        .selectExpr("monotonically_increasing_id() AS doc_id", "text") \
        .localCheckpoint()
    lm = textops.train_bigram_lm(texts)
    rng = np.random.RandomState(0)
    rows = [(r["doc_id"], r["text"]) for r in texts.collect()][:20]
    shuffled = [(i + 10_000,
                 " ".join(rng.permutation(t.split()).tolist()))
                for i, (_, t) in enumerate(rows)]
    both = spark.createDataFrame(
        [(i, t) for i, t in rows[:20]] + shuffled,
        "doc_id long, text string")
    scored = {r["doc_id"]: r["lm_score_e4"]
              for r in textops.lm_score(both, lm).collect()}
    mean_real = sum(v for k, v in scored.items() if k < 10_000) / 20
    mean_shuf = sum(v for k, v in scored.items() if k >= 10_000) / 20
    assert mean_real > mean_shuf + 5_000   # clearly separated (e4 units)


def test_domain_curation_on_url_corpus(spark):
    """domain_of / blocklist / per-domain cap over the url-bearing
    synthetic corpus (the driver entry covers the source-keyed form)."""
    from pyspark.sql import functions as F

    from multivac_spark.sources import corpus

    docs = corpus.documents_df(spark, 120, partitions=4) \
        .withColumn("doc_id", F.monotonically_increasing_id()) \
        .localCheckpoint()
    doms = {r["d"] for r in docs.select(
        textops.domain_of(F.col("url")).alias("d")).distinct().collect()}
    assert all(d.startswith("host-") and d.endswith(".example")
               for d in doms)

    blocked = sorted(doms)[:2]
    kept = textops.filter_blocklist(docs, blocked)
    kept_doms = {r["d"] for r in kept.select(
        textops.domain_of(F.col("url")).alias("d")).distinct().collect()}
    assert kept_doms == doms - set(blocked)
    assert "url" in kept.columns          # helper column cleaned up

    capped = textops.cap_per_domain(docs, 3)
    per = capped.groupBy(textops.domain_of(F.col("url")).alias("d")) \
        .count().collect()
    assert all(r["count"] <= 3 for r in per)
    # earliest doc_ids survive per domain
    one = sorted(doms)[0]
    want = [r["doc_id"] for r in docs
            .filter(textops.domain_of(F.col("url")) == one)
            .orderBy("doc_id").limit(3).collect()]
    got = sorted(r["doc_id"] for r in capped
                 .filter(textops.domain_of(F.col("url")) == one).collect())
    assert got == sorted(want)
