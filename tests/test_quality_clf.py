"""Trained quality classifier (operators/quality_clf.py): hashed-
feature logistic regression — separability, distributed-vs-local
trajectory identity, parallelism determinism, scoring parity."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from multivac_spark.operators import quality_clf as qc


def _toy_rows(n=80):
    """Separable corpus: curated docs carry 'premium curated prose',
    crawl docs carry 'spam clickbait listicle'."""
    rows = []
    for i in range(n):
        if i % 2:
            rows.append((i, 1, f"premium curated prose item {i % 7} "
                               f"with careful thorough writing"))
        else:
            rows.append((i, 0, f"spam clickbait listicle item {i % 7} "
                               f"with shocking weird tricks"))
    return rows


def test_trained_classifier_separates(spark):
    rows = _toy_rows()
    df = spark.createDataFrame(rows, "doc_id long, y int, text string")
    w = qc.train_quality_clf(df, "y", dim=64, epochs=40, lr=2.0)
    scores = {r["doc_id"]: r["quality_e4"]
              for r in qc.quality_scores(df, w).collect()}
    pos = [scores[i] for i in range(80) if i % 2]
    neg = [scores[i] for i in range(80) if not i % 2]
    assert min(pos) > max(neg)          # perfect separation on train
    assert np.mean(pos) > 6000 and np.mean(neg) < 4000


def test_distributed_matches_local_twin(spark):
    rows = _toy_rows(40)
    df = spark.createDataFrame(rows, "doc_id long, y int, text string")
    w_dist = qc.train_quality_clf(df, "y", dim=32, epochs=15, lr=1.5)

    local_rows = []
    for _i, y, text in rows:
        toks = [t for t in text.lower().split(" ") if t]
        local_rows.append(
            (float(y), [qc.bucket_of(t, 32) for t in toks]))
    w_local = qc.train_quality_clf_local(local_rows, dim=32,
                                         epochs=15, lr=1.5)
    # fixed-point aggregation → BIT-identical trajectories
    assert np.array_equal(w_dist, w_local)


def test_training_deterministic_across_parallelism(spark):
    rows = _toy_rows(40)
    df1 = spark.createDataFrame(rows, "doc_id long, y int, text string") \
        .repartition(1)
    df8 = spark.createDataFrame(rows, "doc_id long, y int, text string") \
        .repartition(8)
    w1 = qc.train_quality_clf(df1, "y", dim=32, epochs=10, lr=1.5)
    w8 = qc.train_quality_clf(df8, "y", dim=32, epochs=10, lr=1.5)
    assert np.array_equal(w1, w8)


def test_bucket_col_matches_python(spark):
    toks = ["the", "premium", "spam", "xyzzy", "Ωmega"]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    got = {r["tok"]: r["b"] for r in df.select(
        "tok", qc.bucket_col(F.col("tok"), 256).alias("b")).collect()}
    for t in toks:
        assert got[t] == qc.bucket_of(t, 256)


def test_scores_empty_doc_gets_bias(spark):
    w = np.zeros(17)
    w[-1] = 2.0  # bias only
    df = spark.createDataFrame([(1, ""), (2, "   ")],
                               "doc_id long, text string")
    got = {r["doc_id"]: r["quality_e4"]
           for r in qc.quality_scores(df, w, dim=16).collect()}
    expect = int(np.floor(1 / (1 + np.exp(-2.0)) * 10_000))
    assert got[1] == expect and got[2] == expect


def test_frozen_entry_weights_rederive(spark):
    """The entry's frozen _QCLF_W must equal a fresh deterministic
    training run on the same sf0.01 augmented corpus — the frozen
    literal can never drift from the trainer it claims to pin."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    aug = entry._qclf_aug(docs)
    w = qc.train_quality_clf(aug, "y", dim=entry._QCLF_DIM,
                             epochs=entry._QCLF_EPOCHS, lr=2.0)
    assert np.array_equal(w, np.array(entry._QCLF_W))
