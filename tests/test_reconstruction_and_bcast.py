"""Masked-graph reconstruction harness + broadcast-dict embedding parity."""

from pyspark.sql import functions as F

from multivac_spark.operators import canon
from multivac_spark.operators.evalmetrics import reconstruction_eval
from multivac_spark.sources import corpus, vocab


def test_reconstruction_eval(spark):
    # ring + chords graph: masking degrades but preserves most ranking
    edges = spark.createDataFrame(
        [(i, (i + 1) % 60, 0) for i in range(60)]
        + [(i, (i + 7) % 60, 1) for i in range(0, 60, 3)],
        "head_id long, tail_id long, rel_id long")
    scores = reconstruction_eval(edges, fraction=0.25, k=30)
    assert 0.0 < scores["ndcg_degree"] <= 1.0
    assert 0.0 < scores["ndcg_eigenvector"] <= 1.0


def test_broadcast_dict_embeddings_match_relational(spark):
    emb = corpus.embeddings_df(spark)
    mentions = []
    for c in vocab.effective_concepts()[:15]:
        variants = vocab.effective_noun_variants()[c]
        mentions.append(variants[0])
        mentions.append(f"viral {variants[0]}")
    mentions.append("zzz_oov_token")  # OOV mention must drop in both
    mdf = spark.createDataFrame([(m,) for m in mentions], "mention string")

    a = {r["mention"]: [round(x, 5) for x in r["vector"]]
         for r in canon.mention_embeddings(mdf, emb).collect()}
    b = {r["mention"]: [round(x, 5) for x in r["vector"]]
         for r in canon.mention_embeddings_broadcast(mdf, emb).collect()}
    assert set(a) == set(b)
    assert "zzz_oov_token" not in a
    for m in a:
        assert a[m] == b[m], m
