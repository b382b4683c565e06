"""ANN variants: recall of LSH / IVF vs the exact brute-force baseline."""

import pytest
from pyspark.sql import functions as F

from multivac_spark.operators import ann

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").localCheckpoint()


@pytest.fixture(scope="module")
def queries(spark, emb):
    return (emb.filter(F.col("vec_id") < 8)
            .select(F.col("vec_id").alias("q_id"), "embedding")
            .localCheckpoint())


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["q_id"], set()).add(r["neighbor"])
    return out


def test_ivf_recall_vs_brute_force(spark, emb, queries):
    exact = _topk_sets(ann.brute_force_topk(emb, queries, k=10))
    approx = _topk_sets(ann.ivf_topk(emb, queries, k=10,
                                     n_centroids=8, n_probe=4))
    recalls = [len(exact[q] & approx.get(q, set())) / len(exact[q])
               for q in exact]
    mean_recall = sum(recalls) / len(recalls)
    print("IVF mean recall@10:", mean_recall)
    assert mean_recall >= 0.7, recalls


def test_lsh_recall_vs_brute_force(spark, emb, queries):
    exact = _topk_sets(ann.brute_force_topk(emb, queries, k=10))
    approx = _topk_sets(ann.lsh_topk(emb, queries, k=10, dim=64))
    recalls = [len(exact[q] & approx.get(q, set())) / len(exact[q])
               for q in exact]
    mean_recall = sum(recalls) / len(recalls)
    print("LSH mean recall@10:", mean_recall)
    # the driver embeddings' top-10 neighbors are only weakly correlated
    # (cos ≈ 0.2-0.4), where sign-bit agreement is near chance — recall
    # is structurally modest here; assert well above the random baseline
    # (10/500 = 0.02). IVF is the preferred scale path for this regime.
    assert mean_recall >= 0.1, recalls


def test_brute_force_self_consistency(spark, emb, queries):
    res = ann.brute_force_topk(emb, queries, k=5)
    rows = res.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append((r["rank"], r["cos_sim_micro"]))
    for q, pairs in by_q.items():
        pairs.sort()
        sims = [s for _, s in pairs]
        assert sims == sorted(sims, reverse=True)  # rank order == sim order
        assert len(pairs) == 5
