"""Evaluation metrics for masked-graph reconstruction.

Reference: ``ndcg(actual, predicted, k)`` (predict_kg.py:339-381) —
rank-normalize actual vs predicted centrality scores, outer-join on
node, DCG@k with log2 discounts; used by the masked-graph
reconstruction test (predict_kg.py:201-335, 25% node mask, NDCG@100).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def ndcg_at_k(actual: DataFrame, predicted: DataFrame, k: int = 100,
              key: str = "node", val: str = "score") -> float:
    """NDCG@k of predicted ranking vs actual ranking.

    Relevance = actual score rank-normalized to [0,1]; DCG computed over
    the predicted ordering; IDCG over the ideal (actual) ordering.
    Missing nodes contribute 0 relevance (outer-merge + fill,
    predict_kg.py:350-360)."""
    n_a = actual.count()
    if n_a == 0:
        return 0.0
    w_a = Window.orderBy(F.asc(val), F.asc(key))
    rel = actual.select(
        key, ((F.row_number().over(w_a) - 1) / F.lit(max(n_a - 1, 1)))
        .alias("rel"))

    w_p = Window.orderBy(F.desc(val), F.asc(key))
    pred_rank = predicted.select(
        key, F.row_number().over(w_p).alias("rank")).filter(
        F.col("rank") <= k)

    dcg_df = (pred_rank.join(rel, key, "left")
              .select((F.coalesce("rel", F.lit(0.0))
                       / F.log2(F.col("rank") + 1)).alias("g")))
    dcg = dcg_df.agg(F.sum("g")).collect()[0][0] or 0.0

    w_i = Window.orderBy(F.desc("rel"), F.asc(key))
    ideal = (rel.select("rel", F.row_number().over(w_i).alias("rank"))
             .filter(F.col("rank") <= k)
             .select((F.col("rel") / F.log2(F.col("rank") + 1)).alias("g")))
    idcg = ideal.agg(F.sum("g")).collect()[0][0] or 0.0
    return float(dcg / idcg) if idcg else 0.0


def reconstruction_eval(edges: DataFrame, fraction: float = 0.25,
                        k: int = 100, seed: int = 42) -> dict[str, float]:
    """Masked-graph reconstruction harness (predict_kg.py:201-335 shape,
    minus the external KronEM/KronGen completion): mask a node fraction,
    recompute degree + eigenvector centrality on the masked graph, score
    the masked ranking against the full-graph ranking with NDCG@k.
    Returns {"ndcg_degree": ..., "ndcg_eigenvector": ...}."""
    from . import analytics

    kept, _ = mask_nodes(edges, fraction, seed)
    full_deg = analytics.degree_centrality(edges) \
        .select("node", F.col("centrality_micro").cast("double")
                .alias("score"))
    mask_deg = analytics.degree_centrality(kept) \
        .select("node", F.col("centrality_micro").cast("double")
                .alias("score"))
    full_eig = analytics.eigenvector_centrality(edges, max_iter=15)
    mask_eig = analytics.eigenvector_centrality(kept, max_iter=15)
    return {
        "ndcg_degree": ndcg_at_k(full_deg, mask_deg, k),
        "ndcg_eigenvector": ndcg_at_k(full_eig, mask_eig, k),
    }


def mask_nodes(edges: DataFrame, fraction: float = 0.25,
               seed: int = 42) -> tuple[DataFrame, DataFrame]:
    """Deterministically drop a fraction of nodes (and their edges) —
    the masked-graph reconstruction setup (predict_kg.py:201-267).
    Masking is hash-based (no RNG state), so any executor count
    reproduces the same mask."""
    nodes = (edges.select(F.col("head_id").alias("node"))
             .union(edges.select(F.col("tail_id").alias("node")))
             .distinct())
    masked = nodes.filter(
        F.pmod(F.abs(F.hash(F.col("node"), F.lit(seed))), 10_000)
        < int(fraction * 10_000))
    kept = edges.join(masked.withColumnRenamed("node", "head_id"),
                      "head_id", "left_anti") \
        .join(masked.withColumnRenamed("node", "tail_id"),
              "tail_id", "left_anti")
    return kept, masked
