"""Link-prediction imputation (the TransE-free analog of the
reference's query-time completion).

Reference behavior (src/rdf_graph/map_queries.py:90-137 ``predict`` /
``predict_triple``, src/link_prediction/MULTIVAC_link_prediction.py:
19-112): a query triple with exactly ONE unknown slot is completed by
ranking candidate entities/relations with the trained OpenKE TransE
model (``con.predict_{head,tail}_entity`` / ``predict_relation``,
top ``num_top_rel`` candidates), then each candidate triple is scored
by ``predict_triple`` and ZEROED below threshold 0.1; more than one
unknown slot yields a NaN row.

OpenKE is an external C++ training boundary (SURVEY §3.3 non-goal), so
the rebuild scores candidates with a relation-conditioned frequency
model blended with embedding cosine plausibility — deterministic,
SQL-oraclable, and shuffle-bounded:

    freq(t | r)  = count(r, t) / max_t' count(r, t')      ∈ (0, 1]
    cos01(h, t)  = (cosine(vec(h), vec(t)) + 1) / 2       ∈ [0, 1]
    score        = (freq + cos01) / 2, zeroed below threshold

The candidate set per relation is the top-``num_top`` tails (heads) by
frequency — the analog of TransE's top-k candidate list. All joins are
broadcast (the candidate model is relation-dictionary-sized by
construction: top-N relations × num_top candidates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .canon import mention_embeddings
from .dedup import cosine

PREDICT_THRESHOLD = 0.1  # predict_triple default (map_queries.py:90)
NUM_TOP = 10             # num_top_rel default (map_queries.py:112)


def frequency_model(triples: DataFrame, slot: str,
                    num_top: int = NUM_TOP) -> DataFrame:
    """Per-relation top-``num_top`` candidate ``slot`` values ('subj' or
    'obj') with integer-scaled relation-conditioned frequency:
    (pred, cand, rank, freq_micro). freq_micro = floor(cnt*1e6 /
    max-cnt-for-that-pred) — the most frequent candidate scores 1e6."""
    counted = (triples.groupBy("pred", F.col(slot).alias("cand"))
               .agg(F.count("*").alias("cnt")))
    w_max = Window.partitionBy("pred")
    w_rank = Window.partitionBy("pred").orderBy(F.desc("cnt"),
                                                F.asc("cand"))
    return (counted
            .withColumn("freq_micro",
                        F.floor(F.col("cnt") * 1_000_000
                                / F.max("cnt").over(w_max)).cast("long"))
            .withColumn("rank", F.row_number().over(w_rank))
            .filter(F.col("rank") <= num_top)
            .select("pred", "cand", "rank", "freq_micro"))


def impute_slot(triples: DataFrame, known: DataFrame, known_col: str,
                impute_col: str, num_top: int = NUM_TOP,
                threshold: float = PREDICT_THRESHOLD) -> DataFrame:
    """known(query_id, <known_col>, pred) → candidate completions
    (query_id, known value, pred, cand, rank, score_micro) — frequency-
    only scoring (the embedding-blended variant is
    ``predict_completions``). Scores below threshold are zeroed, not
    dropped (predict_triple semantics, map_queries.py:90-110)."""
    model = F.broadcast(frequency_model(triples, impute_col, num_top))
    scored = known.join(model, "pred")
    zeroed = F.when(F.col("freq_micro") < int(threshold * 1_000_000),
                    F.lit(0)).otherwise(F.col("freq_micro"))
    return scored.select("query_id", known_col, "pred", "cand", "rank",
                         zeroed.cast("long").alias("score_micro"))


def predict_completions(final_triples: DataFrame,
                        embeddings: DataFrame,
                        candidates: DataFrame,
                        num_top: int = NUM_TOP,
                        threshold: float = PREDICT_THRESHOLD) -> DataFrame:
    """candidates(query_id, head, pred, tail) with exactly one of
    head/tail null → (query_id, head, pred, answer, slot, score_micro).

    Mirrors ``predict``'s slot dispatch (map_queries.py:112-137): a row
    with BOTH head and tail null is dropped (the reference emits a NaN
    score there); a row with both known is passed through scored (the
    final else-branch)."""
    both_null = F.col("head").isNull() & F.col("tail").isNull()
    candidates = candidates.filter(~both_null)

    ents = (final_triples.select(F.col("subj").alias("mention"))
            .union(final_triples.select(F.col("obj").alias("mention")))
            .distinct())
    vecs = mention_embeddings(ents, embeddings)

    def blended(known_col: str, impute_col: str, slot: str) -> DataFrame:
        known = (candidates
                 .filter(F.col(known_col).isNotNull()
                         & F.col(impute_col).isNull())
                 .select("query_id", F.col(known_col).alias("known"),
                         "pred"))
        freq = impute_slot(final_triples, known, "known",
                           "subj" if impute_col == "head" else "obj",
                           num_top, threshold=0.0) \
            .withColumnRenamed("score_micro", "freq_micro")
        kv = vecs.select(F.col("mention").alias("known"),
                         F.col("vector").alias("kvec"))
        cv = vecs.select(F.col("mention").alias("cand"),
                         F.col("vector").alias("cvec"))
        cos = cosine(F.col("kvec").cast("array<double>"),
                     F.col("cvec").cast("array<double>"))
        scored = (freq.join(F.broadcast(kv), "known", "left")
                  .join(F.broadcast(cv), "cand", "left")
                  .withColumn("cos01_micro",
                              F.when(F.col("kvec").isNull()
                                     | F.col("cvec").isNull(),
                                     F.lit(500_000))  # OOV → neutral 0.5
                              .otherwise(F.floor((cos + 1.0) * 500_000)))
                  .withColumn("blend",
                              F.floor((F.col("freq_micro")
                                       + F.col("cos01_micro")) / 2)
                              .cast("long")))
        zeroed = F.when(F.col("blend") < int(threshold * 1_000_000),
                        F.lit(0)).otherwise(F.col("blend"))
        # column convention follows answer_queries: "head" carries the
        # KNOWN anchor, "answer" the produced entity, slot the direction
        return scored.select(
            "query_id",
            F.col("known").alias("head"),
            "pred",
            F.col("cand").alias("answer"),
            F.lit(slot).alias("slot"),
            zeroed.cast("long").alias("score_micro"))

    tails = blended("head", "tail", "imputed_tail")
    heads = blended("tail", "head", "imputed_head")
    return tails.unionByName(heads)
