"""Link-prediction imputation (operators/linkpred): frequency model,
predict() slot-dispatch semantics, threshold zeroing, and the imputed
slots in answer_queries."""

from pyspark.sql import functions as F

from multivac_spark.operators import linkpred
from multivac_spark.sources import corpus


def _kg(spark):
    rows = (
        [("virus", "infect", "cell")] * 5
        + [("virus", "infect", "membrane")] * 3
        + [("virus", "infect", "protein")] * 1
        + [("bacterium", "infect", "cell")] * 2
        + [("cell", "produce", "protein")] * 4
    )
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_frequency_model_rank_and_scale(spark):
    m = {(r["pred"], r["cand"]): (r["rank"], r["freq_micro"])
         for r in linkpred.frequency_model(_kg(spark), "obj").collect()}
    # infect: cell 7 (5+2), membrane 3, protein 1; max = 7
    assert m[("infect", "cell")] == (1, 1_000_000)
    assert m[("infect", "membrane")] == (2, 3_000_000 // 7)
    assert m[("infect", "protein")] == (3, 1_000_000 // 7)
    assert m[("produce", "protein")] == (1, 1_000_000)


def test_impute_slot_threshold_zeroing(spark):
    # infect: cell x11 (max), membrane x3, rna x1 → rna at 1/11 ≈ 0.09
    # falls below predict_triple's 0.1 threshold and is ZEROED, not
    # dropped (map_queries.py:98-101)
    rows = ([("virus", "infect", "cell")] * 11
            + [("virus", "infect", "membrane")] * 3
            + [("virus", "infect", "rna")])
    kg = spark.createDataFrame(rows, "subj string, pred string, obj string")
    known = spark.createDataFrame([(0, "virus", "infect")],
                                  "query_id long, known string, pred string")
    got = {r["cand"]: r["score_micro"]
           for r in linkpred.impute_slot(kg, known, "known", "obj").collect()}
    assert got["cell"] == 1_000_000
    assert got["membrane"] == 3_000_000 // 11
    assert got["rna"] == 0


def test_predict_completions_dispatch(spark):
    kg = _kg(spark)
    emb = corpus.embeddings_df(spark)
    cands = spark.createDataFrame(
        [(0, "virus", "infect", None),     # impute tail
         (1, None, "infect", "cell"),      # impute head
         (2, None, "infect", None)],       # both unknown → dropped (NaN row)
        "query_id long, head string, pred string, tail string")
    out = linkpred.predict_completions(kg, emb, cands)
    rows = out.collect()
    qids = {r["query_id"] for r in rows}
    assert qids == {0, 1}
    slots = {r["query_id"]: r["slot"] for r in rows}
    assert slots[0] == "imputed_tail"
    assert slots[1] == "imputed_head"
    # anchors preserved, candidates ranked, scores in [0, 1e6]
    for r in rows:
        assert 0 <= r["score_micro"] <= 1_000_000
        if r["query_id"] == 0:
            assert r["head"] == "virus"
            assert r["answer"] in {"cell", "membrane", "protein"}
        else:
            assert r["head"] == "cell"
            assert r["answer"] in {"virus", "bacterium"}


def test_answer_queries_imputed_slot(spark):
    """A query whose tail has no KG match gains imputed_tail rows; the
    exact rows carry score_micro = 1e6."""
    from multivac_spark.operators import query as Q
    kg = _kg(spark)
    emb = corpus.embeddings_df(spark)
    parts = spark.createDataFrame(
        [(0, "what does the virus infect?", "virus", "infect",
          "zzznomatch")],
        "query_id long, query string, q_subj string, q_pred string, "
        "q_obj string")
    out = Q.answer_queries(parts, kg, emb, impute=True).collect()
    slots = {r["slot"] for r in out}
    assert "tail" in slots           # exact KG lookup still answers
    assert "imputed_tail" in slots   # plus ranked completions
    for r in out:
        if r["slot"] == "tail":
            assert r["score_micro"] == 1_000_000
