"""NDCG + masked-graph setup + LaTeX tagging."""

from multivac_spark.functions import equations as EQ
from multivac_spark.operators import evalmetrics as EM


def test_latex_extract_deterministic():
    doc = "The model $$x^2 + y$$ predicts \\(e = mc^2\\) outcomes."
    tagged, eqs = EQ.extract_and_replace_latex(doc)
    assert len(eqs) == 2
    assert eqs[0][1] == "x^2 + y"
    assert eqs[1][1] == "e = mc^2"
    assert all(t.startswith("Ltxqtn") and len(t) == 14 for t, _ in eqs)
    # same equation → same tag (reproducibility vs random.choices)
    tagged2, eqs2 = EQ.extract_and_replace_latex(doc)
    assert eqs == eqs2 and tagged == tagged2
    assert "$$" not in tagged


def test_latex_stage(spark):
    df = spark.createDataFrame(
        [("u1", "see $$a+b$$ here"), ("u2", "no math"), ("u3", None)],
        "url string, text string")
    rows = {r["url"]: r for r in EQ.extract_equations_stage(df).collect()}
    assert len(rows) == 2  # None text dropped
    assert len(rows["u1"]["equations"]) == 1
    assert rows["u2"]["equations"] == []


def test_ndcg_perfect_and_inverted(spark):
    actual = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "node long, score double")
    perfect = EM.ndcg_at_k(actual, actual, k=10)
    assert abs(perfect - 1.0) < 1e-9
    inverted = spark.createDataFrame(
        [(i, float(9 - i)) for i in range(10)], "node long, score double")
    worse = EM.ndcg_at_k(actual, inverted, k=10)
    assert 0.0 < worse < 1.0


def test_mask_nodes(spark):
    edges = spark.createDataFrame(
        [(i, i + 100, 0) for i in range(200)],
        "head_id long, tail_id long, rel_id long")
    kept, masked = EM.mask_nodes(edges, fraction=0.25)
    n_masked = masked.count()
    assert 0 < n_masked < 200  # ~25% of 400 nodes
    # no kept edge touches a masked node
    assert kept.join(masked.withColumnRenamed("node", "head_id"),
                     "head_id").count() == 0
    # deterministic
    kept2, masked2 = EM.mask_nodes(edges, fraction=0.25)
    assert masked2.count() == n_masked
