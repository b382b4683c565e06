"""Kronecker initiator fit + completion (operators/kron.py — the
Spark-first twin of the reference's SNAP KronEM/KronGen shell-outs,
predict_kg.py:40-130,164-168)."""

import math

import numpy as np
import pytest

from multivac_spark.operators import kron
from multivac_spark.operators.evalmetrics import (mask_nodes,
                                                  reconstruction_eval)


def _zipf_edges(spark, n=600):
    """deterministic heavy-tailed graph: 40 hubs + quadratic scatter
    + partial chain (the synthetic KG's degree shape)."""
    rows = []
    for i in range(1, n):
        rows.append((i, i % 40, 0))
        rows.append((i, (i * i) % 200, 1))
        if i % 3 == 0:
            rows.append((i, i - 1, 2))
    return spark.createDataFrame(
        rows, "head_id long, tail_id long, rel_id long")


def test_graph_moments_hand_graph(spark):
    # triangle 0-1-2 plus pendant 3 on node 0; duplicate + reversed +
    # self-loop rows must not change the simple-graph moments
    e = spark.createDataFrame(
        [(0, 1, 0), (1, 2, 0), (2, 0, 0), (0, 3, 0),
         (1, 0, 1), (0, 1, 2), (3, 3, 0)],
        "head_id long, tail_id long, rel_id long")
    m = kron.graph_moments(e)
    assert m == {"n": 4, "m": 4, "wedges": 5, "triangles": 1}


def test_expected_moments_match_bruteforce():
    """the closed forms are EXACT for (loops-excluded edges, ordered
    u≠v wedges, all-ordered-triple triangles) — verified against the
    explicit 2^k x 2^k Kronecker-power probability matrix."""
    for (a, b, c) in [(0.9, 0.5, 0.2), (0.8, 0.6, 0.3)]:
        t = np.array([[a, b], [b, c]])
        for k in (1, 2, 3):
            p = t.copy()
            for _ in range(k - 1):
                p = np.kron(p, t)
            em = (p.sum() - np.trace(p)) / 2
            ew = sum(row.sum() ** 2 - (row ** 2).sum() for row in p) / 2
            et = np.einsum("uv,vw,wu->", p, p, p) / 6
            fm, fw, ft = kron._expected_moments(a, b, c, k)
            assert np.allclose([em, ew, et], [fm, fw, ft], rtol=1e-10)


def test_fit_initiator_deterministic_and_sane():
    moments = {"n": 600, "m": 1300, "wedges": 40000, "triangles": 90}
    f1 = kron.fit_initiator(moments)
    f2 = kron.fit_initiator(moments)
    assert f1 == f2  # driver-side grid descent, no RNG
    assert 0 < f1["c"] <= f1["a"] < 1
    assert f1["k"] == math.ceil(math.log2(600))
    # the fitted model reproduces the target moments to ~log accuracy
    em, ew, _ = kron._expected_moments(f1["a"], f1["b"], f1["c"], f1["k"])
    assert abs(math.log(em) - math.log(1300)) < 0.7
    assert abs(math.log(ew) - math.log(40000)) < 0.7


def test_kron_edges_range_and_determinism(spark):
    g1 = kron.kron_edges(spark, 0.9, 0.5, 0.2, 6, 400, seed=7)
    rows = g1.collect()
    assert rows
    for r in rows:
        assert 0 <= r["u"] < r["v"] < 64
    g2 = kron.kron_edges(spark, 0.9, 0.5, 0.2, 6, 400, seed=7)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, g2.collect()))
    # low-popcount indices are the expected hubs (a+b > b+c)
    deg = {}
    for r in rows:
        deg[r["u"]] = deg.get(r["u"], 0) + 1
        deg[r["v"]] = deg.get(r["v"], 0) + 1
    low = sum(deg.get(i, 0) for i in range(64) if bin(i).count("1") <= 2)
    high = sum(deg.get(i, 0) for i in range(64) if bin(i).count("1") >= 4)
    assert low > high


def test_preferential_completion_covers_masked(spark):
    edges = _zipf_edges(spark, 300)
    kept, masked = mask_nodes(edges, 0.25, 42)
    comp = kron.kron_complete_graph(kept, masked, seed=42)
    masked_set = {r["node"] for r in masked.collect()}
    touched = {r["head_id"] for r in comp.collect()} | \
              {r["tail_id"] for r in comp.collect()}
    assert masked_set <= touched  # budget floor 1 reattaches every node
    # determinism under reparallelization
    comp2 = kron.kron_complete_graph(kept.repartition(5),
                                     masked.repartition(3), seed=42)
    assert sorted(map(tuple, comp.collect())) == \
        sorted(map(tuple, comp2.collect()))


def test_ball_drop_completion_runs(spark):
    edges = _zipf_edges(spark, 300)
    kept, masked = mask_nodes(edges, 0.25, 42)
    comp = kron.kron_complete_graph(kept, masked, seed=42,
                                    targets="ball_drop")
    assert comp.count() >= kept.count()
    # generated edges carry the sentinel rel_id and respect masked_only
    gen = comp.filter("rel_id = -1")
    masked_set = {r["node"] for r in masked.collect()}
    for r in gen.collect():
        assert r["head_id"] in masked_set or r["tail_id"] in masked_set


def test_kron_completion_beats_sampler_on_synthetic_kg(spark):
    """VERDICT r2 #4 acceptance: on the synthetic (heavy-tailed) KG
    shape, the fitted-initiator completion must beat the flat
    avg-degree sampler — the Kronecker model's contribution is exactly
    the heavy-tailed budget profile the flat sampler lacks. (On
    degree-REGULAR graphs, e.g. pure rings, the flat sampler's constant
    budget is the right prior and kron only ties — expected.)"""
    edges = _zipf_edges(spark, 600)
    res = {m: reconstruction_eval(edges, fraction=0.25, k=100,
                                  complete=(m != "none"), method=m)
           for m in ("none", "degree", "kron")}
    assert res["kron"]["ndcg_degree"] > res["degree"]["ndcg_degree"]
    assert res["kron"]["ndcg_eigenvector"] >= \
        res["degree"]["ndcg_eigenvector"] - 0.02
    assert res["kron"]["ndcg_degree"] > res["none"]["ndcg_degree"]
    assert res["kron"]["ndcg_eigenvector"] > res["none"]["ndcg_eigenvector"]
    assert res["degree"]["ndcg_degree"] > res["none"]["ndcg_degree"]
