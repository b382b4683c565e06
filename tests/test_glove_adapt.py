"""CCA domain adaptation (glove.py:15-26 semantics, numpy kernel)."""

import numpy as np

from multivac_spark.operators.glove_adapt import cca_fit, domain_adapt, zscore


def test_zscore():
    X = np.array([[1.0, 10.0], [3.0, 10.0]])
    Z = zscore(X)
    assert np.allclose(Z.mean(0), 0)
    assert np.allclose(Z[:, 1], 0)  # zero-variance column survives


def test_cca_recovers_linear_relation():
    rng = np.random.RandomState(0)
    X = rng.standard_normal((200, 6))
    A = rng.standard_normal((6, 6))
    Y = X @ A + 0.01 * rng.standard_normal((200, 6))
    Wx, Wy = cca_fit(X, Y, n_components=3)
    u, v = X @ Wx, Y @ Wy
    for k in range(3):
        c = np.corrcoef(u[:, k], v[:, k])[0, 1]
        assert c > 0.99, (k, c)


def test_domain_adapt_stage(spark):
    rng = np.random.RandomState(1)
    toks = [f"t{i}" for i in range(40)]
    gen = [(t, rng.standard_normal(8).astype(np.float32).tolist())
           for t in toks]
    # specific vocab = subset with a rotated view of the same vectors
    R = np.linalg.qr(rng.standard_normal((8, 8)))[0]
    spec = [(t, (np.asarray(v) @ R).astype(np.float32).tolist())
            for t, v in gen[:25]]
    gdf = spark.createDataFrame(gen, "token string, vector array<float>")
    sdf = spark.createDataFrame(spec, "token string, vector array<float>")
    out = domain_adapt(gdf, sdf, n_components=4)
    rows = out.collect()
    assert len(rows) == 40                      # full general vocab projected
    assert all(len(r["vector"]) == 4 for r in rows)
