"""Domain adaptation of embeddings (the glove.py CCA path).

Reference behavior (src/data/glove.py:15-26, 74-87): z-score normalize
the domain-general and domain-specific embedding matrices over their
shared vocabulary, fit sklearn CCA(n_components=100), and project both
spaces into the shared canonical space. The rebuild implements CCA as
a numpy SVD kernel (no sklearn in this environment): classical CCA via
whitening + SVD of the cross-covariance. Embedding matrices are
driver-sized (vocabulary-bounded), exactly like the reference's
in-memory fit; the projection of the full vocabulary is then a
broadcast matmul inside a pandas UDF.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame


def zscore(X: np.ndarray) -> np.ndarray:
    """Column-wise z-score (glove.py:17-18)."""
    mu = X.mean(axis=0, keepdims=True)
    sd = X.std(axis=0, keepdims=True)
    sd[sd == 0] = 1.0
    return (X - mu) / sd


def cca_fit(X: np.ndarray, Y: np.ndarray, n_components: int,
            reg: float = 1e-6) -> tuple[np.ndarray, np.ndarray]:
    """Classical CCA: returns projection matrices (Wx, Wy) such that
    X @ Wx and Y @ Wy are maximally correlated, column by column."""
    n = X.shape[0]
    Xc = X - X.mean(0)
    Yc = Y - Y.mean(0)
    Cxx = (Xc.T @ Xc) / (n - 1) + reg * np.eye(X.shape[1])
    Cyy = (Yc.T @ Yc) / (n - 1) + reg * np.eye(Y.shape[1])
    Cxy = (Xc.T @ Yc) / (n - 1)

    def inv_sqrt(C: np.ndarray) -> np.ndarray:
        w, V = np.linalg.eigh(C)
        w = np.clip(w, reg, None)
        return V @ np.diag(w ** -0.5) @ V.T

    Kx, Ky = inv_sqrt(Cxx), inv_sqrt(Cyy)
    U, _s, Vt = np.linalg.svd(Kx @ Cxy @ Ky)
    k = min(n_components, U.shape[1], Vt.shape[0])
    return Kx @ U[:, :k], Ky @ Vt[:k, :].T


def domain_adapt(general: DataFrame, specific: DataFrame,
                 n_components: int = 100) -> DataFrame:
    """embeddings(token, vector) × embeddings(token, vector) →
    (token, vector) in the shared canonical space, for every token of
    the *general* table (the reference projects the full GloVe vocab
    after fitting on the intersection, glove.py:74-87)."""
    import pandas as pd

    spark = general.sparkSession
    gen = {r["token"]: np.asarray(r["vector"], dtype=np.float64)
           for r in general.collect()}
    spec = {r["token"]: np.asarray(r["vector"], dtype=np.float64)
            for r in specific.collect()}
    shared = sorted(set(gen) & set(spec))  # vocab intersection (glove.py:74-78)
    if len(shared) < 2:
        return general
    X_shared = np.vstack([gen[t] for t in shared])
    # z-score stats come from the SHARED vocab — the same space the CCA
    # is fit in — and are reused verbatim when projecting the full
    # general vocabulary, so shared tokens land exactly where the fit
    # put them. (Divergence note: the reference averages x_scores and
    # y_scores for shared tokens, glove.py:84-87; the rebuild projects
    # everything through Wx only — a one-sided projection — because the
    # averaged space is undefined for the non-shared vocabulary it must
    # also serve.)
    mu = X_shared.mean(0)
    sd = X_shared.std(0)
    sd[sd == 0] = 1.0
    X = (X_shared - mu) / sd
    Y = zscore(np.vstack([spec[t] for t in shared]))
    Wx, _Wy = cca_fit(X, Y, n_components)

    bc = spark.sparkContext.broadcast((Wx, mu, sd))

    def run(batches):
        Wx_, mu_, sd_ = bc.value
        for pdf in batches:
            vecs = [(((np.asarray(v, dtype=np.float64) - mu_) / sd_) @ Wx_)
                    .astype(np.float32).tolist()
                    for v in pdf["vector"]]
            yield pd.DataFrame({"token": pdf["token"],
                                "vector": pd.Series(vecs, dtype=object)})

    return general.mapInPandas(run, schema="token string, vector array<float>")
