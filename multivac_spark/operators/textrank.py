"""TextRank sentence ranking + TF-IDF answer selection — the
reference's third query-generation path.

The reference documents (doc/phase_two_developments.md:110-112,
doc/innovations.md:50-52) a Phase-II pipeline: TextRank picks the most
"important" sentences per article, then TF-IDF picks the most
important word in each key sentence as the "answer"; sentence + answer
seed a generated query (2,999 queries produced). The generation model
itself (QG-Net) is a GAN subsystem and a documented non-goal; the
ranking + answer-selection half is pure algorithmics and implemented
here Spark-first.

TextRank is the public Mihalcea & Tarau (2004) algorithm: sentences
are graph vertices, edge weight = token overlap normalized by
log-lengths, scores from damped PageRank iterated to convergence.
Per-document graphs are tiny (≤ tens of sentences — bounded by the
corpus shape, not the corpus size), so each document ranks inside ONE
``applyInPandas`` group: a single shuffle on ``url`` total, numpy
inside, no per-iteration Spark jobs. The TF-IDF weights come from the
same two shuffle-bounded aggregations as ``operators/tfidf.py``.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .textops import STOPWORDS, tokens

RANKED_SCHEMA = ("url string, sent_id int, text string, "
                 "textrank_milli long, rank int")

DAMPING = 0.85
TOL = 1e-6
MAX_ITER = 100


def textrank_scores(sent_tokens: list[list[str]],
                    damping: float = DAMPING,
                    tol: float = TOL,
                    max_iter: int = MAX_ITER) -> np.ndarray:
    """Mihalcea-Tarau sentence TextRank over one document.

    similarity(i, j) = |tokens_i ∩ tokens_j| / (log|tokens_i| +
    log|tokens_j|) (paper eq. 4); damped PageRank on the weighted
    undirected graph, L1-normalized convergence check."""
    n = len(sent_tokens)
    if n == 0:
        return np.zeros(0)
    if n == 1:
        return np.ones(1)
    sets = [set(t) for t in sent_tokens]
    W = np.zeros((n, n))
    for i in range(n):
        for j in range(i + 1, n):
            denom = (math.log(max(len(sets[i]), 2))
                     + math.log(max(len(sets[j]), 2)))
            w = len(sets[i] & sets[j]) / denom
            W[i, j] = W[j, i] = w
    out = W.sum(axis=1)
    out[out == 0] = 1.0
    P = W / out[:, None]          # row-stochastic over outgoing weight
    x = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        nxt = (1 - damping) / n + damping * (P.T @ x)
        if np.abs(nxt - x).sum() < tol:
            x = nxt
            break
        x = nxt
    return x


def rank_sentences(sentences: DataFrame, top_k: int = 3) -> DataFrame:
    """sentences(url, sent_id, text, ...) → per-document top-k
    sentences by TextRank: (url, sent_id, text, textrank_milli, rank).
    One shuffle (groupBy url); the per-group kernel is numpy."""
    stop = frozenset(STOPWORDS)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("sent_id")
        toks = [[t for t in str(s).lower().split() if t and t not in stop]
                for s in pdf["text"]]
        scores = textrank_scores(toks)
        order = np.argsort(-scores, kind="stable")[:top_k]
        return pd.DataFrame(
            {"url": pdf["url"].iloc[order].to_numpy(),
             "sent_id": pdf["sent_id"].iloc[order].astype("int32"),
             "text": pdf["text"].iloc[order].to_numpy(),
             "textrank_milli": (scores[order] * 1000).astype("int64"),
             "rank": np.arange(1, len(order) + 1, dtype="int32")})

    return (sentences.select("url", "sent_id", "text")
            .groupBy("url").applyInPandas(kernel, schema=RANKED_SCHEMA))


def answer_words(ranked: DataFrame, documents: DataFrame,
                 n_docs: int | None = None,
                 broadcast_idf_max_docs: int = 5_000_000) -> DataFrame:
    """For each key sentence, the highest-TF-IDF token (the 'answer'
    the reference feeds to its query generator). TF-IDF = per-doc term
    frequency × log(N/df) over the documents table — two
    shuffle-bounded aggregations + one join on token.

    Both TF and DF sides lowercase before tokenizing — they must share
    one normalization or capitalized-only tokens get no IDF row and the
    inner join silently drops answer candidates.

    Callers that already know the corpus size pass ``n_docs`` to skip
    the extra count job. The token→IDF dictionary is vocabulary-sized
    (sublinear in corpus size); below ``broadcast_idf_max_docs``
    documents it is hinted broadcast so the plan is deterministically
    a BroadcastHashJoin — above that the guard backs off to a shuffle
    join rather than risk an over-large broadcast (AQE may still pick
    broadcast at runtime from actual sizes)."""
    docs_tok = documents.select(
        F.col("url"), F.explode(tokens(F.lower(F.col("text")))).alias("token"))
    if n_docs is None:
        n_docs = documents.count()
    df_counts = (docs_tok.select("url", "token").distinct()
                 .groupBy("token").agg(F.count("*").alias("df")))
    idf = df_counts.select(
        "token", F.log(F.lit(float(n_docs)) / F.col("df")).alias("idf"))
    if n_docs <= broadcast_idf_max_docs:
        idf = F.broadcast(idf)

    sent_tok = ranked.select(
        "url", "sent_id", "rank",
        F.explode(tokens(F.lower(F.col("text")))).alias("token"))
    tf = (sent_tok.groupBy("url", "sent_id", "rank", "token")
          .agg(F.count("*").alias("tf")))
    scored = (tf.join(idf, "token")
              .withColumn("tfidf_milli",
                          F.floor(F.col("tf") * F.col("idf") * 1000)
                          .cast("long")))
    from pyspark.sql import Window
    w = Window.partitionBy("url", "sent_id").orderBy(
        F.desc("tfidf_milli"), F.asc("token"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("url", "sent_id", "rank",
                    F.col("token").alias("answer"), "tfidf_milli"))


def textrank_queries(sentences: DataFrame, documents: DataFrame,
                     top_k: int = 3) -> DataFrame:
    """Full path: TextRank top-k sentences per doc + per-sentence
    TF-IDF answer word → (url, sent_id, rank, text, answer)."""
    ranked = rank_sentences(sentences, top_k)
    answers = answer_words(ranked, documents)
    return (ranked.join(answers, ["url", "sent_id", "rank"])
            .select("url", "sent_id", "rank", "text", "answer",
                    "textrank_milli", "tfidf_milli"))
