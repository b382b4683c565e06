"""TF-IDF scoring over the document corpus.

The reference declares a ``top_tfidf`` knob (rdf_graph.py:23,49) and a
``create_tf_idf`` helper (src/data/qgnet.py:38, external package) but
never wires them into the triple path (SURVEY.md §2.4 note). The
rebuild provides the capability as a first-class operator: plain
DataFrame TF-IDF (term frequency × smoothed inverse document
frequency), no MLlib pipeline object needed, fully SQL-twinnable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textops import tokens


def tfidf(docs: DataFrame, id_col: str = "doc_id",
          text_col: str = "text", scale: int = 1_000_000) -> DataFrame:
    """→ (doc_id, token, tf, df, tfidf_micro).

    tfidf = tf * ln((N + 1) / (df + 1)); emitted as an integer in
    micro-units for cross-engine comparison."""
    n_docs = docs.count()
    term = docs.select(F.col(id_col),
                       F.explode(tokens(F.col(text_col))).alias("token"))
    tf = term.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    df = (term.select(id_col, "token").distinct()
          .groupBy("token").agg(F.count("*").alias("df")))
    return (tf.join(df, "token")
            .withColumn(
                "tfidf_micro",
                F.floor(F.col("tf")
                        * F.log((F.lit(float(n_docs)) + 1.0)
                                / (F.col("df") + 1.0))
                        * scale).cast("long"))
            .select(id_col, "token", "tf", "df", "tfidf_micro"))


def top_tfidf_terms(docs: DataFrame, k: int = 20_000,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Global top-k terms by max tfidf (the reference's top_tfidf knob
    given a real implementation)."""
    scored = tfidf(docs, id_col, text_col)
    return (scored.groupBy("token")
            .agg(F.max("tfidf_micro").alias("max_tfidf_micro"))
            .orderBy(F.desc("max_tfidf_micro"), F.asc("token"))
            .limit(k))
