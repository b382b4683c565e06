#!/usr/bin/env python
"""Round-7 optimization harness (bench.py itself is FROZEN).

Modes:
  plans <suffix>   — dump .explain("formatted") for every bench query to
                     plans/r07/<name>_<suffix>.txt
  steps            — per-sub-step timing of the composite bench phases
                     (kg pipeline, curation) with noop sinks (guide §1.4)
  query <name> [n] — time one registry query n times with the noop sink
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from multivac_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

BENCH_QUERIES = [
    "relational_forms", "topn_digest", "broadcast_join_agg",
    "window_topk", "distinct_dedup", "degree_centrality",
    "text_signals",
    "minhash_signature", "simhash_dup_pairs", "ngram_jaccard",
    "ann_topk", "embedding_near_dups", "exact_dedup",
    "session_agg", "curation_pipeline", "repeated_spans",
    "quality_classifier", "subword_tokens",
]


def spark_session():
    spark = get_spark(app_name="bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=str(max(int(CPUS), 8)))
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def dump_plans(suffix: str):
    spark = spark_session()
    qmap = entrymod.queries()
    for name in BENCH_QUERIES:
        df = qmap[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(f"plans/r07/{name}_{suffix}.txt", "w") as f:
            f.write(plan)
        print("dumped", name)
    spark.stop()


def timed(spark, label, fn):
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label:45s} {dt:7.3f}s")
    spark.sparkContext.setJobDescription(None)
    return out


def steps():
    spark = spark_session()
    # ---- warm python workers (same as bench.py warmup) ----
    def _noop_b(bs):
        for b in bs:
            yield b
    timed(spark, "warmup", lambda: noop(
        spark.range(int(CPUS) * 4).repartition(int(CPUS))
        .withColumnRenamed("id", "x")
        .mapInPandas(_noop_b, schema="x long")
        .groupBy((F.col("x") % 2).alias("k")).count()))

    from multivac_spark.functions.fused import fused_extract_stage
    from multivac_spark.functions.normalize import normalize_triples
    from multivac_spark.operators import canon, materialize
    from multivac_spark.plans.pipeline import default_lexicons
    from multivac_spark.sources import corpus, vocab

    lex, lemmas = default_lexicons()
    n_docs = corpus.n_docs_for_sf(0.1)
    import tempfile
    tmp = tempfile.mkdtemp(prefix="bx_docs_")
    timed(spark, "corpus gen+write", lambda: corpus.documents_df(spark, n_docs)
          .write.mode("overwrite").parquet(f"{tmp}/documents"))
    docs = spark.read.parquet(f"{tmp}/documents")
    emb = corpus.embeddings_df(spark)

    small = docs.limit(200).localCheckpoint()
    timed(spark, "stage_warmup extract", lambda: noop(
        normalize_triples(fused_extract_stage(small, lex, lemmas, "en"),
                          vocab.verb_lemma_table(), lex)))

    triples = timed(spark, "fused_extract_normalize+ckpt", lambda:
                    normalize_triples(
                        fused_extract_stage(docs, lex, lemmas, "en"),
                        vocab.verb_lemma_table(), lex).localCheckpoint())
    timed(spark, "triples.count", triples.count)

    # ---- canonicalize_materialize sub-steps ----
    uniq_ents = timed(spark, "top_entities+ckpt", lambda:
                      materialize.top_entities(triples, 50_000)
                      .localCheckpoint())
    uniq_rels = materialize.top_relations(triples, 50)
    clusters = timed(spark, "cluster_entities", lambda:
                     canon.cluster_entities(uniq_ents.select("mention"), emb))
    final = timed(spark, "canonicalize_triples+ckpt", lambda:
                  canon.canonicalize_triples(
                      triples.select("subj", "pred", "obj"), clusters,
                      uniq_rels).localCheckpoint())
    graph = materialize.build_graph_tables(final)
    timed(spark, "edges.count", graph["edges"].count)

    # ---- curation pipeline sub-steps ----
    from multivac_spark.operators import dedup, textops
    ddocs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    kept = textops.filter_blocklist(ddocs, ["src1", "src3"],
                                    key=F.col("source"))
    capped = textops.cap_per_domain(kept, 10, key=F.col("source"))
    lm = timed(spark, "cur: train_bigram_lm", lambda:
               textops.train_bigram_lm(
                   capped.filter(F.col("doc_id") % 2 == 0)))
    scored = timed(spark, "cur: lm_score+ckpt", lambda:
                   textops.lm_score(capped, lm)
                   .select("doc_id", "lm_score_e4").localCheckpoint())
    quality = (capped.join(scored, "doc_id")
               .withColumn("dup3_e4",
                           textops.dup_ngram_fraction(F.col("text"), 3)))
    survivors = timed(spark, "cur: survivors+ckpt", lambda:
                      quality.filter((F.col("lm_score_e4") >= -34500)
                                     & (F.col("dup3_e4") < 500))
                      .localCheckpoint())
    pairs = timed(spark, "cur: minhash_dup_pairs(def)", lambda:
                  dedup.minhash_dup_pairs(survivors, bands=4, rows=2))
    timed(spark, "cur: anti-join+noop", lambda: noop(
        survivors.join(pairs.select(F.col("b").alias("doc_id")).distinct(),
                       "doc_id", "left_anti")
        .select("doc_id", F.col("source").alias("domain"),
                "lm_score_e4", "dup3_e4")))

    # ---- other heavies, isolated ----
    qmap = entrymod.queries()
    for name in ["repeated_spans", "simhash_dup_pairs",
                 "embedding_near_dups", "degree_centrality",
                 "text_signals", "minhash_signature"]:
        timed(spark, f"q:{name}", lambda n=name: noop(qmap[n](spark, SF_DIR)))
    spark.stop()
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)


def one_query(name: str, n: int = 3):
    spark = spark_session()
    qmap = entrymod.queries()
    for i in range(n):
        timed(spark, f"{name}#{i}", lambda: noop(qmap[name](spark, SF_DIR)))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "plans":
        dump_plans(sys.argv[2])
    elif mode == "steps":
        steps()
    elif mode == "query":
        one_query(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
