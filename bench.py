#!/usr/bin/env python
"""Benchmark harness.

Runs the headline workloads at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries":
{name: sec}, "sf", plus throughput extras (docs/sec, triples/sec,
sentences/sec) for the KG pipeline}.

The KG pipeline benchmark runs over the deterministic synthetic corpus
scaled to match the sf (sf0.1 → 10,000 Common-Crawl-style pages); the
operator benchmarks run over the driver's parquet tables.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from multivac_spark.session import get_spark
    from multivac_spark.sources import corpus

    spark = get_spark(app_name="multivac-bench", master=f"local[{cpus}]",
                      shuffle_partitions=str(max(int(cpus), 8)))
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    t_all = time.time()

    # Python-worker warmup: the FIRST Arrow stage in a session pays the
    # fork+import cost of all local[N] python workers (~10-15s at N=32),
    # which would otherwise be misattributed to whichever stage runs
    # first. Real clusters amortize this across the job lifetime. The
    # warmup cost stays inside the bench total (t_all above).
    import pandas as _pd

    def _noop(batches):
        for b in batches:
            yield b

    (spark.range(int(cpus) * 4).repartition(int(cpus))
     .withColumnRenamed("id", "x")
     .mapInPandas(_noop, schema="x long")
     .groupBy((F.col("x") % 2).alias("k")).count()
     .write.format("noop").mode("overwrite").save())
    timings["warmup"] = round(time.time() - t_all, 3)

    # ---- KG pipeline over the synthetic corpus --------------------------
    # stages built explicitly (run_pipeline's clustering step is eager;
    # explicit sequencing keeps each phase's timing honest)
    from multivac_spark.functions.normalize import normalize_triples
    from multivac_spark.operators import canon, materialize
    from multivac_spark.plans.pipeline import default_lexicons
    from multivac_spark.sources import vocab

    lex, lemmas = default_lexicons()
    n_docs = corpus.n_docs_for_sf(sf)

    # Materialize the synthetic corpus ONCE as parquet and read it back:
    # the engine's input at scale is a storage table, not a generator —
    # without this every stage re-pays document synthesis (~7s at sf0.1)
    # and the per-stage numbers measure the generator, not the operator.
    import tempfile
    tmp = tempfile.mkdtemp(prefix="bench_docs_")
    t0 = time.time()
    corpus.documents_df(spark, n_docs).write.mode("overwrite") \
        .parquet(f"{tmp}/documents")
    docs = spark.read.parquet(f"{tmp}/documents")
    emb = corpus.embeddings_df(spark)
    timings["corpus_materialize"] = round(time.time() - t0, 3)

    # Closure warmup: the first run of each distinct Arrow-stage closure
    # pays a one-time distribution/compile cost (~10-20s at local[32],
    # measured; steady-state is ~5s). A 100 TB run pays it once per job,
    # so the per-stage timings below measure steady state; the warmup
    # cost itself stays in the bench total via the stage_warmup key.
    from multivac_spark.functions.fused import fused_extract_stage
    t0 = time.time()
    small = docs.limit(200).localCheckpoint()
    from multivac_spark.functions.parse import fused_sentences_stage
    normalize_triples(fused_extract_stage(small, lex, lemmas, "en"),
                      vocab.verb_lemma_table(), lex) \
        .write.format("noop").mode("overwrite").save()
    fused_sentences_stage(small, lex, lemmas, "en") \
        .write.format("noop").mode("overwrite").save()
    timings["stage_warmup"] = round(time.time() - t0, 3)

    t0 = time.time()
    triples = normalize_triples(
        fused_extract_stage(docs, lex, lemmas, "en"),
        vocab.verb_lemma_table(), lex).localCheckpoint()
    n_triples = triples.count()
    timings["kg_fused_extract_normalize"] = round(time.time() - t0, 3)

    # sentences product via the fused single-Arrow-pass stage (the
    # staged 3-crossing path remains for the coref variant)
    t0 = time.time()
    sentences = fused_sentences_stage(docs, lex, lemmas, "en")
    n_sent = sentences.count()
    timings["kg_sentences_product"] = round(time.time() - t0, 3)

    t0 = time.time()
    uniq_ents = materialize.top_entities(triples, 50_000).localCheckpoint()
    uniq_rels = materialize.top_relations(triples, 50)
    clusters = canon.cluster_entities(uniq_ents.select("mention"), emb)
    final = canon.canonicalize_triples(
        triples.select("subj", "pred", "obj"), clusters, uniq_rels)
    # stage the canonical triples once: build_graph_tables' entities/
    # relations/edges branches would each re-run the canonicalize joins
    # (3x) from the lazy plan — at cluster scale this is the staged
    # final-triples table every consumer reads (9.3s -> 5.5s here)
    final = final.localCheckpoint()
    graph = materialize.build_graph_tables(final)
    n_edges = graph["edges"].count()
    timings["kg_canonicalize_materialize"] = round(time.time() - t0, 3)

    kg_wall = (timings["kg_fused_extract_normalize"]
               + timings["kg_canonicalize_materialize"])
    extras["kg_docs"] = n_docs
    extras["kg_sentences"] = n_sent
    extras["kg_triples"] = n_triples
    extras["kg_edges"] = n_edges
    extras["docs_per_sec"] = round(n_docs / kg_wall, 2)
    extras["sentences_per_sec"] = round(n_sent / kg_wall, 2)
    extras["triples_per_sec"] = round(n_triples / kg_wall, 2)

    # ---- operator benchmarks over the driver tables ----------------------
    bench_queries = [
        # round 6: scan_filter_project and topn_entities were
        # consolidated into these digest entries (registry 50-cap);
        # each digest runs a superset of the old line item's work
        "relational_forms", "topn_digest", "broadcast_join_agg",
        "window_topk", "distinct_dedup", "degree_centrality",
        "text_signals",
        "minhash_signature", "simhash_dup_pairs", "ngram_jaccard",
        "ann_topk", "embedding_near_dups", "exact_dedup",
        "session_agg", "curation_pipeline", "repeated_spans",
        "quality_classifier", "subword_tokens",
    ]
    qmap = entrymod.queries()
    for name in bench_queries:
        t0 = time.time()
        df = qmap[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(time.time() - t_all, 3)
    out = {
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        **extras,
    }
    spark.stop()
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
