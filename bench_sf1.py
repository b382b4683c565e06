#!/usr/bin/env python
"""One-notch-up bench point: the KG pipeline at sf1.0 (100k docs,
local[32]) — VERDICT r2 #9.

Same phase breakdown as bench.py's KG section (corpus materialized to
parquet first; the measured pipeline READS the table, matching the
100 TB shape), run in THIS process on local[32] with AQE on. Appends a
row to BENCH.md so the ladder sf0.1 → sf1.0 shows memory headroom and
throughput behavior one order of magnitude up.

Usage:  python bench_sf1.py           (or SF1_DOCS=... to override)
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time


def main() -> None:
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from multivac_spark.functions.fused import fused_extract_stage
    from multivac_spark.functions.normalize import normalize_triples
    from multivac_spark.functions.parse import fused_sentences_stage
    from multivac_spark.operators import canon, materialize
    from multivac_spark.plans.pipeline import default_lexicons
    from multivac_spark.session import get_spark
    from multivac_spark.sources import corpus, vocab

    n_docs = int(os.environ.get("SF1_DOCS",
                                str(corpus.n_docs_for_sf(1.0))))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="multivac-bench-sf1",
                      master=f"local[{cpus}]",
                      shuffle_partitions=str(max(cpus, 8)))
    spark.sparkContext.setLogLevel("ERROR")
    lex, lemmas = default_lexicons()
    vl = vocab.verb_lemma_table()
    timings: dict[str, float] = {}
    t_all = time.time()

    tmp = tempfile.mkdtemp(prefix="bench_sf1_")
    try:
        t0 = time.time()
        corpus.documents_df(spark, n_docs, partitions=max(cpus * 4, 128)) \
            .write.mode("overwrite").parquet(f"{tmp}/web_documents")
        docs = spark.read.parquet(f"{tmp}/web_documents")
        emb = corpus.embeddings_df(spark)
        timings["corpus_materialize"] = round(time.time() - t0, 3)

        t0 = time.time()
        small = docs.limit(200).localCheckpoint()
        normalize_triples(fused_extract_stage(small, lex, lemmas, "en"),
                          vl, lex) \
            .write.format("noop").mode("overwrite").save()
        fused_sentences_stage(small, lex, lemmas, "en") \
            .write.format("noop").mode("overwrite").save()
        timings["stage_warmup"] = round(time.time() - t0, 3)

        t0 = time.time()
        triples = normalize_triples(
            fused_extract_stage(docs, lex, lemmas, "en"),
            vl, lex).localCheckpoint()
        n_triples = triples.count()
        timings["kg_fused_extract_normalize"] = round(time.time() - t0, 3)

        t0 = time.time()
        n_sent = fused_sentences_stage(docs, lex, lemmas, "en").count()
        timings["kg_sentences_product"] = round(time.time() - t0, 3)

        t0 = time.time()
        uniq_ents = materialize.top_entities(triples, 50_000) \
            .localCheckpoint()
        uniq_rels = materialize.top_relations(triples, 50)
        clusters = canon.cluster_entities(uniq_ents.select("mention"), emb)
        final = canon.canonicalize_triples(
            triples.select("subj", "pred", "obj"), clusters, uniq_rels)
        # stage once: graph-table branches otherwise re-run the
        # canonicalize joins 3x (see bench.py note)
        final = final.localCheckpoint()
        graph = materialize.build_graph_tables(final)
        n_edges = graph["edges"].count()
        timings["kg_canonicalize_materialize"] = round(time.time() - t0, 3)

        # curation-operator ladder at the same scale: the entry
        # queries run against a driver-SHAPED documents table
        # synthesized at sf1.0 (same 31-word vocabulary, 10-100 token
        # lengths, 20 sources, planted doc-pair duplicates — Column-
        # only deterministic generation seeded by doc_id), written to
        # tmp so sf_dir points at it
        from pyspark.sql import functions as F
        n_qdocs = n_docs // 2  # sf1.0 documents table = 50k at sf0.1 x10
        vocab31 = ["a", "agg", "batch", "big", "column", "customer",
                   "data", "dup", "fast", "filter", "group", "hash",
                   "join", "key", "line", "merge", "order", "part",
                   "query", "row", "scan", "slow", "small", "sort",
                   "spark", "stream", "table", "the", "value",
                   "vector", "window"]
        vlit = F.array(*[F.lit(w) for w in vocab31])
        seed = F.when(F.col("id") % 617 == 0, F.col("id") - 1)             .otherwise(F.col("id"))  # every 617th doc duplicates its
        #                              predecessor (exact-dup planting)
        dlen = (F.pmod(F.xxhash64(seed, F.lit(0)), F.lit(91)) + 10)
        text = F.array_join(
            F.transform(F.sequence(F.lit(1), dlen),
                        lambda i: F.element_at(
                            vlit, F.pmod(F.xxhash64(seed, i),
                                         F.lit(31)).cast("int") + 1)),
            " ")
        (spark.range(n_qdocs)
         .repartition(max(cpus * 4, 128))
         .select(F.col("id").alias("doc_id"), text.alias("text"),
                 F.element_at(F.array(F.lit("en"), F.lit("zh"),
                                      F.lit("de"), F.lit("fr"),
                                      F.lit("es")),
                              F.pmod(F.xxhash64("id", F.lit(7)),
                                     F.lit(5)).cast("int") + 1)
                 .alias("lang"),
                 F.concat(F.lit("src"),
                          (F.col("id") % 20).cast("string"))
                 .alias("source"))
         .withColumn("n_chars", F.length("text").cast("long"))
         .write.mode("overwrite").parquet(f"{tmp}/documents.parquet"))
        import __spark_entry__ as entrymod
        qmap = entrymod.queries()
        for qname in ("text_signals", "minhash_signature",
                      "ngram_jaccard", "simhash_dup_pairs",
                      "minhash_dup_pairs", "exact_dedup",
                      "repeated_spans", "subword_tokens",
                      "curation_pipeline"):
            t0 = time.time()
            qmap[qname](spark, tmp).write.format("noop") \
                .mode("overwrite").save()
            timings[qname] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    kg_wall = (timings["kg_fused_extract_normalize"]
               + timings["kg_canonicalize_materialize"])
    out = {
        "sf": 1.0, "docs": n_docs, "cores": cpus,
        "total_sec": round(time.time() - t_all, 3),
        "timings": timings,
        "triples": n_triples, "sentences": n_sent, "edges": n_edges,
        "docs_per_sec": round(n_docs / kg_wall, 2),
        "triples_per_sec": round(n_triples / kg_wall, 2),
    }
    print(json.dumps(out))

    md = (
        "\n## sf1.0 bench point (one notch up the ladder)\n\n"
        f"KG pipeline at sf1.0 ({n_docs} docs, local[{cpus}], AQE on), "
        "same phase breakdown as the sf0.1 bench:\n\n"
        "| phase | sec |\n|---|---|\n"
        + "".join(f"| {k} | {v} |\n" for k, v in timings.items())
        + f"\nTriples: {n_triples}; sentences: {n_sent}; edges: "
        f"{n_edges}; **{out['docs_per_sec']} docs/sec, "
        f"{out['triples_per_sec']} triples/sec** over the KG phases.\n"
    )
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH.md"), "a") as f:
        f.write(md)


if __name__ == "__main__":
    main()
