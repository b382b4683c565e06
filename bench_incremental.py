#!/usr/bin/env python
"""Incremental-vs-batch KG refresh at scale (VERDICT r3 #7).

Evidence for streaming/kg_update.py's O(new + vocab) claim at the
scale the distributed twins were proven (400k docs): ingest a base
corpus, merge its counts, then ingest a DELTA batch and compare

* the incremental path — drain only the new files, merge count
  deltas into the vocabulary-bounded counts tables, rebuild the
  canonical graph from the maintained counts (no recount scan);
* the batch recount — top-N dictionaries recomputed from the FULL
  triples table (what the reference does every run,
  rdf_graph.py's Counters over the whole tuple list).

Both paths then run the identical cluster+canonicalize stages, and
the bench asserts an identical final-triples digest (count +
Σ xxhash64 — order-independent, no collect).

Usage:  INC_BASE=360000 INC_DELTA=40000 python bench_incremental.py
Appends a section to BENCH.md; exit non-zero on digest mismatch.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

N_BASE = int(os.environ.get("INC_BASE", "360000"))
N_DELTA = int(os.environ.get("INC_DELTA", "40000"))
# 16 of 32 cores — local-mode task slots pair a JVM thread with a
# Python worker process (same rationale as bench_scaling.py).
CORES = int(os.environ.get("INC_CORES", "16"))
TOP_N_ENT = 50_000
TOP_N_REL = 50


def _repo() -> str:
    return os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    sys.path.insert(0, _repo())
    from pyspark.sql import functions as F

    from multivac_spark.operators import canon, materialize
    from multivac_spark.plans.pipeline import default_lexicons
    from multivac_spark.session import get_spark
    from multivac_spark.sources import corpus, vocab
    from multivac_spark.streaming.ingest import ingest_available_now
    from multivac_spark.streaming.kg_update import (
        counts_update_available_now, read_counts, refresh_canonical_graph)

    spark = get_spark(app_name="bench-incremental",
                      master=f"local[{CORES}]",
                      shuffle_partitions=str(max(CORES, 8)))
    spark.sparkContext.setLogLevel("ERROR")
    lex, lemmas = default_lexicons()
    vl = vocab.verb_lemma_table()
    emb = corpus.embeddings_df(spark)

    def digest(df):
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("subj", "pred", "obj")
                  .cast("decimal(38,0)")).alias("h")).collect()[0]
        return int(row["n"]), str(row["h"])

    with tempfile.TemporaryDirectory() as d:
        docs_dir = f"{d}/docs"
        triples_dir = f"{d}/triples"
        counts_dir = f"{d}/counts"

        # ---- base corpus: ingest + initial counts merge ----
        corpus.documents_df(spark, N_BASE, partitions=4 * CORES) \
            .write.mode("append").parquet(docs_dir)
        t0 = time.time()
        ingest_available_now(spark, docs_dir, triples_dir, f"{d}/ck_i",
                             lex, lemmas, normalize=True, verb_lemmas=vl)
        t_ingest_base = time.time() - t0
        t0 = time.time()
        counts_update_available_now(spark, triples_dir, counts_dir,
                                    f"{d}/ck_c")
        t_merge_base = time.time() - t0

        # ---- delta: only the new files are extracted and merged ----
        corpus.documents_df(spark, N_DELTA, partitions=CORES,
                            start=N_BASE) \
            .write.mode("append").parquet(docs_dir)
        t0 = time.time()
        ingest_available_now(spark, docs_dir, triples_dir, f"{d}/ck_i",
                             lex, lemmas, normalize=True, verb_lemmas=vl)
        t_ingest_delta = time.time() - t0
        t0 = time.time()
        counts_update_available_now(spark, triples_dir, counts_dir,
                                    f"{d}/ck_c")
        t_merge_delta = time.time() - t0
        vocab_rows = read_counts(spark, counts_dir, "entities").count()

        # ---- incremental refresh: dictionaries from maintained counts
        t0 = time.time()
        final_inc = refresh_canonical_graph(
            spark, triples_dir, counts_dir, emb,
            top_n_ent=TOP_N_ENT, top_n_rel=TOP_N_REL).localCheckpoint()
        n_inc, h_inc = digest(final_inc)
        t_refresh = time.time() - t0

        # ---- batch recount twin over the SAME triples table ----
        triples = spark.read.parquet(triples_dir)
        n_triples = triples.count()
        t0 = time.time()
        uniq_ents = materialize.top_entities(
            triples, TOP_N_ENT).localCheckpoint()
        uniq_ents.count()
        uniq_rels = materialize.top_relations(triples, TOP_N_REL) \
            .localCheckpoint()
        uniq_rels.count()
        t_recount = time.time() - t0
        t0 = time.time()
        clusters = canon.cluster_entities(
            uniq_ents.select("mention"), emb).localCheckpoint()
        final_batch = canon.canonicalize_triples(
            triples.select("subj", "pred", "obj"), clusters,
            uniq_rels).localCheckpoint()
        n_batch, h_batch = digest(final_batch)
        t_batch_canon = time.time() - t0

    match = (n_inc, h_inc) == (n_batch, h_batch)
    out = {"base_docs": N_BASE, "delta_docs": N_DELTA, "cores": CORES,
           "triples": n_triples, "vocab_rows": vocab_rows,
           "ingest_base_sec": round(t_ingest_base, 2),
           "merge_base_sec": round(t_merge_base, 2),
           "ingest_delta_sec": round(t_ingest_delta, 2),
           "merge_delta_sec": round(t_merge_delta, 2),
           "refresh_sec": round(t_refresh, 2),
           "recount_sec": round(t_recount, 2),
           "batch_canon_sec": round(t_batch_canon, 2),
           "final_triples_inc": n_inc, "final_triples_batch": n_batch,
           "digest_inc": h_inc, "digest_batch": h_batch,
           "digest_match": match}
    print(json.dumps(out))

    md = (
        "\n## Incremental-vs-batch KG refresh "
        f"({N_BASE}+{N_DELTA} docs, local[{CORES}])\n\n"
        "AvailableNow ingest + foreachBatch count-merge "
        "(streaming/kg_update.py) against the batch recount of the "
        "same triples table. The delta drain touches only the new "
        "files; the merge is bounded by the vocabulary "
        f"({vocab_rows} count rows), never the corpus.\n\n"
        "| phase | wall (s) |\n|---|---|\n"
        f"| base ingest ({N_BASE} docs → {n_triples} triples incl. "
        f"delta) | {out['ingest_base_sec']} |\n"
        f"| base counts merge | {out['merge_base_sec']} |\n"
        f"| **delta ingest ({N_DELTA} docs, new files only)** | "
        f"{out['ingest_delta_sec']} |\n"
        f"| **delta counts merge (O(new+vocab))** | "
        f"{out['merge_delta_sec']} |\n"
        f"| incremental refresh (counts → cluster → canonicalize) | "
        f"{out['refresh_sec']} |\n"
        f"| batch top-N recount (full triples scan) | "
        f"{out['recount_sec']} |\n"
        f"| batch cluster+canonicalize | {out['batch_canon_sec']} |\n\n"
        f"**Final-triples digest match: {match}** "
        f"({n_inc} triples, count + Σ xxhash64). Delta maintenance "
        f"(ingest {out['ingest_delta_sec']}s + merge "
        f"{out['merge_delta_sec']}s) replaces re-extracting the full "
        f"corpus (base ingest {out['ingest_base_sec']}s) and the "
        f"dictionary recount ({out['recount_sec']}s); at 100 TB the "
        "recount term is the one that scales with the corpus while "
        "the merge stays vocabulary-bounded.\n")
    with open(os.path.join(_repo(), "BENCH.md"), "a") as f:
        f.write(md)
    if not match:
        sys.exit(1)


if __name__ == "__main__":
    main()
