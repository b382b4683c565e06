#!/usr/bin/env python
"""Force-exercise the distributed twins at scale (VERDICT r2 #1).

The hot defaults of the canonicalization stage are driver kernels
justified by the reference's own top-N dictionary truncation
(rdf_graph.py:25): entity clustering (union-find + average-linkage),
connected components, eigenvector centrality. Their distributed twins
are the 100 TB story but normally run only in small parity tests.

This bench runs the SAME KG pipeline over the SAME pre-materialized
corpus twice, in fresh JVMs:

* ``fast`` — driver fast paths on (the production default);
* ``dist`` — ``driver_fastpath_mentions=0`` / ``driver_fastpath_edges=0``
  everywhere, forcing banded-LSH similarity join → pointer-doubling CC →
  per-component applyInPandas average-linkage, and the one-job-per-iter
  distributed eigenvector loop.

It asserts an identical final-triples digest (order-independent
count + decimal sum of xxhash64 over (subj, pred, obj) — no collect,
scale-safe) and appends walls for both paths to BENCH.md. The dist run
additionally computes the driver eigenvector on the same graph and
reports the max |Δscore| between the two eigenvector paths (numeric
twin, float-tolerance comparison).

Usage:  TWINS_DOCS=400000 python bench_twins.py
Exit status is non-zero on a digest mismatch.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N_DOCS = int(os.environ.get("TWINS_DOCS", "400000"))
# 16 of 32 cores: local-mode task slots pair a JVM thread with a Python
# worker process, so local[32] oversubscribes (see bench_scaling.py).
CORES = int(os.environ.get("TWINS_CORES", "16"))

WORKER = r"""
import json, sys, time
sys.path.insert(0, "@REPO@")
from pyspark.sql import functions as F
from multivac_spark.session import get_spark
from multivac_spark.functions.fused import fused_extract_stage
from multivac_spark.operators import analytics, canon, materialize
from multivac_spark.plans.pipeline import default_lexicons
from multivac_spark.sources import corpus, vocab

mode = sys.argv[1]           # "fast" | "dist"
docs_path = sys.argv[2]
cores = int(sys.argv[3])
dist = mode == "dist"

spark = get_spark(app_name=f"twins-{mode}", master=f"local[{cores}]",
                  shuffle_partitions=str(max(cores, 8)))
spark.sparkContext.setLogLevel("ERROR")
lex, lemmas = default_lexicons()
emb = corpus.embeddings_df(spark)
vl = vocab.verb_lemma_table()

# warm JVM + Python workers so we time steady-state
fused_extract_stage(corpus.documents_df(spark, 20), lex, lemmas, "en",
                    normalize=True, verb_lemmas=vl).count()

docs = spark.read.parquet(docs_path)
t0 = time.time()
triples = fused_extract_stage(docs, lex, lemmas, "en",
                              normalize=True,
                              verb_lemmas=vl).localCheckpoint()
n_triples = triples.count()
t_extract = time.time() - t0

t1 = time.time()
uniq_ents = materialize.top_entities(triples, 50000).localCheckpoint()
uniq_rels = materialize.top_relations(triples, 50)
n_mentions = uniq_ents.count()
t_topn = time.time() - t1

t1 = time.time()
clusters = canon.cluster_entities(
    uniq_ents.select("mention"), emb,
    driver_fastpath_mentions=(0 if dist else 10**12),
    driver_fastpath_edges=(0 if dist else 10**12)).localCheckpoint()
n_clustered = clusters.count()
t_cluster = time.time() - t1

t1 = time.time()
final = canon.canonicalize_triples(
    triples.select("subj", "pred", "obj"), clusters,
    uniq_rels).localCheckpoint()
# order-independent distributed digest: row count + decimal(38) sum of
# xxhash64 over the canonical triple — no collect, no sort, scale-safe
dig = final.agg(
    F.count("*").alias("n"),
    F.sum(F.xxhash64("subj", "pred", "obj").cast("decimal(38,0)"))
     .alias("h")).collect()[0]
t_canon = time.time() - t1

t1 = time.time()
edges = materialize.build_graph_tables(final)["edges"].localCheckpoint()
n_edges = edges.count()
ev = analytics.eigenvector_centrality(
    edges, driver_fastpath_edges=(0 if dist else 10**12))
n_ev = ev.count()
t_eig = time.time() - t1

out = {"mode": mode, "cores": cores,
       "wall_sec": round(time.time() - t0, 2),
       "extract_sec": round(t_extract, 2),
       "topn_sec": round(t_topn, 2),
       "cluster_sec": round(t_cluster, 2),
       "canon_sec": round(t_canon, 2),
       "eig_sec": round(t_eig, 2),
       "triples": n_triples, "mentions": n_mentions,
       "clustered": n_clustered, "final_triples": int(dig["n"]),
       "edges": n_edges, "ev_nodes": n_ev,
       "digest": str(dig["h"])}

if dist:
    # numeric twin check: driver eigenvector on the SAME graph
    ev_fast = analytics.eigenvector_centrality(
        edges, driver_fastpath_edges=10**12)
    joined = (ev.withColumnRenamed("score", "s_dist")
              .join(ev_fast.withColumnRenamed("score", "s_fast"), "node"))
    row = joined.agg(
        F.max(F.abs(F.col("s_dist") - F.col("s_fast"))).alias("d"),
        F.count("*").alias("n")).collect()[0]
    out["eig_max_abs_diff"] = float(row["d"] or 0.0)
    out["eig_joined_nodes"] = int(row["n"])

print(json.dumps(out))
spark.stop()
"""


def _repo() -> str:
    return os.path.dirname(os.path.abspath(__file__))


def run_mode(mode: str, docs_path: str) -> dict:
    code = WORKER.replace("@REPO@", _repo())
    out = subprocess.run(
        [sys.executable, "-c", code, mode, docs_path, str(CORES)],
        capture_output=True, text=True, timeout=7200)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker({mode}) failed:\n{out.stderr[-3000:]}")
    return json.loads(lines[-1])


def main() -> None:
    import tempfile
    from bench_scaling import generate_corpus

    with tempfile.TemporaryDirectory() as d:
        docs_path = os.path.join(d, "documents.parquet")
        generate_corpus(N_DOCS, docs_path)
        print(f"corpus generated: {N_DOCS} docs", flush=True)
        fast = run_mode("fast", docs_path)
        print(json.dumps(fast), flush=True)
        dist = run_mode("dist", docs_path)
        print(json.dumps(dist), flush=True)

    match = (fast["digest"] == dist["digest"]
             and fast["final_triples"] == dist["final_triples"])
    result = {"docs": N_DOCS, "fast": fast, "dist": dist,
              "digest_match": match}
    print(json.dumps(result))

    md = (
        "\n## Distributed-twin exercise (driver fast paths OFF vs ON, "
        "same input)\n\n"
        f"Same KG pipeline over a pre-materialized {N_DOCS}-doc corpus "
        f"(local[{CORES}], fresh JVM per run). `dist` forces "
        "`driver_fastpath_mentions=0` / `driver_fastpath_edges=0`: "
        "banded-LSH similarity join, pointer-doubling connected "
        "components, per-component applyInPandas average-linkage, and "
        "the distributed eigenvector loop — the 100 TB code paths.\n\n"
        "| path | wall (s) | extract | topn | cluster | canon | eig | "
        "final triples | digest |\n"
        "|---|---|---|---|---|---|---|---|---|\n"
        f"| fast | {fast['wall_sec']} | {fast['extract_sec']} | "
        f"{fast['topn_sec']} | {fast['cluster_sec']} | "
        f"{fast['canon_sec']} | {fast['eig_sec']} | "
        f"{fast['final_triples']} | `{fast['digest']}` |\n"
        f"| dist | {dist['wall_sec']} | {dist['extract_sec']} | "
        f"{dist['topn_sec']} | {dist['cluster_sec']} | "
        f"{dist['canon_sec']} | {dist['eig_sec']} | "
        f"{dist['final_triples']} | `{dist['digest']}` |\n\n"
        f"Mention dictionary: {fast['mentions']} entries; graph edges: "
        f"{fast['edges']}. **Final-triples digest match: {match}** "
        "(order-independent count + Σ xxhash64). Distributed-vs-driver "
        f"eigenvector max |Δscore| = {dist.get('eig_max_abs_diff')} over "
        f"{dist.get('eig_joined_nodes')} nodes.\n"
    )
    with open(os.path.join(_repo(), "BENCH.md"), "a") as f:
        f.write(md)
    if not match:
        sys.exit(1)


if __name__ == "__main__":
    main()
