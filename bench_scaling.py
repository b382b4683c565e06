#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json north rule).

No real cluster exists in this sandbox, so the N-vs-4N-executor
criterion is evidenced by running the SAME KG-pipeline job at two
parallelism levels — local[8] and local[32] — on the SAME synthetic
input, reporting throughput at both and the scaling efficiency
  eff = (T_8 / T_32) / 4.

Each configuration runs in its own subprocess (fresh JVM) so neither
run inherits the other's warmed state. Results are appended to
BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N_DOCS = int(os.environ.get("SCALING_DOCS", "6000"))

WORKER = r"""
import json, sys, time
sys.path.insert(0, "@REPO@")
from multivac_spark.session import get_spark
from multivac_spark.functions.fused import fused_extract_stage
from multivac_spark.operators import canon, materialize
from multivac_spark.plans.pipeline import default_lexicons
from multivac_spark.sources import corpus, vocab

cores = int(sys.argv[1]); n_docs = int(sys.argv[2]); docs_path = sys.argv[3]
spark = get_spark(app_name=f"scaling-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=str(max(cores, 8)))
spark.sparkContext.setLogLevel("ERROR")
lex, lemmas = default_lexicons()
emb = corpus.embeddings_df(spark)
vl = vocab.verb_lemma_table()

# warm JVM + Python workers on a tiny slice so we time steady-state
fused_extract_stage(corpus.documents_df(spark, 20), lex, lemmas, "en",
                    normalize=True, verb_lemmas=vl).count()

# the timed job READS the documents table (the real 100 TB shape);
# corpus synthesis is not part of the measured pipeline
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
t_topn = time.time() - t1
t1 = time.time()
clusters = canon.cluster_entities(uniq_ents.select("mention"), emb)
t_cluster = time.time() - t1
t1 = time.time()
final = canon.canonicalize_triples(triples.select("subj", "pred", "obj"),
                                   clusters, uniq_rels)
n_edges = materialize.build_graph_tables(final)["edges"].count()
t_graph = time.time() - t1
wall = time.time() - t0
print(json.dumps({"cores": cores, "docs": n_docs, "wall_sec": round(wall, 2),
                  "extract_sec": round(t_extract, 2),
                  "topn_sec": round(t_topn, 2),
                  "cluster_sec": round(t_cluster, 2),
                  "graph_sec": round(t_graph, 2),
                  "triples": n_triples, "edges": n_edges,
                  "docs_per_sec": round(n_docs / wall, 2),
                  "triples_per_sec": round(n_triples / wall, 2)}))
spark.stop()
"""

GENERATOR = r"""
import sys
sys.path.insert(0, "@REPO@")
from multivac_spark.session import get_spark
from multivac_spark.sources import corpus

n_docs = int(sys.argv[1]); out = sys.argv[2]
spark = get_spark(app_name="scaling-gen", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
corpus.documents_df(spark, n_docs, partitions=128) \
    .write.mode("overwrite").parquet(out)
spark.stop()
"""


def _repo() -> str:
    return os.path.dirname(os.path.abspath(__file__))


def generate_corpus(n_docs: int, out: str) -> None:
    code = GENERATOR.replace("@REPO@", _repo())
    subprocess.run([sys.executable, "-c", code, str(n_docs), out],
                   capture_output=True, text=True, timeout=3600, check=True)


def run_at(cores: int, n_docs: int, docs_path: str) -> dict:
    code = WORKER.replace("@REPO@", _repo())
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(n_docs), docs_path],
        capture_output=True, text=True, timeout=3600)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker({cores}) failed:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


# N and 4N parallelism. 4/16 rather than 8/32: in local mode every task
# slot pairs a JVM thread with a Python worker process, so local[32] on
# a 32-core box oversubscribes (≈64 busy threads) — an artifact a real
# 8-vs-32-executor cluster does not have. 4 and 16 keep both
# configurations un-oversubscribed while preserving the 4× ratio.
N_CORES = int(os.environ.get("SCALING_N", "4"))


def main() -> None:
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        docs_path = os.path.join(d, "documents.parquet")
        generate_corpus(N_DOCS, docs_path)
        r_n = run_at(N_CORES, N_DOCS, docs_path)
        r_4n = run_at(N_CORES * 4, N_DOCS, docs_path)
    eff = (r_n["wall_sec"] / r_4n["wall_sec"]) / 4
    result = {f"local{N_CORES}": r_n, f"local{N_CORES * 4}": r_4n,
              "scaling_efficiency": round(eff, 3)}
    print(json.dumps(result))

    md = (
        "\n## Scaling evidence (N vs 4N parallelism, same input)\n\n"
        f"Same KG-pipeline job over a pre-materialized parquet corpus of "
        f"{N_DOCS} documents, fresh JVM per configuration (corpus "
        "synthesis excluded from the timed job — the measured pipeline "
        "READS the documents table, matching the 100 TB shape):\n\n"
        "| config | wall (s) | extract (s) | docs/sec | triples/sec |\n"
        "|---|---|---|---|---|\n"
        f"| local[{N_CORES}] | {r_n['wall_sec']} | {r_n['extract_sec']} | "
        f"{r_n['docs_per_sec']} | {r_n['triples_per_sec']} |\n"
        f"| local[{N_CORES * 4}] | {r_4n['wall_sec']} | "
        f"{r_4n['extract_sec']} | {r_4n['docs_per_sec']} | "
        f"{r_4n['triples_per_sec']} |\n\n"
        f"**Scaling efficiency (T_N/T_4N)/4 = {eff:.3f}** "
        f"(target ≥ 0.8 per BASELINE.json north rule).\n"
    )
    with open(os.path.join(_repo(), "BENCH.md"), "a") as f:
        f.write(md)


if __name__ == "__main__":
    main()
