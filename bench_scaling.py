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
sys.path.insert(0, {repo!r})
from multivac_spark.session import get_spark
from multivac_spark.plans.pipeline import run_pipeline, PipelineConfig
from multivac_spark.sources import corpus

cores = int(sys.argv[1]); n_docs = int(sys.argv[2])
spark = get_spark(app_name=f"scaling-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=str(max(cores, 8)))
spark.sparkContext.setLogLevel("ERROR")
docs = corpus.documents_df(spark, n_docs, partitions=max(cores * 2, 16))
emb = corpus.embeddings_df(spark)
# warm the JVM/Python workers on a tiny slice so we time steady-state
warm = run_pipeline(spark, corpus.documents_df(spark, 20), emb,
                    PipelineConfig(top_n_ent=500))
warm["triples"].count()

t0 = time.time()
tables = run_pipeline(spark, docs, emb,
                      PipelineConfig(top_n_ent=50000, top_n_rel=50))
n_triples = tables["triples"].count()
n_edges = tables["edges"].count()
wall = time.time() - t0
print(json.dumps({"cores": cores, "docs": n_docs, "wall_sec": round(wall, 2),
                  "triples": n_triples, "edges": n_edges,
                  "docs_per_sec": round(n_docs / wall, 2),
                  "triples_per_sec": round(n_triples / wall, 2)}))
spark.stop()
"""


def run_at(cores: int, n_docs: int) -> dict:
    repo = os.path.dirname(os.path.abspath(__file__))
    code = WORKER.format(repo=repo)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(n_docs)],
        capture_output=True, text=True, timeout=3600)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    r8 = run_at(8, N_DOCS)
    r32 = run_at(32, N_DOCS)
    eff = (r8["wall_sec"] / r32["wall_sec"]) / 4
    result = {"local8": r8, "local32": r32,
              "scaling_efficiency": round(eff, 3)}
    print(json.dumps(result))

    md = (
        "\n## Scaling evidence (N vs 4N parallelism, same input)\n\n"
        f"Same KG-pipeline job over {N_DOCS} synthetic documents, fresh JVM "
        "per configuration:\n\n"
        "| config | wall (s) | docs/sec | triples/sec |\n"
        "|---|---|---|---|\n"
        f"| local[8] | {r8['wall_sec']} | {r8['docs_per_sec']} | "
        f"{r8['triples_per_sec']} |\n"
        f"| local[32] | {r32['wall_sec']} | {r32['docs_per_sec']} | "
        f"{r32['triples_per_sec']} |\n\n"
        f"**Scaling efficiency (T₈/T₃₂)/4 = {eff:.3f}** "
        f"(target ≥ 0.8 per BASELINE.json north rule).\n"
    )
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH.md"), "a") as f:
        f.write(md)


if __name__ == "__main__":
    main()
