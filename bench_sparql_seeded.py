"""Focused A/B: SPARQL both-variable path with a BGP-bound endpoint,
seeded BFS (round 6) vs full semi-naive closure (round 5 behavior),
on the sf1.0 synthetic KG — the scale shape the round-5 verdict
flagged (`?s <name> "x" . ?s <p>+ ?o` materialized every reachability
pair, 270s / 24.9M pairs at sf1.0, then kept a handful).

The "old" leg monkeypatches `_scan_seeded` back to the closure route,
so both legs run the SAME query on the SAME KG in the SAME session;
output equality is asserted. Prints one JSON line; numbers land in
BENCH.md's SPARQL section.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf = float(os.environ.get("SEEDED_SF", "1.0"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from multivac_spark.functions.fused import fused_extract_stage
    from multivac_spark.functions.normalize import normalize_triples
    from multivac_spark.operators import sparql as S
    from multivac_spark.plans.pipeline import default_lexicons
    from multivac_spark.session import get_spark
    from multivac_spark.sources import corpus, vocab

    spark = get_spark(app_name="sparql-seeded", master=f"local[{cpus}]",
                      shuffle_partitions=str(max(int(cpus), 8)))
    spark.sparkContext.setLogLevel("ERROR")

    lex, lemmas = default_lexicons()
    docs = corpus.documents_df(spark, corpus.n_docs_for_sf(sf))
    kg = (normalize_triples(
        fused_extract_stage(docs, lex, lemmas, "en"),
        vocab.verb_lemma_table(), lex)
        .select("subj", "pred", "obj").localCheckpoint())
    n = kg.count()

    # a selective anchor: one subject that has "infect" out-edges
    ent = (kg.filter("pred = 'infect'").select("subj")
           .orderBy("subj").first()["subj"]).replace('"', "")
    q = f'SELECT ?x ?b WHERE {{ "{ent}" "infect" ?x . ?x "bind"+ ?b }}'

    t0 = time.time()
    seeded_rows = sorted(map(tuple, S.sparql(kg, q).collect()))
    t_seeded = round(time.time() - t0, 3)

    # round-5 behavior: route the path through the full closure
    orig = S._scan_seeded
    S._scan_seeded = lambda triples, p, acc, bound, idx: \
        S._scan(triples, p, idx)
    try:
        t0 = time.time()
        closure_rows = sorted(map(tuple, S.sparql(kg, q).collect()))
        t_closure = round(time.time() - t0, 3)
    finally:
        S._scan_seeded = orig
    assert seeded_rows == closure_rows, "seeded path changed results"

    print(json.dumps({
        "metric": "sparql_seeded_path_ab",
        "unit": "sec",
        "sf": sf,
        "kg_triples": n,
        "anchor": ent,
        "result_rows": len(seeded_rows),
        "seeded_sec": t_seeded,
        "closure_sec": t_closure,
        "speedup": round(t_closure / max(t_seeded, 1e-9), 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
