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

    import tempfile

    from multivac_spark.functions.fused import fused_extract_stage
    from multivac_spark.functions.normalize import normalize_triples
    from multivac_spark.operators import canon, materialize
    from multivac_spark.operators import sparql as S
    from multivac_spark.plans.pipeline import default_lexicons
    from multivac_spark.session import get_spark
    from multivac_spark.sources import corpus, vocab

    spark = get_spark(app_name="sparql-seeded", master=f"local[{cpus}]",
                      shuffle_partitions=str(max(int(cpus), 8)))
    spark.sparkContext.setLogLevel("ERROR")

    # the CANONICAL KG, same build as bench_sparql.py — the graph
    # BENCH.md's closure numbers are measured on. (The raw
    # un-canonicalized triples are a far denser graph whose full
    # closure is a different, much larger object: the first cut of
    # this bench used it by mistake and the closure leg OOM'd a 24 GB
    # heap — itself a data point on what the full-closure plan does
    # the moment the graph is bigger than expected.)
    lex, lemmas = default_lexicons()
    docs = corpus.documents_df(spark, corpus.n_docs_for_sf(sf))
    triples = normalize_triples(
        fused_extract_stage(docs, lex, lemmas, "en"),
        vocab.verb_lemma_table(), lex).localCheckpoint()
    uniq_ents = materialize.top_entities(triples, 50_000).localCheckpoint()
    uniq_rels = materialize.top_relations(triples, 50)
    clusters = canon.cluster_entities(
        uniq_ents.select("mention"), corpus.embeddings_df(spark))
    final = canon.canonicalize_triples(
        triples.select("subj", "pred", "obj"), clusters, uniq_rels)
    tmp = tempfile.mkdtemp(prefix="bench_sparql_seeded_")
    final.write.mode("overwrite").parquet(f"{tmp}/triples")
    kg = spark.read.parquet(f"{tmp}/triples")
    n = kg.count()

    # a selective anchor: one subject that has "infect" out-edges
    ent = (kg.filter("pred = 'infect'").select("subj")
           .orderBy("subj").first()["subj"]).replace('"', "")
    q = f'SELECT ?x ?b WHERE {{ "{ent}" "infect" ?x . ?x "bind"+ ?b }}'

    t0 = time.time()
    seeded_rows = sorted(map(tuple, S.sparql(kg, q).collect()))
    t_seeded = round(time.time() - t0, 3)
    print(f"# seeded leg: {t_seeded}s, {len(seeded_rows)} rows",
          flush=True)

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
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
