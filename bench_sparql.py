"""SPARQL-layer benchmark over the sf0.1 canonical KG.

Builds the KG with the same kernel bench.py uses (fused extract →
canonicalize → final triples), writes the triples as a parquet table
(the consumer posture: SPARQL scans storage, so constant-predicate
patterns exercise real PushedFilters), then times one query per
compiler feature. Prints one JSON line; numbers land in BENCH.md's
round-5 SPARQL section.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

QUERIES = {
    # 2-hop BGP join with a constant predicate on each hop
    "bgp_2hop": ('SELECT ?a ?c WHERE { ?a "infect" ?b . '
                 '?b "contain"|"encode" ?c }'),
    # group-by aggregate with order-by-alias + limit
    "agg_topk": ('SELECT ?p (COUNT(*) AS ?n) (COUNT(DISTINCT ?s) AS ?h) '
                 'WHERE { ?s ?p ?o } GROUP BY ?p ORDER BY DESC(?n) ?p '
                 'LIMIT 10'),
    # negation: anti-join against a second pattern
    "minus": ('SELECT ?s ?o WHERE { ?s "infect" ?o '
              'MINUS { ?s "inhibit" ?g } }'),
    # union of two predicate slices joined with a third pattern
    "union_join": ('SELECT ?s ?g WHERE { { ?s "infect" ?x } UNION '
                   '{ ?s "activate" ?x } . ?x "bind" ?g }'),
    # optional attachment + string filter
    "optional_filter": ('SELECT ?s ?g WHERE { ?s "infect" ?o . '
                        'OPTIONAL { ?o "encode" ?g } '
                        'FILTER(CONTAINS(?s, "virus")) }'),
    # one-or-more property path, both variables unbound: the full
    # semi-naive transitive closure (the worst case — kept as the
    # upper envelope)
    "path_closure": 'SELECT ?a ?b WHERE { ?a "bind"+ ?b }',
    # the same closure predicate with the endpoint bound by a BGP
    # pattern: round 6 routes this to a multi-source seeded BFS
    # (work ∝ the seeds' reachable set, not the graph closure)
    "path_seeded": ('SELECT ?x ?b WHERE { ?s "regulate" ?x . '
                    '?x "bind"+ ?b }'),
    # CONSTRUCT rule derivation (inverse-edge enrichment)
    "construct_rule": ('CONSTRUCT { ?o "infected_by" ?s } '
                       'WHERE { ?s "infect" ?o }'),
    # ASK existence probe (limit(1) short-circuit over a 2-hop join)
    "ask_probe": 'ASK { ?s "infect" ?o . ?o "bind" ?g }',
    # DESCRIBE: broadcast semi-join of the resource set both ways
    "describe": 'DESCRIBE ?x WHERE { ?x "inhibit" ?g }',
    # zero-or-more path: closure ∪ zero-length identity over terms
    "path_star": 'SELECT ?s ?b WHERE { ?s "regulate" ?x . ?x "bind"* ?b }',
    # sequence path: two chained constant-predicate scans via an
    # anonymous middle variable (desugared equi-join)
    "path_seq": 'SELECT ?a ?c WHERE { ?a "infect"/"bind" ?c }',
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    from multivac_spark.functions.fused import fused_extract_stage
    from multivac_spark.functions.normalize import normalize_triples
    from multivac_spark.operators import canon, materialize
    from multivac_spark.operators.sparql import sparql
    from multivac_spark.plans.pipeline import default_lexicons
    from multivac_spark.session import get_spark
    from multivac_spark.sources import corpus, vocab

    spark = get_spark(app_name="sparql-bench", master=f"local[{cpus}]",
                      shuffle_partitions=str(max(int(cpus), 8)))
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="bench_sparql_")
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
    final.write.mode("overwrite").parquet(f"{tmp}/triples")
    kg = spark.read.parquet(f"{tmp}/triples")
    n = kg.count()

    timings, rows = {}, {}
    for name, q in QUERIES.items():
        t0 = time.time()
        out = sparql(kg, q)
        rows[name] = out.count()
        timings[name] = round(time.time() - t0, 3)

    print(json.dumps({
        "metric": "sparql_bench_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": sf,
        "kg_triples": n,
        "queries": timings,
        "rows": rows,
    }))
    spark.stop()
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
