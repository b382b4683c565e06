"""Bucketed graph-table layout (Iceberg-or-parquet writer)."""

import tempfile

from pyspark.sql import functions as F

from multivac_spark.plans import tables


def test_iceberg_catalog_absent(spark):
    # this sandbox has no iceberg jar/catalog — detection must say so
    assert tables.iceberg_catalog(spark) is None


def test_edges_roundtrip_bucketed_layout(spark):
    edges = spark.createDataFrame(
        [(h, t, r) for r in range(5) for h, t in [(r, r + 1), (r, r + 2)]],
        "head_id long, tail_id long, rel_id long")
    with tempfile.TemporaryDirectory() as d:
        loc = tables.write_edges(spark, edges, d, rel_buckets=4)
        back = tables.read_edges(spark, loc)
        assert set(back.columns) == {"head_id", "tail_id", "rel_id"}
        assert sorted(tuple(r) for r in back.collect()) == \
            sorted(tuple(r) for r in edges.collect())
        # physical layout: partition directories on rel_bucket
        import os
        parts = [p for p in os.listdir(f"{d}/edges")
                 if p.startswith("rel_bucket=")]
        assert 1 <= len(parts) <= 4


def test_bucket_pruning_in_plan(spark):
    """Filtering on the derived bucket reaches the scan as partition
    pruning (PartitionFilters on rel_bucket)."""
    edges = spark.createDataFrame(
        [(i, i + 1, i % 7) for i in range(100)],
        "head_id long, tail_id long, rel_id long")
    with tempfile.TemporaryDirectory() as d:
        loc = tables.write_edges(spark, edges, d, rel_buckets=8)
        raw = spark.read.parquet(loc)
        pruned = raw.filter(F.col("rel_bucket") == 3)
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "rel_bucket" in plan
        n_all = raw.count()
        n_pruned = pruned.count()
        assert 0 < n_pruned < n_all


def test_write_graph_tables_all_three(spark):
    ents = spark.createDataFrame([("a", 0), ("b", 1)],
                                 "entity string, entity_id long")
    rels = spark.createDataFrame([("r", 0)], "rel string, rel_id long")
    edges = spark.createDataFrame([(0, 1, 0)],
                                  "head_id long, tail_id long, rel_id long")
    with tempfile.TemporaryDirectory() as d:
        locs = tables.write_graph_tables(
            spark, {"entities": ents, "relations": rels, "edges": edges}, d)
        assert set(locs) == {"entities", "relations", "edges"}
        assert spark.read.parquet(locs["entities"]).count() == 2
        assert tables.read_edges(spark, locs["edges"]).count() == 1


def test_neo4j_bulk_sink_layout(spark):
    """neo4j-admin bulk-import layout: header CSVs + headerless
    distributed parts, node ids shared with the edge endpoints."""
    import csv
    import glob
    import os
    import tempfile

    from multivac_spark.operators import materialize

    ents = spark.createDataFrame(
        [("virus", 0), ("cell", 1)], "entity string, entity_id long")
    rels = spark.createDataFrame([("infect", 0)], "rel string, rel_id long")
    edges = spark.createDataFrame(
        [(0, 1, 0)], "head_id long, tail_id long, rel_id long")
    with tempfile.TemporaryDirectory() as d:
        locs = materialize.write_neo4j_bulk(
            {"entities": ents, "relations": rels, "edges": edges}, d)
        # header fields must be unique (neo4j-admin rejects a duplicate
        # property name) and must match the (id, name, label) data columns
        assert open(locs["nodes_header"]).read() == "id:ID,name,:LABEL\n"
        assert open(locs["relationships_header"]).read() == \
            ":START_ID,:END_ID,:TYPE\n"
        node_rows = []
        for p in glob.glob(os.path.join(locs["nodes"], "part-*.csv")):
            node_rows += list(csv.reader(open(p)))
        rel_rows = []
        for p in glob.glob(os.path.join(locs["relationships"], "part-*.csv")):
            rel_rows += list(csv.reader(open(p)))
        assert sorted(node_rows) == [["0", "virus", "Entity"],
                                     ["1", "cell", "Entity"]]
        assert rel_rows == [["0", "1", "infect"]]
