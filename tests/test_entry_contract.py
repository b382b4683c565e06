"""Self-check of the driver contract: run every queries() entry on Spark
AND its oracle_sql() on DuckDB over the same sf0.001 parquet, compare
row counts + order-insensitive values (mimicking CORRECTNESS_r{N})."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, float):
            return round(v, 6)
        return v

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


ORACLED = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    df = q(spark, SF_DIR)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]

    res = duck.execute(entrymod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(c.lower() for c in spark_cols) == \
        sorted(c.lower() for c in duck_cols), \
        f"{name}: columns {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), \
        f"{name}: rows {len(spark_rows)} vs {len(duck_rows)}"
    a = _canon(spark_rows, [c.lower() for c in spark_cols])
    b = _canon(duck_rows, [c.lower() for c in duck_cols])
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs {diff}")


def test_rows_only_queries_run(spark):
    for name, q in entrymod.queries().items():
        if name in entrymod.oracle_sql():
            continue
        df = q(spark, SF_DIR)
        n = df.count()
        assert n >= 0
        if name == "kg_pipeline_synth":
            assert n > 0, "flagship KG pipeline produced no triples"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert set(df.columns) == {"subj", "pred", "obj", "driver_docs_sf0001"}
