"""Graph-table storage layout: Iceberg when a catalog is configured,
layout-equivalent parquet otherwise.

The north rule materializes the KG as Iceberg triple/entity/edge
tables with salted repartitioning on predicate keys. This module
writes that layout through either engine:

* **Iceberg path** (`spark.sql.catalog.*` configured, iceberg-spark
  runtime jar on the cluster): ``df.writeTo(ident).partitionedBy(
  bucket(N, rel_id))`` — a hidden-partition bucket transform, the
  canonical Iceberg answer to Zipfian predicate skew; snapshot commits
  give the transactional manifest the lineage layer assumes.
* **Parquet fallback** (this sandbox has no Iceberg jar): an explicit
  ``rel_bucket = pmod(hash(rel_id), N)`` partition column +
  ``partitionBy(rel_bucket)`` + in-partition salt repartition +
  ``sortWithinPartitions(rel_id, head_id)`` — the same physical
  layout (bounded files per bucket, clustered scans, predicate
  pruning on bucket) minus snapshot isolation.

Reads reverse the mapping so downstream code sees identical columns
either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

REL_BUCKETS = 16
SALT_BUCKETS = 8


def iceberg_catalog(spark: SparkSession) -> str | None:
    """First configured Iceberg catalog name, or None. Detection is by
    the public config contract: ``spark.sql.catalog.<name>`` set to an
    Iceberg SparkCatalog implementation."""
    try:
        all_conf = spark.sparkContext.getConf().getAll()
    except Exception:
        return None
    for k, v in all_conf:
        if (k.startswith("spark.sql.catalog.")
                and k.count(".") == 3 and "iceberg" in v.lower()):
            return k.rsplit(".", 1)[1]
    return None


def write_edges(spark: SparkSession, edges: DataFrame, base: str,
                name: str = "edges",
                rel_buckets: int = REL_BUCKETS,
                salt_buckets: int = SALT_BUCKETS) -> str:
    """edges(head_id, tail_id, rel_id) → bucketed table; returns the
    location (table identifier or path)."""
    cat = iceberg_catalog(spark)
    if cat is not None:
        ident = f"{cat}.kg.{name}"
        (edges.writeTo(ident)
         .partitionedBy(F.bucket(rel_buckets, F.col("rel_id")))
         .createOrReplace())
        return ident

    path = os.path.join(base, name)
    salt = F.pmod(F.hash("head_id", "tail_id", "rel_id"),
                  F.lit(salt_buckets))
    out = (edges
           .withColumn("rel_bucket",
                       F.pmod(F.hash("rel_id"), F.lit(rel_buckets)))
           # (bucket, salt) repartition: a hot predicate spreads over
           # salt_buckets writers instead of pinning one
           .repartition(F.col("rel_bucket"), salt)
           .sortWithinPartitions("rel_id", "head_id", "tail_id"))
    out.write.mode("overwrite").partitionBy("rel_bucket").parquet(path)
    return path


def read_edges(spark: SparkSession, location: str) -> DataFrame:
    """Location from write_edges → edges(head_id, tail_id, rel_id).
    Filtering on rel_id prunes partitions in the parquet layout when
    the caller also filters the derived rel_bucket; Iceberg's hidden
    bucket transform prunes from rel_id alone."""
    if "/" not in location and "." in location:
        return spark.table(location)
    return spark.read.parquet(location).drop("rel_bucket")


def write_plain(spark: SparkSession, df: DataFrame, base: str,
                name: str) -> str:
    """Unbucketed dictionary tables (entities / relations)."""
    cat = iceberg_catalog(spark)
    if cat is not None:
        ident = f"{cat}.kg.{name}"
        df.writeTo(ident).createOrReplace()
        return ident
    path = os.path.join(base, name)
    df.write.mode("overwrite").parquet(path)
    return path


def write_graph_tables(spark: SparkSession, tables: dict[str, DataFrame],
                       base: str) -> dict[str, str]:
    """Materialize entities/relations/edges in the bucketed layout."""
    return {
        "entities": write_plain(spark, tables["entities"], base, "entities"),
        "relations": write_plain(spark, tables["relations"], base,
                                 "relations"),
        "edges": write_edges(spark, tables["edges"], base),
    }
