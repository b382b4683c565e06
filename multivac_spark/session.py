"""SparkSession factory with scale-oriented defaults.

The knobs below are the ones that matter at 100 TB (AQE, skew-join
handling, shuffle partition sizing, Arrow batch size for the pandas-UDF
boundary); locally they are simply harmless.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(
    app_name: str = "multivac_spark",
    master: str | None = None,
    shuffle_partitions: str | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (falling back to
    ``local[*]``) so the bench harness can pin parallelism for the
    N-vs-4N scaling runs.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing + skew-join splitting. Zipfian predicate /
        # head-entity keys (SURVEY.md §4.3) make this mandatory at scale.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS,
        )
        # Arrow boundary for the NLP pandas UDFs: html payloads can be
        # large, cap rows per batch so a batch stays O(tens of MB).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        # 128 MB scan splits: the documents table rows are ~KB-sized, this
        # keeps task counts sane at 100 TB while bounding task memory.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stats_barrier(df):
    """Materialize ``df`` (localCheckpoint) and rebuild it as a fresh
    scan with default statistics — the lineage cut for iterative
    self-join loops.

    Why plain ``localCheckpoint`` is not enough: Catalyst's
    size-only estimator (``SizeInBytesOnlyStatsPlanVisitor.visitJoin``)
    sets a join's ``sizeInBytes`` to the PRODUCT of its children's
    sizes, and since SPARK-39748 a checkpointed ``LogicalRDD`` carries
    the origin plan's statistics forward. In a loop whose state frame
    is joined against itself (pointer-doubling connected components,
    power iteration), the carried BigInt therefore at least squares
    every round — measured: 54 → 10,249 bits in 8 rounds WITH a
    per-round localCheckpoint — until the driver serializes every
    stats lookup on one core inside ``BigInteger.multiplyToomCook3``
    over numbers with millions of digits (the 40-minute "idle
    executors, one pegged JVM core" failure mode).

    The rebuild goes through ``SparkSession.internalCreateDataFrame``
    on the checkpointed plan's ``InternalRow`` RDD — zero-copy, fully
    JVM-side — with a ``createDataFrame(JavaRDD[Row], schema)``
    fallback if the package-private method is unavailable. The new
    scan reports ``spark.sql.defaultSizeInBytes`` (effectively
    "huge"), so a barrier'd frame is never auto-broadcast: loop-state
    frames are probe sides, which is the safe direction; broadcast
    anything downstream explicitly.
    """
    from pyspark.sql import DataFrame

    spark = df.sparkSession
    ck = df.localCheckpoint()
    jspark = spark._jsparkSession
    try:
        jdf = jspark.internalCreateDataFrame(
            ck._jdf.queryExecution().toRdd(), ck._jdf.schema(), False)
    except Exception:  # pragma: no cover - py4j visibility fallback
        jdf = jspark.createDataFrame(ck._jdf.javaRDD(), ck._jdf.schema())
    return DataFrame(jdf, spark)
