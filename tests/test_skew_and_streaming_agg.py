"""Skew handling (salted repartition) + streaming windowed aggregation
with watermark (generic Structured Streaming capability)."""

import tempfile

from pyspark.sql import functions as F

from multivac_spark.operators.materialize import salted


def test_salted_repartition_spreads_hot_key(spark):
    """A 100%-hot key must land in multiple partitions after salting —
    the Zipfian-predicate defense (SURVEY.md §4.3 #1)."""
    df = spark.createDataFrame(
        [(1, i) for i in range(4000)], "rel_id int, payload int")
    plain = (df.repartition(8, F.col("rel_id"))
             .withColumn("pid", F.spark_partition_id())
             .select("pid").distinct().count())
    spread = (salted(df, "rel_id", buckets=16, partitions=8)
              .withColumn("pid", F.spark_partition_id())
              .select("pid").distinct().count())
    assert plain == 1          # unsalted: one straggler partition
    assert spread >= 4         # salted: the hot key fans out


def test_streaming_windowed_agg_matches_batch(spark):
    """readStream → watermark → windowed count == the batch equivalent
    (late-data-capable aggregation shape; reference is batch-only so
    this is a rebuild-added capability)."""
    events = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
              # watermarks need TIMESTAMP, the parquet carries TIMESTAMP_NTZ
              .withColumn("ts", F.col("ts").cast("timestamp")))
    with tempfile.TemporaryDirectory() as d:
        src, out, ckpt = f"{d}/src", f"{d}/out", f"{d}/ckpt"
        events.write.parquet(src)

        stream = (spark.readStream.schema(events.schema).parquet(src)
                  .withWatermark("ts", "1 hour")
                  .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
                  .agg(F.count("*").alias("n")))
        q = (stream.writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

        got = {(r["w"]["start"], r["event_type"]): r["n"]
               for r in spark.read.parquet(out).collect()}
        want = {(r["w"]["start"], r["event_type"]): r["n"]
                for r in (events.groupBy(F.window("ts", "1 day").alias("w"),
                                         "event_type")
                          .agg(F.count("*").alias("n")).collect())}
        # append mode emits only watermark-closed windows: the final
        # window legitimately stays open when the stream drains
        last_start = max(k[0] for k in want)
        closed_want = {k: v for k, v in want.items() if k[0] < last_start}
        assert got == closed_want
        assert len(got) > 0
