"""Subprocess driver for the streaming-curation soak test: one
invocation = one AvailableNow drain of the stateless curation stream,
then a BATCH corpus-stage refresh (per-domain cap + exact dedup) over
the closed curated snapshot — the deliberate stream/batch split
documented in streaming/curate.py. Process exit IS the crash between
drains; the next invocation must recover purely from the stream
checkpoint, and the refresh must rebuild the kept table from the
curated snapshot alone.

Run: python tests/curate_soak_phase.py <workdir>
Prints: APPENDED <n_curated_rows_this_drain>
"""

import sys


def main(workdir: str) -> None:
    sys.path.insert(0, ".")
    from pyspark.sql import SparkSession, Window, functions as F

    from multivac_spark.operators import textops
    from multivac_spark.streaming.curate import curate_available_now

    spark = (SparkSession.builder.master("local[4]")
             .appName("curate-soak-phase")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    d = workdir
    n = curate_available_now(spark, f"{d}/docs", f"{d}/curated",
                             f"{d}/ck",
                             blocked_domains=["host-003.example"])
    # batch corpus-stage refresh over the closed snapshot: per-domain
    # cap, then exact dedup keeping the min-url copy per content hash
    cur = spark.read.parquet(f"{d}/curated")
    capped = textops.cap_per_domain(cur, 5, order_col="url")
    keeper = F.row_number().over(
        Window.partitionBy(F.md5("text")).orderBy("url"))
    kept = (capped.withColumn("_rn", keeper)
            .filter(F.col("_rn") == 1).drop("_rn"))
    kept.localCheckpoint().write.mode("overwrite") \
        .parquet(f"{d}/kept")
    print(f"APPENDED {n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1])
