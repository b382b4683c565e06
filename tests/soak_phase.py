"""Subprocess driver for the streaming soak test: one invocation = one
drain of both incremental queries (ingest + stateful sessionize), then
process exit. The exit IS the crash between drains — the next
invocation must recover stream progress AND open-session state purely
from the on-disk checkpoints.

Run: python tests/soak_phase.py <workdir>
Prints: APPENDED <n_triple_rows>
"""

import sys


def main(workdir: str) -> None:
    sys.path.insert(0, ".")
    from pyspark.sql import SparkSession

    from multivac_spark.plans.pipeline import default_lexicons
    from multivac_spark.streaming.ingest import ingest_available_now
    from multivac_spark.streaming.sessionize import (
        run_sessionize_available_now)

    spark = (SparkSession.builder.master("local[4]")
             .appName("soak-phase")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    lex, lemmas = default_lexicons()
    d = workdir
    n = ingest_available_now(spark, f"{d}/docs", f"{d}/triples",
                             f"{d}/ckpt_triples", lex, lemmas)
    run_sessionize_available_now(spark, f"{d}/docs", f"{d}/sessions",
                                 f"{d}/ckpt_sessions",
                                 gap_seconds=1800,
                                 watermark="10 minutes")
    print(f"APPENDED {n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1])
