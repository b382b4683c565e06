"""Incremental (streaming) corpus ingest.

The reference is strictly batch (SURVEY.md §2.10); its "resume" is
file-existence checks. The rebuild's incremental path is Structured
Streaming with ``Trigger.AvailableNow``: each invocation drains all
new document files, runs the fused doc→triples extraction, appends to
the triples table, and records progress in the stream checkpoint —
giving exactly-once file-level ingest semantics on top of the batch
pipeline's stage-level lineage (plans/lineage.py).

At production scale the same topology runs continuously
(``trigger(processingTime=...)``) over an Iceberg/cloud-files source;
watermarks are unnecessary because extraction is stateless per
document (no event-time aggregation in the reference's semantics).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..functions.fused import fused_extract_stage
from ..sources.corpus import DOCUMENTS_SCHEMA


def ingest_available_now(spark: SparkSession,
                         docs_dir: str,
                         out_dir: str,
                         checkpoint_dir: str,
                         lexicon: dict[str, str],
                         lemmas: dict[str, str],
                         lang_filter: str | None = "en",
                         normalize: bool = False,
                         verb_lemmas: dict[str, str] | None = None) -> int:
    """Drain all unprocessed document parquet files from ``docs_dir``
    into a raw-triples table at ``out_dir``. Returns rows appended in
    this invocation (file-level exactly-once via the checkpoint).

    Appended-row accounting comes from an ``observe()`` metric attached
    to the stream (reported per micro-batch in the query progress) —
    NOT from counting the output table, which would cost two full scans
    per micro-ingest at a large triples table (VERDICT r1 #8; the file
    sink itself reports numOutputRows = -1, so observed metrics are the
    scan-free channel)."""
    from pyspark.sql import functions as F

    stream = (spark.readStream
              .schema(DOCUMENTS_SCHEMA)
              .option("maxFilesPerTrigger", 64)
              .parquet(docs_dir))

    triples = fused_extract_stage(stream, lexicon, lemmas, lang_filter,
                                  normalize=normalize,
                                  verb_lemmas=verb_lemmas) \
        .observe("ingest_metrics", F.count(F.lit(1)).alias("rows"))

    query = (triples.writeStream
             .format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", checkpoint_dir)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
    query.awaitTermination()
    appended = 0
    for p in query.recentProgress:
        om = p["observedMetrics"] if "observedMetrics" in p else {}
        m = om.get("ingest_metrics")
        if m is not None:
            appended += int(m["rows"])
    return appended
