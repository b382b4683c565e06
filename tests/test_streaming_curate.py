"""Streaming curation (streaming/curate.py): stateless hygiene stages
on the AvailableNow ingest stream — exactly-once file drains,
batch-vs-stream equivalence, blocklist + PII + signal columns."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from multivac_spark.sources import corpus
from multivac_spark.streaming.curate import (curate_available_now,
                                             curate_stage)


def _rows_set(df):
    return {(r["url"], r["text"], r["n_pii"], r["lang_id"],
             r["n_tokens"], r["dup3_e4"], r["fp"])
            for r in df.collect()}


def test_curate_stream_exactly_once_and_equals_batch(spark):
    first = corpus.documents_df(spark, 40, partitions=4)
    second = corpus.documents_df(spark, 30, partitions=4, start=40)
    blocked = ["host-003.example"]
    with tempfile.TemporaryDirectory() as d:
        docs_dir, out_dir = f"{d}/docs", f"{d}/curated"

        first.write.mode("append").parquet(docs_dir)
        n1 = curate_available_now(spark, docs_dir, out_dir, f"{d}/ck",
                                  blocked_domains=blocked)
        assert n1 > 0

        # re-drain with NO new files → nothing re-processed
        assert curate_available_now(spark, docs_dir, out_dir, f"{d}/ck",
                                    blocked_domains=blocked) == 0

        second.write.mode("append").parquet(docs_dir)
        n2 = curate_available_now(spark, docs_dir, out_dir, f"{d}/ck",
                                  blocked_domains=blocked)
        assert n2 > 0

        got = spark.read.parquet(out_dir)
        # batch twin over the same corpus → identical row set
        want = curate_stage(first.unionByName(second),
                            blocked_domains=blocked)
        assert _rows_set(got) == _rows_set(want)
        assert got.count() == n1 + n2

        # blocklist applied: no doc from the blocked host survived
        assert got.filter(
            F.col("url").contains("host-003.example")).count() == 0
        total_hosts = (first.unionByName(second)
                       .filter(F.col("url").contains("host-003.example"))
                       .count())
        assert total_hosts > 0  # the block actually removed something


def test_curate_stage_signals(spark):
    df = spark.createDataFrame(
        [("u1", None, None,
          "the and is of quick mail me@x.org now now now now now now",
          "en")],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string")
    r = curate_stage(df).collect()[0]
    assert r["n_pii"] == 1
    assert "<EMAIL>" in r["text"] and "me@x.org" not in r["text"]
    assert r["lang_id"] == "en"
    assert r["n_tokens"] == 13
    assert r["dup3_e4"] > 0          # "now now now ..." repeats 3-grams
    assert len(r["fp"]) == 32        # md5 prefix fingerprint


def test_curate_stage_token_budget_on_scrubbed_text(spark):
    """Token accounting must describe the STORED (scrubbed) text: a
    multi-token phone number collapses to one <PHONE> token, and
    n_tokens must reflect that — while fp stays on the original text
    so dedup still matches other raw copies."""
    raw = "call +1 555 123 4567 today"          # 6 whitespace tokens raw
    df = spark.createDataFrame(
        [("u1", None, None, raw, "en")],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string")
    r = curate_stage(df).collect()[0]
    assert r["text"] == "call <PHONE> today"
    assert r["n_tokens"] == 3                   # scrubbed, not 6
    assert r["n_pii"] == 1
    import hashlib
    # fp = md5 of the first-5-token prefix of the ORIGINAL text
    assert r["fp"] == hashlib.md5(b"call +1 555 123 4567").hexdigest()


def _curate_drain(workdir):
    import re
    import subprocess
    import sys

    res = subprocess.run(
        [sys.executable, "tests/curate_soak_phase.py", str(workdir)],
        capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-3000:]
    m = re.search(r"APPENDED (\d+)", res.stdout)
    assert m, res.stdout[-2000:]
    return int(m.group(1))


def test_curate_soak_multi_drain_crash_resume(spark, tmp_path):
    """3 drains of the curation stream with a PROCESS KILL between
    each (every drain runs in its own subprocess/SparkSession), plus a
    batch corpus-stage refresh (per-domain cap + exact dedup) per
    drain. After the kills: the curated table must equal the batch
    twin over ALL input rows (including re-crawled duplicates), the
    kept table must equal the cap+dedup twin of that snapshot, and a
    no-new-files drain must append nothing and leave kept unchanged."""
    from pyspark.sql import Window

    d = tmp_path
    batches = [
        corpus.documents_df(spark, 40, partitions=2),
        # overlap 20-39: re-crawled duplicates across the crash
        corpus.documents_df(spark, 30, partitions=2, start=20),
        corpus.documents_df(spark, 20, partitions=2, start=70),
    ]
    blocked = ["host-003.example"]
    appended = []
    for b in batches:
        b.write.mode("append").parquet(f"{d}/docs")
        appended.append(_curate_drain(d))
    assert all(n > 0 for n in appended)

    got_curated = spark.read.parquet(f"{d}/curated")
    all_rows = batches[0].unionByName(batches[1]).unionByName(batches[2])
    want_curated = curate_stage(all_rows, blocked_domains=blocked)

    def rows_sorted(df):
        return sorted(
            (r["url"], r["text"], r["n_pii"], r["lang_id"],
             r["n_tokens"], r["dup3_e4"], r["fp"]) for r in df.collect())

    assert rows_sorted(got_curated) == rows_sorted(want_curated)
    assert got_curated.count() == sum(appended)

    # kept table == batch twin of the final snapshot
    from multivac_spark.operators import textops
    capped = textops.cap_per_domain(want_curated, 5, order_col="url")
    keeper = F.row_number().over(
        Window.partitionBy(F.md5("text")).orderBy("url"))
    want_kept = (capped.withColumn("_rn", keeper)
                 .filter(F.col("_rn") == 1).drop("_rn"))
    got_kept = spark.read.parquet(f"{d}/kept")
    assert rows_sorted(got_kept) == rows_sorted(want_kept)
    # duplicates actually existed and were collapsed by the refresh
    assert got_kept.count() < got_curated.count()

    # idempotent re-drain: no new files → nothing appended, kept stable
    before = rows_sorted(spark.read.parquet(f"{d}/kept"))
    assert _curate_drain(d) == 0
    assert rows_sorted(spark.read.parquet(f"{d}/kept")) == before
