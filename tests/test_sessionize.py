"""Stateful streaming sessionization (applyInPandasWithState):
gap-separated per-host sessions close when the watermark passes their
deadline; open sessions survive in state across drain invocations."""

import datetime as dt
import tempfile

from multivac_spark.streaming.sessionize import run_sessionize_available_now


def _docs(spark, rows):
    data = [(url, ts, b"", f"text {i}", "en")
            for i, (url, ts) in enumerate(rows)]
    return spark.createDataFrame(
        data, "url string, warc_ts timestamp, html binary, text string, "
              "lang string")


def test_sessions_close_on_watermark(spark):
    t0 = dt.datetime(2020, 1, 1, 10, 0, 0)

    def at(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    with tempfile.TemporaryDirectory() as d:
        docs_dir, out_dir, ckpt = f"{d}/docs", f"{d}/sess", f"{d}/ckpt"

        # batch 1: host-a has two docs 5 min apart (one session, gap 30m);
        # host-b one doc. Nothing can close yet.
        _docs(spark, [("https://host-a/x", at(0)),
                      ("https://host-a/y", at(5)),
                      ("https://host-b/z", at(3))]) \
            .write.mode("append").parquet(docs_dir)
        run_sessionize_available_now(spark, docs_dir, out_dir, ckpt,
                                     gap_seconds=1800,
                                     watermark="1 minutes")
        try:
            n_closed = spark.read.parquet(out_dir).count()
        except Exception:
            n_closed = 0
        assert n_closed == 0  # watermark hasn't passed any deadline

        # batch 2: a much later doc on host-a advances the watermark far
        # past both sessions' 30-min deadlines → both close; the new doc
        # itself starts a fresh open session.
        _docs(spark, [("https://host-a/w", at(600))]) \
            .write.mode("append").parquet(docs_dir)
        run_sessionize_available_now(spark, docs_dir, out_dir, ckpt,
                                     gap_seconds=1800,
                                     watermark="1 minutes")
        closed = {r["host"]: r for r in spark.read.parquet(out_dir).collect()}
        assert set(closed) == {"host-a", "host-b"}
        a = closed["host-a"]
        assert a["n_docs"] == 2
        assert a["session_start"] == at(0)
        assert a["session_end"] == at(5)
        assert closed["host-b"]["n_docs"] == 1
