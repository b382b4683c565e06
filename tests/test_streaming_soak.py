"""Streaming soak: 3 incremental drains of the composed incremental
pipeline (ingest + stateful sessionize) with a PROCESS KILL between
drains — each drain runs in its own subprocess with its own
SparkSession, so stream progress and the sessionizer's open-session
state must recover from the on-disk checkpoints alone (VERDICT r2 #8:
the last untested streaming seam — multi-drain crash-resume of
stateful state)."""

import re
import subprocess
import sys

import pandas as pd


_HTML = ("<html><body><article><p>The virus infects the cell . "
         "The protein binds the membrane .</p></article></body></html>")


def _docs(spark, rows):
    """rows: (url, ts_str) → documents-schema DataFrame."""
    data = [(u, pd.Timestamp(t).to_pydatetime(), _HTML.encode(),
             None, "en") for u, t in rows]
    return spark.createDataFrame(
        data, "url string, warc_ts timestamp, html binary, "
              "text string, lang string")


def _drain(workdir):
    res = subprocess.run(
        [sys.executable, "tests/soak_phase.py", str(workdir)],
        capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-3000:]
    m = re.search(r"APPENDED (\d+)", res.stdout)
    assert m, res.stdout[-2000:]
    return int(m.group(1))


def test_multi_drain_crash_resume(spark, tmp_path):
    d = tmp_path
    # ---- phase A: h1 @00:00,00:10 and h2 @00:05 (all sessions open)
    _docs(spark, [
        ("https://h1.example/a/1", "2024-01-01 00:00:00"),
        ("https://h1.example/a/2", "2024-01-01 00:10:00"),
        ("https://h2.example/a/1", "2024-01-01 00:05:00"),
    ]).coalesce(1).write.mode("append").parquet(f"{d}/docs")
    n_a = _drain(d)
    assert n_a > 0
    # nothing closed yet: watermark 00:10-10min=00:00 < any deadline
    assert spark.read.parquet(f"{d}/sessions").count() == 0

    # ---- phase B (after kill): h1 @00:20 continues the OPEN session
    # (within the 30-min gap); h2 @02:00 starts a second session and
    # advances the watermark to 01:50, past both earlier deadlines —
    # so h1's session A∪B and h2's first session close THIS drain.
    _docs(spark, [
        ("https://h1.example/b/1", "2024-01-01 00:20:00"),
        ("https://h2.example/b/1", "2024-01-01 02:00:00"),
    ]).coalesce(1).write.mode("append").parquet(f"{d}/docs")
    n_b = _drain(d)
    assert n_b > 0
    sess_b = spark.read.parquet(f"{d}/sessions").toPandas()
    h1 = sess_b[sess_b.host == "h1.example"]
    # THE continuity assertion: one h1 session spanning the kill,
    # folding phase-A state (2 docs) with the phase-B doc
    assert len(h1) == 1
    assert int(h1.n_docs.iloc[0]) == 3
    assert h1.session_start.iloc[0] == pd.Timestamp("2024-01-01 00:00:00")
    assert h1.session_end.iloc[0] == pd.Timestamp("2024-01-01 00:20:00")
    h2 = sess_b[sess_b.host == "h2.example"]
    assert len(h2) == 1 and int(h2.n_docs.iloc[0]) == 1

    # ---- phase C (after kill): far-future h3 doc pushes the watermark
    # past h2's second deadline (02:30) → it closes; h1 stays closed.
    _docs(spark, [
        ("https://h3.example/c/1", "2024-01-01 06:00:00"),
    ]).coalesce(1).write.mode("append").parquet(f"{d}/docs")
    n_c = _drain(d)
    assert n_c > 0
    sess_c = spark.read.parquet(f"{d}/sessions").toPandas()
    h2 = sess_c[sess_c.host == "h2.example"].sort_values("session_start")
    assert len(h2) == 2
    assert h2.session_start.iloc[1] == pd.Timestamp("2024-01-01 02:00:00")
    assert len(sess_c[sess_c.host == "h1.example"]) == 1  # no re-emit

    # ---- exactly-once triples across all kills: table total equals
    # the sum of per-drain observed appends; a 4th drain with no new
    # files appends nothing and re-emits no session.
    total = spark.read.parquet(f"{d}/triples").count()
    assert total == n_a + n_b + n_c
    n_d = _drain(d)
    assert n_d == 0
    assert spark.read.parquet(f"{d}/triples").count() == total
    assert spark.read.parquet(f"{d}/sessions").count() == len(sess_c)
