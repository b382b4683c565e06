"""Incremental ingest: Trigger.AvailableNow drains only new files."""

import tempfile

from multivac_spark.plans.pipeline import default_lexicons
from multivac_spark.sources import corpus
from multivac_spark.streaming.ingest import ingest_available_now


def test_available_now_exactly_once(spark):
    lex, lemmas = default_lexicons()
    with tempfile.TemporaryDirectory() as d:
        docs_dir, out_dir, ckpt = f"{d}/docs", f"{d}/triples", f"{d}/ckpt"

        corpus.documents_df(spark, 30, partitions=2) \
            .write.mode("append").parquet(docs_dir)
        n1 = ingest_available_now(spark, docs_dir, out_dir, ckpt,
                                  lex, lemmas)
        count1 = spark.read.parquet(out_dir).count()
        assert n1 == count1 > 0

        # second drain with no new files → nothing appended
        n2 = ingest_available_now(spark, docs_dir, out_dir, ckpt,
                                  lex, lemmas)
        assert n2 == 0
        assert spark.read.parquet(out_dir).count() == count1

        # add new files → only they are processed
        docs2 = corpus.documents_df(spark, 60, partitions=2) \
            .filter("url like '%00000003%' or url like '%00000004%'")
        docs2.write.mode("append").parquet(docs_dir)
        n3 = ingest_available_now(spark, docs_dir, out_dir, ckpt,
                                  lex, lemmas)
        total = spark.read.parquet(out_dir).count()
        assert total == count1 + n3
