"""TF-IDF operator, OpenKE text export, --py-files packaging."""

import os
import tempfile
import zipfile

from multivac_spark.operators import materialize
from multivac_spark.operators.tfidf import tfidf, top_tfidf_terms
from multivac_spark.plans.packaging import build_pyfiles_zip


def test_tfidf_values(spark):
    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "a c")], "doc_id long, text string")
    rows = {(r["doc_id"], r["token"]): (r["tf"], r["df"], r["tfidf_micro"])
            for r in tfidf(docs).collect()}
    import math
    # token 'a': df=2 → idf = ln(3/3) = 0 → tfidf 0
    assert rows[(0, "a")] == (2, 2, 0)
    # token 'b': tf=1, df=1 → ln(3/2)*1e6 floored
    assert rows[(0, "b")] == (1, 1, math.floor(math.log(3 / 2) * 1e6))
    top = top_tfidf_terms(docs, k=2).collect()
    assert top[0]["token"] in ("b", "c")


def test_openke_text_export(spark):
    t = spark.createDataFrame(
        [("a", "r1", "b"), ("b", "r2", "c")],
        "subj string, pred string, obj string")
    tables = materialize.build_graph_tables(t)
    with tempfile.TemporaryDirectory() as d:
        materialize.write_openke_text(tables, d)

        def read_lines(sub):
            dirpath = os.path.join(d, sub)
            parts = [p for p in os.listdir(dirpath) if p.endswith(".txt")]
            out = []
            for p in parts:
                with open(os.path.join(dirpath, p)) as f:
                    out.extend(l.rstrip("\n") for l in f if l.strip())
            return out

        ents = read_lines("entity2id")
        # count header first (rdf_graph.py:326-330)
        assert ents[0] == "3"
        assert set(ents[1:]) == {"a\t0", "b\t1", "c\t2"}
        train = read_lines("train2id")
        assert train[0] == "2"
        # (head, tail, rel) column order (rdf_graph.py:320-321)
        assert "0\t1\t0" in train[1:]  # a r1 b
        assert "1\t2\t1" in train[1:]  # b r2 c


def test_pyfiles_zip(tmp_path):
    out = build_pyfiles_zip(str(tmp_path / "multivac_spark.zip"))
    with zipfile.ZipFile(out) as zf:
        names = zf.namelist()
    assert "multivac_spark/__init__.py" in names
    assert "multivac_spark/functions/fused.py" in names
    assert all(n.endswith(".py") for n in names)
