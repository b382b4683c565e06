"""N-Triples source/sink: escape grammar + roundtrip + interop.

The reference's exports stop at OpenKE id files and Neo4j bulk CSV
(rdf_graph.py:295-338); this sink adds the W3C RDF 1.1 N-Triples
interchange format. Oracle = identity: any triples table must survive
write->read byte-for-byte in both IRI-object and literal-object modes,
and the emitted lines must parse under the published grammar (checked
here against hand-derived expected lines for the tricky escapes).
"""

import glob

import pytest

from multivac_spark.sources import ntriples as nt

ROWS = [
    ("alpha beta", "is_a", "gamma"),
    ("x + y = z", "relates to", 'quote " and \\ back'),
    ("tab\there", "rel", "new\nline"),
    ("carriage\rret", "rel", "plain"),
    ("unicode ü☃", "rël", "ob ject"),
    ("trailing\\", "r", "\\n literal backslash-then-n"),
    ("", "empty-parts", ""),
    ("plus+plus", "p+q", "100% & #frag?"),
]


def _df(spark):
    return spark.createDataFrame(ROWS, "subj string, pred string, obj string")


@pytest.mark.parametrize("literal_objects", [False, True])
def test_roundtrip_identity(spark, tmp_path, literal_objects):
    df = _df(spark)
    path = str(tmp_path / ("lit" if literal_objects else "iri"))
    nt.write_ntriples(df, path, literal_objects=literal_objects)
    back = nt.read_ntriples(spark, path)
    assert back.columns == ["subj", "pred", "obj"]
    assert sorted(map(tuple, back.collect())) == sorted(ROWS)


def test_emitted_lines_match_grammar(spark, tmp_path):
    """Hand-derived expected lines for the escape-sensitive rows."""
    df = spark.createDataFrame(
        [("a b", "r", 'q"\\\n\r\t end')], "subj string, pred string, obj string")
    path = str(tmp_path / "g")
    nt.write_ntriples(df, path, literal_objects=True)
    lines = []
    for f in sorted(glob.glob(path + "/part-*")):
        lines += open(f, encoding="utf-8").read().splitlines()
    assert lines == [
        '<http://multivac-kg.local/a%20b> <http://multivac-kg.local/r> '
        '"q\\"\\\\\\n\\r\\t end" .']


def test_escaped_backslash_n_is_not_newline(spark, tmp_path):
    r"""'\\n' in a literal (escaped backslash then n) must decode to
    backslash+n, never newline — the ordering trap chained replaces hit."""
    path = str(tmp_path / "bs")
    df = spark.createDataFrame(
        [("s", "p", "\\n"), ("s2", "p", "\\\\"), ("s3", "p", "a\\nb\nc")],
        "subj string, pred string, obj string")
    nt.write_ntriples(df, path, literal_objects=True)
    got = {r["subj"]: r["obj"]
           for r in nt.read_ntriples(spark, path).collect()}
    assert got == {"s": "\\n", "s2": "\\\\", "s3": "a\\nb\nc"}


def test_comments_blank_lines_and_foreign_iris(spark, tmp_path):
    p = tmp_path / "mixed"
    p.mkdir()
    (p / "x.nt").write_text(
        "# header comment\n"
        "\n"
        "<http://example.org/Foo%20Bar> "
        "<http://multivac-kg.local/is_a> "
        "<http://multivac-kg.local/gamma> .\n"
        '<http://multivac-kg.local/s> <http://multivac-kg.local/p> "" .\n')
    rows = sorted(map(tuple, nt.read_ntriples(spark, str(p)).collect()))
    # foreign IRIs pass through VERBATIM — their percent-escapes are
    # their own bytes, not ours to decode
    assert rows == [("http://example.org/Foo%20Bar", "is_a", "gamma"),
                    ("s", "p", "")]


def test_foreign_iri_with_raw_percent_does_not_fail(spark, tmp_path):
    """A raw '%' not followed by two hex digits is legal IRIREF; it
    must not blow up the whole read (url_decode would throw on it)."""
    p = tmp_path / "rawpct"
    p.mkdir()
    (p / "x.nt").write_text(
        "<http://example.org/100%25ok> "
        "<http://example.org/a%b> "
        "<http://multivac-kg.local/a%20b> .\n")
    rows = [tuple(r) for r in nt.read_ntriples(spark, str(p)).collect()]
    assert rows == [("http://example.org/100%25ok",
                     "http://example.org/a%b", "a b")]


def test_malformed_line_fails_fast(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "y.nt").write_text("<a> <b> garbage\n")
    with pytest.raises(ValueError, match="malformed"):
        nt.read_ntriples(spark, str(p))


def test_sink_over_real_pipeline_triples(spark, tmp_path):
    """End-to-end: canonical triples from the real extraction pipeline
    survive the interchange roundtrip (mentions carry spaces, unicode,
    punctuation — the realistic encode surface)."""
    from multivac_spark.plans.pipeline import PipelineConfig, run_pipeline
    from multivac_spark.sources import corpus

    tables = run_pipeline(spark, corpus.documents_df(spark, 40),
                          corpus.embeddings_df(spark),
                          PipelineConfig(top_n_ent=5000, top_n_rel=50))
    df = (tables["final_triples"].select("subj", "pred", "obj")
          .limit(500).cache())
    path = str(tmp_path / "kg")
    nt.write_ntriples(df, path)
    back = nt.read_ntriples(spark, path)
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, df.collect()))


def test_uchar_escapes_decode(spark, tmp_path):
    r"""N-Triples §2.4 UCHAR: \uXXXX and \UXXXXXXXX decode in literals
    AND IRIs (third-party exporters commonly \u-escape non-ASCII),
    including supplementary-plane code points via surrogate-pair
    arithmetic; '\\u0041' (escaped backslash then text) must NOT
    become 'A'."""
    p = tmp_path / "uchar"
    p.mkdir()
    base = "http://multivac-kg.local/"
    (p / "u.nt").write_text(
        f'<{base}s1> <{base}p> "A\\u00e9B" .\n'          # é (BMP)
        f'<{base}s2> <{base}p> "\\U0001D400 bold" .\n'   # 𝐀 (SMP)
        f'<{base}s3> <{base}p> "\\\\u0041" .\n'          # literal A
        f'<{base}s4> <{base}p> "\\u0022quoted\\u0022" .\n'
        f'<{base}caf\\u00e9> <{base}p> <{base}snow\\u2603man> .\n')
    got = {r["subj"]: (r["pred"], r["obj"])
           for r in nt.read_ntriples(spark, str(p)).collect()}
    assert got["s1"] == ("p", "AéB")
    assert got["s2"] == ("p", "\U0001D400 bold")
    assert got["s3"] == ("p", "\\u0041")
    assert got["s4"] == ("p", '"quoted"')
    assert got["café"] == ("p", "snow☃man")
