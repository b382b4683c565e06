"""RDF N-Triples source + sink (W3C RDF 1.1 N-Triples).

The KG interchange sink the reference lacks: its exports stop at
OpenKE id files and Neo4j bulk CSV (rdf_graph.py:295-338 /
output_to_neo4j), so the graph can't be handed to standard RDF
tooling (triple stores, SPARQL engines, rdflib). This module round-
trips the canonical (subj, pred, obj) mention table through the
N-Triples line format:

    <iri> <iri> <iri> .          # entity object
    <iri> <iri> "literal" .      # literal object

* **Mentions → IRIs** by percent-encoding under a base IRI. Encoding
  runs JVM-side: ``url_encode`` (form encoding) then ``'+'`` →
  ``%20``, which lands exactly on RFC 3986 percent-encoding for any
  unicode mention (``url_encode`` emits ``+`` only for space and
  %-escapes every other reserved byte, including literal ``+`` as
  ``%2B``). ``url_decode`` inverts it losslessly on read.
* **Literals** escape ``\\``, ``"``, LF, CR, TAB per the N-Triples
  grammar (§2.4 ECHAR), also as one JVM regexp/replace chain.
* Reader parses with one ``regexp_extract_all`` per line, tolerates
  comment and blank lines, and decodes IRIs back to mentions when
  they sit under ``base_iri`` (foreign IRIs pass through verbatim —
  reading arbitrary third-party N-Triples yields their IRIs).

Scale: the sink is a narrow projection + ``write.text`` (no shuffle —
partitioning is whatever the triples table carries, salted rel_id
from materialize.write_edges upstream); the source is ``read.text``
(splittable) + Column expressions. Nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

DEFAULT_BASE = "http://multivac-kg.local/"

# N-Triples line: three terms then " ." — IRIs in <>, or a quoted
# literal object. Literal escapes keep " out of the raw match.
_LINE_RE = (r'^<([^>]*)> <([^>]*)> '
            r'(?:<([^>]*)>|"((?:[^"\\]|\\.)*)") \.\s*$')


def _encode_iri(col, base: str):
    """mention → <base><percent-encoded mention>, all JVM-side."""
    enc = F.regexp_replace(F.url_encode(col), r"\+", "%20")
    return F.concat(F.lit(base), enc)


def _decode_iri(col, base: str):
    """Inverse of _encode_iri for IRIs under ``base``; foreign IRIs
    pass through VERBATIM (after UCHAR unescape, which is file-format
    encoding, not IRI content). Percent-decoding a third-party IRI
    would corrupt its own escaped bytes — and a raw ``%`` not followed
    by two hex digits is legal per the IRIREF grammar but makes
    ``url_decode`` throw, which would fail the entire read job on one
    foreign line. Only IRIs we minted (under ``base``) are guaranteed
    url_decode-safe, so only they are decoded.
    Raw ``+`` is re-escaped before ``url_decode`` so it survives as a
    literal plus (RFC 3986 semantics) instead of form-decoding to a
    space — a no-op for our own IRIs, which never contain raw ``+``.
    UCHAR escapes (the ONLY backslash form IRIREF permits, §2.4)
    decode first — third-party exporters commonly \\u-escape non-ASCII
    IRIs; the contains-backslash guard keeps our own escape-free IRIs
    on the cheap path. The decoded value is referenced three times
    (startswith + both branches), so it is bound ONCE as a lambda
    value (``dedup.bound``) — CollapseProject would otherwise inline
    the whole tokenize-and-rejoin expression per reference."""
    from ..operators.dedup import bound

    decoded = F.when(col.contains("\\"),
                     _unescape_uchar(col)).otherwise(col)
    return bound(decoded, lambda c: F.when(
        c.startswith(base),
        F.url_decode(F.regexp_replace(
            F.substring(c, len(base) + 1, 1 << 20), r"\+", "%2B")))
        .otherwise(c))


def _unescape_uchar(col):
    """UCHAR-only unescape for IRIREF bodies (a stray backslash —
    illegal per grammar — passes through verbatim)."""
    toks = F.regexp_extract_all(col, F.lit(_ESCAPE_TOKEN_RE), 1)
    return F.array_join(
        F.transform(toks, lambda t:
                    F.when(t.rlike(r"^\\[uU]"), _uchar_to_str(t))
                    .otherwise(t)), "")


def _escape_literal(col):
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(col, r"\\", r"\\\\"),
                    '"', r'\\"'),
                "\n", r"\\n"),
            "\r", r"\\r"),
        "\t", r"\\t")


def _uchar_to_str(t):
    """``\\uXXXX`` / ``\\UXXXXXXXX`` token → its character, all
    JVM-side: hex → code point; BMP code points decode directly as
    one UTF-16BE unit, supplementary ones via the surrogate-pair
    arithmetic (no UTF-32 charset in Spark's decode)."""
    cp = F.conv(F.substring(t, 3, 8), 16, 10).cast("long")
    bmp = F.lpad(F.hex(cp), 4, "0")
    hi = F.lpad(F.hex(F.lit(0xD800)
                      + F.shiftright(cp - F.lit(0x10000), 10)), 4, "0")
    lo = F.lpad(F.hex(F.lit(0xDC00) + (cp - F.lit(0x10000)) % 1024),
                4, "0")
    units = F.when(cp < 0x10000, bmp).otherwise(F.concat(hi, lo))
    return F.decode(F.unhex(units), "UTF-16BE")


# UCHAR first so \uXXXX wins over the pair rule; \\ then still pairs
# before the run rule, so "\\u0041" stays a literal backslash + text
_ESCAPE_TOKEN_RE = (r"(\\U[0-9A-Fa-f]{8}|\\u[0-9A-Fa-f]{4}"
                    r"|\\.|[^\\]+)")


def _unescape_literal(col):
    """Single left-to-right pass, order-safe: tokenize into UCHAR
    escapes (§2.4 UCHAR, \\uXXXX / \\UXXXXXXXX), escape PAIRS, or
    backslash-free runs (the literal grammar guarantees backslashes
    are paired), decode each token, rejoin. Chained whole-string
    replaces would rewrite the output of earlier rules (e.g.
    ``\\\\n`` — an escaped backslash then 'n' — must NOT become a
    newline, and ``\\\\u0041`` must NOT become 'A')."""
    toks = F.regexp_extract_all(col, F.lit(_ESCAPE_TOKEN_RE), 1)
    return F.array_join(
        F.transform(toks, lambda t: F.when(t == r"\n", F.lit("\n"))
                    .when(t == r"\r", F.lit("\r"))
                    .when(t == r"\t", F.lit("\t"))
                    .when(t == r'\"', F.lit('"'))
                    .when(t == "\\\\", F.lit("\\"))
                    .when(t.rlike(r"^\\[uU]"), _uchar_to_str(t))
                    .otherwise(t)), "")


def to_ntriples_lines(triples: DataFrame, base_iri: str = DEFAULT_BASE,
                      literal_objects: bool = False) -> DataFrame:
    """(subj, pred, obj) → one-column ``value`` DataFrame of N-Triples
    lines. ``literal_objects=True`` writes objects as plain literals
    (entity-to-string edges); default writes them as IRIs."""
    obj = (F.concat(F.lit('"'), _escape_literal(F.col("obj")), F.lit('"'))
           if literal_objects
           else F.concat(F.lit("<"), _encode_iri(F.col("obj"), base_iri),
                         F.lit(">")))
    return triples.select(
        F.concat(
            F.lit("<"), _encode_iri(F.col("subj"), base_iri), F.lit(">"),
            F.lit(" "),
            F.lit("<"), _encode_iri(F.col("pred"), base_iri), F.lit(">"),
            F.lit(" "), obj, F.lit(" .")).alias("value"))


def write_ntriples(triples: DataFrame, path: str,
                   base_iri: str = DEFAULT_BASE,
                   literal_objects: bool = False) -> None:
    """Sink the canonical triples table as ``<path>/*.nt`` text parts."""
    (to_ntriples_lines(triples, base_iri, literal_objects)
     .write.mode("overwrite").text(path))


def read_ntriples(spark: SparkSession, path: str,
                  base_iri: str = DEFAULT_BASE) -> DataFrame:
    """``<path>`` of N-Triples text → (subj, pred, obj). Blank lines
    and ``#`` comments are skipped; malformed lines raise (fail-fast —
    a corrupt interchange file should not silently drop triples)."""
    lines = (spark.read.text(path)
             .filter(F.trim("value") != "")
             .filter(~F.trim(F.col("value")).startswith("#")))
    m = lines.select(
        F.col("value"),
        F.regexp_extract("value", _LINE_RE, 1).alias("_s"),
        F.regexp_extract("value", _LINE_RE, 2).alias("_p"),
        F.regexp_extract("value", _LINE_RE, 3).alias("_o_iri"),
        F.regexp_extract("value", _LINE_RE, 4).alias("_o_lit"),
        F.col("value").rlike(_LINE_RE).alias("_ok"),
        # a quoted-literal object leaves group 3 empty AND group 4 may
        # legitimately be empty (""), so carry the shape explicitly
        F.col("value").rlike(r'"((?:[^"\\]|\\.)*)" \.\s*$').alias("_is_lit"))
    bad = m.filter(~F.col("_ok"))
    if not bad.isEmpty():
        sample = [r["value"] for r in bad.limit(3).collect()]
        raise ValueError(f"malformed N-Triples line(s), e.g. {sample!r}")
    return m.select(
        _decode_iri(F.col("_s"), base_iri).alias("subj"),
        _decode_iri(F.col("_p"), base_iri).alias("pred"),
        F.when(F.col("_is_lit"), _unescape_literal(F.col("_o_lit")))
        .otherwise(_decode_iri(F.col("_o_iri"), base_iri)).alias("obj"))
