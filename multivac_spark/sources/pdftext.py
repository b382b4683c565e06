"""PDF → text extraction — the ``parse_pdf`` twin (process.py:136-154).

The reference opens each arXiv PDF with ``slate.PDF`` (PDFMiner), joins
the pages with whitespace normalization, then slices
``split(' Abstract ')[-1].split(' Acknowledgments ')[0]
.split(' ∗ ∗ ∗ ')[0].strip()`` and returns None on any failure. This
twin keeps that post-processing chain byte-exact
(``postprocess_pdf_text``) and replaces the PDFMiner dependency with a
pure-Python extractor suitable for executors:

* content streams are located by ``stream``/``endstream`` framing with
  their object dictionaries;
* ``/FlateDecode`` streams inflate via stdlib ``zlib`` (the standard
  text-stream codec); raw streams pass through; other codecs
  (DCT/JPX/CCITT — image codecs) are skipped like PDFMiner skips
  non-text content;
* text is read from ``BT``…``ET`` blocks: literal ``(…)`` strings
  (with escape and octal handling) and hex ``<…>`` strings under the
  ``Tj``/``TJ``/``'``/``"`` operators, with line operators
  (``Td``/``TD``/``T*``) contributing separators.

Scope (documented): pages are emitted in document object order (the
common case for generated PDFs; full /Pages-tree ordering is a
deliberate non-goal), and glyphs are assumed Latin-1/ASCII (no
ToUnicode CMaps — embedded-subset fonts decode as garbage in PDFMiner
without a CMap too). Encrypted PDFs return None, matching the
reference's blanket ``except: text = None``.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.DOTALL)
_TEXT_OPS_RE = re.compile(
    rb"\((?:\\.|[^\\()])*\)\s*(?:Tj|')"        # (str) Tj   (str) '
    rb"|\((?:\\.|[^\\()])*\)\s*\"?"
    rb"|<[0-9A-Fa-f\s]*>\s*Tj"
    rb"|\[(?:[^\]\\]|\\.)*\]\s*TJ"
    rb"|T\*|TD|Td")

_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


def _decode_literal(body: bytes) -> bytes:
    """PDF literal-string body (inside parens) → bytes, handling
    ``\\``-escapes and 1-3 digit octal codes."""
    out = bytearray()
    i, n = 0, len(body)
    while i < n:
        c = body[i:i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = body[i + 1:i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            m = re.match(rb"[0-7]{1,3}", body[i + 1:i + 4])
            if m:
                out.append(int(m.group(), 8) & 0xFF)
                i += 1 + len(m.group())
                continue
            i += 1  # line continuation / unknown escape: drop backslash
            continue
        out += c
        i += 1
    return bytes(out)


def _decode_hex(body: bytes) -> bytes:
    h = re.sub(rb"\s", b"", body)
    if len(h) % 2:
        h += b"0"
    try:
        return bytes.fromhex(h.decode("ascii"))
    except ValueError:
        return b""


def _stream_text(data: bytes) -> str:
    """One decoded content stream → its text (BT/ET blocks only)."""
    parts: list[str] = []
    for bt in re.finditer(rb"BT(.*?)ET", data, re.DOTALL):
        block = bt.group(1)
        for m in _TEXT_OPS_RE.finditer(block):
            tok = m.group()
            if tok in (b"T*", b"TD", b"Td"):
                parts.append("\n")
            elif tok.startswith(b"("):
                body = tok[1:tok.rindex(b")")]
                parts.append(_decode_literal(body).decode("latin-1"))
            elif tok.startswith(b"<"):
                body = tok[1:tok.index(b">")]
                parts.append(_decode_hex(body).decode("latin-1"))
            elif tok.startswith(b"["):
                # TJ array: concatenate string elements, skip kern numbers
                arr = tok[1:tok.rindex(b"]")]
                for s in re.finditer(
                        rb"\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>", arr):
                    st = s.group()
                    if st.startswith(b"("):
                        parts.append(
                            _decode_literal(st[1:-1]).decode("latin-1"))
                    else:
                        parts.append(_decode_hex(st[1:-1]).decode("latin-1"))
        parts.append("\n")
    return "".join(parts)


def pdf_pages_text(data: bytes) -> list[str]:
    """PDF bytes → per-content-stream text chunks (document order)."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF")
    if b"/Encrypt" in data[:2048] or b"/Encrypt" in data[-2048:]:
        raise ValueError("encrypted PDF")
    pages = []
    for m in _STREAM_RE.finditer(data):
        hdr = m.group(1)
        start = m.end()
        end = data.find(b"endstream", start)
        if end < 0:
            continue
        raw = data[start:end].rstrip(b"\r\n")
        if b"/FlateDecode" in hdr:
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                continue
        elif b"/Filter" in hdr:
            continue  # image/other codec stream — not text
        if b"BT" not in raw:
            continue
        txt = _stream_text(raw)
        if txt.strip():
            pages.append(txt)
    return pages


def postprocess_pdf_text(pages: list[str]) -> str:
    """The reference's exact page-join + slicing chain
    (process.py:142-148)."""
    doc = " ".join(" ".join(x.split()) for x in pages)
    return (doc.split(" Abstract ")[-1]
            .split(" Acknowledgments ")[0]
            .split(" ∗ ∗ ∗ ")[0]
            .strip())


def pdf_to_text(data: bytes) -> str | None:
    """Full parse_pdf twin: None on any failure (the reference's
    blanket except)."""
    try:
        pages = pdf_pages_text(data)
        if not pages:
            return None
        return postprocess_pdf_text(pages)
    except Exception:
        return None


# --------------------------------------------------------------------------
# Spark stage
# --------------------------------------------------------------------------

def pdf_text_stage(df, pdf_col: str = "pdf", out_col: str = "text"):
    """documents(…, pdf BINARY) → + text (NULL on undecodable rows,
    per-row failure isolation like functions/multimodal.py)."""
    from typing import Iterator

    import pandas as pd

    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = [
                pdf_to_text(bytes(b)) if b is not None else None
                for b in pdf[pdf_col]]
            yield pdf

    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} string"])
    return df.mapInPandas(run, schema=out_schema)


# --------------------------------------------------------------------------
# deterministic PDF writer (tests/bench corpus — NOT part of extraction)
# --------------------------------------------------------------------------

def make_pdf(pages: list[str], compress: bool = True) -> bytes:
    """Minimal valid single-font PDF with one content stream per page —
    the synthetic stand-in for arXiv PDFs (same role as corpus.py's
    HTML generator). Flate-compressed by default, matching real text
    PDFs."""
    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    objs: list[bytes] = []
    n_pages = len(pages)
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
                .encode())
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i, text in enumerate(pages):
        lines = text.split("\n")
        ops = ["BT /F1 11 Tf 72 720 Td 13 TL"]
        for j, ln in enumerate(lines):
            if j:
                ops.append("T*")
            ops.append(f"({esc(ln)}) Tj")
        ops.append("ET")
        content = " ".join(ops).encode("latin-1")
        filt = b""
        if compress:
            content = zlib.compress(content)
            filt = b"/Filter /FlateDecode "
        objs.append(f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                    f"/Resources << /Font << /F1 3 0 R >> >> "
                    f"/Contents {5 + 2 * i} 0 R >>".encode())
        objs.append(b"<< " + filt
                    + f"/Length {len(content)} >>\nstream\n".encode()
                    + content + b"\nendstream")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, o in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + o + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n".encode())
    return bytes(out)
