"""PDF → text extraction — the ``parse_pdf`` twin (process.py:136-154).

The reference opens each arXiv PDF with ``slate.PDF`` (PDFMiner), joins
the pages with whitespace normalization, then slices
``split(' Abstract ')[-1].split(' Acknowledgments ')[0]
.split(' ∗ ∗ ∗ ')[0].strip()`` and returns None on any failure. This
twin keeps that post-processing chain byte-exact
(``postprocess_pdf_text``) and replaces the PDFMiner dependency with a
pure-Python extractor suitable for executors:

* objects are parsed into an object table and pages are emitted in
  **/Root → /Pages → /Kids tree order** (like PDFMiner's page walk),
  with a document-order stream scan as fallback for PDFs whose tree
  cannot be resolved;
* stream bodies are delimited by the dict's ``/Length`` entry exactly
  (PDF spec §7.3.8; indirect ``/Length n 0 R`` is resolved through the
  object table), falling back to ``endstream`` search with AT MOST one
  EOL stripped — never ``rstrip`` (Flate output legitimately ends in
  0x0A/0x0D bytes);
* ``/FlateDecode`` streams inflate via stdlib ``zlib`` (the standard
  text-stream codec); raw streams pass through; other codecs
  (DCT/JPX/CCITT — image codecs) are skipped like PDFMiner skips
  non-text content;
* text is read from ``BT``…``ET`` blocks: literal ``(…)`` strings
  (with escape and octal handling) and hex ``<…>`` strings under the
  ``Tj``/``TJ``/``'``/``"`` operators, with line operators
  (``Td``/``TD``/``T*``) contributing separators;
* font encodings are honored per ``Tf`` font selection:
  ``/WinAnsiEncoding`` (cp1252), ``/MacRomanEncoding`` (mac-roman),
  ``/Identity-H`` (2-byte big-endian codes), default Latin-1/Standard
  — and **/ToUnicode CMaps** (bfchar + bfrange scalar/array forms,
  codespace-derived code width), so embedded-subset fonts decode to
  real text, same as PDFMiner's CMap path. Subset fonts WITHOUT a
  ToUnicode CMap remain undecodable — for every extractor.

Encrypted PDFs raise, so ``pdf_to_text`` returns None, matching the
reference's blanket ``except: text = None``.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.DOTALL)
_OBJ_START_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(\s+\d+\s+R)?")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_TEXT_OPS_RE = re.compile(
    rb"\((?:\\.|[^\\()])*\)\s*(?:Tj|'|\")"     # (str) Tj  (str) '  aw ac (str) "
    rb"|<[0-9A-Fa-f\s]*>\s*Tj"
    rb"|\[(?:\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>|[^\]])*\]\s*TJ"
    rb"|/[A-Za-z][A-Za-z0-9]*\s+[0-9.]+\s+Tf"  # font selection
    rb"|T\*|TD|Td|BT|ET"
    rb"|\((?:\\.|[^\\()])*\)"                  # bare string: consume, no emit
    rb"|<[0-9A-Fa-f\s]*>")                     # bare hex: consume, no emit

_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}

# /Encoding name → decode tag used by _decode_bytes
_ENCODINGS = {b"/WinAnsiEncoding": "winansi",
              b"/MacRomanEncoding": "macroman",
              b"/Identity-H": "identity"}

_CMAP_BFCHAR_RE = re.compile(
    rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_CMAP_BFRANGE_RE = re.compile(
    rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_CMAP_CODESPACE_RE = re.compile(
    rb"begincodespacerange\s*<([0-9A-Fa-f]+)>", re.DOTALL)
_HEXPAIR_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_HEXTRIPLE_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
    rb"(<[0-9A-Fa-f]+>|\[(?:\s*<[0-9A-Fa-f]+>)*\s*\])")


def _uni(hexstr: bytes) -> str:
    """CMap destination hex → str (UTF-16BE code units, possibly
    multi-char for ligature expansions)."""
    b = bytes.fromhex(hexstr.decode("ascii"))
    if len(b) % 2:
        b = b"\x00" + b
    return b.decode("utf-16-be", "replace")


def parse_tounicode_cmap(data: bytes) -> tuple[dict[int, str], int]:
    """ToUnicode CMap stream → ({code: text}, code byte-width).

    Handles ``bfchar`` pairs, ``bfrange`` with scalar or array
    destinations, and reads the code width from the codespace range
    (2-byte is the subset-font norm). Public-spec format (PDF 32000
    §9.10.3 / Adobe CMap spec) — the piece PDFMiner needs to decode
    embedded-subset fonts, previously a documented scope limit."""
    width = 2
    m = _CMAP_CODESPACE_RE.search(data)
    if m:
        width = max(1, len(m.group(1)) // 2)
    table: dict[int, str] = {}
    for block in _CMAP_BFRANGE_RE.finditer(data):
        for r in _HEXTRIPLE_RE.finditer(block.group(1)):
            lo, hi = int(r.group(1), 16), int(r.group(2), 16)
            dst = r.group(3)
            if dst.startswith(b"["):
                dsts = re.findall(rb"<([0-9A-Fa-f]+)>", dst)
                for i, d in enumerate(dsts):
                    if lo + i <= hi:
                        table[lo + i] = _uni(d)
            else:
                base_hex = dst[1:-1]
                if len(base_hex) <= 4:
                    base = int(base_hex, 16)
                    for c in range(lo, hi + 1):
                        table[c] = chr(base + (c - lo))
                else:
                    # Multi-unit destination (e.g. a surrogate pair for
                    # a non-BMP glyph): per PDF 32000 §9.10.3 / Adobe
                    # CMap spec the LAST 16-bit code unit is incremented
                    # across the range, the leading units stay fixed.
                    h = base_hex.decode("ascii")
                    h = h.zfill((len(h) + 3) // 4 * 4)
                    units = [int(h[i:i + 4], 16)
                             for i in range(0, len(h), 4)]
                    for c in range(lo, hi + 1):
                        u = units[:-1] + [(units[-1] + (c - lo)) & 0xFFFF]
                        table[c] = b"".join(
                            x.to_bytes(2, "big") for x in u
                        ).decode("utf-16-be", "replace")
    for block in _CMAP_BFCHAR_RE.finditer(data):
        for p in _HEXPAIR_RE.finditer(block.group(1)):
            table[int(p.group(1), 16)] = _uni(p.group(2))
    return table, width


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


def _decode_hexbody(body: bytes) -> bytes:
    h = re.sub(rb"\s", b"", body)
    if len(h) % 2:
        h += b"0"
    try:
        return bytes.fromhex(h.decode("ascii"))
    except ValueError:
        return b""


def _decode_bytes(b: bytes, enc) -> str:
    """Glyph bytes → str under a simple-font encoding tag or a
    ("cmap", table, width) ToUnicode mapping."""
    if isinstance(enc, tuple):
        _tag, table, width = enc
        if len(b) % width:
            b = b + b"\x00" * (width - len(b) % width)
        return "".join(
            table.get(int.from_bytes(b[i:i + width], "big"), "�")
            for i in range(0, len(b), width))
    if enc == "identity":
        # Identity-H: 2-byte big-endian character codes (CID == code).
        if len(b) % 2:
            b += b"\x00"
        return "".join(chr((b[i] << 8) | b[i + 1])
                       for i in range(0, len(b), 2))
    if enc == "winansi":
        return b.decode("cp1252", "replace")
    if enc == "macroman":
        return b.decode("mac_roman", "replace")
    return b.decode("latin-1")


def _stream_text(data: bytes, fonts: dict[bytes, object] | None = None
                 ) -> str:
    """One decoded content stream → its text (BT/ET blocks only).

    ``fonts`` maps resource font names (e.g. b"F1") to encoding tags;
    the current ``Tf`` selection switches string decoding accordingly.

    The whole stream is tokenized in one pass (strings/arrays are
    atomic tokens), tracking BT/ET as state — so literal ``ET`` bytes
    INSIDE a string can never truncate a text block, and strings not
    bound to a text-show operator are consumed without being emitted."""
    fonts = fonts or {}
    enc = "latin1"
    in_text = False
    any_block = False
    parts: list[str] = []
    for m in _TEXT_OPS_RE.finditer(data):
        tok = m.group()
        if tok == b"BT":
            in_text = True
            any_block = True
            continue
        if tok == b"ET":
            if in_text:
                parts.append("\n")
            in_text = False
            continue
        if tok.endswith(b"Tf"):
            name = tok[1:].split(None, 1)[0]
            enc = fonts.get(name, "latin1")
            continue
        if not in_text:
            continue
        if tok in (b"T*", b"TD", b"Td"):
            parts.append("\n")
        elif tok.startswith(b"(") and tok.endswith((b"Tj", b"'", b"\"")):
            body = tok[1:tok.rindex(b")")]
            parts.append(_decode_bytes(_decode_literal(body), enc))
        elif tok.startswith(b"<") and tok.endswith(b"Tj"):
            body = tok[1:tok.index(b">")]
            parts.append(_decode_bytes(_decode_hexbody(body), enc))
        elif tok.startswith(b"["):
            # TJ array: concatenate string elements, skip kern numbers
            arr = tok[1:tok.rindex(b"]")]
            for s in re.finditer(
                    rb"\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>", arr):
                st = s.group()
                if st.startswith(b"("):
                    parts.append(
                        _decode_bytes(_decode_literal(st[1:-1]), enc))
                else:
                    parts.append(
                        _decode_bytes(_decode_hexbody(st[1:-1]), enc))
    if not any_block:
        return ""
    return "".join(parts)


# --------------------------------------------------------------------------
# stream framing (PDF spec §7.3.8)
# --------------------------------------------------------------------------

def _frame_stream(data: bytes, hdr: bytes, start: int,
                  objects: dict[int, tuple[bytes, int]] | None = None,
                  ) -> bytes | None:
    """Exact stream body starting at ``start``.

    Honors a direct ``/Length N`` (or indirect ``/Length n 0 R``
    resolved via ``objects``: obj-num → (body, stream_start)); when
    unavailable or inconsistent, falls back to ``endstream`` search
    stripping AT MOST ONE trailing EOL — never ``rstrip``, which eats
    legitimate 0x0A/0x0D bytes of FlateDecode output (the round-3
    silent-page-drop bug)."""
    m = _LENGTH_RE.search(hdr)
    if m:
        n = None
        if m.group(2) is None:
            n = int(m.group(1))
        elif objects is not None:
            ref = objects.get(int(m.group(1)))
            if ref is not None:
                lm = re.match(rb"\s*(\d+)", ref[0])
                if lm:
                    n = int(lm.group(1))
        if n is not None:
            body = data[start:start + n]
            # the spec requires EOL + 'endstream' right after the body
            tail = data[start + n:start + n + 16]
            if tail.lstrip(b"\r\n ").startswith(b"endstream"):
                return body
    end = data.find(b"endstream", start)
    if end < 0:
        return None
    raw = data[start:end]
    if raw.endswith(b"\r\n"):
        return raw[:-2]
    if raw.endswith((b"\n", b"\r")):
        return raw[:-1]
    return raw


def _inflate(hdr: bytes, raw: bytes) -> bytes | None:
    """Apply the stream filter: Flate inflates, no-filter passes
    through, image/other codecs → None (skipped, like PDFMiner)."""
    if b"/FlateDecode" in hdr:
        try:
            return zlib.decompress(raw)
        except zlib.error:
            return None
    if b"/Filter" in hdr:
        return None
    return raw


# --------------------------------------------------------------------------
# object table + /Pages tree walk
# --------------------------------------------------------------------------

def _scan_dict(data: bytes, i: int) -> tuple[bytes, int] | None:
    """Balanced ``<< … >>`` scan from index i (must point at '<<').
    Returns (dict bytes incl. delimiters, end index)."""
    if data[i:i + 2] != b"<<":
        return None
    depth, j, n = 0, i, len(data)
    while j < n - 1:
        two = data[j:j + 2]
        if two == b"<<":
            depth += 1
            j += 2
        elif two == b">>":
            depth -= 1
            j += 2
            if depth == 0:
                return data[i:j], j
        else:
            j += 1
    return None


def _parse_objects(data: bytes) -> dict[int, tuple[bytes, int]]:
    """Scan ``N G obj`` … ``endobj`` into {obj-num: (body-after-'obj',
    stream-body-start-or--1)}. Stream bodies are skipped using their
    own /Length when direct, so binary content never confuses the
    scanner; indirect lengths degrade to an endstream search."""
    objects: dict[int, tuple[bytes, int]] = {}
    pos = 0
    while True:
        m = _OBJ_START_RE.search(data, pos)
        if not m:
            break
        num = int(m.group(1))
        i = m.end()
        while i < len(data) and data[i:i + 1] in b" \t\r\n":
            i += 1
        stream_start = -1
        body_start = i
        d = _scan_dict(data, i)
        if d is not None:
            dict_bytes, j = d
            sm = re.match(rb"\s*stream\r?\n", data[j:j + 16])
            if sm:
                stream_start = j + sm.end()
                lm = _LENGTH_RE.search(dict_bytes)
                if lm and lm.group(2) is None:
                    skip = stream_start + int(lm.group(1))
                else:
                    skip = stream_start
                end = data.find(b"endstream", skip)
                j = end + len(b"endstream") if end >= 0 else len(data)
            endobj = data.find(b"endobj", j)
        else:
            endobj = data.find(b"endobj", i)
        if endobj < 0:
            endobj = len(data)
        objects[num] = (data[body_start:endobj], stream_start)
        pos = endobj + 6
    return objects


def _dict_of(objects: dict, num: int) -> bytes | None:
    o = objects.get(num)
    if o is None:
        return None
    d = _scan_dict(o[0], 0)
    return d[0] if d is not None else o[0]


def _name_ref(d: bytes, key: bytes) -> int | None:
    m = re.search(re.escape(key) + rb"\s+(\d+)\s+\d+\s+R", d)
    return int(m.group(1)) if m else None


def _object_stream(data: bytes, objects: dict, num: int) -> bytes | None:
    """Decoded stream body of object ``num`` (None if not a stream)."""
    o = objects.get(num)
    if o is None or o[1] < 0:
        return None
    d = _scan_dict(o[0], 0)
    hdr = d[0] if d else b""
    raw = _frame_stream(data, hdr, o[1], objects)
    if raw is None:
        return None
    return _inflate(hdr, raw)


def _page_fonts(objects: dict, page_dict: bytes,
                data: bytes = b"") -> dict[bytes, object]:
    """Resolve /Resources → /Font → per-name encoding: a /ToUnicode
    CMap when present (embedded-subset fonts), else the named
    /Encoding tag.  /Resources is an *inheritable* page attribute
    (PDF 32000 §7.7.3.4): when the page dict lacks it we walk up the
    /Parent chain of the /Pages tree, as PDFMiner does."""
    res: bytes | None = None
    node, depth = page_dict, 0
    while node is not None and depth <= 32:
        rm = re.search(rb"/Resources\s*", node)
        if rm:
            if node[rm.end():rm.end() + 2] == b"<<":
                d = _scan_dict(node, rm.end())
                res = d[0] if d else None
            else:
                ref = re.match(rb"(\d+)\s+\d+\s+R", node[rm.end():])
                res = _dict_of(objects, int(ref.group(1))) if ref else None
            break
        pm = re.search(rb"/Parent\s+(\d+)\s+\d+\s+R", node)
        node = _dict_of(objects, int(pm.group(1))) if pm else None
        depth += 1
    if not res:
        return {}
    fm = re.search(rb"/Font\s*", res)
    if not fm:
        return {}
    if res[fm.end():fm.end() + 2] == b"<<":
        d = _scan_dict(res, fm.end())
        fd = d[0] if d else None
    else:
        ref = re.match(rb"(\d+)\s+\d+\s+R", res[fm.end():])
        fd = _dict_of(objects, int(ref.group(1))) if ref else None
    if not fd:
        return {}
    fonts: dict[bytes, object] = {}
    for m in re.finditer(rb"/([A-Za-z][A-Za-z0-9]*)\s+(\d+)\s+\d+\s+R", fd):
        font_dict = _dict_of(objects, int(m.group(2)))
        if font_dict is None:
            continue
        tm = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", font_dict)
        if tm:
            cm = _object_stream(data, objects, int(tm.group(1)))
            if cm is not None:
                table, width = parse_tounicode_cmap(cm)
                if table:
                    fonts[m.group(1)] = ("cmap", table, width)
                    continue
        em = re.search(rb"/Encoding\s*(/[A-Za-z0-9\-]+)", font_dict)
        if em and em.group(1) in _ENCODINGS:
            fonts[m.group(1)] = _ENCODINGS[em.group(1)]
    return fonts


def _walk_pages(objects: dict, node: int,
                out: list[int], seen: set[int], depth: int = 0) -> None:
    if depth > 64 or node in seen:
        return
    seen.add(node)
    d = _dict_of(objects, node)
    if d is None:
        return
    if b"/Kids" in d:
        km = re.search(rb"/Kids\s*\[(.*?)\]", d, re.DOTALL)
        if km:
            for r in _REF_RE.finditer(km.group(1)):
                _walk_pages(objects, int(r.group(1)), out, seen, depth + 1)
    elif b"/Page" in d:
        out.append(node)


def _tree_pages_text(data: bytes,
                     objects: dict[int, tuple[bytes, int]]) -> list[str] | None:
    """Pages in /Root→/Pages→/Kids order, each page's /Contents streams
    concatenated and decoded under its font encodings. None when the
    tree cannot be resolved (→ caller falls back to document order)."""
    rm = None
    for rm in re.finditer(rb"/Root\s+(\d+)\s+\d+\s+R", data):
        pass
    if rm is None:
        return None
    catalog = _dict_of(objects, int(rm.group(1)))
    if catalog is None:
        return None
    pages_ref = _name_ref(catalog, b"/Pages")
    if pages_ref is None:
        return None
    page_nums: list[int] = []
    _walk_pages(objects, pages_ref, page_nums, set())
    if not page_nums:
        return None
    pages: list[str] = []
    for pnum in page_nums:
        pd = _dict_of(objects, pnum)
        if pd is None:
            continue
        cm = re.search(rb"/Contents\s*(\[[^\]]*\]|\d+\s+\d+\s+R)", pd)
        if not cm:
            continue
        refs = [int(r.group(1)) for r in _REF_RE.finditer(cm.group(1))]
        fonts = _page_fonts(objects, pd, data)
        chunks: list[str] = []
        for ref in refs:
            o = objects.get(ref)
            if o is None or o[1] < 0:
                continue
            body, stream_start = o
            d = _scan_dict(body, 0)
            hdr = d[0] if d else b""
            raw = _frame_stream(data, hdr,
                                stream_start, objects)
            if raw is None:
                continue
            dec = _inflate(hdr, raw)
            if dec is None or b"BT" not in dec:
                continue
            chunks.append(_stream_text(dec, fonts))
        txt = "".join(chunks)
        if txt.strip():
            pages.append(txt)
    return pages


def pdf_pages_text(data: bytes) -> list[str]:
    """PDF bytes → per-page text chunks in /Pages-tree order (falling
    back to document object order when the tree is unresolvable)."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF")
    if b"/Encrypt" in data[:2048] or b"/Encrypt" in data[-2048:]:
        raise ValueError("encrypted PDF")
    objects = _parse_objects(data)
    tree = _tree_pages_text(data, objects)
    if tree is not None:
        return tree
    # fallback: document-order stream scan (no page tree)
    pages = []
    for m in _STREAM_RE.finditer(data):
        hdr = m.group(1)
        raw = _frame_stream(data, hdr, m.end(), objects)
        if raw is None:
            continue
        dec = _inflate(hdr, raw)
        if dec is None or b"BT" not in dec:
            continue
        txt = _stream_text(dec)
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

def make_pdf(pages: list[str], compress: bool = True,
             encoding: str | None = None,
             shuffle_objects: bool = False,
             inherit_resources: bool = False) -> bytes:
    """Minimal valid single-font PDF with one content stream per page —
    the synthetic stand-in for arXiv PDFs (same role as corpus.py's
    HTML generator). Flate-compressed by default, matching real text
    PDFs.

    ``encoding``: None (Latin-1 literals), "winansi", "macroman"
    (cp1252/mac-roman literal strings + the matching /Encoding name),
    "identity" (Identity-H hex strings, 2-byte codes), or "subset" —
    an embedded-subset-style font: every distinct character gets a
    sequential 2-byte CID (1, 2, …) in first-appearance order and the
    font carries a /ToUnicode CMap stream (bfchar pairs) mapping CIDs
    back to text, exactly the case that decodes as garbage without
    CMap support.
    ``shuffle_objects``: write objects physically out of order
    (reverse) while keeping numbering — extraction must use the
    /Pages tree, not document order, to get page order right.
    ``inherit_resources``: hang /Resources on the /Pages tree node
    instead of each page (PDF 32000 §7.7.3.4 inheritable attribute) —
    extraction must walk /Parent to find the fonts."""
    def esc(b: bytes) -> bytes:
        return (b.replace(b"\\", rb"\\").replace(b"(", rb"\(")
                .replace(b")", rb"\)"))

    enc_name = {"winansi": b" /Encoding /WinAnsiEncoding",
                "macroman": b" /Encoding /MacRomanEncoding",
                "identity": b" /Encoding /Identity-H"}.get(encoding or "", b"")
    codec = {"winansi": "cp1252", "macroman": "mac_roman"}.get(encoding or "")

    cids: dict[str, int] = {}
    if encoding == "subset":
        for text in pages:
            for c in text.replace("\n", ""):
                cids.setdefault(c, len(cids) + 1)
        enc_name = b" /Encoding /Identity-H /ToUnicode 4 0 R"

    def show_op(ln: str) -> bytes:
        if encoding == "subset":
            h = "".join(f"{cids[c]:04X}" for c in ln)
            return b"<" + h.encode() + b"> Tj"
        if encoding == "identity":
            h = "".join(f"{ord(c):04X}" for c in ln)
            return b"<" + h.encode() + b"> Tj"
        raw = ln.encode(codec) if codec else ln.encode("latin-1")
        return b"(" + esc(raw) + b") Tj"

    objs: list[bytes] = []
    n_pages = len(pages)
    extra = 1 if encoding == "subset" else 0
    first_page_obj = 4 + extra
    kids = " ".join(f"{first_page_obj + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    res = "/Resources << /Font << /F1 3 0 R >> >> "
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} "
                f"{res if inherit_resources else ''}>>".encode())
    objs.append(b"<< /Type /Font /Subtype /Type0 /BaseFont /Subset+F"
                + enc_name + b" >>" if encoding == "subset" else
                b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
                + enc_name + b" >>")
    if encoding == "subset":
        bf = "\n".join(f"<{cid:04X}> <{ord(c):04X}>"
                       for c, cid in sorted(cids.items(),
                                            key=lambda kv: kv[1]))
        cmap = ("/CIDInit /ProcSet findresource begin\n"
                "begincmap\n"
                "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
                f"{len(cids)} beginbfchar\n{bf}\nendbfchar\n"
                "endcmap\nend").encode("latin-1")
        cmap_z = zlib.compress(cmap)
        objs.append(b"<< /Filter /FlateDecode /Length "
                    + str(len(cmap_z)).encode()
                    + b" >>\nstream\n" + cmap_z + b"\nendstream")
    for i, text in enumerate(pages):
        lines = text.split("\n")
        ops = [b"BT /F1 11 Tf 72 720 Td 13 TL"]
        for j, ln in enumerate(lines):
            if j:
                ops.append(b"T*")
            ops.append(show_op(ln))
        ops.append(b"ET")
        content = b" ".join(ops)
        filt = b""
        if compress:
            content = zlib.compress(content)
            filt = b"/Filter /FlateDecode "
        objs.append(f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                    f"{'' if inherit_resources else res}"
                    f"/Contents {first_page_obj + 1 + 2 * i} 0 R >>".encode())
        objs.append(b"<< " + filt
                    + f"/Length {len(content)} >>\nstream\n".encode()
                    + content + b"\nendstream")

    order = list(range(len(objs)))
    if shuffle_objects:
        order = order[::-1]
    out = bytearray(b"%PDF-1.4\n")
    offsets = {0: 0}
    for idx in order:
        offsets[idx + 1] = len(out)
        out += f"{idx + 1} 0 obj\n".encode() + objs[idx] + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for i in range(1, len(objs) + 1):
        out += f"{offsets[i]:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n".encode())
    return bytes(out)
