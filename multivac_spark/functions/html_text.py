"""HTML → text extraction (the per-url byte-identical invariant).

Reference behavior (src/data/process.py:124-133):

    soup = bs(raw)
    try:    text = ' '.join(soup.find('article').get_text().split())
    except AttributeError: text = None

i.e. *all* text nodes inside the first ``<article>`` element, in document
order, whitespace-normalized to single spaces; ``None`` when the page has
no ``<article>``. BeautifulSoup is not available in this environment, so
the implementation is a stdlib ``html.parser`` state machine with the
same semantics (entity refs unescaped, script/style text included just as
``get_text()`` includes them — our corpus has none).

Spark side: an Arrow-batched ``mapInPandas`` stage over ``html BINARY``
batches. No per-row Python at the DataFrame level; the inner loop is a
single C-accelerated HTMLParser pass per document.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

import pandas as pd

# void elements never push onto the open-element stack
_VOID = frozenset({"area", "base", "br", "col", "embed", "hr", "img",
                   "input", "link", "meta", "param", "source", "track",
                   "wbr"})


class _ArticleText(HTMLParser):
    """Collect character data inside the first <article> element."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.depth = 0          # nesting depth of <article> elements
        self.seen = False       # a complete <article> was closed
        self.chunks: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "article" and not self.seen:
            self.depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag == "article" and self.depth > 0:
            self.depth -= 1
            if self.depth == 0:
                self.seen = True

    def handle_data(self, data: str) -> None:
        if self.depth > 0:
            self.chunks.append(data)


def extract_article_text(html: bytes | str | None) -> str | None:
    """Pure function: html bytes → normalized article text or None."""
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _ArticleText()
    try:
        p.feed(html)
        p.close()
    except Exception:
        return None
    if not p.chunks and not p.seen and p.depth == 0:
        return None
    return " ".join("".join(p.chunks).split())


def extract_text_stage(df, html_col: str = "html", out_col: str = "text"):
    """documents(url, warc_ts, html, text, lang) → same schema with
    ``text`` filled. mapInPandas keeps the html bytes off the JVM heap
    once parsed and lets Arrow batch the transfer.

    A pre-populated (non-NULL) ``text`` is kept as-is — re-extraction
    would discard upstream-supplied text and redo work; this matches
    ``fused_sentences_stage``'s semantics exactly (parity-pinned in
    test_fused_parity.py with a non-null-text row)."""
    schema = df.schema
    cols = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                t if t is not None else extract_article_text(h)
                for t, h in zip(pdf[out_col], pdf[html_col])]
            yield pdf[cols]

    return df.mapInPandas(run, schema=df.schema)
