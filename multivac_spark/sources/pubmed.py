"""PubMed/PMC JATS XML → metadata + text — the ``parse_pubmed`` twin
(process.py:157-162).

The reference calls ``pubmed_parser.parse_pubmed_xml`` (metadata) and
``parse_pubmed_paragraph(all_paragraph=True)`` (every ``<p>`` under
``<body>``), then joins with whitespace normalization:
``' '.join(' '.join(p['text'] for p in paras).split())``. This twin
reproduces that pipeline on stdlib ``xml.etree`` — JATS is plain XML,
no external parser package needed on executors.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET


def _text_of(el) -> str:
    """All descendant text, like pubmed_parser's stringify_children."""
    return "".join(el.itertext())


def _first(root, path: str) -> str | None:
    el = root.find(path)
    return _text_of(el).strip() if el is not None else None


def parse_pubmed_meta(xml: str | bytes) -> dict:
    """parse_pubmed_xml twin: the metadata fields the reference keeps
    (title/abstract/journal/ids; authors as 'surname firstname')."""
    root = ET.fromstring(xml)
    ids = {el.get("pub-id-type"): (el.text or "").strip()
           for el in root.iter("article-id")}
    abstract_el = root.find(".//article-meta/abstract")
    authors = []
    for c in root.iter("contrib"):
        if c.get("contrib-type", "author") != "author":
            continue
        sur = _first(c, ".//surname") or ""
        giv = _first(c, ".//given-names") or ""
        authors.append(f"{sur} {giv}".strip())
    return {
        "full_title": _first(root, ".//title-group/article-title") or "",
        "abstract": (" ".join(_text_of(abstract_el).split())
                     if abstract_el is not None else ""),
        "journal": _first(root, ".//journal-title") or "",
        "pmid": ids.get("pmid", ""),
        "pmc": ids.get("pmc", ""),
        "doi": ids.get("doi", ""),
        "author_list": authors,
    }


def parse_pubmed_paragraphs(xml: str | bytes) -> list[str]:
    """parse_pubmed_paragraph(all_paragraph=True) twin: the text of
    every ``<p>`` under ``<body>``, document order."""
    root = ET.fromstring(xml)
    body = root.find(".//body")
    if body is None:
        return []
    return [_text_of(p) for p in body.iter("p")]


def parse_pubmed_text(xml: str | bytes) -> str:
    """The reference's exact join (process.py:160-162)."""
    paras = parse_pubmed_paragraphs(xml)
    return " ".join(" ".join(paras).split())


def pubmed_text_stage(df, xml_col: str = "xml", id_col: str = "pmid"):
    """articles(pmid, xml STRING) → (pmid, full_title, abstract,
    journal, doi, text) — Arrow-batched, per-row failure isolation
    (malformed XML → NULL row fields, like the reference's skip)."""
    from typing import Iterator

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {id_col: [], "full_title": [], "abstract": [],
                   "journal": [], "doi": [], "text": []}
            for pid, xml in zip(pdf[id_col], pdf[xml_col]):
                try:
                    meta = parse_pubmed_meta(xml)
                    text = parse_pubmed_text(xml)
                except ET.ParseError:
                    meta, text = {"full_title": None, "abstract": None,
                                  "journal": None, "doi": None}, None
                out[id_col].append(pid)
                out["full_title"].append(meta["full_title"])
                out["abstract"].append(meta["abstract"])
                out["journal"].append(meta["journal"])
                out["doi"].append(meta["doi"])
                out["text"].append(text)
            yield pd.DataFrame(out)

    return df.mapInPandas(
        run, schema=(f"{id_col} string, full_title string, "
                     "abstract string, journal string, doi string, "
                     "text string"))
