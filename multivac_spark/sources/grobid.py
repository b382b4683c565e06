"""GROBID client + TEI XML field extraction — the ``extract_text.py``
twin (grobid_client.process/process_pdf, extract_text.py:55-199).

The reference POSTs each PDF to ``http://{server}:{port}/api/{service}``
with ``Accept: text/plain``, sleeps and retries on 503 (server busy),
and writes the returned TEI XML next to the PDF. This twin keeps the
same protocol on stdlib ``urllib`` (executor-safe, no requests/grobid
package) and adds the TEI → fields step the reference leaves to
downstream consumers: title, abstract, body paragraphs, references.

GROBID itself is an external Java service; tests drive the client
against an in-process ``http.server`` stub speaking the same protocol
(multipart/form-data in, TEI out, 503-then-200 retry path), and the
TEI extractor against canned GROBID-shaped TEI documents.
"""

from __future__ import annotations

import time
import urllib.error
import urllib.request
import uuid
import xml.etree.ElementTree as ET

TEI_NS = "{http://www.tei-c.org/ns/1.0}"

DEFAULT_SERVICE = "processFulltextDocument"


class GrobidClient:
    """Minimal twin of the reference's grobid_client (ApiClient
    subclass): one PDF in → TEI XML out."""

    def __init__(self, server: str = "localhost", port: str = "8070",
                 sleep_time: float = 5.0, max_retries: int = 3):
        self.base = f"http://{server}" + (f":{port}" if port else "")
        self.sleep_time = sleep_time
        self.max_retries = max_retries

    def process_pdf(self, pdf_bytes: bytes,
                    service: str = DEFAULT_SERVICE,
                    consolidate_header: bool = False) -> str:
        """POST a PDF, return TEI XML; 503 → sleep + retry
        (extract_text.py:180-199 semantics)."""
        url = f"{self.base}/api/{service}"
        boundary = uuid.uuid4().hex
        fields = []
        if consolidate_header:
            fields.append(("consolidateHeader", "1"))
        body = bytearray()
        for k, v in fields:
            body += (f"--{boundary}\r\nContent-Disposition: form-data; "
                     f"name=\"{k}\"\r\n\r\n{v}\r\n").encode()
        body += (f"--{boundary}\r\nContent-Disposition: form-data; "
                 f"name=\"input\"; filename=\"input.pdf\"\r\n"
                 f"Content-Type: application/pdf\r\n\r\n").encode()
        body += pdf_bytes + f"\r\n--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            url, data=bytes(body), method="POST",
            headers={"Accept": "text/plain",
                     "Content-Type":
                     f"multipart/form-data; boundary={boundary}"})
        for attempt in range(self.max_retries + 1):
            try:
                with urllib.request.urlopen(req, timeout=60) as resp:
                    return resp.read().decode("utf-8")
            except urllib.error.HTTPError as e:
                if e.code == 503 and attempt < self.max_retries:
                    time.sleep(self.sleep_time)
                    continue
                raise
        raise RuntimeError("unreachable")


def tei_to_fields(tei_xml: str | bytes) -> dict:
    """GROBID TEI → {title, abstract, body_paragraphs, references,
    text}; ``text`` is the paragraph join in the same
    whitespace-normalized form as the other extractors."""
    root = ET.fromstring(tei_xml)
    title_el = root.find(f".//{TEI_NS}titleStmt/{TEI_NS}title")
    abstract_el = root.find(f".//{TEI_NS}abstract")
    body_el = root.find(f".//{TEI_NS}body")
    paras = ([ "".join(p.itertext()) for p in body_el.iter(f"{TEI_NS}p")]
             if body_el is not None else [])
    refs = []
    for bibl in root.iter(f"{TEI_NS}biblStruct"):
        t = bibl.find(f".//{TEI_NS}title")
        if t is not None and (t.text or "").strip():
            refs.append(t.text.strip())
    return {
        "title": ("".join(title_el.itertext()).strip()
                  if title_el is not None else ""),
        "abstract": (" ".join("".join(abstract_el.itertext()).split())
                     if abstract_el is not None else ""),
        "body_paragraphs": paras,
        "references": refs,
        "text": " ".join(" ".join(paras).split()),
    }


def tei_fields_stage(df, tei_col: str = "tei", id_col: str = "doc_id"):
    """(id, tei STRING) → (id, title, abstract, text, n_refs) —
    Arrow-batched TEI field extraction with per-row isolation."""
    from typing import Iterator

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {id_col: [], "title": [], "abstract": [],
                   "text": [], "n_refs": []}
            for pid, tei in zip(pdf[id_col], pdf[tei_col]):
                try:
                    f = tei_to_fields(tei)
                    row = (f["title"], f["abstract"], f["text"],
                           len(f["references"]))
                except ET.ParseError:
                    row = (None, None, None, None)
                out[id_col].append(pid)
                out["title"].append(row[0])
                out["abstract"].append(row[1])
                out["text"].append(row[2])
                out["n_refs"].append(row[3])
            yield pd.DataFrame(out)

    return df.mapInPandas(
        run, schema=(f"{id_col} long, title string, abstract string, "
                     "text string, n_refs int"))
