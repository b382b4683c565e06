"""LaTeX equation extraction + tagging.

Reference behavior (src/data/equationparsing.py):
* ``extract_and_replace_latex(doc)`` (:31-42) — find ``$$..$$`` /
  ``\\(..\\)`` blocks, substitute ``Ltxqtn[a-z]{8}`` placeholder tags,
  keep a tag→latex map (global LATEXMAP).
* tags are ``random.choices`` in the reference (:66-77) — the rebuild
  derives them from a hash of the equation text so runs are
  reproducible (SURVEY.md §2.3 determinism note).

The sympy parse → dependency-tuple step (equationparsing.py:80-295) is
an optional phase-2 kernel (sympy import-gated); the extraction/tagging
plumbing here is the load-bearing part for text pipelines.
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterator

import pandas as pd

RE_LATEX_BLOCK = re.compile(r"\$\$(.+?)\$\$|\\\((.+?)\\\)", re.DOTALL)

EQUATIONS_SCHEMA = ("url string, text_tagged string, "
                    "equations array<struct<tag:string, latex:string>>")


def deterministic_tag(latex: str) -> str:
    """Ltxqtn + 8 lowercase letters derived from the equation content
    (hash-based stand-in for random.choices, equationparsing.py:66-77)."""
    digest = hashlib.sha256(latex.encode()).digest()
    letters = "".join(chr(ord("a") + b % 26) for b in digest[:8])
    return "Ltxqtn" + letters


def extract_and_replace_latex(doc: str) -> tuple[str, list[tuple[str, str]]]:
    """→ (text with tags substituted, [(tag, latex), ...])."""
    eqs: list[tuple[str, str]] = []

    def sub(m: re.Match) -> str:
        latex = (m.group(1) or m.group(2) or "").strip()
        tag = deterministic_tag(latex)
        eqs.append((tag, latex))
        return " " + tag + " "

    tagged = RE_LATEX_BLOCK.sub(sub, doc)
    return tagged, eqs


def extract_equations_stage(df, text_col: str = "text"):
    """(url, …, text) → (url, text_tagged, equations). Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, tagged, eqs = [], [], []
            for url, text in zip(pdf["url"], pdf[text_col]):
                if text is None:
                    continue
                t, e = extract_and_replace_latex(text)
                urls.append(url)
                tagged.append(t)
                eqs.append([{"tag": tag, "latex": lx} for tag, lx in e])
            yield pd.DataFrame(
                {"url": pd.Series(urls, dtype=object),
                 "text_tagged": pd.Series(tagged, dtype=object),
                 # dtype=object keeps Arrow from routing the nested
                 # list<struct> column through the numpy converter
                 "equations": pd.Series(eqs, dtype=object)})

    return df.select("url", text_col).mapInPandas(
        run, schema=EQUATIONS_SCHEMA)
