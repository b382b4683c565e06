"""LaTeX → dependency tuples (the reference's DIM 'D' channel),
sympy-free.

Reference behavior (src/data/equationparsing.py):
* ``find_parens`` (:45-63) — paren pairing over the srepr string;
* ``get_rel`` (:80-95) — governor → relation class
  (compare / combine / function / transform);
* ``gov_dep`` (:105-197) — recursive paren-matcher that turns a sympy
  ``srepr`` string into ((gov, i), (dep, j)) dependency pairs, with the
  Function-swallowing rule, the ", "-rfind child indexing, and the
  value-inclusion rule for Symbol/Integer/Float leaves;
* ``latexParsing`` (:200-295) — assembles (dep, pos, morph) token
  channels from the pairs.

The reference reaches srepr through sympy's antlr-backed
``parse_latex`` — unavailable here (antlr4 runtime not installed) and a
per-row external-parser dependency anyway. The rebuild replaces it with
``latex_to_srepr``: a deterministic recursive-descent parser over the
equation grammar (relations, + , explicit/implicit multiplication,
powers, \\frac, function application, greek/symbol/number atoms)
emitting srepr-shaped strings directly. Divergence (documented): sympy
canonicalizes argument order inside Add/Mul; this converter preserves
source order. ``gov_dep`` itself is parity-pinned against true sympy
sreprs in tests (sympy.srepr IS importable — only the latex frontend
is not).
"""

from __future__ import annotations

import re
from typing import Iterator

GREEK = ("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda "
         "mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega").split()
FUNCS = ("sin cos tan log ln exp sqrt").split()

_TOKEN = re.compile(
    r"\s*(?:(\\[a-zA-Z]+)|([A-Za-z])|(\d+\.\d+)|(\d+)|(.))")


def cleaned_latex(s: str) -> str:
    """Pre-clean (equationparsing.cleaned_latex, :17-28)."""
    s = s.replace("$$", "")
    s = re.sub(r"\\begin{array}{.*?}|\\end{array}"
               r"|\\begin{aligned}|\\end{aligned}", "", s)
    s = s.replace("&=&", "=")
    s = s.replace(r"\(", "(").replace(r"\)", ")")
    return s.strip()


class _Lexer:
    def __init__(self, s: str):
        self.toks: list[str] = []
        pos = 0
        while pos < len(s):
            m = _TOKEN.match(s, pos)
            if not m:
                break
            pos = m.end()
            t = next(g for g in m.groups() if g is not None)
            if t.strip():
                self.toks.append(t)
        self.k = 0

    def peek(self) -> str | None:
        return self.toks[self.k] if self.k < len(self.toks) else None

    def take(self) -> str | None:
        t = self.peek()
        if t is not None:
            self.k += 1
        return t


class LatexParseError(ValueError):
    pass


def latex_to_srepr(latex: str) -> str:
    """Deterministic LaTeX → srepr-shaped string for the supported
    equation grammar. Raises LatexParseError outside it (callers skip
    the equation, like the reference's try/except around parse_latex)."""
    lx = _Lexer(cleaned_latex(latex))
    out = _relation(lx)
    if lx.peek() is not None:
        raise LatexParseError(f"trailing input at token {lx.k}: {latex!r}")
    return out


_REL_HEADS = {"=": "Equality", "<": "StrictLessThan", ">": "StrictGreaterThan",
              r"\approx": "Approx", r"\leq": "LessThan", r"\geq": "GreaterThan"}


def _relation(lx: _Lexer) -> str:
    left = _additive(lx)
    t = lx.peek()
    if t in _REL_HEADS:
        lx.take()
        right = _additive(lx)
        return f"{_REL_HEADS[t]}({left}, {right})"
    return left


def _additive(lx: _Lexer) -> str:
    terms = [_multiplicative(lx)]
    while lx.peek() in ("+", "-"):
        op = lx.take()
        term = _multiplicative(lx)
        if op == "-":
            term = f"Mul(Integer(-1), {term})"
        terms.append(term)
    if len(terms) == 1:
        return terms[0]
    return "Add(" + ", ".join(terms) + ")"


_ATOM_STARTS = re.compile(r"[A-Za-z0-9(]|\\")


def _multiplicative(lx: _Lexer) -> str:
    factors = [_power(lx)]
    while True:
        t = lx.peek()
        if t in ("*", r"\cdot", r"\times"):
            lx.take()
            factors.append(_power(lx))
        elif t is not None and t not in _REL_HEADS and t not in ("+", "-", ")",
                                                                 "}", ",") \
                and _ATOM_STARTS.match(t):
            factors.append(_power(lx))  # implicit multiplication: 2 x y
        else:
            break
    if len(factors) == 1:
        return factors[0]
    return "Mul(" + ", ".join(factors) + ")"


def _power(lx: _Lexer) -> str:
    base = _atom(lx)
    if lx.peek() == "^":
        lx.take()
        exp = _atom(lx)
        return f"Pow({base}, {exp})"
    return base


def _group(lx: _Lexer, close: str) -> str:
    inner = _relation(lx)
    if lx.take() != close:
        raise LatexParseError(f"expected {close!r}")
    return inner


def _atom(lx: _Lexer) -> str:
    t = lx.take()
    if t is None:
        raise LatexParseError("unexpected end of input")
    if t == "(":
        return _group(lx, ")")
    if t == "{":
        return _group(lx, "}")
    if t == r"\frac":
        if lx.take() != "{":
            raise LatexParseError("frac numerator")
        num = _group(lx, "}")
        if lx.take() != "{":
            raise LatexParseError("frac denominator")
        den = _group(lx, "}")
        # sympy renders a/b as Mul(a, Pow(b, Integer(-1)))
        return f"Mul({num}, Pow({den}, Integer(-1)))"
    if re.fullmatch(r"\d+\.\d+", t):
        return f"Float('{t}')"
    if re.fullmatch(r"\d+", t):
        return f"Integer({t})"
    if t.startswith("\\"):
        name = t[1:]
        if name in FUNCS:
            if lx.peek() in ("(", "{"):
                opener = lx.take()
                arg = _group(lx, ")" if opener == "(" else "}")
            else:
                arg = _atom(lx)
            return f"{name}({arg})"
        if name in GREEK:
            sym = f"Symbol('{name}')"
            return _maybe_apply(lx, name, sym)
        raise LatexParseError(f"unsupported command {t!r}")
    if re.fullmatch(r"[A-Za-z]", t):
        sym = f"Symbol('{t}')"
        return _maybe_apply(lx, t, sym)
    raise LatexParseError(f"unexpected token {t!r}")


def _maybe_apply(lx: _Lexer, name: str, sym: str) -> str:
    """f(x) → Function('f')(Symbol('x')) — the srepr form whose
    'Function' head gov_dep swallows (equationparsing.py:127-137)."""
    if lx.peek() == "(":
        lx.take()
        arg = _group(lx, ")")
        return f"Function('{name}')({arg})"
    return sym


# ---------------------------------------------------------------------------
# gov_dep and friends — ports of the reference paren-matcher
# ---------------------------------------------------------------------------

def find_parens(s: str) -> dict[int, int]:
    """Open→close index pairs, ordered by open position
    (equationparsing.find_parens, :45-63)."""
    pairs: dict[int, int] = {}
    stack: list[int] = []
    for i, c in enumerate(s):
        if c == "(":
            stack.append(i)
        elif c == ")":
            if not stack:
                raise IndexError(f"unbalanced ')' at {i} in {s!r}")
            pairs[stack.pop()] = i
    if stack:
        raise IndexError(f"unbalanced '(' at {stack[-1]} in {s!r}")
    return dict(sorted(pairs.items()))


def get_rel(gov: str) -> str:
    """Governor head → relation class (equationparsing.get_rel, :80-95)."""
    if gov in ("Equality", "StrictGreaterThan", "StrictLessThan",
               "Approx", "approx"):
        return "compare"
    if gov in ("Mul", "Add", "Pow"):
        return "combine"
    if gov == "Function":
        return "function"
    return "transform"


def get_symbol_and_type(s: str) -> tuple[str, str]:
    """'Symbol('x')' → ('\\'x\\'', 'Symbol') (equationparsing.py:98-103)."""
    return s[s.find("(") + 1:s.find(")")], s[:s.find("(")]


_LEAF_HEADS = ("Symbol", "Integer", "Float")


def gov_dep(s: str, i: int = 1) -> list[tuple[tuple[str, int],
                                              tuple[str, int]]]:
    """srepr string → [((gov, gi), (dep, di)), ...].

    Reference-exact semantics (equationparsing.gov_dep, :105-197):
    * quoted strings and paren-free inputs produce nothing;
    * a 'Function' head swallows its next parenthetical group (name +
      args form one token);
    * each child's text starts after the last ', ' before its opening
      paren (or right after the governor's paren);
    * Symbol/Integer/Float children keep their parenthesized value,
      other heads are named bare;
    * recursion into composite children, numbering tokens depth-first
      and deleting the parenthetical spans the recursion consumed."""
    results: list[tuple[tuple[str, int], tuple[str, int]]] = []
    if "(" not in s or s.startswith("'"):
        return results
    parens = find_parens(s)

    p1 = next(iter(parens))
    p2 = parens.pop(p1)
    if s[:p1] == "Function":
        # reference quirks (:127-137), preserved for parity: the
        # governor token is named from the ORIGINAL p2 (the name
        # parenthetical only, "Function('f')"), and the swallow loop
        # REBINDS p1 to the argument group's open paren — later
        # children without a ", " prefix index from that rebound p1.
        gov = (s[:p2 + 1], i)
        while True:
            p1 = next(iter(parens))
            q2 = parens.pop(p1)
            if p1 > p2:
                p2 = q2
                break
    else:
        gov = (s[:p1], i)

    while parens:
        p3 = next(iter(parens))
        p4 = parens.pop(p3)
        before = s[:p3]
        dep_p1 = before.rfind(", ") + 2 if ", " in before else p1 + 1

        head = s[dep_p1:p3]
        if head == "Function":
            # reference quirk (:156-165): the child token is named from
            # the ORIGINAL p4 (covering only the name parenthetical,
            # e.g. "Function('f')"), and p4 is extended only for the
            # span bookkeeping below — asymmetric with the governor
            # branch, preserved for parity.
            dep = (s[dep_p1:p4 + 1], i + 1)
            while True:
                q3 = next(iter(parens))
                q4 = parens.pop(q3)
                if q3 > p4:
                    p4 = q4
                    break
        elif head in _LEAF_HEADS:
            dep = (s[dep_p1:p4 + 1], i + 1)
        else:
            dep = (head, i + 1)

        results.append((gov, dep))

        consumed = 1
        if parens and next(iter(parens)) < p4:
            sub = gov_dep(s[dep_p1:p4 + 1], i + 1)
            consumed = len(sub) + 1
            results.extend(sub)
            for p in [k for k in parens if k < p4]:
                del parens[p]
        i += consumed

    return results


def latex_parsing(latex: str, token_pos: int = 1
                  ) -> tuple[list, list, list]:
    """(dep_tokens, pos_tokens, mor_tokens) for one equation — the DIM
    assembly of equationparsing.latexParsing (:200-295), over the
    sympy-free srepr. Unparseable LaTeX yields three empty lists (the
    reference swallows parse failures the same way)."""
    try:
        srepr_s = latex_to_srepr(latex)
    except (LatexParseError, IndexError):
        return [], [], []
    # reference post-fixes (:236-238)
    srepr_s = srepr_s.replace(", precision=53", "")
    srepr_s = srepr_s.replace("oo", "Symbol(inf)")

    pairs = gov_dep(srepr_s)
    dep_tokens = []
    dict_all: dict[int, str] = {}
    if pairs:
        for (g, gi), (d, di) in pairs:
            dict_all[gi] = g
            dict_all[di] = d
            dep_tokens.append((get_rel(g),
                               (g, gi + token_pos - 1),
                               (d, di + token_pos - 1)))
    else:
        dict_all[1] = srepr_s

    pos_tokens, mor_tokens = [], []
    for val in dict_all.values():
        if "(" in val:
            _sym, sym_type = get_symbol_and_type(val)
            pos_tokens.append(f"{val}_{sym_type.upper()}")
        else:
            pos_tokens.append(f"{val}_{get_rel(val).upper()}")
        mor_tokens.append(val)
    return dep_tokens, pos_tokens, mor_tokens


# ---------------------------------------------------------------------------
# Spark stage
# ---------------------------------------------------------------------------

EQDEPS_SCHEMA = ("url string, tag string, rel string, gov string, "
                 "gov_pos int, dep string, dep_pos int")


def equation_dependencies_stage(equations_df,
                                url_col: str = "url",
                                tag_col: str = "tag",
                                latex_col: str = "latex"):
    """(url, tag, latex) → one row per dependency pair. Arrow-batched
    mapInPandas; the kernel is pure Python over short strings (the
    equations themselves are the bounded part of any document)."""
    import pandas as pd

    src = equations_df.select(url_col, tag_col, latex_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {k: [] for k in
                                     ("url", "tag", "rel", "gov", "gov_pos",
                                      "dep", "dep_pos")}
            for url, tag, latex in zip(pdf[url_col], pdf[tag_col],
                                       pdf[latex_col]):
                if latex is None:
                    continue
                deps, _pos, _mor = latex_parsing(latex)
                for rel, (g, gi), (d, di) in deps:
                    cols["url"].append(url)
                    cols["tag"].append(tag)
                    cols["rel"].append(rel)
                    cols["gov"].append(g)
                    cols["gov_pos"].append(gi)
                    cols["dep"].append(d)
                    cols["dep_pos"].append(di)
            yield pd.DataFrame(
                {"url": pd.Series(cols["url"], dtype=object),
                 "tag": pd.Series(cols["tag"], dtype=object),
                 "rel": pd.Series(cols["rel"], dtype=object),
                 "gov": pd.Series(cols["gov"], dtype=object),
                 "gov_pos": pd.Series(cols["gov_pos"], dtype="int64"),
                 "dep": pd.Series(cols["dep"], dtype=object),
                 "dep_pos": pd.Series(cols["dep_pos"], dtype="int64")})

    return src.mapInPandas(run, schema=EQDEPS_SCHEMA)
