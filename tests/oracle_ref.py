"""Reference-semantics test oracles.

Independent reimplementations of the reference behaviors, written in the
reference's own style (token objects, recursive set accumulation, dict
mutation) — deliberately NOT sharing code with ``multivac_spark`` so the
pytest invariants compare two implementations of the same spec:

* ``parse_html_oracle``  — src/data/process.py:124-133 semantics
  (regex-based, vs the engine's HTMLParser state machine)
* ``substitute_rdfs_oracle`` — src/rdf_graph/rdf_parse.py:315-387 with
  pos_tree/in_children/get_children (:228-313)
* ``preprocess_tuple_oracle`` — src/rdf_graph/rdf_graph.py:340-402
* ``cluster_oracle`` — exact pdist+fcluster average-linkage clustering
  (rdf_graph.py:86-111) via scipy when available, else a small exact
  agglomerative implementation.
"""

from __future__ import annotations

import html as html_mod
import re


# -------------------------------------------------------------------------
# HTML → text oracle (regex-based; engine uses html.parser)
# -------------------------------------------------------------------------

_ARTICLE_RE = re.compile(rb"<article\b[^>]*>(.*?)</article\s*>",
                         re.DOTALL | re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]+>")


def parse_html_oracle(raw: bytes | None) -> str | None:
    if raw is None:
        return None
    m = _ARTICLE_RE.search(bytes(raw))
    if m is None:
        return None
    inner = m.group(1).decode("utf-8", errors="replace")
    text = html_mod.unescape(_TAG_RE.sub("", inner))
    return " ".join(text.split())


# -------------------------------------------------------------------------
# SVO oracle, reference-style token objects
# -------------------------------------------------------------------------

class Tok:
    def __init__(self, i, text, lemma, pos, head, dep):
        self.i = i
        self.text = text
        self.lemma_ = lemma
        self.pos_ = pos
        self.head = head
        self.dep_ = dep
        self.has_children = False

    def __repr__(self):
        return "{}:{}=>{}:{}".format(self.i, self.text, self.dep_, self.head)

    def __hash__(self):
        return hash(repr(self))

    def __eq__(self, other):
        return repr(self) == repr(other)

    def __lt__(self, other):
        return repr(self) < repr(other)


class SentenceOracle:
    def __init__(self, token_dicts):
        self.tokens = [Tok(t["i"], t["text"], t["lemma"], t["pos"],
                           t["head"], t["dep"]) for t in token_dicts]
        for tok in self.tokens:
            if 0 <= tok.head < len(self.tokens):
                self.tokens[tok.head].has_children = True

    def get_children(self, tok):
        return set(t for t in self.tokens if t.head + 1 == tok.i)

    def pos_tree(self, t, tree_tokens=None, pos=("",)):
        if not tree_tokens:
            tree_tokens = set()
        if t not in tree_tokens and any(t.pos_.startswith(x) for x in pos):
            tree_tokens.add(t)
        if t.has_children:
            for child in self.get_children(t):
                if any(child.pos_.startswith(x) for x in pos):
                    tree_tokens.add(child)
                    if child.has_children:
                        grandkids = self.pos_tree(child, tree_tokens, pos=pos)
                        tree_tokens = tree_tokens.union(grandkids)
        return sorted(list(tree_tokens))

    def in_children(self, parent_list, child_list):
        result = False
        if len(parent_list) > 0 and len(child_list) > 0:
            for parent in parent_list:
                for child in child_list:
                    if child in self.pos_tree(parent):
                        result = True
                        break
                if result:
                    break
        return result

    def substitute_rdfs(self):
        rdfs = {0: {"subject": [], "relation": [], "object": []}}

        verbs = [t for t in self.tokens if t.pos_.startswith("V")]
        nouns = [t for t in self.tokens if t.pos_.startswith("N")]

        for i in range(len(nouns)):
            nouns[i] = self.pos_tree(nouns[i], pos=["N", "J"])
        for i in range(len(verbs)):
            verbs[i] = self.pos_tree(verbs[i], pos=["V", "R"])

        for i in range(len(nouns)):
            for nounlist in [x for j, x in enumerate(nouns) if j != i]:
                if all(x in nounlist for x in nouns[i]):
                    nouns[i] = []
        for i in range(len(verbs)):
            for verblist in [x for j, x in enumerate(verbs) if j != i]:
                if all(x in verblist for x in verbs[i]):
                    verbs[i] = []

        nouns = [x for x in nouns if len(x) > 0]
        verbs = [x for x in verbs if len(x) > 0]

        if len(nouns) == 1:
            rdfs[0]["subject"] = nouns[0]
        else:
            idx = 0
            for nounlist in nouns:
                if len([x for x in nounlist if "subj" in x.dep_]) > 0:
                    if len(rdfs[idx]["subject"]) > 0:
                        idx += 1
                        if idx not in rdfs:
                            rdfs[idx] = {"subject": [], "relation": [],
                                         "object": []}
                    rdfs[idx]["subject"] = sorted(nounlist,
                                                  key=lambda x: x.i)
                else:
                    if len(rdfs[idx]["object"]) > 0:
                        idx += 1
                        if idx not in rdfs:
                            rdfs[idx] = {"subject": [], "relation": [],
                                         "object": []}
                    rdfs[idx]["object"] = sorted(nounlist, key=lambda x: x.i)

        if len(verbs) == 1:
            rdfs[0]["relation"] = verbs[0]
        else:
            idx = 0
            for verblist in verbs:
                if not (self.in_children(verblist, rdfs[idx]["subject"]) or
                        self.in_children(verblist, rdfs[idx]["object"])):
                    idx += 1
                    if idx not in rdfs:
                        rdfs[idx] = {"subject": [], "relation": [],
                                     "object": []}
                rdfs[idx]["relation"] = sorted(verblist, key=lambda x: x.i)

        return rdfs


def substitute_rdfs_oracle(token_dicts):
    """→ [(rdf_idx, subj, pred, obj)] with all parts non-empty."""
    if not token_dicts:
        return []
    rdfs = SentenceOracle(token_dicts).substitute_rdfs()
    out = []
    for idx in sorted(rdfs):
        d = rdfs[idx]
        if d["subject"] and d["relation"] and d["object"]:
            out.append((idx,
                        " ".join(t.text for t in d["subject"]),
                        " ".join(t.text for t in d["relation"]),
                        " ".join(t.text for t in d["object"])))
    return out


# -------------------------------------------------------------------------
# preprocess_raw_tuples oracle (rdf_graph.py:340-402 semantics)
# -------------------------------------------------------------------------

_PUNCT = set("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~")


def preprocess_tuple_oracle(triple, verb_lemmas, pos_lexicon):
    """One (subj, pred, obj) → cleaned 3-list or None."""
    clean = []
    for num, element in enumerate(triple):
        if element is None:
            return None
        word_tokens = element.lower().split()
        if num == 1:
            toks = [verb_lemmas.get(w, w) for w in word_tokens
                    if w not in _PUNCT]
            if len(toks) > 4:
                return None
            if len(toks) > 1:
                toks = [w for w in toks if w != "be"]
        else:
            toks = [w for w in word_tokens if w not in _PUNCT]
            if len(toks) == 1:
                pos = pos_lexicon.get(toks[0], "NN")
                toks = [toks[0]] if "NN" in pos else []
        if not toks:
            return None
        clean.append(" ".join(toks))
    return clean if len(clean) == 3 else None


def validity_oracle(triple, min_len=3):
    """rdf_extract.py:607-673 (remove_numeric='any') + ascii-start."""
    s, p, o = triple
    if any(ch.isdigit() for part in (s, p, o) for ch in part):
        return False
    if len(s) < min_len or len(o) < min_len:
        return False
    for part in (s, p, o):
        if not part or not part[0].isalpha():
            return False
    return True


# -------------------------------------------------------------------------
# exact clustering oracle (rdf_graph.py:86-111)
# -------------------------------------------------------------------------

def cluster_oracle(names, vectors, threshold=0.2):
    """Exact average-linkage agglomerative clustering over cosine
    distances, cut at `threshold` — {name: cluster_id}. O(n³) naive, for
    test-scale n only."""
    import numpy as np

    n = len(names)
    if n == 0:
        return {}
    X = np.asarray(vectors, dtype=float)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    D = 1.0 - Xn @ Xn.T
    clusters = [[i] for i in range(n)]
    dist = {}

    def cdist(a, b):
        key = (id(a), id(b))
        return np.mean([D[i][j] for i in a for j in b])

    while len(clusters) > 1:
        best = None
        bi = bj = -1
        for i in range(len(clusters)):
            for j in range(i + 1, len(clusters)):
                d = cdist(clusters[i], clusters[j])
                if best is None or d < best:
                    best, bi, bj = d, i, j
        if best is None or best > threshold:
            break
        clusters[bi] = clusters[bi] + clusters[bj]
        del clusters[bj]

    out = {}
    for cid, members in enumerate(clusters):
        for i in members:
            out[names[i]] = cid
    return out
