"""USP/MLN semantic clustering (Poon & Domingos, EMNLP 2009) — the
reference's ``pymln`` subsystem rebuilt Spark-first.

Reference counterparts: ``pymln/pymln.py:26-104`` (flow),
``pymln/semantic/Parse.py:109-228`` (init + mergeArgs),
``pymln/semantic/Scorer.py:19-829`` (xlogx likelihood-delta scoring),
``pymln/semantic/Agenda.py:49-257`` (candidate gating + greedy loop),
``pymln/semantic/Executor.py:19-253`` (op execution),
``pymln/semantic/Clust.py`` / ``Part.py`` (state),
``pymln/syntax/StanfordParseReader.py:17-32`` (ignored deps),
``pymln/syntax/Relations/RelType.py:45-62`` (relation-type strings).

Architecture (why this is not a port)
-------------------------------------
The reference keeps one Python object per token and scores agenda
operations by iterating those objects — O(n^2) pair enumeration per
cluster, documented at 5 h for 200 articles (reference
``doc/lessons_learned.md:43``). Every USP sufficient statistic is
LINEAR in *part classes*: two tokens whose whole sentence parse trees
are identical are interchangeable in every count the scorer reads. So:

1. **Spark** collapses the corpus into weighted distinct-parse-tree
   classes (one ``groupBy`` over a canonical tree key) — the only
   corpus-proportional pass, linear and shuffle-bounded at 100 TB.
2. The **driver** runs the exact greedy agenda over class nodes with
   integer multiplicities (a Zipf-bounded dictionary, the same design
   point as the reference's top-50k mention dictionary used by
   ``canon.py``). Weighted arithmetic is pytest-pinned identical to
   running the expanded per-part corpus.
3. **Spark** joins the class→cluster map back onto the corpus for
   per-token labels (broadcast join on the tree key).

Scoring: MERGE-family scores are analytic Δ of an explicit global
objective ``L`` (xlogx multinomial log-likelihood minus parameter
priors); COMPOSE scores evaluate ``L`` around a dry-run execution
(exact by construction). The reference's incremental formulas are
exactly this delta — verified term-by-term against ``Scorer.py``:
``scoreOpMC`` (19-92: ttlCnt/relType/root/parent terms),
``scoreMCForAlign`` (577-681: argclust presence + greedy alignment),
``scoreMergeArgs`` (684-804: argnum/argtype/chdclust terms),
``scoreOpCompose`` (119-502: pair-extraction terms). A pytest asserts
``score == L(after) - L(before)`` around every executed op, which for
the analytic merge scores is a genuine two-implementation check.

Corrected-intent deviations from the reference (research-code
artifacts, each cited and deliberate):

* Candidate gates are evaluated in closed form over class counts
  (MERGE: >= ``minMCCnt`` distinct shared-context clusters; COMPOSE:
  >= ``minAbsCnt`` parent-child pair instances) instead of replaying
  the O(n^2) per-part-pair enumeration whose thresholds encode the
  same quantities (``Agenda.py:144-188``: ``minAbsCnt*(minAbsCnt-1)/2``
  pair observations == ``minAbsCnt`` parts each contributing one).
* ``relType -> cluster`` stays consistent under merges (the reference
  writes ``Clust.relTypeIdx_clustIdx`` only at cluster creation,
  leaving dangling ids after ``execMC``).
* A COMPOSE op assigns all composed parts to ONE fresh cluster keyed
  by the op (the reference keys the new cluster off whichever pair a
  ``SortedSet`` yields first, ``Executor.py:114-124``); composite
  relation-type strings are canonicalized child-order-sorted.
* A parent with several children in the composed child cluster
  absorbs them all in one step (the reference absorbs sequentially,
  leaving the part in the first composite's cluster with a
  second-composite relation type, ``Executor.py:104-153``).
"""
from __future__ import annotations

import math

from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame, functions as F

# StanfordParseReader.py:17-32 — dependency edges severed before part
# creation; the orphaned subtree is then unreachable from the sentence
# root and Parse.isIgnore (Parse.py:162-176) drops it.
IGNORED_DEPS = frozenset({
    "aux", "auxpass", "det", "cop", "complm", "preconj", "predet",
    "punct", "quantmod", "expl", "mark",
})

# Clust.py:127-130
STOP_RELTYPES = frozenset({"(V:be)", "(N:%)", "(V:say)", "($:$)"})

# Token.py:4-7 — content POS classes; content tokens collapse POS to
# its first character in the type string (Token.py:16-22).
CONTENT_POS = frozenset("JRVN")


@dataclass(frozen=True)
class UspParams:
    """ParseParams.py:3-10."""
    min_mc_cnt: int = 10
    min_abs_cnt: int = 50
    prior_cutoff: float = 10.0
    prior_merge: float = 0.0
    prior_num_param: float = 5.0
    prior_num_conj: float = 10.0
    drop_below: float = -200.0   # Agenda.procAgenda score floor


def xlogx(x: float) -> float:
    """Utils.py:75-81."""
    return x * math.log(x) if x > 0 else 0.0


def token_type_str(pos: str, lemma: str) -> str:
    """Token.toString (Token.py:67-68) with the content-POS collapse
    of Token.__init__ (Token.py:16-22)."""
    p = pos[0] if pos and pos[0] in CONTENT_POS else pos
    return f"{p}:{lemma}"


def _inc(d, k, v):
    n = d.get(k, 0) + v
    if n:
        d[k] = n
    else:
        d.pop(k, None)


# --------------------------------------------------------------------
# Driver-side weighted part-class model
# --------------------------------------------------------------------

class PartNode:
    """One node of a DISTINCT parse tree, standing for ``w`` identical
    corpus tokens (Part.py:56-74 collapsed by multiplicity)."""

    __slots__ = ("pid", "rel", "is_content", "w", "parent", "dep",
                 "args", "arg_ac", "clust", "tree_key", "tok_i")

    def __init__(self, pid, rel, is_content, w, tree_key, tok_i):
        self.pid = pid
        self.rel = rel              # RelType string, evolves on COMPOSE
        self.is_content = is_content
        self.w = w
        self.parent = None          # PartNode | None
        self.dep = None             # dep label to parent
        self.args = {}              # arg_id -> (dep, child PartNode)
        self.arg_ac = {}            # arg_id -> argclust id
        self.clust = -1
        self.tree_key = tree_key
        self.tok_i = tok_i

    def argnum_in(self, aci) -> int:
        return sum(1 for a in self.arg_ac.values() if a == aci)

    def snap(self):
        return (self.rel, self.clust, dict(self.args),
                dict(self.arg_ac), self.parent, self.dep)

    def restore(self, s):
        (self.rel, self.clust, self.args,
         self.arg_ac, self.parent, self.dep) = (
            s[0], s[1], dict(s[2]), dict(s[3]), s[4], s[5])


class ArgClust:
    """ArgClust stats, weighted (Clust.py:196-241 arithmetic)."""

    __slots__ = ("argtype_cnt", "chd_cnt", "argnum_cnt", "ttl_arg",
                 "part_w", "parts")

    def __init__(self):
        self.argtype_cnt = {}   # argtype str -> weight
        self.chd_cnt = {}       # child clust -> weight
        self.argnum_cnt = {}    # #args-in-this-ac per part -> weight
        self.ttl_arg = 0
        self.part_w = 0         # Σ w over parts with >=1 arg here
        self.parts = set()      # part ids (class parts, bounded)

    def copy(self):
        c = ArgClust()
        c.argtype_cnt = dict(self.argtype_cnt)
        c.chd_cnt = dict(self.chd_cnt)
        c.argnum_cnt = dict(self.argnum_cnt)
        c.ttl_arg = self.ttl_arg
        c.part_w = self.part_w
        c.parts = set(self.parts)
        return c


class Clust:
    __slots__ = ("cid", "reltype_cnt", "ttl", "root_w", "argclusts",
                 "atype_acs", "nxt_ac", "ctype", "is_stop", "version")

    def __init__(self, cid, founding_rel, is_content):
        self.cid = cid
        self.reltype_cnt = {}
        self.ttl = 0
        self.root_w = 0
        self.argclusts = {}      # aci -> ArgClust
        self.atype_acs = {}      # argtype -> an aci (Clust.py:153-163)
        self.nxt_ac = 0
        self.ctype = "C" if is_content else "N"   # RelType.py:13-16
        self.is_stop = founding_rel in STOP_RELTYPES
        self.version = 0

    def copy(self):
        c = Clust.__new__(Clust)
        c.cid = self.cid
        c.reltype_cnt = dict(self.reltype_cnt)
        c.ttl = self.ttl
        c.root_w = self.root_w
        c.argclusts = {a: ac.copy() for a, ac in self.argclusts.items()}
        c.atype_acs = dict(self.atype_acs)
        c.nxt_ac = self.nxt_ac
        c.ctype = self.ctype
        c.is_stop = self.is_stop
        c.version = self.version
        return c


class UspModel:
    """Exact weighted USP: init → mergeArgs → greedy agenda."""

    def __init__(self, params: UspParams | None = None):
        self.p = params or UspParams()
        self.parts: dict[int, PartNode] = {}
        self.clusts: dict[int, Clust] = {}
        self.rel_clust: dict[str, int] = {}
        self.conj_cnt: dict[tuple[int, int], int] = {}
        self.nxt_clust = 1
        self.nxt_part = 1
        # absorbed (composed-away) part -> its composite parent, for
        # labeling the absorbed tokens with the surviving cluster
        self._absorbed_parent: dict[int, PartNode] = {}
        self._absorbed_key: dict[int, tuple] = {}
        # parts attached by a conj_* dep (the only conj contributors)
        self._conj_parts: set[int] = set()

    # ---------------- construction ----------------

    @classmethod
    def from_trees(cls, trees, params: UspParams | None = None):
        """``trees``: iterable of (tree_key, weight, tokens) where
        tokens is a list of dicts/Rows with i, lemma, pos, head, dep
        (head == -1 for ROOT). Mirrors Parse.initializeSent
        (Parse.py:109-160) + createArgs (Parse.py:25-87), weighted."""
        m = cls(params)
        for tree_key, w, toks in trees:
            m._add_tree(tree_key, int(w), toks)
        return m

    @staticmethod
    def kept_token_ids(toks) -> set:
        """Non-ignored tokens: reachable from ROOT without crossing an
        IGNORED_DEPS edge (StanfordParseReader.py:17-32 severs the
        edge; Parse.isIgnore drops the orphaned subtree).

        Token convention (functions/parse.py): ``i`` is 1-based,
        ``head`` is the parent's 0-based POSITION (so the parent is
        the token with ``i == head + 1``); ``head < 0`` marks ROOT."""
        by_i = {t["i"]: t for t in toks}
        kept = set()
        for t0 in toks:
            chain, seen, t, ok = [], set(), t0, False
            while True:
                if t["i"] in kept:
                    ok = True
                    break
                if t["dep"] in IGNORED_DEPS or t["i"] in seen:
                    break   # severed edge, or a malformed head cycle
                    # (Parse.isIgnore's `done` guard, Parse.py:162-176)
                chain.append(t["i"])
                seen.add(t["i"])
                if t["head"] < 0 or (t["head"] + 1) not in by_i:
                    ok = t["head"] < 0
                    break
                t = by_i[t["head"] + 1]
            if ok:
                kept.update(chain)
        return kept

    def _add_tree(self, tree_key, w, toks):
        toks = [t if isinstance(t, dict) else t.asDict() for t in toks]
        kept = self.kept_token_ids(toks)
        nodes = {}
        for t in toks:
            if t["i"] not in kept:
                continue
            rel = f"({token_type_str(t['pos'], t['lemma'])})"
            pid = self.nxt_part
            self.nxt_part += 1
            node = PartNode(pid, rel,
                            bool(t["pos"]) and t["pos"][0] in CONTENT_POS,
                            w, tree_key, t["i"])
            nodes[t["i"]] = node
            self.parts[pid] = node
            ci = self.rel_clust.get(rel)
            if ci is None:
                ci = self._create_clust(rel, node.is_content)
            node.clust = ci
            cl = self.clusts[ci]
            cl.ttl += w
            _inc(cl.reltype_cnt, rel, w)
        for t in toks:
            n = nodes.get(t["i"])
            if n is None:
                continue
            if t["head"] < 0 or (t["head"] + 1) not in nodes:
                self.clusts[n.clust].root_w += w
                continue
            par = nodes[t["head"] + 1]
            dep = t["dep"]
            aid = len(par.args)
            par.args[aid] = (dep, n)
            n.parent, n.dep = par, dep
            self._attach_arg(par, aid)
            if dep.startswith("conj"):
                self._conj_parts.add(n.pid)
                if par.clust != n.clust:
                    key = (min(par.clust, n.clust),
                           max(par.clust, n.clust))
                    _inc(self.conj_cnt, key, w)   # Part.py:319-332

    def _create_clust(self, rel, is_content) -> int:
        cid = self.nxt_clust
        self.nxt_clust += 1
        self.clusts[cid] = Clust(cid, rel, is_content)
        self.rel_clust[rel] = cid
        return cid

    def _attach_arg(self, par, aid):
        """Assign arg to its cluster's argclust for the argtype
        (Parse.py:69-80) and update weighted stats
        (Clust.onPartSetArg, Clust.py:196-241)."""
        dep, child = par.args[aid]
        at = f"<{dep}>"
        cl = self.clusts[par.clust]
        aci = cl.atype_acs.get(at)
        if aci is None:
            aci = cl.nxt_ac
            cl.nxt_ac += 1
            cl.argclusts[aci] = ArgClust()
            cl.atype_acs[at] = aci
        par.arg_ac[aid] = aci
        ac = cl.argclusts[aci]
        w = par.w
        _inc(ac.argtype_cnt, at, w)
        _inc(ac.chd_cnt, child.clust, w)
        ac.ttl_arg += w
        n = par.argnum_in(aci)
        _inc(ac.argnum_cnt, n, w)
        if n > 1:
            _inc(ac.argnum_cnt, n - 1, -w)
        else:
            ac.part_w += w
            ac.parts.add(par.pid)

    # ---------------- the objective ----------------

    def L_clust(self, cl: Clust) -> float:
        """Explicit global objective per cluster; op scores are exact
        deltas of Σ L_clust (see module docstring for the Scorer.py
        term-by-term correspondence)."""
        p = self.p
        s = sum(xlogx(c) for c in cl.reltype_cnt.values())
        s -= xlogx(cl.ttl)
        s -= p.prior_num_param * len(cl.reltype_cnt)
        for ac in cl.argclusts.values():
            s += xlogx(cl.ttl - ac.part_w) - xlogx(cl.ttl)
            s += sum(xlogx(c) for c in ac.argnum_cnt.values())
            s -= p.prior_num_param * len(ac.argnum_cnt)
            s += sum(xlogx(c) for c in ac.argtype_cnt.values())
            s += sum(xlogx(c) for c in ac.chd_cnt.values())
            s -= 2 * xlogx(ac.ttl_arg)
            s -= p.prior_num_param * (len(ac.argtype_cnt)
                                      + len(ac.chd_cnt))
        if cl.root_w > 0:
            s += xlogx(cl.root_w) - p.prior_num_param
        return s

    def L_total(self) -> float:
        return sum(self.L_clust(c) for c in self.clusts.values())

    # ---------------- mergeArgs (Parse.py:178-228) ----------------

    def score_merge_argclusts(self, cl: Clust, a1: int, a2: int) -> float:
        """Scorer.scoreMergeArgs (Scorer.py:684-804) as ΔL of merging
        argclusts a1,a2 of one cluster, weighted."""
        p = self.p
        ac1, ac2 = cl.argclusts[a1], cl.argclusts[a2]
        s = -p.prior_merge
        s -= xlogx(cl.ttl - ac1.part_w) + xlogx(cl.ttl - ac2.part_w)
        s += xlogx(cl.ttl)
        s -= 2 * (xlogx(ac1.ttl_arg + ac2.ttl_arg)
                  - xlogx(ac1.ttl_arg) - xlogx(ac2.ttl_arg))
        new_argnum = {}
        for d in (ac1.argnum_cnt, ac2.argnum_cnt):
            for k, c in d.items():
                s -= xlogx(c)
                _inc(new_argnum, k, c)
        comb_part_w = ac1.part_w + ac2.part_w
        small, s_aci, o_aci = ((ac1, a1, a2)
                               if len(ac1.parts) <= len(ac2.parts)
                               else (ac2, a2, a1))
        for pid in small.parts:
            node = self.parts[pid]
            n_other = node.argnum_in(o_aci)
            if n_other == 0:
                continue
            n_self = node.argnum_in(s_aci)
            comb_part_w -= node.w
            _inc(new_argnum, n_self + n_other, node.w)
            _inc(new_argnum, n_self, -node.w)
            _inc(new_argnum, n_other, -node.w)
        s += xlogx(cl.ttl - comb_part_w)
        s += sum(xlogx(c) for c in new_argnum.values())
        s += (len(ac1.argnum_cnt) + len(ac2.argnum_cnt)
              - len(new_argnum)) * p.prior_num_param
        for d1, d2 in ((ac1.argtype_cnt, ac2.argtype_cnt),
                       (ac1.chd_cnt, ac2.chd_cnt)):
            for k in (d1.keys() & d2.keys()):
                s += (xlogx(d1[k] + d2[k]) - xlogx(d1[k])
                      - xlogx(d2[k]) + p.prior_num_param)
        return s

    def exec_merge_argclusts(self, cl: Clust, a1: int, a2: int):
        """Executor.mergeArg (Executor.py:243-253), weighted: fold a2
        into a1 and retarget part arg assignments."""
        ac1, ac2 = cl.argclusts[a1], cl.argclusts[a2]
        for pid in list(ac2.parts):
            node = self.parts[pid]
            n1, n2 = node.argnum_in(a1), node.argnum_in(a2)
            for aid, aci in node.arg_ac.items():
                if aci == a2:
                    node.arg_ac[aid] = a1
            if n1 > 0:
                _inc(ac1.argnum_cnt, n1, -node.w)
                _inc(ac1.argnum_cnt, n1 + n2, node.w)
            else:
                ac1.part_w += node.w
                ac1.parts.add(pid)
                _inc(ac1.argnum_cnt, n2, node.w)
        for k, c in ac2.argtype_cnt.items():
            _inc(ac1.argtype_cnt, k, c)
        for k, c in ac2.chd_cnt.items():
            _inc(ac1.chd_cnt, k, c)
        ac1.ttl_arg += ac2.ttl_arg
        del cl.argclusts[a2]
        for at, aci in list(cl.atype_acs.items()):
            if aci == a2:
                cl.atype_acs[at] = a1
        cl.version += 1

    def merge_args(self):
        """Parse.mergeArgs (Parse.py:178-228): per cluster, argclusts
        by descending total args; greedily fold into the best-scoring
        kept argclust when ΔL > 0."""
        for cl in self.clusts.values():
            order = sorted(cl.argclusts,
                           key=lambda a: (-cl.argclusts[a].ttl_arg, a))
            kept = []
            for aci in order:
                if not kept:
                    kept.append(aci)
                    continue
                best, best_a = 0.0, None
                for k in kept:
                    sc = self.score_merge_argclusts(cl, k, aci)
                    if sc > best:
                        best, best_a = sc, k
                if best_a is not None:
                    self.exec_merge_argclusts(cl, best_a, aci)
                else:
                    kept.append(aci)

    # ---------------- MERGE (scoreOpMC / execMC) ----------------

    def _parent_ctx(self):
        """For each cluster: {(parent clust, parent aci): weight} —
        Clust.clustIdx_parArgs, rebuilt from parts."""
        out = {}
        for node in self.parts.values():
            for aid, (dep, child) in node.args.items():
                key = (node.clust, node.arg_ac[aid])
                _inc(out.setdefault(child.clust, {}), key, node.w)
        return out

    def score_merge(self, c1: int, c2: int, par_ctx=None) -> float:
        """Scorer.scoreOpMC (Scorer.py:19-92): ΔL of merging c2 into
        c1, with conjunction penalty and greedy argclust alignment
        (scoreMCForAlign, Scorer.py:577-681)."""
        p = self.p
        cl1, cl2 = self.clusts[c1], self.clusts[c2]
        s = -p.prior_merge
        key = (min(c1, c2), max(c1, c2))
        s -= p.prior_num_conj * self.conj_cnt.get(key, 0)
        s -= xlogx(cl1.ttl + cl2.ttl) - xlogx(cl1.ttl) - xlogx(cl2.ttl)
        for rt, n1 in cl1.reltype_cnt.items():
            n2 = cl2.reltype_cnt.get(rt)
            if n2:
                s += (xlogx(n1 + n2) - xlogx(n1) - xlogx(n2)
                      + p.prior_num_param)
        if cl1.root_w > 0 and cl2.root_w > 0:
            s += (xlogx(cl1.root_w + cl2.root_w) - xlogx(cl1.root_w)
                  - xlogx(cl2.root_w) + p.prior_num_param)
        ctx = par_ctx if par_ctx is not None else self._parent_ctx()
        d1, d2 = ctx.get(c1, {}), ctx.get(c2, {})
        for k in (d1.keys() & d2.keys()):
            s += (xlogx(d1[k] + d2[k]) - xlogx(d1[k]) - xlogx(d2[k])
                  + p.prior_num_param)
        align_s, _ = self._align_argclusts(cl1, cl2)
        return s + align_s

    def _align_argclusts(self, cl1: Clust, cl2: Clust):
        """scoreMCForAlign (Scorer.py:577-681): greedy best ΔL map of
        the smaller cluster's argclusts onto the larger's."""
        p = self.p
        big, small, swapped = ((cl1, cl2, False)
                               if len(cl1.argclusts) >= len(cl2.argclusts)
                               else (cl2, cl1, True))
        T1, T2 = big.ttl, small.ttl
        T = T1 + T2
        s = 0.0
        for ac in big.argclusts.values():
            s += (xlogx(T - ac.part_w) - xlogx(T)
                  - xlogx(T1 - ac.part_w) + xlogx(T1))
        for ac in small.argclusts.values():
            s += (xlogx(T - ac.part_w) - xlogx(T)
                  - xlogx(T2 - ac.part_w) + xlogx(T2))
        mapping = {}
        for a2 in sorted(small.argclusts):
            ac2 = small.argclusts[a2]
            best, best_a = 0.0, None
            for a1 in sorted(big.argclusts):
                ac1 = big.argclusts[a1]
                if ac1.part_w == 0:
                    continue
                sc = -p.prior_merge
                sc += (xlogx(T - ac1.part_w - ac2.part_w)
                       - xlogx(T - ac1.part_w) - xlogx(T - ac2.part_w)
                       + xlogx(T))
                sc -= 2 * (xlogx(ac1.ttl_arg + ac2.ttl_arg)
                           - xlogx(ac1.ttl_arg) - xlogx(ac2.ttl_arg))
                new_argnum = {}
                for d in (ac1.argnum_cnt, ac2.argnum_cnt):
                    for k, c in d.items():
                        sc -= xlogx(c)
                        _inc(new_argnum, k, c)
                sc += sum(xlogx(c) for c in new_argnum.values())
                sc += (len(ac1.argnum_cnt) + len(ac2.argnum_cnt)
                       - len(new_argnum)) * p.prior_num_param
                for dd1, dd2 in ((ac1.argtype_cnt, ac2.argtype_cnt),
                                 (ac1.chd_cnt, ac2.chd_cnt)):
                    for k in (dd1.keys() & dd2.keys()):
                        sc += (xlogx(dd1[k] + dd2[k]) - xlogx(dd1[k])
                               - xlogx(dd2[k]) + p.prior_num_param)
                if sc > best:
                    best, best_a = sc, a1
            if best_a is not None:
                s += best
                mapping[a2] = best_a
        return s, (mapping, swapped)

    def exec_merge(self, c1: int, c2: int) -> int:
        """Executor.execMC (Executor.py:19-84): fold the cluster with
        fewer argclusts into the other; remap argclusts by the greedy
        alignment; unmapped argclusts land on the keeper's argclust
        for one of their argtypes (Executor.py:49-62).

        MERGE is pure label arithmetic — no part structure changes —
        which is what makes the whole merge agenda run on class
        aggregates (the key scale property)."""
        cl1, cl2 = self.clusts[c1], self.clusts[c2]
        _, (mapping, swapped) = self._align_argclusts(cl1, cl2)
        if swapped:
            cl1, cl2 = cl2, cl1
            c1, c2 = c2, c1
        for a2, ac2 in sorted(cl2.argclusts.items()):
            if a2 in mapping:
                continue
            for at in sorted(ac2.argtype_cnt):
                a1 = cl1.atype_acs.get(at)
                if a1 is None:
                    a1 = cl1.nxt_ac
                    cl1.nxt_ac += 1
                    cl1.argclusts[a1] = ArgClust()
                    cl1.atype_acs[at] = a1
                mapping[a2] = a1
                break
        # relabel c2's parts (clust id + argclust ids)
        for node in self.parts.values():
            if node.clust != c2:
                continue
            node.clust = c1
            node.arg_ac = {aid: mapping[aci]
                           for aid, aci in node.arg_ac.items()}
        # fold cluster-level stats
        for rt, c in cl2.reltype_cnt.items():
            _inc(cl1.reltype_cnt, rt, c)
            self.rel_clust[rt] = c1
        cl1.ttl += cl2.ttl
        cl1.root_w += cl2.root_w
        for at, a2 in cl2.atype_acs.items():
            cl1.atype_acs.setdefault(at, mapping[a2])
        for a2, ac2 in cl2.argclusts.items():
            ac1 = cl1.argclusts[mapping[a2]]
            for k, c in ac2.argtype_cnt.items():
                _inc(ac1.argtype_cnt, k, c)
            for k, c in ac2.chd_cnt.items():
                _inc(ac1.chd_cnt, k, c)
            ac1.ttl_arg += ac2.ttl_arg
            ac1.part_w += ac2.part_w
            ac1.parts |= ac2.parts
            for k, c in ac2.argnum_cnt.items():
                _inc(ac1.argnum_cnt, k, c)
        # child-cluster counts keyed by the dead id relabel globally
        for cl in self.clusts.values():
            for ac in cl.argclusts.values():
                if c2 in ac.chd_cnt:
                    _inc(ac.chd_cnt, c1, ac.chd_cnt.pop(c2))
        self.conj_cnt.pop((min(c1, c2), max(c1, c2)), None)
        for (x, y), c in list(self.conj_cnt.items()):
            if c2 in (x, y):
                nx = c1 if x == c2 else x
                ny = c1 if y == c2 else y
                del self.conj_cnt[(x, y)]
                if nx != ny:
                    _inc(self.conj_cnt, (min(nx, ny), max(nx, ny)), c)
        del self.clusts[c2]
        cl1.version += 1
        return c1

    # ---------------- COMPOSE ----------------

    @staticmethod
    def composite_rel(rel: str, absorbed: list[tuple[str, str]]) -> str:
        """RelType.genTypeStr (RelType.py:45-62), canonical child order
        (sorted by (dep, subtree) — see module docstring)."""
        inner = rel[1:-1]
        return ("(" + inner
                + "".join(f" ({d} {r})" for d, r in sorted(absorbed))
                + ")")

    def compose_pairs(self, pc: int, cc: int, members=None):
        """Parent parts in cluster ``pc`` with >=1 child in ``cc``
        (Part.pairClustIdxs_pairPartRootNodeIds, rebuilt). Pass
        ``members`` (pc's parts, any order) to skip the full scan —
        run_agenda shares one per-round cluster index."""
        if members is None:
            members = [n for n in self.parts.values() if n.clust == pc]
        out = []
        for node in sorted(members, key=lambda n: n.pid):
            if node.clust != pc:
                continue
            kids = [aid for aid, (_, ch) in node.args.items()
                    if ch.clust == cc]
            if kids:
                out.append((node, kids))
        return out

    def score_compose(self, pc: int, cc: int, members=None) -> float:
        """Scorer.scoreOpCompose (Scorer.py:119-502) as ΔL around a
        dry-run execution on snapshotted state — exact by
        construction (the reference's 400-line incremental-delta
        transcription is where its research-code fragility lives)."""
        pairs = self.compose_pairs(pc, cc, members)
        touched = {pc, cc}
        for node, _ in pairs:
            if node.parent is not None:
                touched.add(node.parent.clust)
        before = sum(self.L_clust(self.clusts[c])
                     for c in touched if c in self.clusts)
        snap = self._snapshot(touched, pairs)
        new_cid = self.exec_compose(pc, cc, _dry=True, pairs=pairs)
        after_ids = {c for c in (*touched, new_cid) if c in self.clusts}
        after = sum(self.L_clust(self.clusts[c]) for c in after_ids)
        self._restore(snap, new_cid)
        return after - before

    def _snapshot(self, cids, pairs):
        """Snapshot exactly what exec_compose mutates: the touched
        clusters' stats plus the composed parts, their absorbed
        children, and the grandchildren whose parent pointer moves."""
        part_snaps = {}

        def snap_node(n):
            if n.pid not in part_snaps:
                part_snaps[n.pid] = (n, n.snap())

        for node, kid_aids in pairs:
            snap_node(node)
            for aid in kid_aids:
                child = node.args[aid][1]
                snap_node(child)
                for _, gch in child.args.values():
                    snap_node(gch)
        return {
            "clusts": {c: self.clusts[c].copy()
                       for c in set(cids) if c in self.clusts},
            "rel_clust": dict(self.rel_clust),
            "nxt_clust": self.nxt_clust,
            "conj": dict(self.conj_cnt),
            "parts": part_snaps,
        }

    def _restore(self, state, new_cid):
        self.clusts.pop(new_cid, None)
        for c, cl in state["clusts"].items():
            self.clusts[c] = cl
        self.rel_clust = state["rel_clust"]
        self.nxt_clust = state["nxt_clust"]
        self.conj_cnt = state["conj"]
        for pid, (node, s) in state["parts"].items():
            node.restore(s)
            self.parts[pid] = node   # re-adds dry-run-deleted parts

    def exec_compose(self, pc: int, cc: int, _dry=False,
                     pairs=None) -> int:
        """Executor.execCompose (Executor.py:86-186): absorb every
        cc-child of every pc-parent; composed parts move to ONE fresh
        cluster; the child's own arguments re-attach to the parent."""
        if pairs is None:
            pairs = self.compose_pairs(pc, cc)
        if not pairs:
            return -1
        cl_p, cl_c = self.clusts[pc], self.clusts[cc]
        new_cid = self.nxt_clust
        self.nxt_clust += 1
        new_cl = Clust(new_cid, "", cl_p.ctype == "C")
        self.clusts[new_cid] = new_cl
        deleted: set[int] = set()
        for node, kid_aids in pairs:
            if node.pid in deleted:
                # chain composes (pc == ancestors of cc): the
                # reference's deleted_parts guard (Executor.py:104-106)
                continue
            w = node.w
            # parent bookkeeping: root weight or parent's chd count
            if node.parent is None:
                cl_p.root_w -= w
                new_cl.root_w += w
            else:
                par = node.parent
                pac = self.clusts[par.clust].argclusts[
                    par.arg_ac[self._arg_id_of(par, node)]]
                _inc(pac.chd_cnt, pc, -w)
                _inc(pac.chd_cnt, new_cid, w)
            # remove the part from cluster pc stats entirely
            cl_p.ttl -= w
            _inc(cl_p.reltype_cnt, node.rel, -w)
            for aid, aci in node.arg_ac.items():
                ac = cl_p.argclusts[aci]
                dep, child = node.args[aid]
                _inc(ac.argtype_cnt, f"<{dep}>", -w)
                _inc(ac.chd_cnt, child.clust, -w)
                ac.ttl_arg -= w
            for aci in set(node.arg_ac.values()):
                ac = cl_p.argclusts[aci]
                _inc(ac.argnum_cnt, node.argnum_in(aci), -w)
                ac.part_w -= w
                ac.parts.discard(node.pid)
            absorbed = []
            for aid in kid_aids:
                dep, child = node.args.pop(aid)
                node.arg_ac.pop(aid)
                absorbed.append((dep, child.rel))
                # child leaves cluster cc entirely
                cl_c.ttl -= w
                _inc(cl_c.reltype_cnt, child.rel, -w)
                for caid, caci in child.arg_ac.items():
                    cac = cl_c.argclusts[caci]
                    cdep, cch = child.args[caid]
                    _inc(cac.argtype_cnt, f"<{cdep}>", -w)
                    _inc(cac.chd_cnt, cch.clust, -w)
                    cac.ttl_arg -= w
                for caci in set(child.arg_ac.values()):
                    cac = cl_c.argclusts[caci]
                    _inc(cac.argnum_cnt, child.argnum_in(caci), -w)
                    cac.part_w -= w
                    cac.parts.discard(child.pid)
                # the child's own args re-attach to the parent
                # (Executor.py:159-173)
                for caid in sorted(child.args):
                    cdep, cch = child.args[caid]
                    naid = (max(node.args) + 1) if node.args else 0
                    node.args[naid] = (cdep, cch)
                    cch.parent = node
                deleted.add(child.pid)
                del self.parts[child.pid]
                if not _dry:
                    self._absorbed_parent[child.pid] = node
                    self._absorbed_key[child.pid] = (child.tree_key,
                                                     child.tok_i)
            node.rel = self.composite_rel(node.rel, absorbed)
            node.clust = new_cid
            node.arg_ac = {}
            new_cl.ttl += w
            _inc(new_cl.reltype_cnt, node.rel, w)
            self.rel_clust[node.rel] = new_cid
            for aid in node.args:
                self._attach_arg(node, aid)
        # refresh conj entries touching the rewritten clusters (only
        # conj-edged parts can contribute; indexed once at init)
        for key in [k for k in self.conj_cnt
                    if pc in k or cc in k or new_cid in k]:
            del self.conj_cnt[key]
        for pid in self._conj_parts:
            node = self.parts.get(pid)
            if node is None or node.parent is None:
                continue
            a, b = node.parent.clust, node.clust
            if a != b and {a, b} & {pc, cc, new_cid}:
                _inc(self.conj_cnt, (min(a, b), max(a, b)), node.w)
        self._prune_empty_acs(cl_p)
        self._prune_empty_acs(cl_c)
        cl_p.version += 1
        cl_c.version += 1
        new_cl.version += 1
        if not _dry:
            self._drop_if_empty(pc)
            self._drop_if_empty(cc)
        return new_cid

    @staticmethod
    def _prune_empty_acs(cl: Clust):
        """Clust.removeArgClust (Clust.py:294-296, 325-338): drop
        argclusts whose last argument left."""
        dead = [a for a, ac in cl.argclusts.items() if ac.ttl_arg == 0]
        for a in dead:
            del cl.argclusts[a]
        if dead:
            ds = set(dead)
            for at in [at for at, a in cl.atype_acs.items() if a in ds]:
                del cl.atype_acs[at]

    @staticmethod
    def _arg_id_of(par: PartNode, child: PartNode) -> int:
        for aid, (_, ch) in par.args.items():
            if ch is child:
                return aid
        raise KeyError(child.pid)

    def _drop_if_empty(self, cid):
        cl = self.clusts.get(cid)
        if cl is not None and cl.ttl == 0:
            for rt in [r for r, c in self.rel_clust.items() if c == cid]:
                del self.rel_clust[rt]
            del self.clusts[cid]

    # ---------------- agenda ----------------

    def _candidates(self):
        """Closed-form Agenda.createAgenda/addAgendaAfterMergeClust
        (Agenda.py:49-188): evidence contexts are content non-stop
        clusters; MERGE needs >= min_mc_cnt distinct contexts, COMPOSE
        >= min_abs_cnt parent-child pair instances with a content
        non-stop endpoint."""
        merge_ev: dict[tuple[int, int], set[int]] = {}
        compose_w: dict[tuple[int, int], int] = {}
        by_clust: dict[int, list[PartNode]] = {}
        for node in self.parts.values():
            by_clust.setdefault(node.clust, []).append(node)
            for dep, ch in node.args.values():
                _inc(compose_w, (node.clust, ch.clust), node.w)
        for x, members in by_clust.items():
            cx = self.clusts[x]
            if cx.ctype != "C" or cx.is_stop:
                continue
            par_cnt: dict[int, int] = {}    # parent clust -> #parts
            kid_cnt: dict[int, int] = {}    # kid clust -> #parts (cap 2)
            kid_both: dict[tuple[int, int], int] = {}
            for node in members:
                if node.parent is not None:
                    _inc(par_cnt, node.parent.clust, 1)
                kc = {ch.clust for _, ch in node.args.values()}
                for c in kc:
                    _inc(kid_cnt, c, 2 if node.w > 1 else 1)
                for a in kc:
                    for b in kc:
                        if a < b:
                            _inc(kid_both, (a, b), 1)
            clusters = sorted(set(par_cnt) | set(kid_cnt))
            for i, a in enumerate(clusters):
                for b in clusters[i + 1:]:
                    ok = par_cnt.get(a, 0) >= 1 and par_cnt.get(b, 0) >= 1
                    if not ok:
                        ka, kb = kid_cnt.get(a, 0), kid_cnt.get(b, 0)
                        # evidence needs two DISTINCT parts
                        # (Agenda.py:85-95): a single part with kids
                        # in both clusters is not a pair
                        if ka >= 1 and kb >= 1 and (
                                ka > 1 or kb > 1
                                or kid_both.get((a, b), 0) == 0):
                            ok = True
                    if ok and (self.clusts[a].ctype == "C"
                               and self.clusts[b].ctype == "C"):
                        merge_ev.setdefault((a, b), set()).add(x)
        merges = sorted(k for k, v in merge_ev.items()
                        if len(v) >= self.p.min_mc_cnt)
        composes = []
        for (pcl, ccl), wsum in sorted(compose_w.items()):
            if wsum < self.p.min_abs_cnt or pcl == ccl:
                continue
            tp, tc = self.clusts[pcl], self.clusts[ccl]
            if ((tp.ctype == "C" and not tp.is_stop)
                    or (tc.ctype == "C" and not tc.is_stop)):
                composes.append((pcl, ccl))
        return merges, composes, by_clust

    def run_agenda(self, max_ops: int = 10_000):
        """Agenda.procAgenda (Agenda.py:211-257): score candidates,
        execute the best while it clears prior_cutoff; re-score only
        ops whose own clusters were touched (Agenda.py:302-361).
        Returns the executed-op log."""
        log = []
        scores: dict[tuple, float] = {}
        versions: dict[tuple, tuple] = {}
        while len(log) < max_ops:
            merges, composes, by_clust = self._candidates()
            par_ctx = self._parent_ctx()
            best, best_op = None, None
            for op in ([("M", a, b) for a, b in merges]
                       + [("C", a, b) for a, b in composes]):
                kind, a, b = op
                ver = (self.clusts[a].version, self.clusts[b].version,
                       a, b)
                if versions.get(op) != ver:
                    sc = (self.score_merge(a, b, par_ctx)
                          if kind == "M"
                          else self.score_compose(a, b, by_clust[a]))
                    if sc < self.p.drop_below:
                        sc = float("-inf")
                    scores[op] = sc
                    versions[op] = ver
                sc = scores[op]
                if sc >= self.p.prior_cutoff and (
                        best is None or sc > best
                        or (sc == best and op < best_op)):
                    best, best_op = sc, op
            if best_op is None:
                break
            kind, a, b = best_op
            if kind == "M":
                kept = self.exec_merge(a, b)
                log.append(("merge", a, b, kept, best))
            else:
                new_cid = self.exec_compose(
                    a, b, pairs=self.compose_pairs(a, b, by_clust[a]))
                log.append(("compose", a, b, new_cid, best))
            scores.pop(best_op, None)
            versions.pop(best_op, None)
        return log

    def induce(self):
        self.merge_args()
        return self.run_agenda()

    # ---------------- output ----------------

    def labels(self):
        """{(tree_key, token_i): cluster id}; tokens absorbed by a
        COMPOSE label with their composite part's cluster."""
        out = {}
        for node in self.parts.values():
            out[(node.tree_key, node.tok_i)] = node.clust
        for pid, key in self._absorbed_key.items():
            node = self._absorbed_parent[pid]
            while node.pid not in self.parts:
                node = self._absorbed_parent[node.pid]
            out[key] = node.clust
        return out

    def cluster_summary(self):
        rows = []
        for cid, cl in sorted(self.clusts.items()):
            for rt, c in sorted(cl.reltype_cnt.items()):
                rows.append((cid, rt, c, cl.ttl, len(cl.argclusts)))
        return rows


# --------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------

TREE_KEY_COLS = ("i", "lemma", "pos", "head", "dep")


def sentence_tree_classes(sents: DataFrame) -> DataFrame:
    """Collapse sentences into weighted distinct-parse-tree classes:
    ``(tree_key, weight, toks)``. The ONLY corpus-proportional pass —
    one groupBy on a canonical key; at 100 TB this is a single
    shuffle whose reduce side is the Zipf-bounded distinct-tree
    dictionary. ``text``/``url`` are projected away so the key is
    exactly the (pos,lemma) tree the reference's RelType strings
    see."""
    toks = F.transform(
        "tokens",
        lambda t: F.struct(*[t[c].alias(c) for c in TREE_KEY_COLS]))
    return (sents
            .select(toks.alias("toks"))
            .withColumn("tree_key", F.sha2(F.to_json("toks"), 256))
            .groupBy("tree_key")
            .agg(F.count("*").alias("weight"),
                 F.first("toks").alias("toks")))


def induce_usp(sents: DataFrame, params: UspParams | None = None,
               max_classes: int = 500_000):
    """End-to-end: distinct-tree classes (Spark) → exact weighted USP
    (driver, dictionary-bounded like canon.py's top-50k design) →
    per-token cluster assignments (Spark broadcast join).

    Returns ``(model, assignments)`` — assignments is a DataFrame
    ``(tree_key, i, clust)``. If the class dictionary exceeds
    ``max_classes`` the lowest-weight tail keeps its initial
    per-reltype clusters (documented cap; unassigned trees simply
    don't join)."""
    spark = sents.sparkSession
    classes = sentence_tree_classes(sents)
    rows = (classes.orderBy(F.desc("weight"), "tree_key")
            .limit(max_classes).collect())
    model = UspModel.from_trees(
        ((r["tree_key"], r["weight"],
          [t.asDict() for t in r["toks"]]) for r in rows), params)
    model.induce()
    lab = model.labels()
    out = spark.createDataFrame(
        [(k, i, c) for (k, i), c in sorted(lab.items())],
        "tree_key string, i int, clust int")
    return model, F.broadcast(out)


def model_tables(spark, model: UspModel) -> dict[str, DataFrame]:
    """The induced MLN state as DataFrames — the SURVEY §2.1 row-11
    equivalent of the reference's pickled global dicts
    (``MLN.save_mln``, MLN.py:47-63: Clust.clusts +
    relTypeIdx_clustIdx + part indices): ``clusters`` (one row per
    cluster×reltype), ``arg_clusters`` (per argclust totals),
    ``arg_cluster_argtypes`` / ``arg_cluster_children`` (the two
    multinomials the scorer reads), and ``parts`` (one row per
    dictionary class part). All bounded by the class dictionary, so
    they write as ordinary small parquet tables."""
    clusters, acs, ats, chd, parts = [], [], [], [], []
    for cid, cl in sorted(model.clusts.items()):
        for rt, c in sorted(cl.reltype_cnt.items()):
            clusters.append((cid, rt, c, cl.ttl, cl.root_w, cl.ctype,
                             cl.is_stop))
        for aci, ac in sorted(cl.argclusts.items()):
            acs.append((cid, aci, ac.ttl_arg, ac.part_w))
            for at, c in sorted(ac.argtype_cnt.items()):
                ats.append((cid, aci, at, c))
            for cc, c in sorted(ac.chd_cnt.items()):
                chd.append((cid, aci, cc, c))
    for pid in sorted(model.parts):
        n = model.parts[pid]
        parts.append((n.tree_key, n.tok_i, n.rel, n.clust, n.w,
                      n.parent.pid if n.parent is not None else None,
                      n.dep))
    return {
        "clusters": spark.createDataFrame(
            clusters, "clust int, reltype string, cnt bigint, "
                      "ttl bigint, root_w bigint, ctype string, "
                      "is_stop boolean"),
        "arg_clusters": spark.createDataFrame(
            acs, "clust int, aci int, ttl_arg bigint, part_w bigint"),
        "arg_cluster_argtypes": spark.createDataFrame(
            ats, "clust int, aci int, argtype string, cnt bigint"),
        "arg_cluster_children": spark.createDataFrame(
            chd, "clust int, aci int, chd_clust int, cnt bigint"),
        "parts": spark.createDataFrame(
            parts, "tree_key string, tok_i int, reltype string, "
                   "clust int, weight bigint, parent_pid bigint, "
                   "dep string"),
    }


def print_clustering(model: UspModel) -> str:
    """MLN.printClustering (MLN.py:28-45) text shape: one line per
    cluster — ``id [reltype:cnt, ...]`` — then one tab-indented line
    per argclust with its argtype counts and total."""
    out = ["=== Clustering ==="]
    for cid, cl in sorted(model.clusts.items()):
        rts = ",\t".join(f"{rt}:{c}"
                         for rt, c in sorted(cl.reltype_cnt.items()))
        out.append(f"{cid} [{rts}]")
        for aci, ac in sorted(cl.argclusts.items()):
            ats = ",".join(f"{at}:{c}"
                           for at, c in sorted(ac.argtype_cnt.items()))
            out.append(f"\t{aci}\t[{ats}]\t{ac.ttl_arg}")
    return "\n".join(out) + "\n"


def print_mln(model: UspModel) -> str:
    """MLN.printMLN (MLN.py:93-127) text shape: per cluster, each
    argclust's argnum / argtype / child-cluster count dicts."""
    out = []
    for cid, cl in sorted(model.clusts.items()):
        rts = ",\t".join(f"{rt}:{c}"
                         for rt, c in sorted(cl.reltype_cnt.items()))
        out.append(f"{cid}\t[{rts}]")
        for aci, ac in sorted(cl.argclusts.items()):
            out.append("\t{}: ".format(aci) + "\t".join(
                f"{k}: {v}" for k, v in sorted(ac.argnum_cnt.items())))
            out.append("\t" + "\t".join(
                f"{k}: {v}" for k, v in sorted(ac.argtype_cnt.items())))
            out.append("\t" + "\t".join(
                f"{k}: {v}" for k, v in sorted(ac.chd_cnt.items())))
    return "\n".join(out) + "\n"


def write_mln(model: UspModel, path: str) -> None:
    """MLN.printModel (MLN.py:18-26): write the ``.clustering`` and
    ``.mln`` text dumps."""
    import os

    os.makedirs(path, exist_ok=True)
    base = os.path.basename(os.path.normpath(path)) or "model"
    with open(os.path.join(path, base + ".clustering"), "w") as f:
        f.write(print_clustering(model))
    with open(os.path.join(path, base + ".mln"), "w") as f:
        f.write(print_mln(model))


def assign_clusters(sents: DataFrame, assignments: DataFrame,
                    model: UspModel | None = None) -> DataFrame:
    """Per-token cluster labels for a corpus: recompute each
    sentence's tree key and broadcast-join the class assignments.

    With ``model`` given, sentences whose tree class fell outside the
    agenda's dictionary budget (``max_classes``) are labeled too —
    with their INIT cluster (one per relation type, the pre-agenda
    assignment), fully distributed: the exact kept-token walk runs as
    an Arrow-batched UDF per sentence and the bounded
    reltype→cluster map broadcast-joins. This is the 100-TB contract:
    the greedy agenda refines the frequent structures; the long tail
    keeps first-order semantics instead of silently dropping."""
    toks = F.transform(
        "tokens",
        lambda t: F.struct(*[t[c].alias(c) for c in TREE_KEY_COLS]))
    keyed = (sents
             .withColumn("tree_key", F.sha2(F.to_json(toks), 256))
             .select("url", "sent_id", "tree_key", "tokens"))
    exploded = (keyed
                .select("url", "sent_id", "tree_key",
                        F.explode("tokens").alias("tok"))
                .select("url", "sent_id", "tree_key",
                        F.col("tok.i").alias("i"),
                        F.col("tok.lemma").alias("lemma"),
                        F.col("tok.pos").alias("pos")))
    hit = exploded.join(assignments, ["tree_key", "i"], "inner")
    if model is None:
        return hit
    spark = sents.sparkSession
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def kept_ids(tok_arrays: pd.Series) -> pd.Series:
        return tok_arrays.map(
            lambda ts: sorted(UspModel.kept_token_ids(
                [t if isinstance(t, dict) else dict(t) for t in ts])))

    rel_map = F.broadcast(spark.createDataFrame(
        sorted(model.rel_clust.items()), "rel string, clust int"))
    dict_keys = F.broadcast(
        assignments.select("tree_key").distinct())
    tail = (keyed
            .join(dict_keys, "tree_key", "left_anti")
            .withColumn("_kept", kept_ids("tokens"))
            .select("url", "sent_id", "tree_key", "_kept",
                    F.explode("tokens").alias("tok"))
            .filter(F.array_contains("_kept", F.col("tok.i")))
            .select("url", "sent_id", "tree_key",
                    F.col("tok.i").alias("i"),
                    F.col("tok.lemma").alias("lemma"),
                    F.col("tok.pos").alias("pos")))
    first_char = F.substring("pos", 1, 1)
    rel = F.concat(
        F.lit("("),
        F.when(first_char.isin(*CONTENT_POS), first_char)
         .otherwise(F.col("pos")),
        F.lit(":"), F.col("lemma"), F.lit(")"))
    # reltypes never seen in any dictionary class carry no model
    # cluster: explicit -1 sentinel ("unmodeled"), not a silent drop
    tail = (tail.withColumn("rel", rel)
            .join(rel_map, "rel", "left")
            .withColumn("clust", F.coalesce("clust", F.lit(-1)))
            .drop("rel"))
    return hit.unionByName(tail)
