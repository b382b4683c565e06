"""USP/MLN semantic clustering tests (operators/usp.py vs the
reference pymln semantics, Poon & Domingos 2009).

Oracle strategy:
* weighted-class arithmetic == expanded per-part corpus (the claim
  that lets the agenda run on a bounded dictionary),
* analytic merge scores == from-scratch ΔL around real execution
  (two independent implementations of the same math),
* hand-built planted corpora for MERGE / COMPOSE / conjunction
  penalty / mergeArgs behavior,
* Spark class extraction == pandas twin, end-to-end labeling.
"""
import math

import pytest

from multivac_spark.operators import usp
from multivac_spark.operators.usp import UspModel, UspParams


def T(i, lemma, pos, head, dep):
    """Token in the parser's convention (functions/parse.py): ``i``
    1-based, ``head`` = parent's 0-based POSITION, -1 for ROOT."""
    return {"i": i, "lemma": lemma, "pos": pos, "head": head,
            "dep": dep}


def svo(subj, verb, obj, dep_s="nsubj", dep_o="dobj"):
    """subject — verb(root) — object."""
    return [T(1, subj, "NN", 1, dep_s),
            T(2, verb, "VB", -1, "ROOT"),
            T(3, obj, "NN", 1, dep_o)]


def merge_corpus(n_ctx=10, w=1, verbs=("acquire", "purchase")):
    """Paraphrase verbs sharing n_ctx distinct noun contexts, plus a
    control verb with disjoint contexts."""
    trees = []
    k = 0
    for v in verbs:
        for j in range(n_ctx):
            trees.append((f"t{k}", w, svo(f"noun{j}", v, f"noun{(j + 1) % n_ctx}")))
            k += 1
    for j in range(n_ctx):
        trees.append((f"t{k}", w, svo(f"other{j}", "decline",
                                      f"other{(j + 1) % n_ctx}")))
        k += 1
    return trees


# ---------------------------------------------------------------
# construction
# ---------------------------------------------------------------

def test_ignored_dep_drops_subtree():
    toks = [T(1, "run", "VB", -1, "ROOT"),
            T(2, "the", "DT", 2, "det"),       # ignored edge
            T(3, "dog", "NN", 0, "nsubj"),
            T(4, "be", "VB", 0, "cop"),        # ignored edge
            T(5, "fast", "JJ", 3, "amod")]     # orphaned by the cop
    kept = UspModel.kept_token_ids(toks)
    assert kept == {1, 3}


def test_init_stats():
    m = UspModel.from_trees([("t0", 3, svo("dog", "chase", "cat"))])
    assert len(m.clusts) == 3
    vc = m.clusts[m.rel_clust["(V:chase)"]]
    assert vc.ttl == 3 and vc.root_w == 3
    assert len(vc.argclusts) == 2            # <nsubj>, <dobj>
    ac = vc.argclusts[vc.atype_acs["<nsubj>"]]
    assert ac.ttl_arg == 3 and ac.part_w == 3
    assert ac.chd_cnt == {m.rel_clust["(N:dog)"]: 3}
    assert math.isfinite(m.L_total())


def test_conj_counted():
    toks = svo("dog", "chase", "cat") + [T(4, "flee", "VB", 1, "conj_and")]
    m = UspModel.from_trees([("t0", 2, toks)])
    c1, c2 = m.rel_clust["(V:chase)"], m.rel_clust["(V:flee)"]
    assert m.conj_cnt[(min(c1, c2), max(c1, c2))] == 2


# ---------------------------------------------------------------
# score == ΔL (analytic vs from-scratch, around real execution)
# ---------------------------------------------------------------

def test_merge_score_is_delta_L():
    m = UspModel.from_trees(merge_corpus(w=2))
    m.merge_args()
    c1 = m.rel_clust["(V:acquire)"]
    c2 = m.rel_clust["(V:purchase)"]
    s = m.score_merge(min(c1, c2), max(c1, c2))
    before = m.L_total()
    m.exec_merge(min(c1, c2), max(c1, c2))
    assert m.L_total() - before == pytest.approx(s, abs=1e-9)


def test_merge_argclusts_score_is_delta_L():
    # one verb cluster with two same-shaped argclusts (<nsubj>, <agent>)
    trees = []
    for j in range(10):
        trees.append((f"a{j}", 2, svo(f"n{j}", "lift", f"n{(j + 1) % 10}")))
        trees.append((f"b{j}", 2, svo(f"n{j}", "lift", f"n{(j + 1) % 10}",
                                      dep_s="agent")))
    m = UspModel.from_trees(trees)
    cl = m.clusts[m.rel_clust["(V:lift)"]]
    a1 = cl.atype_acs["<nsubj>"]
    a2 = cl.atype_acs["<agent>"]
    s = m.score_merge_argclusts(cl, a1, a2)
    assert s > 0
    before = m.L_total()
    m.exec_merge_argclusts(cl, a1, a2)
    assert m.L_total() - before == pytest.approx(s, abs=1e-9)
    assert a2 not in cl.argclusts
    assert cl.atype_acs["<agent>"] == a1


def test_compose_score_matches_real_execution():
    trees = [(f"t{j}", 60, [T(1, "rate", "NN", -1, "ROOT"),
                            T(2, "interest", "NN", 0, "compound"),
                            T(3, f"rise{j}", "VB", 0, "dep")])
             for j in range(3)]
    m = UspModel.from_trees(trees)
    pc = m.rel_clust["(N:rate)"]
    cc = m.rel_clust["(N:interest)"]
    s = m.score_compose(pc, cc)            # dry-run (snapshot/restore)
    before = m.L_total()
    new_cid = m.exec_compose(pc, cc)       # real run on restored state
    assert m.L_total() - before == pytest.approx(s, abs=1e-9)
    new_cl = m.clusts[new_cid]
    assert "(N:rate (compound (N:interest)))" in new_cl.reltype_cnt
    assert new_cl.ttl == 180
    # interest left its cluster entirely
    assert cc not in m.clusts
    # absorbed tokens label with the composite cluster
    lab = m.labels()
    assert lab[("t0", 2)] == new_cid and lab[("t0", 1)] == new_cid


def test_dry_run_restores_state_exactly():
    trees = [(f"t{j}", 60, [T(1, "rate", "NN", -1, "ROOT"),
                            T(2, "interest", "NN", 0, "compound")])
             for j in range(2)]
    m = UspModel.from_trees(trees)
    pc, cc = m.rel_clust["(N:rate)"], m.rel_clust["(N:interest)"]
    before_L = m.L_total()
    before_labels = m.labels()
    before_parts = {pid: n.snap() for pid, n in m.parts.items()}
    m.score_compose(pc, cc)
    assert m.L_total() == pytest.approx(before_L)
    assert m.labels() == before_labels
    assert set(m.parts) == set(before_parts)
    for pid, s in before_parts.items():
        assert m.parts[pid].snap() == s


# ---------------------------------------------------------------
# behavior: MERGE / conj penalty / COMPOSE / mergeArgs
# ---------------------------------------------------------------

def test_agenda_merges_paraphrase_verbs_not_control():
    m = UspModel.from_trees(merge_corpus(w=2))
    log = m.induce()
    assert any(op[0] == "merge" for op in log)
    acq = m.rel_clust["(V:acquire)"]
    assert m.rel_clust["(V:purchase)"] == acq
    assert m.rel_clust["(V:decline)"] != acq


def test_conj_penalty_blocks_merge():
    trees = merge_corpus(w=2)
    # heavy acquire-conj-purchase evidence: dissimilarity signal
    for j in range(30):
        toks = svo(f"noun{j % 10}", "acquire", f"noun{(j + 1) % 10}") + [
            T(4, "purchase", "VB", 1, "conj_and")]
        trees.append((f"c{j}", 2, toks))
    m = UspModel.from_trees(trees)
    m.induce()
    assert m.rel_clust["(V:acquire)"] != m.rel_clust["(V:purchase)"]


def test_agenda_composes_frequent_collocation():
    trees = merge_corpus(w=2)
    for j in range(10):
        trees.append((f"r{j}", 12,
                      [T(1, "raise", "VB", -1, "ROOT"),
                       T(2, f"bank{j}", "NN", 0, "nsubj"),
                       T(3, "rate", "NN", 0, "dobj"),
                       T(4, "interest", "NN", 2, "compound")]))
    m = UspModel.from_trees(trees)
    log = m.induce()
    composed = [op for op in log if op[0] == "compose"]
    assert composed
    # the hot collocation ends up absorbed into one composite part —
    # children attach flat at the composed tree root, matching the
    # reference's TreeNode.addChild (Executor.py:110-112)
    comps = [rt for rt in m.rel_clust if "(compound (N:interest))" in rt]
    assert comps and all("(N:rate)" in rt or "N:rate" in rt
                         for rt in comps)
    new_cid = m.rel_clust[comps[0]]
    lab = m.labels()
    assert lab[("r0", 1)] == lab[("r0", 3)] == lab[("r0", 4)] == new_cid


def test_merge_args_folds_equivalent_roles():
    trees = []
    for j in range(10):
        trees.append((f"a{j}", 2, svo(f"n{j}", "lift", f"n{(j + 1) % 10}")))
        trees.append((f"b{j}", 2, svo(f"n{j}", "lift", f"n{(j + 1) % 10}",
                                      dep_s="agent")))
    m = UspModel.from_trees(trees)
    cl = m.clusts[m.rel_clust["(V:lift)"]]
    assert len(cl.argclusts) == 3
    m.merge_args()
    # <nsubj> and <agent> share the child-noun distribution → folded;
    # <dobj> has double mass and a shifted distribution — whatever the
    # greedy decides, the two subject roles must coincide
    assert cl.atype_acs["<nsubj>"] == cl.atype_acs["<agent>"]


# ---------------------------------------------------------------
# weighted classes == expanded corpus (the scale-enabling claim)
# ---------------------------------------------------------------

def _partition(m):
    """Cluster structure modulo cluster ids: reltype groups."""
    groups = {}
    for rt, c in m.rel_clust.items():
        groups.setdefault(c, set()).add(rt)
    return frozenset(frozenset(g) for g in groups.values())


def test_weighted_equals_expanded():
    weighted = merge_corpus(w=3)
    weighted += [(f"r{j}", 12,
                  [T(1, "raise", "VB", -1, "ROOT"),
                   T(2, f"bank{j}", "NN", 0, "nsubj"),
                   T(3, "rate", "NN", 0, "dobj"),
                   T(4, "interest", "NN", 2, "compound")])
                 for j in range(5)]
    expanded = [(f"{key}_copy{c}", 1, toks)
                for key, w, toks in weighted for c in range(w)]
    mw = UspModel.from_trees(weighted)
    me = UspModel.from_trees(expanded)
    assert me.L_total() == pytest.approx(mw.L_total(), abs=1e-6)
    lw = mw.induce()
    le = me.induce()
    assert [op[0] for op in lw] == [op[0] for op in le]
    for (k1, s1), (k2, s2) in zip(
            [(o[0], o[4]) for o in lw], [(o[0], o[4]) for o in le]):
        assert s1 == pytest.approx(s2, abs=1e-6)
    assert _partition(mw) == _partition(me)
    assert me.L_total() == pytest.approx(mw.L_total(), abs=1e-6)
    # per-token labels agree across every copy
    labw, labe = mw.labels(), me.labels()
    canon_w = {c: i for i, c in enumerate(
        sorted({v for v in labw.values()}))}
    canon_e = {c: i for i, c in enumerate(
        sorted({v for v in labe.values()}))}
    for key, w, toks in weighted:
        for c in range(w):
            for t in toks:
                i = t["i"]
                if (key, i) in labw:
                    assert (canon_w[labw[(key, i)]]
                            == canon_e[labe[(f"{key}_copy{c}", i)]])


# ---------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------

@pytest.fixture(scope="module")
def mini_sents(spark):
    from multivac_spark.sources import corpus, vocab
    from multivac_spark.functions.html_text import extract_text_stage
    from multivac_spark.functions.clean import clean_text_stage
    from multivac_spark.functions.parse import parse_stage

    docs = corpus.documents_df(spark, 40, partitions=4)
    lex = vocab.pos_lexicon()
    lemmas = dict(vocab.verb_lemma_table())
    for c, vs in vocab.noun_variants().items():
        for v in vs:
            lemmas.setdefault(v, c)
    cleaned = clean_text_stage(extract_text_stage(docs), frozenset(lex))
    return parse_stage(cleaned.filter("lang = 'en'"), lex,
                       lemmas).localCheckpoint()


def test_tree_classes_match_pandas_twin(spark, mini_sents):
    classes = usp.sentence_tree_classes(mini_sents).collect()
    pdf = mini_sents.select("tokens").toPandas()
    import collections
    twin = collections.Counter()
    for toks in pdf["tokens"]:
        twin[tuple((t["i"], t["lemma"], t["pos"], t["head"], t["dep"])
                   for t in toks)] += 1
    got = {tuple((t["i"], t["lemma"], t["pos"], t["head"], t["dep"])
                 for t in r["toks"]): r["weight"] for r in classes}
    assert got == dict(twin)
    assert sum(twin.values()) == mini_sents.count()


def test_induce_usp_end_to_end(spark, mini_sents):
    model, assignments = usp.induce_usp(
        mini_sents, UspParams(min_mc_cnt=3, min_abs_cnt=10))
    labeled = usp.assign_clusters(mini_sents, assignments)
    # every kept (non-ignored) token gets exactly one label
    rows = mini_sents.select("tokens").collect()
    kept_total = sum(
        r["weight"] * len(UspModel.kept_token_ids(
            [t.asDict() for t in r["toks"]]))
        for r in usp.sentence_tree_classes(mini_sents).collect())
    assert labeled.count() == kept_total
    # deterministic across repeated runs
    model2, assignments2 = usp.induce_usp(
        mini_sents, UspParams(min_mc_cnt=3, min_abs_cnt=10))
    a1 = sorted(map(tuple, assignments.collect()))
    a2 = sorted(map(tuple, assignments2.collect()))
    assert a1 == a2
    assert model.L_total() == pytest.approx(model2.L_total())
    # the broadcast-join plan stays broadcast (no SMJ on the label join)
    plan = labeled._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_tail_fallback_labels(spark, mini_sents):
    # tiny dictionary budget: most trees fall to the distributed
    # init-cluster fallback path
    model, assignments = usp.induce_usp(
        mini_sents, UspParams(min_mc_cnt=3, min_abs_cnt=10),
        max_classes=25)
    labeled = usp.assign_clusters(mini_sents, assignments, model)
    # coverage: every kept token everywhere gets a label
    kept_total = sum(
        r["weight"] * len(UspModel.kept_token_ids(
            [t.asDict() for t in r["toks"]]))
        for r in usp.sentence_tree_classes(mini_sents).collect())
    assert labeled.count() == kept_total
    # tail rows label with the model's init/merged cluster for their
    # relation type (or the explicit -1 unmodeled sentinel)
    dict_keys = {r["tree_key"] for r in assignments.select(
        "tree_key").distinct().collect()}
    from multivac_spark.operators.usp import token_type_str
    for r in labeled.collect()[:2000]:
        if r["tree_key"] in dict_keys:
            continue
        rel = f"({token_type_str(r['pos'], r['lemma'])})"
        assert r["clust"] == model.rel_clust.get(rel, -1)


def test_model_tables_and_mln_export(spark, tmp_path):
    trees = merge_corpus(w=2)
    m = UspModel.from_trees(trees)
    m.induce()
    tables = usp.model_tables(spark, m)
    # cluster mass reconciles with the parts table at every level
    ttl = {r["clust"]: r["ttl"] for r in tables["clusters"].collect()}
    from collections import Counter
    part_mass = Counter()
    for r in tables["parts"].collect():
        part_mass[r["clust"]] += r["weight"]
    assert dict(part_mass) == ttl
    # arg mass: every argclust total equals its argtype histogram sum
    at_sum = {(r["clust"], r["aci"]): 0 for r in
              tables["arg_clusters"].collect()}
    for r in tables["arg_cluster_argtypes"].collect():
        at_sum[(r["clust"], r["aci"])] += r["cnt"]
    for r in tables["arg_clusters"].collect():
        assert at_sum[(r["clust"], r["aci"])] == r["ttl_arg"]
    # text dumps in the reference's printModel shapes
    usp.write_mln(m, str(tmp_path / "model"))
    clustering = (tmp_path / "model" / "model.clustering").read_text()
    assert clustering.startswith("=== Clustering ===")
    acq = m.rel_clust["(V:acquire)"]
    line = next(ln for ln in clustering.splitlines()
                if ln.startswith(f"{acq} ["))
    assert "(V:acquire)" in line and "(V:purchase)" in line
    mln = (tmp_path / "model" / "model.mln").read_text()
    assert f"{acq}\t[" in mln
