"""Property-based tests (hypothesis) for the pure kernels."""

import numpy as np
from hypothesis import given, settings, strategies as st

from multivac_spark.functions.clean import clean_document
from multivac_spark.functions.html_text import extract_article_text
from multivac_spark.functions.parse import parse_tokens, tokenize
from multivac_spark.functions.svo import extract_svo
from multivac_spark.operators.canon import average_linkage_labels
from multivac_spark.plans.pipeline import default_lexicons
from multivac_spark.sources import vocab

LEX, LEMMAS = default_lexicons()
LEXSET = frozenset(LEX)

words = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1,
                max_size=12)
texts = st.lists(words, min_size=0, max_size=60).map(" ".join)


@given(texts)
@settings(max_examples=200, deadline=None)
def test_cleaner_never_crashes_and_is_idempotent_on_clean_text(t):
    once = clean_document(t, LEXSET)
    # cleaning output contains no cleaner targets → stable under re-clean
    twice = clean_document(once, LEXSET)
    assert isinstance(once, str)
    assert twice == clean_document(twice, LEXSET)


@given(texts)
@settings(max_examples=200, deadline=None)
def test_parser_total_and_svo_never_crashes(t):
    for w in [tokenize(s) for s in [t] if s]:
        toks = parse_tokens(w, LEX, LEMMAS)
        assert len(toks) == len(w)
        # exactly one root
        assert sum(1 for x in toks if x["head"] == -1) <= 1
        # heads in range
        assert all(-1 <= x["head"] < len(toks) for x in toks)
        for _, s, p, o in extract_svo(toks):
            assert s and p and o


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=100, deadline=None)
def test_html_extractor_total_on_arbitrary_bytes(b):
    out = extract_article_text(b)
    assert out is None or isinstance(out, str)


# alphabet stressing the citation pattern's dot contexts ("et al.?",
# ", p.? [0-9]+"), its separators, and year literals
_cite_chunks = st.sampled_from([
    "Smith", "et al", "et al.", "and Jones", "& Li", "2019", "1999a",
    "(", ")", ";", ":", "?", "[", "]", ",", ", p", ", p.", " 12",
    "19", "20", "&", "-", " ", "viral genome", "@", "/", "\\", "e.g.",
])
cite_texts = st.lists(_cite_chunks, min_size=0, max_size=25).map("".join)


@given(cite_texts)
@settings(max_examples=300, deadline=None)
def test_citation_split_sub_exactly_matches_direct(t):
    """The segment-split fast path of the in-text-citation sub is
    byte-identical to running the reference regex over the whole
    document (the exactness argument in clean.py:_CITE_SEP)."""
    from multivac_spark.functions.clean import RE_INTEXT_CITE, \
        _sub_intext_cite
    assert _sub_intext_cite(t) == RE_INTEXT_CITE.sub(" Citation ", t)


_sent_words = st.lists(st.sampled_from(
    ["virus", "cell", "genome", "protein", "membrane", "assay",
     "binding", "network", "model", "system"]), min_size=1, max_size=8)


@given(st.lists(_sent_words, min_size=1, max_size=12),
       st.integers(0, 10**6))
@settings(max_examples=100, deadline=None)
def test_textrank_scores_properties(sents, seed):
    """Damped PageRank invariants: mass ~1, all scores positive,
    scores invariant under sentence permutation (up to reindexing)."""
    from multivac_spark.operators.textrank import textrank_scores

    s = textrank_scores(sents)
    assert len(s) == len(sents)
    # positive scores, bounded mass (exactly 1 when no sentence is
    # dangling; dangling vertices keep only their (1-d)/n share —
    # standard PageRank behavior, ordering is what TextRank consumes)
    assert (s > 0).all()
    assert s.sum() <= 1.0 + 1e-6
    rng = np.random.RandomState(seed)
    perm = rng.permutation(len(sents))
    s2 = textrank_scores([sents[i] for i in perm])
    assert np.allclose(s2, s[perm], atol=1e-8)


@given(st.integers(2, 30), st.integers(0, 10**6))
@settings(max_examples=50, deadline=None)
def test_average_linkage_labels_valid_partition(m, seed):
    rng = np.random.RandomState(seed)
    X = rng.standard_normal((m, 8))
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    labels = average_linkage_labels(Xn, threshold=0.3)
    assert len(labels) == m
    # labels are representative row indices
    assert all(0 <= l < m for l in labels)
    # a representative belongs to its own cluster
    for l in set(labels.tolist()):
        assert labels[l] == l
