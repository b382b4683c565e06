"""Trained BPE sub-word tokenization (operators/subword.py): merge
learning on hand-checked fixtures, local-vs-distributed trainer
identity, the greedy-leftmost overlap rule, and per-doc counting with
OOV fallback."""

from __future__ import annotations

from pyspark.sql import functions as F

from multivac_spark.operators import subword


def test_train_bpe_local_hand_fixture():
    """Classic BPE example: with 'low'×5 and 'lower'×2 the first
    merges are (l,o) then (lo,w) — pair counts are weighted by word
    count and ties break lexicographically."""
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = subword.train_bpe_local(wc, 4)
    # (l,o): 7, (o,w): 7, (e,s): 9, (s,t): 9, (w,e): 2+6 ... recompute:
    # e-s 9, s-t 9 tie → (e,s) first lexicographically; after es: (es,t) 9
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    # next: l-o 7, o-w 7 → (l,o); then (lo,w) 7
    assert merges[2] == ("l", "o")
    assert merges[3] == ("lo", "w")


def test_train_bpe_greedy_leftmost_overlap():
    """'a a a a' under merge (a,a): leftmost-nonoverlapping gives
    [aa, aa], and 'a a a' gives [aa, a] — the BPE occurrence rule the
    replace()-based application must honor."""
    merges = subword.train_bpe_local([("aaaa", 3), ("aaa", 1)], 1)
    assert merges == [("a", "a")]
    s = "··" + "··".join("aaaa") + "··"
    pat, rep = subword._merge_pat("a", "a")
    assert [x for x in s.replace(pat, rep).split("··") if x] == ["aa", "aa"]
    s3 = "··" + "··".join("aaa") + "··"
    assert [x for x in s3.replace(pat, rep).split("··") if x] == ["aa", "a"]


def test_train_bpe_distributed_matches_local(spark):
    """The per-merge-agg distributed trainer and the driver-local
    histogram trainer produce the IDENTICAL merge sequence (same
    counts, same tie-breaks)."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["the lower tower shows the low power",
             "newest widest lowest low low tower",
             "she sells sea shells by the sea shore",
             "power tower lower flower"] * 3)],
        "doc_id long, text string")
    wc = subword.word_histogram(docs)
    local = subword.train_bpe_local(
        [(r["word"], r["cnt"]) for r in wc.collect()], 10)
    dist = subword.train_bpe_distributed(wc, 10)
    assert dist == local and len(local) == 10


def test_subword_token_counts_and_oov_fallback(spark):
    """Per-doc counts: n_words = pre-tokenizer pieces; n_subwords sums
    the merged unit counts; a word absent from the training vocabulary
    (or containing the separator char) costs its character length."""
    train = spark.createDataFrame(
        [(0, "aa aa aa aa bb")], "doc_id long, text string")
    wc = subword.word_histogram(train)
    merges = subword.train_bpe_local(
        [(r["word"], r["cnt"]) for r in wc.collect()], 2)
    # vocab: 'aa'(1) + ' aa'(3) + ' bb'(1); merges learn (a,a) etc.
    score = spark.createDataFrame(
        [(1, "aa aa"),              # all in-vocab, fully merged
         (2, "zzzz"),               # OOV → char length 4
         (3, "")],                  # empty doc → 0/0
        "doc_id long, text string")
    out = {r["doc_id"]: (r["n_words"], r["n_subwords"])
           for r in subword.subword_token_counts(score, merges, wc)
           .collect()}
    assert out[3] == (0, 0)
    assert out[2] == (1, 4)
    n_words, n_sub = out[1]
    assert n_words == 2                  # 'aa', ' aa'
    assert n_sub <= 3                    # merged below char count (4)


def test_seg_init_spark_matches_python(spark):
    """The Column-side segmentation encoding equals the Python-side
    one (char-exact, incl. the space-prefixed pretoken form)."""
    words = ["low", " the", "a", "x·y"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r["word"]: r["s"] for r in df.select(
        "word", subword._seg_init(F.col("word")).alias("s")).collect()}
    for w in words:
        assert got[w] == "··" + "··".join(w) + "··"
