"""GloVe trainer: co-occurrence oracle, distributed==local
bit-identity, loss descent, and semantic signal on a planted corpus.

Reference counterpart: ``trainEmbeddings.R`` (text2vec GloVe) +
``glove.py`` — the external embedding-training boundary the repo
previously covered with a synthesized input table.
"""

import numpy as np
import pytest

from multivac_spark.operators import glove_train as G

DOCS = [
    "the virus infects the cell",
    "the virus mutates quickly",
    "a cell contains a genome",
    "the genome encodes a protein",
    "the virus infects the host cell",
]


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.createDataFrame([(t,) for t in DOCS], "text string")
    return df.repartition(4).cache()


def _cooc_oracle(texts, vocab, window):
    """Independent per-document python count of the windowed
    co-occurrence with quantized 1/d weights."""
    idx = {w: i for i, w in enumerate(vocab)}
    out = {}
    for t in texts:
        toks = [w for w in t.lower().split() if w]
        for i, a in enumerate(toks):
            for d in range(1, window + 1):
                if i + d >= len(toks):
                    break
                b = toks[i + d]
                if a not in idx or b not in idx:
                    continue
                q = round(G.WEIGHT_SCALE / d)
                for key in ((idx[a], idx[b]), (idx[b], idx[a])):
                    out[key] = out.get(key, 0) + q
    return out


def test_top_vocab_deterministic(docs):
    v = G.top_vocab(docs, 6)
    # 'the' (7) > 'a' (3) > 'virus'/'cell' (3) ... ties by token asc
    assert v[0] == "the"
    assert v == sorted(v, key=lambda w: (-(" ".join(DOCS).lower()
                                           .split().count(w)), w))


def test_cooccurrence_matches_oracle(docs):
    vocab = G.top_vocab(docs, 8)
    got = {(r["wi"], r["wj"]): r["xq"]
           for r in G.build_cooccurrence(docs, vocab, window=3)
           .collect()}
    assert got == _cooc_oracle(DOCS, vocab, 3)
    # symmetric by construction
    assert all(got[(j, i)] == q for (i, j), q in got.items())


def test_distributed_training_bit_identical_to_local(spark, docs):
    vocab = G.top_vocab(docs, 8)
    cooc = G.build_cooccurrence(docs, vocab, window=3)
    # deliberately many small partitions: int64 cell accumulation is
    # partitioning-independent, so the trajectory must be IDENTICAL
    cooc = cooc.repartition(7)
    dist = G.train_glove(cooc, len(vocab), dim=8, epochs=3, lr=0.05)
    rows = np.array(sorted(map(tuple, cooc.collect())), dtype=np.int64)
    loc = G.train_glove_local(rows, len(vocab), dim=8, epochs=3,
                              lr=0.05)
    for a, b in zip(dist, loc):
        np.testing.assert_array_equal(a, b)


def test_loss_decreases(docs):
    vocab = G.top_vocab(docs, 8)
    texts_cooc = np.array(sorted(_cooc_oracle(DOCS, vocab, 3).items()),
                          dtype=object)
    rows = np.array([(i, j, q) for (i, j), q in texts_cooc],
                    dtype=np.int64)
    p0 = G.init_params(len(vocab), 8)
    l0 = G.glove_loss_local(rows, *p0)
    p5 = G.train_glove_local(rows, len(vocab), dim=8, epochs=5)
    l5 = G.glove_loss_local(rows, *p5)
    p20 = G.train_glove_local(rows, len(vocab), dim=8, epochs=20)
    l20 = G.glove_loss_local(rows, *p20)
    assert l5 < l0 and l20 < l5


def test_planted_cooccurrence_signal(spark):
    """Words that always co-occur end up closer (W+W̃ cosine) than
    words that never do — the semantic property the pipeline's
    mention-similarity stage relies on."""
    docs = spark.createDataFrame(
        [("alpha beta noise%d" % (i % 7),) for i in range(40)]
        + [("gamma delta noise%d" % (i % 7),) for i in range(40)],
        "text string")
    vocab = G.top_vocab(docs, 20)
    cooc = G.build_cooccurrence(docs, vocab, window=2)
    rows = np.array(sorted(map(tuple, cooc.collect())), dtype=np.int64)
    W, Wt, _, _ = G.train_glove_local(rows, len(vocab), dim=12,
                                      epochs=60, lr=0.1)
    V = W + Wt
    idx = {w: i for i, w in enumerate(vocab)}

    def cos(a, b):
        va, vb = V[idx[a]], V[idx[b]]
        return float(va @ vb / (np.linalg.norm(va)
                                * np.linalg.norm(vb)))

    assert cos("alpha", "beta") > cos("alpha", "delta")
    assert cos("gamma", "delta") > cos("beta", "gamma")


def test_embeddings_df_shape(spark, docs):
    vocab = G.top_vocab(docs, 5)
    rows = np.array([(0, 1, G.WEIGHT_SCALE)], dtype=np.int64)
    W, Wt, _, _ = G.train_glove_local(rows, len(vocab), dim=4,
                                      epochs=1)
    df = G.embeddings_df(spark, vocab, W, Wt)
    got = {r["token"]: r["vector"] for r in df.collect()}
    assert set(got) == set(vocab)
    np.testing.assert_allclose(got[vocab[0]], (W + Wt)[0], rtol=1e-6)


def test_trained_vectors_drive_entity_clustering(spark):
    """End-to-end replacement of the embeddings input table: GloVe
    vectors trained in-engine feed canon.cluster_entities directly
    (same (token, vector) schema), and mentions built from
    co-occurring words cluster together."""
    from multivac_spark.operators import canon

    docs = spark.createDataFrame(
        [("alpha beta filler%d" % (i % 5),) for i in range(60)]
        + [("gamma delta filler%d" % (i % 5),) for i in range(60)],
        "text string")
    vocab = G.top_vocab(docs, 20)
    cooc = G.build_cooccurrence(docs, vocab, window=2)
    W, Wt, _, _ = G.train_glove(cooc, len(vocab), dim=12, epochs=60,
                                lr=0.1)
    emb = G.embeddings_df(spark, vocab, W, Wt)
    assert dict(emb.dtypes) == {"token": "string",
                                "vector": "array<float>"}
    mentions = spark.createDataFrame(
        [("alpha beta",), ("beta alpha",), ("gamma delta",)],
        "mention string")
    out = canon.cluster_entities(mentions, emb, threshold=0.2)
    labels = {r["mention"]: r["label"] for r in out.collect()}
    assert labels["alpha beta"] == labels["beta alpha"]
    assert labels["alpha beta"] != labels["gamma delta"]
