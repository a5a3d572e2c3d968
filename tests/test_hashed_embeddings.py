"""Feature-hashing vectorization pins (similarity.hashed_features /
hashed_embeddings). The sparse relation is oracle-gated corpus-wide
(driver entry `hashed_features`); these pin the dense assembly, the
normalization contract, and the composition with the ANN family."""

import math

import pytest

from kausaldb_spark.functions import similarity as sm


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "alpha beta gamma alpha"),
        (2, "beta beta delta"),
        (3, "alpha beta gamma alpha"),  # duplicate of 1
        (4, ""),                        # empty text -> one '' token
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dense_matches_sparse(spark, docs):
    d = 16
    sparse = {
        (r["doc_id"], r["dim"]): r["weight"]
        for r in sm.hashed_features(docs, d=d).collect()
    }
    dense = {
        r["doc_id"]: list(r["embedding"])
        for r in sm.hashed_embeddings(docs, d=d, normalize=False).collect()
    }
    assert set(dense) == {1, 2, 3, 4}
    for doc_id, vec in dense.items():
        assert len(vec) == d
        for i, v in enumerate(vec):
            assert v == float(sparse.get((doc_id, i), 0)), (doc_id, i)


def test_l2_normalization_and_duplicate_docs_identical(spark, docs):
    out = {
        r["doc_id"]: list(r["embedding"])
        for r in sm.hashed_embeddings(docs, d=16).collect()
    }
    for doc_id in (1, 2, 3):
        n = math.sqrt(sum(v * v for v in out[doc_id]))
        assert abs(n - 1.0) < 1e-6
    assert out[1] == out[3]  # identical text -> identical embedding
    assert out[1] != out[2]


def test_weights_are_signed_occurrence_sums(spark, docs):
    # 'alpha' appears twice in doc 1: its dimension's |weight| contribution
    # is 2; with d large enough that test tokens don't collide, each
    # token's weight is exactly (sign * tf)
    d = 4096
    rows = sm.hashed_features(docs, d=d).where("doc_id = 1").collect()
    mags = sorted(abs(r["weight"]) for r in rows)
    assert mags == [1, 1, 2]  # beta, gamma, alpha(x2)


def test_feeds_ann_family(spark, docs):
    emb = sm.hashed_embeddings(docs, d=32).withColumnRenamed(
        "doc_id", "vec_id"
    )
    top = sm.dot_topk(emb, [1], k=2).collect()
    # doc 3 is a verbatim duplicate of doc 1: its normalized embedding is
    # identical, so it must rank first with the maximal quantized dot
    assert top[0]["neighbor_id"] == 3
    assert top[0]["dot"] >= top[1]["dot"]


def test_determinism(spark, docs):
    a = sorted(map(tuple, sm.hashed_features(docs, d=16).collect()))
    b = sorted(map(tuple, sm.hashed_features(docs, d=16).collect()))
    assert a == b


def test_fully_cancelled_doc_yields_zero_vector(spark):
    """r11 ADVICE: hashed_features drops weight-0 rows, so a doc whose
    features fully cancel has no sparse rows — the dense side must still
    emit it (left-joined back to the corpus ids) as the zero vector, or
    the doc silently vanishes from every ANN consumer. 'ak' and 'an'
    land in the same dim of d=8 with opposite md5 signs."""
    docs = spark.createDataFrame(
        [(1, "ak an"), (2, "alpha beta")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: list(r["embedding"])
        for r in sm.hashed_embeddings(docs, d=8).collect()
    }
    assert set(out) == {1, 2}
    assert out[1] == [0.0] * 8        # cancelled -> zero vector, kept
    assert any(v != 0.0 for v in out[2])
    # unnormalized path keeps the same contract
    raw = {
        r["doc_id"]: list(r["embedding"])
        for r in sm.hashed_embeddings(docs, d=8, normalize=False).collect()
    }
    assert raw[1] == [0.0] * 8
