"""Similarity search: exact brute-force invariants, LSH/IVF recall against
the exact baseline, and the float-cosine helper."""

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR
from kausaldb_spark.functions import similarity as sim

QIDS = list(range(10))


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()


def _topk_map(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append(r["neighbor_id"])
    return out


def test_dot_topk_exact_invariants(emb):
    got = sim.dot_topk(emb, QIDS, k=5)
    rows = got.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append((r["rank"], r["dot"], r["neighbor_id"]))
    assert set(per_q) == set(QIDS)
    for q, lst in per_q.items():
        lst.sort()
        assert [r for r, _, _ in lst] == [1, 2, 3, 4, 5]
        dots = [d for _, d, _ in lst]
        assert dots == sorted(dots, reverse=True)  # ranked by score
        assert all(n != q for _, _, n in lst)      # self excluded


def test_ivf_recall_vs_exact(emb):
    exact = _topk_map(sim.dot_topk(emb, QIDS, k=5))
    approx = _topk_map(sim.ivf_topk(emb, QIDS, k=5, n_clusters=16, n_probe=8))
    recalls = [
        len(set(exact[q]) & set(approx.get(q, []))) / 5 for q in QIDS
    ]
    # probing half the centroids on random unit vectors: most true neighbors
    # should be found (they concentrate in the query's nearby cells)
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_ivf_full_probe_equals_exact(emb):
    """Probing every centroid must recover the exact result — the IVF
    index is lossless at n_probe == n_clusters."""
    exact = _topk_map(sim.dot_topk(emb, QIDS, k=5))
    full = _topk_map(sim.ivf_topk(emb, QIDS, k=5, n_clusters=8, n_probe=8))
    assert exact == full


def test_float_cosine_selfsim(spark, emb):
    a = emb.limit(3).select(
        "vec_id", sim.float_cosine(F.col("embedding"), F.col("embedding")).alias("c")
    )
    for r in a.collect():
        assert abs(r["c"] - 1.0) < 1e-6
