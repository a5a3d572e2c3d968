"""LSH robustness: degenerate corpora must not go quadratic (bucket caps),
and the 64-bit banded SimHash must find near pairs the 16-bit exact join
can only find at distance 0."""

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR
from kausaldb_spark.functions import dedup as dd
from kausaldb_spark.functions import similarity as sim
from kausaldb_spark.functions.text import simhash64, tokens

# r13: heavy gauntlet — opt-in via `-m scale` (see pytest.ini); the
# default driver verify run keeps the unit + oracle-parity suites
pytestmark = pytest.mark.scale


@pytest.fixture(scope="module")
def degenerate_corpus(spark):
    """600 identical docs + a handful of distinct ones — the pathological
    bucket every LSH scheme must survive."""
    same = spark.range(0, 600).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text repeated in every document body").alias("text"),
    )
    distinct = spark.range(600, 610).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique document number "), F.col("id").cast("string"),
                 F.lit(" with its own words entirely")).alias("text"),
    )
    return same.unionByName(distinct)


def test_minhash_bucket_cap_bounds_degenerate_corpus(degenerate_corpus):
    """With the cap, the 600-doc identical bucket is dropped: candidate
    generation stays bounded instead of emitting ~180k pairs."""
    capped = dd.minhash_pairs_for(degenerate_corpus, max_bucket_size=500)
    assert capped.count() == 0
    # a cap above the bucket size keeps the pairs (cap is the only change)
    uncapped = dd.minhash_pairs_for(
        degenerate_corpus.where(F.col("doc_id") < 20), max_bucket_size=10_000
    )
    assert uncapped.count() == 20 * 19 // 2


def test_capped_buckets_surfaces_dropped(spark, degenerate_corpus):
    bands = dd._wide_signature_buckets(degenerate_corpus)
    kept, dropped = dd.capped_buckets(bands, 500)
    drops = dropped.collect()
    assert len(drops) == 4  # all 4 bands of the identical docs overflow
    assert all(r["_bucket_n"] == 600 for r in drops)
    # kept rows exclude the oversized buckets entirely
    assert kept.count() == bands.count() - 4 * 600


def test_embedding_near_dup_bucket_cap(spark):
    """500 identical embeddings in one sign bucket: capped join returns
    nothing instead of 125k pairs."""
    vec = F.array(*[F.lit(0.5)] * 8).cast("array<float>")
    emb = spark.range(0, 500).select(F.col("id").alias("vec_id"), vec.alias("embedding"))
    capped = sim.embedding_near_duplicates(emb, min_dot=0, max_bucket_size=100)
    assert capped.count() == 0
    small = sim.embedding_near_duplicates(emb.where(F.col("vec_id") < 10), min_dot=0,
                                          max_bucket_size=100)
    assert small.count() == 10 * 9 // 2


def test_simhash_band_finds_near_misses(spark, tmp_path):
    """A doc pair differing by one rare word is hamming-near but not
    hamming-0: the banded 64-bit path must pair them, and the hamming it
    reports must equal bit_count over the packed 64-bit signatures."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon " * 3)
    rows = [(1, base), (2, base + " extraword"), (3, "another text entirely different")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "docs")
    docs.write.parquet(f"{d}/documents.parquet")

    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dd.simhash_band_pairs(spark, d, max_hamming=8).collect()
    }
    # the planted near-miss pair must appear (small, possibly-nonzero distance)
    assert (1, 2) in pairs, pairs
    # cross-check the reported hamming against the packed bigint signature
    sigs = {
        r["doc_id"]: r["sig"]
        for r in docs.select("doc_id", simhash64(tokens(F.col("text"))).alias("sig")).collect()
    }
    expect = bin((sigs[1] ^ sigs[2]) & (2**64 - 1)).count("1")
    assert pairs[(1, 2)] == expect


def test_select_canonical_keeps_best_quality(spark):
    """Quality-weighted keep-rule: highest score wins the cluster; ties break
    to the smallest id; every member appears exactly once."""
    from kausaldb_spark.functions.dedup import select_canonical

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, cluster_id long",
    )
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (10, 0.5), (11, 0.5)],
        "doc_id long, score double",
    )
    out = {r["doc_id"]: r for r in select_canonical(clusters, scores).collect()}
    assert len(out) == 5
    # cluster 1: docs 2 and 3 tie at 0.9 -> smaller id (2) wins
    assert [out[i]["is_canonical"] for i in (1, 2, 3)] == [0, 1, 0]
    # cluster 10: tie at 0.5 -> doc 10 wins
    assert [out[i]["is_canonical"] for i in (10, 11)] == [1, 0]
    # exactly one canonical per cluster
    from collections import Counter

    per = Counter(r["cluster_id"] for r in out.values() if r["is_canonical"])
    assert per == {1: 1, 10: 1}


def test_duplicate_spans_semantics(spark):
    """Substring-level dedup: shared prefixes merge into one maximal span,
    self-repetition is caught, unique docs produce nothing, and chaining
    uses overlap-or-adjacency (q <= p + k)."""
    from kausaldb_spark.functions.dedup import duplicate_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),      # shares a..h with doc 2
            (2, "a b c d e f g h x y"),
            (3, "q r s t u v w z1 z2"),      # unique -> no spans
            (4, "m m m m m m m m m m m m"),  # self-repetition covers all
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["span_start"]): (r["span_end"], r["span_tokens"])
        for r in duplicate_spans(docs, k=4).collect()
    }
    assert out == {
        (1, 0): (8, 8),
        (2, 0): (8, 8),
        (4, 0): (12, 12),
    }
    # disjoint duplicated regions stay separate spans (gap > k)
    docs2 = spark.createDataFrame(
        [
            (1, "p1 p2 p3 p4 u1 u2 u3 u4 u5 s1 s2 s3 s4"),
            (2, "p1 p2 p3 p4 v1 v2 v3 v4 v5 s1 s2 s3 s4"),
        ],
        "doc_id long, text string",
    )
    spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(docs2, k=4).collect()
    )
    assert spans == [(1, 0, 4), (1, 9, 13), (2, 0, 4), (2, 9, 13)]


def test_remove_duplicate_spans_reassembly(spark):
    """The removal half: surviving tokens reassemble in order, a fully-
    duplicated doc comes back empty (but present), untouched docs come
    back whole with normalized whitespace, and counts reconcile."""
    from kausaldb_spark.functions.dedup import remove_duplicate_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),       # span [0,8) -> keeps 'i j'
            (2, "a b c d e f g h x y"),       # span [0,8) -> keeps 'x y'
            (3, "q r s  t\tu v w z1 z2"),     # unique -> kept, ws normalized
            (4, "m m m m m m m m m m m m"),   # fully duplicated -> empty
            (5, ""),                          # empty doc -> one '' token
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["text_clean"], r["n_kept"], r["n_removed"])
        for r in remove_duplicate_spans(docs, k=4).collect()
    }
    assert out[1] == ("i j", 2, 8)
    assert out[2] == ("x y", 2, 8)
    assert out[3] == ("q r s t u v w z1 z2", 9, 0)
    assert out[4] == ("", 0, 12)
    assert out[5] == ("", 1, 0)  # split('') is [''], never span-covered
    assert set(out) == {1, 2, 3, 4, 5}
    # disjoint spans: the middle unique run survives between two removals
    docs2 = spark.createDataFrame(
        [
            (1, "p1 p2 p3 p4 u1 u2 u3 u4 u5 s1 s2 s3 s4"),
            (2, "p1 p2 p3 p4 v1 v2 v3 v4 v5 s1 s2 s3 s4"),
        ],
        "doc_id long, text string",
    )
    out2 = {
        r["doc_id"]: (r["text_clean"], r["n_kept"], r["n_removed"])
        for r in remove_duplicate_spans(docs2, k=4).collect()
    }
    assert out2[1] == ("u1 u2 u3 u4 u5", 5, 8)
    assert out2[2] == ("v1 v2 v3 v4 v5", 5, 8)


# ---------------------------------------------------------------------------
# incremental dedup: new batch vs corpus index
# ---------------------------------------------------------------------------

def _inc_fixture(spark):
    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "toward the green hills beyond the quiet river")
    corpus = spark.createDataFrame(
        [
            (1, base),
            (2, "completely different corpus text about spark shuffles and "
                "partition pruning over columnar storage layouts"),
            (3, "a third unrelated document mentioning streaming watermarks "
                "and stateful session windows in structured streaming"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (101, base),                                    # exact copy of 1
            (102, base.replace("lazy", "sleepy")),          # near copy of 1
            (103, "entirely fresh content on gumbel top k sampling with "
                  "deterministic md5 derived uniforms for reproducibility"),
            (104, "completely different corpus text about spark shuffles and "
                  "partition pruning over columnar storage layouts"),  # copy of 2
        ],
        "doc_id long, text string",
    )
    return corpus, new


def test_near_dup_vs_corpus_flags_only_cross_pairs(spark):
    from kausaldb_spark.functions import dedup as dd

    corpus, new = _inc_fixture(spark)
    pairs = dd.near_dup_vs_corpus(new, corpus).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (101, 1) in got and (104, 2) in got
    assert (102, 1) in got  # near copy passes the 0.7 jaccard bar
    assert all(a > 100 and b < 100 for a, b in got)  # cross pairs only
    assert not any(a == 103 for a, _ in got)


def test_filter_new_against_corpus_and_precomputed_index(spark):
    from kausaldb_spark.functions import dedup as dd

    corpus, new = _inc_fixture(spark)
    kept = dd.filter_new_against_corpus(new, corpus)
    assert {r["doc_id"] for r in kept.collect()} == {103}
    # precomputed index path produces the identical decision (the
    # steady-state shape: corpus hashed once, reused per batch)
    idx = dd.minhash_index(corpus).persist()
    try:
        kept2 = dd.filter_new_against_corpus(new, corpus, index=idx)
        assert {r["doc_id"] for r in kept2.collect()} == {103}
        pairs = dd.near_dup_vs_corpus(new, corpus, index=idx)
        assert pairs.count() == dd.near_dup_vs_corpus(new, corpus).count()
    finally:
        idx.unpersist()


def test_near_dup_vs_corpus_caps_degenerate_buckets(spark):
    from kausaldb_spark.functions import dedup as dd

    # 30 identical corpus docs = one degenerate bucket set; with a cap of 5
    # the bucket is dropped and an identical new doc sails through —
    # the quadratic guard applies to the corpus side exactly like the
    # self-join path (visibility via capped_buckets is the caller's job)
    text = "identical boilerplate row repeated across the whole corpus batch"
    corpus = spark.createDataFrame(
        [(i, text) for i in range(30)], "doc_id long, text string"
    )
    new = spark.createDataFrame([(101, text)], "doc_id long, text string")
    pairs = dd.near_dup_vs_corpus(new, corpus, max_bucket_size=5)
    assert pairs.count() == 0
    pairs_uncapped = dd.near_dup_vs_corpus(new, corpus, max_bucket_size=500)
    assert pairs_uncapped.count() == 30


def test_source_overlap_matrix_crafted(spark):
    """Two sources sharing exactly one 8-gram, a third sharing nothing:
    the matrix row carries the exact shared count, per-side totals, and
    ppm of the smaller side."""
    from kausaldb_spark.functions import dedup as dd

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, shared + " iota kappa", "src_a"),
            (2, "prefix " + shared, "src_b"),
            (3, "totally different words here nothing matches at all", "src_c"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in dd.source_ngram_overlap(docs).collect()
    }
    assert set(rows) == {("src_a", "src_b")}
    r = rows[("src_a", "src_b")]
    # src_a: 10 tokens -> 3 distinct 8-grams; src_b: 9 tokens -> 2; 1 shared
    assert (r["n_shared"], r["n_a"], r["n_b"]) == (1, 3, 2)
    assert r["ppm_of_smaller"] == 1_000_000 // 2


def test_minhash_n_hashes_over_seed_count_fails_loudly(spark):
    # r10 ADVICE: MIX_A has exactly 8 seed constants; n_hashes beyond that
    # used to read past the seed array (NULL signatures non-ANSI, a throw
    # under ANSI) — both entry points must refuse consistently instead
    from kausaldb_spark.functions import dedup as dd
    import pytest

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    sh = dd.doc_shingles(corpus)
    with pytest.raises(ValueError, match="seed"):
        dd.minhash_signatures(sh, n_hashes=9)
    with pytest.raises(ValueError, match="seed"):
        dd._wide_signature_buckets(corpus, n_hashes=16)
    # the supported widths still work
    assert dd.minhash_signatures(sh, n_hashes=8).count() == 8


def test_inrow_signature_buckets_match_grouped_formulation(spark):
    """r12 opt round pin: _wide_signature_buckets computes the whole
    signature IN-ROW (no exploded shingle relation, no shuffle); its
    (doc_id, band, bucket) rows must be identical to banding the original
    explode+groupBy minhash_signatures output — including dropping docs
    with zero shingles (< 3 tokens), which explode dropped implicitly."""
    import hashlib

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta"),          # < 3 tokens: zero 3-shingles
            (3, ""),                    # empty: zero shingles
            (4, "x y z w v u t s r q"),
            (5, "alpha beta gamma delta epsilon"),  # identical to 1
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["band"]): r["bucket"]
        for r in dd._wide_signature_buckets(corpus).collect()
    }
    sigs: dict[int, dict[int, int]] = {}
    for r in dd.minhash_signatures(dd.doc_shingles(corpus)).collect():
        sigs.setdefault(r["doc_id"], {})[r["k"]] = r["minh"]
    expected = {}
    for doc, by_k in sigs.items():
        for band in range(len(by_k) // 2):
            lo, hi = sorted((by_k[2 * band], by_k[2 * band + 1]))
            expected[(doc, band)] = hashlib.md5(
                f"{lo}|{hi}".encode()
            ).hexdigest()
    assert got == expected
    assert not any(d in (2, 3) for d, _ in got)  # zero-shingle docs absent
    # identical docs share every bucket (the LSH property the index uses)
    assert all(got[(1, b)] == got[(5, b)] for b in range(4))
