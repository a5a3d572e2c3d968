"""Property tests for the round-6 text/dedup additions: random small-vocab
corpora checked against independent brute-force Python models (the same
layer-3 strategy as test_property_mvcc — model mirrors op, invariants hold
for every generated input)."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kausaldb_spark.functions import dedup as dd
from kausaldb_spark.functions import text as tx

import pytest

# r13: heavy gauntlet — opt-in via `-m scale` (see pytest.ini); the
# default driver verify run keeps the unit + oracle-parity suites
pytestmark = pytest.mark.scale

# small vocabulary forces shingle collisions and duplicated spans
_doc = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e"]), min_size=0, max_size=25
)
_corpus = st.lists(_doc, min_size=1, max_size=8)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _mk_docs(spark, corp, with_source=False):
    rows = [
        (i, " ".join(toks)) + (("s" + str(i % 2),) if with_source else ())
        for i, toks in enumerate(corp)
    ]
    schema = "doc_id long, text string" + (", source string" if with_source else "")
    return spark.createDataFrame(rows, schema)


def _brute_spans(corp, k):
    """Model: duplicated shingle positions merged by q <= p + k."""
    from collections import Counter

    # tokens() of the joined text: empty doc -> one '' token
    toked = [t if t else [""] for t in corp]
    counts = Counter(
        tuple(t[p : p + k]) for t in toked for p in range(len(t) - k + 1)
    )
    spans = {}
    for i, t in enumerate(toked):
        pos = [
            p for p in range(len(t) - k + 1) if counts[tuple(t[p : p + k])] >= 2
        ]
        merged = []  # (start, end, last_shingle_pos)
        for p in pos:
            if merged and p <= merged[-1][2] + k:  # overlap-or-adjacency chain
                merged[-1] = (merged[-1][0], p + k, p)
            else:
                merged.append((p, p + k, p))
        if merged:
            spans[i] = [(s, e) for s, e, _ in merged]
    return spans


@given(corp=_corpus)
@_SETTINGS
def test_duplicate_spans_matches_model(spark, corp):
    got = {}
    for r in dd.duplicate_spans(_mk_docs(spark, corp), k=3).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
        assert r["span_tokens"] == r["span_end"] - r["span_start"]
    got = {k: sorted(v) for k, v in got.items()}
    assert got == _brute_spans(corp, 3)


@given(corp=_corpus, chunk=st.integers(2, 6), overlap=st.integers(0, 3))
@_SETTINGS
def test_chunk_documents_invariants(spark, corp, chunk, overlap):
    if overlap >= chunk:
        overlap = chunk - 1
    stride = chunk - overlap
    rows = tx.chunk_documents(
        _mk_docs(spark, corp), chunk_tokens=chunk, overlap=overlap
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    toked = [t if t else [""] for t in corp]
    assert set(by_doc) == set(range(len(corp)))  # every doc chunks
    for i, t in enumerate(toked):
        cs = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        n = len(t)
        # chunk layout: stride starts, clipped final end, full coverage
        assert [c["chunk_idx"] for c in cs] == list(range(len(cs)))
        for j, c in enumerate(cs):
            assert c["start_tok"] == j * stride
            assert c["end_tok"] == min(j * stride + chunk, n)
            assert c["chunk_text"] == " ".join(t[c["start_tok"] : c["end_tok"]])
        assert cs[-1]["end_tok"] == n
        if n <= chunk:
            assert len(cs) == 1
        else:
            assert len(cs) == 1 + math.ceil((n - chunk) / stride)


@given(corp=_corpus, seq_len=st.integers(2, 8))
@_SETTINGS
def test_pack_offsets_matches_model(spark, corp, seq_len):
    rows = tx.pack_offsets(
        _mk_docs(spark, corp, with_source=True), seq_len=seq_len
    ).collect()
    toked = [t if t else [""] for t in corp]
    # model: per source shard, docs in doc_id order laid end-to-end
    shards = {}
    for i, t in enumerate(toked):
        shards.setdefault("s" + str(i % 2), []).append((i, len(t)))
    expect = {}
    for part, docs in shards.items():
        off = 0
        for i, n in docs:
            expect[i] = (part, n, off, off // seq_len, (off + max(n, 1) - 1) // seq_len)
            off += n
    got = {
        r["doc_id"]: (
            r["partition"], r["n_tokens"], r["global_start"],
            r["first_seq"], r["last_seq"],
        )
        for r in rows
    }
    assert got == expect


# -- normalize_text: random messy strings vs a brute-force Python model ------

_messy_char = st.sampled_from(
    list("ab c\t\n\r") + ["\x01", "\x0b", "\x7f", " ", "\n"]
)
_messy = st.lists(_messy_char, min_size=0, max_size=40).map("".join)


def _brute_normalize(s: str) -> str:
    import re

    s = re.sub(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "", s)
    s = re.sub(r"\r\n?", "\n", s)
    s = re.sub(r"[ \t]+", " ", s)
    s = re.sub(r" ?\n ?", "\n", s)
    s = re.sub(r"\n\n\n+", "\n\n", s)
    return s.strip(" ")


@given(st.lists(_messy, min_size=1, max_size=6))
@_SETTINGS
def test_normalize_text_properties(spark, texts):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", tx.normalize_text(F.col("text")).alias("n")
        ).collect()
    }
    for i, t in enumerate(texts):
        want = _brute_normalize(t)
        assert got[i] == want, (t, got[i], want)
        out = got[i]
        # invariants: no control bytes, no CR, no tabs, no runs
        assert not any(ord(c) < 32 and c != "\n" for c in out)
        assert "  " not in out and " \n" not in out and "\n " not in out
        assert "\n\n\n" not in out
        assert out == out.strip(" ")
        # idempotent
        assert _brute_normalize(out) == out
