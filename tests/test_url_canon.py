"""URL canonicalization pins (text.canonical_url). The driver entry
hash-gates the full chain cross-engine on the corpus; these pin each rule
on crafted URLs plus the idempotence property."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kausaldb_spark.functions import text as tx

CASES = [
    # (input, canonical)
    ("HTTP://WWW.Example.COM/Path", "http://www.example.com/Path"),
    ("https://user:pw@Host.org/x", "https://host.org/x"),
    ("http://h.io:80/a", "http://h.io/a"),
    ("https://h.io:443/a", "https://h.io/a"),
    ("http://h.io:443/a", "http://h.io:443/a"),   # non-default kept
    ("https://h.io:8080/a", "https://h.io:8080/a"),
    ("http://h.io/a#frag", "http://h.io/a"),
    ("http://h.io", "http://h.io/"),
    ("http://h.io?b=2&a=1", "http://h.io/?a=1&b=2"),
    ("http://h.io/p?utm_source=x&a=1&gclid=2&fbclid=3", "http://h.io/p?a=1"),
    ("http://h.io/p?&&a=1&", "http://h.io/p?a=1"),
    ("http://h.io/p?utm_only=1", "http://h.io/p"),
    # path case and duplicate slashes preserved (identity-preserving)
    ("http://h.io//A//B", "http://h.io//A//B"),
]


def _canon(spark, urls):
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    return [r[0] for r in df.select(tx.canonical_url(F.col("url"))).collect()]


def test_rules(spark):
    got = _canon(spark, [c[0] for c in CASES])
    for (url, want), g in zip(CASES, got):
        assert g == want, url


def test_idempotent(spark):
    once = _canon(spark, [c[0] for c in CASES])
    twice = _canon(spark, once)
    assert once == twice


def test_spellings_collapse(spark):
    variants = [
        "HTTPS://A.IO:443/p?b=2&a=1#top",
        "https://a.io/p?a=1&b=2",
        "https://x@a.io/p?b=2&utm_c=9&a=1",
    ]
    assert len(set(_canon(spark, variants))) == 1
