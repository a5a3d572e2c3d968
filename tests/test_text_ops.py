"""Unit probes for the PII scan/redaction and repetition-score operators
(the oracle gate covers corpus-level parity; these pin the per-pattern
behavior on crafted strings)."""

from pyspark.sql import functions as F

from kausaldb_spark.functions import text as tx


def test_pii_counts_and_redaction(spark):
    rows = [
        (1, "mail bob@x.com and alice@y.org via https://a.b/c or 555-123-4567"),
        (2, "no pii here at all"),
        (3, "http://plain.example and 123-456-7890 and 12-34-56"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    counts = tx.pii_counts(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            *[c.alias(n) for n, c in counts.items()],
            tx.redact_pii(F.col("text")).alias("red"),
        ).collect()
    }
    assert (out[1]["n_emails"], out[1]["n_urls"], out[1]["n_phones"]) == (2, 1, 1)
    assert out[1]["red"] == "mail <EMAIL> and <EMAIL> via <URL> or <PHONE>"
    assert (out[2]["n_emails"], out[2]["n_urls"], out[2]["n_phones"]) == (0, 0, 0)
    assert out[2]["red"] == rows[1][1]
    # http (no s) counts as URL; 12-34-56 is not a phone
    assert (out[3]["n_urls"], out[3]["n_phones"]) == (1, 1)


def test_repetition_score_shape(spark):
    rows = [
        (1, "a b a b a b"),       # 2-grams: ab ba ab ba ab -> top 'a b' x3 of 5
        (2, "w x y z"),           # all distinct -> top 1 of 3
        (3, "solo"),              # <2 tokens -> no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    grams = df.select(
        "doc_id", F.explode(tx.shingles(tx.tokens(F.col("text")), 2)).alias("gram")
    )
    per = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
    out = {
        r["doc_id"]: r
        for r in per.groupBy("doc_id").agg(
            F.sum("c").alias("n"), F.max("c").alias("top"),
            F.floor(F.max("c") * 100 / F.sum("c")).alias("frac"),
        ).collect()
    }
    assert (out[1]["n"], out[1]["top"], out[1]["frac"]) == (5, 3, 60)
    assert (out[2]["n"], out[2]["top"], out[2]["frac"]) == (3, 1, 33)
    assert 3 not in out
