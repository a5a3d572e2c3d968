"""The capstone training-data operator: end-to-end corpus curation.

Composes the pipeline stages in the order a production data team runs them:

1. quality gate        (integer metrics, functions.text.quality_flag)
2. language filter     (stopword langid — drop 'und')
3. near-dup dedup      (MinHash-LSH pairs → WCC clusters → keep canonicals)
4. decontamination     (drop benchmark docs AND docs sharing ≥2 8-grams
                        with any benchmark doc)
5. split assignment    (growth-stable md5 buckets)

Output: one row per split with document and token counts — the "what does my
training set look like after curation" report. Every stage is a pure
DataFrame transformation over the same persisted corpus scan, so the whole
pipeline is one shuffle per stage boundary, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kausaldb_spark.sources import guard

from kausaldb_spark.functions import text as tx
from kausaldb_spark.functions.dedup import contaminated_docs, minhash_pairs_for
from kausaldb_spark.operators.traversal import weakly_connected_components

BENCHMARK_MAX_ID = 10


def curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(split, n_docs, total_tokens) for the curated corpus."""
    docs = guard.documents_text(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).select("doc_id", "text")

    toks = tx.tokens(F.col("text"))
    qcols = tx.quality_columns(F.col("text"))
    flagged = docs.select(
        "doc_id", "text",
        F.size(toks).alias("n_tokens"),
        tx.quality_flag(qcols).alias("is_quality"),
        tx.lang_id(toks).alias("pred_lang"),
    )

    # near-dup: keep one canonical per cluster (non-canonicals drop)
    pairs = minhash_pairs_for(docs)
    comp = weakly_connected_components(
        pairs.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"),
            F.lit("near_dup").alias("edge_type"),
        )
    )
    non_canonical = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").cast("bigint").alias("doc_id")
    )

    # decontamination: benchmark docs themselves + overlapping docs
    contaminated = contaminated_docs(spark, sf_dir, BENCHMARK_MAX_ID).select(
        "doc_id"
    ).distinct()

    curated = (
        flagged.where((F.col("is_quality") == 1) & (F.col("pred_lang") != "und"))
        .where(F.col("doc_id") >= BENCHMARK_MAX_ID)
        .join(non_canonical, "doc_id", "left_anti")
        .join(contaminated, "doc_id", "left_anti")
    )
    return (
        curated.withColumn("split", tx.split_assignment(F.col("doc_id")))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )
