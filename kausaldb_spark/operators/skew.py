"""Skew mitigation utilities.

AQE's skew-join splitting (enabled in the session factory) handles most
runtime skew transparently; these helpers cover the cases AQE can't:

- ``salted_join``: explicit salting for a join whose build side is small
  enough to replicate — the classic hub-key fix. The salt is a *deterministic*
  hash of the probe row (no rand(): results must be reproducible run-to-run,
  and at 1000 executors a nondeterministic salt breaks retry semantics —
  a re-executed task must land rows in the same bucket).
- ``approx_distinct``: HyperLogLog++ cardinality for 100 TB-scale counting
  where exact distinct would shuffle the world. Deterministic for fixed data
  (hash-based sketch), tested against the exact count within rsd bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join that spreads a skewed probe-side key over ``salt_buckets``
    partitions by replicating the build side. Result is identical to
    ``probe.join(build, key, how)`` (tested), but no single task receives a
    whole hub key.

    The probe row's salt hashes all its columns — deterministic, uniform, and
    independent of the join key (hashing the key alone would keep the hub in
    one bucket, defeating the point)."""
    probe_salt = F.pmod(F.hash(*[F.col(c) for c in probe.columns]), F.lit(salt_buckets))
    p = probe.withColumn("_salt", probe_salt)
    b = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = p.join(b, [key, "_salt"], how)
    return out.drop("_salt")


def approx_distinct(df: DataFrame, col: str, rsd: float = 0.02) -> DataFrame:
    """HLL++ distinct count: one row, column ``approx_n``."""
    return df.agg(F.approx_count_distinct(col, rsd).alias("approx_n"))
