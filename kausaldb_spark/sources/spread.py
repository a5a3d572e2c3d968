"""Scale-adaptive read parallelism for corpus front doors.

Optimization-guide §2.5 ("input skew: one huge unsplittable file ...
repartition immediately after the read") applied to the driver testdata
shape: every table ships as ONE single-row-group parquet file, so a scan
plans as ONE task no matter the split configuration (parquet splits at
row-group granularity), and every map-heavy stage riding that scan —
Arrow decode boundaries, shingle explode + md5, higher-order-function
array math — runs on one core of a 32-core executor pool. Measured at
sf0.1: ``gopher_repetition`` 6.6 s single-task vs ~2.8 s spread (and the
sf1 legs of several keys were FASTER than sf0.1 because the generated sf1
fixtures are multi-file).

``spread_scan`` round-robin repartitions the freshly-read frame to the
session's default parallelism **only when the planned scan yields fewer
splits than that** — the target is derived from the session at call time
(never a constant), so the driver's lower-core-count bench runs and a
real cluster both shape themselves, and a production-scale corpus (many
files ≥ cores of splits) makes this a no-op without configuration.

Result identity: round-robin repartition is deterministic
(``spark.sql.execution.sortBeforeRepartition`` is on by default — retried
tasks reproduce the same row-to-partition assignment) and the repo's
operators are partition-ORDER insensitive (``collect_list`` consumers are
``array_sort``-ed or consumed with set semantics; ``F.first`` sites take
within-group constants — audited this round, hash-gated by the oracle
parity sweep at every scale factor). Predicate pushdown and column
pruning pass through a Repartition node, so scan-level pruning is
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# one spread decision per (session, key): the .rdd partition probe plans
# the scan once; repeated query construction over the same front door
# reuses the decided frame
_SPREAD_CACHE: dict[tuple[int, str], DataFrame] = {}


def spread_scan(df: DataFrame, key: str | None = None) -> DataFrame:
    """``df`` (a freshly-read scan) repartitioned to the session default
    parallelism iff the planned scan has fewer splits; no-op otherwise."""
    spark = df.sparkSession
    ck = (id(spark), key) if key is not None else None
    if ck is not None:
        hit = _SPREAD_CACHE.get(ck)
        if hit is not None:
            return hit
    target = spark.sparkContext.defaultParallelism
    out = df if df.rdd.getNumPartitions() >= target else df.repartition(target)
    if ck is not None:
        _SPREAD_CACHE[ck] = out
    return out
