"""Deterministic scale synthesis: upsample /root/testdata/sf0.1 by N_COPIES.

The driver ships sf{0.001,0.01,0.1}; the r6 verdict's top item was a scale
rehearsal at 10x data and the r10 verdict's is a TRUE 100x rehearsal
("the scale argument currently interpolates from 10x"). This script
derives sfN from sf0.1 with copy index c = 0..N_COPIES-1, entirely
deterministic (no RNG):

- copy 0 is value-identical to sf0.1 (so the planted-dup discipline of
  functions.dedup.dedup_corpus carries over unchanged);
- fact-table keys shift by c * 10^10 CONSISTENTLY across pk and fk
  (orders.o_orderkey and lineitem.l_orderkey shift together, etc.), so
  referential integrity — and therefore the derived code-graph shape —
  is preserved per copy: sfN's graph is N disjoint sf0.1 graphs, which
  is exactly what "N x more repositories ingested" looks like;
- region/nation stay fixed (TPC-H dimension tables don't grow with sf);
- events: user_id shifts by c * 1_000_000 — N x users, same per-user
  activity and time range (rollup/sessionize/retention load scales
  linearly and honestly);
- documents: doc_id shifts by c * DOC_OFF; DOC_OFF is 100_000 for
  N_COPIES <= 10 (the recorded .sf1 layout) and 10_000_000 beyond that —
  dedup_corpus plants exact/near copies at doc_id + 1_000_000 / 2_000_000
  AT QUERY TIME, so every copy's id block must keep [base, base+2M+max_id]
  disjoint from every other copy's. For c > 0 every 5th token is prefixed
  with `c{copy}x` so NO 8-shingle (nor 3-shingle) survives across copies —
  without this, N exact copies of every doc would make the near-dup
  candidate volume grow quadratically BY CONSTRUCTION and the scaling
  measurement would test the data, not the plan;
- embeddings: vec_id shifts by c * DOC_OFF; for c > 0 each component j
  is scaled by (1 + ((c*31 + j) % 7 - 3)/50), which rotates copies far
  enough apart in cosine that ANN/near-dup candidate sets stay
  duplication-rate-sized.

r11: the N-way unionByName chain became a broadcast cross-join against a
range(N_COPIES) copy index — one scan of the source regardless of N (the
union version planned 100 scans at N=100), which is also the shape a real
100 TB synthetic upsample would use.

Output: $OUT_DIR (default /root/repo/.sf1), one parquet dir per table.
Run: python tools/make_sf1.py            (sf1: 10 copies)
     N_COPIES=100 OUT_DIR=/root/repo/.sf10 python tools/make_sf1.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

SRC = os.environ.get("SF_SRC_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("OUT_DIR", "/root/repo/.sf1")
N_COPIES = int(os.environ.get("N_COPIES", "10"))
# part files per fact table. The r11 sf10 bring-up found the cross-join
# builder inheriting the SOURCE's partitioning (one ~30 MB file for 500k
# documents): every scan then ran at parallelism 1-2 and the 10x->100x
# factors read 20-70x — a fixture LAYOUT artifact, not a plan problem. A
# real corpus arrives as many ~128 MB files; 32 files keeps local[32]
# saturated at bench scale.
OUT_FILES = int(os.environ.get("OUT_FILES", "32"))

KEY_OFF = 10_000_000_000  # fact keys
USER_OFF = 1_000_000      # events.user_id
# documents.doc_id / embeddings.vec_id: each copy's id block must clear the
# query-time planted-copy offsets (dedup.EXACT_COPY_OFFSET=1M / NEAR=2M)
# of every other copy. 100_000 reproduces the recorded .sf1 exactly; at
# N_COPIES > 10 the blocks would march into [1M, 2M+max_id], so widen.
DOC_OFF = 100_000 if N_COPIES <= 10 else 10_000_000

_SPARK = None  # set in main()


def _copies(df: DataFrame, shifts: dict[str, int], extra=None) -> DataFrame:
    """One scan of ``df`` cross-joined against the broadcast copy index
    (column ``_c``); ``extra(df)`` may reference ``_c`` for per-copy
    perturbation. Value-identical to the old N-way union."""
    cidx = _SPARK.range(N_COPIES).select(F.col("id").cast("bigint").alias("_c"))
    d = df.crossJoin(F.broadcast(cidx))
    for col, off in shifts.items():
        d = d.withColumn(
            col, (F.col(col) + F.col("_c") * F.lit(off)).cast("bigint")
        )
    if extra is not None:
        d = extra(d)
    return d.drop("_c").repartition(OUT_FILES)


def _perturb_text(d: DataFrame) -> DataFrame:
    toks = F.split(F.trim(F.col("text")), r"\s+")
    # `_c` is a plain input column — cheap to re-read per element, unlike
    # the aliased-expression lambda-body references the r10 inlining
    # postmortem (functions/text.py gopher_repetition) bans
    prefix = F.concat(F.lit("c"), F.col("_c").cast("string"), F.lit("x"))
    mangled = F.array_join(
        F.transform(
            toks,
            lambda x, i: F.when(i % 5 == 0, F.concat(prefix, x)).otherwise(x),
        ),
        " ",
    )
    text = F.when(F.col("_c") == 0, F.col("text")).otherwise(mangled)
    return d.withColumn("text", text).withColumn(
        "n_chars", F.length("text").cast("bigint")
    )


def _perturb_vec(d: DataFrame) -> DataFrame:
    scaled = F.transform(
        F.col("embedding"),
        lambda v, j: (
            v
            * (
                F.lit(1.0)
                + ((F.col("_c") * 31 + j) % 7 - F.lit(3)) / F.lit(50.0)
            )
        ).cast("float"),
    )
    keep = F.col("_c") == 0
    return d.withColumn(
        "embedding", F.when(keep, F.col("embedding")).otherwise(scaled)
    )


def main() -> None:
    global _SPARK
    from kausaldb_spark.session import get_spark

    _SPARK = spark = get_spark("make-sfN")
    os.makedirs(OUT, exist_ok=True)
    rd = lambda t: spark.read.parquet(f"{SRC}/{t}.parquet")  # noqa: E731
    wr = lambda df, t: df.write.mode("overwrite").parquet(f"{OUT}/{t}.parquet")  # noqa: E731

    # dimensions: fixed
    for t in ("region", "nation"):
        wr(rd(t), t)

    wr(_copies(rd("customer"), {"c_custkey": KEY_OFF}), "customer")
    wr(_copies(rd("supplier"), {"s_suppkey": KEY_OFF}), "supplier")
    wr(_copies(rd("part"), {"p_partkey": KEY_OFF}), "part")
    wr(_copies(rd("orders"), {"o_orderkey": KEY_OFF, "o_custkey": KEY_OFF}), "orders")
    wr(
        _copies(
            rd("lineitem"),
            {"l_orderkey": KEY_OFF, "l_partkey": KEY_OFF, "l_suppkey": KEY_OFF},
        ),
        "lineitem",
    )
    wr(
        _copies(rd("events"), {"event_id": KEY_OFF, "user_id": USER_OFF}),
        "events",
    )
    wr(
        _copies(rd("documents"), {"doc_id": DOC_OFF}, extra=_perturb_text),
        "documents",
    )
    wr(
        _copies(rd("embeddings"), {"vec_id": DOC_OFF}, extra=_perturb_vec),
        "embeddings",
    )
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        print(t, spark.read.parquet(f"{OUT}/{t}.parquet").count())
    spark.stop()


if __name__ == "__main__":
    main()
