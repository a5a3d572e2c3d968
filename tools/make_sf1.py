"""Deterministic sf1 synthesis: upsample /root/testdata/sf0.1 by 10x.

The driver ships sf{0.001,0.01,0.1}; the r6 verdict's top item is a scale
rehearsal at 10x data ("prove every bucketed/never-all-pairs claim
empirically"). This script derives sf1 from sf0.1 with copy index
c = 0..9, entirely deterministic (no RNG):

- copy 0 is byte-identical to sf0.1 (so the planted-dup discipline of
  functions.dedup.dedup_corpus carries over unchanged);
- fact-table keys shift by c * 10^10 CONSISTENTLY across pk and fk
  (orders.o_orderkey and lineitem.l_orderkey shift together, etc.), so
  referential integrity — and therefore the derived code-graph shape —
  is preserved per copy: sf1's graph is 10 disjoint sf0.1 graphs, which
  is exactly what "10x more repositories ingested" looks like;
- region/nation stay fixed (TPC-H dimension tables don't grow with sf);
- events: user_id shifts by c * 1_000_000 — 10x users, same per-user
  activity and time range (rollup/sessionize/retention load scales
  linearly and honestly);
- documents: doc_id shifts by c * 100_000 (stays clear of dedup's
  1_000_000/2_000_000 planted-copy offsets); for c > 0 every 5th token
  is prefixed with `c{copy}x` so NO 8-shingle (nor 3-shingle) survives
  across copies — without this, 10 exact copies of every doc would make
  the near-dup candidate volume grow quadratically BY CONSTRUCTION and
  the scaling measurement would test the data, not the plan;
- embeddings: vec_id shifts by c * 100_000; for c > 0 each component j
  is scaled by (1 + ((c*31 + j) % 7 - 3)/50), which rotates copies far
  enough apart in cosine that ANN/near-dup candidate sets stay
  duplication-rate-sized.

Output: $OUT_DIR (default /root/repo/.sf1), one parquet dir per table.
Run: python tools/make_sf1.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

SRC = os.environ.get("SF_SRC_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("OUT_DIR", "/root/repo/.sf1")
N_COPIES = int(os.environ.get("N_COPIES", "10"))

KEY_OFF = 10_000_000_000  # fact keys
USER_OFF = 1_000_000      # events.user_id
DOC_OFF = 100_000         # documents.doc_id / embeddings.vec_id


def _copies(df: DataFrame, shifts: dict[str, int], extra=None) -> DataFrame:
    parts = []
    for c in range(N_COPIES):
        d = df
        for col, off in shifts.items():
            d = d.withColumn(col, (F.col(col) + F.lit(c * off)).cast("bigint"))
        if extra is not None:
            d = extra(d, c)
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _perturb_text(d: DataFrame, c: int) -> DataFrame:
    if c == 0:
        return d
    toks = F.split(F.trim(F.col("text")), r"\s+")
    mangled = F.array_join(
        F.transform(
            toks,
            lambda x, i: F.when(
                i % 5 == 0, F.concat(F.lit(f"c{c}x"), x)
            ).otherwise(x),
        ),
        " ",
    )
    return d.withColumn("text", mangled).withColumn(
        "n_chars", F.length("text").cast("bigint")
    )


def _perturb_vec(d: DataFrame, c: int) -> DataFrame:
    if c == 0:
        return d
    scaled = F.transform(
        F.col("embedding"),
        lambda v, j: (
            v * (F.lit(1.0) + ((F.lit(c * 31) + j) % 7 - F.lit(3)) / F.lit(50.0))
        ).cast("float"),
    )
    return d.withColumn("embedding", scaled)


def main() -> None:
    from kausaldb_spark.session import get_spark

    spark = get_spark("make-sf1")
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
