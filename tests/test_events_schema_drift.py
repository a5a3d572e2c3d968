"""Schema-drift guard for the events loader (VERDICT r4 §Next-round #1/#9).

The driver's events.parquet changed physical ts encoding between rounds
(TIMESTAMP(NANOS) in r1-r3 -> timestamp[us] in r4), silently breaking every
time-analytics query for a full round. These tests pin the loader's contract:
every encoding the driver has shipped loads to the same integer-microsecond
stream, and an unknown encoding fails loudly with a one-line diagnosis.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kausaldb_spark.sources import events as ev

US = [1_700_000_000_000_000, 1_700_000_001_500_000, 1_700_003_600_000_123]


def _write_events(tmp_path, name, ts_array):
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 10, 11], pa.int64()),
            "event_type": pa.array(["view", "purchase", "view"]),
            "value": pa.array([1.5, 2.25, 0.0]),
            "props": pa.array(['{"a":1}', "{}", "{}"]),
        }
    )
    path = os.path.join(str(tmp_path), name)
    pq.write_table(table, path)
    return os.path.dirname(path), os.path.basename(path)


def _load(spark, tmp_path, name, ts_array):
    d, base = _write_events(tmp_path, name, ts_array)
    sf_dir_style = os.path.join(d, base)
    # load_events expects {sf_dir}/events.parquet naming; call the guts directly
    spark, us_col = ev._ts_to_us(spark, sf_dir_style)
    raw = spark.read.parquet(sf_dir_style)
    return raw.select("event_id", us_col.alias("us"), "user_id").orderBy("event_id")


def test_micros_and_nanos_load_identically(spark, tmp_path):
    micros = _load(
        spark, tmp_path, "ev_us.parquet", pa.array(US, pa.timestamp("us"))
    ).collect()
    nanos = _load(
        spark, tmp_path, "ev_ns.parquet", pa.array([u * 1000 for u in US], pa.timestamp("ns"))
    ).collect()
    raw_int64 = _load(
        spark, tmp_path, "ev_i64.parquet", pa.array([u * 1000 for u in US], pa.int64())
    ).collect()
    tz_aware = _load(
        spark, tmp_path, "ev_tz.parquet", pa.array(US, pa.timestamp("us", tz="UTC"))
    ).collect()
    assert [r["us"] for r in micros] == US
    assert micros == nanos == raw_int64 == tz_aware


def test_millis_loads(spark, tmp_path):
    ms = _load(
        spark, tmp_path, "ev_ms.parquet", pa.array([u // 1000 for u in US], pa.timestamp("ms"))
    ).collect()
    assert [r["us"] for r in ms] == [(u // 1000) * 1000 for u in US]


def test_unknown_encoding_fails_loudly(spark, tmp_path):
    with pytest.raises(TypeError, match="unsupported physical type"):
        _load(spark, tmp_path, "ev_str.parquet", pa.array(["x", "y", "z"]))


def test_real_testdata_loads(spark):
    df = ev.load_events(spark, "/root/testdata/sf0.001")
    assert df.columns == ["event_id", "us", "user_id", "event_type", "value", "props"]
    row = df.selectExpr("min(us) AS lo", "max(us) AS hi", "count(*) AS n").first()
    assert row["n"] > 0
    # epoch micros for any plausible event time (2001..2286)
    assert 1_000_000_000_000_000 < row["lo"] <= row["hi"] < 10_000_000_000_000_000


def test_mixed_part_encodings_raise(tmp_path):
    """r6 ADVICE: a directory dataset whose parts disagree on the ts
    encoding must raise at sniff time — one reader decision cannot decode
    both, and the post-read check only catches gross mismatches."""
    d = os.path.join(str(tmp_path), "events.parquet")
    os.makedirs(d)
    us = pa.array([1, 2, 3], pa.timestamp("us"))
    ns = pa.array([1, 2, 3], pa.timestamp("ns"))
    for name, arr in [("part-0.parquet", us), ("part-1.parquet", ns)]:
        table = pa.table({"event_id": pa.array([1, 2, 3], pa.int64()), "ts": arr})
        pq.write_table(table, os.path.join(d, name))
    with pytest.raises(TypeError, match="mixed parquet types"):
        ev._sniff_parquet_field(d, "ts")


def test_uniform_multipart_sniffs_fine(tmp_path):
    d = os.path.join(str(tmp_path), "events.parquet")
    os.makedirs(d)
    for i in range(3):
        table = pa.table({
            "event_id": pa.array([i], pa.int64()),
            "ts": pa.array([i], pa.timestamp("us")),
        })
        pq.write_table(table, os.path.join(d, f"part-{i}.parquet"))
    assert str(ev._sniff_parquet_field(d, "ts")) == "timestamp[us]"


def test_value_quantiles_disc_semantics(spark):
    """percentile_disc picks the smallest stored element whose cumulative
    fraction >= p (SQL standard) — pinned on a crafted group so an engine
    swap to interpolating percentile_cont would fail loudly."""
    from kausaldb_spark.sources.events import value_quantiles

    rows = [(i, 1000 + i, "u", "t", float(v)) for i, v in
            enumerate([10.0, 20.0, 30.0, 40.0])]
    ev = spark.createDataFrame(
        rows, "event_id long, us long, user_id string, event_type string, value double"
    )
    out = value_quantiles(ev, pcts=(25, 50, 95)).collect()[0]
    # 4 elements: p25 -> 1st (10), p50 -> 2nd (20), p95 -> 4th (40);
    # an interpolating percentile would yield 17.5 / 25 / 38.5
    assert out["n_events"] == 4
    assert (out["p25_cents"], out["p50_cents"], out["p95_cents"]) == (1000, 2000, 4000)


def test_funnel_greedy_earliest_semantics(spark):
    """Step k matches its FIRST occurrence strictly after step k-1's match
    and within the window; completing users shrink monotonically."""
    from kausaldb_spark.sources.events import funnel

    H = 3_600_000_000
    rows = [
        # u1: clean view(1h) -> click(2h) -> purchase(3h)
        (1, 1 * H, "u1", "view", 0.0), (2, 2 * H, "u1", "click", 0.0),
        (3, 3 * H, "u1", "purchase", 0.0),
        # u2: click BEFORE view only -> stops after view
        (4, 5 * H, "u2", "view", 0.0), (5, 4 * H, "u2", "click", 0.0),
        # u3: click 30h after view -> outside the 24h window
        (6, 1 * H, "u3", "view", 0.0), (7, 31 * H, "u3", "click", 0.0),
        # u4: greedy trap — first view at 1h, click at 2h, purchase at 2.5h;
        # the earlier click (0.5h, before view) must be ignored
        (8, 1 * H, "u4", "view", 0.0), (9, H // 2, "u4", "click", 0.0),
        (10, 2 * H, "u4", "click", 0.0), (11, 5 * H // 2, "u4", "purchase", 0.0),
        # u5: no view at all
        (12, 1 * H, "u5", "click", 0.0), (13, 2 * H, "u5", "purchase", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, us long, user_id string, event_type string, value double"
    )
    out = {r["step_idx"]: r for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert [out[i]["step"] for i in (1, 2, 3)] == ["view", "click", "purchase"]
    assert out[1]["n_users"] == 4   # u1..u4 viewed
    assert out[2]["n_users"] == 2   # u1, u4 clicked after view within 24h
    assert out[3]["n_users"] == 2   # u1, u4 purchased
    # empty step list is an error
    import pytest as _pytest

    with _pytest.raises(ValueError):
        funnel(ev, [])


def test_cohort_retention_triangle(spark):
    from kausaldb_spark.sources.events import DAY_US, cohort_retention

    rows, eid = [], 0
    # u1,u2 first seen day 0; u1 returns day 1 and 2, u2 only day 2
    # u3 first seen day 1, returns day 1 (same day, twice) and day 40 (cut)
    for user, day in [("u1", 0), ("u1", 1), ("u1", 2), ("u2", 0), ("u2", 2),
                      ("u3", 1), ("u3", 1), ("u3", 40)]:
        rows.append((eid, day * DAY_US + eid, user, "view", 0.0))
        eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, us long, user_id string, event_type string, value double"
    )
    out = {(r["cohort_day"], r["day_offset"]): r["n_active"]
           for r in cohort_retention(ev, max_offset=30).collect()}
    assert out[(0, 0)] == 2      # cohort size day 0
    assert out[(0, 1)] == 1      # u1 back on day 1
    assert out[(0, 2)] == 2      # both back on day 2
    assert out[(1, 0)] == 1      # u3 cohort; same-day dups collapse
    assert (1, 39) not in out    # beyond max_offset
    assert all(off >= 0 for _, off in out)


def test_sliding_rollup_window_membership(spark):
    from kausaldb_spark.sources.events import HOUR_US, sliding_rollup

    Q = HOUR_US // 4  # 15 min slide
    rows = [
        # event at exactly 1h: windows starting at 15,30,45,60 min contain it
        (1, HOUR_US, "u1", "view", 0.0),
        # event at 5 min: early windows clamp at 0 -> wins 0 only... 0*Q<=5m<0+60m
        (2, 5 * 60 * 1_000_000, "u2", "view", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, us long, user_id string, event_type string, value double"
    )
    out = {(r["win"], r["event_type"]): r for r in sliding_rollup(ev).collect()}
    wins_e1 = sorted(w for (w, _t) in out if out[(w, "view")]["n_events"] >= 1)
    # e1 at us=4Q -> wins 1..4; e2 at us<Q -> win 0 only
    assert set(wins_e1) == {0, 1, 2, 3, 4}
    assert out[(0, "view")]["n_events"] == 1          # only the early event
    for w in (1, 2, 3):
        assert out[(w, "view")]["n_events"] == 1      # only e1
    assert out[(4, "view")]["n_events"] == 1
    assert out[(4, "view")]["win_start_us"] == 4 * Q
    # width must divide evenly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sliding_rollup(ev, width_us=HOUR_US, slide_us=7)
