"""as-of and interval join operators (operators/temporal.py)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from dataframe_kotlin_spark.operators import temporal


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            (1, "A", ts("2024-01-01 10:00:05"), 100.0),
            (2, "A", ts("2024-01-01 10:00:30"), 101.0),
            (3, "B", ts("2024-01-01 10:00:10"), 50.0),
            (4, "B", ts("2024-01-01 09:59:00"), 49.0),  # before any quote
        ],
        "trade_id long, sym string, t timestamp, px double",
    )


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", ts("2024-01-01 10:00:00"), 99.5),
            ("A", ts("2024-01-01 10:00:05"), 99.9),  # tie with trade 1 -> matches
            ("A", ts("2024-01-01 10:00:20"), 100.5),
            ("B", ts("2024-01-01 10:00:00"), 49.5),
        ],
        "sym string, t timestamp, bid double",
    )


def test_asof_join_basic(trades, quotes):
    out = temporal.asof_join(
        trades, quotes, keys=["sym"], left_ts="t", right_ts="t", right_cols=["bid"]
    )
    got = {r["trade_id"]: r["r_bid"] for r in out.collect()}
    assert got == {1: 99.9, 2: 100.5, 3: 49.5, 4: None}


def test_asof_join_tolerance(trades, quotes):
    out = temporal.asof_join(
        trades, quotes, keys=["sym"], left_ts="t", right_ts="t",
        right_cols=["bid"], tolerance_seconds=5,
    )
    got = {r["trade_id"]: r["r_bid"] for r in out.collect()}
    # trade 2 at 10:00:30: latest quote 10:00:20 is 10s old -> outside tolerance
    assert got == {1: 99.9, 2: None, 3: None, 4: None}


def test_asof_join_matches_pandas(spark):
    import pandas as pd

    left = pd.DataFrame(
        {"k": ["x"] * 50, "t": pd.date_range("2024-01-01", periods=50, freq="7s")}
    )
    right = pd.DataFrame(
        {
            "k": ["x"] * 30,
            "t": pd.date_range("2024-01-01 00:00:03", periods=30, freq="11s"),
            "v": [float(i) for i in range(30)],
        }
    )
    exp = pd.merge_asof(left.sort_values("t"), right.sort_values("t"), on="t", by="k")
    out = temporal.asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        keys=["k"], left_ts="t", right_ts="t", right_cols=["v"],
    )
    got = out.toPandas().sort_values("t").reset_index(drop=True)
    assert list(got["r_v"].fillna(-1)) == list(exp["v"].fillna(-1))


def test_interval_join(spark):
    events = spark.createDataFrame(
        [(i, ts(f"2024-01-01 10:{i:02d}:00")) for i in range(0, 50, 5)],
        "eid long, t timestamp",
    )
    iv = spark.createDataFrame(
        [
            (100, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:12:00")),
            (200, ts("2024-01-01 10:10:00"), ts("2024-01-01 10:30:00")),
        ],
        "wid long, s timestamp, e timestamp",
    )
    out = temporal.interval_join(events, iv, "t", "s", "e", bucket_seconds=300)
    pairs = sorted((r["eid"], r["wid"]) for r in out.collect())
    # exact containment, start inclusive / end exclusive, overlaps allowed
    assert pairs == [(0, 100), (5, 100), (10, 100), (10, 200), (15, 200), (20, 200), (25, 200)]


def test_interval_join_no_duplicates_across_buckets(spark):
    # interval spans many buckets; each contained event must appear once
    events = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:01"))], "eid long, t timestamp"
    )
    iv = spark.createDataFrame(
        [(7, ts("2024-01-01 09:00:00"), ts("2024-01-01 11:00:00"))],
        "wid long, s timestamp, e timestamp",
    )
    out = temporal.interval_join(events, iv, "t", "s", "e", bucket_seconds=60)
    assert out.count() == 1


def test_asof_forward(trades, quotes):
    out = temporal.asof_join(
        trades, quotes, keys=["sym"], left_ts="t", right_ts="t",
        right_cols=["bid"], direction="forward",
    )
    got = {r["trade_id"]: r["r_bid"] for r in out.collect()}
    # trade1@10:00:05: quote at same instant matches (>= tie);
    # trade2@10:00:30: no later A quote; trade4@09:59: earliest B quote 10:00
    assert got == {1: 99.9, 2: None, 3: None, 4: 49.5}


def test_asof_forward_tolerance(trades, quotes):
    out = temporal.asof_join(
        trades, quotes, keys=["sym"], left_ts="t", right_ts="t",
        right_cols=["bid"], direction="forward", tolerance_seconds=30,
    )
    got = {r["trade_id"]: r["r_bid"] for r in out.collect()}
    # trade4@09:59 -> next B quote at 10:00 is 60s ahead: outside tolerance
    assert got == {1: 99.9, 2: None, 3: None, 4: None}


def test_asof_nearest(trades, quotes):
    out = temporal.asof_join(
        trades, quotes, keys=["sym"], left_ts="t", right_ts="t",
        right_cols=["bid"], direction="nearest",
    )
    got = {r["trade_id"]: r["r_bid"] for r in out.collect()}
    # trade2@10:00:30: backward 10:00:20 (10s) is the only candidate;
    # trade3@10:00:10: backward 10:00 (10s) vs no forward -> 49.5;
    # trade4@09:59: only forward 10:00 -> 49.5
    assert got == {1: 99.9, 2: 100.5, 3: 49.5, 4: 49.5}


def test_asof_directions_match_pandas(spark):
    """All three directions agree with pandas merge_asof on a bigger
    deterministic fixture."""
    import pandas as pd

    left = pd.DataFrame(
        {
            "k": ["x", "x", "x", "y", "y", "z"] * 3,
            "lt": pd.to_datetime(
                [f"2024-01-01 10:{m:02d}:00" for m in range(18)]
            ),
            "lid": range(18),
        }
    ).sort_values("lt")
    right = pd.DataFrame(
        {
            "k": ["x", "y", "x", "y", "z", "x"] * 2,
            "rt": pd.to_datetime(
                [f"2024-01-01 10:{m:02d}:30" for m in range(0, 24, 2)]
            ),
            "rv": [float(i) for i in range(12)],
        }
    ).sort_values("rt")
    sl = spark.createDataFrame(left.rename(columns={"lt": "t"}))
    sr = spark.createDataFrame(right.rename(columns={"rt": "t"}))
    for direction in ("backward", "forward", "nearest"):
        want = pd.merge_asof(
            left, right, left_on="lt", right_on="rt", by="k", direction=direction
        ).set_index("lid")["rv"]
        out = temporal.asof_join(
            sl, sr, keys=["k"], left_ts="t", right_ts="t",
            right_cols=["rv"], direction=direction,
        )
        got = {r["lid"]: r["r_rv"] for r in out.collect()}
        for lid in range(18):
            w = want.loc[lid]
            g = got[lid]
            assert (pd.isna(w) and g is None) or g == w, (direction, lid, w, g)


def test_hypertable_rollup_coarse_equals_direct(spark):
    from pyspark.sql import functions as F

    from dataframe_kotlin_spark.operators.temporal import hypertable_rollup
    from dataframe_kotlin_spark.session import load_events

    e = load_events(spark, "/root/testdata/sf0.001")
    out = hypertable_rollup(e, "ts", ["event_type"], "value", (3600, 86400))
    daily = out.filter(F.col("granularity_seconds") == 86400).drop("granularity_seconds")
    epoch = F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000.0
    direct = (
        e.withColumn("bucket_start", (F.floor(epoch / 86400) * 86400).cast("bigint"))
        .groupBy("bucket_start", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
    )
    a = {(r["bucket_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6)) for r in daily.collect()}
    b = {(r["bucket_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6)) for r in direct.collect()}
    assert a == b


def test_hypertable_rollup_rejects_non_multiple():
    import pytest as _pytest

    from dataframe_kotlin_spark.operators.temporal import hypertable_rollup

    with _pytest.raises(AssertionError):
        hypertable_rollup(None, "ts", [], "v", (60, 90))


def test_resample_ffill_grid_and_fill(spark):
    from dataframe_kotlin_spark.operators.temporal import resample_ffill

    rows = [
        (1, "2024-01-01 00:00:30", 10.0),
        (1, "2024-01-01 03:10:00", 40.0),  # hours 1-2 missing -> filled 10.0
        (2, "2024-01-01 05:00:00", 7.0),   # single bucket, no gaps
    ]
    df = spark.createDataFrame(rows, "k int, ts string, v double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = resample_ffill(
        df, "ts", ["k"], 3600, F.avg("v"), value_name="v", bucket_name="b"
    ).collect()
    k1 = sorted((r["b"], r["v"], r["v_filled"]) for r in out if r["k"] == 1)
    base = k1[0][0]
    assert [(b - base, v, f) for b, v, f in k1] == [
        (0, 10.0, 10.0),
        (1, None, 10.0),
        (2, None, 10.0),
        (3, 40.0, 40.0),
    ]
    k2 = [(r["v"], r["v_filled"]) for r in out if r["k"] == 2]
    assert k2 == [(7.0, 7.0)]


def test_rolling_dedup_burst_semantics(spark):
    from dataframe_kotlin_spark.operators.temporal import rolling_dedup

    rows = [  # key, ts-seconds offsets: burst at 0,10,20; lone at 100; burst 130,135
        (1, "a", 0), (2, "a", 10), (3, "a", 20), (4, "a", 100), (5, "a", 130), (6, "a", 135),
        (7, "b", 5),
    ]
    df = spark.createDataFrame(rows, "id int, k string, off int").withColumn(
        "ts", F.timestamp_seconds(F.lit(1700000000) + F.col("off"))
    )
    out = rolling_dedup(df, ["k"], "ts", window_seconds=30, tiebreak="id")
    kept = sorted(r["id"] for r in out.collect())
    # id1 starts burst; 2,3 inside 30s of predecessor; 4 after 80s silence;
    # 5 within 30s of 4 -> dropped; 6 within 30s of 5 -> dropped; 7 other key
    assert kept == [1, 4, 7]


def test_asof_null_right_value_not_stitched(spark):
    """A matched right row with a NULL payload column must yield NULL —
    never an older row's value stitched in per-column (pandas parity)."""
    import datetime as dt

    from dataframe_kotlin_spark.operators.temporal import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame([(1, t(10))], "k int, ts timestamp")
    right = spark.createDataFrame(
        [(1, t(1), 5.0), (1, t(10), None)], "k int, ts timestamp, a double"
    )
    out = asof_join(
        left, right, keys=["k"], left_ts="ts", right_ts="ts",
        right_cols=["a"], direction="backward", tolerance_seconds=2,
    ).collect()
    assert out[0]["r_a"] is None  # matched row (ts=10) has NULL a

    # without tolerance the matched row is still ts=10 -> NULL a
    out2 = asof_join(
        left, right, keys=["k"], left_ts="ts", right_ts="ts",
        right_cols=["a"], direction="backward",
    ).collect()
    assert out2[0]["r_a"] is None


def test_asof_null_right_ts_rows_ignored(spark):
    import datetime as dt

    from dataframe_kotlin_spark.operators.temporal import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame([(1, t(5))], "k int, ts timestamp")
    right = spark.createDataFrame(
        [(1, None, 99.0)], "k int, ts timestamp, a double"
    )
    out = asof_join(
        left, right, keys=["k"], left_ts="ts", right_ts="ts",
        right_cols=["a"], direction="backward",
    ).collect()
    assert out[0]["r_a"] is None  # null-ts right row is not matchable
