"""Row-order analytics on the weather fixture — mirrors reference
SeriesTests (prev/next/diff/movingAverage)."""

from pyspark.sql import functions as F


def test_diff(weather):
    out = weather.diff("temp", order_by=["day"], partition_by=["city"])
    d = {(r["city"], r["day"]): r["temp_diff"] for r in out.collect()}
    assert d[("Moscow", 1)] == 0  # first row -> 0 (api/row/diff.kt)
    assert d[("Moscow", 2)] == 6  # 20 - 14
    assert d[("London", 4)] == 6  # 22 - 16


def test_moving_average(weather):
    out = weather.moving_average("temp", k=3, order_by=["day"], partition_by=["city"])
    d = {(r["city"], r["day"]): r["temp_ma3"] for r in out.collect()}
    assert d[("Moscow", 1)] == 14.0  # partial window
    assert d[("Moscow", 2)] == 17.0  # (14+20)/2
    assert abs(d[("Moscow", 3)] - (14 + 20 + 18) / 3) < 1e-9


def test_sessionize_gap_detection(spark):
    from dataframe_kotlin_spark.streaming.windows import sessionize

    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:10:00"),
        (1, "2024-01-01 01:00:00"),  # > 30 min gap -> new session
        (2, "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    out = sessionize(
        df, "ts", gap_seconds=1800, keys=["user_id"],
        aggs=[F.count(F.lit(1)).alias("n")],
    )
    got = {(r["user_id"], r["session_id"]): r["n"] for r in out.collect()}
    assert got == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_tumbling_and_sliding(spark):
    from dataframe_kotlin_spark.streaming.windows import sliding_agg, tumbling_agg

    rows = [("2024-01-01 00:05:00",), ("2024-01-01 00:35:00",), ("2024-01-01 01:05:00",)]
    df = spark.createDataFrame(rows, "ts string").withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    t = tumbling_agg(df, "ts", 3600, [], [F.count(F.lit(1)).alias("n")], "b")
    assert {(r["b"] % 24, r["n"]) for r in t.collect()} == {(0, 2), (1, 1)}
    s = sliding_agg(df, "ts", 3600, 1800, [], [F.count(F.lit(1)).alias("n")], "b")
    # each event in exactly 2 windows
    assert sum(r["n"] for r in s.collect()) == 6
