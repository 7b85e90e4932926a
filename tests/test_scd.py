"""SCD2 versioning operators (operators/scd.py)."""

from __future__ import annotations

from datetime import date

from pyspark.sql import functions as F

from dataframe_kotlin_spark.operators import scd


def _hist(spark, rows):
    return spark.createDataFrame(rows, "k long, ts date, attr string")


def test_scd2_rebuild_basic(spark):
    hist = _hist(
        spark,
        [
            (1, date(2024, 1, 1), "a"),
            (1, date(2024, 2, 1), "b"),
            (1, date(2024, 3, 1), "c"),
            (2, date(2024, 1, 15), "x"),
        ],
    )
    out = scd.scd2_from_history(hist, ["k"], "ts", ["attr"]).collect()
    by = {(r["k"], r["attr"]): r for r in out}
    assert len(out) == 4
    assert by[(1, "a")]["valid_to"] == date(2024, 2, 1) and not by[(1, "a")]["is_current"]
    assert by[(1, "b")]["valid_to"] == date(2024, 3, 1)
    assert by[(1, "c")]["valid_to"] is None and by[(1, "c")]["is_current"]
    assert by[(2, "x")]["is_current"]


def test_scd2_consecutive_repeats_collapse(spark):
    hist = _hist(
        spark,
        [
            (1, date(2024, 1, 1), "a"),
            (1, date(2024, 2, 1), "a"),  # re-stated, no change
            (1, date(2024, 3, 1), "b"),
            (1, date(2024, 4, 1), "a"),  # back to a: NEW version
        ],
    )
    out = scd.scd2_from_history(hist, ["k"], "ts", ["attr"]).collect()
    assert len(out) == 3
    spans = sorted((r["valid_from"], r["attr"]) for r in out)
    assert spans == [
        (date(2024, 1, 1), "a"),
        (date(2024, 3, 1), "b"),
        (date(2024, 4, 1), "a"),
    ]


def test_scd2_merge_equals_full_rebuild(spark):
    full = _hist(
        spark,
        [
            (1, date(2024, 1, 1), "a"),
            (1, date(2024, 2, 1), "b"),
            (1, date(2024, 3, 1), "c"),
            (2, date(2024, 1, 10), "x"),
            (2, date(2024, 2, 10), "y"),
            (3, date(2024, 2, 20), "q"),
        ],
    )
    first = full.filter(F.col("ts") < F.lit(date(2024, 2, 1)))
    later = full.filter(F.col("ts") >= F.lit(date(2024, 2, 1)))
    current = scd.scd2_from_history(first, ["k"], "ts", ["attr"])
    merged = scd.scd2_merge(current, later, ["k"], "ts", ["attr"])
    rebuilt = scd.scd2_from_history(full, ["k"], "ts", ["attr"])
    cols = sorted(merged.columns)
    a = sorted(tuple(r) for r in merged.select(*cols).collect())
    b = sorted(tuple(r) for r in rebuilt.select(*cols).collect())
    assert a == b and len(a) == 6


def test_scd2_merge_closed_rows_untouched(spark):
    hist = _hist(spark, [(1, date(2024, 1, 1), "a"), (1, date(2024, 2, 1), "b")])
    current = scd.scd2_from_history(hist, ["k"], "ts", ["attr"])
    updates = _hist(spark, [(1, date(2024, 3, 1), "c")])
    merged = scd.scd2_merge(current, updates, ["k"], "ts", ["attr"])
    rows = {r["attr"]: r for r in merged.collect()}
    # the already-closed 'a' row is byte-identical; 'b' closed at the update
    assert rows["a"]["valid_to"] == date(2024, 2, 1)
    assert rows["b"]["valid_to"] == date(2024, 3, 1) and not rows["b"]["is_current"]
    assert rows["c"]["is_current"]


def test_scd2_merge_late_update_no_overlap(spark):
    """A late update whose ts falls inside a CLOSED range must not
    create overlapping validity intervals: merge == full rebuild."""
    import datetime as dt

    from dataframe_kotlin_spark.operators.scd import scd2_from_history, scd2_merge

    t = lambda d: dt.datetime(2024, 1, d)  # noqa: E731
    hist = spark.createDataFrame(
        [(1, t(1), "v1"), (1, t(5), "v2")], "k int, ts timestamp, attr string"
    )
    current = scd2_from_history(hist, ["k"], "ts", ["attr"])
    late = spark.createDataFrame([(1, t(3), "X")], "k int, ts timestamp, attr string")

    merged = scd2_merge(current, late, ["k"], "ts", ["attr"])
    expected = scd2_from_history(
        hist.unionByName(late), ["k"], "ts", ["attr"]
    )
    got = sorted(map(tuple, merged.collect()))
    exp = sorted(map(tuple, expected.collect()))
    assert got == exp
    # non-overlap invariant: each valid_to equals the next valid_from
    rows = sorted(merged.collect(), key=lambda r: r["valid_from"])
    for a, b in zip(rows, rows[1:]):
        assert a["valid_to"] == b["valid_from"]
    assert rows[-1]["valid_to"] is None
