"""Time-window operators — shared between batch and Structured Streaming.

The reference has no streaming at all (SURVEY §2.11); these are the
scale-out extensions. Each operator is expressed as plain DataFrame
transformations so the SAME function works on a batch frame and on a
``readStream`` frame (Spark's unified model). Streaming entry points with
watermarks live in ``stream_jobs.py``.

Bucketing uses integer epoch arithmetic (floor(epoch/width)) rather than
``F.window`` structs so results are directly comparable across engines
and the group key is a plain BIGINT — cheaper to shuffle than a struct.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_seconds(ts_col: str) -> Column:
    # unix epoch seconds as double (keeps sub-second precision);
    # works for both TIMESTAMP and TIMESTAMP_NTZ under a UTC session.
    return F.unix_micros(F.col(ts_col).cast("timestamp")) / 1_000_000.0


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    width_seconds: int,
    keys: Sequence[str],
    aggs: Sequence[Column],
    bucket_name: str = "window_start",
) -> DataFrame:
    """Non-overlapping fixed windows: one bucket per event, single shuffle
    on (keys, bucket). Streaming equivalent: groupBy(window(ts, width))."""
    bucket = F.floor(_epoch_seconds(ts_col) / width_seconds).cast("bigint").alias(bucket_name)
    return df.groupBy(*keys, bucket).agg(*aggs)


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    width_seconds: int,
    slide_seconds: int,
    keys: Sequence[str],
    aggs: Sequence[Column],
    bucket_name: str = "window_start",
) -> DataFrame:
    """Overlapping windows: each event belongs to width/slide windows.
    Implemented the way Structured Streaming's window() does — explode the
    per-event window assignments, then a single grouped aggregation.
    Fan-out factor = width/slide (2 for the common half-overlap case)."""
    assert width_seconds % slide_seconds == 0, "width must be a multiple of slide"
    n = width_seconds // slide_seconds
    slide_bucket = F.floor(_epoch_seconds(ts_col) / slide_seconds).cast("bigint")
    offsets = F.sequence(F.lit(0), F.lit(n - 1))
    exploded = df.withColumn("__off__", F.explode(offsets)).withColumn(
        bucket_name, slide_bucket - F.col("__off__")
    )
    exploded = exploded.filter(F.col(bucket_name) >= 0)
    return exploded.groupBy(*keys, bucket_name).agg(*aggs)


def sessionize(
    df: DataFrame,
    ts_col: str,
    gap_seconds: int,
    keys: Sequence[str],
    aggs: Sequence[Column],
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Session windows by inactivity gap (gaps-and-islands).

    Two window passes over the SAME partitioning (one shuffle on keys):
    1. flag rows starting a new session (gap from previous > gap_seconds),
    2. running sum of flags = session id.
    Streaming equivalent: groupBy(session_window(ts, gap)) — see
    stream_jobs.session_stream.
    """
    order = [ts_col] + ([order_tiebreak] if order_tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    epoch = _epoch_seconds(ts_col)
    prev_epoch = F.lag(epoch).over(w)
    new_session = F.when(
        prev_epoch.isNull() | ((epoch - prev_epoch) > gap_seconds), 1
    ).otherwise(0)
    flagged = df.withColumn("__new__", new_session)
    # Same order list as w: with tied timestamps the running sum must see
    # rows in the exact order the flags were computed, or session ids are
    # nondeterministic precisely when order_tiebreak exists to fix that.
    w2 = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_sid = flagged.withColumn("session_id", F.sum("__new__").over(w2).cast("bigint"))
    return with_sid.groupBy(*keys, "session_id").agg(*aggs)
