"""Temporal joins Spark lacks natively: as-of and interval (range) joins.

The reference has only equi joins (SURVEY §2.3) — these are the
scale-out extensions for event data. Both avoid the naive O(n·m)
theta-join by construction:

- **as-of**: union both sides and resolve "latest right row at or before
  each left row" with one `last(ignorenulls)` window — a single shuffle
  on the key columns, no join at all. This is the standard distributed
  as-of formulation (a sort-merge within key partitions).
- **interval**: bucketize time on both sides (intervals explode into the
  buckets they overlap), equi-join on (key?, bucket), then filter exact
  containment and dedup. The bucket width trades replication factor
  against candidate-set size; the shuffle keys on the bucket id, so a
  100 TB event table joins a window table without a cross product.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row: columns of the latest right row with
    right_ts <= left_ts (per key). Left rows with no prior right row get
    nulls (left-outer as-of). `tolerance_seconds` drops matches older
    than the tolerance (pandas merge_asof semantics).

    One shuffle (on keys), one sort within partitions — no join node.
    """
    l_tag = left.select(
        *keys,
        F.col(left_ts).alias("__ts__"),
        F.lit(1).alias("__side__"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}__") for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts__"),
        F.struct(*left.columns).alias("__row__"),
    )
    r_tag = right.select(
        *keys,
        F.col(right_ts).alias("__ts__"),
        F.lit(0).alias("__side__"),
        *[F.col(c).alias(f"__r_{c}__") for c in right_cols],
        F.col(right_ts).alias("__rts__"),
        F.lit(None).cast(l_tag.schema["__row__"].dataType).alias("__row__"),
    )
    # right rows sort before left rows at equal ts => ties match (<=)
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts__", "__side__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l_tag.unionByName(r_tag)
    filled = unioned.select(
        "__side__",
        "__row__",
        "__ts__",
        F.last("__rts__", ignorenulls=True).over(w).alias("__mts__"),
        *[
            F.last(f"__r_{c}__", ignorenulls=True).over(w).alias(f"__r_{c}__")
            for c in right_cols
        ],
    ).filter(F.col("__side__") == 1)
    if tolerance_seconds is not None:
        within = (
            F.col("__mts__").isNotNull()
            & (
                F.unix_micros(F.col("__ts__").cast("timestamp"))
                - F.unix_micros(F.col("__mts__").cast("timestamp"))
                <= tolerance_seconds * 1_000_000
            )
        )
        filled = filled.select(
            "__row__",
            *[
                F.when(within, F.col(f"__r_{c}__")).alias(f"__r_{c}__")
                for c in right_cols
            ],
        )
    return filled.select(
        "__row__.*", *[F.col(f"__r_{c}__").alias(f"r_{c}") for c in right_cols]
    )


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    keys: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Join events to the intervals containing them
    (start <= ts < end), scalably.

    Intervals explode into every `bucket_seconds` bucket they overlap;
    events map to exactly one bucket; the equi-join runs on
    (*keys, bucket) and the exact containment filter runs after. A
    containing interval matches in exactly one bucket (the event's), so
    no dedup is needed. Interval replication = ceil(span/bucket)+1 rows.
    """
    if how != "inner":
        raise ValueError("interval_join is inner-only; outer = union unmatched")
    ev_bucket = F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / (bucket_seconds * 1_000_000))
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))
    b0 = F.floor(s_us / (bucket_seconds * 1_000_000))
    b1 = F.floor(e_us / (bucket_seconds * 1_000_000))
    ev = events.withColumn("__bucket__", ev_bucket)
    iv = intervals.withColumn("__bucket__", F.explode(F.sequence(b0, b1)))
    joined = ev.join(iv, [*keys, "__bucket__"], "inner").filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("__bucket__")
