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
    direction: str = "backward",
) -> DataFrame:
    """pandas-merge_asof-style as-of join, distributed.

    direction='backward' (default): latest right row with
    right_ts <= left_ts per key. 'forward': earliest right row with
    right_ts >= left_ts. 'nearest': whichever of the two is closer in
    time (ties -> backward, matching pandas). Left rows with no match
    get nulls (left-outer as-of). `tolerance_seconds` drops matches
    further than the tolerance in the match direction.

    One shuffle (on keys) regardless of direction — backward/forward
    are one within-partition sort + running last/first(ignorenulls)
    window; 'nearest' evaluates both window frames over the same
    shuffle (a second sort order, not a second exchange). No join node
    in any variant.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    # The matched right row travels as ONE struct: per-column
    # last/first(ignorenulls) windows would stitch the output from
    # DIFFERENT right rows whenever the matched row holds a NULL in one
    # column (ignorenulls falls through to an older row for just that
    # column). A struct is non-null as a whole even when fields are
    # null, so the pick is atomic. Right rows with a NULL timestamp are
    # not matchable (pandas merge_asof requires non-null keys).
    rv = F.struct(
        F.col(right_ts).alias("__rts__"), *[F.col(c).alias(c) for c in right_cols]
    )
    rv_type = right.select(rv.alias("__rv__")).schema["__rv__"].dataType
    l_tag = left.select(
        *keys,
        F.col(left_ts).alias("__ts__"),
        F.lit(1).alias("__side__"),
        F.lit(None).cast(rv_type).alias("__rv__"),
        F.struct(*left.columns).alias("__row__"),
    )
    r_tag = right.filter(F.col(right_ts).isNotNull()).select(
        *keys,
        F.col(right_ts).alias("__ts__"),
        F.lit(0).alias("__side__"),
        rv.alias("__rv__"),
        F.lit(None).cast(l_tag.schema["__row__"].dataType).alias("__row__"),
    )
    # backward: right rows sort BEFORE left at equal ts => <= ties match
    w_b = (
        Window.partitionBy(*keys)
        .orderBy("__ts__", "__side__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: left rows sort BEFORE right at equal ts => >= ties match
    w_f = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts__"), F.col("__side__").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    unioned = l_tag.unionByName(r_tag)

    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    tol_us = None if tolerance_seconds is None else tolerance_seconds * 1_000_000

    def outs(mv):
        return [mv[c].alias(f"r_{c}") for c in right_cols]

    if direction in ("backward", "forward"):
        pick = (
            F.last("__rv__", ignorenulls=True).over(w_b)
            if direction == "backward"
            else F.first("__rv__", ignorenulls=True).over(w_f)
        )
        filled = unioned.select(
            "__side__", "__row__", "__ts__", pick.alias("__mv__")
        ).filter(F.col("__side__") == 1)
        mv = F.col("__mv__")
        if tol_us is not None:
            gap = (
                us(F.col("__ts__")) - us(mv["__rts__"])
                if direction == "backward"
                else us(mv["__rts__"]) - us(F.col("__ts__"))
            )
            mv = F.when(mv.isNotNull() & (gap <= tol_us), mv)
        return filled.select("__row__.*", *outs(mv))

    # nearest: materialize both candidates, choose per row
    both = unioned.select(
        "__side__",
        "__row__",
        "__ts__",
        F.last("__rv__", ignorenulls=True).over(w_b).alias("__bv__"),
        F.first("__rv__", ignorenulls=True).over(w_f).alias("__fv__"),
    ).filter(F.col("__side__") == 1)
    bv, fv = F.col("__bv__"), F.col("__fv__")
    gap_b = us(F.col("__ts__")) - us(bv["__rts__"])
    gap_f = us(fv["__rts__"]) - us(F.col("__ts__"))
    ok_b = bv.isNotNull() & (F.lit(True) if tol_us is None else gap_b <= tol_us)
    ok_f = fv.isNotNull() & (F.lit(True) if tol_us is None else gap_f <= tol_us)
    use_b = ok_b & (~ok_f | (gap_b <= gap_f))  # tie -> backward (pandas)
    mv = F.when(use_b, bv).when(ok_f, fv)
    return both.select("__row__.*", *outs(mv))


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


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    value_col: str,
    bucket_seconds: Sequence[int] = (60, 3600, 86400),
) -> DataFrame:
    """Multi-granularity time rollup with coarse-from-fine reuse (the
    hypertable continuous-aggregate pattern).

    Only the FINEST granularity scans the raw table; every coarser level
    re-aggregates the previous level's partials — sum-of-sums and
    sum-of-counts are exact because the stats are decomposable (avg is
    derived as sum/count at read time, never averaged-of-averages). At
    100 TB this is the difference between one raw scan per granularity
    and one raw scan total; the level-N aggregation input is ~|keys| x
    |buckets_N-1| rows, already tiny.

    Output: granularity_seconds, bucket_start (epoch seconds), *keys,
    n_events, sum_value — one unioned frame, partitioned consumers
    filter on granularity_seconds.
    """
    grans = sorted(set(int(b) for b in bucket_seconds))
    assert grans and grans[0] > 0
    for fine, coarse in zip(grans, grans[1:]):
        assert coarse % fine == 0, (
            f"{coarse}s must be a multiple of {fine}s for exact reuse"
        )
    epoch = F.unix_micros(F.col(ts_col).cast("timestamp")) / 1_000_000.0
    finest = grans[0]
    level = (
        df.withColumn(
            "bucket_start",
            (F.floor(epoch / finest) * finest).cast("bigint"),
        )
        .groupBy("bucket_start", *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
    )
    out = level.withColumn("granularity_seconds", F.lit(finest).cast("bigint"))
    for g in grans[1:]:
        level = (
            level.withColumn(
                "bucket_start",
                (F.floor(F.col("bucket_start") / g) * g).cast("bigint"),
            )
            .groupBy("bucket_start", *keys)
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
            )
        )
        out = out.unionByName(
            level.withColumn("granularity_seconds", F.lit(g).cast("bigint"))
        )
    return out.select(
        "granularity_seconds", "bucket_start", *keys, "n_events", "sum_value"
    )


def resample_ffill(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    bucket_seconds: int,
    agg: Column,
    value_name: str = "value",
    bucket_name: str = "bucket",
) -> DataFrame:
    """Resample an event stream to a fixed grid with gap filling: per
    key, aggregate into ``bucket_seconds`` buckets, DENSIFY to every
    bucket between the key's first and last event, and forward-fill
    missing buckets with the last observed value.

    Distributed shape: (1) one grouped agg on (keys, bucket); (2) a
    per-key min/max + `sequence` explode generates the dense grid —
    grid size is (span/bucket) rows per key, generated executor-side,
    never collected; (3) a left join snaps observations onto the grid
    (broadcast-friendly: the sparse agg is the small side when data is
    gappy); (4) one `last(ignorenulls)` window per key orders by bucket
    and carries values forward. Two shuffles total on the keys.

    The raw aggregate survives as ``<value_name>`` (NULL on generated
    rows) next to ``<value_name>_filled`` so downstream can tell
    observed from imputed — the lineage rule for imputation in a
    training pipeline.

    The hypertable-rollup cousin (`temporal.hypertable_rollup`) keeps
    only observed buckets; this one makes absence explicit, which is
    what rate/derivative computations over a grid need.
    """
    from dataframe_kotlin_spark.streaming.windows import _epoch_seconds

    bucket = F.floor(_epoch_seconds(ts_col) / bucket_seconds).cast("bigint")
    observed = df.groupBy(
        *keys, bucket.alias(bucket_name)
    ).agg(agg.alias(value_name))
    # r12: `observed` has two consumers (the per-key range aggregate and
    # the grid snap join) and the repeated subtree does not collapse to
    # ReusedExchange under AQE — without the persist the raw-event scan
    # + grouped aggregation execute twice per run. The cached relation
    # is (keys x observed buckets) — aggregate-sized, far below the raw
    # events at any scale (the persist-wins shape); bounded-FIFO
    # lifecycle as everywhere else.
    from pyspark import StorageLevel

    from dataframe_kotlin_spark.operators.cachereg import QUERY_RESULTS

    observed = QUERY_RESULTS.retain(observed.persist(StorageLevel.MEMORY_AND_DISK))
    rng = observed.groupBy(*keys).agg(
        F.min(bucket_name).alias("__b0__"), F.max(bucket_name).alias("__b1__")
    )
    grid = rng.select(
        *keys, F.explode(F.sequence(F.col("__b0__"), F.col("__b1__"))).alias(bucket_name)
    )
    joined = grid.join(observed, [*keys, bucket_name], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy(bucket_name)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.withColumn(
        f"{value_name}_filled", F.last(value_name, ignorenulls=True).over(w)
    )


def rolling_dedup(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    window_seconds: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Burst dedup: keep only rows that START a burst — a row survives
    iff no same-key row (kept or dropped) precedes it within
    ``window_seconds``. Identical to the sessionize new-session flag
    (streaming/windows.sessionize) used as a filter.

    Semantics note (matters for correctness): this lag-based variant
    suppresses a burst entirely until a silence longer than the window;
    the alternative "throttle" contract (admit one row per window,
    measured from the last KEPT row) is a non-associative running scan
    and does not distribute as a single window pass. One shuffle on the
    keys. Streaming twin: stream_jobs.dedup_stream
    (dropDuplicatesWithinWatermark).
    """
    from dataframe_kotlin_spark.streaming.windows import _epoch_seconds

    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    epoch = _epoch_seconds(ts_col)
    prev = F.lag(epoch).over(w)
    keep = prev.isNull() | ((epoch - prev) > window_seconds)
    return df.withColumn("__keep__", keep).filter(F.col("__keep__")).drop("__keep__")
