"""Row-order analytics + time-window queries (SURVEY §2.7, §2.11).

The reference's prev/next/diff/movingAverage assume implicit row order;
on Spark every one of these is a window function over an explicit order
(events.ts is unique per user at µs resolution; event_id tie-breaks).
Time windows (tumbling/sliding/session) are the batch equivalents of the
streaming module's operators — same expressions, bounded input.
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from dataframe_kotlin_spark.core.frame import KDataFrame
from dataframe_kotlin_spark.queries import query


def _t(spark, sf_dir: str, name: str) -> KDataFrame:
    if name == "events":
        from dataframe_kotlin_spark.session import load_events

        return KDataFrame(load_events(spark, sf_dir))
    return KDataFrame(spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet")))


@query(
    "diff_lag",
    oracle="""
    SELECT event_id, user_id,
           ROUND(COALESCE(value - LAG(value) OVER w, 0), 4) AS value_diff
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def diff_lag(spark, sf_dir):
    """diff = value - prev value, 0 for first row (api/row/diff.kt:3-8;
    DataRow.prev DataRow.kt:15-16). Single shuffle on user_id."""
    e = _t(spark, sf_dir, "events")
    out = e.diff("value", order_by=["ts", "event_id"], partition_by=["user_id"])
    return (
        out.select("event_id", "user_id", F.round(F.col("value_diff"), 4).alias("value_diff")).df
    )


@query(
    "moving_average",
    oracle="""
    SELECT event_id, user_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS value_ma4
    FROM events
    """,
)
def moving_average(spark, sf_dir):
    """movingAverage(k): mean of current + previous k-1, partial windows
    allowed (api/row/movingAverage.kt:3-9)."""
    e = _t(spark, sf_dir, "events")
    out = e.moving_average("value", k=4, order_by=["ts", "event_id"], partition_by=["user_id"])
    return out.select("event_id", "user_id", F.round(F.col("value_ma4"), 4).alias("value_ma4")).df


@query(
    "lead_next",
    oracle="""
    SELECT event_id, user_id, event_type,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events
    """,
)
def lead_next(spark, sf_dir):
    """DataRow.next() -> lead (DataRow.kt:16)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.df.select(
        "event_id", "user_id", "event_type", F.lead("event_type").over(w).alias("next_type")
    )


@query(
    "row_number_rank",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
           RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS status_rank
    FROM orders
    """,
)
def row_number_rank(spark, sf_dir):
    """rowNumber (Operations.kt:116-124) + ranking extensions the reference
    lacks (SURVEY §2.7 last row)."""
    o = _t(spark, sf_dir, "orders")
    w1 = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
    return o.df.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w1).alias("rn"),
        F.rank().over(w2).alias("status_rank"),
    )


@query(
    "cumulative_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                         ROWS UNBOUNDED PRECEDING), 2) AS cum_spent
    FROM orders
    """,
)
def cumulative_sum(spark, sf_dir):
    """Cumulative aggregate (extension; reference's AddDataRow.added()
    self-referencing add, api/add.kt:33-79, maps to running windows)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.df.select(
        "o_orderkey", "o_custkey", F.round(F.sum("o_totalprice").over(w), 2).alias("cum_spent")
    )


@query(
    "rolling_range_revenue",
    oracle="""
    SELECT o_orderkey, o_custkey,
           COUNT(*) OVER w AS n_orders_30d,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE)
             AS revenue_30d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
    """,
)
def rolling_range_revenue(spark, sf_dir):
    """VALUE-range window frame (RANGE BETWEEN INTERVAL): per customer,
    order count and revenue over the trailing 30 days relative to each
    order's date — the frame is bounded by timestamp distance, not row
    count, so ties and gaps are handled by value. Spark expresses it as
    rangeBetween over the epoch DAY number (timezone-free; orderdates
    are midnight-aligned, so a 30-day-number distance is exactly the
    oracle's INTERVAL 30 DAYS). Decimal-sum per the money-parity rule."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")))
        .rangeBetween(-30, 0)
    )
    return o.df.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .over(w)
        .cast("double")
        .alias("revenue_30d"),
    )


@query(
    "interarrival_quantiles",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)) AS gap_us
      FROM events
    )
    SELECT user_id,
           COUNT(gap_us) AS n_gaps,
           ROUND(quantile_cont(gap_us, 0.5) / 1000 + 1e-9, 0) AS median_gap_ms,
           ROUND(quantile_cont(gap_us, 0.9) / 1000 + 1e-9, 0) AS p90_gap_ms
    FROM gaps GROUP BY user_id
    """,
)
def interarrival_quantiles(spark, sf_dir):
    """Per-user inter-event gap distribution: lag over the user timeline,
    then exact interpolated quantiles of the microsecond deltas. One
    shuffle on user_id shared by the window and the aggregate. Deltas in
    integer microseconds (tz-invariant even through the ntz cast);
    rounded to whole ms per the quantile-parity rule."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = e.df.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    )
    return gaps.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        F.round(F.percentile("gap_us", F.lit(0.5)) / 1000 + 1e-9, 0).alias("median_gap_ms"),
        F.round(F.percentile("gap_us", F.lit(0.9)) / 1000 + 1e-9, 0).alias("p90_gap_ms"),
    )


@query(
    "tumbling_window",
    oracle="""
    SELECT user_id,
           CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS hour_bucket,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY user_id, hour_bucket
    """,
)
def tumbling_window(spark, sf_dir):
    """Tumbling 1h window aggregation — batch equivalent of the streaming
    module's windowed agg (SURVEY §2.11). Epoch bucketing keeps the oracle
    engine-agnostic."""
    from dataframe_kotlin_spark.streaming.windows import tumbling_agg

    e = _t(spark, sf_dir, "events")
    return tumbling_agg(
        e.df,
        ts_col="ts",
        width_seconds=3600,
        keys=["user_id"],
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        ],
        bucket_name="hour_bucket",
    )


@query(
    "sliding_window",
    oracle="""
    WITH buckets AS (
      SELECT e.event_type,
             CAST(FLOOR(EPOCH(e.ts) / 1800) AS BIGINT) - s.off AS win_start_halfhour,
             e.value
      FROM events e CROSS JOIN (SELECT UNNEST([0,1]) AS off) s
    )
    SELECT event_type, win_start_halfhour,
           COUNT(*) AS n_events, ROUND(AVG(value) + 1e-9, 4) AS avg_value
    FROM buckets
    WHERE win_start_halfhour >= 0
    GROUP BY event_type, win_start_halfhour
    """,
)
def sliding_window(spark, sf_dir):
    """Sliding window (1h width, 30min slide): each event lands in 2
    overlapping windows — implemented exactly as Structured Streaming does,
    by exploding per-event window assignments then grouping."""
    from dataframe_kotlin_spark.streaming.windows import sliding_agg

    e = _t(spark, sf_dir, "events")
    return sliding_agg(
        e.df,
        ts_col="ts",
        width_seconds=3600,
        slide_seconds=1800,
        keys=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value") + 1e-9, 4).alias("avg_value"),
        ],
        bucket_name="win_start_halfhour",
    )


@query(
    "sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN EPOCH(ts) - EPOCH(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS session_value
    FROM sessions GROUP BY user_id, session_id
    """,
)
def sessionize(spark, sf_dir):
    """Session windows (30-min gap) via gaps-and-islands — the batch
    equivalent of streaming session_window (SURVEY §2.11). One shuffle on
    user_id; both window passes share the partitioning."""
    from dataframe_kotlin_spark.streaming.windows import sessionize as _sessionize

    e = _t(spark, sf_dir, "events")
    return _sessionize(
        e.df,
        ts_col="ts",
        gap_seconds=1800,
        keys=["user_id"],
        order_tiebreak="event_id",
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        ],
    )


@query(
    "first_last_events",
    oracle="""
    SELECT user_id,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts,
           ARG_MIN(event_type, ts) AS first_type,
           ARG_MAX(event_type, ts) AS last_type
    FROM events GROUP BY user_id
    """,
)
def first_last_events(spark, sf_dir):
    """first/last row lookups per group (DataFrame.kt:169-191) as
    min_by/max_by aggregates — no window needed, partial-aggregatable.
    ts is unique per user (µs resolution) so argmin is deterministic."""
    e = _t(spark, sf_dir, "events")
    return (
        e.group_by("user_id")
        .aggregate(
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.min_by("event_type", "ts").alias("first_type"),
            F.max_by("event_type", "ts").alias("last_type"),
        )
        .df
    )


@query(
    "chunked_groups",
    oracle="""
    SELECT chunk, COUNT(*) AS n, MIN(o_orderkey) AS first_key, MAX(o_orderkey) AS last_key
    FROM (SELECT o_orderkey,
                 CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) / 1000) AS BIGINT) AS chunk
          FROM orders)
    GROUP BY chunk
    """,
)
def chunked_groups(spark, sf_dir):
    """chunked(n): split into n-row chunks under explicit order
    (api/chunked.kt) then summarize each chunk."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey")
        .chunked(1000, order_by=["o_orderkey"])
        .group_by("chunk")
        .aggregate(
            F.count(F.lit(1)).alias("n"),
            F.min("o_orderkey").alias("first_key"),
            F.max("o_orderkey").alias("last_key"),
        )
        .df
    )


@query(
    "asof_last_purchase",
    oracle="""
    SELECT l.event_id, l.user_id,
           CAST(FLOOR(EPOCH(l.ts)) AS BIGINT) AS ts_epoch,
           r.value AS last_purchase_value,
           CAST(FLOOR(EPOCH(r.ts)) AS BIGINT) AS last_purchase_epoch
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def asof_last_purchase(spark, sf_dir):
    """As-of join (operators/temporal.asof_join): for every click, the
    user's latest at-or-before purchase. One shuffle on user_id, no join
    node — the duckdb oracle is its native ASOF JOIN, an independent
    implementation of the same semantics."""
    from dataframe_kotlin_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events").df
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = asof_join(
        clicks, purchases, keys=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["value", "ts"],
    )
    return out.select(
        "event_id",
        "user_id",
        (F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000).cast("bigint").alias("ts_epoch"),
        F.col("r_value").alias("last_purchase_value"),
        (F.unix_micros(F.col("r_ts").cast("timestamp")) / 1_000_000).cast("bigint").alias("last_purchase_epoch"),
    )


@query(
    "interval_join_windows",
    oracle="""
    SELECT e.event_id, i.window_id,
           CAST(FLOOR(EPOCH(e.ts)) AS BIGINT) AS ts_epoch
    FROM events e
    JOIN (SELECT event_id AS window_id, ts AS start_ts,
                 ts + INTERVAL 2 HOUR AS end_ts
          FROM events WHERE event_id % 199 = 0) i
      ON e.ts >= i.start_ts AND e.ts < i.end_ts
    """,
)
def interval_join_windows(spark, sf_dir):
    """Interval/range join (operators/temporal.interval_join): events to
    the 2h windows containing them, via time-bucket equi-join + exact
    containment filter — no theta-join cross product. Oracle: the naive
    BETWEEN join (fine at sf0.01, impossible at 100 TB)."""
    from dataframe_kotlin_spark.operators.temporal import interval_join

    ev = _t(spark, sf_dir, "events").df
    iv = ev.filter(F.col("event_id") % 199 == 0).select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )
    out = interval_join(
        ev.select("event_id", "ts"), iv, "ts", "start_ts", "end_ts",
        bucket_seconds=3600,
    )
    return out.select(
        "event_id",
        "window_id",
        (F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000).cast("bigint").alias("ts_epoch"),
    )


@query(
    "percent_rank_dist",
    oracle="""
    SELECT c_custkey,
           ROUND(PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal, c_custkey) + 1e-9, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER (PARTITION BY c_mktsegment
                                   ORDER BY c_acctbal, c_custkey) + 1e-9, 6) AS cume
    FROM customer
    """,
)
def percent_rank_dist(spark, sf_dir):
    """percent_rank / cume_dist (SURVEY §2.7 ranking extras): relative
    standing within a partition — one shuffle on the partition key."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.df.select(
        "c_custkey",
        F.round(F.percent_rank().over(w) + 1e-9, 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w) + 1e-9, 6).alias("cume"),
    )


@query(
    "asof_next_purchase",
    oracle="""
    SELECT l.event_id, l.user_id,
           CAST(FLOOR(EPOCH(l.ts)) AS BIGINT) AS ts_epoch,
           r.value AS next_purchase_value,
           CAST(FLOOR(EPOCH(r.ts)) AS BIGINT) AS next_purchase_epoch
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts <= r.ts
    """,
)
def asof_next_purchase(spark, sf_dir):
    """Forward as-of join (direction='forward'): for every click, the
    user's next at-or-after purchase — the attribution-window question.
    Same single-shuffle windowed-union plan as the backward variant,
    with the running first(ignorenulls) over the FOLLOWING frame; the
    duckdb oracle flips its native ASOF inequality."""
    from dataframe_kotlin_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events").df
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = asof_join(
        clicks, purchases, keys=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["value", "ts"], direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        (F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000).cast("bigint").alias("ts_epoch"),
        F.col("r_value").alias("next_purchase_value"),
        (F.unix_micros(F.col("r_ts").cast("timestamp")) / 1_000_000).cast("bigint").alias("next_purchase_epoch"),
    )


@query(
    "nth_order_value",
    oracle="""
    SELECT DISTINCT o_custkey,
           NTH_VALUE(o_totalprice, 1) OVER w AS first_price,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def nth_order_value(spark, sf_dir):
    """nth_value over the full partition frame (SURVEY §2.7 ranking
    extras): each customer's 1st and 2nd order by date. The frame must
    be pinned to the whole partition explicitly — both engines default
    nth_value to the running frame, where row N can't see order N+1.
    One shuffle on custkey; DISTINCT collapses the per-row window
    output to one row per customer without a second aggregation pass
    of the base table."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        o.df.select(
            "o_custkey",
            F.nth_value("o_totalprice", 1).over(w).alias("first_price"),
            F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_orderkey"),
        )
        .distinct()
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                WHERE event_type = 'click' GROUP BY user_id),
    s2 AS (SELECT e.user_id, MIN(e.ts) AS t2
           FROM events e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MIN(e.ts) AS t3
           FROM events e JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM s1) AS n_clicked,
           (SELECT COUNT(*) FROM s2) AS n_then_viewed,
           (SELECT COUNT(*) FROM s3) AS n_then_purchased
    """,
)
def funnel_conversion(spark, sf_dir):
    """Ordered funnel (click -> later view -> later purchase): how many
    users complete each prefix. The sequential ts > prev constraint is
    what makes this a FUNNEL rather than three independent counts (a
    user who purchases before clicking doesn't convert).

    Single-pass shape: ONE scan of events (pruned to the three funnel
    types before the shuffle), ONE exchange on user_id collecting each
    user's per-stage timestamps, then array HOFs derive the stage-entry
    times row-locally and a final single-row aggregate counts them —
    2 exchanges total vs the naive per-stage join cascade (which scans
    events once per stage and recomputes every stage frame for its
    count). Per-user state is that user's funnel-event list — the same
    per-key bound as sessionize; salt hot users if one dominates."""
    ev = _t(spark, sf_dir, "events").df
    per_user = (
        ev.filter(F.col("event_type").isin("click", "view", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t1"),
            F.collect_list(F.when(F.col("event_type") == "view", F.col("ts"))).alias("__vs__"),
            F.collect_list(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("__ps__"),
        )
        .withColumn("t2", F.array_min(F.filter("__vs__", lambda v: v > F.col("t1"))))
        .withColumn("t3", F.array_min(F.filter("__ps__", lambda p: p > F.col("t2"))))
    )
    return per_user.agg(
        F.count("t1").alias("n_clicked"),
        F.count("t2").alias("n_then_viewed"),
        F.count("t3").alias("n_then_purchased"),
    )


@query(
    "cohort_retention",
    oracle="""
    WITH first_day AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
    )
    SELECT STRFTIME(f.cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(CAST(e.ts AS DATE) - f.cohort_day AS INT) AS day_offset,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM events e JOIN first_day f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-seen day, counted
    distinct on each later activity day-offset. The first-touch frame is
    one row per user — USER-CARDINALITY, not constant: broadcastable on
    most cohorts but unbounded as the user base grows, so the hint goes
    through skew.gated_broadcast (r8 hint audit — the same latent
    forced-broadcast class as the surprisal LM; above the threshold the
    gate pins SHUFFLE_HASH and the join co-partitions on user_id). The
    main aggregate shuffles on (cohort_day, day_offset) with a
    distinct-expand — the standard retention-curve input. The events
    span is small so cohorts are by DAY; at production scale the same
    plan truncates to week/month."""
    from dataframe_kotlin_spark.operators import skew

    ev = _t(spark, sf_dir, "events").df
    first_day = ev.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("cohort_day"))
    est_users = skew.sampled_distinct_rows(
        ev.sample(fraction=0.02, seed=7), "user_id", 0.02
    )
    return (
        ev.join(skew.gated_broadcast(first_day, est_users, bytes_per_row=48), "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias("day_offset"),
        )
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"), F.col("day_offset")
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


@query(
    "scd2_status_timeline",
    oracle="""
    WITH log AS (
      SELECT o_custkey, o_orderstatus, MIN(o_orderdate) AS o_orderdate
      FROM orders GROUP BY o_custkey, o_orderstatus
    ),
    dedup AS (
      SELECT * FROM (
        SELECT o_custkey, o_orderdate, o_orderstatus,
               LAG(o_orderstatus) OVER w AS prev_status
        FROM log
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderstatus)
      ) WHERE prev_status IS NULL OR prev_status <> o_orderstatus
    )
    SELECT o_custkey, o_orderstatus,
           STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS valid_from,
           STRFTIME(CAST(LEAD(o_orderdate) OVER w2 AS DATE), '%Y-%m-%d') AS valid_to,
           LEAD(o_orderdate) OVER w2 IS NULL AS is_current
    FROM dedup
    WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderstatus)
    """,
)
def scd2_status_timeline(spark, sf_dir):
    """SCD2 rebuild (operators/scd.scd2_from_history) over each
    customer's order-status change log: one versioned row per status
    run, valid until the next change, latest open. One shuffle on the
    key; consecutive repeats collapse before the lead window. The
    change log dedups (custkey, status, first date) to make the
    fixture deterministic (orders share dates)."""
    from dataframe_kotlin_spark.operators import scd

    o = _t(spark, sf_dir, "orders").df
    log = o.groupBy("o_custkey", "o_orderstatus").agg(
        F.min("o_orderdate").alias("o_orderdate")
    )
    out = scd.scd2_from_history(
        log,
        keys=["o_custkey"],
        ts_col="o_orderdate",
        attr_cols=["o_orderstatus"],
        tie_cols=["o_orderstatus"],
    )
    return out.select(
        "o_custkey",
        "o_orderstatus",
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd").alias("valid_to"),
        "is_current",
    )


@query(
    "running_total_scan",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
)
def running_total_scan(spark, sf_dir):
    """Self-referencing add (reference AddDataRow.added(), api/add.kt:33-79)
    as a distributed associative scan: running per-customer order revenue
    via core.frame.add_scan — one shuffle on the partition key, the window
    running-sum replaces the reference's sequential row walk."""
    o = _t(spark, sf_dir, "orders")
    out = o.add_scan(
        "running_total",
        "o_totalprice",
        "sum",
        order_by=["o_orderdate", "o_orderkey"],
        partition_by=["o_custkey"],
    )
    return out.select(
        "o_custkey", "o_orderkey", F.round(F.col("running_total"), 2).alias("running_total")
    ).df


@query(
    "neighbour_values",
    oracle="""
    SELECT event_id, user_id,
           array_to_string(
             [printf('%.4f', COALESCE(ROUND(LAG(value)  OVER w, 4), 0)),
              printf('%.4f', COALESCE(ROUND(value, 4), 0)),
              printf('%.4f', COALESCE(ROUND(LEAD(value) OVER w, 4), 0))], ',')
             AS value_neighbours
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def neighbour_values(spark, sf_dir):
    """Relative-row set (reference DataRow.neighbours(-1..1), DataRow.kt:40)
    per user over event time: one Sort+Window pass computes every offset.
    Out-of-partition offsets are null; coalesced to 0 on BOTH sides
    because float nulls inside arrays round-trip differently through
    Arrow on the two engines (NaN vs 0) — a representation issue, not a
    semantic one. The neighbour triple is serialized to a ','-joined
    '%.4f' string (round-first, then fixed formatting, so both engines
    emit identical digits): the gate canonicalizer sorts raw pandas
    cells and cannot hash Python lists."""
    e = _t(spark, sf_dir, "events")
    rounded = e.df.withColumn("value", F.round(F.col("value"), 4))
    out = KDataFrame(rounded).neighbours(
        "value", [-1, 0, 1], order_by=["ts", "event_id"], partition_by=["user_id"]
    )
    fixed = F.transform(
        F.col("value_neighbours"),
        lambda v: F.format_string("%.4f", F.coalesce(v, F.lit(0.0))),
    )
    return out.df.select(
        "event_id", "user_id", F.array_join(fixed, ",").alias("value_neighbours")
    )


@query(
    "hypertable_rollup_events",
    oracle="""
    WITH fine AS (
      SELECT CAST(FLOOR(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket_start,
             event_type,
             COUNT(*) AS n_events,
             ROUND(SUM(value), 2) AS sum_value
      FROM events GROUP BY 1, 2
    ), coarse AS (
      SELECT CAST(FLOOR(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket_start,
             event_type,
             COUNT(*) AS n_events,
             ROUND(SUM(value), 2) AS sum_value
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(3600 AS BIGINT) AS granularity_seconds, * FROM fine
    UNION ALL
    SELECT CAST(86400 AS BIGINT) AS granularity_seconds, * FROM coarse
    """,
)
def hypertable_rollup_events(spark, sf_dir):
    """Hypertable continuous-aggregate rollup (operators/temporal.
    hypertable_rollup): hourly buckets scan raw events ONCE; daily
    buckets re-aggregate the hourly partials (sum-of-sums /
    sum-of-counts — exact for decomposable stats). The oracle computes
    BOTH granularities directly from raw, proving coarse-from-fine
    reuse loses nothing."""
    from dataframe_kotlin_spark.operators import temporal as temporal_ops

    e = _t(spark, sf_dir, "events")
    out = temporal_ops.hypertable_rollup(
        e.df, "ts", ["event_type"], "value", bucket_seconds=(3600, 86400)
    )
    return out.withColumn("sum_value", F.round(F.col("sum_value"), 2))


@query(
    "resample_ffill_hours",
    oracle="""
    WITH agg AS (
      SELECT user_id, CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS bucket,
             ROUND(AVG(value), 6) AS avg_value
      FROM events GROUP BY 1, 2
    ),
    rng AS (SELECT user_id, MIN(bucket) AS b0, MAX(bucket) AS b1 FROM agg GROUP BY user_id),
    grid AS (SELECT user_id, unnest(generate_series(b0, b1)) AS bucket FROM rng)
    SELECT g.user_id, g.bucket, a.avg_value,
           last_value(a.avg_value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_value_filled
    FROM grid g LEFT JOIN agg a ON g.user_id = a.user_id AND g.bucket = a.bucket
    """,
)
def resample_ffill_hours(spark, sf_dir):
    """Gap-filled hourly resample (operators/temporal.resample_ffill):
    densify each user's hourly grid between first and last event and
    forward-fill missing hours. Observed vs imputed stays distinguishable
    (avg_value NULL on generated rows)."""
    from dataframe_kotlin_spark.operators.temporal import resample_ffill

    return resample_ffill(
        _t(spark, sf_dir, "events").df,
        ts_col="ts",
        keys=["user_id"],
        bucket_seconds=3600,
        agg=F.round(F.avg("value"), 6),
        value_name="avg_value",
        bucket_name="bucket",
    )


@query(
    "rolling_dedup_events",
    oracle="""
    SELECT event_id, user_id, event_type, ts
    FROM (
      SELECT event_id, user_id, event_type, ts,
             EPOCH(ts) - LAG(EPOCH(ts)) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap
      FROM events
    )
    WHERE gap IS NULL OR gap > 1800
    """,
)
def rolling_dedup_events(spark, sf_dir):
    """Burst dedup (operators/temporal.rolling_dedup): keep only events
    starting a (user, type) burst — no same-key event in the preceding
    30 min. The lag formulation distributes as one window pass."""
    from dataframe_kotlin_spark.operators.temporal import rolling_dedup

    out = rolling_dedup(
        _t(spark, sf_dir, "events").df,
        keys=["user_id", "event_type"],
        ts_col="ts",
        window_seconds=1800,
        tiebreak="event_id",
    )
    return out.select("event_id", "user_id", "event_type", "ts")


@query(
    "asof_nearest_purchase",
    oracle="""
    WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
    r AS (SELECT * FROM events WHERE event_type = 'purchase'),
    b AS (
      SELECT l.event_id, l.user_id, l.ts, r.value AS bv, r.ts AS bts
      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    ),
    f AS (
      SELECT l.event_id, r.value AS fv, r.ts AS fts
      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts
    )
    SELECT b.event_id, b.user_id,
           CAST(FLOOR(EPOCH(b.ts)) AS BIGINT) AS ts_epoch,
           CASE WHEN f.fts IS NULL THEN b.bv
                WHEN b.bts IS NULL THEN f.fv
                WHEN EPOCH(b.ts) - EPOCH(b.bts) <= EPOCH(f.fts) - EPOCH(b.ts) THEN b.bv
                ELSE f.fv END AS nearest_value
    FROM b JOIN f USING (event_id)
    """,
)
def asof_nearest_purchase(spark, sf_dir):
    """Nearest as-of join (direction='nearest', ties -> backward, the
    pandas merge_asof contract): for every click, the user's closest
    purchase in either time direction. Both window frames evaluate over
    the SAME single shuffle (operators/temporal.py asof_join); the
    oracle composes DuckDB's two native ASOF directions and picks the
    closer match."""
    from dataframe_kotlin_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events").df
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = asof_join(
        clicks, purchases, keys=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["value"], direction="nearest",
    )
    return out.select(
        "event_id",
        "user_id",
        (F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000).cast("bigint").alias("ts_epoch"),
        F.col("r_value").alias("nearest_value"),
    )


@query(
    "slice_rows_page",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM (SELECT o_orderkey, o_custkey, o_totalprice,
                 ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS rn
          FROM orders)
    WHERE rn >= 2000 AND rn < 2100
    """,
)
def slice_rows_page(spark, sf_dir):
    """Positional page df[2000..2100) under explicit order
    (DataFrame.kt:138-185 slicing; round-4: distributed two-pass row
    number via value-derived order buckets — no single-task window)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .slice_rows(2000, 2100, order_by=["o_orderkey"])
        .df
    )


@query(
    "skip_last_tail",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n, MAX(o_orderkey) AS max_key
    FROM (SELECT o_orderkey,
                 ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn,
                 COUNT(*) OVER () AS tot
          FROM orders)
    WHERE rn <= tot - 500
    """,
)
def skip_last_tail(spark, sf_dir):
    """skipLast(500) under explicit order (DataFrame.kt:182) — fully
    lazy since round 4 (frame total rides the offsets aggregate, no
    hidden count() action) and distributed (bucketed two-pass row
    number)."""
    o = _t(spark, sf_dir, "orders")
    trimmed = o.select("o_orderkey").skip_last(500, order_by=["o_orderkey"])
    return trimmed.df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max("o_orderkey").alias("max_key"),
    )
