"""Structured Streaming entry points over the events stream.

The reference has no streaming (SURVEY §2.11) — these are the scale-out
extensions planned in SURVEY §7 P6. Design notes for cluster scale:

- File-source ``readStream`` with an explicit schema (never
  ``inferSchema`` on a stream): schema inference would stall the driver
  listing files at 100 TB.
- Every aggregation carries a watermark so state is bounded: without it
  a windowed agg's state store grows forever. Watermark delay is a
  parameter, not a constant, because event-time skew is workload-specific.
- Window aggs use the built-in ``F.window`` / ``F.session_window``
  (JVM-side, incremental, RocksDB-spillable state). The custom stateful
  path (``sessionize_stateful``) uses ``applyInPandasWithState`` — the
  Arrow-batched state API — and exists for session semantics the built-in
  can't express (e.g. per-session value caps).
- The same logical transformations run in batch through
  ``streaming/windows.py``; tests assert batch == streaming on the same
  input (Spark's unified model).
"""

from __future__ import annotations

import os
from typing import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _events_schema(spark: SparkSession, path: str) -> T.StructType:
    """Resolve the source schema from ONE batch metadata read of the path.

    Explicit schemas are mandatory on file streams (inference would stall
    the driver at 100 TB), but hardcoding one breaks when the producer
    changes the physical timestamp encoding — the driver's events table
    has shipped both TIMESTAMP(NANOS) (bigint with nanosAsLong) and plain
    TIMESTAMP(MICROS). A footer-only batch read costs O(files) metadata,
    no data scan.
    """
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        return spark.read.parquet(path).schema
    except Exception:
        # source directory empty / not yet populated: fall back to the
        # canonical events schema so the stream can start BEFORE the
        # producer drops its first file (the standard deployment order)
        return DEFAULT_EVENTS_SCHEMA
    finally:
        # conf is scoped to this one metadata read — leaving it set would
        # silently change how UNRELATED batch reads decode TIMESTAMP(NANOS)
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of events with ts normalized to TIMESTAMP.

    ``path`` is a directory (or glob) of parquet files. At scale, set
    ``max_files_per_trigger`` to bound micro-batch size; the source tracks
    processed files in the checkpoint, so reprocessing is exactly-once.
    """
    schema = _events_schema(spark, path)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.parquet(path)
    ts_type = schema["ts"].dataType.simpleString()
    if ts_type == "bigint":
        # nanos-as-long encoding; integer div: double math loses precision
        # on ~1.7e18 ns values
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_stream(
    events: DataFrame, width_seconds: int, watermark: str = "10 minutes"
) -> DataFrame:
    """Windowed count/sum per event_type. State pruned by the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{width_seconds} seconds"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_stream(
    events: DataFrame,
    width_seconds: int,
    slide_seconds: int,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Overlapping windows; fan-out = width/slide copies per event."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", f"{width_seconds} seconds", f"{slide_seconds} seconds"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n_events")
    )


def session_stream(
    events: DataFrame, gap_seconds: int, watermark: str = "30 minutes"
) -> DataFrame:
    """Built-in session windows (inactivity gap) per user."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", f"{gap_seconds} seconds"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Custom stateful operator: applyInPandasWithState sessionization.
# Demonstrates the Arrow-batched arbitrary-state API for semantics
# session_window can't express (here: emit per-session event-value sum with
# a hard cap on session length in events).

SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _session_fn_factory(gap_seconds: int, max_events: int):
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdf_iter: Iterator, state):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "sum_value": [round(total, 2)],
                }
            )
            return

        rows = []
        start_us, last_us, n, total = state.get if state.exists else (None, None, 0, 0.0)
        # a group larger than one Arrow batch arrives as MULTIPLE chunks
        # with no cross-chunk ordering guarantee: concatenate before the
        # single time-ordered pass, or session boundaries go wrong
        chunks = list(pdf_iter)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values("ts")
            for ts, value in zip(pdf["ts"], pdf["value"]):
                ts_us = int(pd.Timestamp(ts).value // 1000)
                closes = last_us is not None and (
                    ts_us - last_us > gap_us or n >= max_events
                )
                if closes:
                    rows.append((user_id, start_us, last_us, n, total))
                    start_us, last_us, n, total = None, None, 0, 0.0
                if start_us is None:
                    start_us = ts_us
                last_us, n, total = ts_us, n + 1, total + (value or 0.0)
        if start_us is not None:
            state.update((start_us, last_us, n, total))
            # EVENT-time timer (r13): the session closes when the
            # WATERMARK passes last_event + gap. The old
            # ProcessingTimeTimeout coupled closure to wall-clock: a
            # bounded drain (availableNow — every backfill/catch-up
            # replay) sat IDLE for gap_seconds spinning empty
            # micro-batches (~650 batches × 0.8 s measured at sf0.1,
            # state frozen at 1,500 rows / 0 updated) before its own
            # timers would fire, and closure depended on processing
            # speed, so replays emitted different session sets.
            # Event-time timers are replay-deterministic and the final
            # no-data batch flushes everything the watermark passed.
            # Spark requires the timestamp to exceed the current
            # watermark: late data can put last+gap at or below it, in
            # which case the session is already closable — the +1 fires
            # it on this batch's timeout sweep.
            state.setTimeoutTimestamp(
                max(last_us // 1000 + gap_seconds * 1000, state.getCurrentWatermarkMs() + 1)
            )
        if rows:
            import pandas as pd

            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in rows],
                    "session_start": [pd.Timestamp(r[1], unit="us") for r in rows],
                    "session_end": [pd.Timestamp(r[2], unit="us") for r in rows],
                    "n_events": [r[3] for r in rows],
                    "sum_value": [round(r[4], 2) for r in rows],
                }
            )

    return fn


def sessionize_stateful(
    events: DataFrame,
    gap_seconds: int,
    max_events: int = 1_000_000,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Custom stateful sessionization via applyInPandasWithState.

    Differs from ``session_stream`` by the ``max_events`` cap: a session
    also closes after N events (built-in session_window cannot do this).
    State is one small tuple per open session per user — bounded by the
    active-user cardinality, pruned by EVENT-time timeout (r13: was
    processing-time, which made every bounded drain idle gap_seconds
    spinning empty micro-batches and made closure replay-dependent —
    see the timer comment in _session_fn_factory).
    """
    # project/cast BEFORE withWatermark: a cast of the watermark column
    # after tagging re-aliases it and strips the event-time marker, and
    # EventTimeTimeout then fails analysis ("Event-time timeout not
    # supported without watermark")
    ev = events.select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    ).withWatermark("ts", watermark)
    return ev.groupBy("user_id").applyInPandasWithState(
        _session_fn_factory(gap_seconds, max_events),
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )


def run_to_memory(
    stream_df: DataFrame,
    table_name: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> None:
    """Drain a bounded stream into an in-memory table (tests / smoke).

    Uses availableNow so the query processes every currently-available
    file then stops — the batch-parity harness. In append mode only
    watermark-closed windows are emitted (Spark runs a no-data microbatch
    at the end to flush state once the watermark advances). Production
    sinks would be ``format("parquet").partitionBy(...)`` or a Kafka sink
    with ``trigger(processingTime=...)``.
    """
    (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .option("checkpointLocation", os.path.join(checkpoint_dir, table_name))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(300)
    )


def enrich_stream(events: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: each micro-batch joins against the (re-read)
    static side — the standard enrichment pattern. The static side is
    broadcast per batch when under the threshold; no state is kept, so
    this composes freely with downstream watermarked aggs."""
    return events.join(F.broadcast(dim), on, "left")


def _latest_committed(target_dir: str) -> int | None:
    """Last COMMITTED batch id of a versioned-pointer target, or None."""
    import os as _os

    ptr = _os.path.join(target_dir, "_LATEST")
    if not _os.path.exists(ptr):
        return None
    with open(ptr) as f:
        txt = f.read().strip()
    return int(txt) if txt else None


def _publish_version(target_dir: str, batch_id: int, prune_below: int | None) -> None:
    """Atomically commit v<batch_id> via the _LATEST pointer (os.replace,
    atomic on POSIX) and best-effort prune versions older than the
    PREVIOUS commit (kept for readers that resolved the pointer just
    before the swap). On object stores without atomic rename, use a
    transactional table format instead of this filesystem formulation."""
    import os as _os
    import shutil as _shutil

    tmp = _os.path.join(target_dir, "_LATEST.tmp")
    with open(tmp, "w") as f:
        f.write(str(batch_id))
        f.flush()
        _os.fsync(f.fileno())
    _os.replace(tmp, _os.path.join(target_dir, "_LATEST"))
    for name in _os.listdir(target_dir):
        if name.startswith("v") and name[1:].isdigit() and int(name[1:]) < (prune_below or 0):
            _shutil.rmtree(_os.path.join(target_dir, name), ignore_errors=True)


def read_versioned(spark: SparkSession, target_dir: str) -> DataFrame:
    """Read the committed version of a versioned-pointer target (upsert
    sink / count-min sketch) — never a half-written one."""
    import os as _os

    v = _latest_committed(target_dir)
    if v is None:
        raise FileNotFoundError(f"no committed version at {target_dir}")
    return spark.read.parquet(_os.path.join(target_dir, f"v{v}"))


def run_upsert_sink(
    stream_df: DataFrame,
    target_dir: str,
    keys: list,
    checkpoint_dir: str,
    reduce=None,
) -> None:
    """foreachBatch upsert sink: each micro-batch MERGEs into a parquet
    target via KDataFrame.merge_upsert (anti-join + union). This is the
    idempotent-sink pattern for engines without a transactional table
    format; with Delta/Iceberg the body becomes MERGE INTO.

    Crash safety uses the same versioned-pointer protocol as
    count_min_stream: each merge writes a NEW version dir and atomically
    swaps the _LATEST pointer, so a crash mid-write leaves the previous
    commit intact (an overwrite-in-place sink would lose ALL accumulated
    rows if it died between delete and commit). Replayed batches
    (foreachBatch is at-least-once) with batch_id <= committed are
    no-ops. Read the result with read_versioned, not a raw parquet read.

    `reduce` (optional, DataFrame -> DataFrame) collapses the micro-batch
    to one row per key first (e.g. latest-by-timestamp) — batch-local
    work, no streaming state.
    """
    import os as _os

    from dataframe_kotlin_spark.core.frame import KDataFrame

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        last = _latest_committed(target_dir)
        if last is not None and batch_id <= last:
            return  # replay of an already-committed batch
        if reduce is not None:
            batch_df = reduce(batch_df)
        if last is not None:
            base = KDataFrame(spark.read.parquet(_os.path.join(target_dir, f"v{last}")))
            merged = base.merge_upsert(KDataFrame(batch_df), keys=keys).df
        else:
            merged = batch_df
        merged.write.mode("overwrite").parquet(_os.path.join(target_dir, f"v{batch_id}"))
        _publish_version(target_dir, batch_id, prune_below=last)

    (
        stream_df.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(300)
    )


def join_event_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within_seconds: int = 1800,
    watermark: str = "0 seconds",
    suffix: str = "_r",
) -> DataFrame:
    """Watermarked stream-stream inner join with a time-range bound
    (right event within ``within_seconds`` AFTER the left event).

    The range condition is not decoration — it is what bounds the join
    state: each side buffers rows only until the other side's watermark
    passes ts + within, then the state store evicts them. An equi-join
    without a time bound would buffer both streams forever. Right-side
    columns get ``suffix`` so the joined row keeps both timestamps.
    """
    r = right
    for c in right.columns:
        r = r.withColumnRenamed(c, c + suffix)
    lw = left.withWatermark("ts", watermark)
    rw = r.withWatermark("ts" + suffix, watermark)
    cond = (
        (F.col(key) == F.col(key + suffix))
        & (F.col("ts" + suffix) >= F.col("ts"))
        & (F.col("ts" + suffix) <= F.col("ts") + F.expr(f"INTERVAL {within_seconds} SECOND"))
    )
    return lw.join(rw, cond, "inner")


def dedup_stream(
    stream: DataFrame,
    keys: list,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps one row per key and expires
    a key's state once the watermark passes its event time — so state
    holds only the active horizon, not the whole stream's key set
    (plain ``dropDuplicates`` on a stream would grow forever). Batch
    parity: equivalent to first-seen-per-key within any window shorter
    than the watermark horizon.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def rocksdb_state_conf(changelog: bool = True) -> dict[str, str]:
    """Session conf for production-scale streaming state.

    The default HDFS-backed state store keeps every key in executor
    heap — fine for tests, fatal for a 100 TB stream whose key space
    (sessions, dedup horizon, join buffers) exceeds memory. RocksDB
    keeps state off-heap on local SSD with incremental checkpointing;
    changelog checkpointing uploads only the delta per batch instead of
    re-snapshotting the full store.

    Apply at session build time (the provider cannot change on a
    running query's checkpoint):

        builder.config(map=rocksdb_state_conf())
    """
    conf = {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        ),
        # bound memory: block cache + memtables capped per executor
        "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage": "true",
        "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB": "512",
    }
    if changelog:
        conf["spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"] = "true"
    return conf


def curate_stream(
    docs: DataFrame,
    text_col: str = "text",
    max_dup_2gram: float = 0.5,
    min_quality: float = 0.2,
    langs: list | None = None,
) -> DataFrame:
    """Streaming corpus-curation gate: language ID + quality score +
    Gopher repetition filter applied to a document stream.

    Every signal is a pure Column expression (operators/textpipe), so the
    stage is STATELESS — no watermark, no state store; each micro-batch
    is independently filtered at scan throughput, and the op composes
    freely with downstream stateful stages (dedup_stream on fingerprint,
    windowed counts). This is the continuous-ingestion twin of the batch
    repetition_filter / quality_filter / language_id queries: identical
    expressions, so batch backfill and the live stream agree row-for-row
    (pinned by test_streaming batch-parity).
    """
    from dataframe_kotlin_spark.operators import textpipe

    out = textpipe.repetition_stats(docs, text_col, ns=(2,))
    out = textpipe.score_quality(out, text_col)
    out = out.withColumn("lang_pred", textpipe.detect_language(F.col(text_col)))
    cond = (F.col("dup_2gram_frac") <= max_dup_2gram) & (
        F.col("quality") >= min_quality
    )
    if langs:
        cond = cond & F.col("lang_pred").isin(langs)
    return out.filter(cond)


def run_to_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    partition_by: Sequence[str] = (),
    available_now: bool = True,
    processing_time: str | None = None,
):
    """Production file sink: append-mode parquet with exactly-once file
    commits (the checkpoint's file-sink log records committed files, so
    restarts never double-write). ``partition_by`` lays out hive-style
    directories — the same pruning story as write_hive_partitioned, but
    continuously maintained. availableNow drains-and-stops (backfill /
    tests); pass processing_time="1 minute" for a long-running job.
    Returns the StreamingQuery; callers manage awaitTermination.
    """
    w = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if partition_by:
        w = w.partitionBy(*list(partition_by))
    if available_now:
        w = w.trigger(availableNow=True)
    elif processing_time:
        w = w.trigger(processingTime=processing_time)
    return w.start()


def _count_min_latest(target_dir: str) -> int | None:
    """Last COMMITTED batch id of a count_min_stream target, or None."""
    return _latest_committed(target_dir)


def read_count_min(spark: SparkSession, target_dir: str) -> DataFrame:
    """Read the committed cell table of a count_min_stream target (the
    version the _LATEST pointer names — never a half-written one)."""
    return read_versioned(spark, target_dir)


def merge_count_min_batch(
    batch_df: DataFrame,
    batch_id: int,
    target_dir: str,
    item_col: str,
    depth: int,
    width: int,
) -> None:
    """Idempotent, atomically-published merge of one micro-batch's sketch.

    - Idempotence: the committed batch id lives in the _LATEST pointer;
      a replayed batch (foreachBatch is at-least-once) with
      batch_id <= committed is a no-op, so cell sums never double-count.
    - Atomic publish: each merge writes a NEW version dir v<batch_id>,
      then swaps the pointer with os.replace (atomic on POSIX). A crash
      mid-write leaves the pointer on the old version; the replay simply
      rewrites v<batch_id> and swaps again. Readers (read_count_min)
      always see a complete version. On object stores without atomic
      rename, use a transactional table format (MERGE INTO keyed on
      (d, bucket)) instead of this filesystem formulation.
    """
    import os as _os

    from dataframe_kotlin_spark.operators.sketches import count_min_sketch

    last = _count_min_latest(target_dir)
    if last is not None and batch_id <= last:
        return  # replay of an already-committed batch
    spark = batch_df.sparkSession
    cells = count_min_sketch(batch_df, item_col, depth=depth, width=width)
    if last is not None:
        base = spark.read.parquet(_os.path.join(target_dir, f"v{last}"))
        cells = (
            base.unionByName(cells)
            .groupBy("d", "bucket")
            .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        )
    vdir = _os.path.join(target_dir, f"v{batch_id}")
    cells.write.mode("overwrite").parquet(vdir)
    _publish_version(target_dir, batch_id, prune_below=last)


def count_min_stream(
    stream_df: DataFrame,
    item_col: str,
    target_dir: str,
    checkpoint_dir: str,
    depth: int = 4,
    width: int = 256,
) -> None:
    """Streaming Count-Min: each micro-batch builds its own sketch cell
    table (map-side, fixed size) and MERGES it into a versioned parquet
    target by summing cells — the sketch's mergeability is exactly what
    makes frequency tracking over an unbounded stream O(depth*width)
    state instead of per-key state.

    Cell sums are not naturally idempotent, so the merge body
    (merge_count_min_batch) makes them so: batch ids are recorded in the
    atomically-swapped _LATEST pointer and replayed batches are skipped,
    and every merge publishes a fresh version dir so a crash mid-write
    can never corrupt or reset the accumulated sketch. Read the result
    with read_count_min (not a raw parquet read of target_dir).
    """

    def merge_cells(batch_df: DataFrame, batch_id: int) -> None:
        merge_count_min_batch(batch_df, batch_id, target_dir, item_col, depth, width)

    (
        stream_df.writeStream.foreachBatch(merge_cells)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(300)
    )


def drift_stream(
    stream_df: DataFrame,
    value_col: str,
    ref_counts: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    alpha: float = 0.5,
) -> None:
    """Streaming distribution-drift monitor: every micro-batch computes
    the PSI of its ``value_col`` category mix against a STATIC reference
    distribution and appends one (batch_id, n_rows, psi) row to the
    parquet target — the continuous twin of quality.distribution_drift
    (same smoothed-PSI formula over the union of categories, so a batch
    category the reference never saw still contributes a finite term).

    ``ref_counts`` is a (value, n) frame — e.g. the category counts of
    last month's vetted corpus. It is category-cardinality sized and
    broadcast into each batch's aggregate; per-batch state beyond it is
    ZERO (no state store, no watermark), and the output is one row per
    batch regardless of batch size. Alert on psi > 0.25 downstream.

    Idempotence: the parquet row carries batch_id, so replayed batches
    (at-least-once foreachBatch) write duplicate rows that readers
    drop with distinct_by(batch_id) — monitor rows are observations,
    not accumulating state, so last-write-wins is safe (unlike
    count_min_stream's summed cells, which need the versioned merge).
    """
    # NULL categories fold into the SHARED reserved label on both sides
    # (quality.null_folded): the outer join's null-unsafe equality would
    # otherwise score matching NULL mass as two disjoint categories
    from dataframe_kotlin_spark.operators.quality import null_folded

    ref = (
        ref_counts.select(
            null_folded(F.col(ref_counts.columns[0])).alias("__v__"),
            F.col(ref_counts.columns[1]).cast("double").alias("__nr__"),
        )
        .groupBy("__v__")  # re-fold in case NULL and the literal label coexist
        .agg(F.sum("__nr__").alias("__nr__"))
    )

    def score_batch(batch_df: DataFrame, batch_id: int) -> None:
        bc = (
            batch_df.groupBy(null_folded(F.col(value_col)).alias("__v__"))
            .agg(F.count(F.lit(1)).cast("double").alias("__nb__"))
        )
        full = bc.join(ref, "__v__", "full").fillna({"__nb__": 0.0, "__nr__": 0.0})
        k = F.count(F.lit(1)).over(Window.partitionBy())
        nb = F.sum("__nb__").over(Window.partitionBy())
        nr = F.sum("__nr__").over(Window.partitionBy())
        p = (F.col("__nb__") + alpha) / (nb + alpha * k)
        q = (F.col("__nr__") + alpha) / (nr + alpha * k)
        out = (
            full.select(((p - q) * F.log(p / q)).alias("__t__"), F.col("__nb__"))
            .agg(
                F.lit(batch_id).alias("batch_id"),
                F.sum("__nb__").cast("bigint").alias("n_rows"),
                F.round(F.sum("__t__") + 1e-9, 6).alias("psi"),
            )
        )
        out.write.mode("append").parquet(target_dir)

    (
        stream_df.writeStream.foreachBatch(score_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(300)
    )
