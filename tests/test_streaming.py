"""Structured Streaming jobs: batch-parity under the unified model.

The reference has no streaming (SURVEY §2.11); these cover the scale-out
extensions in streaming/stream_jobs.py. Each test runs a bounded
availableNow stream to a memory sink and asserts equality with the same
logical computation in batch mode.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from dataframe_kotlin_spark.session import load_events
from dataframe_kotlin_spark.streaming import stream_jobs as sj

pytestmark = pytest.mark.streaming

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stream_src(tmp_path_factory):
    # file-source streams need a directory, not a single parquet file
    d = tmp_path_factory.mktemp("events_src")
    shutil.copy(os.path.join(SF_DIR, "events.parquet"), d)
    return str(d)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    return str(tmp_path_factory.mktemp("ckpt"))


@pytest.fixture(scope="module")
def batch_events(spark):
    return load_events(spark, SF_DIR).withColumn("ts", F.col("ts").cast("timestamp"))


def test_tumbling_stream_matches_batch(spark, stream_src, ckpt, batch_events):
    stream = sj.tumbling_stream(
        sj.read_event_stream(spark, stream_src), 3600, watermark="0 seconds"
    )
    sj.run_to_memory(stream, "t_tumbling", ckpt)
    got = spark.table("t_tumbling")

    # append mode emits exactly the watermark-closed windows (end <= max ts)
    maxts = batch_events.agg(F.max("ts")).first()[0]
    exp = (
        batch_events.groupBy(F.window("ts", "3600 seconds"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .filter(F.col("window.end") <= F.lit(maxts))
        .select(F.col("window.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    assert got.count() == exp.count() > 0
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_session_stream_matches_batch(spark, stream_src, ckpt, batch_events):
    stream = sj.session_stream(
        sj.read_event_stream(spark, stream_src), gap_seconds=1800, watermark="0 seconds"
    )
    sj.run_to_memory(stream, "t_session", ckpt)
    got = spark.table("t_session")

    maxts = batch_events.agg(F.max("ts")).first()[0]
    exp = (
        batch_events.groupBy(F.session_window("ts", "1800 seconds"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .filter(F.col("session_window.end") <= F.lit(maxts))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )
    assert got.count() == exp.count() > 0
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_stateful_sessionize_matches_batch_closed_sessions(
    spark, stream_src, ckpt, batch_events
):
    """applyInPandasWithState sessions == batch gaps-and-islands sessions,
    excluding sessions still OPEN at the final watermark. r13 (event-time
    timers): a session is emitted either in-band (a later event closed
    it) or by the event-time timeout once the watermark passes
    session_end + gap — so the retained set is exactly each user's final
    session IF its end + gap is still ahead of the final watermark
    (= max event ts − the 30-minute watermark delay). Under the old
    processing-time timers NOTHING flushed in a bounded drain (and the
    drain idled gap_seconds waiting for wall-clock timers)."""
    stream = sj.sessionize_stateful(
        sj.read_event_stream(spark, stream_src), gap_seconds=1800
    )
    sj.run_to_memory(stream, "t_stateful", ckpt)
    got = spark.table("t_stateful")

    w = Window.partitionBy("user_id").orderBy("ts")
    epoch = F.unix_micros(F.col("ts"))
    new_s = F.when(
        F.lag(epoch).over(w).isNull() | ((epoch - F.lag(epoch).over(w)) > 1800 * 1_000_000), 1
    ).otherwise(0)
    sessions = (
        batch_events.withColumn("__new__", new_s)
        .withColumn(
            "sid",
            F.sum("__new__").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    # final watermark of the drain: max event ts minus the 30-minute
    # delay read_event_stream's default pipeline applies
    wm_us = (
        batch_events.agg(F.max(F.unix_micros(F.col("ts"))).alias("m")).collect()[0]["m"]
        - 30 * 60 * 1_000_000
    )
    last_sid = sessions.groupBy("user_id").agg(F.max("sid").alias("sid"))
    still_open = last_sid.join(
        sessions, ["user_id", "sid"]
    ).filter(F.unix_micros(F.col("session_end")) + 1800 * 1_000_000 >= wm_us).select(
        "user_id", "sid"
    )
    exp = sessions.join(still_open, ["user_id", "sid"], "left_anti").drop("sid")

    assert got.count() == exp.count() > 0
    assert (
        got.exceptAll(exp.select(*got.columns)).count() == 0
        and exp.select(*got.columns).exceptAll(got).count() == 0
    )


def test_multibatch_incremental(spark, ckpt, batch_events, tmp_path_factory):
    """Files arriving across micro-batches produce the same result as one
    batch (exactly-once file tracking + incremental state)."""
    src = tmp_path_factory.mktemp("events_chunks")
    # split the events into 3 time-ordered parquet files
    chunks = batch_events.withColumn(
        "part", F.ntile(3).over(Window.orderBy("ts"))
    )
    for i in range(1, 4):
        chunks.filter(F.col("part") == i).drop("part").coalesce(1).write.mode(
            "append"
        ).parquet(str(src / "data"))
    stream = sj.tumbling_stream(
        spark.readStream.schema(batch_events.schema).option("maxFilesPerTrigger", "1").parquet(
            str(src / "data")
        ),
        3600,
        watermark="0 seconds",
    )
    sj.run_to_memory(stream, "t_multibatch", ckpt)
    got = spark.table("t_multibatch")

    maxts = batch_events.agg(F.max("ts")).first()[0]
    exp = (
        batch_events.groupBy(F.window("ts", "3600 seconds"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .filter(F.col("window.end") <= F.lit(maxts))
        .select(F.col("window.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    assert got.count() == exp.count() > 0
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_stream_static_enrichment(spark, stream_src, ckpt):
    """Stream-static join enriches each micro-batch; result matches the
    batch join on the same inputs."""
    dim = spark.createDataFrame(
        [(t, t.upper()) for t in ["click", "view", "purchase", "signup", "error"]],
        "event_type string, label string",
    )
    enriched = sj.enrich_stream(sj.read_event_stream(spark, stream_src), dim, "event_type")
    agg = (
        enriched.withWatermark("ts", "0 seconds")
        .groupBy("label")
        .agg(F.count("*").alias("n"))
    )
    sj.run_to_memory(agg, "t_enriched", ckpt, output_mode="complete")
    got = {r["label"]: r["n"] for r in spark.table("t_enriched").collect()}
    exp = {
        r["label"]: r["n"]
        for r in load_events(spark, SF_DIR)
        .join(dim, "event_type", "left")
        .groupBy("label")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == exp and len(got) == 5


def test_foreach_batch_upsert_sink(spark, ckpt, batch_events, tmp_path_factory):
    """foreachBatch upsert: latest state per user survives multi-batch
    streaming; equals batch distinct-by-latest."""
    src = tmp_path_factory.mktemp("upsert_chunks")
    chunks = batch_events.withColumn("part", F.ntile(2).over(Window.orderBy("ts")))
    for i in (1, 2):
        chunks.filter(F.col("part") == i).drop("part").coalesce(1).write.mode(
            "append"
        ).parquet(str(src / "data"))
    target = str(tmp_path_factory.mktemp("upsert_target") / "state")

    latest_cols = ["user_id", "ts", "event_type", "value"]
    stream = (
        spark.readStream.schema(batch_events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "data"))
        .select(*latest_cols)
    )
    from dataframe_kotlin_spark.core.frame import KDataFrame
    from dataframe_kotlin_spark.streaming.stream_jobs import (
        read_versioned,
        run_upsert_sink,
    )

    run_upsert_sink(
        stream,
        target,
        keys=["user_id"],
        checkpoint_dir=os.path.join(ckpt, "upsert"),
        reduce=lambda df: KDataFrame(df)
        .distinct_by(["user_id"], order_by=[F.col("ts").desc()])
        .df,
    )

    got = read_versioned(spark, target)
    exp = (
        batch_events.select(*latest_cols)
        .withColumn(
            "__rn__",
            F.row_number().over(Window.partitionBy("user_id").orderBy(F.col("ts").desc())),
        )
        .filter("__rn__ = 1")
        .drop("__rn__")
    )
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_stream_stream_join_matches_batch(spark, stream_src, ckpt, batch_events):
    """click->purchase attribution join across two watermarked streams
    equals the same time-range join in batch mode."""
    clicks = sj.read_event_stream(spark, stream_src).filter(F.col("event_type") == "click")
    buys = sj.read_event_stream(spark, stream_src).filter(F.col("event_type") == "purchase")
    joined = sj.join_event_streams(clicks, buys, within_seconds=1800).select(
        "event_id", "event_id_r", "user_id", "ts", "ts_r"
    )
    sj.run_to_memory(joined, "t_ss_join", ckpt)
    got = spark.table("t_ss_join")

    bc = batch_events.filter("event_type = 'click'")
    bp = batch_events.filter("event_type = 'purchase'")
    for c in bp.columns:
        bp = bp.withColumnRenamed(c, c + "_r")
    exp = bc.join(
        bp,
        (F.col("user_id") == F.col("user_id_r"))
        & (F.col("ts_r") >= F.col("ts"))
        & (F.col("ts_r") <= F.col("ts") + F.expr("INTERVAL 1800 SECOND")),
    ).select("event_id", "event_id_r", "user_id", "ts", "ts_r")
    assert got.count() == exp.count() > 0
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_stream_dedup_matches_batch(spark, ckpt, batch_events, tmp_path_factory):
    """Streaming dedup on (user_id, event_type) keeps exactly one row per
    key — same key set as batch distinct, state bounded by watermark."""
    src = tmp_path_factory.mktemp("dedup_src")
    dup = batch_events.unionByName(batch_events)  # every event twice
    dup.write.mode("overwrite").parquet(str(src / "data"))

    stream = (
        spark.readStream.schema(batch_events.schema)
        .parquet(str(src / "data"))
    )
    got_q = sj.dedup_stream(stream, ["user_id", "event_type"], watermark="10 seconds")
    sj.run_to_memory(got_q, "t_dedup", os.path.join(ckpt, "dedup"))
    got = spark.table("t_dedup")

    exp_keys = batch_events.select("user_id", "event_type").distinct()
    assert got.count() == exp_keys.count()
    assert got.select("user_id", "event_type").exceptAll(exp_keys).count() == 0


def test_rocksdb_state_store_dedup(spark, batch_events, tmp_path_factory):
    """The production state-store conf actually runs in this Spark build:
    streaming dedup under RocksDBStateStoreProvider (off-heap state +
    changelog checkpointing) produces the same result as the default
    HDFS-backed provider."""
    conf = sj.rocksdb_state_conf()
    src = tmp_path_factory.mktemp("rocks_src")
    ck = tmp_path_factory.mktemp("rocks_ckpt")
    batch_events.limit(500).coalesce(1).write.mode("overwrite").parquet(str(src))
    written = spark.read.parquet(str(src))
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        stream = spark.readStream.schema(written.schema).parquet(str(src))
        out = sj.dedup_stream(stream, ["user_id"])
        sj.run_to_memory(out, "t_rocks", str(ck))
        got = spark.table("t_rocks")
        assert got.count() == written.select("user_id").distinct().count() > 0
    finally:
        for k in conf:
            spark.conf.unset(k)


def test_curate_stream_matches_batch(spark, ckpt, tmp_path_factory):
    """Streaming curation gate emits exactly the rows the identical batch
    expressions keep — stateless map-only stage, no watermark needed."""
    src = tmp_path_factory.mktemp("curate_src")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.mode("overwrite").parquet(str(src / "docs"))
    written = spark.read.parquet(str(src / "docs"))

    stream = spark.readStream.schema(written.schema).parquet(str(src / "docs"))
    got_q = sj.curate_stream(stream, max_dup_2gram=0.5, min_quality=0.2, langs=["en"])
    sj.run_to_memory(got_q, "t_curate", os.path.join(ckpt, "curate"))
    got = spark.table("t_curate")

    exp = sj.curate_stream(written, max_dup_2gram=0.5, min_quality=0.2, langs=["en"])
    assert 0 < got.count() < written.count()  # gate actually filters
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_sliding_stream_matches_batch(spark, stream_src, ckpt, batch_events):
    """Sliding windows: each event fans out to width/slide overlapping
    windows; append mode emits the watermark-closed ones, matching the
    identical batch F.window aggregation."""
    stream = sj.sliding_stream(
        sj.read_event_stream(spark, stream_src), 3600, 1800, watermark="0 seconds"
    )
    sj.run_to_memory(stream, "t_sliding", os.path.join(ckpt, "sliding"))
    got = spark.table("t_sliding")

    maxts = batch_events.agg(F.max("ts")).first()[0]
    exp = (
        batch_events.groupBy(
            F.window("ts", "3600 seconds", "1800 seconds"), "event_type"
        )
        .agg(F.count("*").alias("n_events"))
        .filter(F.col("window.end") <= F.lit(maxts))
        .select(F.col("window.start").alias("window_start"), "event_type", "n_events")
    )
    assert got.count() == exp.count() > 0
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_parquet_sink_exactly_once(spark, stream_src, ckpt, batch_events, tmp_path_factory):
    """File sink: availableNow drain writes hive-partitioned parquet whose
    contents equal the batch projection; a SECOND drain over the same
    checkpoint writes nothing new (file-sink log = exactly-once)."""
    out = str(tmp_path_factory.mktemp("sink") / "events_out")
    proj = sj.read_event_stream(spark, stream_src).select(
        "event_id", "user_id", "event_type", "value"
    )
    q = sj.run_to_parquet(proj, out, os.path.join(ckpt, "pq_sink"), partition_by=["event_type"])
    q.awaitTermination(300)
    back = spark.read.parquet(out)
    assert back.count() == batch_events.count()
    assert set(back.columns) == {"event_id", "user_id", "event_type", "value"}
    # restart over same checkpoint: no new input -> no duplicate rows
    proj2 = sj.read_event_stream(spark, stream_src).select(
        "event_id", "user_id", "event_type", "value"
    )
    q2 = sj.run_to_parquet(proj2, out, os.path.join(ckpt, "pq_sink"), partition_by=["event_type"])
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == batch_events.count()


def test_count_min_stream_matches_batch(spark, tmp_path, batch_events):
    """Streaming sketch cells merged across micro-batches == batch sketch
    over the same data (mergeability end-to-end through foreachBatch)."""
    from dataframe_kotlin_spark.operators.sketches import count_min_sketch

    # multi-file source so availableNow produces several micro-batches
    src = str(tmp_path / "src")
    batch_events.repartition(3).write.parquet(src)
    target = str(tmp_path / "cm_target")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    sj.count_min_stream(
        stream, "event_type", target, str(tmp_path / "ckpt"), depth=4, width=64
    )
    got = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in sj.read_count_min(spark, target).collect()
    }
    want = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in count_min_sketch(
            spark.read.parquet(src), "event_type", depth=4, width=64
        ).collect()
    }
    assert got == want

    # at-least-once replay of an already-committed batch must be a no-op
    # (foreachBatch can redeliver after a failure between target publish
    # and checkpoint commit)
    last = sj._count_min_latest(target)
    sj.merge_count_min_batch(
        spark.read.parquet(src), last, target, "event_type", 4, 64
    )
    again = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in sj.read_count_min(spark, target).collect()
    }
    assert again == want  # no double-count


def test_count_min_stream_crash_mid_publish_keeps_committed(spark, tmp_path, batch_events):
    """A half-written version dir (crash before the pointer swap) must
    not corrupt or reset the committed sketch — the pointer still names
    the last complete version, and the replayed merge overwrites the
    orphan dir."""
    import os

    from dataframe_kotlin_spark.operators.sketches import count_min_sketch

    target = str(tmp_path / "cm")
    ev = batch_events.limit(100)
    sj.merge_count_min_batch(ev, 0, target, "event_type", 4, 64)
    committed = {(r["d"], r["bucket"]): r["cnt"] for r in sj.read_count_min(spark, target).collect()}

    # simulate a crash: version dir for batch 1 written partially (no
    # pointer swap happened)
    os.makedirs(os.path.join(target, "v1"), exist_ok=True)
    with open(os.path.join(target, "v1", "part-garbage.parquet"), "wb") as f:
        f.write(b"not parquet")
    assert sj._count_min_latest(target) == 0
    assert {
        (r["d"], r["bucket"]): r["cnt"] for r in sj.read_count_min(spark, target).collect()
    } == committed

    # the replay of batch 1 rewrites the orphan dir and commits on top of
    # the batch-0 cells (never resets to batch 1 alone)
    sj.merge_count_min_batch(ev, 1, target, "event_type", 4, 64)
    merged = {(r["d"], r["bucket"]): r["cnt"] for r in sj.read_count_min(spark, target).collect()}
    doubled = {
        (r["d"], r["bucket"]): r["cnt"] * 2
        for r in count_min_sketch(ev, "event_type", depth=4, width=64).collect()
    }
    assert merged == doubled


def test_drift_stream_matches_batch_psi(spark, tmp_path, batch_events):
    """Each micro-batch's streamed PSI must equal the batch formula run
    on that batch's rows alone (union-category smoothing included)."""
    import math

    from dataframe_kotlin_spark.streaming import stream_jobs as sj

    src = str(tmp_path / "src")
    batch_events.write.parquet(src)
    ref = (
        spark.read.parquet(src)
        .groupBy(F.col("event_type").alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    target = str(tmp_path / "drift")
    sj.drift_stream(stream, "event_type", ref, target, str(tmp_path / "ckpt"))

    rows = spark.read.parquet(target).collect()
    assert len(rows) >= 1
    assert sum(r["n_rows"] for r in rows) == batch_events.count()
    # the whole-corpus batch vs itself as one stream batch would be ~0;
    # per-file batches against the full reference stay small but finite
    for r in rows:
        assert r["psi"] >= 0.0 and math.isfinite(r["psi"])

    # parity: recompute one batch's psi with the batch formula
    whole = spark.read.parquet(src)
    one = sj_drift_batch_psi(whole, ref)
    assert abs(one) < 0.01  # corpus vs its own distribution


def sj_drift_batch_psi(batch_df, ref):
    """Batch replica of drift_stream's per-batch formula (alpha=0.5)."""
    from pyspark.sql import Window

    bc = batch_df.groupBy(F.col("event_type").alias("__v__")).agg(
        F.count(F.lit(1)).cast("double").alias("__nb__")
    )
    r = ref.select(F.col("v").alias("__v__"), F.col("n").cast("double").alias("__nr__"))
    full = bc.join(r, "__v__", "full").fillna({"__nb__": 0.0, "__nr__": 0.0})
    k = F.count(F.lit(1)).over(Window.partitionBy())
    nb = F.sum("__nb__").over(Window.partitionBy())
    nr = F.sum("__nr__").over(Window.partitionBy())
    p = (F.col("__nb__") + 0.5) / (nb + 0.5 * k)
    q = (F.col("__nr__") + 0.5) / (nr + 0.5 * k)
    return full.select(((p - q) * F.log(p / q)).alias("t")).agg(F.sum("t")).collect()[0][0]


def test_upsert_sink_crash_mid_publish_keeps_committed(spark, tmp_path, batch_events):
    """The upsert sink uses the versioned-pointer protocol: a crash after
    writing a new version dir but BEFORE the pointer swap must leave the
    previous commit fully readable (an overwrite-in-place sink would
    have deleted it)."""
    import os

    from dataframe_kotlin_spark.core.frame import KDataFrame
    from dataframe_kotlin_spark.streaming.stream_jobs import (
        _latest_committed,
        read_versioned,
    )

    target = str(tmp_path / "ups")
    base = batch_events.select("user_id", "event_type", "value").limit(50)
    os.makedirs(target, exist_ok=True)
    base.write.parquet(os.path.join(target, "v0"))
    with open(os.path.join(target, "_LATEST"), "w") as f:
        f.write("0")
    committed = read_versioned(spark, target).count()

    # crash: half-written v1, no pointer swap
    os.makedirs(os.path.join(target, "v1"), exist_ok=True)
    with open(os.path.join(target, "v1", "part-garbage.parquet"), "wb") as f:
        f.write(b"not parquet")
    assert _latest_committed(target) == 0
    assert read_versioned(spark, target).count() == committed


def test_read_event_stream_empty_dir_and_conf_restore(spark, tmp_path):
    """The stream must start on a not-yet-populated source directory
    (falls back to the canonical events schema) and the nanosAsLong conf
    must not leak out of the metadata read."""
    import os

    from dataframe_kotlin_spark.streaming import stream_jobs as sj

    before = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    src = str(tmp_path / "empty_src")
    os.makedirs(src, exist_ok=True)
    stream = sj.read_event_stream(spark, src)
    assert stream.isStreaming
    assert "ts" in stream.columns and "event_type" in stream.columns
    after = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    assert after == before
