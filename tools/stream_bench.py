"""Streaming micro-bench (VERDICT r12 item 10): rate-limited runs of the
streaming jobs over the sf0.1 events stream with MEASURED wall /
micro-batch / state-store numbers, replacing SCALE.md's design prose.

Protocol: the sf0.1 events table (100k rows) is split into 8 parquet
files; every run streams it with ``maxFilesPerTrigger=1`` (8 rate-limited
micro-batches, never one giant batch) and ``availableNow`` so the query
drains and stops. Per job we record: micro-batches executed, input rows,
wall seconds, and — for stateful operators — the state store's
``numRowsTotal`` / ``memoryUsedBytes`` from the final
StreamingQueryProgress with a state operator, which is exactly the
state-bounding claim SCALE.md makes (watermark expiry keeps state
~horizon-sized, not stream-sized).

Usage: python tools/stream_bench.py [sf_dir] [--rocksdb]
Prints ONE JSON line. --rocksdb applies rocksdb_state_conf() at session
build (the production state store) for comparison with the default
HDFS-backed store.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    use_rocksdb = "--rocksdb" in sys.argv

    from dataframe_kotlin_spark.session import get_spark, load_events
    from dataframe_kotlin_spark.streaming import stream_jobs as sj

    extra = sj.rocksdb_state_conf() if use_rocksdb else None
    spark = get_spark("stream-bench", extra_conf=extra)

    work = tempfile.mkdtemp(prefix="stream_bench_")
    src = os.path.join(work, "events_src")
    # 8 source files -> 8 micro-batches at maxFilesPerTrigger=1
    load_events(spark, sf_dir).repartition(8).write.parquet(src)
    n_input = spark.read.parquet(src).count()

    def stream():
        return sj.read_event_stream(spark, src, max_files_per_trigger=1)

    results: dict[str, dict] = {}

    def run(name, df, output_mode="append"):
        ck = os.path.join(work, "ck_" + name)
        t0 = time.time()
        q = (
            df.writeStream.format("memory")
            .queryName("bench_" + name)
            .outputMode(output_mode)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(900)
        wall = round(time.time() - t0, 2)
        if not finished:
            q.stop()  # never leave a runaway query loading the box
        prog = [json.loads(p.json) for p in q.recentProgress]
        state = {}
        for p in reversed(prog):
            ops = p.get("stateOperators") or []
            if ops:
                state = {
                    "state_rows": sum(o.get("numRowsTotal", 0) for o in ops),
                    "state_mem_bytes": sum(o.get("memoryUsedBytes", 0) for o in ops),
                    "state_ops": len(ops),
                }
                break
        out_rows = spark.table("bench_" + name).count()
        results[name] = {
            "batches": len([p for p in prog if p.get("numInputRows", 0) > 0]),
            "input_rows": n_input,
            "out_rows": out_rows,
            "wall_sec": wall,
            "rows_per_sec": round(n_input / wall),
            "terminated": bool(finished),
            **state,
        }

    def run_sink(name, fn):
        t0 = time.time()
        fn()
        wall = round(time.time() - t0, 2)
        results[name] = {
            "batches": 8,
            "input_rows": n_input,
            "wall_sec": wall,
            "rows_per_sec": round(n_input / wall),
        }

    run("tumbling_60s", sj.tumbling_stream(stream(), 60))
    run("sliding_300s_60s", sj.sliding_stream(stream(), 300, 60))
    run("session_600s", sj.session_stream(stream(), 600))
    run(
        "sessionize_stateful_600s",
        sj.sessionize_stateful(stream(), gap_seconds=600, max_events=10_000),
    )
    run("dedup_user_type", sj.dedup_stream(stream(), ["user_id", "event_type"]))
    right = stream()
    run("join_streams_30m", sj.join_event_streams(stream(), right, within_seconds=1800))

    # foreachBatch sinks (versioned-pointer protocol)
    run_sink(
        "count_min_sink",
        lambda: sj.count_min_stream(
            stream(),
            "event_type",
            os.path.join(work, "cm_target"),
            os.path.join(work, "ck_cm"),
        ),
    )
    ref = spark.read.parquet(src).groupBy("event_type").count()
    run_sink(
        "drift_sink",
        lambda: sj.drift_stream(
            stream(),
            "event_type",
            ref,
            os.path.join(work, "drift_target"),
            os.path.join(work, "ck_drift"),
        ),
    )
    run_sink(
        "upsert_sink",
        lambda: sj.run_upsert_sink(
            stream(),
            os.path.join(work, "upsert_target"),
            ["event_id"],
            os.path.join(work, "ck_upsert"),
        ),
    )

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "rocksdb": use_rocksdb,
                "source_files": 8,
                "loadavg": round(os.getloadavg()[0], 2),
                "jobs": results,
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
