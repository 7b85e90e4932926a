"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32) but every
config here is chosen to also hold on a large multi-executor cluster:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  dynamic broadcast conversion) — at 100 TB the static
  ``spark.sql.shuffle.partitions`` is only an upper bound seed; AQE
  re-plans from observed sizes.
- Arrow execution for the few pandas-UDF paths (multimodal / custom
  stateful ops); everything else stays JVM-side.
- UTC session timezone so timestamp semantics match the DuckDB oracle.
- ANSI off: the reference engine (see SURVEY.md §1.3) has permissive
  Kotlin semantics (overflow wraps, bad casts -> null), and DuckDB's
  TRY_CAST parity is simpler without ANSI aborts mid-query.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"

#: KDataFrame.sort_with's default driver-side row cap. An opaque
#: pairwise comparator cannot distribute (no key to range-partition
#: on), so sort_with collects — this bounds that collect. 100k rows of
#: a typical wide row is tens of MB against the 8g default driver heap;
#: raise it per call (sort_with(cmp, limit=...)) only with driver
#: memory to match, or express the order as computed sort keys
#: (add + sort_by), the distributable form of every total order a
#: comparator can encode.
SORT_WITH_DRIVER_CAP = 100_000


def get_spark(app_name: str = "dataframe-kotlin-spark", extra_conf: dict | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # the driver's events table stores TIMESTAMP(NANOS) which Spark's
        # parquet reader rejects; read as raw nanos and convert (load_events)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_events(spark: SparkSession, sf_dir: str):
    """Load the events table, normalizing its TIMESTAMP(NANOS) ts column.

    Spark's parquet reader has no nanosecond timestamp type; with
    ``spark.sql.legacy.parquet.nanosAsLong`` the column arrives as int64
    nanos, which we convert to TIMESTAMP_NTZ at microsecond precision
    (the data is µs-grained). Sets the conf defensively so this works on
    any session, not just ours.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = df.schema["ts"].dataType.simpleString()
    if ts_type == "bigint":
        # integer division: double division loses precision on ~1.7e18 ns values
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict:
    """Load the driver's parquet star schema as a dict of DataFrames.

    Reads are plain ``spark.read.parquet`` so Catalyst keeps full
    pushdown/pruning freedom; no caching here (callers decide).
    """
    out = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = (
                load_events(spark, sf_dir) if name == "events" else spark.read.parquet(path)
            )
    return out


def register_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register the star schema as temp views so the full ANSI-SQL surface
    is available over the same data the DataFrame API sees — an entry
    point the reference lacks entirely (it has no query language).
    Views are lazy: registration costs one metadata read per table, and
    SQL queries get identical Catalyst plans (pushdown, pruning, AQE) to
    their DataFrame equivalents.
    """
    registered = []
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
        registered.append(name)
    return registered


def recommended_conf(
    total_cores: int,
    dataset_bytes: int,
    executor_mem_bytes: int = 8 << 30,
    skew_factor: float = 2.0,
) -> dict[str, str]:
    """Concrete conf for running these plans at cluster scale — the
    local[32]/sf0.1 settings in get_spark are wrong by construction at
    100 TB (SCALE.md 'Global posture'); this computes the ones that
    change with scale:

    - shuffle.partitions: ~2.5x total cores, floored so one shuffle
      partition holds <= ~256 MB of the LARGEST shuffled dataset under
      skew_factor imbalance (AQE coalesces excess partitions at runtime,
      so over-partitioning is cheap and under-partitioning spills).
    - files.maxPartitionBytes: 128 MB (scan tasks stay memory-bounded
      regardless of table size; smaller only if rows are very wide).
    - autoBroadcastJoinThreshold: min(64 MB, 1/16 executor memory) — a
      broadcast table materializes on every executor, so the ceiling
      scales with executor memory, not data size.
    """
    target_shuffle_block = 256 << 20
    by_cores = int(total_cores * 2.5)
    by_size = int(dataset_bytes * skew_factor / target_shuffle_block) + 1
    shuffle_parts = max(by_cores, min(by_size, 200_000))
    return {
        "spark.sql.shuffle.partitions": str(shuffle_parts),
        "spark.sql.files.maxPartitionBytes": str(128 << 20),
        "spark.sql.autoBroadcastJoinThreshold": str(
            min(64 << 20, executor_mem_bytes // 16)
        ),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
    }
