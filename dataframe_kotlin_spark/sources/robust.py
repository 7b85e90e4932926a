"""Robust ingestion: ORC passthrough and corrupt-record handling.

The reference's readers throw on malformed input (io/csv.kt parser
cascade raises; Klaxon raises on bad JSON). At 100 TB a single bad line
must not kill a 1000-executor job, so the engine exposes the three
standard Spark policies plus a good/bad SPLIT reader that quarantines
rejects as data:

- PERMISSIVE (default): malformed rows become nulls + the raw line in
  `_corrupt_record` — job always completes.
- DROPMALFORMED: silently discard bad rows.
- FAILFAST: reference-parity strictness (first bad row raises).
- `read_*_split`: one scan, two DataFrames (clean rows, quarantined raw
  lines + source file). The quarantine side is written to a side
  location in production — the batch analogue of a dead-letter queue.

ORC is a straight format passthrough: Spark's native vectorized ORC
reader/writer with predicate pushdown and column pruning, same operator
surface as parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


# --- ORC passthrough -------------------------------------------------------

def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Native vectorized ORC scan (pushdown + pruning come free, same as
    parquet — verify with .explain: PushedFilters land in the scan)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


# --- corrupt-record policies ----------------------------------------------

def _with_corrupt_field(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)])


def read_csv_robust(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "PERMISSIVE",
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV with an explicit schema and a malformed-row policy. An
    explicit schema is the 100 TB default anyway: inference costs an
    extra full scan and can flip types between runs."""
    schema = _with_corrupt_field(schema) if mode == "PERMISSIVE" else schema
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("sep", sep)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_json_robust(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "PERMISSIVE",
    multi_line: bool = False,
) -> DataFrame:
    schema = _with_corrupt_field(schema) if mode == "PERMISSIVE" else schema
    return (
        spark.read.schema(schema)
        .option("mode", mode)
        .option("multiLine", multi_line)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_good_bad(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE read into (clean, quarantine).

    Spark refuses queries that reference ONLY the internal corrupt
    column of a still-streaming-from-source CSV/JSON scan, so the frame
    is cached first — one scan feeds both sides. Clean rows drop the
    corrupt column; the quarantine keeps the raw line plus its source
    file for reprocessing.
    """
    if CORRUPT_COL not in df.columns:
        raise ValueError(f"expected a PERMISSIVE read carrying {CORRUPT_COL}")
    # input_file_name() must be evaluated against the file scan itself —
    # after cache() the scan is gone and it returns ''. Stamp it first.
    df = df.withColumn("__source_file__", F.input_file_name()).cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL, "__source_file__")
    bad = (
        df.filter(F.col(CORRUPT_COL).isNotNull())
        .select(
            F.col(CORRUPT_COL).alias("raw_record"),
            F.col("__source_file__").alias("source_file"),
        )
    )
    return good, bad


def read_csv_split(spark: SparkSession, path: str, schema: T.StructType,
                   **kw) -> tuple[DataFrame, DataFrame]:
    return split_good_bad(read_csv_robust(spark, path, schema, mode="PERMISSIVE", **kw))


def read_json_split(spark: SparkSession, path: str, schema: T.StructType,
                    **kw) -> tuple[DataFrame, DataFrame]:
    return split_good_bad(read_json_robust(spark, path, schema, mode="PERMISSIVE", **kw))
