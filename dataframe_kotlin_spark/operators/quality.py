"""Data-quality profiling: one-pass column statistics as a long table.

The deequ-style audit a pipeline runs before training on a new corpus
drop: null fractions, cardinalities, ranges — per column, in a SINGLE
aggregate pass over the data (one job, no per-column scans), emitted as
one row per column so downstream checks are plain filters.

Reference parity: extends describe() (api/describe.kt:13-64) — same
metrics family, but shaped for machine consumption and computed without
driver-side collect of anything but the one stats row.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC_PREFIXES = (
    "int",
    "bigint",
    "smallint",
    "tinyint",
    "double",
    "float",
    "decimal",
)


def dq_profile(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Profile ``cols`` (default: all top-level columns) into a long
    frame: (col_name, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str). Numeric columns fill the ``*_num`` pair (as
    DOUBLE), everything else the ``*_str`` pair (as its string form);
    the unused pair is NULL.

    Cost model at scale: ONE whole-table aggregate — Spark fuses all
    per-column expressions into a single partial-aggregated pass — then
    a metadata-only reshape of the single result row into one row per
    column. n_distinct is exact (count_distinct fuses via Expand);
    switch to approx_count_distinct for trillion-row profiles.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n__")]
    numeric: dict[str, bool] = {}
    for c in cols:
        is_num = dtypes[c].startswith(_NUMERIC_PREFIXES)
        numeric[c] = is_num
        aggs.append((F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"{c}__nulls"))
        aggs.append(F.count_distinct(F.col(c)).cast("bigint").alias(f"{c}__nd"))
        if is_num:
            aggs.append(F.min(c).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__max"))
        else:
            aggs.append(F.min(F.col(c).cast("string")).alias(f"{c}__min"))
            aggs.append(F.max(F.col(c).cast("string")).alias(f"{c}__max"))
    stats = df.agg(*aggs)

    per_col = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n__").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__nd").alias("n_distinct"),
            (F.col(f"{c}__min") if numeric[c] else F.lit(None).cast("double")).alias("min_num"),
            (F.col(f"{c}__max") if numeric[c] else F.lit(None).cast("double")).alias("max_num"),
            (F.lit(None).cast("string") if numeric[c] else F.col(f"{c}__min")).alias("min_str"),
            (F.lit(None).cast("string") if numeric[c] else F.col(f"{c}__max")).alias("max_str"),
        )
        for c in cols
    ]
    return stats.select(F.explode(F.array(*per_col)).alias("s")).select("s.*")


def dq_check(
    profile: DataFrame,
    max_null_frac: float = 0.0,
    min_distinct: int = 1,
) -> DataFrame:
    """Turn a profile into violations: rows whose null fraction exceeds
    ``max_null_frac`` or whose cardinality is under ``min_distinct``.
    Empty result = corpus passes the gate."""
    return profile.filter(
        (F.col("n_nulls") > F.col("n_rows") * F.lit(max_null_frac))
        | (F.col("n_distinct") < F.lit(min_distinct))
    )
