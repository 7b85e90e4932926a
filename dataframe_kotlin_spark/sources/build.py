"""In-memory frame construction (SURVEY §2.1; reference Build.kt:21-234):
dataFrameOf, from-map/columns builders, append, toMap.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession


def dataframe_of(spark: SparkSession, columns: Sequence[str], *values: Any) -> DataFrame:
    """Reference dataFrameOf("a","b")(1,2,3,4): row-major literal fill."""
    n = len(columns)
    if len(values) % n:
        raise ValueError(f"{len(values)} values do not fill rows of {n} columns")
    rows = [tuple(values[i : i + n]) for i in range(0, len(values), n)]
    return spark.createDataFrame(rows, list(columns))


def from_map(spark: SparkSession, data: dict[str, Sequence[Any]]) -> DataFrame:
    """Reference Map<String,List>.toDataFrame() (Build.kt:120)."""
    names = list(data)
    lengths = {len(v) for v in data.values()}
    if len(lengths) > 1:
        raise ValueError(f"unequal column lengths: { {k: len(v) for k, v in data.items()} }")
    rows = list(zip(*[data[n] for n in names])) if names else []
    return spark.createDataFrame(rows, names)


def from_rows(spark: SparkSession, rows: Sequence[Any], schema=None) -> DataFrame:
    """Reference toDataFrameByProperties (Build.kt:42-60): list of
    dataclasses/dicts/tuples -> frame via reflection."""
    return spark.createDataFrame(rows, schema)


def append_rows(df: DataFrame, *rows: tuple) -> DataFrame:
    """Reference append(vararg values) (api/append.kt:6-22)."""
    extra = df.sparkSession.createDataFrame(list(rows), df.schema)
    return df.unionByName(extra)


def to_map(df: DataFrame) -> dict[str, list]:
    """Reference toMap (Operations.kt:300). Driver-side materialization —
    only for small results."""
    rows = df.collect()
    return {c: [r[c] for r in rows] for c in df.columns}
