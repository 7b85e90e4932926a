"""Row-expression capture (SURVEY §2.10; reference RowSelector =
DataRow.(DataRow) -> R, DataRow.kt:100-107).

The reference's row closures (`filter { age > 20 && city != null }`)
execute per-row on the JVM. A literal Python port would be a row-at-a-time
UDF — the slow path. Instead a symbolic ``RowProxy`` records attribute
access and operators, so the SAME lambda shape compiles to a native
Column expression (whole-stage codegen):

    kdf.filter_expr(lambda r: (r.age > 20) & r.city.isNotNull())

Opaque functions that cannot run on a proxy (call external libraries,
branch on concrete values) fall back to ``pandas_filter`` /
``pandas_map`` — Arrow-batched, still never row-at-a-time Python UDFs.
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class RowProxy:
    """Symbolic DataRow: attribute/index access yields Columns, so plain
    Python operators on it build Column expressions."""

    def __init__(self, df: DataFrame):
        object.__setattr__(self, "_df", df)

    def __getattr__(self, name: str) -> Column:
        if name.startswith("_"):
            raise AttributeError(name)
        return F.col(name)

    def __getitem__(self, name: str) -> Column:
        return F.col(name)


def capture(df: DataFrame, fn: Callable[[RowProxy], Column]) -> Column:
    """Run fn on the proxy; the result IS the Column expression. Raises
    TypeError if fn returns a non-Column (then use the pandas fallback)."""
    out = fn(RowProxy(df))
    if not isinstance(out, Column):
        raise TypeError(
            f"row expression returned {type(out).__name__}, not a Column — "
            "use pandas_filter/pandas_map for opaque functions"
        )
    return out


def pandas_filter(df: DataFrame, fn: Callable) -> DataFrame:
    """Arrow-batched fallback for opaque row predicates: fn receives a
    pandas DataFrame batch, returns a boolean Series."""
    import pandas as pd

    schema = df.schema

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pdf[fn(pdf)]

    return df.mapInPandas(run, schema)


def pandas_map(df: DataFrame, fn: Callable, schema) -> DataFrame:
    """Arrow-batched per-batch transform (reference map over rows)."""
    def run(batches):
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(run, schema)
