"""Column-selector DSL (SURVEY §2.2; reference SelectReceiver.kt:27-173).

The reference's selector DSL (`cols { pred }`, `colsOf<T>`, `dfs {}`,
`startsWith`, `allAfter`, set algebra...) resolves purely against the
schema — so here it's driver-side metadata planning over ``StructType``:
every selector maps schema -> list of (possibly dotted) column paths,
and composes with union/except. Zero execution cost; the resolved list
feeds ``df.select``.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import types as T


def top_level(schema: T.StructType) -> list[str]:
    return [f.name for f in schema.fields]


def cols(schema: T.StructType, *, indices: Sequence[int] | None = None, pred: Callable[[T.StructField], bool] | None = None) -> list[str]:
    """cols(0..2) / cols { pred } (SelectReceiver.kt:27-60)."""
    fields = schema.fields
    if indices is not None:
        return [fields[i].name for i in indices]
    if pred is not None:
        return [f.name for f in fields if pred(f)]
    return [f.name for f in fields]


def cols_of(schema: T.StructType, dtype: type | T.DataType) -> list[str]:
    """colsOf<T> (SelectReceiver.kt:166-173): select by Spark type."""
    if isinstance(dtype, T.DataType):
        return [f.name for f in schema.fields if f.dataType == dtype]
    return [f.name for f in schema.fields if isinstance(f.dataType, dtype)]


def string_cols(schema):
    return cols_of(schema, T.StringType)


def int_cols(schema):
    return cols_of(schema, (T.IntegerType, T.LongType, T.ShortType, T.ByteType))


def double_cols(schema):
    return cols_of(schema, (T.DoubleType, T.FloatType))


def bool_cols(schema):
    return cols_of(schema, T.BooleanType)


def name_contains(schema: T.StructType, sub: str) -> list[str]:
    return [f.name for f in schema.fields if sub in f.name]


def starts_with(schema: T.StructType, prefix: str) -> list[str]:
    return [f.name for f in schema.fields if f.name.startswith(prefix)]


def ends_with(schema: T.StructType, suffix: str) -> list[str]:
    return [f.name for f in schema.fields if f.name.endswith(suffix)]


def _pos(schema: T.StructType, name: str) -> int:
    for i, f in enumerate(schema.fields):
        if f.name == name:
            return i
    raise KeyError(name)


def all_after(schema: T.StructType, name: str) -> list[str]:
    """allAfter(col): strictly after (SelectReceiver.kt:85-100)."""
    i = _pos(schema, name)
    return [f.name for f in schema.fields[i + 1 :]]


def all_since(schema: T.StructType, name: str) -> list[str]:
    i = _pos(schema, name)
    return [f.name for f in schema.fields[i:]]


def all_before(schema: T.StructType, name: str) -> list[str]:
    i = _pos(schema, name)
    return [f.name for f in schema.fields[:i]]


def all_until(schema: T.StructType, name: str) -> list[str]:
    i = _pos(schema, name)
    return [f.name for f in schema.fields[: i + 1]]


def dfs(schema: T.StructType, pred: Callable[[str, T.StructField], bool] | None = None) -> list[str]:
    """Recursive descent over the column tree -> dotted leaf paths
    (reference dfs{}, SelectReceiver.kt:62-74; ColumnPath = dotted path)."""
    out: list[str] = []

    def walk(prefix: str, st: T.StructType):
        for f in st.fields:
            path = f"{prefix}.{f.name}" if prefix else f.name
            if isinstance(f.dataType, T.StructType):
                walk(path, f.dataType)
            else:
                if pred is None or pred(path, f):
                    out.append(path)

    walk("", schema)
    return out


def except_(selected: Sequence[str], removed: Sequence[str]) -> list[str]:
    """Set-minus preserving order (reference `except`, SelectReceiver.kt:140)."""
    rm = set(removed)
    return [c for c in selected if c not in rm]


def union(*selections: Sequence[str]) -> list[str]:
    """`and` of column sets, order-preserving dedup."""
    seen, out = set(), []
    for sel in selections:
        for c in sel:
            if c not in seen:
                seen.add(c)
                out.append(c)
    return out
