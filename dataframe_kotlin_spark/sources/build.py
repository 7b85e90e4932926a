"""In-memory frame construction (SURVEY §2.1; reference Build.kt:21-234):
dataFrameOf, from-map/columns builders, append, toMap.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession


def dataframe_of(spark: SparkSession, columns: Sequence[str], *values: Any) -> DataFrame:
    """Reference dataFrameOf("a","b")(1,2,3,4): row-major literal fill.
    Duplicate column names raise, as the reference does
    (DataFrameTests.kt:72 `create with duplicate columns` expects
    IllegalArgumentException)."""
    dupes = {c for c in columns if list(columns).count(c) > 1}
    if dupes:
        raise ValueError(f"duplicate column names: {sorted(dupes)}")
    n = len(columns)
    if len(values) % n:
        raise ValueError(f"{len(values)} values do not fill rows of {n} columns")
    rows = [tuple(values[i : i + n]) for i in range(0, len(values), n)]
    if not rows:
        from pyspark.sql import types as T

        # empty literal frame keeps declared columns (string-typed)
        schema = T.StructType([T.StructField(c, T.StringType()) for c in columns])
        return spark.createDataFrame([], schema)
    # column-major delegation picks up from_map's all-null-column handling
    return from_map(spark, {c: [r[i] for r in rows] for i, c in enumerate(columns)})


def from_map(spark: SparkSession, data: dict[str, Sequence[Any]]) -> DataFrame:
    """Reference Map<String,List>.toDataFrame() (Build.kt:120). Empty
    value lists build an empty frame with the declared columns (string-
    typed, since no values constrain the type) — the reference supports
    empty frames, and schema inference cannot."""
    names = list(data)
    lengths = {len(v) for v in data.values()}
    if len(lengths) > 1:
        raise ValueError(f"unequal column lengths: { {k: len(v) for k, v in data.items()} }")
    rows = list(zip(*[data[n] for n in names])) if names else []
    if not rows and names:
        from pyspark.sql import types as T

        schema = T.StructType([T.StructField(n, T.StringType()) for n in names])
        return spark.createDataFrame([], schema)
    # An all-null column carries no type evidence (reference gives it
    # Any?; DataFrameTests.kt:1672 `create with list of names and fill
    # nulls`, :1796 `null column test`); Spark's inference errors out, so
    # those columns are string-typed — the same contract as the empty
    # frame above. Typed columns stay inferred.
    all_null = [n for n in names if all(v is None for v in data[n])]
    if all_null and len(all_null) < len(names):
        dense = [n for n in names if n not in all_null]
        inferred = spark.createDataFrame(
            list(zip(*[data[n] for n in dense])), dense
        ).schema
        from pyspark.sql import types as T

        by_name = {f.name: f for f in inferred.fields}
        schema = T.StructType(
            [
                by_name[n] if n in by_name else T.StructField(n, T.StringType())
                for n in names
            ]
        )
        return spark.createDataFrame(rows, schema)
    if all_null:
        from pyspark.sql import types as T

        schema = T.StructType([T.StructField(n, T.StringType()) for n in names])
        return spark.createDataFrame(rows, schema)
    return spark.createDataFrame(rows, names)


def from_rows(spark: SparkSession, rows: Sequence[Any], schema=None) -> DataFrame:
    """Reference toDataFrameByProperties (Build.kt:42-60): list of
    dataclasses/dicts/tuples -> frame via reflection."""
    return spark.createDataFrame(rows, schema)


def from_objects(spark: SparkSession, objects: Sequence[Any]) -> DataFrame:
    """Reference Iterable<T>.toDataFrameByProperties() (Build.kt:42-60):
    reflect over each object's public properties. Dataclasses use their
    declared field order; plain objects use sorted(vars()) for a
    deterministic column order. None elements contribute all-null rows
    (the reference widens nullability the same way)."""
    import dataclasses

    sample = next((o for o in objects if o is not None), None)
    if sample is None:
        raise ValueError("cannot infer columns from an all-None sequence")
    if dataclasses.is_dataclass(sample):
        names = [f.name for f in dataclasses.fields(sample)]
    else:
        names = sorted(vars(sample))
    rows = [
        tuple(None if o is None else getattr(o, n) for n in names) for o in objects
    ]
    return spark.createDataFrame(rows, names)


def to_objects(df: DataFrame, cls: Any, limit: int | None = None) -> list:
    """Reference toListOf/writeClass (stubs/DataFrameToListTypedStub.kt):
    materialize rows as typed objects. Driver-side by definition —
    ``limit`` bounds the collect (CollectLimit short-circuits the scan);
    omit it only for genuinely small results."""
    rows = (df.limit(limit) if limit is not None else df).collect()
    names = df.columns
    return [cls(**{n: r[n] for n in names}) for r in rows]


def dataframe_of_fill(
    spark: SparkSession, columns: Sequence[str], fill: Any
) -> DataFrame:
    """Reference dataFrameOf(header){ fill(it) } (Build.kt:82-86): build a
    frame from a per-column generator ``fill(name) -> values`` (or a plain
    value replicated ``nrow`` times via (name, nrow))."""
    data = {str(c): list(fill(c)) for c in columns}
    return from_map(spark, data)


def append_rows(df: DataFrame, *rows: tuple) -> DataFrame:
    """Reference append(vararg values) (api/append.kt:6-22). A null in an
    appended row WIDENS that column's nullability (DataFrameTests
    `addRow`: appending age=null turns Int into Int?) instead of
    raising — the union result's nullability is the OR of both sides."""
    from pyspark.sql import types as T

    fields = []
    for r in rows:
        if len(r) != len(df.schema.fields):
            raise ValueError(
                f"append row {r!r} has {len(r)} values; frame has "
                f"{len(df.schema.fields)} columns {df.columns}"
            )
    for i, f in enumerate(df.schema.fields):
        nullable = f.nullable or any(r[i] is None for r in rows)
        fields.append(T.StructField(f.name, f.dataType, nullable))
    extra = df.sparkSession.createDataFrame(list(rows), T.StructType(fields))
    return df.unionByName(extra)


def to_map(df: DataFrame) -> dict[str, list]:
    """Reference toMap (Operations.kt:300). Driver-side materialization —
    only for small results."""
    rows = df.collect()
    return {c: [r[c] for r in rows] for c in df.columns}


def conform_to_schema(df: DataFrame, schema, strict_casts: bool = False) -> DataFrame:
    """Schema evolution: project ``df`` onto ``schema`` (a StructType) —
    missing columns appear as typed NULLs, type drift is cast to the
    target type, extra columns are dropped, and output column order
    follows the schema.

    The union-across-parquet-versions primitive: a 100 TB table written
    over months accumulates writer-schema drift; conforming each slice
    to the current schema makes `unionByName` trivially safe. Casts are
    permissive by default (un-castable values become NULL, Spark `cast`
    semantics); ``strict_casts=True`` uses try_cast + a documented
    contract that callers null-check, keeping the ANSI-session failure
    mode (throw on bad cast) out of batch backfills.

    Reference parity: the reference widens union column types via
    baseType (api/union.kt:38-71); this is the explicit-schema version
    of the same contract.
    """
    from pyspark.sql import functions as F

    cols = []
    have = {f.name: f for f in df.schema.fields}
    for field in schema.fields:
        if field.name not in have:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
        elif have[field.name].dataType != field.dataType:
            src = F.col(field.name)
            cast = src.try_cast(field.dataType) if strict_casts else src.cast(field.dataType)
            cols.append(cast.alias(field.name))
        else:
            cols.append(F.col(field.name))
    return df.select(*cols)
