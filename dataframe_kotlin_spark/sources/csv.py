"""CSV source/sink with the reference's ingest semantics (SURVEY §2.1,
§3.1; reference io/csv.kt:31-295).

Reference behaviors reproduced:
- null strings {"NA", "N/A", "null", ""} normalize to null
  (io/csv.kt:261,276-281)
- duplicate headers deduped with ``_1``/``_2`` suffixes (io/csv.kt:251-256)
- ``skip_lines`` / ``read_lines`` (io/csv.kt header args)
- per-column string->type inference via the ordered parser cascade
  Int -> Long -> Double -> Boolean -> Date -> Time -> DateTime
  (api/convert.kt:267-276), applied only when a parser accepts EVERY
  non-null value in the column (api/parse.kt:18-42)

Scale design: the file is read once as strings (executor-side), the
inference decision is ONE aggregate pass computing per-column acceptance
flags (distributed try_cast counting — no driver collect of data), then
one projection casts accepted columns. Headers and skip-lines touch only
the file head via a limited text read.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

NULL_STRINGS = ("NA", "N/A", "null", "")

# exactly the reference's toBooleanOrNull accept set (api/convert.kt:230-239)
_BOOL_TRUE = ("true", "t", "yes")
_BOOL_FALSE = ("false", "f", "no")


def _dedupe(names: list[str]) -> list[str]:
    """Reference ColumnNameGenerator: second occurrence of `x` -> `x_1`."""
    seen: dict[str, int] = {}
    out = []
    for n in names:
        if n in seen:
            seen[n] += 1
            out.append(f"{n}_{seen[n]}")
        else:
            seen[n] = 0
            out.append(n)
    return out


def _read_head_lines(spark: SparkSession, path: str, n: int) -> list[str]:
    return [r[0] for r in spark.read.text(path).limit(n).collect()]


def read_csv(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    header: bool = True,
    skip_lines: int = 0,
    read_lines: int | None = None,
    null_strings: Sequence[str] = NULL_STRINGS,
    infer_types: bool = True,
    col_types: dict[str, str] | None = None,
    quote: str = '"',
    escape: str = '"',
    headers: Sequence[str] | None = None,
) -> DataFrame:
    """Reference readCSV/readDelim (io/csv.kt:31-274).

    col_types overrides inference per column (reference per-column ColType).
    escape defaults to the quote char (RFC 4180 doubled quotes), matching
    the reference's Commons-CSV parser — Spark's own default is backslash.
    ``headers`` assigns explicit column names (reference io/csv.kt:41
    `headers` arg): no header line is consumed from the data, and a list
    SHORTER than the file's arity keeps only the first len(headers)
    columns (CsvTests.kt `read with custom header`).
    """
    if headers:
        header = False
        names = _dedupe([str(n) for n in headers])
    elif header:
        # header (+ skipped lines) live in the file head only; parse the
        # line with csv.reader so quoted cells containing `sep` survive
        head = _read_head_lines(spark, path, skip_lines + 1)
        if head:
            import csv as _csv

            raw_names = next(
                _csv.reader([head[-1]], delimiter=sep, quotechar=quote), []
            )
        else:
            raw_names = []
        names = _dedupe([n.strip() or f"c{i}" for i, n in enumerate(raw_names)])
    else:
        names = None

    def reader():
        return (
            spark.read.option("sep", sep)
            .option("quote", quote)
            .option("escape", escape)
            .option("mode", "PERMISSIVE")
        )

    if skip_lines == 0:
        df = reader().option("header", header).csv(path)
    else:
        # skip N physical lines: filter on a per-file line index. At scale
        # skip_lines is a file-head concern (metadata), so the index join
        # touches only ordering within each file via zipWithIndex.
        rdd = spark.sparkContext.textFile(path).zipWithIndex()
        start = skip_lines + (1 if header else 0)
        lines = rdd.filter(lambda t: t[1] >= start).map(lambda t: t[0])
        df = reader().csv(lines)
    if names:
        if headers and len(names) > len(df.columns):
            # more names than file columns: loud error, never a silent
            # fall-through to Spark's _c0-style names
            raise ValueError(
                f"read_csv: {len(names)} header names given but the file "
                f"has only {len(df.columns)} columns: {names}"
            )
        if headers and len(names) < len(df.columns):
            # explicit short header list keeps the first N columns
            df = df.select(*df.columns[: len(names)])
        if len(names) == len(df.columns):
            # reference naming: second `x` -> `x_1` (Spark's own dedup is x2)
            df = df.toDF(*names)

    if read_lines is not None:
        df = df.limit(read_lines)
    return _finalize(df, null_strings, infer_types, col_types)


def _finalize(
    df: DataFrame,
    null_strings: Sequence[str],
    infer_types: bool,
    col_types: dict[str, str] | None,
) -> DataFrame:
    # null normalization (reference io/csv.kt:261,276-281)
    nulls = [s for s in null_strings]
    for c in df.columns:
        df = df.withColumn(c, F.when(F.col(c).isin(nulls) | F.col(c).isNull(), None).otherwise(F.col(c)))

    explicit = {
        c: _COLTYPE_ALIASES.get(t, t) for c, t in (col_types or {}).items()
    }
    if infer_types:
        df = infer_column_types(df, skip=set(explicit))
    for c, t in explicit.items():
        df = df.withColumn(c, F.col(c).cast(t))
    return df


def read_delim_str(
    spark: SparkSession,
    text: str,
    sep: str = ",",
    header: bool = True,
    null_strings: Sequence[str] = NULL_STRINGS,
    infer_types: bool = True,
    col_types: dict[str, str] | None = None,
    quote: str = '"',
    escape: str = '"',
) -> DataFrame:
    """Reference readDelimStr (io/csv.kt readDelimStr; CsvTests.readNulls):
    parse a CSV literal held in memory. The literal is parallelized to an
    RDD so parsing still runs executor-side — driver memory holds only the
    original string, which is by definition small (a literal).
    """
    import csv as _csv

    lines = [ln for ln in text.splitlines() if ln.strip() != ""]
    if header and lines:
        raw_names = next(_csv.reader([lines[0]], delimiter=sep, quotechar=quote), [])
        names = _dedupe([n.strip() or f"c{i}" for i, n in enumerate(raw_names)])
        lines = lines[1:]
    else:
        names = None
    rdd = spark.sparkContext.parallelize(lines)
    df = (
        spark.read.option("sep", sep)
        .option("quote", quote)
        .option("escape", escape)
        .option("mode", "PERMISSIVE")
        .csv(rdd)
    )
    if names:
        # the header defines the arity (commons-csv withHeader): trailing
        # unnamed cells are dropped (CsvTests.readNulls: "2,," under two
        # headers is a 2-column row)
        if len(names) < len(df.columns):
            df = df.select(*df.columns[: len(names)])
        if len(names) == len(df.columns):
            df = df.toDF(*names)
    return _finalize(df, null_strings, infer_types, col_types)


def read_tsv(spark: SparkSession, path: str, **kw) -> DataFrame:
    return read_csv(spark, path, sep="\t", **kw)


def _acceptance_exprs(c: str) -> dict[str, Column]:
    """Per-parser 'accepts every non-null value' flags for one column."""
    col = F.col(c)
    nn = col.isNotNull()

    def all_ok(ok: Column) -> Column:
        # min over bools: false if any non-null value is rejected
        return F.coalesce(F.min(F.when(nn, ok.cast("int"))), F.lit(1)) == 1

    as_long = col.try_cast("long")
    as_double = col.try_cast("double")
    lower = F.lower(col)
    # Leading-zero numerics ("01.01" -> 1.01, "00" -> 0) ARE numeric, same
    # as Kotlin's toIntOrNull/toDoubleOrNull (reference testCSV.csv `number`
    # column parses to Double). Spark's try_cast also accepts inf/INF/NaN,
    # matching the reference's parseDouble special cases
    # (api/convert.kt:254-262). The cascade's BigDecimal stage
    # (api/convert.kt:272) sits AFTER Double, as in the reference, so it
    # fires only for literals Double rejects but BigDecimal accepts —
    # rare in both engines (Kotlin's Double parser accepts a superset of
    # plain decimal literals; overflow becomes Infinity, never null).
    # ``prefer_decimal`` (an extension knob on infer_column_types) hoists
    # it ahead of Double so precision-exceeds-double literals keep all
    # digits as DECIMAL(38,18) instead of silently rounding.
    as_decimal = col.try_cast(_DECIMAL)
    return {
        f"{c}__int": all_ok(col.try_cast("int").isNotNull() & ~col.contains(".")),
        f"{c}__long": all_ok(as_long.isNotNull()),
        f"{c}__double": all_ok(as_double.isNotNull()),
        f"{c}__bool": all_ok(lower.isin(*_BOOL_TRUE, *_BOOL_FALSE)),
        f"{c}__decimal": all_ok(
            as_decimal.isNotNull() & col.rlike(r"^[+-]?\d*\.?\d+([eE][+-]?\d+)?$")
        ),
        f"{c}__date": all_ok(col.try_cast("date").isNotNull() & col.rlike(r"^\d{4}-\d{2}-\d{2}$")),
        f"{c}__time": all_ok(col.rlike(r"^\d{2}:\d{2}(:\d{2})?$")),
        f"{c}__ts": all_ok(
            col.try_cast("timestamp_ntz").isNotNull()
            & col.rlike(r"^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}")
        ),
        f"{c}__allnull": F.count(F.when(nn, 1)) == 0,
    }


# DECIMAL(38,18) mirrors java.math.BigDecimal closely enough for CSV
# literals while staying a fixed Spark type (SURVEY §1.3): 20 integer +
# 18 fraction digits, exact arithmetic, sortable, parquet-writable.
_DECIMAL = "decimal(38,18)"

# parser priority — reference api/convert.kt:267-276
# (Int, Long, Double, Boolean, BigDecimal, LocalDate, LocalTime, LocalDateTime)
_CASCADE = ["int", "long", "double", "bool", "decimal", "date", "time", "ts"]
_CAST = {
    "int": "int",
    "long": "long",
    "double": "double",
    "decimal": _DECIMAL,
    "date": "date",
    "ts": "timestamp_ntz",
}

# col_types spelling aliases (reference ColType enum names)
_COLTYPE_ALIASES = {
    "bigdecimal": _DECIMAL,
    "bigDecimal": _DECIMAL,
    "BigDecimal": _DECIMAL,
}

# Reference DataFrame.parser.addDateTimeFormat (ParserTests.kt:20-27):
# extra datetime patterns appended to the cascade's datetime stage.
# Spark pattern syntax ('dd.MM.yyyy HH:mm:ss'); Kotlin's uuuu year maps
# to yyyy here.
_CUSTOM_DATETIME_FORMATS: list[str] = []


def add_datetime_format(fmt: str) -> None:
    if fmt not in _CUSTOM_DATETIME_FORMATS:
        _CUSTOM_DATETIME_FORMATS.append(fmt)


def clear_datetime_formats() -> None:
    _CUSTOM_DATETIME_FORMATS.clear()


def infer_column_types(
    df: DataFrame,
    skip: set[str] = frozenset(),
    strict: bool = False,
    prefer_decimal: bool = False,
) -> DataFrame:
    """One distributed aggregate pass decides each string column's type,
    then one projection casts. String columns stay string when no parser
    accepts all values (reference api/parse.kt:42, tryParse behavior);
    ``strict=True`` raises instead (reference parse() throws
    IllegalStateException — ParserTests `parse should throw`).

    Custom datetime formats registered via add_datetime_format extend
    the cascade's datetime stage, tried in registration order after the
    ISO forms (reference parser.addDateTimeFormat).

    ``prefer_decimal=True`` hoists the BigDecimal stage ahead of Double
    (extension beyond the reference order), so fractional literals keep
    every digit as DECIMAL(38,18) — use when ingesting money/ledger CSVs
    where double rounding is unacceptable."""
    str_cols = [c for c, t in df.dtypes if t == "string" and c not in skip]
    if not str_cols:
        return df
    custom = list(_CUSTOM_DATETIME_FORMATS)
    aggs = {}
    for c in str_cols:
        aggs.update(_acceptance_exprs(c))
        for i, fmt in enumerate(custom):
            ok = F.try_to_timestamp(F.col(c), F.lit(fmt)).isNotNull()
            nn = F.col(c).isNotNull()
            aggs[f"{c}__tsfmt{i}"] = (
                F.coalesce(F.min(F.when(nn, ok.cast("int"))), F.lit(1)) == 1
            )
    row = df.agg(*[v.alias(k) for k, v in aggs.items()]).collect()[0]

    order = list(_CASCADE)
    if prefer_decimal:
        order.remove("decimal")
        order.insert(order.index("double"), "decimal")
    cascade = order + [f"tsfmt{i}" for i in range(len(custom))]
    out = df
    for c in str_cols:
        if row[f"{c}__allnull"]:
            continue  # all-null column stays string (reference keeps String?)
        matched = None
        for parser in cascade:
            if row[f"{c}__{parser}"]:
                matched = parser
                if parser == "bool":
                    out = out.withColumn(
                        c,
                        F.when(F.col(c).isNull(), None).otherwise(
                            F.lower(F.col(c)).isin(*_BOOL_TRUE)
                        ),
                    )
                elif parser == "time":
                    pass  # Spark has no TIME type: keep string HH:mm:ss (SURVEY §1.3)
                elif parser.startswith("tsfmt"):
                    fmt = custom[int(parser[5:])]
                    out = out.withColumn(
                        c,
                        F.to_timestamp(F.col(c), fmt).cast("timestamp_ntz"),
                    )
                else:
                    out = out.withColumn(c, F.col(c).cast(_CAST[parser]))
                break
        if strict and matched is None:
            raise ValueError(
                f"parse: column {c!r} matched no parser in the cascade"
            )
    return out


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    sep: str = ",",
    header: bool = True,
    quote: str = '"',
    escape: str | None = None,
    quote_all: bool = False,
    null_value: str = "",
    line_sep: str = "\n",
    compression: str | None = None,
) -> None:
    """Reference writeCSV (io/csv.kt:283-295), which takes a Commons-CSV
    ``CSVFormat`` — the knobs here mirror that surface: delimiter, quote
    char, escape, ALL-vs-MINIMAL quote mode, null string, record
    separator, header toggle.

    Escape defaults to the QUOTE char (doubled quotes, ``a""b``) to match
    Commons CSV DEFAULT — Spark's own default is backslash-escape, which
    the reference's reader would mis-parse. Distributed write: one file
    per partition, no driver collect; ``compression`` (gzip/snappy/...)
    applies per-file so parallel readers still split by file.
    """
    w = (
        df.write.mode(mode)
        .option("header", header)
        .option("sep", sep)
        .option("quote", quote)
        .option("escape", escape if escape is not None else quote)
        .option("quoteAll", quote_all)
        .option("nullValue", null_value)
        .option("emptyValue", '""')
        .option("lineSep", line_sep)
    )
    if compression:
        w = w.option("compression", compression)
    w.csv(path)
