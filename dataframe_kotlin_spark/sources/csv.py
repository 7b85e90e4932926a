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

    http(s)/ftp URLs and .zip archives localize driver-side first
    (sources/fetch.py; reference io/csv.kt:160-196 URL + zip streams) —
    size-capped with a copy-to-DFS error beyond 1 GiB.
    """
    from dataframe_kotlin_spark.sources.fetch import is_url, localize_source

    if is_url(path) or path.lower().endswith(".zip"):
        path = localize_source(path)
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
        # skip N physical lines PER FILE: a single global zipWithIndex
        # would skip only the first file's preamble in a multi-file read,
        # leaking every other file's junk + header lines into the data.
        # One RDD per file, unioned — still one job, one task set.
        start = skip_lines + (1 if header else 0)
        sc = spark.sparkContext
        rdds = [
            sc.textFile(f)
            .zipWithIndex()
            .filter(lambda t, s_=start: t[1] >= s_)
            .map(lambda t: t[0])
            for f in _list_input_files(spark, path)
        ]
        if not rdds:
            raise FileNotFoundError(f"read_csv: no input files at {path!r}")
        lines = sc.union(rdds) if len(rdds) > 1 else rdds[0]
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


def _qc(c: str) -> Column:
    """Backtick-quoted column ref: header names may contain dots (or any
    punctuation) and F.col would read them as struct-field paths."""
    return F.col("`" + c.replace("`", "``") + "`")


def _list_input_files(spark: SparkSession, path: str) -> list[str]:
    """Resolve a path/glob/directory to its data files via the Hadoop
    FileSystem API (works for any supported FS, not just local)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    stack = list(fs.globStatus(p) or [])
    out = []
    while stack:
        st = stack.pop()
        if st.isDirectory():
            stack.extend(fs.listStatus(st.getPath()))
        else:
            name = st.getPath().getName()
            if not name.startswith(("_", ".")):
                out.append(st.getPath().toString())
    return sorted(out)


def _finalize(
    df: DataFrame,
    null_strings: Sequence[str],
    infer_types: bool,
    col_types: dict[str, str] | None,
) -> DataFrame:
    # null normalization (reference io/csv.kt:261,276-281) as ONE
    # projection: a withColumn per column nests O(n) Projects and makes
    # Catalyst analysis quadratic on wide files
    nulls = [x for x in null_strings]
    df = df.select(
        *[
            F.when(_qc(c).isin(nulls) | _qc(c).isNull(), None)
            .otherwise(_qc(c))
            .alias(c)
            for c in df.columns
        ]
    )
    explicit = {
        c: _COLTYPE_ALIASES.get(t, t) for c, t in (col_types or {}).items()
    }
    if infer_types:
        df = infer_column_types(df, skip=set(explicit))
    if explicit:
        df = df.select(
            *[
                (_qc(c).cast(explicit[c]).alias(c) if c in explicit else _qc(c))
                for c in df.columns
            ]
        )
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
    parse a CSV literal held in memory with the stdlib RFC-4180 parser —
    quoted fields may contain embedded newlines and separators, exactly
    as the reference's Commons-CSV parser accepts (a line-split + Spark
    csv-on-RDD approach tears multi-line records apart). The literal is
    by definition driver-sized; the resulting frame is distributed.

    The header defines the arity (commons-csv withHeader): longer data
    rows truncate, shorter rows pad with nulls (CsvTests.readNulls:
    "2,," under two headers is a 2-column row).
    """
    import csv as _csv
    import io as _io

    from pyspark.sql import types as T

    # Commons-CSV DEFAULT only ignores physically empty lines; a multi-field
    # all-empty record like ",," still parses to a row of nulls (reference
    # io/csv.kt DEFAULT format). A blank line reaches us as a single empty
    # cell from the stdlib reader — drop exactly those.
    rows = [
        r
        for r in _csv.reader(_io.StringIO(text), delimiter=sep, quotechar=quote)
        if r and not (len(r) == 1 and r[0].strip() == "")
    ]
    if header and rows:
        names = _dedupe([n.strip() or f"c{i}" for i, n in enumerate(rows[0])])
        data = rows[1:]
    else:
        names = None
        data = rows
    arity = (
        len(names)
        if names is not None
        else (max((len(r) for r in data), default=0))
    )
    names = names if names is not None else [f"_c{i}" for i in range(arity)]
    norm = [
        tuple(
            (r[i] if i < len(r) and r[i] != "" else None) for i in range(arity)
        )
        for r in data
    ]
    schema = T.StructType([T.StructField(n, T.StringType()) for n in names])
    df = spark.createDataFrame(norm, schema)
    return _finalize(df, null_strings, infer_types, col_types)


def read_tsv(spark: SparkSession, path: str, **kw) -> DataFrame:
    return read_csv(spark, path, sep="\t", **kw)


def _acceptance_exprs(c: str) -> dict[str, Column]:
    """Per-parser 'accepts every non-null value' flags for one column."""
    col = _qc(c)
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
            ok = F.try_to_timestamp(_qc(c), F.lit(fmt)).isNotNull()
            nn = _qc(c).isNotNull()
            aggs[f"{c}__tsfmt{i}"] = (
                F.coalesce(F.min(F.when(nn, ok.cast("int"))), F.lit(1)) == 1
            )
    row = df.agg(*[v.alias(k) for k, v in aggs.items()]).collect()[0]

    order = list(_CASCADE)
    if prefer_decimal:
        order.remove("decimal")
        order.insert(order.index("double"), "decimal")
    cascade = order + [f"tsfmt{i}" for i in range(len(custom))]
    # decide every column, then apply them in ONE projection (chained
    # withColumn would nest O(n) Projects — quadratic analysis on wide files)
    casts: dict[str, Column] = {}
    for c in str_cols:
        if row[f"{c}__allnull"]:
            continue  # all-null column stays string (reference keeps String?)
        matched = None
        for parser in cascade:
            if row[f"{c}__{parser}"]:
                matched = parser
                if parser == "bool":
                    casts[c] = F.when(_qc(c).isNull(), None).otherwise(
                        F.lower(_qc(c)).isin(*_BOOL_TRUE)
                    )
                elif parser == "time":
                    pass  # Spark has no TIME type: keep string HH:mm:ss (SURVEY §1.3)
                elif parser.startswith("tsfmt"):
                    fmt = custom[int(parser[5:])]
                    casts[c] = F.to_timestamp(_qc(c), fmt).cast("timestamp_ntz")
                else:
                    casts[c] = _qc(c).cast(_CAST[parser])
                break
        if strict and matched is None:
            raise ValueError(
                f"parse: column {c!r} matched no parser in the cascade"
            )
    if not casts:
        return df
    return df.select(
        *[(casts[c].alias(c) if c in casts else _qc(c)) for c in df.columns]
    )


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
