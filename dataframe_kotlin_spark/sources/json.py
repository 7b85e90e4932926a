"""JSON source/sink (SURVEY §2.1; reference io/json.kt:27-202).

``spark.read.json`` already produces the reference's target shape for
uniform data: nested objects -> struct columns (ColumnGroup), nested
arrays of objects -> array<struct> (FrameColumn), scalar arrays -> array
(Many). The reference's extra behavior — heterogeneous top-level arrays
normalized into synthesized ``value``/``array`` columns (io/json.kt:60-99)
— is reproduced by ``normalize_heterogeneous``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_json(spark: SparkSession, path: str, multi_line: bool = True) -> DataFrame:
    """Reference readJson (io/json.kt:27-131). multiLine=True matches the
    reference's whole-document parse; NDJSON sources pass False (the
    scalable layout — one object per line splits across executors).
    URL / .zip sources localize driver-side (sources/fetch.py), exactly
    as in read_csv."""
    from dataframe_kotlin_spark.sources.fetch import is_url, localize_source

    if is_url(path) or path.lower().endswith(".zip"):
        path = localize_source(path)
    return spark.read.option("multiLine", multi_line).json(path)


def read_json_str(spark: SparkSession, content: str) -> DataFrame:
    """Reference readJsonStr: parse a JSON string literal.

    A whole-string parse (Jackson-style, like the reference) accepts a
    single object, a top-level array (one row per element), or —
    falling back when the whole string is not one document — NDJSON
    lines. The literal lives on the driver by definition, so the
    driver-side json.loads is on a handful of bytes, not data.
    """
    import json as _json

    try:
        doc = _json.loads(content)
        records = doc if isinstance(doc, list) else [doc]
        payload = [_json.dumps(r) for r in records]
    except ValueError:
        payload = [ln for ln in content.splitlines() if ln.strip()]
    return spark.read.json(spark.sparkContext.parallelize(payload or [content]))


def normalize_heterogeneous(df: DataFrame) -> DataFrame:
    """Reference behavior for mixed-type JSON arrays (io/json.kt:60-99):
    non-object elements that Spark parks in ``_corrupt_record`` split
    into the reference's two columns — scalars land in ``value`` (the
    scalar itself, quote-stripped via from_json) and nested arrays in
    ``array`` (array<string>, nested objects kept as their JSON text).
    Pure Column expressions, map-only."""
    out = df
    if "_corrupt_record" in out.columns:
        txt = F.trim(F.col("_corrupt_record"))
        is_arr = txt.startswith("[")
        out = (
            out.withColumn(
                # from_json needs a container schema: wrap the scalar in a
                # one-element array to quote-strip/normalize it
                "value",
                F.when(
                    txt.isNotNull() & ~is_arr,
                    F.element_at(
                        F.from_json(
                            F.concat(F.lit("["), txt, F.lit("]")), "array<string>"
                        ),
                        1,
                    ),
                ),
            )
            .withColumn(
                "array",
                F.when(txt.isNotNull() & is_arr, F.from_json(txt, "array<string>")),
            )
            .drop("_corrupt_record")
        )
    return out


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Reference writeJson (io/json.kt:133-203): structs/arrays re-collapse
    to JSON objects/arrays natively."""
    df.write.mode(mode).json(path)
