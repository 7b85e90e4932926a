"""Format-sniffing read dispatch (SURVEY §2.1; reference io/guess.kt:26-58):
choose CSV vs JSON vs parquet by extension, falling back to try-JSON-then-CSV.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from dataframe_kotlin_spark.sources.csv import read_csv, read_tsv
from dataframe_kotlin_spark.sources.json import read_json


def read(spark: SparkSession, path: str, **kw) -> DataFrame:
    from dataframe_kotlin_spark.sources.fetch import is_url, localize_source

    if is_url(path) or path.lower().endswith(".zip"):
        # URL fetch / zip extraction BEFORE sniffing, so a zip's inner
        # file name drives the format dispatch (reference io/guess.kt
        # works on the decompressed stream the same way)
        path = localize_source(path)
    ext = os.path.splitext(path)[1].lower().lstrip(".")
    if ext in ("gz", "zip", "bz2"):
        ext = os.path.splitext(os.path.splitext(path)[0])[1].lower().lstrip(".")
    if ext == "csv":
        return read_csv(spark, path, **kw)
    if ext == "tsv":
        return read_tsv(spark, path, **kw)
    if ext == "json":
        return read_json(spark, path, **kw)
    if ext == "parquet":
        return spark.read.parquet(path)
    if ext == "orc":
        return spark.read.orc(path)
    # fallback: try JSON then CSV (reference tries CSV then JSON; JSON-first
    # here because Spark's CSV parser accepts nearly anything)
    try:
        df = read_json(spark, path, **kw)
        if df.columns and "_corrupt_record" not in df.columns:
            return df
    except Exception:
        pass
    return read_csv(spark, path, **kw)
