"""Audit oracle-vs-Spark result TYPES for every query.

The driver hashes values after sorting columns by name; DuckDB types that
don't map to the same arrow/pandas dtype as Spark's (HUGEINT from SUM(int),
DECIMAL, UTINYINT...) can hash differently even when values are equal.
This runs every oracle on DuckDB and the Spark query, and reports any
column whose pandas dtype class differs (int-like vs float-like vs
object/decimal), so oracles can be CAST-ed to match.

Usage: python tools/audit_types.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def dtype_class(dt, sample) -> str:
    import decimal

    import numpy as np
    import pandas as pd

    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "ts"
    if isinstance(sample, decimal.Decimal):
        return "decimal"
    if isinstance(sample, (int, np.integer)):
        return "int(obj)"
    if isinstance(sample, float):
        return "float(obj)"
    if isinstance(sample, (list, np.ndarray)):
        return "list"
    if isinstance(sample, str):
        return "str"
    if hasattr(sample, "isoformat") and not hasattr(sample, "hour"):
        return "date"
    return f"obj:{type(sample).__name__}"


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    bad = 0
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        sql = oracles.get(name)
        if sql is None:
            continue
        try:
            spdf = fn(spark, sf_dir).toPandas()
            odf = con.execute(sql).fetchdf()
        except Exception as exc:  # pragma: no cover - audit tool
            bad += 1
            print(f"ERR  {name}: {type(exc).__name__}: {exc}")
            continue
        scols = sorted(spdf.columns)
        ocols = sorted(odf.columns)
        if scols != ocols:
            bad += 1
            print(f"COLS {name}: spark={scols} oracle={ocols}")
            continue
        for c in scols:
            ssamp = spdf[c].iloc[0] if len(spdf) else None
            osamp = odf[c].iloc[0] if len(odf) else None
            sc = dtype_class(spdf[c].dtype, ssamp)
            oc = dtype_class(odf[c].dtype, osamp)
            if sc != oc:
                bad += 1
                print(f"TYPE {name}.{c}: spark={sc}({spdf[c].dtype}) oracle={oc}({odf[c].dtype})")
    print(f"done, {bad} issues")


if __name__ == "__main__":
    main()
