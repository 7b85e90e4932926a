"""Local mirror of the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB, compare row count, column
names, and order-insensitive values.

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")


def canon(df) -> tuple[list[str], list[tuple]]:
    """Columns sorted by name; rows as sorted tuples of canonical values."""
    import datetime
    import decimal

    import numpy as np

    cols = sorted(df.columns)
    df = df[cols]

    def cv(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.9g}"
        if isinstance(v, (np.floating,)):
            return f"{float(v):.9g}"
        if isinstance(v, (np.integer,)):
            return str(int(v))
        if isinstance(v, decimal.Decimal):
            return f"{float(v):.9g}"
        if isinstance(v, np.ndarray) and v.ndim == 0:
            return cv(v.item())
        if isinstance(v, (list, tuple, np.ndarray)):
            return "[" + ",".join(cv(x) for x in v) + "]"
        if isinstance(v, datetime.datetime):
            return v.isoformat()
        if isinstance(v, datetime.date):
            return v.isoformat()
        return str(v)

    rows = sorted(tuple(cv(v) for v in row) for row in df.itertuples(index=False, name=None))
    return cols, rows


def main():
    import os

    import duckdb

    from dataframe_kotlin_spark.session import TABLES, get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # driver-default session: ANSI on, no tuned conf — value-level
        # parity must hold here too, not just under get_spark
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        spark = get_spark("compare-oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_noracle = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP  {name}: no oracle ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            n_noracle += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        scols, srows = canon(sdf)
        ocols, orows = canon(odf)
        if [c.lower() for c in scols] != [c.lower() for c in ocols]:
            print(f"FAIL  {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        if srows != orows:
            bad = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {bad}")
            n_fail += 1
            continue
        print(f"PASS  {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
        n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
