"""Local mirror of the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB, compare row count, column
names, and order-insensitive values.

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
       python tools/compare_oracle.py --record ORACLE_SWEEP_r10.json [sf_dir]

--record writes the sweep as a JSON artifact {name: {status, rows,
sec}} plus a summary header — the full-registry local evidence the
round ships instead of re-deriving by hand (VERDICT r9 item 8).
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

    args = sys.argv[1:]
    record = None
    if "--record" in args:
        i = args.index("--record")
        record = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

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
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            results[name] = {"status": "fail", "why": f"spark error: {type(e).__name__}"}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP  {name}: no oracle ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            results[name] = {"status": "no-oracle", "rows": len(sdf)}
            n_noracle += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {type(e).__name__}: {e}")
            results[name] = {"status": "fail", "why": f"oracle error: {type(e).__name__}"}
            n_fail += 1
            continue
        scols, srows = canon(sdf)
        ocols, orows = canon(odf)
        why = None
        if [c.lower() for c in scols] != [c.lower() for c in ocols]:
            why = f"columns spark={scols} oracle={ocols}"
        elif len(srows) != len(orows):
            why = f"rowcount spark={len(srows)} oracle={len(orows)}"
        elif srows != orows:
            bad = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            why = f"value mismatch, first diffs: {bad}"
        if why is not None:
            print(f"FAIL  {name}: {why}")
            results[name] = {"status": "fail", "why": why[:400]}
            n_fail += 1
            continue
        print(f"PASS  {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
        results[name] = {"status": "pass", "rows": len(srows), "sec": round(time.time() - t0, 2)}
        n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    if record:
        import json

        session = "vanilla" if os.environ.get("SPARK_GRAFT_VANILLA") else "get_spark"
        with open(record, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "session": session,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_noracle": n_noracle,
                    "queries": results,
                },
                fh,
                indent=1,
            )
        print(f"recorded -> {record}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
