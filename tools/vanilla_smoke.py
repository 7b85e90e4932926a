"""Driver-environment smoke: run EVERY queries() entry under a VANILLA
SparkSession (no tuned conf — ANSI mode ON by Spark 4 default, default
shuffle partitions, no nanosAsLong pre-set). The driver builds its own
session, so anything that only works under our get_spark() conf is a
latent correctness-gate failure.

Usage: python tools/vanilla_smoke.py [sf_dir]
Exit 1 if any query raises.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    print("ansi:", spark.conf.get("spark.sql.ansi.enabled"))

    import __spark_entry__ as m

    fails = []
    for name, fn in m.queries().items():
        t0 = time.time()
        try:
            n = fn(spark, sf_dir).count()
            print(f"OK    {name}: {n} rows ({time.time() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001 — report every failure kind
            fails.append(name)
            print(f"CRASH {name}: {type(e).__name__}: {str(e)[:200]}")
    print(f"{len(fails)} crashes: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
