"""Interleaved A/B probe (one tree per process): prints ONE JSON line
with a normalized physical-plan hash and noop-forced timings for the
given queries.

Usage: python tools/ab_probe.py TREE_ROOT q1,q3[,...] [reps] [sf_dir]

Run alternately against two checkouts (A B A B ...) on an idle machine
to separate plan regressions from ambient load: identical plan hashes
mean the code cannot be the cause of a timing delta (the r7/r8 q1
precedent); overlapping interleaved timing distributions mean the
delta is ambient.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys
import time


def main():
    root = os.path.abspath(sys.argv[1])
    names = sys.argv[2].split(",")
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    sys.path.insert(0, root)

    from dataframe_kotlin_spark.session import get_spark

    import __spark_entry__ as m

    spark = get_spark("ab-probe")
    qs = m.queries()

    def _force(df):
        df.write.format("noop").mode("overwrite").save()

    out = {"tree": root, "loadavg": round(os.getloadavg()[0], 2), "queries": {}}
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = str(df._jdf.queryExecution().executedPlan())
        norm = re.sub(r"#\d+|plan_id=\d+|\blambda [a-z]+_\d+\b|@[0-9a-f]+", "#", plan)
        h = hashlib.sha256(norm.encode()).hexdigest()[:16]
        _force(df)  # warm
        times = []
        for _ in range(reps):
            t0 = time.time()
            _force(qs[name](spark, sf_dir))
            times.append(round(time.time() - t0, 3))
        out["queries"][name] = {"plan_hash": h, "reps": times, "median": sorted(times)[len(times) // 2]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
