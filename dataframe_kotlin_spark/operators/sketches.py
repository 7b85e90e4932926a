"""Approximate / sketch aggregates for cardinality at scale.

At 100 TB an exact COUNT(DISTINCT) shuffles every distinct key; the
sketches here keep the answer one fixed-size buffer per group:

- ``approx_distinct``: Spark's native HyperLogLog++ (relative error
  configurable, default 5%); partial buffers merge map-side, so the
  shuffle carries one HLL register set per group, not keys.
- ``hll_sketch`` / ``hll_merge``: Apache DataSketches HLL (Spark 3.5+
  ``hll_sketch_agg``) — the sketch itself is a column, so per-group
  sketches persist to parquet and MERGE across groups/days later
  without rescanning the raw data (the rollup-reuse pattern a
  hypertable needs).

No DuckDB oracle: both engines implement HLL with different hash
functions, so estimates legitimately differ — tests assert relative
error against the exact count instead (tests/test_approx.py), and the
driver records a rows-only check for these queries.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame, keys: Sequence[str], col: str, rsd: float = 0.05, name: str = "approx_nd"
) -> DataFrame:
    """Per-group approximate distinct count (HLL++, max relative
    standard deviation ``rsd``)."""
    return df.groupBy(*keys).agg(F.approx_count_distinct(col, rsd).alias(name))


def hll_sketch(
    df: DataFrame, keys: Sequence[str], col: str, lg_k: int = 12, name: str = "sketch"
) -> DataFrame:
    """Build one mergeable DataSketches HLL binary sketch per group
    (lgConfigK=12 -> 4096 registers, ~2.5KB, ~1.6% error)."""
    return df.groupBy(*keys).agg(F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias(name))


def hll_merge(
    sketches: DataFrame, keys: Sequence[str], sketch_col: str = "sketch", name: str = "approx_nd"
) -> DataFrame:
    """Merge pre-built sketches up a hierarchy level and estimate.
    Input is the OUTPUT of hll_sketch — raw data is never rescanned."""
    return sketches.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias(name)
    )
