"""Incremental aggregate maintenance: keep a grouped-aggregate table up
to date as new data arrives WITHOUT rescanning history.

The 100 TB daily-ingest pattern: raw data lands in partitions; a
materialized per-key aggregate must absorb each increment at the cost
of the increment, not of history. That works exactly for ALGEBRAIC
aggregates — ones with a mergeable partial state:

    count        -> sum of partial counts
    sum          -> sum of partial sums
    min / max    -> min / max of partials
    avg          -> (sum, count) pair, finalized at read time

(The sketch ops give the same contract for non-algebraic measures:
approx distinct -> hll_merge, frequency -> count_min cells.)

``increment`` turns a new data slice into partial state; ``merge``
folds it into the existing state table; ``finalize`` derives read-time
measures (avg). merge(state, increment(d1)), then d2, ... equals
increment(d1 ∪ d2 ∪ ...) — the associativity test_incremental pins.

Scale shape: each increment shuffles only its own rows (one grouped
agg), and the merge shuffles |keys-touched| + |state| rows. State stays
one row per key. The same pattern is the batch twin of
stream_jobs.run_upsert_sink (streaming micro-batch = one increment).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F



def increment(df: DataFrame, keys: Sequence[str], value_col: str) -> DataFrame:
    """Partial aggregate state for one data slice: one grouped agg."""
    return df.groupBy(*keys).agg(
        F.count(value_col).cast("bigint").alias("cnt"),
        F.sum(value_col).cast("double").alias("sum_val"),
        F.min(value_col).cast("double").alias("min_val"),
        F.max(value_col).cast("double").alias("max_val"),
    )


def merge(state: DataFrame, delta: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Fold a new partial state into the existing state table. Both
    sides are key-grained (small); the union+re-agg costs |state| +
    |delta| rows, never the raw history."""
    return (
        state.unionByName(delta)
        .groupBy(*keys)
        .agg(
            F.sum("cnt").cast("bigint").alias("cnt"),
            F.sum("sum_val").alias("sum_val"),
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
        )
    )


def finalize(state: DataFrame) -> DataFrame:
    """Read-time measures derived from state: adds avg_val. (avg is the
    canonical aggregate that is NOT directly mergeable — only its
    (sum, count) state is, which is why the state carries both.)"""
    return state.withColumn(
        "avg_val",
        F.when(F.col("cnt") > 0, F.col("sum_val") / F.col("cnt")),
    )
