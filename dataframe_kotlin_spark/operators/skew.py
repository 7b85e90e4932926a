"""Skew mitigation for joins and aggregations (SCALE.md §operator rules).

AQE's skew-join splitting handles most cases at runtime; these utilities
are the explicit fallback for *known* pathological keys (the single user
with 10% of all events, the empty-string fingerprint bucket) where you
want the plan fixed before it runs, and for the diagnosis step.

Salting an equi-join: the big side gets a deterministic salt in
[0, buckets); the small side is replicated once per salt value. The join
key becomes (key, salt), fanning one hot key's rows across `buckets`
shuffle partitions. Cost: small side inflates x buckets — use only when
small really is small, and only for the hot keys (split-join pattern).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt__"


def key_skew_stats(df: DataFrame, keys: Sequence[str], top: int = 20) -> DataFrame:
    """Per-key frequency + share of total — the diagnosis query that
    decides whether salting is worth it. One aggregation pass."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__t__"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(*keys, "n", F.round(F.col("n") / F.col("__t__"), 6).alias("share"))
        .orderBy(F.col("n").desc(), *keys)
        .limit(top)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    buckets: int = 8,
    how: str = "inner",
    entropy: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-join with the big side salted across `buckets` partitions.

    `entropy` columns feed the salt hash (default: all big-side columns)
    — deterministic, so replays produce identical partitioning. Supports
    'inner' and 'left' (the unmatched-left semantics survive salting
    because every (key, salt) pair exists on the replicated small side).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left equi-joins")
    ent = [F.col(c) for c in (entropy or big.columns)]
    b = big.withColumn(SALT, F.pmod(F.xxhash64(*ent), F.lit(buckets)).cast("int"))
    s = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return b.join(s, [*on, SALT], how).drop(SALT)


def salted_distinct_count(
    df: DataFrame, keys: Sequence[str], value: str, buckets: int = 32
) -> DataFrame:
    """count_distinct(value) per key without one reducer per hot key:
    phase 1 dedups (key, salt-of-value, value) — the heavy shuffle is
    spread over `buckets` partitions per key — phase 2 sums partial
    distinct counts (exact, since phase 1 partitioned BY VALUE hash, so
    each distinct value lands in exactly one bucket)."""
    salted = df.select(
        *keys, F.pmod(F.xxhash64(F.col(value)), F.lit(buckets)).alias(SALT), value
    )
    partial = salted.groupBy(*keys, SALT).agg(
        F.count_distinct(F.col(value)).alias("__pd__")
    )
    return partial.groupBy(*keys).agg(F.sum("__pd__").alias("n_distinct"))
