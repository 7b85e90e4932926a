"""Feature preparation: outlier clipping and normalization, per group.

The last mile before training: winsorize heavy-tailed numerics at
percentile bounds and standardize features — computed per group so one
segment's scale doesn't bleed into another's.

Both ops follow the two-pass shape that distributes: (1) one grouped
aggregate computes the per-group statistics (percentiles / mean+std),
(2) the stats broadcast-join back onto the rows (group cardinality is
small by construction) and the transform is map-side. No window over
the full table — a window formulation would sort every partition; the
agg+join formulation shuffles once to build stats the size of |groups|.

Reference parity: extends the stats surface (api/std.kt, api/median.kt)
into the transform the reference never had.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _stats_join(df: DataFrame, keys: Sequence[str], aggs: list) -> DataFrame:
    """Broadcast the per-group stats back onto the rows. NULL group keys
    join null-safely (eqNullSafe) so rows in the NULL group are clipped/
    scaled within it rather than silently dropped by a plain equi-join
    (a row-preserving transform must preserve rows)."""
    if not keys:
        return df.crossJoin(F.broadcast(df.agg(*aggs)))
    stats = df.groupBy(*keys).agg(*aggs)
    renamed = stats.select(
        *[F.col(k).alias(f"__k_{k}__") for k in keys],
        *[c for c in stats.columns if c not in keys],
    )
    cond = None
    for k in keys:
        e = F.col(k).eqNullSafe(F.col(f"__k_{k}__"))
        cond = e if cond is None else cond & e
    return df.join(F.broadcast(renamed), cond, "left").drop(
        *[f"__k_{k}__" for k in keys]
    )


def winsorize(
    df: DataFrame,
    cols: Sequence[str],
    keys: Sequence[str] = (),
    lower: float = 0.01,
    upper: float = 0.99,
) -> DataFrame:
    """Clip each column in ``cols`` to its [lower, upper] EXACT
    percentile bounds, optionally per group. Adds ``<col>_w`` clipped
    columns; bounds come from `percentile` (exact — matches DuckDB's
    quantile_cont), so results are engine-reproducible.

    Exact percentiles shuffle each group's column values once; for
    trillion-row groups swap `percentile` for `approx_percentile` and
    accept the sketch bound.
    """
    aggs = []
    for c in cols:
        aggs.append(F.percentile(F.col(c), F.lit(lower)).alias(f"__{c}_lo__"))
        aggs.append(F.percentile(F.col(c), F.lit(upper)).alias(f"__{c}_hi__"))
    out = _stats_join(df, keys, aggs)
    for c in cols:
        lo, hi = F.col(f"__{c}_lo__"), F.col(f"__{c}_hi__")
        out = out.withColumn(f"{c}_w", F.least(F.greatest(F.col(c), lo), hi))
    return out.drop(*[f"__{c}_{s}__" for c in cols for s in ("lo", "hi")])


def standardize(
    df: DataFrame,
    cols: Sequence[str],
    keys: Sequence[str] = (),
    ddof: int = 1,
) -> DataFrame:
    """z-score each column per group: (x - mean) / std. Adds ``<col>_z``
    columns; zero-variance groups yield NULL (explicitly, not ±inf).
    ``ddof=1`` uses the sample std (stddev_samp, the SQL default)."""
    fn = F.stddev_samp if ddof == 1 else F.stddev_pop
    aggs = []
    for c in cols:
        aggs.append(F.avg(c).alias(f"__{c}_mu__"))
        aggs.append(fn(c).alias(f"__{c}_sd__"))
    out = _stats_join(df, keys, aggs)
    for c in cols:
        mu, sd = F.col(f"__{c}_mu__"), F.col(f"__{c}_sd__")
        out = out.withColumn(
            f"{c}_z", F.when(sd > 0, (F.col(c) - mu) / sd).otherwise(F.lit(None))
        )
    return out.drop(*[f"__{c}_{s}__" for c in cols for s in ("mu", "sd")])
