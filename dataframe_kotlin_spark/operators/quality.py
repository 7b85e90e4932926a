"""Data-quality profiling: one-pass column statistics as a long table.

The deequ-style audit a pipeline runs before training on a new corpus
drop: null fractions, cardinalities, ranges — per column, in a SINGLE
aggregate pass over the data (one job, no per-column scans), emitted as
one row per column so downstream checks are plain filters.

Reference parity: extends describe() (api/describe.kt:13-64) — same
metrics family, but shaped for machine consumption and computed without
driver-side collect of anything but the one stats row.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_NUMERIC_PREFIXES = (
    "int",
    "bigint",
    "smallint",
    "tinyint",
    "double",
    "float",
    "decimal",
)


def dq_profile(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Profile ``cols`` (default: all top-level columns) into a long
    frame: (col_name, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str). Numeric columns fill the ``*_num`` pair (as
    DOUBLE), everything else the ``*_str`` pair (as its string form);
    the unused pair is NULL.

    Cost model at scale: ONE whole-table aggregate — Spark fuses all
    per-column expressions into a single partial-aggregated pass — then
    a metadata-only reshape of the single result row into one row per
    column. n_distinct is exact (count_distinct fuses via Expand);
    switch to approx_count_distinct for trillion-row profiles.
    """
    from dataframe_kotlin_spark.operators.skew import ensure_scan_parallelism

    # r12: multi-column count_distinct plans an Expand (one row copy per
    # profiled column) feeding the partial aggregate — CPU ∝ rows*cols,
    # but Spark plans the stage's parallelism from scan BYTES, so a
    # single-row-group table serialized the whole profile onto one task
    # (measured 2.2 s warm at sf0.1, every stage 1 task). The guard
    # repartitions ONLY when the capped split estimate is below
    # cores/4 — a no-op at production file counts.
    df = ensure_scan_parallelism(df)
    cols = list(cols) if cols is not None else list(df.columns)
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n__")]
    numeric: dict[str, bool] = {}
    for c in cols:
        is_num = dtypes[c].startswith(_NUMERIC_PREFIXES)
        numeric[c] = is_num
        aggs.append((F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"{c}__nulls"))
        aggs.append(F.count_distinct(F.col(c)).cast("bigint").alias(f"{c}__nd"))
        if is_num:
            aggs.append(F.min(c).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__max"))
        else:
            aggs.append(F.min(F.col(c).cast("string")).alias(f"{c}__min"))
            aggs.append(F.max(F.col(c).cast("string")).alias(f"{c}__max"))
    stats = df.agg(*aggs)

    per_col = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n__").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__nd").alias("n_distinct"),
            (F.col(f"{c}__min") if numeric[c] else F.lit(None).cast("double")).alias("min_num"),
            (F.col(f"{c}__max") if numeric[c] else F.lit(None).cast("double")).alias("max_num"),
            (F.lit(None).cast("string") if numeric[c] else F.col(f"{c}__min")).alias("min_str"),
            (F.lit(None).cast("string") if numeric[c] else F.col(f"{c}__max")).alias("max_str"),
        )
        for c in cols
    ]
    return stats.select(F.explode(F.array(*per_col)).alias("s")).select("s.*")


def dq_check(
    profile: DataFrame,
    max_null_frac: float = 0.0,
    min_distinct: int = 1,
) -> DataFrame:
    """Turn a profile into violations: rows whose null fraction exceeds
    ``max_null_frac`` or whose cardinality is under ``min_distinct``.
    Empty result = corpus passes the gate."""
    return profile.filter(
        (F.col("n_nulls") > F.col("n_rows") * F.lit(max_null_frac))
        | (F.col("n_distinct") < F.lit(min_distinct))
    )


# Reserved fold label for NULL categories/slices: NUL-delimited so no
# legitimate string value can collide with it (a plain "__null__" literal
# in the data would otherwise merge with true NULL mass).
NULL_LABEL = "\x00__null__\x00"


def null_folded(col) -> "F.Column":
    """Cast to string and fold NULL into the reserved NULL_LABEL — the
    ONE recipe shared by batch drift (here) and streaming drift
    (stream_jobs.drift_stream), so batch and stream scores can never
    diverge on NULL handling."""
    return F.coalesce(col.cast("string"), F.lit(NULL_LABEL))


def distribution_drift(
    df: DataFrame,
    value_col: str,
    slice_col: str,
    ref_slice,
    alpha: float = 0.5,
) -> DataFrame:
    """Population Stability Index between each data slice and a reference
    slice over the categorical ``value_col`` distribution:
    ``PSI = Σ_v (p_v − q_v) · ln(p_v / q_v)`` with Laplace-``alpha``
    smoothing over the union of observed categories (so a category
    present in only one slice contributes a finite term). The standard
    ingest-monitoring gate: PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25
    shifted (public credit-scoring rule of thumb).

    One scan: counts aggregate per (slice, value) — at most
    |slices|·|categories| rows — the per-slice totals and the reference
    distribution derive from that aggregate and broadcast back. For
    continuous columns, bucket first (F.width_bucket / digitize) and
    pass the bucket as ``value_col``.

    NULL mass COUNTS on BOTH axes: a feed whose missing-value rate
    shifts is drifting, and a slice whose key went NULL must still get
    a PSI row — so value AND slice fold into the reserved NULL_LABEL
    (collision-proof: NUL-delimited) before the null-unsafe grid joins.
    The returned slice column is STRING (labels, not the original
    type), so a NULL slice has a printable identity.

    ``ref_slice`` addressing: pass the slice's VALUE (compared after the
    string fold). To use the NULL slice as the reference, pass
    ``quality.NULL_LABEL`` — `lit(None)` can never compare equal. A
    ``ref_slice`` matching no data is an error by construction (a typo'd
    label would otherwise read as "no drift"): ``psi_check`` raises on
    it; this lazy builder documents it and the returned frame is empty.

    Returns (slice, psi) for every non-reference slice.
    """
    counts = (
        df.groupBy(
            null_folded(F.col(slice_col)).alias("__s__"),
            null_folded(F.col(value_col)).alias("__v__"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("__n__"))
    )
    cats = counts.select("__v__").distinct()
    slices = counts.select("__s__").distinct()
    # dense (slice, category) grid so zero-count cells get the smoothing mass
    dense = (
        slices.crossJoin(F.broadcast(cats))
        .join(counts, ["__s__", "__v__"], "left")
        .fillna({"__n__": 0.0})
    )
    ncats = F.count(F.lit(1)).over(Window.partitionBy("__s__"))
    tot = F.sum("__n__").over(Window.partitionBy("__s__"))
    probs = dense.select(
        "__s__", "__v__",
        ((F.col("__n__") + alpha) / (tot + alpha * ncats)).alias("__p__"),
    )
    ref_label = F.lit(ref_slice).cast("string")
    ref = probs.filter(F.col("__s__") == ref_label).select(
        "__v__", F.col("__p__").alias("__q__")
    )
    return (
        probs.filter(F.col("__s__") != ref_label)
        .join(F.broadcast(ref), "__v__")
        .groupBy(F.col("__s__").alias(slice_col))
        .agg(
            F.sum(
                (F.col("__p__") - F.col("__q__")) * F.log(F.col("__p__") / F.col("__q__"))
            ).alias("psi")
        )
    )


def psi_check(
    df: DataFrame,
    value_col: str,
    slice_col: str,
    ref_slice,
    alpha: float = 0.5,
) -> DataFrame:
    """Validated, eager form of ``distribution_drift``: raises
    ``ValueError`` when ``ref_slice`` matches zero rows (typo'd label, or
    ``None`` passed instead of ``NULL_LABEL``) instead of returning a
    silently empty frame — "reference missing" must not read as "no
    drift". Costs one tiny probe job (limit-1 on the folded slice key,
    filter pushed to the scan) before handing back the same lazy plan.
    """
    ref_label = F.lit(ref_slice).cast("string")
    probe = (
        df.select(null_folded(F.col(slice_col)).alias("__s__"))
        .filter(F.col("__s__") == ref_label)
        .limit(1)
    )
    if not probe.take(1):
        raise ValueError(
            f"distribution_drift: reference slice {ref_slice!r} matches no "
            f"rows of {slice_col!r}. For the NULL slice pass quality."
            "NULL_LABEL (lit(None) never compares equal)."
        )
    return distribution_drift(df, value_col, slice_col, ref_slice, alpha)
