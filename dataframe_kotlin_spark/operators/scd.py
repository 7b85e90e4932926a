"""Slowly-changing-dimension (type 2) operators.

A 100 TB pipeline's dimension tables need history, not overwrite:
SCD2 keeps every version of a key's attributes with a validity range
(valid_from, valid_to-null-means-open). Two entry points:

- `scd2_from_history`: full rebuild from an attribute-change log — one
  window (lead over the key's time order), one shuffle on the keys.
- `scd2_merge`: incremental batch apply — closed versions pass through
  untouched (at scale: partition the table on is_current so this is a
  metadata-only read), and only open rows + the update batch are
  re-windowed. Equivalent to the full rebuild by construction (the
  rebuild of open+updates IS scd2_from_history), which the tests assert.

Complements merge_upsert (core KDataFrame), which is SCD type 1
(overwrite, no history). reference: no counterpart (SURVEY §2.4 covers
only bag union); this is a P6 warehouse extension.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_history(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Change log (key, ts, attrs) -> SCD2 rows: each version valid from
    its own timestamp until the key's next change (null = still open).

    Consecutive duplicate versions (same attrs as the previous row) are
    collapsed first — a change log often re-states unchanged values, and
    keeping them would split one validity range into many. If ts is not
    unique per key, pass tie_cols to pin the version order
    deterministically (an ambiguous order would make valid_to ranges
    run-dependent).
    """
    order = [F.col(ts_col), *[F.col(c) for c in tie_cols]]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev_same = F.lit(True)
    for c in attr_cols:
        prev_same = prev_same & (F.lag(c).over(w).eqNullSafe(F.col(c)))
    dedup = (
        df.withColumn("__same__", F.coalesce(prev_same & (F.lag(ts_col).over(w).isNotNull()), F.lit(False)))
        .filter(~F.col("__same__"))
        .drop("__same__")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return dedup.select(
        *keys,
        *attr_cols,
        F.col(ts_col).alias(valid_from),
        F.lead(ts_col).over(w2).alias(valid_to),
    ).withColumn(current_flag, F.col(valid_to).isNull())


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Apply an update batch (key, ts, attrs) to an SCD2 table: open rows
    whose key received updates are closed at the first update's ts; new
    versions are appended; the latest becomes the open row.

    On-time updates (ts >= the key's open valid_from, or a new key)
    rewrite only the open slice — closed rows pass through untouched.
    LATE updates (ts inside a key's already-closed history) cannot be
    spliced without touching closed ranges, so those keys — and only
    those keys — take a full per-key rebuild from their version history;
    the non-overlap invariant holds for every key either way (tests
    assert merge == full rebuild, late data included)."""
    open_from = current.filter(F.col(valid_to).isNull()).select(
        *keys, F.col(valid_from).alias("__open_from__")
    )
    # FRESH column names for the late-key set: it derives from BOTH input
    # frames, so a name-based (USING) join back against either one is an
    # ambiguous self-join that Spark can resolve to the wrong attribute
    # (observed: per-occurrence inconsistent semi/anti results). Aliased
    # keys + explicit conditions are unambiguous.
    late_keys = (
        updates.join(open_from, list(keys))
        .filter(F.col(ts_col) < F.col("__open_from__"))
        .select(*[F.col(k).alias(f"__lk_{k}__") for k in keys])
        .distinct()
    )
    # LINEAGE BARRIER: late_keys embeds attribute ids from BOTH inputs;
    # joining it back against them is a self-referential plan that Spark
    # can mis-resolve per occurrence (observed: the same semi/anti join
    # evaluating inconsistently inside the composed plan). The RDD
    # round-trip assigns fresh ids — late_keys is |late keys|-sized, so
    # the extra evaluation is negligible.
    late_keys = updates.sparkSession.createDataFrame(late_keys.rdd, late_keys.schema)

    def _against_late(df: DataFrame, how: str) -> DataFrame:
        cond = None
        for k in keys:
            e = df[k] == F.col(f"__lk_{k}__")
            cond = e if cond is None else cond & e
        return df.join(late_keys, cond, how)

    # fast path: keys with only on-time updates
    cur_fast = _against_late(current, "left_anti")
    upd_fast = _against_late(updates, "left_anti")
    closed = cur_fast.filter(F.col(valid_to).isNotNull()).drop(current_flag)
    open_hist = cur_fast.filter(F.col(valid_to).isNull()).select(
        *keys, F.col(valid_from).alias(ts_col), *attr_cols
    )
    hist = open_hist.unionByName(upd_fast.select(*keys, ts_col, *attr_cols))
    rebuilt = scd2_from_history(
        hist, keys, ts_col, attr_cols, valid_from, valid_to, current_flag, tie_cols
    ).drop(current_flag)
    out = closed.unionByName(rebuilt)

    # slow path: late-update keys rebuild from their FULL version history
    cur_late = _against_late(current, "semi")
    upd_late = _against_late(updates, "semi")
    late_hist = cur_late.select(
        *keys, F.col(valid_from).alias(ts_col), *attr_cols
    ).unionByName(upd_late.select(*keys, ts_col, *attr_cols))
    late_rebuilt = scd2_from_history(
        late_hist, keys, ts_col, attr_cols, valid_from, valid_to, current_flag, tie_cols
    ).drop(current_flag)

    return out.unionByName(late_rebuilt).withColumn(
        current_flag, F.col(valid_to).isNull()
    )
