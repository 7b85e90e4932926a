"""Math / binning helpers (SURVEY §2.8).

All pure Column expressions — JVM-side, codegen-friendly, no UDFs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def digitize(col: Column, bins: Sequence[float], right: bool = False) -> Column:
    """Value -> bin index over sorted bin edges.

    Reference: api/digitize.kt:17-28 (linear scan per value). Here a chained
    ``when`` expression, which whole-stage codegen compiles to a branch
    ladder; for large bin lists this is O(bins) per row but stays JVM-side.
    right=False: bins[i-1] <= x < bins[i] (bin 0 = below first edge).
    NULL input stays NULL (a missing measurement is not "above every
    edge"); empty bins return 0 for every value (numpy.digitize parity).
    """
    if not bins:
        return F.when(col.isNull(), None).otherwise(F.lit(0))
    expr = F.when(col.isNull(), None)
    for i, edge in enumerate(bins):
        cond = (col <= edge) if right else (col < edge)
        expr = expr.when(cond, i)
    return expr.otherwise(len(bins))


def between(col: Column, left, right, include_boundaries: bool = True) -> Column:
    """Reference: Math.kt:10-12 / api/between.kt (inclusive by default)."""
    if include_boundaries:
        return col.between(left, right)
    return (col > left) & (col < right)
