"""Output-layout sinks: globally-sorted and partitioned parquet writes.

The reference writes single local files (io/csv.kt, io/json.kt), where
"sorted output" is trivial. Distributed, a global ORDER BY into one file
is the anti-pattern (serializes 100 TB through one task); the Spark-first
equivalent is range repartitioning — each output file covers a disjoint
key range, files are internally sorted, and the file sequence IS the
global order. Readers that need the total order stream files in name
order; readers that need a range hit only the files whose range overlaps
(parquet min/max footer stats prune the rest).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def write_sorted(
    df: DataFrame,
    path: str,
    by: Sequence[str],
    num_files: int | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Write ``df`` globally sorted by ``by`` across output files.

    repartitionByRange samples the sort keys to build balanced range
    boundaries (one pass, driver holds only the cut points), then each
    partition sorts locally — no single-partition bottleneck, and the
    per-file parquet min/max stats become non-overlapping, so a
    downstream range predicate prunes to exactly the files it needs.
    """
    cols = list(by)
    part = (
        df.repartitionByRange(num_files, *cols)
        if num_files
        else df.repartitionByRange(*cols)
    )
    part.sortWithinPartitions(*cols).write.mode(mode).format(format).save(path)


def write_hive_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Hive-style directory layout (``col=value/``): filters on the
    partition columns prune at the DIRECTORY level before any file is
    opened. ``max_records_per_file`` caps file size so a skewed partition
    value still splits across parallel read tasks."""
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.partitionBy(*list(partition_cols)).parquet(path)
