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


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Write a bucketed (hash-clustered) table: rows are hash-assigned to
    ``num_buckets`` files by ``bucket_cols``, optionally sorted inside
    each bucket.

    This is the precomputed half of a shuffle: two tables bucketed the
    same way join with ZERO Exchange — at 100 TB that turns the nightly
    fact⋈fact join from a full two-sided shuffle into a per-bucket merge
    read. Bucketing requires the table catalog (``saveAsTable``) because
    the bucket spec lives in table metadata, not the parquet files.
    Pick num_buckets so one bucket of the bigger table fits an executor
    (≈ table_size / desired_task_size), and bucket both tables with the
    SAME count — mismatched counts re-shuffle one side.
    """
    w = df.write.mode(mode).format(format).bucketBy(num_buckets, *list(bucket_cols))
    if sort_cols:
        w = w.sortBy(*list(sort_cols))
    w.saveAsTable(table)


def _spread_bits16(x):
    """Interleave-ready bit spread: 16 significant bits -> even positions
    of a 32-bit lane. Classic mask ladder, pure Column bit ops."""
    from pyspark.sql import functions as F

    x = x.bitwiseAND(F.lit(0xFFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
    return x


def morton_code(col_a, col_b, range_a, range_b, bits: int = 16):
    """Z-order curve value for two numeric columns, each linearly
    bucketized to ``bits`` bits over its [min, max] range. Pure Column
    expression — JVM-side, codegen-friendly. ``bits`` is capped at 16
    (the spread ladder's lane width): more would silently truncate high
    bucket bits and produce OUT-OF-ORDER codes."""
    from pyspark.sql import functions as F

    if not 1 <= bits <= 16:
        raise ValueError(f"morton_code supports 1..16 bits per dimension, got {bits}")

    def bucket(c, lo, hi):
        span = (hi - lo) or 1
        scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(float(span))
        return F.least(
            F.lit((1 << bits) - 1),
            F.greatest(F.lit(0), F.floor(scaled * ((1 << bits) - 1)).cast("long")),
        )

    a = _spread_bits16(bucket(col_a, *range_a))
    b = _spread_bits16(bucket(col_b, *range_b))
    return a.bitwiseOR(F.shiftleft(b, 1))


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write parquet laid out along the Z-order curve of (col_a, col_b).

    A single-column sort clusters one dimension and scatters the other
    across every file; the Morton interleave keeps BOTH dimensions
    locally clustered, so a 2-d box predicate overlaps only the few
    files whose per-file min/max envelope intersects the box — parquet
    footer stats (or a table format's file index) skip the rest. The
    column ranges are read in one tiny driver-side agg (two numbers per
    column, same pattern as IVF centroid training); at 100 TB use known
    domain bounds instead to keep the layout job single-pass.
    """
    from pyspark.sql import functions as F

    r = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).collect()[0]
    # an all-null dimension has no range: degrade it to a constant 0
    # bucket (layout falls back to clustering the other dimension)
    ra = (r[0], r[1]) if r[0] is not None else (0, 0)
    rb = (r[2], r[3]) if r[2] is not None else (0, 0)
    z = morton_code(F.col(col_a), F.col(col_b), ra, rb).alias("__z__")
    (
        df.withColumn("__z__", z)
        .repartitionByRange(num_files, "__z__")
        .sortWithinPartitions("__z__")
        .drop("__z__")
        .write.mode(mode)
        .parquet(path)
    )


def compact_files(
    spark,
    src_dir: str,
    dst_dir: str,
    target_mb: int = 128,
    mode: str = "overwrite",
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ~target_mb-sized files. Returns the output file count.

    The operational fix for the classic ingest pathology — thousands of
    KB-scale files from streaming/micro-batch sinks make every
    downstream scan pay per-file open + footer costs and starve the
    scheduler with tiny splits. Sizing reads ONLY filesystem metadata
    (sum of file lengths — no data scan), then one `coalesce` rewrite;
    coalesce (not repartition) avoids a shuffle: compaction is IO-bound
    by definition, so the rewrite is a straight read->write at scan
    speed. Run per partition directory in a hive-layout table to keep
    partition pruning intact.
    """
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(src_dir):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(src_dir)
    df.coalesce(n).write.mode(mode).parquet(dst_dir)
    out = spark.read.parquet(dst_dir)
    assert out.schema == df.schema
    import glob

    return len(glob.glob(os.path.join(dst_dir, "*.parquet")))
