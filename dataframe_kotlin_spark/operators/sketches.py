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


def hll_deterministic(
    df: DataFrame, keys: Sequence[str], col: str, p: int = 6, name: str = "hll_nd"
) -> DataFrame:
    """HyperLogLog with a fully deterministic, SQL-reproducible pipeline —
    the oracle-checkable member of the sketch family (native HLL++ and
    DataSketches use engine-private hashes, so their estimates can't be
    compared across engines; this one can, bit for bit).

    Construction (classic Flajolet HLL, raw estimator):
    - 20-bit md5-derived item hash (same `hash20` family the minhash /
      simhash oracles reproduce in ANSI SQL);
    - low ``p`` bits pick one of m=2^p registers, the remaining w=20-p
      bits yield rho = leading-zero-count + 1, computed with integer
      comparisons only (no float log2 — bit-exact on every engine);
    - register maxes aggregate per group (partial agg before one
      shuffle of ≤ m rows per group);
    - the harmonic sum uses INTEGER arithmetic scaled by 2^(w+1)
      (every 2^-M term becomes an exact integer), so the only floating
      operation is one final IEEE division — identical on all engines.

    Accuracy is the standard ~1.04/sqrt(m) (13% at p=6; raise p for
    precision). At 100 TB this is one fixed-size register set per group
    through the shuffle, the same story as approx_distinct above.
    """
    from dataframe_kotlin_spark.operators.dedup import hash20

    m = 2**p
    wv = 20 - p
    scale = wv + 1
    # classic HLL bias constants by register count (Flajolet et al. 2007)
    if m <= 16:
        alpha = 0.673
    elif m <= 32:
        alpha = 0.697
    elif m <= 64:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1 + 1.079 / m)
    alpha_num = alpha * m * m * (1 << scale)  # one Python double, inlined

    # NULLs don't count as a distinct value (count_distinct semantics);
    # unfiltered they'd hash to a phantom NULL register that inflates
    # the denominator's occupied-register count. count_distinct keeps a
    # group whose values are ALL null and reports 0, so after the
    # filtered aggregate we restore such groups via a left join from the
    # distinct group keys (estimate coalesced to 0.0) — callers joining
    # the estimates against a group list see every group.
    nn = df.filter(F.col(col).isNotNull())
    h = hash20(F.col(col).cast("string"))
    v = F.floor(h / m).cast("bigint")
    bitlen = None
    for j in range(wv):
        t = (v >= 2**j).cast("int")
        bitlen = t if bitlen is None else bitlen + t
    rho = F.lit(wv) - bitlen + 1  # v=0 -> wv+1
    regs = nn.select(*keys, (h % m).alias("__b__"), rho.alias("__rho__")).groupBy(
        *keys, "__b__"
    ).agg(F.max("__rho__").alias("M"))
    term = F.expr(f"cast(shiftleft(1, {scale} - M) as bigint)")
    denom = (F.lit(m) - F.count(F.lit(1))) * F.lit(1 << scale) + F.sum(term)
    est = regs.groupBy(*keys).agg(
        F.round(F.lit(alpha_num) / denom, 4).alias(name)
    )
    if not keys:
        return est
    groups = df.select(*keys).distinct()
    # null-safe key equality: a NULL-keyed group is still a group
    cond = None
    for k in keys:
        c = groups[k].eqNullSafe(est[k])
        cond = c if cond is None else cond & c
    # both sides are |groups| rows; leave the join pick to AQE (a forced
    # broadcast would be wrong for a high-cardinality key)
    return groups.join(est, cond, "left").select(
        *[groups[k] for k in keys],
        F.coalesce(est[name], F.lit(0.0)).alias(name),
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    capacity: int = 1000,
    min_share: float = 0.0,
    deterministic: bool = False,
) -> DataFrame:
    """Misra-Gries / Space-Saving heavy hitters over ``col``.

    Each partition builds a bounded summary of at most ``capacity``
    counters (mergeable-summaries batch form, Agarwal et al. 2013: add
    the batch's exact counts, then subtract the (capacity+1)-largest
    count and drop non-positives). Partition summaries are tiny —
    capacity rows each — so the merge groupBy shuffles KB per partition,
    never the raw column. Guarantees, with n = total rows:

    - every item with true frequency > n/capacity IS present (no false
      negatives above the error bound);
    - reported count_lower underestimates the true count by at most
      n/capacity.

    ``min_share`` filters the merged result to items whose LOWER bound
    exceeds that share of n, making the output robust to partitioning
    noise. ``deterministic=True`` first repartitions rows by item hash
    so each summary sees a fixed item subset (stable output for
    correctness gates; skip at 100 TB — the whole point of the sketch
    is map-side operation under whatever partitioning the scan gives).
    """
    import pandas as pd

    src = df.select(F.col(col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    if deterministic:
        src = src.repartition(8, "item")

    def summarize(batches):
        counts: dict[str, int] = {}
        for pdf in batches:
            vc = pdf["item"].value_counts()
            for item, c in vc.items():
                counts[item] = counts.get(item, 0) + int(c)
            if len(counts) > capacity:
                cut = sorted(counts.values(), reverse=True)[capacity]
                counts = {i: c - cut for i, c in counts.items() if c - cut > 0}
        yield pd.DataFrame(
            {"item": list(counts.keys()), "count_lower": list(counts.values())}
        )

    summaries = src.mapInPandas(summarize, "item string, count_lower long")
    merged = summaries.groupBy("item").agg(
        F.sum("count_lower").cast("bigint").alias("count_lower")
    )
    if min_share > 0:
        # Threshold against the summaries' own mass instead of a second
        # full scan: sum(count_lower) == n in the lossless regime and
        # undercounts n in the lossy one, so the threshold only gets more
        # permissive — the no-false-negative guarantee is preserved and
        # the extra job runs over capacity-sized summaries, not raw rows.
        merged = merged.cache()  # ≤ capacity·partitions rows — the total
        # and the filtered result must not re-run the sketch pass
        n = merged.agg(F.sum("count_lower")).collect()[0][0] or 0
        merged = merged.filter(F.col("count_lower") >= int(min_share * n))
    return merged


def cm_bucket(item, row: int, width: int):
    """Deterministic Count-Min bucket for hash row ``row``:
    ``int(md5("{row}:" + item)[:8], 16) % width``. The md5 recipe is the
    same cross-engine trick as ``dedup.hash20`` — DuckDB reproduces it as
    ``('0x'||substr(md5(row||':'||item),1,8))::BIGINT % width``, so sketch
    cells are bit-identical across engines."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{row}:"), item)), 1, 8), 16, 10
    ).cast("bigint")
    return F.pmod(h, F.lit(width))


def count_min_sketch(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 512,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch as a (d, bucket, cnt) cell table — ``depth`` hash
    rows × ``width`` buckets, each cell the (weighted) count of items
    hashing into it.

    Map-side shape: every input row explodes into ``depth`` probes and a
    single partial-aggregated groupBy produces at most depth×width rows —
    the shuffle carries the fixed-size sketch, never the item domain.
    Sketches are MERGEABLE: cells from different shards/days sum
    (``sketch_a.unionByName(sketch_b).groupBy(d, bucket).sum(cnt)``), the
    same rollup-reuse contract as ``hll_sketch``/``hll_merge``.

    Unlike the HLL estimators this sketch is deterministic and
    cross-engine reproducible (see ``cm_bucket``), so the driver's
    duckdb oracle hash-matches it exactly.

    Reference parity: the reference has no sketches (SURVEY §2.5 —
    "approx distinct absent"); this is a §7-P6 scale extension.
    """
    item = F.col(item_col).cast("string")
    probes = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"), cm_bucket(item, d, width).alias("bucket")
                )
                for d in range(depth)
            ]
        )
    )
    w = (F.col(weight_col) if weight_col else F.lit(1)).cast("bigint")
    return (
        df.select(probes.alias("p"), w.alias("__w__"))
        .groupBy(F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket"))
        .agg(F.sum("__w__").cast("bigint").alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 512,
    name: str = "cm_est",
) -> DataFrame:
    """Point-estimate counts for ``items`` from a ``count_min_sketch``
    cell table: min over the ``depth`` matching cells (the classic CM
    upper bound — never under-counts, over-counts only on collisions).

    The sketch side is at most depth×width rows, so the probe join is a
    broadcast; estimating any number of items never shuffles them.
    Items whose bucket is absent from the sketch get cnt=0 (they were
    never inserted)."""
    item = F.col(item_col).cast("string")
    probes = items.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), cm_bucket(item, d, width).alias("bucket")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("p"),
    ).select(item_col, "p.d", "p.bucket")
    joined = probes.join(F.broadcast(sketch), ["d", "bucket"], "left").na.fill(
        {"cnt": 0}
    )
    return joined.groupBy(item_col).agg(F.min("cnt").cast("bigint").alias(name))
