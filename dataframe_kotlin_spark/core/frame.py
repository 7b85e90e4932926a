"""KDataFrame — the engine's fluent frame API.

Mirrors the operator surface of the reference Kotlin DataFrame library
(SURVEY.md §2; reference cites in each docstring are `path:line` under
/root/reference/) while building *lazy* Spark plans. Every method returns
a new KDataFrame wrapping a transformed pyspark DataFrame; nothing
materializes until a sink/collect.

Design notes for scale (100 TB target):
- All row-wise ops are Column expressions (whole-stage codegen), never
  Python row closures.
- Order-dependent reference ops (distinct_by-keep-first, take, diff, ...)
  need an explicit order column: Spark frames are unordered bags. Methods
  take an ``order_by`` argument instead of relying on implicit insertion
  order; ``with_row_id`` can thread an explicit id through a pipeline.
- Join defaults mirror the reference (key = column-name intersection,
  right-side collisions suffixed ``_1``, null keys match null keys via
  ``eqNullSafe`` when ``null_safe=True``); reference: api/join.kt:56-64,
  144-162 and JoinTests.kt:46,59.
"""

from __future__ import annotations

import functools
from typing import Callable, Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_JOIN_TYPES = {
    "inner": "inner",
    "left": "left",
    "right": "right",
    "full": "full",
    "outer": "full",
    "semi": "left_semi",
    "anti": "left_anti",
    # Spark-canonical spellings accepted as pass-throughs (ADVICE r9:
    # a user handing us 'left_semi' or 'left_outer' should not be told
    # a legitimate Spark join type is invalid)
    "left_outer": "left",
    "right_outer": "right",
    "full_outer": "full",
    "left_semi": "left_semi",
    "left_anti": "left_anti",
}

_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def _cols(items: Iterable) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in items]


_SORT_SUFFIXES = (
    (" DESC NULLS FIRST", False, True),
    (" DESC NULLS LAST", False, False),
    (" ASC NULLS FIRST", True, True),
    (" ASC NULLS LAST", True, False),
    (" DESC", False, False),
    (" ASC", True, True),
)


def _leading_sort_key(order_by) -> tuple[Column | None, bool, bool]:
    """(bare value column, ascending, nulls_first) for the LEADING sort
    key of ``order_by``, or (None, ...) if the expression can't be
    recovered. Plain names and bare Columns are asc-nulls-first (Spark's
    default); direction-wrapped Columns (``.desc()`` etc.) are detected
    from the Column's canonical repr and the bare value expression is
    rebuilt via ``F.expr`` (SortOrder isn't introspectable from the
    Python API)."""
    lead = order_by[0]
    if isinstance(lead, str):
        return F.col(lead), True, True
    s = str(lead)
    if not (s.startswith("Column<'") and s.endswith("'>")):
        return None, True, True
    inner = s[len("Column<'") : -2]
    for suf, asc, nf in _SORT_SUFFIXES:
        if inner.endswith(suf):
            try:
                return F.expr(inner[: -len(suf)]), asc, nf
            except Exception:
                return None, True, True
    return lead, True, True  # bare Column, no sort wrapper


def _orderable_numeric(df: DataFrame, col: Column) -> Column | None:
    """Map ``col`` to a DOUBLE that is monotone (non-strict) w.r.t. its
    sort order, or None for types without a cheap monotone embedding.
    Strings are handled separately (``_string_order_embedding``) because
    their embedding needs the frame-wide common prefix stripped first."""
    try:
        dt = df.select(col).schema[0].dataType
    except Exception:
        return None
    if isinstance(dt, _NUMERIC_TYPES):
        return col.cast("double")
    if isinstance(dt, T.BooleanType):
        return col.cast("int").cast("double")
    if isinstance(dt, T.DateType):
        return col.cast("timestamp").cast("double")
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return col.cast("double")
    return None


def _is_string_col(df: DataFrame, col: Column) -> bool:
    try:
        return isinstance(df.select(col).schema[0].dataType, T.StringType)
    except Exception:
        return False


# string order-bucketing: _STR_POS UTF-8 byte positions starting at the
# frame-wide first point of divergence (min/max common prefix stripped),
# per-position min/max stats, 6 bytes per exact conv segment. CAP bounds
# the included-position radix product so every partial sum of the
# min-relative embedding stays an exact integer in DOUBLE:
# sum (b_i-mn_i)*W_i <= sum (r_i-1)*cmax/cum_i = cmax*(1-1/cum_P)
# < cmax <= 2^44 < 2^53 (telescoping; cum_i = prod r_1..r_i).
_STR_POS = 12
_STR_SEG = 6
_STR_CAP = float(2**44)


def _hex_lcp(c1: Column, c2: Column, cap: int = 96) -> Column:
    """Length of the common prefix of two HEX strings, floored to a
    byte (even) boundary — evaluated on the 1-row bounds frame only.
    O(cap^2) substring compares, once per frame."""
    seqs = F.sequence(F.lit(1), F.least(F.length(c1), F.length(c2), F.lit(cap)))
    eq = F.filter(seqs, lambda i: F.substring(c1, F.lit(1), i) == F.substring(c2, F.lit(1), i))
    lcp = F.coalesce(F.array_max(eq), F.lit(0))
    return lcp - F.pmod(lcp, F.lit(2))


def _utf8_segments(col: Column, off: Column) -> list[Column]:
    """``_STR_POS`` UTF-8 bytes of ``col`` starting ``off`` HEX CHARS in
    (the broadcast frame-wide divergence offset), as exact 6-byte
    segment values. Cost-shaped for the hot path: one hex per row plus
    one 48-bit-exact ``conv`` per segment — the naive per-position
    ``ascii(substring(...))`` costs ~2 us/row per position and dominated
    the positional ops' runtime at scale. Callers must materialize the
    returned expressions via select/withColumn so each conv evaluates
    once."""
    nseg = _STR_POS // _STR_SEG
    h = F.hex(F.encode(col, "UTF-8"))
    w = 2 * _STR_SEG
    return [
        F.conv(
            F.rpad(F.substring(h, off + F.lit(1 + w * j), F.lit(w)), w, "0"), 16, 10
        ).cast("double")
        for j in range(nseg)
    ]


def _seg_byte(seg: Column, p: int) -> Column:
    """Byte ``p`` (0-based within a segment) of an exact 6-byte segment
    value — floor/mod arithmetic, exact in DOUBLE."""
    return F.floor(seg / float(256 ** (_STR_SEG - 1 - p))) % 256


def _bounds_join(df: DataFrame, key: Column, one_row: DataFrame, bkey: Column) -> DataFrame:
    """Broadcast-join a 1-row bounds frame onto every row of ``df`` via
    a DATA-DERIVED constant key (``pmod(hash(attr), 1)`` = 0, never
    null, and not foldable — hash never returns null even for null
    input). An equi-key makes this a BroadcastHashJoin instead of
    crossJoin's BroadcastNestedLoopJoin, keeping downstream wide
    projections inside whole-stage codegen; a plain crossJoin measured
    ~7 us/row interpreted for the bucket expression."""
    jb = one_row.withColumn("__jk__", F.pmod(F.hash(bkey), F.lit(1)))
    return (
        df.withColumn("__jk__", F.pmod(F.hash(key), F.lit(1)))
        .join(F.broadcast(jb), "__jk__")
        .drop("__jk__")
    )


def _string_bounds(df: DataFrame, lead: Column, asc: bool) -> tuple[DataFrame, list[str]]:
    """1-row bounds frame for bucketing a STRING order key: the hex-char
    divergence offset ``__off__``, per-position place-value weights
    ``__w{i}__``, and the interpolation range ``__gmn__``/``__gmx__``.

    Two metadata-bounded passes:

    1. min/max STRING aggregate -> the frame-wide first point of
       divergence (every in-range string shares the min/max common
       prefix, a property of lexicographic order), floored to a UTF-8
       byte boundary;
    2. per-position byte min/max over the ``_STR_POS`` bytes STARTING at
       that offset; radix_i = mx_i - mn_i + 1.

    The embedding (``_string_order_nk``) is mixed-radix over those byte
    positions with the data-derived radixes. UTF-8 byte order equals
    codepoint order, so byte-wise lexicographic comparison IS Spark's
    string comparison (multibyte characters simply span positions). The
    lcp strip guarantees radix_1 >= 2, so "ORDER-00..."-style constant
    prefixes cost NO positions, and near-dense bands (digits: radix
    exactly 10) make the embedding space dense — min/max interpolation
    actually populates buckets (the round-4 two-codepoint embedding
    collapsed all common-prefix keys into one). Weights are standard
    place values W_i = cmax / cum_i (cum_i = prod r_1..r_i); positions
    are included most-significant-first while the radix product stays
    under ``_STR_CAP`` = 2^44. The per-row embedding is MIN-RELATIVE —
    sum (b_i - mn_i) * W_i (``_string_order_nk``) — which is what makes
    exactness provable: (b_i - mn_i) <= r_i - 1, so the sum telescopes
    to <= cmax * (1 - 1/cum_P) < 2^44 and EVERY partial sum is an exact
    DOUBLE integer (no rounding, hence no order inversions; radix-1
    positions contribute exactly 0). Beyond-cap / beyond-window
    positions contribute 0 — ties, exactly the non-strict contract. The
    interpolation range is exactly [0, sum (mx_i - mn_i) * W_i]: always
    containing the data, tight for positionally independent keys (ids,
    zero-padded numbers, date strings).

    Everything here is cost-shaped: both passes are plain aggregates
    over cheap projections, all weight algebra runs on the 1-row frame,
    and the per-row tagging needs only 2 conv segments + arithmetic
    (see ``_utf8_segments``)."""
    P = _STR_POS
    a = df.agg(F.min(lead).alias("__smn__"), F.max(lead).alias("__smx__"))
    a = a.select(
        _hex_lcp(
            F.hex(F.encode(F.col("__smn__"), "UTF-8")),
            F.hex(F.encode(F.col("__smx__"), "UTF-8")),
        ).alias("__off__")
    ).select(F.coalesce(F.col("__off__"), F.lit(0)).alias("__off__"))
    segs = _bounds_join(df, lead, a, F.col("__off__"))
    segs = segs.select(
        "__off__",
        *[
            s.alias(f"__seg{j}__")
            for j, s in enumerate(_utf8_segments(lead, F.col("__off__")))
        ],
    )
    bytes_ = segs.select(
        "__off__",
        *[
            _seg_byte(F.col(f"__seg{i // _STR_SEG}__"), i % _STR_SEG).alias(f"__b{i + 1}__")
            for i in range(P)
        ],
    )
    aggs = [F.min(F.col("__off__")).alias("__off__")]
    for i in range(1, P + 1):
        c = F.col(f"__b{i}__")
        aggs += [F.min(c).alias(f"__mn{i}__"), F.max(c).alias(f"__mx{i}__")]
    b = bytes_.agg(*aggs)
    b = b.select(
        F.coalesce(F.col("__off__"), F.lit(0)).alias("__off__"),
        *[F.coalesce(F.col(f"__mn{i}__"), F.lit(0)).alias(f"__mn{i}__") for i in range(1, P + 1)],
        *[F.coalesce(F.col(f"__mx{i}__"), F.lit(0)).alias(f"__mx{i}__") for i in range(1, P + 1)],
    )
    # weight algebra on the 1-row frame: cumulative radix products,
    # cap-gated inclusion, W_i = cmax / cum_i
    rad = [
        (F.col(f"__mx{i}__") - F.col(f"__mn{i}__") + F.lit(1)).cast("double")
        for i in range(1, P + 1)
    ]
    cums = []
    for i in range(P):
        cums.append(rad[i] if i == 0 else cums[-1] * rad[i])
    inc = [c <= F.lit(_STR_CAP) for c in cums]
    cmax = F.greatest(*[F.when(inc[i], cums[i]).otherwise(F.lit(1.0)) for i in range(P)])
    w = [F.when(inc[i], cmax / cums[i]).otherwise(F.lit(0.0)) for i in range(P)]
    b = b.select(
        "__off__",
        *[w[i].alias(f"__w{i + 1}__") for i in range(P)],
        *[F.col(f"__mn{i}__").cast("double").alias(f"__mn{i}__") for i in range(1, P + 1)],
        *[F.col(f"__mx{i}__").cast("double").alias(f"__mx{i}__") for i in range(1, P + 1)],
    )
    # embedding is min-relative ((b_i - mn_i) * W_i, see _string_order_nk),
    # so its range is exactly [0, sum (mx_i - mn_i) * W_i]
    hi = None
    for i in range(P):
        th = (F.col(f"__mx{i + 1}__") - F.col(f"__mn{i + 1}__")) * F.col(f"__w{i + 1}__")
        hi = th if hi is None else hi + th
    lo = F.lit(0.0)
    gmn = lo if asc else -hi
    gmx = hi if asc else -lo
    bounds = b.select(
        "__off__",
        *[f"__w{i}__" for i in range(1, P + 1)],
        *[f"__mn{i}__" for i in range(1, P + 1)],
        gmn.alias("__gmn__"),
        gmx.alias("__gmx__"),
    )
    extra = (
        ["__off__"]
        + [f"__w{i}__" for i in range(1, P + 1)]
        + [f"__mn{i}__" for i in range(1, P + 1)]
    )
    return bounds, extra


def _string_order_nk(asc: bool) -> Column:
    """Per-row mixed-radix embedding paired with ``_string_bounds``:
    sum over byte positions of (byte_i - __mn{i}__) * __w{i}__, with
    bytes unpacked arithmetically from the materialized ``__kseg{j}__``
    segment columns. Subtracting the per-position minimum is what makes
    the exactness proof go through: (b_i - mn_i) <= r_i - 1 and
    W_i = cmax / cum_i, so sum (r_i - 1) * cmax / cum_i telescopes to
    cmax * (1 - 1/cum_P) < cmax <= 2^44 — EVERY partial sum is an exact
    DOUBLE integer, so no rounding and no order inversions. (Without the
    subtraction, radix-1 positions — W_i up to cmax each — can push the
    sum past 2^53: radixes [2,1,1,1,1,1,245,...] reach ~1.03e16 and the
    partial sums round. With it, radix-1 positions contribute exactly 0
    since b_i == mn_i for every in-range row.) Monotone (non-strict)
    w.r.t. Spark string order: the first differing byte position
    dominates all lower place values."""
    emb = None
    for i in range(_STR_POS):
        b = _seg_byte(F.col(f"__kseg{i // _STR_SEG}__"), i % _STR_SEG)
        term = (b - F.col(f"__mn{i + 1}__")) * F.col(f"__w{i + 1}__")
        emb = term if emb is None else emb + term
    return emb if asc else -emb


def _global_row_number(
    df: DataFrame,
    order_by: Sequence,
    name: str = "__rn__",
    total_name: str | None = None,
    top_n: int | None = None,
    known_bounds: "tuple[float, float] | None" = None,
) -> DataFrame:
    """Distributed 1-based global row number under ``order_by`` — the
    scale-safe replacement for an unpartitioned ``row_number()`` window,
    which funnels the whole frame through ONE task (SURVEY §4.2-2; the
    round-3 verdict's last flagged single-task funnel).

    Recipe — VALUE-DERIVED order buckets, pure DataFrame API:

    1. embed the leading sort key into a double and bucket it by linear
       interpolation between the frame-wide min/max (one metadata-sized
       aggregate, broadcast back). Buckets are a deterministic function
       of the DATA, never of physical partition ids — so every
       recomputation of any subtree agrees, with no dependence on
       exchange reuse, AQE partition coalescing, or Spark's
       RDD-id-seeded range-bounds sampling (spark_partition_id-based
       two-pass schemes break under all three);
    2. per-bucket counts: a tiny aggregate (≤ min(4×shuffle.partitions,
       8192) rows); cumulative offsets + grand total via a triangular
       self-join over that bucket-count frame — metadata-sized, and NO
       window at all, so no unpartitioned-window plan node anywhere
       (Catalyst constant-folds a lit() partition spec away, so a
       "windowed cumsum over one partition" would still warn);
    3. broadcast-join offsets back on the bucket and add the
       bucket-local ``row_number`` (partitioned window) — ONE full
       shuffle of the frame, on the bucket key.

    NULL / NaN keys bucket to the ends per Spark sort semantics (nulls
    first/last as declared, NaN greatest). Ties never straddle buckets
    (equal keys share a bucket); within a bucket the full ``order_by``
    decides, so ties place arbitrarily-but-validly, exactly as with a
    global window. A heavily skewed leading key concentrates buckets
    (worst case — a constant key — degenerates to one task, which is
    the op's inherent semantics); keys without a monotone double
    embedding (structs, arrays, binary) fall back to a single bucket,
    i.e. the documented small-frame contract. String keys bucket via a
    mixed-radix codepoint embedding with data-derived per-position
    radix (``_string_bounds``): constant prefix positions get radix 1,
    so "ORDER-00..."-style keys keep full granularity on their varying
    characters instead of degenerating to one bucket.

    Determinism requirement: the input plan is evaluated more than once
    (bounds aggregate, bucket counts, final join). A non-deterministic
    source (rand(), monotonically_increasing_id, unstable sampling)
    could tag rows differently between passes and drop/duplicate rows
    at the bucket join — callers must pass a deterministic frame (every
    engine op that reaches here does; random ops in this repo are
    hash-seeded, not rand()-based).

    ``total_name``: additionally attach the frame-wide row count as a
    column — it rides the same offsets aggregate, so ops that need
    "total - k" (skip_last) stay fully lazy instead of hiding a
    ``count()`` action.

    ``top_n``: callers that immediately keep only ``name <= top_n``
    (rank-and-filter top-k — the similarity family's deterministic
    seeds) declare it here so the final full shuffle prunes FIRST: a
    row in a bucket whose cumulative offset is already >= top_n can
    never rank within top_n, so whole buckets drop before the exchange
    and only ~top_n rows (plus the straddling bucket's tail) move.
    Exact — bucket offsets count every row; the caller still applies
    its own ``<= top_n`` filter for the straddling bucket. At the
    100 TB posture this is the difference between shuffling the corpus
    and shuffling the model.

    ``known_bounds``: see ``_order_bucket_tagged`` — skips the
    frame-wide min/max pass when the leading key's domain is known by
    construction (hash keys).
    """
    cols = _cols(order_by)
    nparts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    # capped so the triangular offsets join stays metadata-sized
    nbuckets = min(nparts * 4, 8192)
    tagged = _order_bucket_tagged(df, order_by, nbuckets, known_bounds)
    counts = tagged.groupBy("__gbkt__").agg(F.count(F.lit(1)).alias("__gcnt__"))
    prior = counts.select(
        F.col("__gbkt__").alias("__gbkt2__"), F.col("__gcnt__").alias("__gcnt2__")
    )
    tot = counts.agg(F.sum("__gcnt__").alias("__gtot__"))
    offs = (
        counts.join(
            F.broadcast(prior), F.col("__gbkt2__") < F.col("__gbkt__"), "left"
        )
        .groupBy("__gbkt__")
        .agg(F.coalesce(F.sum("__gcnt2__"), F.lit(0)).alias("__goff__"))
        .crossJoin(F.broadcast(tot))
    )
    joined = tagged.join(F.broadcast(offs), "__gbkt__")
    if top_n is not None:
        joined = joined.filter(F.col("__goff__") < int(top_n))
    local = F.row_number().over(Window.partitionBy("__gbkt__").orderBy(*cols))
    out = joined.withColumn(name, (F.col("__goff__") + local).cast("long"))
    if total_name:
        out = out.withColumn(total_name, F.col("__gtot__"))
    return out.drop("__gbkt__", "__goff__", "__gtot__")


def _interp_bucket(nk: Column, nbuckets: int) -> Column:
    """Linear min/max interpolation of embedding ``nk`` into
    ``[0, nbuckets)`` against the broadcast ``__gmn__``/``__gmx__``
    bounds columns — the ONE clamp expression shared by the string and
    numeric key paths (a fix applied to one branch must reach both)."""
    step = F.when(
        F.col("__gmx__") > F.col("__gmn__"),
        (F.col("__gmx__") - F.col("__gmn__")) / nbuckets,
    ).otherwise(F.lit(1.0))
    return F.least(
        F.lit(nbuckets - 1),
        F.greatest(F.lit(0), F.floor((nk - F.col("__gmn__")) / step).cast("int")),
    )


#: the full signed-64-bit domain as the double embedding of an
#: ``xxhash64`` leading sort key — pass as ``known_bounds`` to
#: ``_global_row_number`` so hash-ordered rankings (the similarity
#: family's deterministic seeds) skip the frame-wide min/max scan:
#: a hash key's domain is fixed by construction, not by the data
XXHASH64_DOMAIN = (float(-(2**63)), float(2**63))


def _order_bucket_tagged(
    df: DataFrame,
    order_by: Sequence,
    nbuckets: int,
    known_bounds: "tuple[float, float] | None" = None,
) -> DataFrame:
    """Tag every row with its value-derived order bucket ``__gbkt__``
    (step 1 of ``_global_row_number``; split out so tests can assert
    bucket spread directly — e.g. that constant-prefix string keys
    populate more than one bucket).

    ``known_bounds`` (numeric keys only): the (lo, hi) domain of the
    RAW leading key's double embedding, when the caller knows it by
    construction (a hash key spans the full int64 domain regardless of
    the data). Skips the frame-wide min/max aggregate — one fewer pass
    over the input. Buckets from a declared domain may be emptier than
    data-derived ones (a clustered key concentrates), which costs
    balance, never correctness; for uniform hash keys the declared
    domain IS the balanced choice."""
    lead, asc, nulls_first = _leading_sort_key(order_by)
    nk = None
    bounds = None
    if known_bounds is not None and (
        lead is None or _is_string_col(df, lead) or _orderable_numeric(df, lead) is None
    ):
        # ADVICE r11: known_bounds is a NUMERIC-domain declaration; the
        # string branch interpolates UTF-8 segment embeddings and the
        # no-embedding fallback uses a single bucket — both ignore it.
        # Warn loudly so a caller doesn't assume the min/max scan was
        # skipped (correctness is unaffected either way).
        import warnings

        warnings.warn(
            "_global_row_number: known_bounds ignored — the leading sort "
            "key is not a numeric-embeddable column (string keys derive "
            "their own bounds; non-orderable keys use a single bucket)",
            stacklevel=3,
        )
    if lead is not None and _is_string_col(df, lead):
        bounds, bounds_extra = _string_bounds(df, lead, asc)
        # BroadcastHashJoin (codegen-friendly) onto the 1-row bounds;
        # materialize the conv segments as columns so each evaluates
        # ONCE per row (CollapseProject keeps non-cheap aliases used
        # more than once); the embedding never produces NaN, so the
        # numeric path's isnan branch is skipped entirely
        tagged = _bounds_join(df, lead, bounds, F.col("__off__"))
        seg_names = []
        for j, s in enumerate(_utf8_segments(lead, F.col("__off__"))):
            seg_names.append(f"__kseg{j}__")
            tagged = tagged.withColumn(seg_names[-1], s)
        bucket = F.when(
            F.isnull(lead), F.lit(-2 if nulls_first else nbuckets + 2)
        ).otherwise(_interp_bucket(_string_order_nk(asc), nbuckets))
        return tagged.withColumn("__gbkt__", bucket).drop(
            "__gmn__", "__gmx__", *bounds_extra, *seg_names
        )
    if lead is not None:
        nk = _orderable_numeric(df, lead)
        if nk is not None:
            if not asc:
                nk = -nk
            if known_bounds is not None:
                lo, hi = float(known_bounds[0]), float(known_bounds[1])
                if not asc:
                    lo, hi = -hi, -lo  # the embedding negated, so does its domain
                bucket = (
                    F.when(F.isnull(lead), F.lit(-2 if nulls_first else nbuckets + 2))
                    .when(F.isnan(nk), F.lit(nbuckets + 1 if asc else -1))
                    .otherwise(_interp_bucket(nk, nbuckets))
                )
                # literal bounds columns — no aggregate job, no join
                # (Catalyst constant-folds the interpolation arithmetic)
                return (
                    df.withColumn("__gmn__", F.lit(lo))
                    .withColumn("__gmx__", F.lit(hi))
                    .withColumn("__gbkt__", bucket)
                    .drop("__gmn__", "__gmx__")
                )
            # NaN is greatest under Spark ordering and would poison max();
            # NaN-keyed rows get their own end bucket, so bound on non-NaN
            nk_clean = F.when(~F.isnan(nk), nk)
            bounds = df.agg(
                F.min(nk_clean).alias("__gmn__"), F.max(nk_clean).alias("__gmx__")
            )
    if nk is None:
        return df.withColumn("__gbkt__", F.lit(0))
    bucket = (
        F.when(F.isnull(lead), F.lit(-2 if nulls_first else nbuckets + 2))
        .when(F.isnan(nk), F.lit(nbuckets + 1 if asc else -1))
        .otherwise(_interp_bucket(nk, nbuckets))
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("__gbkt__", bucket)
        .drop("__gmn__", "__gmx__")
    )


class KDataFrame:
    """Immutable frame wrapper; ``.df`` unwraps to the pyspark DataFrame."""

    def __init__(self, df: DataFrame):
        self.df = df

    # -- introspection ----------------------------------------------------
    @property
    def columns(self) -> list[str]:
        return self.df.columns

    @property
    def schema(self) -> T.StructType:
        return self.df.schema

    def ncol(self) -> int:
        return len(self.df.columns)

    def nrow(self) -> int:
        """Row count (an action). Reference: DataFrame.kt:101."""
        return self.df.count()

    def is_empty(self) -> bool:
        return self.df.isEmpty()

    def numeric_columns(self) -> list[str]:
        return [
            f.name for f in self.df.schema.fields if isinstance(f.dataType, _NUMERIC_TYPES)
        ]

    def explain(self, mode: str = "formatted") -> None:
        self.df.explain(mode)

    def _wrap(self, df: DataFrame) -> "KDataFrame":
        return KDataFrame(df)

    # -- projection / selection (SURVEY §2.2) -----------------------------
    def select(self, *cols) -> "KDataFrame":
        """Projection incl. nested paths. Reference: api/select.kt:8-15."""
        return self._wrap(self.df.select(*_cols(cols)))

    def filter(self, cond: Column) -> "KDataFrame":
        """Keep rows matching cond. Reference: api/filter.kt:8-12."""
        return self._wrap(self.df.filter(cond))

    def filter_expr(self, fn) -> "KDataFrame":
        """filter {rowClosure} via symbolic row capture -> native Column
        (SURVEY §2.10; core/rowexpr.py). `kdf.filter_expr(lambda r: r.age > 20)`."""
        from dataframe_kotlin_spark.core.rowexpr import capture

        return self._wrap(self.df.filter(capture(self.df, fn)))

    def add_expr(self, name: str, fn) -> "KDataFrame":
        """add(name) {rowClosure} via symbolic capture."""
        from dataframe_kotlin_spark.core.rowexpr import capture

        return self._wrap(self.df.withColumn(name, capture(self.df, fn)))

    def select_cols(self, selector) -> "KDataFrame":
        """Selector-DSL projection: selector is a fn(schema) -> [names]
        from core/columns.py (reference SelectReceiver.kt:27-173)."""
        names = selector(self.df.schema) if callable(selector) else list(selector)
        return self._wrap(self.df.select(*[F.col(n).alias(n.replace(".", "_")) if "." in n else F.col(n) for n in names]))

    def drop_rows(self, cond: Column) -> "KDataFrame":
        """Remove rows matching cond (null-safe: null predicate keeps the
        row, matching Kotlin's `!it` on a null-propagating predicate being
        treated as no-match). Reference: api/drop.kt:5."""
        return self._wrap(self.df.filter(~F.coalesce(cond, F.lit(False))))

    def drop_nulls(self, cols: Sequence[str] | None = None, where_all_null: bool = False) -> "KDataFrame":
        """Drop rows with null in any (or all) of cols.
        Reference: api/dropNulls.kt:9-21."""
        how = "all" if where_all_null else "any"
        return self._wrap(self.df.na.drop(how=how, subset=list(cols) if cols else None))

    def drop_na(self, cols: Sequence[str] | None = None) -> "KDataFrame":
        """Like drop_nulls but also treats Double.NaN as missing.
        Reference: api/dropNa.kt:8-18."""
        cols = list(cols) if cols else self.df.columns
        cond = F.lit(True)
        for name in cols:
            c = F.col(name)
            field = self.df.schema[name].dataType
            missing = c.isNull()
            if isinstance(field, (T.DoubleType, T.FloatType)):
                missing = missing | F.isnan(c)
            cond = cond & ~missing
        return self._wrap(self.df.filter(cond))

    def distinct(self, cols: Sequence[str] | None = None) -> "KDataFrame":
        """Dedup; with cols: project-then-dedup. Reference: api/distinct.kt:7-15."""
        df = self.df.select(*cols) if cols else self.df
        return self._wrap(df.distinct())

    def distinct_by(
        self, keys: Sequence[Column | str], order_by: Sequence[Column | str]
    ) -> "KDataFrame":
        """Keep the first row per key under an explicit order, full schema.

        Keys may be column names OR computed expressions — the reference's
        `distinctBy { col }` (api/distinctBy.kt:14-18) and
        `distinctByExpr { expr }` (api/distinctBy.kt:20-26) are the same
        call here: `distinct_by([F.col("x") % 10], order_by=["x"])`.
        Reference keeps first-in-insertion-order; Spark has no implicit
        row order, so the caller supplies the order. Implemented as a
        row_number window (single shuffle on the key expressions).
        """
        w = Window.partitionBy(*_cols(keys)).orderBy(*_cols(order_by))
        out = (
            self.df.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .drop("__rn__")
        )
        return self._wrap(out)

    def take_ordered(self, n: int, order_by: Sequence[Column | str]) -> "KDataFrame":
        """take(n) under an explicit order -> TakeOrderedAndProject.
        Reference positional take: DataFrame.kt:180."""
        return self._wrap(self.df.orderBy(*_cols(order_by)).limit(n))

    def shuffled(self, seed: int | None = None) -> "KDataFrame":
        """Random permutation. Reference: DataFrame.kt:186."""
        return self._wrap(self.df.orderBy(F.rand(seed) if seed is not None else F.rand()))

    def chunked(self, n: int, order_by: Sequence[Column | str]) -> "KDataFrame":
        """Assign a chunk id over n-row chunks under an explicit order.
        Reference materializes a FrameColumn of chunks (api/chunked.kt);
        relational form keeps a `chunk` key instead. Distributed via the
        two-pass global row number (no single-task window)."""
        out = _global_row_number(self.df, order_by, "__rn__")
        return self._wrap(
            out.withColumn("chunk", ((F.col("__rn__") - 1) / n).cast("long")).drop(
                "__rn__"
            )
        )

    def with_row_id(self, name: str = "row_id", order_by: Sequence[Column | str] | None = None) -> "KDataFrame":
        """Thread an explicit row id. With order_by: 0-based dense sequence
        (reference addRowNumber, Operations.kt:116-124); without: unique but
        non-dense (monotonically_increasing_id — scales without a global
        sort)."""
        if order_by is None:
            return self._wrap(self.df.withColumn(name, F.monotonically_increasing_id()))
        out = _global_row_number(self.df, order_by, name)
        return self._wrap(out.withColumn(name, F.col(name) - 1))

    # -- column update / add / remove (SURVEY §2.8, §2.9) -----------------
    def add(self, name: str, expr: Column) -> "KDataFrame":
        """Computed column. Reference: api/add.kt:33-79."""
        return self._wrap(self.df.withColumn(name, expr))

    def add_all(self, **exprs: Column) -> "KDataFrame":
        return self._wrap(self.df.withColumns(dict(exprs)))

    def remove(self, *cols: str) -> "KDataFrame":
        """Drop columns (nested via dotted path -> dropFields).
        A literal flat column whose NAME contains a dot drops as itself
        (same guard as update/rename — MoveTests cover dotted flat names).
        Reference: api/remove.kt:13-22."""
        flat = [c for c in cols if "." not in c or c in self.df.columns]
        out = self.df.drop(*flat) if flat else self.df
        for c in cols:
            if "." in c and c not in self.df.columns:
                top, rest = c.split(".", 1)
                out = out.withColumn(top, F.col(top).dropFields(rest))
        return self._wrap(out)

    def rename(self, mapping: dict[str, str]) -> "KDataFrame":
        """Rename in place, incl. nested fields via dotted source names
        ("g.a" -> new leaf name, tree shape kept). Reference:
        api/rename.kt:12-30; nested variants DataFrameTreeTests."""
        nested = {k: v for k, v in mapping.items() if "." in k and k not in self.df.columns}
        flat = {k: v for k, v in mapping.items() if k not in nested}
        out = self.df
        for src, new_name in nested.items():
            root, rest = src.split(".", 1)
            if "." in rest:
                raise ValueError("nested rename supports one level deep")
            renamed = F.struct(
                *[
                    F.col(f"{root}.{f.name}").alias(new_name if f.name == rest else f.name)
                    for f in out.schema[root].dataType.fields
                ]
            )
            out = out.withColumn(root, renamed)
        if flat:
            out = out.withColumnsRenamed(flat)
        return self._wrap(out)

    def update(self, col: str, where: Column | None = None, with_expr: Column | None = None) -> "KDataFrame":
        """Conditional cell rewrite: update(col).where(pred).with(expr).
        Reference: api/update.kt:13-123. Dotted names update NESTED struct
        fields in place via withField (DataFrameTreeTests' nested update)
        — withColumn alone would create a literal "a.b" top-level column."""
        target = F.col(col)
        expr = with_expr if with_expr is not None else F.lit(None)
        new = expr if where is None else F.when(where, expr).otherwise(target)
        if "." in col and col not in self.df.columns:
            root, rest = col.split(".", 1)
            return self._wrap(
                self.df.withColumn(root, F.col(root).withField(rest, new))
            )
        return self._wrap(self.df.withColumn(col, new))

    def fill_nulls(self, col: str, with_expr: Column) -> "KDataFrame":
        """Update where null. Reference: api/fillNulls.kt:8-12."""
        return self.update(col, where=F.col(col).isNull(), with_expr=with_expr)

    def null_to_zero(self, *cols: str) -> "KDataFrame":
        """Type-dispatched zero fill. Reference: api/nullToZero.kt:11-29."""
        return self._wrap(self.df.na.fill(0, subset=list(cols) or None))

    def convert(self, col: str, to: str | T.DataType) -> "KDataFrame":
        """Cast via the converter matrix. Reference: api/convert.kt:32-203."""
        return self._wrap(self.df.withColumn(col, F.col(col).cast(to)))

    def convert_epoch_millis(self, col: str, to: str = "timestamp") -> "KDataFrame":
        """Epoch-millis Long -> timestamp/date (api/convert.kt:166-203's
        toDate/toTime(zone) path; zone handling = the session time zone,
        UTC in this engine)."""
        ts = F.timestamp_millis(F.col(col).cast("long"))
        return self._wrap(
            self.df.withColumn(col, ts.cast("date") if to == "date" else ts.cast(to))
        )

    def update_at(
        self,
        col: str,
        indices: Sequence[int],
        with_expr: Column,
        order_by: Sequence[Column | str],
    ) -> "KDataFrame":
        """update(col).at(rowIndices).with{} (api/update.kt:46-60):
        positional targeting needs an explicit order (SURVEY §4.2-2);
        distributed two-pass row number, then the index set becomes an
        isin predicate."""
        out = _global_row_number(self.df, order_by, "__rn__")
        out = out.withColumn(
            col,
            F.when((F.col("__rn__") - 1).isin(list(indices)), with_expr).otherwise(
                F.col(col)
            ),
        ).drop("__rn__")
        return self._wrap(out)

    def update_not_null(self, col: str, with_expr: Column) -> "KDataFrame":
        """update(col).notNull{} — rewrite only non-null cells
        (api/update.kt:101-110)."""
        return self.update(col, where=F.col(col).isNotNull(), with_expr=with_expr)

    # -- sorting (SURVEY §2.7) --------------------------------------------
    def sort_by(self, *keys: Column | str) -> "KDataFrame":
        """Multi-key sort; pass col.asc_nulls_first()/desc() etc. for
        direction+null placement. Reference default is asc nulls-first
        (api/sort.kt:57-83): plain string keys become asc_nulls_first."""
        exprs = [F.col(k).asc_nulls_first() if isinstance(k, str) else k for k in keys]
        return self._wrap(self.df.orderBy(*exprs))

    def sort_by_desc(self, *keys: str) -> "KDataFrame":
        """All keys desc, nulls last (matches reference reversed comparator,
        api/sort.kt:42-50)."""
        return self._wrap(self.df.orderBy(*[F.col(k).desc_nulls_last() for k in keys]))

    def sort_with(self, cmp, limit: int | None = None) -> "KDataFrame":
        """sortWith(comparator) — reference api/sort.kt:35-40.

        An opaque pairwise comparator CANNOT distribute (no key to range-
        partition on; Spark would need the comparator JVM-side), so this
        is by contract a DRIVER-SIDE op for bounded frames: collect, sort
        with ``functools.cmp_to_key``, rebuild. ``limit`` (default:
        ``session.SORT_WITH_DRIVER_CAP``, documented with the session's
        driver-memory sizing) is a hard cap — the collect refuses beyond
        it rather than silently OOMing the driver; for large data
        express the ordering as computed sort keys (`add` + `sort_by`),
        which is the distributable form of every total order a
        comparator can encode. cmp(row_a, row_b) -> negative/zero/
        positive over pyspark Rows.
        """
        from functools import cmp_to_key

        from dataframe_kotlin_spark.session import SORT_WITH_DRIVER_CAP

        if limit is None:
            limit = SORT_WITH_DRIVER_CAP
        rows = self.df.limit(limit + 1).collect()
        if len(rows) > limit:
            raise ValueError(
                f"sort_with: frame exceeds the {limit}-row driver cap; "
                "express the order as computed sort keys instead"
            )
        ordered = sorted(rows, key=cmp_to_key(cmp))
        return self._wrap(
            self.df.sparkSession.createDataFrame(ordered, self.df.schema)
        )

    # -- joins (SURVEY §2.3) ----------------------------------------------
    def join(
        self,
        other: "KDataFrame | DataFrame",
        on: Sequence[str] | None = None,
        how: str = "inner",
        *,
        null_safe: bool = False,
        broadcast_right: bool = False,
        suffix: str = "_1",
    ) -> "KDataFrame":
        """All six reference join flavors through one entry point.

        - Default keys = column-name intersection (api/join.kt:56-64).
        - Right-side non-key collisions renamed with ``_1`` suffix
          (JoinTests.kt:46,59).
        - ``null_safe=True`` -> eqNullSafe (`<=>`): reference hash join
          matches null keys to null keys (api/join.kt:149-152).
        - ``broadcast_right`` force-broadcasts the build side for small
          dims (the planner's AQE can also decide this from stats).
        """
        right = other.df if isinstance(other, KDataFrame) else other
        if how == "cross":
            raise ValueError(
                "how='cross' is not a keyed join: use zip_frames for the "
                "reference's positional add(otherDf) concat, or "
                "df.crossJoin(...) on the raw frames if you really mean "
                "the cartesian product (it is quadratic — broadcast-gate "
                "or bound one side first)"
            )
        if how not in _JOIN_TYPES:
            raise ValueError(
                "how must be one of the join aliases "
                f"{', '.join(map(repr, sorted(_JOIN_TYPES)))} "
                "(Spark-canonical spellings like 'left_outer' are "
                f"accepted as pass-throughs); got {how!r}"
            )
        how = _JOIN_TYPES[how]
        if on is None:
            on = [c for c in self.df.columns if c in set(right.columns)]
            if not on:
                raise ValueError("no common columns to join on")
        on = list(on)

        keep_right_cols = how not in ("left_semi", "left_anti")
        if keep_right_cols:
            collisions = [c for c in right.columns if c in set(self.df.columns) and c not in on]
            right = right.withColumnsRenamed({c: c + suffix for c in collisions})
        if broadcast_right:
            right = F.broadcast(right)

        if null_safe:
            left_a, right_a = self.df.alias("__l__"), right.alias("__r__")
            cond = functools.reduce(
                lambda a, b: a & b,
                [F.col(f"__l__.{k}").eqNullSafe(F.col(f"__r__.{k}")) for k in on],
            )
            joined = left_a.join(right_a, cond, how)
            if keep_right_cols:
                # collapse duplicated key columns like the USING form does
                # (inner/left take every column from the left side; the
                # key coalescing below only matters for right/full)
                keep = [F.col(f"__l__.{c}") for c in self.df.columns]
                if how in ("right", "full"):
                    keep = [
                        F.coalesce(F.col(f"__l__.{c}"), F.col(f"__r__.{c}")).alias(c)
                        if c in on
                        else F.col(f"__l__.{c}")
                        for c in self.df.columns
                    ]
                keep += [F.col(f"__r__.{c}") for c in right.columns if c not in on]
                joined = joined.select(*keep)
            return self._wrap(joined)
        return self._wrap(self.df.join(right, on, how))

    def inner_join(self, other, on=None, **kw):
        return self.join(other, on, "inner", **kw)

    def left_join(self, other, on=None, **kw):
        return self.join(other, on, "left", **kw)

    def right_join(self, other, on=None, **kw):
        return self.join(other, on, "right", **kw)

    def outer_join(self, other, on=None, **kw):
        return self.join(other, on, "full", **kw)

    def filter_join(self, other, on=None, **kw):
        """Inner match, right columns dropped = left-semi.
        Reference: api/join.kt:86-89."""
        return self.join(other, on, "semi", **kw)

    def exclude_join(self, other, on=None, **kw):
        """Unmatched-left rows only = left-anti. Reference: api/join.kt:91-94."""
        return self.join(other, on, "anti", **kw)

    # -- set ops (SURVEY §2.4) --------------------------------------------
    def union(self, other: "KDataFrame | DataFrame") -> "KDataFrame":
        """Row concat by column name; missing columns null-filled; shared
        columns widened to a common type. Reference: api/union.kt:12-87."""
        right = other.df if isinstance(other, KDataFrame) else other
        left = self.df
        lfields = {f.name: f.dataType for f in left.schema.fields}
        rfields = {f.name: f.dataType for f in right.schema.fields}
        for name in set(lfields) & set(rfields):
            lt, rt = lfields[name], rfields[name]
            if lt != rt:
                common = _common_type(lt, rt)
                if lt != common:
                    left = left.withColumn(name, F.col(name).cast(common))
                if rt != common:
                    right = right.withColumn(name, F.col(name).cast(common))
        return self._wrap(left.unionByName(right, allowMissingColumns=True))

    def intersect_rows(self, other: "KDataFrame | DataFrame") -> "KDataFrame":
        right = other.df if isinstance(other, KDataFrame) else other
        return self._wrap(self.df.intersect(right))

    def except_rows(self, other: "KDataFrame | DataFrame") -> "KDataFrame":
        right = other.df if isinstance(other, KDataFrame) else other
        return self._wrap(self.df.exceptAll(right))

    def concat(self, *others: "KDataFrame") -> "KDataFrame":
        out = self
        for o in others:
            out = out.union(o)
        return out

    def merge_upsert(self, updates: "KDataFrame | DataFrame", keys: Sequence[str]) -> "KDataFrame":
        """Table-level upsert: update rows replace base rows with the same
        key; new keys insert (scale extension — the reference's `update`
        is cell-level; at table scale the idiom is MERGE INTO).

        updates UNION ALL (base ANTI-JOIN updates): one shuffle on the
        keys, no wide outer join, no per-column coalesce ambiguity (an
        update row wins wholesale, including its explicit nulls)."""
        up = updates if isinstance(updates, KDataFrame) else KDataFrame(updates)
        keep = self.exclude_join(up.select(*keys), on=list(keys))
        return up.union(keep)

    # -- grouping (SURVEY §2.5) -------------------------------------------
    def group_by(self, *keys: Column | str):
        from dataframe_kotlin_spark.core.grouped import KGroupedFrame

        return KGroupedFrame(self.df, _cols(keys))

    # -- reshape (SURVEY §2.6) --------------------------------------------
    def explode(self, *cols: str, outer: bool = False) -> "KDataFrame":
        """Unnest list cells vertically. Multi-column explode aligns lists
        positionally with null padding (reference api/explode.kt:23-108)
        via arrays_zip, which has exactly those semantics."""
        if len(cols) == 1:
            fn = F.explode_outer if outer else F.explode
            c = cols[0]
            others = [x for x in self.df.columns if x != c]
            return self._wrap(self.df.select(*others, fn(F.col(c)).alias(c)))
        zipped = F.arrays_zip(*[F.col(c) for c in cols])
        fn = F.explode_outer if outer else F.explode
        others = [x for x in self.df.columns if x not in cols]
        out = self.df.select(*others, fn(zipped).alias("__z__"))
        out = out.select(*others, *[F.col(f"__z__.{c}").alias(c) for c in cols])
        return self._wrap(out)

    def split_col(
        self,
        col: str,
        sep: str | None = None,
        into: Sequence[str] | None = None,
        inward: bool = False,
        trim: bool = False,
        generator: "Callable[[int], str] | None" = None,
        parts: Column | None = None,
        extend: bool = False,
    ) -> "KDataFrame":
        """String -> several columns. Reference: api/split.kt:11-114.

        With ``into=None`` and no ``generator`` our name generator kicks
        in: output width = max split count across the data
        ({col}_1..{col}_n). That width needs one extra aggregate job
        (max(size)) before the plan is built — explicit `into` avoids it.
        With ``extend=True`` (or a ``generator``), ``into`` may name
        FEWER columns than the data needs and the remainder is named by
        ``generator(i)`` (1-based index of the extra column), defaulting
        to the reference's "splitted{i}" (api/split.kt:60 nameGenerator;
        DataFrameTests.kt:1126-1139 splitStringColGenerateNames /
        WithDefaultgenerator). Extension needs the same width job, so a
        fully-explicit ``into`` keeps the single-pass plan.
        ``trim=True`` strips whitespace from each part (reference
        split.by(sep, trim=true), DataFrameTests.kt:1108 splitStringCol).
        ``parts`` replaces the separator split with an arbitrary
        array-typed Column (reference split.by{ fn(it) },
        DataFrameTests.kt:1142 splitAgeIntoDigits). ``inward=True``
        nests the result columns under the original name as a struct
        (reference split.inward())."""
        if parts is None:
            if sep is None:
                raise ValueError("split_col needs a separator or a parts expression")
            parts = F.split(F.col(col), sep)
        if trim:
            parts = F.transform(parts, lambda p: F.trim(p))
        if into is None or extend or generator is not None:
            explicit = list(into) if into is not None else []
            n = self.df.select(F.max(F.size(parts)).alias("n")).first()["n"] or 0
            if into is None and generator is None:
                into = [f"{col}_{i + 1}" for i in range(n)]
            else:
                gen = generator or (lambda i: f"splitted{i}")
                into = explicit + [gen(i + 1) for i in range(max(0, n - len(explicit)))]
        if inward:
            nested = F.struct(*[parts.getItem(i).alias(name) for i, name in enumerate(into)])
            return self._wrap(self.df.withColumn(col, nested))
        out = self.df
        for i, name in enumerate(into):
            out = out.withColumn(name, parts.getItem(i))
        return self._wrap(out.drop(col))

    def split_into_rows(self, col: str, sep: str) -> "KDataFrame":
        """Vertical split = explode(split). Reference: api/split.kt:116."""
        others = [x for x in self.df.columns if x != col]
        return self._wrap(self.df.select(*others, F.explode(F.split(F.col(col), sep)).alias(col)))

    def merge_cols(
        self,
        cols: Sequence[str],
        into: str,
        sep: str | None = None,
        combine=None,
    ) -> "KDataFrame":
        """N columns -> 1: array by default, joined string when ``sep``
        is given, or an arbitrary combination via ``combine`` — a
        callable receiving the list of source Columns and returning one
        Column (the reference's ``merge{sel}.by{transform}.into`` custom
        combiner, api/merge.kt:21 — e.g. DataFrameTests.kt:1181
        `merge cols with conversion` sums int columns). The merged
        column lands at the FIRST source column's position (reference
        into() moves under a path at that index); a pre-existing
        ``into`` column elsewhere keeps its own position.

        The sep path is Kotlin ``joinToString`` (api/merge.kt:18), which
        renders a null part as the literal "null" (DataFrameTests.kt:1089
        joinColsToString expects "20, Moscow, null") — so each part is
        coalesced before the concat instead of letting concat_ws silently
        drop it."""
        if combine is not None:
            expr = combine([F.col(c) for c in cols])
        elif sep is not None:
            expr = F.concat_ws(
                sep,
                *[F.coalesce(F.col(c).cast("string"), F.lit("null")) for c in cols],
            )
        else:
            expr = F.array(*_cols(cols))
        if into in self.df.columns and into not in cols:
            return self._wrap(
                self.df.withColumn(into, expr).drop(*[c for c in cols if c != into])
            )
        out, placed = [], False
        for c in self.df.columns:
            if c in cols:
                if not placed:
                    out.append(expr.alias(into))
                    placed = True
            else:
                out.append(F.col(c))
        return self._wrap(self.df.select(*out))

    def gather(
        self,
        value_cols: Sequence[str],
        key_name: str = "key",
        value_name: str = "value",
        drop_nulls: bool = True,
        where: Column | None = None,
        map_values: Callable[[Column], Column] | None = None,
        map_names: Callable[[Column], Column] | None = None,
    ) -> "KDataFrame":
        """Wide -> long unpivot with the reference's full clause set
        (api/gather.kt:13-117): `where` filters gathered values,
        `map_values` transforms them, `map_names` transforms the key
        (e.g. strip a prefix). Uses Spark's native melt (whole-stage
        codegen, no UDF); the clause callables receive/return Columns.

        List-valued (reference ``Many``) cells re-explode to one row per
        element (gather.kt:70-71 ``.explode(valuesColumn)``), with the
        clause applying per element — equivalent to explode-then-filter/
        map since every element row carries its cell's key. With
        ``drop_nulls=False`` empty/null lists keep a null-value row
        (explode_outer), mirroring the reference's non-filtering path."""
        ids = [c for c in self.df.columns if c not in value_cols]
        out = self.df.melt(ids=ids, values=list(value_cols), variableColumnName=key_name, valueColumnName=value_name)
        if isinstance(out.schema[value_name].dataType, T.ArrayType):
            ex = F.explode if drop_nulls else F.explode_outer
            out = out.withColumn(value_name, ex(F.col(value_name)))
        if drop_nulls:
            out = out.filter(F.col(value_name).isNotNull())
        if where is not None:
            out = out.filter(where)
        if map_values is not None:
            out = out.withColumn(value_name, map_values(F.col(value_name)))
        if map_names is not None:
            out = out.withColumn(key_name, map_names(F.col(key_name)))
        return self._wrap(out)

    def gather_groups(
        self,
        group_cols: Sequence[str],
        key_name: str = "key",
        drop_nulls: bool = True,
    ) -> "KDataFrame":
        """Gather STRUCT columns (reference ColumnGroup gather —
        api/gather.kt:104-108 ungroups the value column when the
        gathered columns are groups; GatherTests.gather): one row per
        (row × group), key = group name, and the value struct splices
        into one column per field. Fields union across the groups in
        first-appearance order; a group missing a field yields null
        (GatherTests: 'first' has only c1 -> c2/c3 null).

        Implemented as a stack of schema-normalized structs — pure
        expressions, codegen-friendly, no shuffle."""
        if not group_cols:
            raise ValueError("gather_groups: no columns given")
        schema = self.df.schema
        for c in group_cols:
            if not isinstance(schema[c].dataType, T.StructType):
                raise ValueError(f"gather_groups: {c!r} is not a struct column")
        fields: dict[str, T.DataType] = {}
        for c in group_cols:
            for f in schema[c].dataType.fields:
                fields.setdefault(f.name, f.dataType)
        ids = [c for c in self.df.columns if c not in group_cols]
        norm = []
        for c in group_cols:
            have = {f.name for f in schema[c].dataType.fields}
            norm.append(
                F.struct(
                    *[
                        (F.col(f"{c}.{n}") if n in have else F.lit(None).cast(dt)).alias(n)
                        for n, dt in fields.items()
                    ]
                ).alias("__gv__")
            )
        stacked = self.df.select(
            *ids,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("__gk__"),
                            F.col(c).isNotNull().alias("__nn__"),
                            nv,
                        )
                        for c, nv in zip(group_cols, norm)
                    ]
                )
            ).alias("__g__"),
        ).select(
            *ids,
            F.col("__g__.__gk__").alias(key_name),
            F.col("__g__.__nn__").alias("__nn__"),
            "__g__.__gv__",
        )
        if drop_nulls:
            # drop only rows whose source group CELL was null — carried
            # as per-group nullity, NOT inferred from the spliced fields
            # (a non-null struct whose fields all happen to be null is a
            # real row; the reference's dropNulls keeps it)
            stacked = stacked.filter(F.col("__nn__"))
        return self._wrap(stacked.select(*ids, key_name, "__gv__.*"))

    def gather_presence(
        self,
        bool_cols: Sequence[str],
        key_name: str = "key",
    ) -> "KDataFrame":
        """Boolean columns gather to presence: one output row per true
        cell, key = column name (api/gather.kt bool fast path)."""
        return self.gather(
            bool_cols, key_name=key_name, value_name="__v__", where=F.col("__v__")
        ).remove("__v__")

    def merge_rows(
        self, cols: Sequence[str], sort_lists: bool = True, drop_nulls: bool = True
    ) -> "KDataFrame":
        """Group by remaining columns, collapse selected cols to lists
        (inverse of explode). Reference: api/mergeRows.kt:13-33 with its
        dropNulls flag (DataFrameTests `merge rows keep nulls`).
        Lists are sorted for deterministic output (reference preserves
        insertion order, which Spark cannot reproduce distributedly).
        collect_list drops nulls natively; ``drop_nulls=False`` wraps
        values in a struct through the aggregate so nulls survive, then
        unwraps — same single shuffle."""
        others = [c for c in self.df.columns if c not in cols]
        aggs = []
        for c in cols:
            if drop_nulls:
                e = F.collect_list(c)
                if sort_lists:
                    e = F.sort_array(e)
            else:
                e = F.collect_list(F.struct(F.col(c).alias("v")))
                if sort_lists:
                    e = F.sort_array(e)
                e = F.transform(e, lambda s: s["v"])
            aggs.append(e.alias(c))
        return self._wrap(self.df.groupBy(*others).agg(*aggs))

    # -- column tree (SURVEY §2.9) ----------------------------------------
    def group_cols(self, cols: Sequence[str], into: str) -> "KDataFrame":
        """Nest columns under a struct, placed AT the first grouped
        column's position (reference group{}.into delegates to
        move().under — api/group.kt:16-18 — which inserts at the first
        removed column's index)."""
        out, placed = [], False
        for c in self.df.columns:
            if c in cols:
                if not placed:
                    out.append(F.struct(*_cols(cols)).alias(into))
                    placed = True
            else:
                out.append(F.col(c))
        return self._wrap(self.df.select(*out))

    def ungroup_col(self, col: str) -> "KDataFrame":
        """Splice struct fields up one level, in place of the group
        (reference api/ungroup.kt:11-15 replaces the group with its
        children at the same position)."""
        out = []
        for c in self.df.columns:
            if c == col:
                for f in self.df.schema[col].dataType.names:
                    out.append(F.col(f"{col}.{f}").alias(f))
            else:
                out.append(F.col(c))
        return self._wrap(self.df.select(*out))

    def flatten(
        self, sep: str = "_", cols: Sequence[str] | None = None
    ) -> "KDataFrame":
        """Flatten struct columns, joining path segments with ``sep`` —
        full reference semantics (api/flatten.kt:9-31; MoveTests
        `flatten one/several/all`):

        - ``cols=None`` flattens every top-level group; otherwise only
          the given dotted group paths (selective flatten), with paths
          whose ancestor is also selected folding into the ancestor
          (flatten.kt ``top()``);
        - flattened leaves take their root group's position, depth-first;
        - a leaf's name is its path FROM the root group joined with sep
          (``a.c.d`` under root ``a`` -> ``a_c_d``); a NESTED root keeps
          its leaves inside the root's parent struct, named relative to
          that parent (flatten.kt getRootPrefix/dropLast);
        - clashing names dedup with ``_k`` suffixes in encounter order,
          shared across all flattened leaves of the same namespace and
          pre-seeded with that namespace's NON-flattened output names
          (impl ColumnNameGenerator.addUnique starts from the existing
          columns) — a flattened leaf ``a_b`` next to an untouched plain
          column ``a_b`` becomes ``a_b_1``, never a duplicate name
          (duplicates break downstream selects in Spark).

        Pure projection — no shuffle, whole-stage codegen."""
        schema = self.df.schema
        if cols is None:
            rootset = {
                f.name
                for f in schema.fields
                if isinstance(f.dataType, T.StructType)
            }
        else:
            paths = list(cols)
            rootset = {
                p
                for p in paths
                if not any(q != p and p.startswith(q + ".") for q in paths)
            }

        def unique(name: str, used: set[str]) -> str:
            n, k = name, 1
            while n in used:
                n = f"{name}_{k}"
                k += 1
            used.add(n)
            return n

        def leaves(dtype: T.StructType, path: str, rel: str):
            out = []
            for f in dtype.fields:
                p, r = f"{path}.{f.name}", f"{rel}{sep}{f.name}"
                if isinstance(f.dataType, T.StructType):
                    out += leaves(f.dataType, p, r)
                else:
                    out.append((p, r))
            return out

        def expand(fields, path_prefix: str):
            def is_flat_root(f, p):
                return p in rootset and isinstance(f.dataType, T.StructType)

            # dedup namespace = this level's output: seed with every
            # name NOT produced by flattening, so leaves can't collide
            # with untouched siblings
            used = {
                f.name
                for f in fields
                if not is_flat_root(f, f"{path_prefix}.{f.name}" if path_prefix else f.name)
            }
            out = []
            for f in fields:
                p = f"{path_prefix}.{f.name}" if path_prefix else f.name
                if is_flat_root(f, p):
                    for lp, rel in leaves(f.dataType, p, f.name):
                        out.append(F.col(lp).alias(unique(rel, used)))
                elif isinstance(f.dataType, T.StructType) and any(
                    r.startswith(p + ".") for r in rootset
                ):
                    out.append(F.struct(*expand(f.dataType.fields, p)).alias(f.name))
                else:
                    out.append(F.col(p).alias(f.name))
            return out

        return self._wrap(self.df.select(*expand(schema.fields, "")))

    def move(self, *cols: str | Sequence[str]):
        """Full move clause over the column tree (api/move.kt:13-139):
        ``df.move("a.b", "c").into(fn)/under(path)/to_top()/to(i)/
        to_left()/to_right()/after(ref)``. Pure projection — compiles to
        one select with struct builders, zero exchanges."""
        from dataframe_kotlin_spark.core.move import KMoveClause

        return KMoveClause(self, cols)

    def move_to_front(self, *cols: str) -> "KDataFrame":
        """Column order = select-list order (reference api/move.kt is a
        metadata-only op; same here)."""
        rest = [c for c in self.df.columns if c not in cols]
        return self._wrap(self.df.select(*cols, *rest))

    def move_after(self, col: str, after: str) -> "KDataFrame":
        """Reposition col directly after another column
        (api/move.kt:13-139 `after`). Pure select-list metadata."""
        rest = [c for c in self.df.columns if c != col]
        i = rest.index(after) + 1
        return self._wrap(self.df.select(*rest[:i], col, *rest[i:]))

    def insert_col(self, name: str, expr: Column, at: int | None = None) -> "KDataFrame":
        """Computed column at an explicit position (api/insert.kt:14-38)."""
        cols = [F.col(c) for c in self.df.columns]
        pos = len(cols) if at is None else at
        return self._wrap(self.df.select(*cols[:pos], expr.alias(name), *cols[pos:]))

    def replace_col(self, name: str, expr: Column) -> "KDataFrame":
        """Swap a column for a computed replacement, keeping its position
        (api/replace.kt)."""
        return self._wrap(self.df.withColumn(name, expr))

    # -- positional slicing under explicit order (SURVEY §2.2) ------------
    # The reference slices by insertion order (DataFrame.kt:138-185); a
    # distributed engine has none, so every positional op takes the order.

    def head_rows(self, n: int, order_by: Sequence[Column | str]) -> "KDataFrame":
        """take/head: first n under the order (TakeOrderedAndProject)."""
        return self.take_ordered(n, order_by)

    def tail_rows(self, n: int, order_by: Sequence[Column | str]) -> "KDataFrame":
        """takeLast/tail: last n = top-n under the reversed order. Sorts
        only n rows globally (TakeOrdered), never the full frame.
        order_by entries are names or plain (ascending) Columns — the
        reversal negates each to desc."""
        rev = [(F.col(c) if isinstance(c, str) else c).desc() for c in order_by]
        return self._wrap(self.df.orderBy(*rev).limit(n))

    def drop_first(self, n: int, order_by: Sequence[Column | str]) -> "KDataFrame":
        """drop(n): everything after the first n (DataFrame.kt:181) —
        `offset` pushes into the exchange (Spark >= 3.4)."""
        return self._wrap(self.df.orderBy(*_cols(order_by)).offset(n))

    def skip_last(self, n: int, order_by: Sequence[Column | str]) -> "KDataFrame":
        """skipLast(n): all but the last n (DataFrame.kt:182). Fully lazy:
        the frame total rides the two-pass offsets aggregate as a column
        (no hidden count() action), and the row numbering is the
        distributed two-pass form — no single-task window."""
        out = _global_row_number(self.df, order_by, "__rn__", total_name="__tot__")
        return self._wrap(
            out.filter(F.col("__rn__") <= F.col("__tot__") - n).drop(
                "__rn__", "__tot__"
            )
        )

    def rows_at(self, indices: Sequence[int], order_by: Sequence[Column | str]) -> "KDataFrame":
        """df[i] / getRows: 0-based positional lookup under the order
        (distributed two-pass row number)."""
        out = _global_row_number(self.df, order_by, "__rn__")
        return self._wrap(
            out.filter((F.col("__rn__") - 1).isin(list(indices))).drop("__rn__")
        )

    def slice_rows(self, start: int, end: int, order_by: Sequence[Column | str]) -> "KDataFrame":
        """df[start..end) positional slice under the order (distributed
        two-pass row number)."""
        out = _global_row_number(self.df, order_by, "__rn__")
        return self._wrap(
            out.filter(
                (F.col("__rn__") - 1 >= start) & (F.col("__rn__") - 1 < end)
            ).drop("__rn__")
        )

    # -- row lookups / quantifiers (SURVEY §2.2 first/last/single/any/all) -
    def first_row(self, cond: Column | None = None):
        """first{pred}: one collected Row (DataFrame.kt:169-177). Plans as
        filter + limit(1) — no full scan materialized."""
        df = self.df.filter(cond) if cond is not None else self.df
        rows = df.limit(1).collect()
        return rows[0] if rows else None

    def single_row(self, cond: Column | None = None):
        """single{pred}: exactly one match or error (DataFrame.kt:178)."""
        df = self.df.filter(cond) if cond is not None else self.df
        rows = df.limit(2).collect()
        if len(rows) != 1:
            raise ValueError(f"expected exactly 1 row, found {'>1' if len(rows) > 1 else 0}")
        return rows[0]

    def any_rows(self, cond: Column) -> bool:
        """any{pred} (DataFrame.kt:190): existence via limit(1), not count."""
        return len(self.df.filter(cond).limit(1).collect()) > 0

    def all_rows(self, cond: Column) -> bool:
        """all{pred}: no counterexample exists."""
        return len(self.df.filter(~cond).limit(1).collect()) == 0

    def count_rows(self, cond: Column | None = None) -> int:
        """count{pred} (Math.kt:10-12 / DataFrameAggregations.kt:25)."""
        return (self.df.filter(cond) if cond is not None else self.df).count()

    def duplicate_row(self, cond: Column, n: int) -> "KDataFrame":
        """DataRow.duplicate(n) (api/duplicate.kt:9-19): replicate the
        first matching row n times. explode(array_repeat) — no driver
        round-trip, no crossJoin."""
        one = self.df.filter(cond).limit(1)
        return self._wrap(
            one.withColumn("__dup__", F.explode(F.array_repeat(F.lit(1), n))).drop("__dup__")
        )

    # -- frame-level reshape helpers (SURVEY §2.5 countBy, §2.6 transpose) -
    def ndistinct(self, col: str) -> int:
        """Distinct-value count of one column (columns.ndistinct,
        impl/columns/DataColumnImpl.kt:23; DataFrameTests `nunique`).
        Plans as a partial-agged distinct count, not a driver-side set."""
        return self.df.select(col).distinct().count()

    def count_by(self, *cols: str) -> "KDataFrame":
        """Per-value frequency (docs/reference.md:505)."""
        return self._wrap(self.df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n")))

    def transpose_row(self, order_by: Sequence[Column | str] | None = None) -> "KDataFrame":
        """transpose() of a single-row frame -> (name, value) pairs as
        strings (api/transpose.kt:3). Distributed stack — no collect."""
        names = self.df.columns
        args = []
        for c in names:
            lit = c.replace("\\", "\\\\").replace("'", "\\'")  # SQL literal escape
            args += [f"'{lit}'", f"CAST(`{c}` AS STRING)"]
        df = self.df if order_by is None else self.df.orderBy(*_cols(order_by))
        return self._wrap(
            df.limit(1).select(
                F.expr(f"stack({len(names)}, {', '.join(args)}) AS (name, value)")
            )
        )

    def zip_frames(
        self,
        other: "KDataFrame | DataFrame",
        order_by: Sequence[Column | str],
        other_order_by: Sequence[Column | str],
    ) -> "KDataFrame":
        """Positional column-concat of equal-length frames (api/add.kt:14-16
        `add(otherDf)`). Joins on explicit per-frame row numbers — the
        reference's implicit positional semantics need an order on an
        unordered engine (SURVEY §2.9 flag)."""
        right = other.df if isinstance(other, KDataFrame) else other
        left = _global_row_number(self.df, order_by, "__zip__")
        rgt = _global_row_number(right, other_order_by, "__zip__")
        return self._wrap(left.join(rgt, "__zip__", "inner").drop("__zip__"))

    # -- type re-inference (SURVEY §2.8 parse/guessType) ------------------
    def parse(
        self, cols: Sequence[str] | None = None, strict: bool = False
    ) -> "KDataFrame":
        """parse(): run the reference's string->type inference cascade over
        string columns (api/parse.kt:18-48) — distributed acceptance test
        per candidate type, then cast. Delegates to sources.csv.
        Frame-level parse is lenient (reference parse() maps tryParse per
        column, api/parse.kt:44-46); ``strict=True`` reproduces the
        COLUMN-level parse(), which throws when no parser matches
        (api/parse.kt:48, ParserTests `parse should throw`).
        Custom formats from sources.csv.add_datetime_format participate."""
        from dataframe_kotlin_spark.sources.csv import infer_column_types

        skip = (
            frozenset()
            if cols is None
            else frozenset(c for c in self.df.columns if c not in set(cols))
        )
        return self._wrap(infer_column_types(self.df, skip=skip, strict=strict))

    def try_parse(self, cols: Sequence[str] | None = None) -> "KDataFrame":
        """tryParse: like parse() but unparseable columns stay string
        (reference api/parse.kt tryParse; ParserTests custom-format test)."""
        return self.parse(cols, strict=False)

    def guess_type(self, col: str) -> "KDataFrame":
        """Re-infer one column from its values (Columns.kt:272)."""
        return self.try_parse([col])

    # -- stats / introspection (SURVEY §2.5, §2.8) ------------------------
    def describe(self, top_freq: bool = True) -> "KDataFrame":
        """Per-column count/nulls/unique/top/freq/min/max (+mean for
        numeric). Reference: api/describe.kt:13-64 (top = most frequent
        value, freq = its count). Two jobs when top_freq is on: one
        aggregate for the scalar stats + modes, one counting each mode's
        occurrences (the second touches only |columns| equality counts,
        still a full-scan-sized map + tiny reduce)."""
        rows = []
        numeric = set(self.numeric_columns())
        aggs = [F.count(F.lit(1)).alias("__n__")]
        for c in self.df.columns:
            aggs.append(F.count(c).alias(f"{c}__nn"))
            aggs.append(F.count_distinct(c).alias(f"{c}__nd"))
            aggs.append(F.min(c).cast("string").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("string").alias(f"{c}__max"))
            if top_freq:
                aggs.append(F.mode(c).cast("string").alias(f"{c}__top"))
            if c in numeric:
                aggs.append(F.avg(c).alias(f"{c}__mean"))
        r = self.df.agg(*aggs).collect()[0]
        freqs = {}
        if top_freq:
            fa = [
                F.sum(
                    F.when(F.col(c).cast("string") == F.lit(r[f"{c}__top"]), 1).otherwise(0)
                ).alias(c)
                for c in self.df.columns
                if r[f"{c}__top"] is not None
            ]
            if fa:
                freqs = self.df.agg(*fa).collect()[0].asDict()
        for c in self.df.columns:
            rows.append(
                (
                    c,
                    r["__n__"],
                    r["__n__"] - r[f"{c}__nn"],
                    r[f"{c}__nd"],
                    r[f"{c}__top"] if top_freq else None,
                    int(freqs[c]) if c in freqs else None,
                    r[f"{c}__min"],
                    r[f"{c}__max"],
                    float(r[f"{c}__mean"]) if c in numeric and r[f"{c}__mean"] is not None else None,
                )
            )
        spark = self.df.sparkSession
        schema = (
            "column string, count long, nulls long, unique long, "
            "top string, freq long, min string, max string, mean double"
        )
        return self._wrap(spark.createDataFrame(rows, schema))

    def corr_matrix(self) -> "KDataFrame":
        """Pairwise Pearson correlation of numeric columns in ONE aggregate
        pass (n² corr exprs, single job). Reference: api/corr.kt:6-30."""
        nums = self.numeric_columns()
        # index-keyed aliases: name-derived aliases collide for column
        # names containing the separator (e.g. "a" + "a__a")
        aggs = [
            F.corr(F.col(a).cast("double"), F.col(b).cast("double")).alias(f"__c{i}_{j}__")
            for i, a in enumerate(nums)
            for j, b in enumerate(nums)
        ]
        r = self.df.agg(*aggs).collect()[0]
        rows = [
            tuple([a] + [r[f"__c{i}_{j}__"] for j in range(len(nums))])
            for i, a in enumerate(nums)
        ]
        schema = T.StructType(
            [T.StructField("column", T.StringType())]
            + [T.StructField(b, T.DoubleType()) for b in nums]
        )
        return self._wrap(self.df.sparkSession.createDataFrame(rows, schema))

    # -- order analytics (SURVEY §2.7) ------------------------------------
    def diff(self, col: str, order_by: Sequence[Column | str], partition_by: Sequence[str] = ()) -> "KDataFrame":
        """value - previous value, 0 for first row. Reference: api/row/diff.kt:3-8."""
        w = Window.partitionBy(*_cols(partition_by)).orderBy(*_cols(order_by))
        d = F.col(col) - F.lag(col, 1).over(w)
        return self._wrap(self.df.withColumn(f"{col}_diff", F.coalesce(d, F.lit(0))))

    def moving_average(self, col: str, k: int, order_by: Sequence[Column | str], partition_by: Sequence[str] = ()) -> "KDataFrame":
        """Mean of current + previous k-1 values, partial windows allowed.
        Reference: api/row/movingAverage.kt:3-9."""
        w = (
            Window.partitionBy(*_cols(partition_by))
            .orderBy(*_cols(order_by))
            .rowsBetween(-(k - 1), 0)
        )
        return self._wrap(self.df.withColumn(f"{col}_ma{k}", F.avg(col).over(w)))

    def neighbours(
        self,
        col: str,
        rel: Sequence[int],
        order_by: Sequence[Column | str],
        partition_by: Sequence[str] = (),
        out_col: str | None = None,
    ) -> "KDataFrame":
        """Relative-index row set (reference DataRow.neighbours(-1..1),
        DataRow.kt:40): the values of ``col`` at the given row offsets,
        as an array in offset order. Offsets outside the partition yield
        null. One window pass — each offset is a lag/lead over the SAME
        (partition, order) spec, so Catalyst plans a single Sort+Window."""
        w = Window.partitionBy(*_cols(partition_by)).orderBy(*_cols(order_by))

        def at(off: int) -> Column:
            if off == 0:
                return F.col(col)
            return (F.lag(col, -off) if off < 0 else F.lead(col, off)).over(w)

        name = out_col or f"{col}_neighbours"
        return self._wrap(self.df.withColumn(name, F.array(*[at(o) for o in rel])))

    def add_scan(
        self,
        name: str,
        col: Column | str,
        op: str,
        order_by: Sequence[Column | str],
        partition_by: Sequence[str] = (),
    ) -> "KDataFrame":
        """Self-referencing add (reference AddDataRow.added(), api/add.kt:
        33-79: a row expression reading the just-computed values of earlier
        rows). Sequential recurrences don't distribute in general, but
        every associative form does — as a running aggregate over a window.
        ``op``: sum | product | min | max | concat | last_non_null.
        These cover the reference tests' uses of added() (running totals /
        carry-forward). A non-associative recurrence would serialize 100 TB
        through one task; raising here is the designed behavior.
        """
        w = (
            Window.partitionBy(*_cols(partition_by))
            .orderBy(*_cols(order_by))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        c = F.col(col) if isinstance(col, str) else col
        if op == "sum":
            expr = F.sum(c).over(w)
        elif op == "product":
            # exp(sum(log)) breaks on zeros/negatives; use sign+abs split
            sign = F.when(
                F.sum(F.when(c < 0, 1).otherwise(0)).over(w) % 2 == 1, -1
            ).otherwise(1)
            any_zero = F.max(F.when(c == 0, 1).otherwise(0)).over(w) == 1
            mag = F.exp(F.sum(F.log(F.abs(F.nullif(c, F.lit(0))))).over(w))
            expr = F.when(any_zero, F.lit(0.0)).otherwise(sign * mag)
        elif op == "min":
            expr = F.min(c).over(w)
        elif op == "max":
            expr = F.max(c).over(w)
        elif op == "concat":
            expr = F.array_join(F.collect_list(c).over(w), "")
        elif op == "last_non_null":
            expr = F.last(c, ignorenulls=True).over(w)
        else:
            raise ValueError(
                f"non-associative scan op {op!r} does not distribute; "
                "use sum/product/min/max/concat/last_non_null"
            )
        return self._wrap(self.df.withColumn(name, expr))

    def format(self, *cols: str):
        """Fluent conditional styling: ``df.format("a").where(pred)
        .with_(lambda dsl, v: dsl.bold)`` -> FormattedFrame.to_html()
        (reference api/format.kt:111-138)."""
        from dataframe_kotlin_spark.sources.formatting import format_frame

        return format_frame(self.df, *cols)

    # -- sinks ------------------------------------------------------------
    def to_pandas(self):
        return self.df.toPandas()

    def collect(self):
        return self.df.collect()

    def write_parquet(self, path: str, mode: str = "overwrite", partition_by: Sequence[str] = ()) -> None:
        w = self.df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    def write_csv(self, path: str, mode: str = "overwrite", **kw) -> None:
        """Reference: io/csv.kt:283-295. Extra kwargs forward to
        sources.csv.write_csv (quote/escape/quoteAll/nullValue/...)."""
        from dataframe_kotlin_spark.sources.csv import write_csv as _w

        _w(self.df, path, mode=mode, **kw)

    def write_sorted(self, path: str, by: Sequence[str], **kw) -> None:
        """Globally-sorted parquet via range repartitioning
        (sources.layout.write_sorted) — no single-partition sort."""
        from dataframe_kotlin_spark.sources.layout import write_sorted as _w

        _w(self.df, path, by, **kw)

    def write_zordered(self, path: str, col_a: str, col_b: str, **kw) -> None:
        """Morton-curve layout for 2-d file skipping
        (sources.layout.write_zordered)."""
        from dataframe_kotlin_spark.sources.layout import write_zordered as _w

        _w(self.df, path, col_a, col_b, **kw)

    def cache(self) -> "KDataFrame":
        return self._wrap(self.df.cache())


_TYPE_WIDTH = {
    T.ByteType: 0,
    T.ShortType: 1,
    T.IntegerType: 2,
    T.LongType: 3,
    T.FloatType: 4,
    T.DoubleType: 5,
}


def _common_type(a: T.DataType, b: T.DataType) -> T.DataType:
    """Least-common Spark type for union widening (SURVEY §2.4): numeric
    ladder, else string fallback (reference baseType, api/union.kt:38-71)."""
    if a == b:
        return a
    wa, wb = _TYPE_WIDTH.get(type(a)), _TYPE_WIDTH.get(type(b))
    if wa is not None and wb is not None:
        wide = a if wa >= wb else b
        # int+float mixes widen to double to avoid precision loss
        if {type(a), type(b)} & {T.FloatType, T.DoubleType} and isinstance(wide, T.FloatType):
            return T.DoubleType()
        return wide
    if isinstance(a, T.DecimalType) and isinstance(b, T.DecimalType):
        # two decimals: keep exactness — cover both scales and both
        # integer-digit widths, capped at Spark's 38-digit maximum
        scale = max(a.scale, b.scale)
        intd = max(a.precision - a.scale, b.precision - b.scale)
        return T.DecimalType(min(intd + scale, 38), scale)
    if isinstance(a, T.DecimalType) or isinstance(b, T.DecimalType):
        if wa is not None or wb is not None:
            return T.DecimalType(38, 18)
    return T.StringType()
