"""Deduplication operators for large-scale training-data pipelines
(SURVEY §7 P6): exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design:
- Exact dedup = fingerprint + groupBy: one shuffle on a 128-bit key.
- MinHash signatures are computed per-row with pure array expressions
  (transform/array_min over the shingle set) — a map-only stage, NO
  shuffle, no UDF. At 100 TB this fuses into the parquet scan.
- LSH banding shuffles once on (band_id, band_hash) — candidate pairs
  come from within-bucket joins, never an all-pairs cross join.
- SimHash: per-row bit aggregation, map-only; near-dup = hamming
  distance on 64-bit ints (XOR + bit_count), cheap to band as well.

Hash function: h(s) = first 5 hex chars of md5(s) as int (20 bits),
then universal-hash family (a_k*h + b_k) mod P, P = 1048583 (prime >
2^20). a_k*h < 2^41 so everything stays in int64 — deliberately chosen
so the DuckDB oracle can reproduce it bit-for-bit.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dataframe_kotlin_spark.functions.text import normalize, tokens, word_shingles
from dataframe_kotlin_spark.operators.cachereg import PREFIX_BASE

MINHASH_P = 1048583  # smallest prime > 2^20


def hash20(col: Column) -> Column:
    """Deterministic 20-bit string hash reproducible in ANSI SQL:
    int(md5(s)[0:5], 16)."""
    return F.conv(F.substring(F.md5(col), 1, 5), 16, 10).cast("bigint")


def hash64(col: Column) -> Column:
    """Deterministic 64-bit string hash: the first 16 hex chars of md5,
    as a SIGNED bigint whose BIT PATTERN equals the unsigned value (so
    DuckDB replays it as `('0x'||substr(md5(s),1,16))::UBIGINT` — the
    two engines agree bit-for-bit under xor/popcount even though the
    decimal renderings differ). Built as (high nibble << 60) | low 60
    bits because neither engine can cast 16 hex chars straight into a
    SIGNED 64-bit lane: Spark's conv returns the unsigned decimal
    string (overflows the bigint cast), DuckDB overflow-checks the
    cast. Spark's shiftleft wraps (Java semantics), giving the signed
    view for free."""
    hx = F.md5(col)
    hi = F.conv(F.substring(hx, 1, 1), 16, 10).cast("bigint")
    lo = F.conv(F.substring(hx, 2, 15), 16, 10).cast("bigint")
    return F.shiftleft(hi, 60).bitwiseOR(lo)


def _ab(k: int) -> tuple[int, int]:
    # fixed affine family; mirrored literally in oracle SQL
    return 2 * k + 3, 5 * k + 1


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact near-identity dedup: md5 fingerprint of normalized text,
    keep the smallest id per fingerprint. One shuffle, partial-agg."""
    fp = F.md5(normalize(F.col(text_col)))
    return (
        df.withColumn("fingerprint", fp)
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dupes"))
    )


def minhash_signature(
    df: DataFrame,
    text_col: str,
    num_hashes: int = 8,
    shingle_words: int = 1,
    out_prefix: str = "mh",
) -> DataFrame:
    """Append num_hashes minhash columns computed from the word-shingle set.

    Map-only: shingle array -> for each hash k, min over shingles of
    (a_k*h+b_k) mod P. Empty shingle sets get sentinel P (no shingle can
    reach it)."""
    sh = (
        F.array_distinct(tokens(F.col(text_col)))
        if shingle_words == 1
        else word_shingles(F.col(text_col), shingle_words)
    )
    out = df.withColumn("__sh__", sh)
    # md5 each shingle ONCE into a column of base hashes; the k affine
    # variants then transform the already-hashed array (cheap integer
    # ops) instead of re-running hash20's md5 per hash function —
    # num_hashes-1 fewer md5 passes per row, same values bit-for-bit
    out = out.withColumn("__hs__", F.transform(F.col("__sh__"), hash20))
    for k in range(num_hashes):
        a, b = _ab(k)
        mh = F.array_min(
            F.transform(F.col("__hs__"), lambda h: (h * a + b) % MINHASH_P)
        )
        out = out.withColumn(f"{out_prefix}{k}", F.coalesce(mh, F.lit(MINHASH_P)))
    return out.drop("__sh__", "__hs__")


def _pin_fanout(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """REPARTITION_BY_NUM on the bucket keys before a bucket SELF-JOIN.

    Bucket relations are tiny in BYTES (an id plus a short key per row),
    so AQE's size-based shuffle coalescing folds them into one or two
    post-shuffle partitions — and the self-join then fans every bucket
    into C(bucket, 2) pairs INSIDE those few tasks, serializing the
    operator's heaviest stage (the r8 jaccard_pairs_prefix finding:
    110 s single-task vs ~8 s pinned at 100x; bytes-based coalescing is
    blind to downstream fan-out). An explicit numPartitions repartition
    is exempt from coalescing, and both self-join sides derive from the
    SAME pinned relation, so the join adds no further exchange."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *keys)


def _cap_buckets(stacked: DataFrame, keys: list[str], max_bucket: int | None) -> DataFrame:
    """Drop rows in degenerate buckets (> max_bucket members) before a
    bucket self-join. A band key holding f% of N rows turns the join
    into (f·N)² pairs — the one way these blocked joins degrade to
    quadratic at scale (e.g. every empty doc shares one signature). The
    window count hash-partitions on the same keys as the join itself,
    so AQE reuses the exchange — the cap costs a sort, not an extra
    shuffle. Dropping a bucket only drops pairs whose similarity
    evidence is that degenerate key — near-universal keys carry no
    similarity signal (an exact-dup pass catches identical payloads)."""
    if max_bucket is None:
        return stacked
    w = Window.partitionBy(*keys)
    return (
        stacked.withColumn("__bn__", F.count(F.lit(1)).over(w))
        .filter(F.col("__bn__") <= max_bucket)
        .drop("__bn__")
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_words: int = 1,
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash-LSH: band the signature, bucket-join within bands.

    Returns candidate pairs (id_a < id_b) that share >= 1 band. The only
    shuffles are the groupBy on (band, band_key) — never an all-pairs
    join. rows_per_band = num_hashes // bands. ``max_bucket`` is an
    OPT-IN guard (default None = exact semantics): set it at scale so a
    degenerate band key (e.g. every empty doc's sentinel signature)
    cannot turn the join quadratic — enabling it is an explicit recall
    trade, never a silent default.

    Band keys (r13): minhash values live in [0, MINHASH_P] ⊂ [0, 2^21),
    so up to 3 of them pack INJECTIVELY into one bigint (base-2^21
    positional) — packed equality == tuple equality, and the join key is
    one long instead of a "v_v" string (guide §2.3: narrower types,
    cheaper hash/compare on every probe). Wider bands keep the string
    form.

    Duplicate elimination (r13): a pair colliding in several bands used
    to be deduplicated by a full ``distinct()`` over the pair stream —
    measured at sf0.1 the join itself costs 0.94 s while the distinct
    (21.2M pre-distinct rows -> 8.9M pairs: partial agg + Exchange +
    final agg) brings the query to 5.7 s. With max_bucket=None each row
    carries its ``bands`` keys as scalar columns and the join emits a
    pair ONLY at its smallest colliding band (for every earlier band
    b' < band_id: key_a[b'] != key_b[b']) — each colliding pair is
    emitted exactly once, so the pair set is IDENTICAL and the distinct
    (its exchange and both aggregates) disappears. The filter is a
    codegen-able scalar conjunction, not an array HOF. With max_bucket
    SET the first-match rule would be wrong (a pair whose smallest
    colliding band was capped away must still be emitted by a later
    surviving band), so the capped path keeps the distinct.
    """
    if not 1 <= bands <= num_hashes:
        raise ValueError(f"bands must be in 1..num_hashes, got {bands}/{num_hashes}")
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must divide evenly into bands ({bands}) "
            "— trailing hashes would be silently ignored"
        )
    rows_per_band = num_hashes // bands
    sig = minhash_signature(df, text_col, num_hashes, shingle_words)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{b * rows_per_band + i}") for i in range(rows_per_band)]
        if rows_per_band <= 3:
            # positional base-2^21 packing: injective for values in
            # [0, 2^21), and 3*21 = 63 bits fits the signed bigint
            key = parts[0].cast("bigint")
            for p in parts[1:]:
                key = key * F.lit(1 << 21) + p
        else:
            key = F.concat_ws("_", *[p.cast("string") for p in parts])
        band_cols.append(key.alias(f"band{b}"))
    banded = sig.select(F.col(id_col), *band_cols)
    first_match = max_bucket is None
    # with first-match dedup each row also carries the doc's FULL key
    # tuple (scalar columns, bands-1 of them are compared per pair)
    carry = [F.col(f"band{b}") for b in range(bands - 1)] if first_match else []
    stacked = banded.select(
        id_col,
        *carry,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_id"), F.col(f"band{b}").alias("band_key"))
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, *[c for c in (f"band{b}" for b in range(bands - 1)) if first_match], "bk.band_id", "bk.band_key")
    stacked = _pin_fanout(stacked, ["band_id", "band_key"])
    stacked = _cap_buckets(stacked, ["band_id", "band_key"], max_bucket)
    # BOTH sides of the band self-join read `stacked`, and the repeated
    # subtree does NOT collapse to ReusedExchange under AQE (the r7/r12
    # finding across this file) — so without this persist the whole
    # signature front half (scan, tokenize, per-token md5, num_hashes
    # minhash folds, band explode) executes TWICE per run (r13 plan
    # audit: plans/r13/lsh_candidate_pairs_before.txt ops 1-8 and 9-16
    # are the same subtree verbatim). The cached relation is
    # (id, band_id, band_key) — `bands` narrow rows per doc, far smaller
    # than the token arrays it derives from — and persisting AFTER the
    # pin freezes the join-key partitioning so both sides consume the
    # cache without a new exchange. Same bounded-FIFO lifecycle as the
    # jaccard prefix base.
    from pyspark import StorageLevel

    stacked = PREFIX_BASE.retain(stacked.persist(StorageLevel.MEMORY_AND_DISK))
    if first_match:
        a = stacked.select(
            F.col(id_col).alias("id_a"),
            *[F.col(f"band{b}").alias(f"__ka{b}__") for b in range(bands - 1)],
            "band_id",
            "band_key",
        )
        b_side = stacked.select(
            F.col(id_col).alias("id_b"),
            *[F.col(f"band{b}").alias(f"__kb{b}__") for b in range(bands - 1)],
            "band_id",
            "band_key",
        )
        # emit at the SMALLEST colliding band only: for every earlier
        # band the two keys must differ (keys are non-null: minhash
        # coalesces empty docs to the MINHASH_P sentinel)
        cond = F.lit(True)
        for bp in range(bands - 1):
            cond = cond & (
                (F.col("band_id") <= F.lit(bp))
                | (F.col(f"__ka{bp}__") != F.col(f"__kb{bp}__"))
            )
        return (
            a.join(b_side, ["band_id", "band_key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(cond)
            .select("id_a", "id_b")
        )
    left = stacked.withColumnRenamed(id_col, "id_a")
    right = stacked.withColumnRenamed(id_col, "id_b")
    pairs = (
        left.join(right, ["band_id", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return pairs


def simhash(
    df: DataFrame,
    text_col: str,
    bits: int = 16,
    out_col: str = "simhash",
    method: str = "auto",
    keep_cols: Sequence[str] | None = None,
) -> DataFrame:
    """SimHash over the word set: bit j of the signature is the sign of
    sum over words of (+1 if bit j of h(word) else -1). Map-only.

    The word hashes stay the JVM md5 recipe (one transform — the
    boundary that keeps CollapseProject from inlining the digest per
    bit), but the per-bit majority fold is ``bits`` interpreted
    aggregate passes over the hash array — measured ~225 s for 500k
    docs at 100x-sf0.1, the same interpreted-HOF wall as the k-means
    argmin (SCALE.md). method='numpy' (the 'auto' default) folds the
    bits in one Arrow-batched pass ((h >> j) & 1 on int64 — EXACT
    integer math, so unlike the dgemm float switch the two paths are
    bit-identical on every input, pinned by tests); method='expr'
    keeps the pure-expression form for SQL-replay audits.

    bits up to 64 (the deployment width — SCALE.md): past 20 the word
    hash switches from hash20 to hash64 (bit patterns replayable in
    DuckDB as UBIGINT), bit tests use sign-safe shift+mask, and bit 63
    lands as the bigint sign bit (two's complement — xor/popcount
    downstream are sign-agnostic).

    ``keep_cols`` (r13, guide §4: pass only the columns the function
    needs): when set, the output carries only keep_cols + out_col, and
    the PROJECTION HAPPENS BEFORE the Python boundary — Spark cannot see
    which columns the numpy fold touches, so without it every input
    column (including the full document text the hash array already
    encodes) crosses the Arrow boundary both ways. Default None keeps
    the returns-all-columns contract unchanged."""
    from dataframe_kotlin_spark.operators.similarity import _check_method

    _check_method(method)
    if not 1 <= bits <= 64:
        raise ValueError(f"bits must be in [1, 64], got {bits}")
    word_hash = hash64 if bits > 20 else hash20
    words = F.array_distinct(tokens(F.col(text_col)))
    out = df.withColumn("__h__", F.transform(words, lambda w: word_hash(w)))
    if keep_cols is not None:
        out = out.select(*keep_cols, "__h__")
    if method == "expr":
        acc = F.lit(0).cast("bigint")
        for j in range(bits):
            contrib = F.aggregate(
                F.col("__h__"),
                F.lit(0).cast("bigint"),
                # shiftright is ARITHMETIC but &1 reads bit j exactly for
                # any sign (hash64 values are negative when md5's top
                # nibble >= 8); floor-div %2 would misread negatives
                lambda s, h: s + F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
            )
            # j=63 is the sign bit: its two's-complement weight
            w_j = F.lit(2**j) if j < 63 else F.lit(-(2**63))
            acc = acc + F.when(contrib > 0, w_j).otherwise(F.lit(0))
        return out.withColumn(out_col, acc).drop("__h__")

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [f for f in out.schema.fields if f.name != "__h__"]
        + [StructField(out_col, LongType(), False)]
    )

    def fold(batches):
        import numpy as np

        weights = 1 << np.arange(bits, dtype=np.int64)
        for pdf in batches:
            sigs = np.zeros(len(pdf), dtype=np.int64)
            for r, hs in enumerate(pdf["__h__"]):
                # NULL text -> NULL hash array -> signature 0, matching
                # the expression path's when(NULL > 0).otherwise(0) fold
                if hs is None or len(hs) == 0:
                    continue
                h = np.asarray(hs, dtype=np.int64)
                ones = ((h[:, None] >> np.arange(bits)) & 1).sum(axis=0)
                contrib = 2 * ones - len(h)  # (+1/-1 majority per bit)
                sigs[r] = int(weights[contrib > 0].sum())
            pdf = pdf.drop(columns=["__h__"])
            pdf[out_col] = sigs
            yield pdf

    return out.mapInPandas(fold, out_schema)


def hamming_pairs(
    df: DataFrame,
    id_col: str,
    sim_col: str,
    max_dist: int,
    bits: int = 16,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs by simhash hamming distance <= max_dist, with FULL
    recall: the signature's `bits` are split into max_dist+1 disjoint
    blocks, so any pair within distance max_dist has at least one block
    where the two signatures agree exactly (pigeonhole). Each row is
    exploded into its (block_id, block_key) probes and pairs meet in a
    single equi-join on the probe — one shuffle keyed on small buckets
    instead of an all-pairs product; distinct() collapses pairs caught by
    more than one block. Same blocked-join shape the reference would need
    for its near-dup pass; signature semantics per simhash() above.

    ``max_bucket`` is an OPT-IN guard (default None preserves the
    documented FULL-recall contract exactly): set it at scale when a
    short block over skewed text goes near-universal — recall then
    holds for every pair agreeing on a NON-degenerate block, an
    explicit trade the caller makes, never a silent default.

    Duplicate elimination (r13): pairs agreeing on several blocks used
    to be deduplicated by a full ``distinct()`` over the pair stream —
    the same distinct-bound shape as lsh_candidate_pairs (there
    measured 0.94 s join vs 5.7 s with the distinct at sf0.1). With
    max_bucket=None the join emits a pair ONLY at its smallest agreeing
    block: both signatures already ride the join, so "the earlier
    blocks differ" is a scalar expression over (sim_a, sim_b) — zero
    extra columns, each agreeing pair emitted exactly once, identical
    pair set, and the distinct's Exchange + both HashAggregates
    disappear. With max_bucket SET the first-match rule would drop a
    pair whose smallest agreeing block was capped away, so the capped
    path keeps the distinct."""
    nblocks = max_dist + 1
    assert bits >= nblocks, "need at least one bit per block"
    blocks = []
    lo = 0
    base, rem = divmod(bits, nblocks)
    for i in range(nblocks):
        w = base + (1 if i < rem else 0)
        blocks.append((i, lo, w))
        lo += w
    # block key = bits [lo, lo+w) via logical shift + mask: sign-safe for
    # 64-bit signatures (bit 63 = bigint sign bit). The old `shiftright %
    # 2^w` misreads NEGATIVE shifted values (Java % keeps the dividend's
    # sign: -5 % 4 = -1, low bits 11 = 3) — a silent recall hole once
    # signatures went 64-bit; identical to the old form for nonnegative
    # signatures (all <= 20-bit recipes), so existing oracles replay
    # unchanged.
    def _block_key(i: int, lo: int, w: int) -> Column:
        mask = F.lit(-1) if w >= 64 else F.lit((1 << w) - 1)
        return F.shiftrightunsigned(F.col(sim_col), lo).bitwiseAND(mask)

    probe = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("block_id"),
                    _block_key(i, lo, w).alias("block_key"),
                )
                for i, lo, w in blocks
            ]
        )
    ).alias("p")
    stacked = df.select(F.col(id_col), F.col(sim_col), probe).select(
        id_col, sim_col, "p.block_id", "p.block_key"
    )
    stacked = _pin_fanout(stacked, ["block_id", "block_key"])
    stacked = _cap_buckets(stacked, ["block_id", "block_key"], max_bucket)
    # Same 2-consumer replay as lsh_candidate_pairs: both self-join
    # sides re-execute the signature subtree — for the numpy simhash
    # path that is the full Arrow round-trip (MapInPandas) TWICE, plus
    # the bucket-cap window when max_bucket is set (r13 plan audit:
    # plans/r13/simhash_hamming_pairs_before.txt ops 1-9 / 10-18).
    # Cached relation: (id, signature, block_id, block_key) — nblocks
    # narrow rows per doc; persisted post-pin (and post-cap) so the join
    # consumes the cached partitioning.
    from pyspark import StorageLevel

    stacked = PREFIX_BASE.retain(stacked.persist(StorageLevel.MEMORY_AND_DISK))
    a = stacked.select(
        F.col(id_col).alias("id_a"), F.col(sim_col).alias("sim_a"), "block_id", "block_key"
    )
    b = stacked.select(
        F.col(id_col).alias("id_b"), F.col(sim_col).alias("sim_b"), "block_id", "block_key"
    )
    joined = (
        a.join(b, ["block_id", "block_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= max_dist)
    )
    if max_bucket is None:
        # first-match block dedup (see docstring): emit at the smallest
        # agreeing block only — earlier blocks must DISAGREE, computed
        # from the signatures already riding the join
        def _bk(col: Column, i: int) -> Column:
            _, lo, w = blocks[i]
            mask = F.lit(-1) if w >= 64 else F.lit((1 << w) - 1)
            return F.shiftrightunsigned(col, lo).bitwiseAND(mask)

        cond = F.lit(True)
        for i in range(nblocks - 1):
            cond = cond & (
                (F.col("block_id") <= F.lit(i))
                | (_bk(F.col("sim_a"), i) != _bk(F.col("sim_b"), i))
            )
        return joined.filter(cond).select("id_a", "id_b", "hamming")
    return joined.select("id_a", "id_b", "hamming").distinct()


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: Sequence[str],
    threshold: float,
) -> DataFrame:
    """Word-set Jaccard similarity for pairs within the same block
    (blocking keeps the join from being all-pairs; at scale block on
    LSH buckets from lsh_candidate_pairs instead)."""
    toks = F.array_distinct(tokens(F.col(text_col)))
    base = df.select(F.col(id_col), *[F.col(c) for c in block_cols], toks.alias("__t__"))
    base = _pin_fanout(base, list(block_cols))
    # Token-set SIZE precomputed once per row (map-side), for two exact
    # per-pair savings (r12; both value-identical by set arithmetic):
    #   - length prune: |A∩B| <= min(n_a,n_b) and |A∪B| >= max(n_a,n_b),
    #     so J <= min/max — pairs with min < t*max cannot reach the
    #     threshold and are discarded by an integer predicate BEFORE the
    #     per-pair array work runs (same bound jaccard_pairs_prefix
    #     applies, same recall-safe epsilon nudge);
    #   - union-free Jaccard: the token arrays are element-distinct, so
    #     |A∪B| = n_a + n_b - |A∩B| — the array_union allocation per
    #     pair (the join's single hottest expression) is replaced by two
    #     int adds on the precomputed sizes.
    a = base.select(
        F.col(id_col).alias("id_a"), *block_cols,
        F.col("__t__").alias("__ta__"), F.size("__t__").alias("__na__"),
    )
    b = base.select(
        F.col(id_col).alias("id_b"), *block_cols,
        F.col("__t__").alias("__tb__"), F.size("__t__").alias("__nb__"),
    )
    inter = F.size(F.array_intersect(F.col("__ta__"), F.col("__tb__")))
    un = F.col("__na__") + F.col("__nb__") - F.col("__inter__")
    return (
        a.join(b, list(block_cols))
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.least(F.col("__na__"), F.col("__nb__"))
            >= F.greatest(F.col("__na__"), F.col("__nb__")) * F.lit(threshold)
            - F.lit(1e-9)
        )
        .withColumn("__inter__", inter)
        .withColumn("jaccard", F.col("__inter__") / un)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: Sequence[str],
    max_dist: int,
    length_band: int | None = None,
) -> DataFrame:
    """Edit-distance near-dup pairs within blocks.

    Levenshtein is O(len^2) per comparison and can't be inverted into a
    hash, so the scale story is all in candidate PRUNING before the
    expensive compare:

    - blocking on block_cols (at scale: LSH buckets or simhash bands);
    - a length band — |len(a) - len(b)| > max_dist already implies
      distance > max_dist, so those pairs are discarded by a cheap
      integer predicate BEFORE the quadratic compare runs;
    - a character-histogram lower bound — each substitution moves at
      most 2 units of histogram mass and each insert/delete 1, so
      levenshtein(a,b) >= sum(|hist_a - hist_b|)/2. The 37-dim histogram
      is computed once per ROW (map-only), and the pairwise bound is
      ~100 integer ops vs O(len*max_dist) for the DP — it discards the
      bulk of length-plausible-but-different pairs before the DP runs.
      The bound never drops a true pair, so results are unchanged;
    - Spark's built-in F.levenshtein(l, r, threshold) short-circuits
      the DP once the running distance exceeds the threshold (returns
      -1), keeping the per-pair cost ~O(len * max_dist).

    Output mirrors jaccard_pairs: (id_a, id_b, edit_distance).
    """
    band = max_dist if length_band is None else length_band
    # Per-char counts as SCALAR columns, not an array: array HOFs
    # (zip_with/aggregate) run interpreted per pair, which benchmarks
    # slower than the thresholded DP they're meant to avoid; a 37-term
    # scalar sum stays inside whole-stage codegen.
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 "
    s = F.lower(F.col(text_col))
    hist_cols = [
        (F.length(s) - F.length(F.replace(s, F.lit(ch)))).cast("int").alias(f"__h{i}__")
        for i in range(len(alphabet))
        for ch in [alphabet[i]]
    ]
    base = df.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        F.col(text_col).alias("__s__"),
        *hist_cols,
    )
    base = _pin_fanout(base, list(block_cols))
    # Both self-join sides read `base`: without a persist the 37-replace
    # character histogram (37 full string scans per row) and the text
    # projection execute TWICE per run (r13 plan audit:
    # plans/r13/fuzzy_pairs_editdist_before.txt ops 1-4 / 6-9 duplicate
    # the scan+histogram subtree). Cached relation: one row per doc —
    # id, blocks, text, 37 ints; post-pin so the join reuses the
    # partitioning. Bounded FIFO as above.
    from pyspark import StorageLevel

    base = PREFIX_BASE.retain(base.persist(StorageLevel.MEMORY_AND_DISK))
    nh = len(alphabet)
    a = base.select(
        F.col(id_col).alias("id_a"), *block_cols,
        F.col("__s__").alias("__sa__"),
        *[F.col(f"__h{i}__").alias(f"__ha{i}__") for i in range(nh)],
    )
    b = base.select(
        F.col(id_col).alias("id_b"), *block_cols,
        F.col("__s__").alias("__sb__"),
        *[F.col(f"__h{i}__").alias(f"__hb{i}__") for i in range(nh)],
    )
    hist_gap = None
    for i in range(nh):
        t = F.abs(F.col(f"__ha{i}__") - F.col(f"__hb{i}__"))
        hist_gap = t if hist_gap is None else hist_gap + t
    dist = F.levenshtein(F.col("__sa__"), F.col("__sb__"), max_dist)
    return (
        a.join(b, list(block_cols))
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.abs(F.length("__sa__") - F.length("__sb__")) <= F.lit(band)
        )
        .filter(hist_gap <= 2 * max_dist)
        .withColumn("edit_distance", dist)
        .filter(F.col("edit_distance") >= 0)
        .select("id_a", "id_b", "edit_distance")
    )


def jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
) -> DataFrame:
    """Word-set Jaccard pairs over the WHOLE corpus via prefix filtering
    (PPJoin-style) — no blocking columns needed, FULL recall.

    Pigeonhole: order every document's distinct tokens by (global
    document frequency asc, token) — a single total order shared by all
    docs — and keep each doc's first L = n - ceil(t*n) + 1 tokens as its
    prefix. Two docs with J >= t share at least ceil(t*n) tokens, so
    they MUST collide on at least one prefix token; docs that share only
    common terms meet on rare-token probes with tiny buckets. Candidates
    come from one equi-join on the prefix token (shuffle keyed on
    tokens, heaviest bucket = most frequent token that survives any
    prefix), then the exact Jaccard verify runs only on candidates.

    Contrast with jaccard_pairs (explicit block columns — recall limited
    to same-block pairs) and lsh_candidate_pairs (probabilistic recall):
    this is the exact-threshold full-recall formulation that scales as
    long as prefixes stay rare-token-biased.

    Parallelism guards (r8, found at 100x): (1) the same
    ensure_scan_parallelism probe as gram_bucket_rows — a 1-file input
    serialized the whole tokenize/window front half onto one task;
    (2) the prefix relation and the candidate pairs are EXPLICITLY
    repartitioned (REPARTITION_BY_NUM is exempt from AQE coalescing):
    the prefix relation is tiny in BYTES (two small columns), so AQE's
    size-based coalescing folded its post-shuffle partitions into ONE —
    and the candidate join fans out 14k prefix rows into 22M pairs
    INSIDE that one task, then the distinct and the array_intersect
    verify inherited the same single partition: the whole back half of
    the operator serialized (measured 110-116 s single-task vs ~8 s
    pinned, on the 100x residual enumeration). Bytes-based coalescing
    is blind to downstream fan-out and per-row compute; pin both.
    """
    import math

    from dataframe_kotlin_spark.operators.skew import ensure_scan_parallelism

    df = ensure_scan_parallelism(df)
    toks = F.array_distinct(tokens(F.col(text_col)))
    base = df.select(F.col(id_col).alias("__id__"), toks.alias("__t__"))
    # FOUR subtrees read `base` (document frequencies, the ranked
    # prefixes, and both sides of the verify join), and AQE does not
    # collapse them with ReusedExchange (the r7 DSIR finding), so
    # everything upstream — scan, tokenize, and any caller-side dedup
    # like dedup_then_jaccard's exact pass — executes 4x without this.
    # Persist the (id, token-set) relation: the operator's smallest
    # complete representation, bounded by the corpus's distinct-token
    # footprint. Measured on the 100x residual enumeration: 34.2 ->
    # 22.7 s end-to-end (r9). Lifecycle: LRU eviction only moves
    # MEMORY_AND_DISK blocks memory->disk — the disk half lives until
    # an explicit unpersist — so a bounded FIFO retires the oldest
    # cached base beyond the last few (a long session sweeping many
    # corpora would otherwise accumulate one relation on local disk
    # per distinct input, unbounded; r9 review finding). The newest
    # entries stay cached so bench/scale warm reps still hit. The
    # registry's lock makes concurrent callers safe (ADVICE r9).
    from pyspark import StorageLevel

    base = PREFIX_BASE.retain(base.persist(StorageLevel.MEMORY_AND_DISK))
    tok = base.select("__id__", F.explode("__t__").alias("__tok__"))
    dfreq = tok.groupBy("__tok__").agg(F.count(F.lit(1)).alias("__df__"))
    w = Window.partitionBy("__id__").orderBy(F.col("__df__").asc(), F.col("__tok__"))
    ranked = (
        tok.join(dfreq, "__tok__")
        .withColumn("__pos__", F.row_number().over(w))
        .withColumn("__n__", F.count(F.lit(1)).over(Window.partitionBy("__id__")))
    )
    # ceil over double arithmetic: when t*n is an exact integer the FP
    # product can land epsilon ABOVE it (e.g. 0.1*10 -> 1.0000000000000002,
    # ceil 2), shortening the prefix by one token and silently breaking
    # the full-recall contract. Nudge down before ceil; the epsilon is
    # far below 1/n for any real document, so non-boundary values are
    # unaffected.
    L = F.col("__n__") - F.ceil(F.col("__n__") * threshold - F.lit(1e-9)) + 1
    nparts = df.sparkSession.sparkContext.defaultParallelism
    # pin candidate-join parallelism: see the parallelism-guards note
    # above. Placement matters: a keyed repartition AFTER the distinct
    # gets optimized out of the plan entirely (verified on Spark 4.1);
    # keyed on the join key BEFORE the fan-out and keyed on the full
    # pair BEFORE the distinct both survive, and the (id_a, id_b)
    # partitioning satisfies the distinct exactly (no extra exchange).
    prefix = ranked.filter(F.col("__pos__") <= L).select(
        "__id__", "__tok__", "__pos__", "__n__"
    )
    prefix = prefix.repartition(nparts, "__tok__")
    # BOTH sides of the candidate self-join read `prefix`, and (like the
    # 4-consumer `base` above) the repeated subtree does NOT collapse to
    # ReusedExchange under AQE — so without this persist the document-
    # frequency aggregate and the per-doc ranking window (the operator's
    # two heaviest front-half exchanges: a full (id, token) shuffle +
    # sort each) execute TWICE per run (r12 plan audit: ops 18-35 and
    # 37-58 in plans/r12/dedup_then_jaccard_before.txt are the same
    # subtree verbatim). The cached relation is 4 narrow columns x
    # (prefix length L) rows per doc — strictly smaller than the
    # persisted base's full token sets, so the same bounded-FIFO
    # lifecycle applies. Persisting AFTER the __tok__ repartition keeps
    # the cached partitioning, so the self-join consumes it without a
    # new exchange.
    prefix = PREFIX_BASE.retain(prefix.persist(StorageLevel.MEMORY_AND_DISK))
    # Length + positional filters (PPJoin, Xiao et al. WWW'08) — both
    # EXACT, both applied before the verify join fetches token sets:
    # J >= t needs overlap o >= alpha = ceil(t/(1+t) * (n_a+n_b)), and
    #   - length: o <= min(n_a, n_b), so min >= t*max or the pair is
    #     impossible;
    #   - positional, per colliding prefix token at (global-order)
    #     positions (pa, pb): common tokens strictly before it number
    #     <= min(pa,pb)-1 (each must precede BOTH positions in the one
    #     shared order), plus this token, plus at most
    #     min(n_a-pa, n_b-pb) after it — so
    #     o <= ub = min(pa,pb) + min(n_a-pa, n_b-pb). The pair-level
    #     bound is the MIN of ub over its collision rows, folded by the
    #     same (id_a, id_b) aggregation that already deduplicated
    #     multi-token collisions (groupBy replaces the old distinct —
    #     identical exchange, strictly fewer verify pairs). Template-
    #     heavy corpora are exactly where this bites: boilerplate
    #     tokens collide at LATE prefix positions with short suffixes,
    #     and the bound proves the overlap can't reach alpha.
    # Both alpha and the length bound get the same epsilon nudge as L
    # (down-nudge before ceil / compare: a too-SMALL alpha only keeps
    # extra candidates — the recall-safe direction).
    frac = threshold / (1.0 + threshold)
    a_side = prefix.select(
        F.col("__id__").alias("id_a"),
        "__tok__",
        F.col("__pos__").alias("__pa__"),
        F.col("__n__").alias("__na__"),
    )
    b_side = prefix.select(
        F.col("__id__").alias("id_b"),
        "__tok__",
        F.col("__pos__").alias("__pb__"),
        F.col("__n__").alias("__nb__"),
    )
    ub = F.least(F.col("__pa__"), F.col("__pb__")) + F.least(
        F.col("__na__") - F.col("__pa__"), F.col("__nb__") - F.col("__pb__")
    )
    alpha = F.ceil(
        (F.col("__na__") + F.col("__nb__")) * F.lit(frac) - F.lit(1e-9)
    )
    cand = (
        a_side.join(b_side, "__tok__")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.least(F.col("__na__"), F.col("__nb__"))
            >= F.greatest(F.col("__na__"), F.col("__nb__")) * F.lit(threshold)
            - F.lit(1e-9)
        )
        .select("id_a", "id_b", ub.alias("__ub__"), alpha.alias("__alpha__"))
        .repartition(nparts, "id_a", "id_b")
        .groupBy("id_a", "id_b")
        .agg(
            F.min("__ub__").alias("__ubm__"), F.first("__alpha__").alias("__al__")
        )
        .filter(F.col("__ubm__") >= F.col("__al__"))
        .select("id_a", "id_b")
    )
    sets = base.select("__id__", "__t__")
    # Union-free Jaccard (r13, same arithmetic as the r12 blocked
    # jaccard_pairs change): token arrays are array_distinct by
    # construction, so |A∪B| = n_a + n_b − |A∩B| exactly — computing the
    # union SIZE from sizes removes a per-pair array allocation +
    # hash-set build on every one of the verify pairs (candidates ≈ true
    # pairs on this corpus: 7.1M at sf0.1). The intersect lands in a
    # named column so the division reuses it instead of evaluating the
    # per-pair intersect twice. inter and the sizes are ints; the
    # division produces the identical double as inter/size(union).
    inter = F.size(F.array_intersect(F.col("__ta__"), F.col("__tb__")))
    return (
        cand.join(sets.select(F.col("__id__").alias("id_a"), F.col("__t__").alias("__ta__")), "id_a")
        .join(sets.select(F.col("__id__").alias("id_b"), F.col("__t__").alias("__tb__")), "id_b")
        .withColumn("__i__", inter)
        .withColumn(
            "jaccard",
            F.col("__i__")
            / (F.size(F.col("__ta__")) + F.size(F.col("__tb__")) - F.col("__i__")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def semdedup_prune(
    df: DataFrame,
    cell_col: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    method: str = "expr",
    salt_parts: int | str | None = None,
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540): within each embedding cluster, find pairs whose
    cosine similarity exceeds ``threshold`` and keep only one document
    of each — the smallest id survives (a row is dropped iff it is the
    LARGER id of some above-threshold pair; greedy-by-id, so chains
    a~b~c keep only a even when cos(a,c) < threshold, matching the
    paper's one-survivor-per-near-clique intent deterministically).

    Scale shape: the cluster column (k-means cell from
    similarity.kmeans_lloyd_det / train_ivf_centroids, or an LSH bucket)
    blocks the self-join — O(sum cell²) not O(n²); the pair join
    shuffles on the cell key once, and the final anti-join shuffles on
    the id. No collect, no cross join; cosine is the JVM-side
    sequential fold (similarity.dot), so the whole pass is
    whole-stage-codegen and bit-exactly replayable by the oracle.

    method='expr' (default) keeps the bit-exactly replayable JVM fold
    (the semdedup_survivors oracle path); 'numpy' routes pair scoring
    through the Arrow-batched BLAS cosine (similarity.pandas_cosine) —
    the deployment path once pair volume or embedding dim grows (the
    interpreted fold measured 65 s of the k-proportional 100x pass;
    production dims pay 12-64x more per pair).

    Returns the surviving rows of ``df`` (all original columns).
    """
    from dataframe_kotlin_spark.operators.similarity import cosine_neardup_pairs

    pairs = cosine_neardup_pairs(
        df, cell_col, vec_col=vec_col, id_col=id_col, threshold=threshold,
        method=method, salt_parts=salt_parts,
    )
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(dropped, id_col, "left_anti")


# --------------------------------------------------------------------------
# Duplicated-SPAN detection (r11): exact substring-level dedup signals.
# Document-level dedup (everything above) misses the pervasive failure
# mode of web corpora — boilerplate/template runs repeated VERBATIM
# inside otherwise-distinct documents (the motivation for substring
# dedup in Lee et al., "Deduplicating Training Data Makes Language
# Models Better", ACL'22, which removes duplicate 50-token substrings).
# A literal suffix array does not distribute; the Spark-first
# formulation is fixed-width token windows:
#   - duplicate_spans: every n-token window, grouped corpus-wide ->
#     spans appearing in >= min_docs distinct documents. EXACT for
#     width-n spans (any duplicated run of >= n tokens contains a
#     duplicated n-window, so recall over longer runs is total).
#   - span_dup_fraction: per-document share of its windows that are
#     corpus-duplicated — the quality-filter signal (drop or trim docs
#     past a threshold).
#   - winnow_fingerprints: Schleimer et al. SIGMOD'03 winnowing — the
#     bounded-output candidate path when exploding EVERY window is too
#     much (selects ~2/(w+1) of windows; any shared run of
#     >= n + w - 1 tokens still shares a selected fingerprint).
# All three are map-only until one keyed shuffle (the span/fingerprint
# groupBy or join); no driver collect, no all-pairs join.
# --------------------------------------------------------------------------


def _span_windows(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id_col, __span__) — one row per n-token window, map-side.
    Same tokenizer/window construction as the decontamination scan
    (textpipe._ngram_windows) so span semantics match the 13-gram
    protocol family; re-declared here to keep dedup importable without
    textpipe."""
    from dataframe_kotlin_spark.functions.text import bind1
    from dataframe_kotlin_spark.operators.skew import ensure_scan_parallelism

    toks = tokens(F.col(text_col))
    windows = bind1(
        toks,
        lambda t: F.transform(
            F.sequence(F.lit(1), F.size(t) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        ),
    )
    return (
        ensure_scan_parallelism(df)
        .filter(F.size(toks) >= n)
        .select(F.col(id_col).alias(id_col), F.explode(windows).alias("__span__"))
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 20,
    min_docs: int = 2,
    key: str = "text",
) -> DataFrame:
    """Corpus-wide duplicated n-token spans: (span [or span_hash],
    n_docs, n_occurrences) for spans present in >= ``min_docs``
    DISTINCT documents.

    ``key``:
    - 'text' groups on the span string itself — exact, and the oracle
      default (DuckDB replays the same tok/window CTE);
    - 'hash' groups on hash64(span) — the 100 TB path: the shuffle key
      drops from ~6x span_tokens bytes to 8, and the map-side combine
      holds longs instead of strings. hash64 is the md5-derived 64-bit
      key the simhash family already uses, so even this path stays
      SQL-replayable; collisions conflate spans at ~N_windows²/2⁶⁵
      probability — a candidate-generation contract, same class as
      fingerprint dedup's.

    One shuffle (the span-key groupBy, map-side partial aggregation);
    the window explosion is map-side and fuses into the scan. The
    n_docs count is count_distinct(id) INSIDE the aggregate — no
    second shuffle."""
    if key not in ("text", "hash"):
        raise ValueError(f"key must be 'text' or 'hash'; got {key!r}")
    win = _span_windows(df, id_col, text_col, span_tokens)
    kcol = (
        F.col("__span__").alias("span")
        if key == "text"
        else hash64(F.col("__span__")).alias("span_hash")
    )
    kname = "span" if key == "text" else "span_hash"
    return (
        win.select(kcol, id_col)
        .groupBy(kname)
        .agg(
            F.count_distinct(id_col).cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def span_dup_fraction(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 20,
    min_docs: int = 2,
    key: str = "text",
    include_short: bool = False,
) -> DataFrame:
    """Per-document duplicated-span share: (id_col, n_windows, n_dup,
    dup_fraction) — the fraction of the document's n-token windows that
    appear in >= ``min_docs`` distinct documents corpus-wide. The
    standard boilerplate-contamination quality signal: filter or
    down-weight documents whose duplicated share crosses a threshold.

    Scale shape — the window relation (corpus x doc-length rows, the
    expensive tokenize/slice/concat construction) is built exactly ONCE
    and flows through three keyed aggregations instead of being rebuilt
    per consumer (the r7-dsir replay class — a naive 'join the
    duplicate_spans vocabulary back' recomputes it three times):
    (1) a (span, id) pre-aggregate (map-side combine on the heavier
    key); (2) n_docs via a span-PARTITIONED window over that pre-agg
    (count over the partition = distinct docs, since the pre-agg made
    (span, id) unique); (3) the per-id rollup. Three shuffles of narrow
    rows — with key='hash', 8-byte keys — always cheaper than two extra
    passes of window construction. Skew bound: the window's partition
    for a boilerplate span holds n_docs(span) rows — ONE narrow row per
    document containing it, count-only frame, and WindowExec's row
    buffer spills — so even a span in every document costs one
    task-linear pass over doc-count rows, never over window-count rows
    (a groupBy+join-back shape would be AQE-splittable but consumes the
    pre-agg twice, replaying the window construction — measured as the
    dominant cost). Documents shorter than span_tokens have no windows
    and are omitted by default (callers treat missing as 0);
    ``include_short=True`` emits them as (id, 0, 0, 0.0) rows via one
    extra left join from the id column (the "missing means 0" contract
    materialized, so callers don't each re-implement it — VERDICT r11
    item 9)."""
    if key not in ("text", "hash"):
        raise ValueError(f"key must be 'text' or 'hash'; got {key!r}")
    win = _span_windows(df, id_col, text_col, span_tokens)
    kcol = (
        F.col("__span__") if key == "text" else hash64(F.col("__span__"))
    ).alias("__k__")
    wc = win.select(kcol, id_col).groupBy("__k__", id_col).agg(
        F.count(F.lit(1)).alias("__c__")
    )
    ndocs = F.count(F.lit(1)).over(Window.partitionBy("__k__"))
    tagged = wc.withColumn("__nd__", ndocs)
    out = tagged.groupBy(id_col).agg(
        F.sum("__c__").cast("bigint").alias("n_windows"),
        F.sum(F.when(F.col("__nd__") >= min_docs, F.col("__c__")).otherwise(0))
        .cast("bigint")
        .alias("n_dup"),
    ).select(
        id_col,
        "n_windows",
        "n_dup",
        (F.col("n_dup") / F.col("n_windows")).alias("dup_fraction"),
    )
    if not include_short:
        return out
    return df.select(id_col).join(out, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_windows"), F.lit(0)).cast("bigint").alias("n_windows"),
        F.coalesce(F.col("n_dup"), F.lit(0)).cast("bigint").alias("n_dup"),
        F.coalesce(F.col("dup_fraction"), F.lit(0.0)).alias("dup_fraction"),
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 20,
    w: int = 4,
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken —
    "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD'03): per document, hash every n-token window (hash64), then
    keep the MINIMUM hash of every w consecutive windows, distinct.

    Guarantee (the paper's Theorem 1 shape, value-form): any two
    documents sharing a verbatim run of >= n + w - 1 tokens share a
    full w-window of identical gram hashes, whose minimum is selected
    in BOTH documents — so the shared run is always detectable from the
    selected fingerprints alone. Density: ~2/(w+1) of all windows, the
    knob that makes corpus-wide span candidate generation affordable
    when exploding every window is not.

    Output: (id_col, fingerprint bigint), distinct per document. Wholly
    map-side (array expressions, no UDF, no shuffle) — downstream
    candidate generation pays the only shuffle (fingerprint groupBy or
    self-join with the lsh_candidate_pairs fan-out discipline)."""
    from dataframe_kotlin_spark.functions.text import bind1
    from dataframe_kotlin_spark.operators.skew import ensure_scan_parallelism

    toks = tokens(F.col(text_col))
    grams = bind1(
        toks,
        lambda t: F.transform(
            F.sequence(F.lit(1), F.size(t) - n + 1),
            lambda i: hash64(F.concat_ws(" ", F.slice(t, i, n))),
        ),
    )
    mins = bind1(
        grams,
        lambda h: F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(h) - w + 1, F.lit(1))),
                lambda j: F.array_min(F.slice(h, j, F.least(F.lit(w), F.size(h)))),
            )
        ),
    )
    return (
        ensure_scan_parallelism(df)
        .filter(F.size(toks) >= n)
        .select(F.col(id_col).alias(id_col), F.explode(mins).alias("fingerprint"))
        .distinct()
    )


def excise_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 20,
    min_docs: int = 2,
    out_col: str = "text_deduped",
) -> DataFrame:
    """Remove duplicated spans, keeping ONE canonical occurrence — the
    transform half of the family (Lee et al. ACL'22 excise duplicate
    substrings rather than whole documents; detection alone leaves the
    boilerplate in the training set).

    Semantics (deterministic, order-free):
    - a span is duplicated when >= ``min_docs`` distinct documents
      contain it (duplicate_spans' rule);
    - its KEEPER is the smallest ``id_col`` containing it — that
      document keeps all its occurrences, every other document excises
      the tokens covered by its occurrences of the span;
    - excised positions are the UNION over all duplicated windows
      (overlapping windows from one long repeated run merge
      naturally), and the output text is the surviving tokens joined
      by single spaces (the tokenizer's normalized form — the op's
      output is normalized text by contract).

    The guarantee is POSITIONAL, not per-span: a token survives in
    doc D iff no duplicated-span occurrence whose keeper is another
    doc covers it. When two DIFFERENT duplicated spans overlap, the
    keeper of one may still lose shared tokens to the other span's
    excision — simultaneous per-span retention is impossible for
    overlapping spans under any token-removal semantics (property-
    tested against a brute-force positional oracle).

    Scale shape: one windows-with-position relation (map-side), one
    span-key groupBy for (n_docs, keeper), one join back on the span
    key (AQE-splittable on hot boilerplate spans), one per-id
    collect_set of covered start positions (row-bounded: <= token
    count per document), one broadcast-or-shuffle join onto the
    original frame, and a JVM-side array filter to rebuild — no UDF,
    no driver collect. Returns all original columns plus ``out_col``
    (documents with no excisions carry their normalized text
    unchanged)."""
    from dataframe_kotlin_spark.functions.text import bind1
    from dataframe_kotlin_spark.operators.skew import ensure_scan_parallelism

    n = int(span_tokens)
    toks = tokens(F.col(text_col))
    # (id, start position 1-based, span string) — transform WITH index
    win = bind1(
        toks,
        lambda t: F.transform(
            F.sequence(F.lit(1), F.size(t) - n + 1),
            lambda i: F.struct(
                i.alias("__i__"), F.concat_ws(" ", F.slice(t, i, n)).alias("__s__")
            ),
        ),
    )
    base = ensure_scan_parallelism(df)
    wpos = (
        base.filter(F.size(toks) >= n)
        .select(F.col(id_col).alias(id_col), F.explode(win).alias("__w__"))
        .select(id_col, F.col("__w__.__i__").alias("__i__"), F.col("__w__.__s__").alias("__s__"))
    )
    spans = wpos.groupBy("__s__").agg(
        F.count_distinct(id_col).alias("__nd__"),
        F.min(id_col).alias("__keeper__"),
    ).filter(F.col("__nd__") >= min_docs)
    covered = (
        wpos.join(spans, "__s__")
        .filter(F.col(id_col) != F.col("__keeper__"))
        .groupBy(id_col)
        .agg(F.collect_set("__i__").alias("__starts__"))
    )
    joined = base.join(covered, id_col, "left")
    starts = F.coalesce(F.col("__starts__"), F.array().cast("array<int>"))
    # linear rebuild: expand starts to covered positions (O(starts*n)),
    # subtract from the full position range with array_except (hash-set
    # backed and LEFT-order-preserving, O(len + covered)), then read the
    # surviving tokens by position. A per-token exists() over the starts
    # array would be O(len * starts) interpreted — quadratic on a fully
    # covered long document.
    cov = bind1(
        starts,
        lambda st: F.flatten(
            F.transform(st, lambda s: F.sequence(s, s + (n - 1)))
        ),
    )
    kept = bind1(
        toks,
        lambda t: F.transform(
            F.array_except(F.sequence(F.lit(1), F.size(t)), cov),
            lambda p: F.element_at(t, p),
        ),
    )
    return joined.withColumn(out_col, F.concat_ws(" ", kept)).drop("__starts__")


def winnow_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 20,
    w: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Fingerprint-bucketed candidate document pairs — the consumer
    ``winnow_fingerprints`` exists for (VERDICT r11 item 1): instead of
    exploding EVERY n-token window onto the shuffle (duplicate_spans'
    exact path, ~doc_tokens rows per document), select the winnowed
    ~2/(w+1) density fingerprints per document and self-join on the
    fingerprint to get candidate pairs, with the same fan-out
    discipline as lsh_candidate_pairs (explicit numPartitions pin on
    the bucket key so AQE's bytes-based coalescing cannot serialize
    the pair fan-out; opt-in ``max_bucket`` cap so a degenerate
    fingerprint — shared boilerplate in f% of the corpus — cannot turn
    the join quadratic).

    Recall contract (Schleimer et al. SIGMOD'03 Theorem-1 shape,
    property-pinned in tests): any two documents sharing a verbatim
    run of >= n + w - 1 tokens share a selected fingerprint, so every
    such pair IS a candidate. Pairs sharing only shorter overlaps
    (n..n+w-2 tokens) may or may not surface — the deliberate
    affordability trade vs the full-window explosion. Returns
    (id_a, id_b), id_a < id_b, distinct.
    """
    fps = winnow_fingerprints(df, id_col, text_col, n=n, w=w)
    fps = _pin_fanout(fps, ["fingerprint"])
    fps = _cap_buckets(fps, ["fingerprint"], max_bucket)
    left = fps.withColumnRenamed(id_col, "id_a")
    right = fps.withColumnRenamed(id_col, "id_b")
    return (
        left.join(right, "fingerprint")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def verify_span_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 20,
) -> DataFrame:
    """Targeted span verification of candidate pairs: for each
    (id_a, id_b) in ``pairs``, count the DISTINCT n-token windows the
    two documents share; pairs sharing none are dropped. The verify
    half of the winnowed span pipeline — only CANDIDATE documents pay
    the window explosion (a semi-join prunes the corpus first), so the
    cost is candidate-volume-sized, not corpus-sized.

    Scale shape: one semi-join (id key) to restrict the window
    relation, one distinct on (id, span), then two keyed joins —
    pairs x spans(id_a) on the id key, then the composite
    (id_b, span) key — and one pair-key aggregate. A document in many
    candidate pairs replicates its window set once per partner; the
    candidate generator's ``max_bucket`` cap is the knob that bounds
    that hub fan-out. No collect, no cross join, no UDF.

    Returns (id_a, id_b, n_shared_spans) with n_shared_spans >= 1.

    Replay discipline (r12): ``pairs`` has THREE consumers here (both
    arms of the ids union plus the verify join) and ``spans`` has two
    (the a/b sides of the shared-window join); neither repeated subtree
    collapses to ReusedExchange under AQE (the r7-dsir class), so
    without persists the candidate generator's fingerprint self-join
    executes 3x and the candidate-doc window explosion + distinct 2x
    per run (r12 plan audit: plans/r12/winnow_span_pairs_before.txt).
    Both cached relations are candidate-volume sized — (id, id) pairs
    and the pruned docs' distinct windows — never corpus-sized, and
    both live in the bounded PREFIX_BASE FIFO.
    """
    from pyspark import StorageLevel

    pairs = PREFIX_BASE.retain(pairs.persist(StorageLevel.MEMORY_AND_DISK))
    ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .union(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    spans = _span_windows(
        df.join(ids, id_col, "left_semi"), id_col, text_col, span_tokens
    ).distinct()
    spans = PREFIX_BASE.retain(spans.persist(StorageLevel.MEMORY_AND_DISK))
    a = spans.select(F.col(id_col).alias("id_a"), F.col("__span__"))
    b = spans.select(F.col(id_col).alias("id_b"), F.col("__span__"))
    return (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "__span__"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_spans"))
    )


def winnowed_duplicate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 20,
    w: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """The affordable 100 TB span-dedup pipeline: winnowed fingerprint
    candidate generation (~2/(w+1) of windows on the shuffle) followed
    by targeted span verification (only candidate docs replay their
    windows). Detection guarantee: every pair sharing a verbatim run of
    >= n + w - 1 tokens is generated AND verified (its shared run
    contains a shared n-window); output pairs always share >= 1 exact
    n-token window (no false positives at the pair level)."""
    cand = winnow_candidate_pairs(
        df, id_col, text_col, n=n, w=w, max_bucket=max_bucket
    )
    return verify_span_pairs(df, cand, id_col, text_col, span_tokens=n)


def longest_duplicate_run(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 20,
    min_docs: int = 2,
    key: str = "text",
) -> DataFrame:
    """Per-document longest duplicated run: the length IN TOKENS of the
    longest contiguous region of each document in which EVERY n-token
    window appears in >= ``min_docs`` distinct documents corpus-wide —
    the headline substring-contamination statistic (Lee et al. ACL'22
    report exactly this distribution when motivating substring-level
    over document-level dedup; a doc with dup_fraction 0.05 hiding one
    400-token verbatim license block and a doc with 5% scattered
    duplicated 8-grams are different problems, and this statistic is
    what separates them).

    Position form: window start i is duplicated iff its n-window is;
    a maximal run of consecutive duplicated starts i..j covers
    (j - i) + n tokens. Documents with no duplicated window (or shorter
    than n tokens) report 0 — every input document emits a row (the
    "missing means 0" contract materialized, as span_dup_fraction's
    include_short does).

    Scale shape (span_dup_fraction's discipline): the window relation
    is built ONCE and flows through three narrow keyed shuffles —
    (1) the (span-key, id) pre-aggregate collects each doc's start
    positions for that span (map-side combine; list bounded by the
    span's occurrence count within the doc); (2) n_docs via a
    span-PARTITIONED count-only window over the pre-agg (one narrow
    row per containing doc, so a hot boilerplate span costs a
    doc-count pass, never a window-count pass); (3) the per-id rollup,
    where the run scan is ONE F.aggregate fold over the doc's sorted
    duplicated starts (JVM-side, list bounded by the doc's own window
    count — the same per-doc bound excise_duplicate_spans' covered-set
    already accepts). ``key='hash'`` swaps the shuffle key for hash64
    (8 bytes at 100 TB, SQL-replayable; collision contract as
    duplicate_spans). No UDF, no collect, no join back onto the window
    relation."""
    if key not in ("text", "hash"):
        raise ValueError(f"key must be 'text' or 'hash'; got {key!r}")
    n = int(span_tokens)
    toks = tokens(F.col(text_col))
    from dataframe_kotlin_spark.functions.text import bind1
    from dataframe_kotlin_spark.operators.skew import ensure_scan_parallelism

    win = bind1(
        toks,
        lambda t: F.transform(
            F.sequence(F.lit(1), F.size(t) - n + 1),
            lambda i: F.struct(
                i.alias("__i__"), F.concat_ws(" ", F.slice(t, i, n)).alias("__s__")
            ),
        ),
    )
    base = ensure_scan_parallelism(df)
    kexpr = F.col("__w__.__s__") if key == "text" else hash64(F.col("__w__.__s__"))
    wpos = (
        base.filter(F.size(toks) >= n)
        .select(F.col(id_col).alias(id_col), F.explode(win).alias("__w__"))
        .select(id_col, F.col("__w__.__i__").alias("__i__"), kexpr.alias("__k__"))
    )
    pre = wpos.groupBy("__k__", id_col).agg(
        F.collect_list("__i__").alias("__starts__")
    )
    nd = F.count(F.lit(1)).over(Window.partitionBy("__k__"))
    dup_starts = (
        pre.withColumn("__nd__", nd)
        .filter(F.col("__nd__") >= min_docs)
        .select(id_col, F.explode("__starts__").alias("__i__"))
    )
    # one fold over the sorted starts: state (prev, current run, best run)
    fold = lambda st: F.aggregate(
        st,
        F.struct(
            F.lit(-2).alias("p"), F.lit(0).alias("c"), F.lit(0).alias("b")
        ),
        lambda acc, x: F.struct(
            x.alias("p"),
            F.when(x == acc["p"] + 1, acc["c"] + 1).otherwise(F.lit(1)).alias("c"),
            F.greatest(
                acc["b"],
                F.when(x == acc["p"] + 1, acc["c"] + 1).otherwise(F.lit(1)),
            ).alias("b"),
        ),
        lambda acc: acc["b"],
    )
    longest = dup_starts.groupBy(id_col).agg(
        fold(F.sort_array(F.collect_set("__i__"))).alias("__run__")
    )
    return base.select(
        id_col,
        F.greatest(F.size(toks) - n + 1, F.lit(0))
        .cast("bigint")
        .alias("n_windows"),
    ).join(longest, id_col, "left").select(
        id_col,
        "n_windows",
        F.coalesce(
            F.col("__run__") + F.lit(n - 1), F.lit(0)
        ).cast("bigint").alias("longest_dup_run"),
    )


def span_store(
    df: DataFrame,
    text_col: str = "text",
    span_tokens: int = 20,
    key: str = "hash",
) -> DataFrame:
    """The distinct n-token-window key set of a corpus — the SPAN STORE
    an incremental pipeline maintains so each new crawl batch is
    checked against history WITHOUT rereading history's text (at
    100 TB the store is the only history artifact that is ever touched
    again). One column: ``span`` (key='text') or ``span_hash``
    (key='hash', the default here — the store is pure join key, so the
    8-byte hash64 form is the right at-rest shape; collisions conflate
    spans at ~N²/2⁶⁵, the candidate-generation contract shared with
    duplicate_spans).

    Scale shape: map-side window explosion, one distinct (span-key
    shuffle). Persist the output bucketed/sorted by the key column
    (sources.layout.write_bucketed) so every future batch join
    co-locates against the store with zero history-side shuffle;
    append-only maintenance is a union + distinct of the new batch's
    own windows."""
    if key not in ("text", "hash"):
        raise ValueError(f"key must be 'text' or 'hash'; got {key!r}")
    win = _span_windows(
        df.select(F.lit(1).alias("__sid__"), F.col(text_col)),
        "__sid__",
        text_col,
        span_tokens,
    )
    kcol = (
        F.col("__span__").alias("span")
        if key == "text"
        else hash64(F.col("__span__")).alias("span_hash")
    )
    return win.select(kcol).distinct()


def incremental_new_docs(
    batch: DataFrame,
    store: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Exact incremental dedup: the batch documents whose normalized
    md5 fingerprint is NOT in an existing corpus fingerprint store —
    the production crawl-ingest shape (dedup each new batch against
    everything already kept, without re-processing history; the store
    is ``exact_dedup(history).select('fingerprint')`` or its
    maintained union). Returns the surviving batch rows, all original
    columns.

    Scale shape: the batch fingerprints map-side; one LEFT ANTI join
    on the 16-byte key. The store is the big side at 100 TB (one row
    per distinct historical document) — keep it bucketed by ``fp_col``
    (sources.layout) so the anti-join co-locates with no store-side
    shuffle, and only the (small) batch moves; when the batch fits the
    broadcast threshold AQE runs the anti-join broadcast from the
    BATCH side's perspective automatically. md5 keys are uniform, so
    no skew handling is needed."""
    fp = F.md5(normalize(F.col(text_col)))
    tagged = batch.withColumn("__fp__", fp)
    return (
        tagged.join(
            store.select(F.col(fp_col).alias("__fp__")), "__fp__", "left_anti"
        )
        .drop("__fp__")
    )


def incremental_span_contamination(
    batch: DataFrame,
    store: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 20,
    key: str = "hash",
) -> DataFrame:
    """Per-batch-document contamination against a historical span
    store: (id, n_windows, n_seen, seen_fraction), where n_windows is
    the count of the document's DISTINCT n-token windows and n_seen
    how many of them already exist in the store — the quality/dedup
    signal an incremental pipeline thresholds on before admitting a
    crawl document (a doc whose windows are 95% already-seen adds
    almost no new text even if its exact fingerprint is novel). Every
    batch document emits a row; sub-span_tokens docs report (0, 0, 0).

    Scale shape: batch windows explode map-side and DISTINCT per (id,
    key); one semi-ish LEFT join against the store key column (store
    bucketed by key ⇒ no store-side shuffle, same layout argument as
    incremental_new_docs); one per-id rollup. ``key`` must match the
    store's column ('span' or 'span_hash')."""
    if key not in ("text", "hash"):
        raise ValueError(f"key must be 'text' or 'hash'; got {key!r}")
    n = int(span_tokens)
    kname = "span" if key == "text" else "span_hash"
    win = _span_windows(batch, id_col, text_col, n)
    kcol = (
        F.col("__span__") if key == "text" else hash64(F.col("__span__"))
    ).alias("__k__")
    bw = win.select(id_col, kcol).distinct()
    seen = store.select(F.col(kname).alias("__k__"), F.lit(1).alias("__hit__"))
    per = (
        bw.join(seen, "__k__", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
            F.sum(F.coalesce(F.col("__hit__"), F.lit(0)))
            .cast("bigint")
            .alias("n_seen"),
        )
    )
    return batch.select(id_col).join(per, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_windows"), F.lit(0)).cast("bigint").alias("n_windows"),
        F.coalesce(F.col("n_seen"), F.lit(0)).cast("bigint").alias("n_seen"),
        F.coalesce(
            F.col("n_seen") / F.col("n_windows"), F.lit(0.0)
        ).alias("seen_fraction"),
    )
