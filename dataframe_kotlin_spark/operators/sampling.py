"""Sampling / splitting operators for training-data pipelines.

Design rule: every split is a PURE FUNCTION of the row key, not of
``rand()``. At 100 TB a random split is irreproducible (task retries
resample) and unjoinable (the same document lands in train today, val
tomorrow). A multiplicative integer hash gives:

- determinism across runs, retries, and engines (plain BIGINT
  arithmetic — the duckdb oracle computes the identical value);
- stability under repartition (keyed on the value, not the task);
- disjoint, exhaustive buckets by construction.

``rand(seed)``-based ops (stratified_sample, reservoir_per_group) are
kept for when statistical independence from the key matters; their seed
makes a single run reproducible, but prefer hash_split for anything
that must be stable across pipelines.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Knuth's multiplicative constant (2^32 / phi), odd -> bijective mod 2^64;
# a second odd constant for the output stage so the two mixes differ.
_KNUTH = 2654435761
_MIX2 = 2246822519


def hash_bucket(key: Column, buckets: int = 100, salt: int = 0) -> Column:
    """Deterministic bucket in [0, buckets) from an integer key.

    Two multiplicative mixes with a mod-2^31 fold between them:
    ``pmod(pmod(key, 2^31) * K1 + salt * K2, 2^31) * K2 % buckets``.
    Plain BIGINT ops (max intermediate 2^31 * 2^32 < 2^63 — no overflow
    even under ANSI mode), so any engine (Spark, DuckDB, a feature
    store) reproduces the same assignment. The fold between the two
    multiplies is what makes different ``salt`` values genuinely
    independent splits — a single affine hash would only shift the
    bucket boundaries by a constant. |salt| must stay under ~10^9.
    """
    folded = F.pmod(key.cast("bigint"), F.lit(2**31))
    mixed = F.pmod(folded * F.lit(_KNUTH) + F.lit(salt) * F.lit(_MIX2), F.lit(2**31))
    return (mixed * F.lit(_MIX2)) % F.lit(buckets)


def hash_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    salt: int = 0,
    name: str = "split",
) -> DataFrame:
    """Label every row train/val/test (any names) by hashed key ranges.

    ``weights`` maps split name -> fraction (must sum to ~1). Buckets are
    permille-granular. Rows with the same key ALWAYS land in the same
    split — the property that prevents train/test leakage when the key
    is a document/user id duplicated across shards.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    b = hash_bucket(F.col(key), buckets=1000, salt=salt)
    expr = None
    lo = 0
    items = sorted(weights.items())  # deterministic boundary order
    for nm, w in items:
        hi = lo + int(round(w * 1000))
        cond = (b >= lo) & (b < hi) if nm != items[-1][0] else (b >= lo)
        expr = F.when(cond, nm) if expr is None else expr.when(cond, nm)
        lo = hi
    return df.withColumn(name, expr)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``df.sampleBy``): map-only, no
    shuffle; each task samples its partition independently."""
    return df.sampleBy(strata_col, fractions, seed)


def mix_weighted(
    sources: Sequence[tuple[DataFrame, float]],
    key: str,
    salt: int = 0,
    name: str = "source_id",
) -> DataFrame:
    """Mix N corpora at given sampling rates into one training stream.

    Each source keeps rows whose hash bucket falls under its rate
    (deterministic — re-running the pipeline yields the same mixture),
    tagged with its source index. Union is by name so schemas may be
    column-order-divergent; all sources must share the schema set.
    """
    parts = []
    for i, (df, rate) in enumerate(sources):
        kept = df.filter(hash_bucket(F.col(key), buckets=1000, salt=salt + i) < int(round(rate * 1000)))
        parts.append(kept.withColumn(name, F.lit(i)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def reservoir_per_group(
    df: DataFrame, keys: Sequence[str], k: int, seed: int = 42, order_salt: str | None = None
) -> DataFrame:
    """Uniform k-sample per group: rank by a seeded per-row hash-random
    and keep the first k. One shuffle on the group keys; equivalent to a
    distributed reservoir because the random order is exchangeable.
    ``order_salt`` names a unique column mixed into the randomness so
    ties are impossible; defaults to all non-key columns' hash.

    Determinism: the sort key is (hash, full tuple), so two rows can tie
    only if they are identical in every non-key column — in which case
    they are interchangeable and the output multiset is the same
    whichever wins. Distinct rows that collide in xxhash64 are broken by
    the tuple itself, never by partition order.
    """
    from pyspark.sql import Window

    salt_col = F.col(order_salt) if order_salt else F.struct(*[c for c in df.columns if c not in keys])
    rnd = F.xxhash64(salt_col, F.lit(seed))
    w = Window.partitionBy(*[F.col(c) for c in keys]).orderBy(rnd, salt_col)
    return (
        df.withColumn("__rs_rank__", F.row_number().over(w))
        .filter(F.col("__rs_rank__") <= k)
        .drop("__rs_rank__")
    )


def pack_sequences(
    df: DataFrame,
    key: str,
    token_col: str,
    budget: int,
    shards: int = 256,
    salt: int = 0,
) -> DataFrame:
    """Pack documents into fixed-token-budget training sequences.

    The standard concat-then-chop packing: documents are laid out in a
    deterministic order and each one is assigned the sequence whose
    window its START offset falls in (``seq_in_shard = offset //
    budget``). Long documents spill past their window boundary —
    the downstream tokenizer truncates or wraps; what matters here is a
    deterministic, reproducible doc→sequence assignment.

    Scale: a single global running sum would serialize 100 TB through
    one partition, so docs are first hash-sharded (pure function of the
    key — same determinism story as hash_split) and the running offset
    is computed per shard: one shuffle on ``__shard__``, each window
    sized data/shards. Output adds __shard__, seq_id (globally unique:
    shard * 2^32 + seq_in_shard), and offset_in_seq.
    """
    from pyspark.sql import Window

    shard = hash_bucket(F.col(key), buckets=shards, salt=salt)
    w = (
        Window.partitionBy("__shard__")
        .orderBy(F.col(key))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("__shard__", shard)
    offset = (F.sum(F.col(token_col)).over(w) - F.col(token_col)).cast("bigint")
    seq_in_shard = F.floor(offset / budget)
    return (
        out.withColumn("__offset__", offset)
        .withColumn("seq_id", (F.col("__shard__") * F.lit(2**32) + seq_in_shard).cast("bigint"))
        .withColumn("offset_in_seq", (F.col("__offset__") % budget).cast("bigint"))
        .drop("__offset__")
    )


def weighted_sample_per_group(
    df: DataFrame,
    keys: Sequence[str],
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Weighted k-sample WITHOUT replacement per group — Efraimidis &
    Spirakis A-ES: each row gets key ``-ln(u)/w`` with u a unit uniform
    and w its weight; the k smallest keys per group are a correct
    weighted sample (heavier rows draw stochastically smaller keys).

    u comes from md5 of (id, seed) — 13 hex chars = 52 uniform bits, +1
    so u is in (0, 1] and ln(u) is finite — so the sample is
    deterministic and reproducible in any engine (same recipe as
    hash_split: re-running the pipeline, or re-auditing it in SQL,
    yields the identical sample). One shuffle on the group keys;
    weights must be > 0.
    """
    from pyspark.sql import Window

    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))), 1, 13
            ),
            16,
            10,
        ).cast("double")
        + 1
    ) / F.lit(float(2**52))
    es_key = -F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(*keys).orderBy(es_key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__es_rank__", F.row_number().over(w))
        .filter(F.col("__es_rank__") <= k)
        .drop("__es_rank__")
    )


def _gram_bucket(gram: Column, buckets: int) -> Column:
    """Deterministic engine-portable feature hash: dedup.hash20 (first 5
    md5 hex chars as an int) mod buckets — ONE hash recipe across the
    engine, so a change to it cannot silently desync DSIR bucketing
    from the dedup/split hashing."""
    from dataframe_kotlin_spark.operators.dedup import hash20

    return hash20(gram) % buckets


def gram_bucket_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 256,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """The map-only front half of the hashed-n-gram featurizer: one row
    per unigram/bigram OCCURRENCE, tagged with its md5 feature bucket
    ``__b__``. Exposed separately so the 100x stage-attribution harness
    (tools/scale_measure.py dsir_stages) can time the tokenize +
    explode + hash cost apart from the bucket aggregation.

    The token array is BOUND once per row (text.bind1) before the
    bigram window — with the tokenizer expression referenced directly
    inside the per-element lambda, the document re-tokenized once per
    bigram (O(len^2)/row): the bigram build alone measured 38 s at
    100x, 1.5 s bound (functions/text.py interpreted-lambda rule)."""
    from dataframe_kotlin_spark.functions.text import bind1, tokens
    from dataframe_kotlin_spark.operators.skew import ensure_scan_parallelism

    # same guard as decontaminate: a single-row-group corpus would
    # serialize the gram expansion onto one task no matter the cores
    # (metadata-only probe, no-op on well-laid-out inputs)
    df = ensure_scan_parallelism(df)

    def uni_bi(t: Column) -> Column:
        bigrams = F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
            ),
        ).otherwise(F.array())
        return F.concat(t, bigrams)

    grams = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.explode(bind1(tokens(F.col(text_col)), uni_bi)).alias("__gram__"),
    )
    return grams.select(
        id_col, *carry, _gram_bucket(F.col("__gram__"), buckets).alias("__b__")
    )


def hashed_ngram_buckets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", buckets: int = 256
) -> DataFrame:
    """Hashed unigram+bigram bag-of-features per document: one row per
    (id, bucket) with the occurrence count. Map-side explode of the
    token and bigram arrays, one shuffle on (id, bucket)."""
    return (
        gram_bucket_rows(df, text_col, id_col, buckets)
        .groupBy(id_col, "__b__")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c__"))
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 256,
    alpha: float = 1.0,
    target_pred: Column | None = None,
) -> DataFrame:
    """DSIR importance weights (Data Selection via Importance Resampling,
    Xie et al. 2023, arXiv:2302.03169): score every raw document by how
    much more likely its hashed-n-gram features are under the TARGET
    distribution than under the RAW distribution —
    ``log w(x) = Σ_f c_f(x) · (ln p_target(f) − ln p_raw(f))`` with
    Laplace-``alpha`` smoothing over ``buckets`` feature buckets.
    Select high-weight docs to shift a crawl toward a curated target
    (the paper's use: picking pretraining data that "looks like"
    Wikipedia+books).

    Scale shape (round 7): the two smoothed log distributions are MODEL
    PARAMETERS — <= buckets count rows each — so they are computed by
    one eager aggregation job and COLLECTED, exactly like the k-means
    centroids, then inlined into the scoring pass as a literal
    per-bucket log-ratio array (`element_at`, no join at all). The
    corpus is gram-hashed exactly TWICE (the distribution job, the
    scoring pass) at any scale. The previous form kept everything in
    one lazy plan with the distributions as <= 256-row broadcast-join
    sides, relying on ReuseExchange to collapse the five consumers of
    the feature-bag subtree — under AQE that reuse does NOT happen
    (executed plan: 0 ReusedExchange, the gram explode ran 5x; the
    100x stage attribution measured the distribution build at 121 s of
    the query's 146 s — tools/scale_measure.py dsir_stages, SCALE.md).
    All hashing is the md5 recipe, so weights are engine-reproducible;
    the per-doc term keeps the c_f x (lpt - lpq) structure so weights
    stay bit-compatible with the SQL oracle's SUM(c*delta) form.

    Returns (id_col, log_weight) for every raw document. A document whose
    text is NULL (or tokenizes to nothing) carries no feature evidence, so
    its importance ratio is the empty product: log_weight 0.0 — such docs
    are kept in the output (left join back onto the raw ids) rather than
    silently dropped, so downstream joins on the weights see every id.

    When the target is a SLICE of the raw corpus, pass ``target_pred``
    (a boolean Column over raw's columns) instead of a second DataFrame:
    both distributions then come from ONE conditional aggregation over
    the same gram rows (the membership flag rides the gram explode
    map-side — r8: no id-list broadcast) — identical counts and buckets
    (so identical weights and oracles), and the distribution job costs
    one gram pass instead of two.
    """
    import math

    if (target is None) == (target_pred is None):
        raise ValueError("pass exactly one of target / target_pred")
    rows = gram_bucket_rows(raw, text_col, id_col, buckets)
    if target_pred is not None:
        # the membership flag is computed on raw's columns BEFORE the gram
        # explode and carried through it — no id join at all. The previous
        # form broadcast the full target ID LIST (one row per target doc,
        # SF-scaled: the same latent forced-broadcast class as the r7
        # surprisal LM, caught by the r8 hint audit); the flag column is
        # map-side at any corpus size and produces identical counts
        # (when(pred,1) is null where the old left join left nulls).
        flagged = raw.withColumn("__t__", F.when(target_pred, F.lit(1)))
        sums = (
            gram_bucket_rows(flagged, text_col, id_col, buckets, carry=("__t__",))
            .groupBy("__b__")
            .agg(
                F.count(F.lit(1)).alias("__nq__"),
                F.count(F.col("__t__")).alias("__nt__"),  # count skips null flags
            )
            .collect()
        )
        nq = {r["__b__"]: r["__nq__"] for r in sums}
        nt = {r["__b__"]: r["__nt__"] for r in sums}
    else:
        nq = {
            r["__b__"]: r["__n__"]
            for r in rows.groupBy("__b__").agg(F.count(F.lit(1)).alias("__n__")).collect()
        }
        trows = gram_bucket_rows(target, text_col, id_col, buckets)
        nt = {
            r["__b__"]: r["__n__"]
            for r in trows.groupBy("__b__").agg(F.count(F.lit(1)).alias("__n__")).collect()
        }
    tot_q, tot_t = float(sum(nq.values())), float(sum(nt.values()))

    def lp(n: float, tot: float) -> float | None:
        num, den = n + alpha, tot + alpha * buckets
        # alpha=0 + unseen bucket: Spark's F.log(<=0) was NULL; keep that
        return math.log(num / den) if num > 0 and den > 0 else None

    delta = []
    for b in range(buckets):
        lt, lq = lp(nt.get(b, 0), tot_t), lp(nq.get(b, 0), tot_q)
        delta.append(None if lt is None or lq is None else lt - lq)
    darr = F.array(
        *[
            F.lit(float(d)) if d is not None else F.lit(None).cast("double")
            for d in delta
        ]
    )
    # scoring: per-doc bucket counts (one row per (id, bucket) with count
    # c) x the literal log-ratio — same (id,bucket) agg as the feature
    # bags so the FP summation shape matches the oracle's SUM(c*delta)
    feats = hashed_ngram_buckets(raw, text_col, id_col, buckets)
    scored = feats.withColumn(
        "__term__",
        F.col("__c__") * F.element_at(darr, (F.col("__b__") + 1).cast("int")),
    )
    weights = scored.groupBy(id_col).agg(F.sum("__term__").alias("log_weight"))
    return (
        raw.select(id_col)
        .join(weights, id_col, "left")
        .select(id_col, F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"))
    )


def mixture_plan(
    df: DataFrame,
    source_col: str,
    token_col: str,
    weights: dict,
    budget: float,
    max_epochs: float = 1.0,
) -> DataFrame:
    """Token-budget mixture allocation across sources: given target mix
    ``weights`` (source -> fraction of the training budget) and a repeat
    cap, compute per source the requested tokens, the achievable
    allocation ``min(weight·budget, available·max_epochs)``, the epoch
    count that implies, and the deficit the cap leaves unfilled — the
    planning step before `mix_weighted` materializes a mixture (how
    LLM data recipes budget Wikipedia×N + crawl×M under repetition
    limits).

    One groupBy(source) aggregate — output is |sources| rows; the weight
    table is a literal broadcast. Sources absent from ``weights`` get
    weight 0 (reported with their availability, nothing allocated); a
    source named in ``weights`` but absent from ``df`` still gets a plan
    row (full outer join, availability 0) so its unmet budget share shows
    up as deficit instead of vanishing.
    """
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(k, float(v)) for k, v in weights.items()], f"{source_col} string, weight double"
    )
    avail = df.groupBy(source_col).agg(
        F.sum(F.col(token_col)).cast("double").alias("available_tokens")
    )
    req = F.coalesce(F.col("weight"), F.lit(0.0)) * budget
    av = F.coalesce(F.col("available_tokens"), F.lit(0.0))
    alloc = F.least(req, av * max_epochs)
    return (
        avail.join(wdf, source_col, "full_outer")
        .select(
            source_col,
            av.alias("available_tokens"),
            req.alias("requested_tokens"),
            alloc.alias("allocated_tokens"),
            F.when(av > 0, alloc / av).otherwise(F.lit(0.0)).alias("epochs"),
            (req - alloc).alias("deficit_tokens"),
        )
    )
