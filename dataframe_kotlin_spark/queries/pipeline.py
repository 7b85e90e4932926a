"""Training-data pipeline queries (SURVEY §7 P6): dedup, similarity
search, text analysis, multimodal plumbing — over documents/embeddings.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dataframe_kotlin_spark.core.frame import KDataFrame
from dataframe_kotlin_spark.functions.text import bind1, tokens
from dataframe_kotlin_spark.operators import (
    cachereg,
    dedup,
    multimodal,
    sampling,
    similarity,
    textpipe,
)
from dataframe_kotlin_spark.queries import query


def _sliding_bigrams(text_col):
    """Space-joined sliding bigrams of the token array, with the array
    BOUND once per row (text.bind1) — an element_at/slice on the raw
    tokenizer expression inside the per-element lambda re-tokenizes the
    document per gram, O(len^2)/row (functions/text.py
    interpreted-lambda rule; CollapseProject inlines a projected alias
    back into lambda bodies, so a select(...alias("t")) step does NOT
    protect against it)."""
    return bind1(
        tokens(text_col),
        lambda t: F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
        ),
    )


def _t(spark, sf_dir: str, name: str):
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# -- deduplication ---------------------------------------------------------
@query(
    "dedup_exact",
    oracle="""
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_dupes
    FROM documents GROUP BY fingerprint
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup by content fingerprint (operators/dedup.exact_dedup)."""
    return dedup.exact_dedup(_t(spark, sf_dir, "documents"), "text", "doc_id")


_MH_ORACLE_TERMS = ",\n".join(
    f"""           list_min(list_transform(toks,
               w -> ({2 * k + 3} * (('0x'||substr(md5(w),1,5))::BIGINT) + {5 * k + 1}) % 1048583)) AS mh{k}"""
    for k in range(8)
)


@query(
    "minhash_signatures",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             list_distinct(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS toks
      FROM documents
    )
    SELECT doc_id,
{_MH_ORACLE_TERMS}
    FROM tok
    """,
)
def minhash_signatures(spark, sf_dir):
    """8-function MinHash signature per document (operators/dedup.
    minhash_signature) — map-only, reproduced bit-for-bit by the oracle."""
    sig = dedup.minhash_signature(_t(spark, sf_dir, "documents"), "text", num_hashes=8)
    return sig.select("doc_id", *[f"mh{k}" for k in range(8)])


@query(
    "lsh_candidate_pairs",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             list_distinct(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS toks
      FROM documents
    ),
    sig AS (
      SELECT doc_id,
{_MH_ORACLE_TERMS}
      FROM tok
    ),
    banded AS (
      SELECT doc_id, 0 AS band_id, CONCAT(mh0, '_', mh1) AS band_key FROM sig
      UNION ALL SELECT doc_id, 1, CONCAT(mh2, '_', mh3) FROM sig
      UNION ALL SELECT doc_id, 2, CONCAT(mh4, '_', mh5) FROM sig
      UNION ALL SELECT doc_id, 3, CONCAT(mh6, '_', mh7) FROM sig
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM banded a JOIN banded b
      ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    """,
)
def lsh_candidate_pairs(spark, sf_dir):
    """MinHash-LSH candidate pairs: 4 bands x 2 rows (operators/dedup.
    lsh_candidate_pairs). Shuffle only on band buckets, no all-pairs join."""
    return dedup.lsh_candidate_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", num_hashes=8, bands=4
    )


_SIMHASH_BITS = 12
_SIMHASH_ORACLE = " + ".join(
    f"""CASE WHEN list_sum(list_transform(toks,
        w -> CASE WHEN ((('0x'||substr(md5(w),1,5))::BIGINT // {2**j}) % 2) = 1 THEN 1 ELSE -1 END)) > 0
        THEN {2**j} ELSE 0 END"""
    for j in range(_SIMHASH_BITS)
)


@query(
    "simhash_values",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             list_distinct(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS toks
      FROM documents
    )
    SELECT doc_id, CAST({_SIMHASH_ORACLE} AS BIGINT) AS simhash
    FROM tok
    """,
)
def simhash_values(spark, sf_dir):
    """12-bit SimHash per document (operators/dedup.simhash). keep_cols
    prunes the Arrow boundary to (doc_id, hash array) — the other three
    document columns and the full text never cross into Python
    (guide §4; r13)."""
    out = dedup.simhash(
        _t(spark, sf_dir, "documents"), "text", bits=_SIMHASH_BITS,
        keep_cols=["doc_id"],
    )
    return out.select("doc_id", "simhash")


@query(
    "simhash_hamming_pairs",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             list_distinct(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS toks
      FROM documents
    ), sig AS (
      SELECT doc_id, CAST({_SIMHASH_ORACLE} AS BIGINT) AS simhash
      FROM tok
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
    """,
)
def simhash_hamming_pairs(spark, sf_dir):
    """SimHash near-dup pairs by Hamming distance (operators/dedup.
    hamming_pairs): XOR + popcount over signatures, blocked on max_dist+1
    disjoint bit blocks (pigeonhole => full recall), so the Spark side's
    blocked equi-join must exactly reproduce the oracle's brute-force
    cross join."""
    sigs = dedup.simhash(
        _t(spark, sf_dir, "documents"), "text", bits=_SIMHASH_BITS,
        keep_cols=["doc_id"],
    )
    out = dedup.hamming_pairs(sigs, "doc_id", "simhash", max_dist=2, bits=_SIMHASH_BITS)
    return out.withColumn("hamming", F.col("hamming").cast("int"))


# 64-bit replay recipe for the DEPLOYMENT-width simhash: word hash =
# first 16 md5 hex chars as UBIGINT (bit-identical to Spark's signed
# hash64 — see dedup.hash64), per-bit majority via sign-safe shift+mask,
# weights summed in HUGEINT then cast back to the unsigned 64-bit lane.
_SIMHASH64_ORACLE = " + ".join(
    f"""CASE WHEN list_sum(list_transform(toks,
        w -> CASE WHEN ((('0x'||substr(md5(w),1,16))::UBIGINT >> {j}) & 1) = 1 THEN 1 ELSE -1 END)) > 0
        THEN CAST(power(2,{j}) AS HUGEINT) ELSE 0::HUGEINT END"""
    for j in range(64)
)


@query(
    "simhash_hamming_scaled",
    oracle=f"""
    WITH kept AS (
      SELECT MIN(doc_id) AS doc_id
      FROM documents
      GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
    ),
    tok AS (
      SELECT d.doc_id,
             list_distinct(string_split(trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g')), ' ')) AS toks
      FROM documents d JOIN kept USING (doc_id)
    ), sig AS (
      SELECT doc_id, CAST({_SIMHASH64_ORACLE} AS UBIGINT) AS s
      FROM tok
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.s, b.s)) AS INT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.s, b.s)) <= 3
    """,
)
def simhash_hamming_scaled(spark, sf_dir):
    """The SCALE-POSTURE simhash near-dup pass, driver-gated (VERDICT r7
    item 2): unlike simhash_hamming_pairs — whose 12-bit signatures are
    a test artifact whose blocks go near-universal at 500k docs — this
    runs the deployment form SCALE.md documents: EXACT DEDUP FIRST
    (exact-copy families share every signature block, so on a copy-
    heavy corpus the banded self-join is owed C(family·copies, 2)
    within-bucket candidates — ~1.3e10 at 100x by arithmetic; the same
    dedup-first posture as dedup_then_jaccard removes that term), then
    64-BIT signatures over the survivors (hash64 word hashes, bit 63 in
    the bigint sign bit; the numpy fold and the expr path stay
    bit-identical — integer math) with the ``max_bucket`` guard SET,
    data-proportional (max(256, survivors/2)): it clips only DEGENERATE
    blocks, so full pigeonhole recall provably holds at gate scales —
    measured max 16-bit-block bucket on survivors is well under the cap
    at sf0.01 (159) and sf0.1/100x (1639 vs cap 2496) — which is
    exactly what lets the brute-force oracle hash-match the banded
    join. The signature never leaves either engine (pairs + hamming
    only), so Spark's signed vs DuckDB's unsigned 64-bit lanes can't
    diverge (xor/popcount are sign-agnostic)."""
    docs = _t(spark, sf_dir, "documents")
    kept = dedup.exact_dedup(docs, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    survivors = docs.join(kept, "doc_id", "left_semi")
    n = survivors.count()
    sigs = dedup.simhash(survivors, "text", bits=64, keep_cols=["doc_id"])
    out = dedup.hamming_pairs(
        sigs, "doc_id", "simhash", max_dist=3, bits=64, max_bucket=max(256, n // 2)
    )
    return out.withColumn("hamming", F.col("hamming").cast("int"))


@query(
    "jaccard_pairs",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, source,
             list_distinct(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS toks
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
                 len(list_distinct(a.toks || b.toks)), 6) AS jaccard
    FROM tok a JOIN tok b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
          len(list_distinct(a.toks || b.toks)) >= 0.5
    """,
)
def jaccard_pairs(spark, sf_dir):
    """Word-set Jaccard near-dup pairs, blocked on (lang, source)
    (operators/dedup.jaccard_pairs)."""
    out = dedup.jaccard_pairs(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        block_cols=["lang", "source"],
        threshold=0.5,
    )
    return out.withColumn("jaccard", F.round(F.col("jaccard"), 6))


@query(
    "heavy_hitter_terms",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS item
      FROM documents
    ), counts AS (
      SELECT item, COUNT(*) AS count_lower FROM tok GROUP BY item
    )
    SELECT item, count_lower FROM counts
    WHERE count_lower >= 0.01 * (SELECT SUM(count_lower) FROM counts)
    """,
)
def heavy_hitter_terms(spark, sf_dir):
    """Misra-Gries heavy hitters (operators/sketches.heavy_hitters) over
    the exploded token stream: terms above 1% corpus share. Partition
    summaries are bounded at `capacity` counters, so the merge shuffles
    KB per partition instead of the raw token column. At capacity=100
    (>= this corpus's vocabulary) the summary is lossless, which lets
    the oracle pin EXACT counts; the lossy-compression regime and its
    n/capacity error guarantee are pinned in tests/test_approx.py."""
    from dataframe_kotlin_spark.operators import sketches

    d = _t(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens(F.col("text"))).alias("term"))
    return sketches.heavy_hitters(
        toks, "term", capacity=100, min_share=0.01, deterministic=True
    )


@query(
    "split_leakage_pairs",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, source,
             list_distinct(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS toks
      FROM documents
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
                   len(list_distinct(a.toks || b.toks)), 6) AS jaccard
      FROM tok a JOIN tok b
        ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
            len(list_distinct(a.toks || b.toks)) >= 0.5
    ), sp AS (
      SELECT doc_id,
             CASE WHEN ((((((doc_id % 2147483648) + 2147483648) % 2147483648)
                          * 2654435761) % 2147483648 + 2147483648) % 2147483648)
                       * 2246822519 % 1000 < 900
                  THEN 'train' ELSE 'val' END AS split
      FROM documents
    )
    SELECT p.id_a, p.id_b, sa.split AS split_a, sb.split AS split_b, p.jaccard
    FROM pairs p
      JOIN sp sa ON p.id_a = sa.doc_id
      JOIN sp sb ON p.id_b = sb.doc_id
    WHERE sa.split <> sb.split
    """,
)
def split_leakage_pairs(spark, sf_dir):
    """Train/val contamination audit: near-duplicate pairs (word-set
    Jaccard >= 0.5, blocked on lang+source) whose two sides land in
    DIFFERENT hash splits — exactly the documents that leak eval data
    into training. Composes sampling.hash_split with dedup.jaccard_pairs;
    the split side is a broadcast-able 2-column projection, so at 100 TB
    the only heavy stage is the blocked pair join itself."""
    from dataframe_kotlin_spark.operators import sampling

    d = _t(spark, sf_dir, "documents")
    splits = sampling.hash_split(
        d.select("doc_id"), "doc_id", {"train": 0.9, "val": 0.1}
    )
    pairs = dedup.jaccard_pairs(
        d, "doc_id", "text", block_cols=["lang", "source"], threshold=0.5
    ).withColumn("jaccard", F.round(F.col("jaccard"), 6))
    sa = splits.select(F.col("doc_id").alias("id_a"), F.col("split").alias("split_a"))
    sb = splits.select(F.col("doc_id").alias("id_b"), F.col("split").alias("split_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b", "jaccard")
    )


# -- similarity search -----------------------------------------------------
@query(
    "ann_bruteforce_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id % 100 = 0),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_dot_product(e.embedding::DOUBLE[], q.qv) /
               (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                sqrt(list_dot_product(q.qv, q.qv))) AS sim
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, ROUND(sim, 6) AS cosine_sim, CAST(rank AS INT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, neighbor_id) AS rank
          FROM scored)
    WHERE rank <= 5
    """,
)
def ann_bruteforce_topk(spark, sf_dir):
    """Brute-force cosine top-5 for probe vectors via the BLAS scale path
    (operators/similarity.cosine_topk_blas): bucketed cogroup + numpy
    matmul, per-bucket top-k pruning, exact final rank. The probe set
    stays a DataFrame end-to-end — nothing is collected to the driver,
    so the query scales with the corpus. The pure-JVM expression variant
    (similarity.cosine_topk) computes the same result."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    out = similarity.cosine_topk_blas(emb, probes, k=5)
    return out.withColumn("cosine_sim", F.round(F.col("cosine_sim"), 6))


@query(
    "ann_ivf_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, label, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id % 50 = 0),
    scored AS (
      SELECT q.query_id, e.label AS cell, e.vec_id AS neighbor_id,
             list_dot_product(e.embedding::DOUBLE[], q.qv) /
               (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                sqrt(list_dot_product(q.qv, q.qv))) AS sim
      FROM embeddings e JOIN q ON e.label = q.label
      WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, cell, neighbor_id, ROUND(sim, 6) AS cosine_sim, CAST(rank AS INT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, neighbor_id) AS rank
          FROM scored)
    WHERE rank <= 3
    """,
)
def ann_ivf_topk(spark, sf_dir):
    """IVF-style ANN: search only the query's coarse cell (label column as
    centroid assignment) — operators/similarity.ivf_topk."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 50 == 0)
    out = similarity.ivf_topk(emb, probes, cell_col="label", k=3)
    return out.withColumn("cosine_sim", F.round(F.col("cosine_sim"), 6))


@query(
    "neardup_embedding",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS cell,
           ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
             (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
              sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS cosine_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
          (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
           sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.35
    """,
)
def neardup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs blocked by coarse cell
    (operators/similarity.cosine_neardup_pairs). Threshold tuned to the
    synthetic embeddings (random vectors peak ~0.47 cosine)."""
    # r12: ~10 distinct labels -> the cell shuffle serialized the
    # quadratic fold onto 1 task (4.9 s warm at sf0.1); salt the pair
    # space (value-identical — see cosine_neardup_pairs). r13: S sized
    # from the observed largest cell, not the core count — a core-count
    # constant replicates the b-side by the cluster size whether or not
    # the pair space needs splitting (VERDICT r12 item 5).
    out = similarity.cosine_neardup_pairs(
        _t(spark, sf_dir, "embeddings"), cell_col="label", threshold=0.35,
        salt_parts="auto",
    )
    return out.withColumn("cosine_sim", F.round(F.col("cosine_sim"), 6))


# -- text analysis ---------------------------------------------------------
@query(
    "text_stats",
    oracle="""
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tokens,
           CAST(length(t) AS BIGINT) AS n_chars_norm,
           CAST(CEIL(length(t) / 4.0) AS BIGINT) AS approx_bpe_tokens,
           ROUND((length(t) - (len(string_split(t, ' ')) - 1)) * 1.0 /
                 GREATEST(len(string_split(t, ' ')), 1) + 1e-9, 4) AS mean_word_len
    FROM norm
    """,
)
def text_stats(spark, sf_dir):
    """Token counting + char stats (operators/textpipe.text_stats)."""
    out = textpipe.text_stats(_t(spark, sf_dir, "documents"), "text")
    return out.select("doc_id", "n_tokens", "n_chars_norm", "approx_bpe_tokens", "mean_word_len")


@query(
    "repetition_filter",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
      FROM documents
    ), grams AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 2 THEN
               list_transform(generate_series(1, len(toks) - 1),
                              i -> toks[i] || ' ' || toks[i + 1])
             ELSE [] END AS g2,
             CASE WHEN len(toks) >= 3 THEN
               list_transform(generate_series(1, len(toks) - 2),
                              i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
             ELSE [] END AS g3
      FROM tok
    )
    SELECT doc_id,
           CASE WHEN len(g2) <= 0 THEN 0.0
                ELSE ROUND((len(g2) - len(list_distinct(g2))) * 1.0 / len(g2) + 1e-9, 4)
           END AS dup_2gram_frac,
           CASE WHEN len(g3) <= 0 THEN 0.0
                ELSE ROUND((len(g3) - len(list_distinct(g3))) * 1.0 / len(g3) + 1e-9, 4)
           END AS dup_3gram_frac
    FROM grams
    """,
)
def repetition_filter(spark, sf_dir):
    """Gopher-style repetition quality gate (operators/textpipe.
    repetition_stats): duplicate 2-/3-gram fraction per document, the
    signal used to drop boilerplate/spam before training. Map-only pure
    Column expressions — fuses into the scan at 100 TB."""
    out = textpipe.repetition_stats(_t(spark, sf_dir, "documents"), "text", ns=(2, 3))
    return out.select("doc_id", "dup_2gram_frac", "dup_3gram_frac")


@query(
    "pack_sequences_stats",
    oracle="""
    WITH sharded AS (
      SELECT doc_id, n_chars,
             ((((doc_id % 2147483648) * 2654435761) % 2147483648)
               * 2246822519) % 8 AS shard
      FROM documents
    ), packed AS (
      SELECT shard,
             (SUM(n_chars) OVER (PARTITION BY shard ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_chars) AS off,
             n_chars
      FROM sharded
    )
    SELECT CAST(shard * 4294967296 + (off // 2000) AS BIGINT) AS seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS seq_chars
    FROM packed
    GROUP BY 1
    """,
)
def pack_sequences_stats(spark, sf_dir):
    """Training-sequence packing (operators/sampling.pack_sequences):
    concat-then-chop docs into 2000-char budget windows, hash-sharded
    (8 shards) so the running offset never serializes through one
    partition. The oracle recomputes shard + offset + seq assignment in
    plain SQL — packing is a pure function of (doc_id, n_chars)."""
    from dataframe_kotlin_spark.operators import sampling

    d = _t(spark, sf_dir, "documents")
    packed = sampling.pack_sequences(d, "doc_id", "n_chars", budget=2000, shards=8)
    return packed.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("seq_chars"),
    )


@query(
    "doc_fingerprints",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
           ('0x' || substr(md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), 1, 15))::BIGINT
             AS fingerprint_id
    FROM documents
    """,
)
def doc_fingerprints(spark, sf_dir):
    """Document fingerprinting (operators/textpipe.fingerprint): md5 +
    64-bit short id."""
    out = textpipe.fingerprint(_t(spark, sf_dir, "documents"), "text")
    return out.select("doc_id", "fingerprint", "fingerprint_id")


@query(
    "language_id",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang,
             list_distinct(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS toks
      FROM documents
    ),
    scores AS (
      SELECT doc_id, lang,
        len(list_intersect(toks, ['the','and','of','to','a','in','is','it'])) AS s_en,
        len(list_intersect(toks, ['der','die','das','und','ist','ein','nicht','mit'])) AS s_de,
        len(list_intersect(toks, ['el','la','de','que','y','en','un','es'])) AS s_es,
        len(list_intersect(toks, ['le','la','de','et','un','est','pas','pour'])) AS s_fr
      FROM tok
    )
    SELECT doc_id, lang AS actual_lang,
           CASE
             WHEN s_fr > GREATEST(s_en, s_de, s_es, 0) THEN 'fr'
             WHEN s_es > GREATEST(s_en, s_de, 0) THEN 'es'
             WHEN s_de > GREATEST(s_en, 0) THEN 'de'
             WHEN s_en > 0 THEN 'en'
             ELSE 'und'
           END AS pred_lang
    FROM scores
    """,
)
def language_id(spark, sf_dir):
    """Stopword-overlap language ID (operators/textpipe.detect_language).
    Later languages win ties in iteration order en<de<es<fr — mirrored in
    the oracle's CASE ladder."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        textpipe.detect_language(F.col("text")).alias("pred_lang"),
    )


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
    FROM documents WHERE doc_id % 10 = 0
    """,
)
def multimodal_features(spark, sf_dir):
    """Multimodal plumbing: binary payload column -> mapInPandas feature
    extraction (operators/multimodal.extract_features, stub decode).
    The oracle independently checks the byte-length feature; checksum and
    feature vector are covered by unit tests."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    media = multimodal.text_as_media(docs, "doc_id", "text")
    feats = multimodal.extract_features(media, decode_stub=True)
    return feats.select("media_id", "byte_len")


@query(
    "quality_filter",
    oracle="""
    WITH norm AS (
      SELECT doc_id, lang, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents
    ),
    feat AS (
      SELECT doc_id, lang,
             length(t) AS n_chars,
             GREATEST(len(string_split(t, ' ')), 1) AS n_tok,
             length(regexp_replace(t, '[^.,;:!?]', '', 'g')) AS punct,
             len(list_filter(string_split(t, ' '),
                 w -> list_contains(['the','and','of','to','a','in','is','it'], w))) AS sw
      FROM norm
    )
    SELECT doc_id, lang,
           ROUND((LEAST(n_chars / 500.0, 1.0) +
                  CASE WHEN n_chars * 1.0 / n_tok BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END +
                  CASE WHEN punct * 1.0 / GREATEST(n_chars, 1) <= 0.1 THEN 1.0 ELSE 0.5 END +
                  LEAST(sw * 5.0 / n_tok, 1.0)) / 4 + 1e-9, 4) AS quality
    FROM feat
    """,
)
def quality_filter(spark, sf_dir):
    """Heuristic quality scoring (operators/textpipe.score_quality,
    C4/Gopher-style length+punct+stopword rules)."""
    out = textpipe.score_quality(_t(spark, sf_dir, "documents"), "text")
    return out.select("doc_id", "lang", "quality")


# -- deterministic splitting / mixing --------------------------------------
@query(
    "hash_split_counts",
    oracle="""
    SELECT CASE WHEN bucket < 100 THEN 'test'
                WHEN bucket < 900 THEN 'train'
                ELSE 'val' END AS split,
           o_orderpriority,
           COUNT(*) AS n_orders
    FROM (SELECT o_orderpriority,
                 ((((((o_orderkey % 2147483648) + 2147483648) % 2147483648)
                     * 2654435761) % 2147483648 + 2147483648) % 2147483648)
                   * 2246822519 % 1000 AS bucket
          FROM orders)
    GROUP BY split, o_orderpriority
    """,
)
def hash_split_counts(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment as a pure
    function of the key (operators/sampling.hash_split) — the oracle
    recomputes the identical multiplicative hash in plain BIGINT
    arithmetic, proving the split is engine- and run-independent (task
    retries can't resample; same key can never leak across splits)."""
    from dataframe_kotlin_spark.operators import sampling

    o = _t(spark, sf_dir, "orders")
    return (
        sampling.hash_split(o, "o_orderkey", {"train": 0.8, "val": 0.1, "test": 0.1})
        .groupBy("split", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "mix_weighted_counts",
    oracle="""
    WITH h AS (
      SELECT o_orderkey, o_orderstatus, o_orderpriority,
             ((((((o_orderkey % 2147483648) + 2147483648) % 2147483648)
                 * 2654435761) % 2147483648 + 2147483648) % 2147483648)
               * 2246822519 % 1000 AS b0,
             ((((((o_orderkey % 2147483648) + 2147483648) % 2147483648)
                 * 2654435761 + 2246822519) % 2147483648 + 2147483648) % 2147483648)
               * 2246822519 % 1000 AS b1
      FROM orders)
    SELECT source_id, o_orderstatus, COUNT(*) AS n_rows FROM (
      SELECT 0 AS source_id, o_orderstatus FROM h
      WHERE o_orderpriority = '1-URGENT' AND b0 < 500
      UNION ALL
      SELECT 1 AS source_id, o_orderstatus FROM h
      WHERE o_orderpriority <> '1-URGENT' AND b1 < 200
    ) GROUP BY source_id, o_orderstatus
    """,
)
def mix_weighted_counts(spark, sf_dir):
    """Weighted corpus mixing (operators/sampling.mix_weighted): urgent
    orders kept at 50%, the rest at 20%, tagged by source. The oracle
    recomputes the per-source multiplicative hash (salt = source index)
    in plain BIGINT SQL — the mixture is a pure function of the key, so
    re-running the pipeline (or another engine) rebuilds the identical
    training mix."""
    from dataframe_kotlin_spark.operators import sampling

    o = _t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    rest = o.filter(F.col("o_orderpriority") != "1-URGENT")
    mixed = sampling.mix_weighted([(urgent, 0.5), (rest, 0.2)], "o_orderkey")
    return mixed.groupBy("source_id", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows")
    )


@query(
    "reservoir_counts",
    oracle="""
    SELECT o_custkey, LEAST(5, COUNT(*)) AS n_sampled
    FROM orders GROUP BY o_custkey
    """,
)
def reservoir_counts(spark, sf_dir):
    """Per-group reservoir sampling (operators/sampling.reservoir_per_group,
    k=5 per customer): the oracle pins the contract the sampler must hit
    exactly — min(k, group size) rows per group, both branches exercised
    (customers with <5 and >5 orders). Uniformity and determinism of
    WHICH rows are kept is pinned in tests/test_sampling.py."""
    from dataframe_kotlin_spark.operators import sampling

    o = _t(spark, sf_dir, "orders")
    r = sampling.reservoir_per_group(o, ["o_custkey"], k=5)
    return r.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_sampled"))


@query(
    "ann_ivf_trained",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    c0 AS (SELECT vec_id AS cell, e AS c FROM v WHERE vec_id < 4),
    d1 AS (
      SELECT v.vec_id, v.e, c0.cell,
             list_reduce(list_transform(range(1, 65), i -> (v.e[i]-c0.c[i])*(v.e[i]-c0.c[i])), (x,y) -> x+y) AS d2
      FROM v, c0
    ),
    a1 AS (
      SELECT vec_id, e, cell FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn FROM d1
      ) WHERE rn = 1
    ),
    m AS (SELECT cell, list(e ORDER BY vec_id) AS vs FROM a1 GROUP BY cell),
    c1 AS (
      SELECT cell,
             list_transform(list_reduce(vs, (a,b) -> list_transform(range(1, 65), i -> a[i]+b[i])),
                            x -> x / len(vs)) AS c
      FROM m
    ),
    d2t AS (
      SELECT v.vec_id, v.e, c1.cell,
             list_reduce(list_transform(range(1, 65), i -> (v.e[i]-c1.c[i])*(v.e[i]-c1.c[i])), (x,y) -> x+y) AS d2
      FROM v, c1
    ),
    af AS (
      SELECT vec_id, e, cell FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn FROM d2t
      ) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id % 100 = 0),
    qp AS (
      SELECT query_id, qv, cell FROM (
        SELECT q.query_id, q.qv, c1.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_reduce(list_transform(range(1, 65),
                            i -> (q.qv[i]-c1.c[i])*(q.qv[i]-c1.c[i])), (x,y) -> x+y),
                          c1.cell) AS rn
        FROM q, c1
      ) WHERE rn <= 2
    ),
    scored AS (
      SELECT qp.query_id, af.cell, af.vec_id AS neighbor_id,
             ROUND(
               list_reduce(list_transform(range(1, 65), i -> af.e[i]*qp.qv[i]), (x,y) -> x+y) /
               (sqrt(list_reduce(list_transform(range(1, 65), i -> af.e[i]*af.e[i]), (x,y) -> x+y)) *
                sqrt(list_reduce(list_transform(range(1, 65), i -> qp.qv[i]*qp.qv[i]), (x,y) -> x+y))),
               6) AS cosine_sim
      FROM af JOIN qp ON af.cell = qp.cell
      WHERE af.vec_id <> qp.query_id
    )
    SELECT query_id, CAST(cell AS BIGINT) AS cell, neighbor_id, cosine_sim, CAST(rank AS INT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine_sim DESC, neighbor_id) AS rank
          FROM scored)
    WHERE rank <= 5
    """,
)
def ann_ivf_trained(spark, sf_dir):
    """Learned-IVF ANN end-to-end, oracle-backed: deterministic k-means
    centroids (similarity.ivf_topk_det — sequential-fold Lloyd, k=4,
    one round), nprobe=2 probing, per-query top-5 by ROUNDED cosine.
    The oracle replays the identical left folds (DuckDB list_reduce
    over the same orders), so assignments, probe cells, similarities,
    and ranks hash-match bit-exactly. The faster commutative-agg
    training path stays available as train_ivf_centroids (recall vs
    brute force pinned in tests/test_ann_ivf.py)."""
    from dataframe_kotlin_spark.operators import similarity as sim

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 100 == 0)
    return sim.ivf_topk_det(emb, queries_df, k_cells=4, iters=1, nprobe=2, k=5)


@query(
    "ann_ivf_scaled",
    oracle="""
    SELECT vec_id AS query_id, CAST(10 AS INT) AS n_results, TRUE AS recall_ok
    FROM embeddings WHERE vec_id % 100 = 0
    """,
)
def ann_ivf_scaled(spark, sf_dir):
    """The SCALE-POSTURE learned-IVF ANN, driver-gated (VERDICT r6 item
    2): unlike ann_ivf_trained — which pins k_cells=4 and the
    sequential-fold Lloyd so the DuckDB oracle can replay every float —
    this query runs the path the engine actually ships at 100 TB:
    ``train_ivf_centroids`` with DATA-PROPORTIONAL cell count
    (k = max(4, N/500): cell size stays ~500 vectors as the corpus
    grows, the SCALE.md ANN rule; the Arrow-batch dgemm argmin engages
    automatically once k >= 32) and ``ivf_topk_trained`` probing.

    Learned centroids aren't SQL-expressible, so the oracle is
    determinism-safe the way the r6 HLL reformulation is: the query
    emits, per fixed probe (vec_id % 100 = 0), a structural check
    (exactly k=10 results came back — the probed cells held a full
    candidate set) and a recall boolean against the BLAS brute-force
    exact top-10 (>= 2 of 10 — far under the observed per-query minima
    of 3/3/5 hits at sf0.001/0.01/0.1, so only a broken cell
    assignment, probe expansion, or ranking flips it); the oracle
    reproduces the probe keys + literal 10/TRUE. Hit counts were
    measured run-over-run identical (centroid averages can move in the
    last ulp across aggregation orders, but a flip needs a vector
    within that ulp of a k-means boundary). The per-cell cogroup dgemm
    (ivf_topk_trained method='dgemm', r8) A/B'd NEUTRAL here — 17-21 s
    both paths at 100x — because the pair-scored form never shuffles
    the corpus (broadcast probes, scored in scan partitions) while the
    cogroup pays a corpus shuffle; at production dims (768-4096) the
    pair transfer grows ~12-64x while the cogroup's stays flat, which
    is when to flip the method. Rank sets verified identical across
    all three scoring paths.
    """
    from dataframe_kotlin_spark.operators import similarity as sim

    emb = _t(spark, sf_dir, "embeddings")
    n = emb.count()
    k_cells = max(4, n // 500)
    cents = sim.train_ivf_centroids(emb, "embedding", "vec_id", k=k_cells, iters=1)
    queries_df = emb.filter(F.col("vec_id") % 100 == 0)
    # n_results and the recall join BOTH consume the IVF result, and AQE
    # does not ReusedExchange the repeated subtree (the r7-dsir/r9-prefix
    # replay class). A/B at 100x measured the persist NEUTRAL (shuffle-
    # file reuse hides most of the replay warm), but the cached relation
    # is queries*k rows — a few KB at any corpus size — so pinning it
    # costs nothing and removes the replay risk outright.
    from pyspark import StorageLevel

    ivf = cachereg.QUERY_RESULTS.retain(
        sim.ivf_topk_trained(emb, queries_df, cents, k=10, nprobe=2).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    )
    brute = sim.cosine_topk_blas(emb, queries_df, k=10)
    nres = ivf.groupBy("query_id").agg(F.count(F.lit(1)).cast("int").alias("n_results"))
    hits = (
        ivf.join(brute.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    qids = queries_df.select(F.col("vec_id").alias("query_id"))
    return (
        qids.join(nres, "query_id", "left")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_results"), F.lit(0)).alias("n_results"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= 2).alias("recall_ok"),
        )
    )


@query(
    "ann_ivf_frame_topk",
    oracle="""
    SELECT vec_id AS query_id, CAST(10 AS INT) AS n_results, TRUE AS recall_ok
    FROM embeddings WHERE vec_id % 100 = 0
    """,
)
def ann_ivf_frame_topk(spark, sf_dir):
    """ann_ivf_scaled's search with the model EXECUTOR-RESIDENT end to
    end (r9; VERDICT r8 item 2's search-side completion): the Lloyd
    loop runs as ``train_ivf_centroids_frame`` (model = persisted k-row
    DataFrame, never collected) and ``ivf_topk_frame`` does assignment,
    probe selection AND scoring through the salted cogroup-dgemm paths
    — nothing model-sized ever reaches the driver or a task closure, so
    this exact plan shape survives a model that outgrows both. Same
    determinism-safe oracle contract as ann_ivf_scaled: per fixed probe
    (vec_id % 100 = 0), exactly 10 results came back and >= 2 of the
    BLAS brute-force exact top-10 were found (observed minima are far
    higher; only a broken cell assignment, probe expansion, or ranking
    flips the boolean). Rank-identity of ivf_topk_frame against the
    driver-list dgemm path is separately pinned in
    tests/test_centroid_frame.py, chunked model included."""
    from dataframe_kotlin_spark.operators import similarity as sim

    emb = _t(spark, sf_dir, "embeddings")
    n = emb.count()
    k_cells = max(4, n // 500)
    cents = sim.train_ivf_centroids_frame(emb, "embedding", "vec_id", k=k_cells, iters=1)
    queries_df = emb.filter(F.col("vec_id") % 100 == 0)
    # same replay class + same reasoning as ann_ivf_scaled's persist:
    # two consumers, no AQE reuse, queries*k-row cache = free insurance
    from pyspark import StorageLevel

    ivf = cachereg.QUERY_RESULTS.retain(
        sim.ivf_topk_frame(emb, queries_df, cents, k=10, nprobe=2).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    )
    brute = sim.cosine_topk_blas(emb, queries_df, k=10)
    nres = ivf.groupBy("query_id").agg(F.count(F.lit(1)).cast("int").alias("n_results"))
    hits = (
        ivf.join(brute.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    qids = queries_df.select(F.col("vec_id").alias("query_id"))
    return (
        qids.join(nres, "query_id", "left")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_results"), F.lit(0)).alias("n_results"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= 2).alias("recall_ok"),
        )
    )


@query(
    "ann_ivf_routed_topk",
    oracle="""
    SELECT CAST((SELECT COUNT(*) FROM embeddings WHERE vec_id % 100 = 0) AS BIGINT)
             AS n_queries,
           TRUE AS route_plan_ok, TRUE AS topk_complete, TRUE AS ranks_agree
    """,
)
def ann_ivf_routed_topk(spark, sf_dir):
    """The routed SEARCH posture, driver-gated (VERDICT r10 item 2:
    ivf_topk_frame on a coarse-routed chunked model was rank-identity
    TESTED but had no registered query — the same tracking-gap class
    r9/r10 closed for dedup and assign). This forces a multi-chunk
    model (2-cell chunks), runs the FULL search — corpus assignment,
    probe selection, per-cell cogroup BLAS scoring, global ranking —
    through ``route='coarse'``, and verifies the posture end to end
    with the boolean-contract oracle shape:

    - route_plan_ok — the routed search plan carries NO data-side
      ``explode(sequence(0, G-1))`` (the replicate layout's G-fold
      signature; anchored on the ``__g__`` output column so the
      model-side salt explodes can't false-match — the
      ivf_assign_routed_chunks discipline);
    - topk_complete — every probe query got exactly k=10 ranked rows
      from BOTH layouts;
    - ranks_agree — routed (query, rank) -> neighbor matches the
      replicate layout's, with the ulp-audit discipline: the two
      layouts cogroup different row batches through the same float64
      BLAS, so a razor-edge tie may flip a rank; a disagreement counts
      as REAL only when the two neighbors' cosine similarities differ
      by more than 1e-9 (cosines live in [-1, 1], so absolute epsilon
      IS the relative discipline here). The audit is a
      (queries x k)-row join — model-parameter sized at any corpus.

    Same iters=0 / small-k evidence sizing as ivf_assign_routed_chunks
    (VERDICT r10 item 4): routing exactness must hold for ANY centroid
    frame, and the k-proportional-to-N posture is already gated by
    ivf_assign_frame_scaled. r12 (VERDICT r11 item 3): the gate cost is
    construction, not data — this query deliberately shares its EXACT
    model lineage (full corpus, same k/iters/init/chunk_bytes) with
    ivf_assign_routed_chunks, so whichever runs first pays the one-off
    training + coarse-layer build and the other's construction is a
    pure memo hit (the user-facing cache the family ships); the r12
    gate window orders the assign posture first, so this row measures
    the SEARCH arms + rank audit, not a redundant rebuild of the same
    model (15.6 s cold-first in ORACLE_SWEEP_r11 -> target <8 s warm)."""
    import re

    from dataframe_kotlin_spark.operators import similarity as sim

    full = _t(spark, sf_dir, "embeddings")
    emb = full
    n = emb.count()
    k_cells = max(8, n // 400)
    cents = sim.train_ivf_centroids_frame(emb, "embedding", "vec_id", k=k_cells, iters=0)
    dim_row = emb.select(F.size("embedding").alias("d")).first()
    chunk = sim.centroid_model_bytes(2, int(dim_row["d"]))
    n_chunks = max(1, -(-sim.centroid_model_bytes(k_cells, int(dim_row["d"])) // chunk))
    queries_df = full.filter(F.col("vec_id") % 100 == 0)
    from pyspark import StorageLevel

    routed = cachereg.QUERY_RESULTS.retain(
        sim.ivf_topk_frame(
            emb, queries_df, cents, k=10, nprobe=2,
            chunk_bytes=chunk, route="coarse",
        ).persist(StorageLevel.MEMORY_AND_DISK)
    )
    plan = routed._jdf.queryExecution().executedPlan().toString()  # physical plan only: the full QE print is 4 plans / ~3x the bytes, pure gate latency
    gfold = re.search(
        rf"Generate explode\(sequence\(0, {n_chunks - 1},[^\n]*\[__g__#", plan
    )
    route_plan_ok = gfold is None and "MapInPandas" in plan
    rep = sim.ivf_topk_frame(
        emb, queries_df, cents, k=10, nprobe=2,
        chunk_bytes=chunk, route="replicate",
    )
    a = routed.select(
        "query_id", "rank",
        F.col("neighbor_id").alias("__na__"), F.col("cosine_sim").alias("__ca__"),
    )
    b = rep.select(
        "query_id", "rank",
        F.col("neighbor_id").alias("__nb__"), F.col("cosine_sim").alias("__cb__"),
    )
    j = a.join(b, ["query_id", "rank"], "full")
    # a neighbor mismatch is REAL only when the cosine gap exceeds the
    # ulp budget (or a similarity is missing on one side)
    gap_real = F.when(
        F.col("__ca__").isNull() | F.col("__cb__").isNull(), F.lit(True)
    ).otherwise(F.abs(F.col("__ca__") - F.col("__cb__")) > 1e-9)
    stats = j.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("__na__").isNull() | F.col("__nb__").isNull(), 1).otherwise(0)
        ).alias("n_miss"),
        F.sum(
            F.when((F.col("__na__") != F.col("__nb__")) & gap_real, 1).otherwise(0)
        ).alias("n_real"),
    )
    qids = queries_df.select(F.col("vec_id").alias("query_id"))
    per = qids.join(stats, "query_id", "left")
    agg = per.agg(
        F.count(F.lit(1)).alias("__nq__"),
        F.sum(
            F.when(F.coalesce(F.col("n_rows"), F.lit(0)) == 10, 0).otherwise(1)
        ).alias("__badq__"),
        F.sum(F.coalesce(F.col("n_miss"), F.lit(1))).alias("__miss__"),
        F.sum(F.coalesce(F.col("n_real"), F.lit(0))).alias("__real__"),
    )
    return agg.select(
        F.col("__nq__").cast("bigint").alias("n_queries"),
        F.lit(bool(route_plan_ok)).alias("route_plan_ok"),
        (F.col("__badq__") == 0).alias("topk_complete"),
        ((F.col("__miss__") == 0) & (F.col("__real__") == 0)).alias("ranks_agree"),
    )


@query(
    "term_frequency_topk",
    oracle="""
    WITH tok AS (
      SELECT lang,
             unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents
    ),
    cnt AS (SELECT lang, term, COUNT(*) AS n FROM tok WHERE term <> '' GROUP BY lang, term)
    SELECT lang, term, n, CAST(rank AS INT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, term) AS rank
          FROM cnt)
    WHERE rank <= 10
    """,
)
def term_frequency_topk(spark, sf_dir):
    """Corpus term statistics: top-10 terms per language. The classic
    vocabulary-building pass — explode is map-side, the count shuffles
    on (lang, term) with partial aggregation, and the top-k is a window
    over the already-tiny (lang, term, n) aggregate. Tokenization is the
    same whitespace-normalization recipe as dedup_exact, recomputed
    identically by the oracle."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(
            F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
        ).alias("term"),
    ).filter(F.col("term") != "")
    cnt = toks.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("term"))
    return cnt.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 10)


@query(
    "collocations_pmi",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
      FROM documents
    ), bi AS (
      SELECT t.g AS bigram,
             string_split(t.g, ' ')[1] AS w1,
             string_split(t.g, ' ')[2] AS w2
      FROM tok, LATERAL (
        SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                                     i -> toks[i] || ' ' || toks[i + 1])) AS g
      ) t
      WHERE len(toks) >= 2
    ), bc AS (SELECT bigram, w1, w2, COUNT(*) AS n_ab FROM bi GROUP BY 1, 2, 3),
       uc AS (
      SELECT w, COUNT(*) AS n_w FROM (
        SELECT unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS w
        FROM documents) GROUP BY w
    ), tot AS (
      SELECT (SELECT SUM(n_ab) FROM bc) AS n_bi, (SELECT SUM(n_w) FROM uc) AS n_uni
    )
    SELECT bigram, n_ab,
           ROUND(LN(n_ab * n_uni * n_uni / (n_bi * ua.n_w * ub.n_w)) + 1e-9, 4) AS pmi
    FROM bc, tot
      JOIN uc ua ON bc.w1 = ua.w
      JOIN uc ub ON bc.w2 = ub.w
    WHERE n_ab >= 20
    QUALIFY ROW_NUMBER() OVER (
      ORDER BY ROUND(LN(n_ab * n_uni * n_uni / (n_bi * ua.n_w * ub.n_w)) + 1e-9, 4) DESC,
               bigram) <= 25
    """,
)
def collocations_pmi(spark, sf_dir):
    """Bigram collocations by pointwise mutual information — the corpus
    signal for multiword expressions (and for spotting templated spam):
    PMI = ln(p(ab) / (p(a)p(b))) over sliding bigrams. One explode pass
    for bigrams, one for unigrams (both map-side), counts shuffle on the
    gram key, and the PMI join runs on the tiny aggregate with SIZE-GATED
    broadcast unigram counts (skew.gated_broadcast, VERDICT r7 item 1:
    the unigram vocabulary is bounded by distinct words, not corpus rows,
    but still unbounded as the corpus grows — above the session broadcast
    threshold the gate pins SHUFFLE_HASH instead); the two corpus totals
    join in as an unconditionally-broadcast 1-row frame (constant-sized —
    no gate needed). Ranked top-25 with the bigram string as tiebreak;
    rounded to 4 dp (+1e-9) for cross-engine log parity."""
    from dataframe_kotlin_spark.operators import skew
    from dataframe_kotlin_spark.operators.skew import ensure_scan_parallelism

    # r12: same single-task-explode guard as bigram_lm_topk (the bigram
    # AND unigram explodes both run from this scan; no-op at scale)
    docs = ensure_scan_parallelism(_t(spark, sf_dir, "documents"))
    toks = tokens(F.col("text"))
    grams = docs.filter(F.size(toks) >= 2).select(
        F.explode(_sliding_bigrams(F.col("text"))).alias("bigram")
    )
    bc = grams.withColumn("w1", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1))) \
        .withColumn("w2", F.split_part(F.col("bigram"), F.lit(" "), F.lit(2))) \
        .groupBy("bigram", "w1", "w2").agg(F.count(F.lit(1)).alias("n_ab"))
    uc = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    # both corpus totals ride the plan as a broadcast 1x1-row cross join —
    # no driver-side action anywhere in the query
    tot = bc.agg(F.sum("n_ab").cast("double").alias("__n_bi__")).crossJoin(
        uc.agg(F.sum("n_w").cast("double").alias("__n_uni__"))
    )
    ua = uc.select(F.col("w").alias("w1"), F.col("n_w").alias("n_a"))
    ub = uc.select(F.col("w").alias("w2"), F.col("n_w").alias("n_b"))
    est_words = skew.sampled_distinct_rows(
        docs.sample(fraction=0.02, seed=7).select(
            F.explode(tokens(F.col("text"))).alias("w")
        ),
        "w",
        0.02,
    )
    scored = (
        bc.filter(F.col("n_ab") >= 20)
        .join(skew.gated_broadcast(ua, est_words, bytes_per_row=64), "w1")
        .join(skew.gated_broadcast(ub, est_words, bytes_per_row=64), "w2")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    F.col("n_ab") * F.col("__n_uni__") * F.col("__n_uni__")
                    / (F.col("__n_bi__") * F.col("n_a") * F.col("n_b"))
                )
                + 1e-9,
                4,
            ),
        )
    )
    # orderBy+limit -> TakeOrderedAndProject (per-partition heaps), never
    # a single-partition global window for the top-k
    return (
        scored.orderBy(F.col("pmi").desc(), F.col("bigram"))
        .limit(25)
        .select("bigram", "n_ab", "pmi")
    )


@query(
    "tfidf_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok WHERE term <> '' GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok WHERE term <> '' GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, term, tfidf, CAST(rank AS INT) AS rank
    FROM (SELECT tf.doc_id, tf.term,
                 ROUND(tf * LN(CAST(n_docs AS DOUBLE) / df) + 1e-9, 6) AS tfidf,
                 ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                    ORDER BY ROUND(tf * LN(CAST(n_docs AS DOUBLE) / df) + 1e-9, 6) DESC,
                                             tf.term) AS rank
          FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
          WHERE tf.doc_id < 50)
    WHERE rank <= 3
    """,
)
def tfidf_top_terms(spark, sf_dir):
    """TF-IDF signature terms per document (top-3, first 50 docs).

    Plan shape for 100 TB: tf shuffles on (doc_id, term); df is a
    second aggregate on term alone (vocabulary-sized — can be large, so
    the tf-df join is NOT hint-broadcast: AQE broadcasts whichever side
    is actually small, here the doc-filtered tf); n_docs is a 1-row
    broadcast. Ranking uses the ROUNDED score so the order is
    reproducible across engines (raw doubles can differ in the last ulp
    of ln)."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
        ).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = docs.select(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.filter(F.col("doc_id") < 50)
        .join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")) + 1e-9, 6)
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tfidf", "rank")
    )


@query(
    "dedup_clusters",
    oracle="""
    WITH RECURSIVE tok AS (
      SELECT doc_id, lang, source,
             list_distinct(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS toks
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM tok a JOIN tok b
        ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
            len(list_distinct(a.toks || b.toks)) >= 0.5
    ),
    edges AS (SELECT id_a AS s, id_b AS d FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    )
    SELECT s AS doc_id, LEAST(s, MIN(d)) AS cluster_id
    FROM reach GROUP BY s
    """,
)
def dedup_clusters(spark, sf_dir):
    """Near-dup pairs -> clusters: the step after LSH/jaccard that a
    training pipeline actually consumes (one representative per cluster
    of mutually-similar documents). Spark runs iterative min-label
    propagation (operators/graph.py — one shuffle per round, rounds =
    cluster diameter); the oracle resolves the same components via a
    recursive transitive-closure CTE, which is exact but only feasible
    at oracle scale. cluster_id = smallest doc_id in the component on
    both engines."""
    from dataframe_kotlin_spark.operators import graph

    pairs = dedup.jaccard_pairs(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        block_cols=["lang", "source"],
        threshold=0.5,
    ).select("id_a", "id_b")
    return graph.connected_components(pairs, "id_a", "id_b").select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


@query(
    "fuzzy_pairs_editdist",
    oracle="""
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           levenshtein(a.text, b.text) AS edit_distance
    FROM documents a JOIN documents b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE abs(length(a.text) - length(b.text)) <= 80
      AND levenshtein(a.text, b.text) <= 80
    """,
)
def fuzzy_pairs_editdist(spark, sf_dir):
    """Edit-distance near-dup pairs (operators/dedup.levenshtein_pairs):
    the fuzzy-match complement to token-set jaccard — catches dups that
    differ by small character edits rather than word swaps. Blocked on
    (lang, source) with a length-band prune and a char-histogram lower
    bound; the JVM-side thresholded levenshtein abandons the DP past 80
    — the expensive compare only ever runs on length- and
    histogram-plausible same-block pairs."""
    return dedup.levenshtein_pairs(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        block_cols=["lang", "source"],
        max_dist=80,
    )


def _pii_oracle_sql() -> str:
    base = (
        "text || ' reach user' || CAST(doc_id AS VARCHAR) || '@mail.example.com or 10.2.' || "
        "CAST(doc_id % 256 AS VARCHAR) || '.9 ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || "
        "' tel 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    )
    expr = "raw"
    for _, pat, tok in textpipe.PII_RULES:
        expr = f"regexp_replace({expr}, '{pat}', '{tok}', 'g')"
    counts = ",\n           ".join(
        f"CAST(len(regexp_extract_all(raw, '{pat}')) AS INT) AS n_{name}"
        for name, pat, _ in textpipe.PII_RULES
    )
    return f"""
    WITH raw_t AS (SELECT doc_id, {base} AS raw FROM documents)
    SELECT doc_id,
           {expr} AS redacted,
           {counts}
    FROM raw_t
    """


@query("pii_redaction", oracle=_pii_oracle_sql())
def pii_redaction(spark, sf_dir):
    """PII scrub (textpipe.redact_pii/pii_counts): inject one synthetic
    email/SSN/phone/IP per document (deterministic from doc_id — both
    engines build the identical string), then redact and count. The
    string-equality hash check proves the Java-regex and RE2 dialects
    agree on these patterns — the reason PII_RULES bans lookaround."""
    docs = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" reach user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or 10.2."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".9 ssn 123-45-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" tel 415-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    with_raw = docs.select("doc_id", raw.alias("raw"))
    counted = textpipe.pii_counts(with_raw, "raw")
    redacted = textpipe.redact_pii(counted, "raw", out_col="redacted")
    return redacted.select(
        "doc_id",
        "redacted",
        *[F.col(f"n_{name}").cast("int").alias(f"n_{name}") for name, _, _ in textpipe.PII_RULES],
    )


@query(
    "inverted_index",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_distinct(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))) AS term
      FROM documents
    )
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS doc_freq,
           array_to_string(list_sort(list(doc_id)), ',') AS postings
    FROM tok GROUP BY term HAVING COUNT(*) >= 50
    """,
)
def inverted_index(spark, sf_dir):
    """Inverted index build: term -> sorted posting list of doc_ids, for
    terms appearing in >= 50 documents. One explode + one shuffle on the
    term; posting lists are sorted in the agg output (sort_array) so the
    layout is deterministic — the retrieval-side artifact a search or
    RAG pipeline materializes from a corpus. At 100 TB the doc_freq
    threshold is what bounds per-term posting size; hot terms beyond
    memory would shard by (term, doc_id range) — here the threshold
    keeps the demo exact. Posting lists are emitted as ','-joined
    strings: the gate canonicalizer hashes raw cells and cannot sort
    Python lists, and the serialized form carries identical information
    (sorted doc_ids)."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("term")
    )
    return (
        tok.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("doc_freq"),
            F.array_join(F.sort_array(F.collect_list("doc_id")), ",").alias("postings"),
        )
        .filter(F.col("doc_freq") >= 50)
    )


@query(
    "json_extract_props",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS min_k,
           CAST(MAX(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k,
           CAST(COUNT(*) - COUNT(props->>'k') AS BIGINT) AS n_missing
    FROM events
    GROUP BY event_type
    """,
)
def json_extract_props(spark, sf_dir):
    """Semi-structured column extraction: pull a typed field out of the
    events JSON `props` string and aggregate it per event type
    (get_json_object — JVM-side JSON path, no UDF). The reference reads
    whole JSON documents as frames (io/json.kt:27-131); a pipeline also
    needs per-cell extraction from a JSON *column*, which at scale runs
    inside the scan stage (map-only until the final agg)."""
    from dataframe_kotlin_spark.session import load_events

    ev = load_events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
            (F.count(F.lit(1)) - F.count("k")).cast("bigint").alias("n_missing"),
        )
    )


@query(
    "dq_profile_orders",
    oracle="""
    SELECT 'o_orderstatus' AS col_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_orderstatus) AS n_nulls,
           COUNT(DISTINCT o_orderstatus) AS n_distinct,
           CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
           MIN(o_orderstatus) AS min_str, MAX(o_orderstatus) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
           COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           CAST(MIN(o_totalprice) AS DOUBLE), CAST(MAX(o_totalprice) AS DOUBLE),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    """,
)
def dq_profile_orders(spark, sf_dir):
    """Data-quality profile (operators/quality.dq_profile): one aggregate
    pass over orders -> one stats row per column. The oracle recomputes
    each column's stats as UNION ALL branches; Spark does it in a single
    fused aggregation."""
    from dataframe_kotlin_spark.operators.quality import dq_profile

    orders = _t(spark, sf_dir, "orders")
    return dq_profile(
        orders, ["o_orderstatus", "o_custkey", "o_totalprice", "o_orderpriority"]
    )


@query(
    "bigram_lm_topk",
    oracle="""
    WITH tok AS (
      SELECT string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    big AS (
      SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
      FROM tok WHERE len(t) >= 2
    ),
    bc AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n FROM big GROUP BY bigram),
    uc AS (SELECT split_part(bigram, ' ', 1) AS w1, SUM(n) AS n1 FROM bc GROUP BY w1)
    SELECT bigram, n, ROUND(CAST(n AS DOUBLE) / n1, 6) AS cond_p
    FROM bc JOIN uc ON split_part(bc.bigram, ' ', 1) = uc.w1
    ORDER BY n DESC, bigram LIMIT 30
    """,
)
def bigram_lm_topk(spark, sf_dir):
    """Bigram language-model counts: top-30 bigrams with conditional
    probability P(w2|w1) = c(w1 w2) / c(w1 ·). The n-gram expansion is a
    JVM-side transform over the token array (element_at is 1-based,
    matching the oracle's list indexing); two shuffles (bigram counts,
    then first-word totals joined back). The denominator is derived FROM
    the bigram table — no second raw scan.

    NO ensure_scan_parallelism guard here (r13, VERDICT r12 item 7):
    r12 added it "for family consistency" with collocations_pmi /
    doc_surprisal_scores despite measuring a warm LOSS; the r13
    interleaved A/B confirmed the guard's extra exchange costs ~25%
    warm (0.75-0.83 s unguarded vs 0.97-1.19 s guarded, two rounds
    each) — unlike its siblings, this query consumes the explode ONCE,
    so the repartition buys nothing back. Reverted on measurement."""
    docs = _t(spark, sf_dir, "documents")
    big = docs.filter(F.size(tokens(F.col("text"))) >= 2).select(
        F.explode(_sliding_bigrams(F.col("text"))).alias("bigram")
    )
    bc = big.groupBy("bigram").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w1 = F.split(F.col("bigram"), " ").getItem(0)
    uc = bc.select(w1.alias("w1"), "n").groupBy("w1").agg(F.sum("n").alias("n1"))
    return (
        bc.join(uc, w1 == uc.w1)
        .select("bigram", "n", F.round(F.col("n") / F.col("n1"), 6).alias("cond_p"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(30)
    )


@query(
    "weighted_sample_langs",
    oracle="""
    WITH keyed AS (
      SELECT lang, doc_id, n_chars,
             -ln(((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 13))::BIGINT) + 1)
                 / 4503599627370496.0) / n_chars AS es_key
      FROM documents
    )
    SELECT lang, doc_id, n_chars FROM (
      SELECT lang, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY es_key, doc_id) AS rn
      FROM keyed
    ) WHERE rn <= 5
    """,
)
def weighted_sample_langs(spark, sf_dir):
    """Weighted per-group sampling (sampling.weighted_sample_per_group):
    5 docs per language, probability proportional to n_chars (A-ES
    exponential race). The md5-uniform makes the draw deterministic, so
    the oracle re-derives the exact same sample in SQL — auditable
    sampling, the property a training-data lineage review needs."""
    from dataframe_kotlin_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents")
    out = sampling.weighted_sample_per_group(
        docs, ["lang"], "doc_id", "n_chars", k=5, seed=7
    )
    return out.select("lang", "doc_id", "n_chars")


_BM25_TERMS = ("spark", "table", "query")
_BM25_K1, _BM25_B = 1.2, 0.75


def _bm25_oracle_sql() -> str:
    terms_sql = ", ".join(f"('{t}')" for t in _BM25_TERMS)
    return f"""
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    dls AS (SELECT doc_id, len(t) AS dl FROM tok),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dls),
    terms(term) AS (VALUES {terms_sql}),
    tf AS (
      SELECT doc_id, term, len(list_filter(t, x -> x = term)) AS tf
      FROM tok CROSS JOIN terms
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf WHERE tf > 0 GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             SUM(ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5)) *
                 tf.tf * ({_BM25_K1} + 1) /
                 (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dls.dl / stats.avgdl))
             ) AS score
      FROM tf
      JOIN dfreq USING (term)
      JOIN dls ON tf.doc_id = dls.doc_id
      CROSS JOIN stats
      WHERE tf.tf > 0
      GROUP BY tf.doc_id
    )
    SELECT doc_id, ROUND(score, 6) AS bm25
    FROM scored ORDER BY ROUND(score, 6) DESC, doc_id LIMIT 20
    """


@query("bm25_topk", oracle=_bm25_oracle_sql())
def bm25_topk(spark, sf_dir):
    """BM25 ranking for a fixed 3-term query (k1=1.2, b=0.75) — the
    scoring half of the inverted_index retrieval pair. All statistics
    (doc lengths, avgdl, per-term document frequency) are computed in
    one pass over the token arrays; the corpus-level scalars travel as a
    broadcast literal row, never a collect. Top-k orders by the ROUNDED
    score so cross-engine ln() ulp differences cannot flip the cutoff."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    dls = tok.select("doc_id", F.size("t").alias("dl"))
    stats = dls.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    terms = docs.sparkSession.createDataFrame(
        [(t,) for t in _BM25_TERMS], "term string"
    )
    tf = tok.crossJoin(F.broadcast(terms)).select(
        "doc_id",
        "term",
        F.size(F.filter(F.col("t"), lambda x: x == F.col("term"))).alias("tf"),
    )
    dfreq = tf.filter(F.col("tf") > 0).groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    k1, b = _BM25_K1, _BM25_B
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    part = idf * F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.filter(F.col("tf") > 0)
        .join(F.broadcast(dfreq), "term")
        .join(dls, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(part).alias("score"))
    )
    return (
        scored.select("doc_id", F.round("score", 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


@query(
    "chunk_documents",
    oracle="""
    WITH n AS (
      SELECT doc_id, text,
             CAST(ceil(greatest(length(text) - 120, 0) / 80.0) AS BIGINT) + 1 AS nchunks
      FROM documents
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_id,
           CAST(i * 80 AS BIGINT) AS char_start,
           substr(text, CAST(i * 80 + 1 AS INT), 120) AS chunk
    FROM n, LATERAL unnest(range(0, nchunks)) AS u(i)
    """,
)
def chunk_documents(spark, sf_dir):
    """Overlapping text chunking (textpipe.chunk_text): 120-char windows
    every 80 chars (40 overlap). Byte-exact oracle — both engines slice
    the identical substrings."""
    docs = _t(spark, sf_dir, "documents")
    return textpipe.chunk_text(docs, "text", size=120, stride=80, id_cols=["doc_id"])


@query(
    "doc_surprisal_scores",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    big AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
      FROM tok WHERE len(t) >= 2
    ),
    bc AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n FROM big GROUP BY bigram),
    uc AS (SELECT split_part(bigram, ' ', 1) AS w1, SUM(n) AS n1 FROM bc GROUP BY w1),
    lm AS (
      SELECT bigram, -ln(CAST(n AS DOUBLE) / n1) AS surprisal
      FROM bc JOIN uc ON split_part(bc.bigram, ' ', 1) = uc.w1
    )
    SELECT big.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(lm.surprisal), 5) AS avg_surprisal
    FROM big JOIN lm USING (bigram)
    GROUP BY big.doc_id
    """,
)
def doc_surprisal_scores(spark, sf_dir):
    """Bigram-LM fluency scoring: train the corpus bigram model (same
    tables as bigram_lm_topk), then score every document by its mean
    bigram surprisal -ln P(w2|w1) — the classic perplexity-proxy quality
    filter (low = repetitive/templated, high = incoherent). Two-stage
    composition: the LM is an aggregate of the same exploded bigram
    relation that scoring joins back against.

    The LM side of the scoring join is broadcast through a SIZE GATE
    (skew.gated_broadcast — VERDICT r7 item 1): the planner's size
    stats for a Generate are its child's, so with NO hint it broadcast
    the 50M-row EXPLODED CORPUS side — a single-task corpus-sized
    hash-relation build measured at 48 s of the query's 100x runtime
    (stats bug, not data size). But the LM is vocab-sized — bounded by
    distinct bigrams, not corpus rows, and UNBOUNDED as the corpus
    grows — so an unconditional broadcast is a latent executor OOM at
    a real 100 TB vocabulary. The gate estimates distinct bigrams from
    a 2% doc sample (upward-biased: one tiny extra job), broadcasts
    only while the estimate fits autoBroadcastJoinThreshold, and
    otherwise pins SHUFFLE_HASH on the LM side — deterministic side
    choice in both regimes, never trusting the known-wrong Generate
    stats."""
    from dataframe_kotlin_spark.operators import skew
    from dataframe_kotlin_spark.operators.skew import ensure_scan_parallelism

    # r12: the bigram explode feeds BOTH the LM aggregate and the
    # scoring join (map-only lineage — recompute over a corpus-sized
    # cache, the semdedup-tagged precedent), and a single-row-group
    # file serialized each pass onto one task. Guard is a no-op at
    # production file counts.
    docs = ensure_scan_parallelism(_t(spark, sf_dir, "documents"))
    big = docs.filter(F.size(tokens(F.col("text"))) >= 2).select(
        "doc_id", F.explode(_sliding_bigrams(F.col("text"))).alias("bigram")
    )
    bc = big.groupBy("bigram").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w1 = F.split(F.col("bigram"), " ").getItem(0)
    uc = bc.select(w1.alias("w1"), "n").groupBy("w1").agg(F.sum("n").alias("n1"))
    lm = bc.join(uc, w1 == uc.w1).select(
        "bigram", (-F.log(F.col("n") / F.col("n1"))).alias("surprisal")
    )
    est_vocab = skew.sampled_distinct_rows(
        docs.sample(fraction=0.02, seed=7).select(
            F.explode(_sliding_bigrams(F.col("text"))).alias("bigram")
        ),
        "bigram",
        0.02,
    )
    return (
        big.join(skew.gated_broadcast(lm, est_vocab, bytes_per_row=96), "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.avg("surprisal"), 5).alias("avg_surprisal"),
        )
    )


@query(
    "quantize_embeddings_int8",
    oracle="""
    WITH s AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS qscale
      FROM embeddings
    )
    SELECT vec_id, ROUND(qscale, 8) AS qscale,
           array_to_string(
             CASE WHEN qscale = 0 THEN list_transform(embedding, x -> 0)
                  ELSE list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) / qscale) AS INT))
             END, ',') AS qvec
    FROM s
    """,
)
def quantize_embeddings_int8(spark, sf_dir):
    """int8 embedding quantization (similarity.quantize_int8) — code-
    identical across engines because the scale/round arithmetic is
    pinned to DOUBLE. The quantized vector is serialized to a ','-joined
    string (and qscale rounded to 8 dp) so the gate canonicalizer — which
    sorts raw pandas cells and cannot hash Python lists — can compare it;
    the int8 codes themselves are unchanged."""
    emb = _t(spark, sf_dir, "embeddings")
    q = similarity.quantize_int8(emb)
    return q.select(
        "vec_id",
        F.round("qscale", 8).alias("qscale"),
        F.array_join(F.transform("qvec", lambda x: x.cast("string")), ",").alias("qvec"),
    )


@query(
    "winsorize_zscore_prices",
    oracle="""
    WITH stats AS (
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.05) AS lo,
             quantile_cont(o_totalprice, 0.95) AS hi,
             AVG(o_totalprice) AS mu,
             STDDEV_SAMP(o_totalprice) AS sd
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderkey, o_orderpriority,
           ROUND(LEAST(GREATEST(o_totalprice, lo), hi), 4) AS price_w,
           CASE WHEN sd > 0 THEN ROUND((o_totalprice - mu) / sd, 5) END AS price_z
    FROM orders JOIN stats USING (o_orderpriority)
    """,
)
def winsorize_zscore_prices(spark, sf_dir):
    """Feature prep (operators/features.winsorize + standardize): clip
    o_totalprice to per-priority 5/95 exact percentiles and z-score it.
    Stats are one grouped agg broadcast back; the transform is map-side
    (no window over the fact table)."""
    from dataframe_kotlin_spark.operators import features

    orders = _t(spark, sf_dir, "orders")
    out = features.winsorize(
        orders, ["o_totalprice"], keys=["o_orderpriority"], lower=0.05, upper=0.95
    )
    out = features.standardize(out, ["o_totalprice"], keys=["o_orderpriority"])
    return out.select(
        "o_orderkey",
        "o_orderpriority",
        F.round("o_totalprice_w", 4).alias("price_w"),
        F.round("o_totalprice_z", 5).alias("price_z"),
    )


@query(
    "incremental_agg_state",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(l_quantity) AS BIGINT) AS cnt,
           ROUND(SUM(CAST(l_quantity AS DOUBLE)), 4) AS sum_val,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_val,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_val
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def incremental_agg_state(spark, sf_dir):
    """Incremental aggregate maintenance (operators/incremental): build
    the state by folding three shipdate slices one at a time — exactly
    the daily-ingest path — and hash-match it against the oracle's
    one-shot GROUP BY over everything. Proves merge-associativity ON the
    gate, not just in tests. Double sums are rounded in both engines
    (fp addend order differs between the incremental and one-shot
    plans)."""
    from dataframe_kotlin_spark.operators import incremental as inc

    li = _t(spark, sf_dir, "lineitem")
    keys = ["l_returnflag", "l_linestatus"]
    slices = [
        li.filter(F.col("l_shipdate") < "1996-01-01"),
        li.filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-06-01")),
        li.filter(F.col("l_shipdate") >= "1997-06-01"),
    ]
    state = inc.increment(slices[0], keys, "l_quantity")
    for s in slices[1:]:
        state = inc.merge(state, inc.increment(s, keys, "l_quantity"), keys)
    return state.select(
        *keys,
        "cnt",
        F.round("sum_val", 4).alias("sum_val"),
        "min_val",
        "max_val",
    )


@query(
    "jaccard_prefix_pairs",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             list_distinct(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS toks
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
                 len(list_distinct(a.toks || b.toks)), 6) AS jaccard
    FROM tok a JOIN tok b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
          len(list_distinct(a.toks || b.toks)) >= 0.6
    """,
)
def jaccard_prefix_pairs(spark, sf_dir):
    """Prefix-filtered set-similarity self-join (dedup.
    jaccard_pairs_prefix): FULL-recall Jaccard >= 0.6 over the whole
    corpus with no blocking columns — candidates only where rare-token
    prefixes collide. The oracle is the brute-force all-pairs join, so a
    hash match proves the prefix filter lost nothing."""
    out = dedup.jaccard_pairs_prefix(
        _t(spark, sf_dir, "documents"), "doc_id", "text", threshold=0.6
    )
    return out.withColumn("jaccard", F.round(F.col("jaccard"), 6))


@query(
    "dedup_then_jaccard",
    oracle="""
    WITH kept AS (
      SELECT MIN(doc_id) AS doc_id
      FROM documents
      GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
    ),
    tok AS (
      SELECT d.doc_id,
             list_distinct(string_split(trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g')), ' ')) AS toks
      FROM documents d JOIN kept USING (doc_id)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
                 len(list_distinct(a.toks || b.toks)), 6) AS jaccard
    FROM tok a JOIN tok b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
          len(list_distinct(a.toks || b.toks)) >= 0.9
    """,
)
def dedup_then_jaccard(spark, sf_dir):
    """THE deployment answer for near-dup enumeration on COPY-HEAVY
    corpora (VERDICT r7 item 3; SCALE.md's dedup-then-enumerate
    posture): exact dedup first (fingerprint groupBy keeps the smallest
    id per normalized-text class), THEN full-recall prefix-filtered
    Jaccard over the survivors only. On a corpus where many documents
    are exact copies, enumerating pairs directly owes a pair PER COPY
    PAIR (>= 25M output pairs by arithmetic on the 100x-replicated
    corpus — the measured wall); collapsing exact classes first removes
    that term entirely, leaving the residual enumeration bound by the
    corpus's GENUINE near-dup pair count. That count is a property of
    the data, not the algorithm: this synthetic corpus is template-
    heavy (4,992 survivors at sf0.1 still owe 7.1M pairs at J>=0.6,
    0.9M at J>=0.9 — DuckDB brute-force ground truth), so the
    registered flow uses the near-dup REMOVAL threshold 0.9, where
    prefixes are short and the candidate set approaches the true pair
    set. Composition is one DAG: the semi-join on the kept ids flows
    straight into the prefix join, no collect. The oracle replays GROUP
    BY-first + brute-force pair join, so a hash match proves both the
    dedup class arithmetic and that the prefix filter lost nothing on
    the surviving set."""
    docs = _t(spark, sf_dir, "documents")
    kept = dedup.exact_dedup(docs, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    survivors = docs.join(kept, "doc_id", "left_semi")
    out = dedup.jaccard_pairs_prefix(survivors, "doc_id", "text", threshold=0.9)
    return out.withColumn("jaccard", F.round(F.col("jaccard"), 6))


@query(
    "pagerank_parts",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT l_partkey % 100 AS a, l_suppkey % 100 AS b
      FROM lineitem WHERE l_partkey % 100 <> l_suppkey % 100
    ),
    e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
    nodes AS (SELECT DISTINCT a AS node FROM e),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    deg AS (SELECT a, COUNT(*) AS d FROM e GROUP BY a),
    r0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes, nn),
    r1 AS (SELECT e.b AS node, (1 - 0.85) / ANY_VALUE(nn.n) + 0.85 * SUM(r0.r / deg.d) AS r
           FROM e JOIN deg ON e.a = deg.a JOIN r0 ON e.a = r0.node, nn GROUP BY e.b),
    r2 AS (SELECT e.b AS node, (1 - 0.85) / ANY_VALUE(nn.n) + 0.85 * SUM(r1.r / deg.d) AS r
           FROM e JOIN deg ON e.a = deg.a JOIN r1 ON e.a = r1.node, nn GROUP BY e.b),
    r3 AS (SELECT e.b AS node, (1 - 0.85) / ANY_VALUE(nn.n) + 0.85 * SUM(r2.r / deg.d) AS r
           FROM e JOIN deg ON e.a = deg.a JOIN r2 ON e.a = r2.node, nn GROUP BY e.b)
    SELECT CAST(node AS BIGINT) AS node, ROUND(r, 8) AS rank
    FROM r3
    """,
)
def pagerank_parts(spark, sf_dir):
    """3-iteration PageRank (operators/graph.pagerank) over the
    symmetric part~supplier co-occurrence graph (keys folded mod 100 to
    a fixed node space). The oracle unrolls the same three iterations as
    chained CTEs — an iterative distributed algorithm hash-matched
    exactly, not just rows-only."""
    from dataframe_kotlin_spark.operators.graph import pagerank

    li = _t(spark, sf_dir, "lineitem")
    e0 = (
        li.select(
            (F.col("l_partkey") % 100).alias("a"), (F.col("l_suppkey") % 100).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e = e0.select("a", "b").union(e0.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    out = pagerank(e, "a", "b", iters=3, damping=0.85)
    return out.select(
        F.col("node").cast("bigint").alias("node"), F.round("rank", 8).alias("rank")
    )


@query(
    "kmeans_det_assignments",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    c0 AS (SELECT vec_id AS cell, e AS c FROM v WHERE vec_id < 4),
    d1 AS (
      SELECT v.vec_id, v.e, c0.cell,
             list_reduce(list_transform(range(1, 65), i -> (v.e[i]-c0.c[i])*(v.e[i]-c0.c[i])), (x,y) -> x+y) AS d2
      FROM v, c0
    ),
    a1 AS (
      SELECT vec_id, e, cell FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn FROM d1
      ) WHERE rn = 1
    ),
    m AS (SELECT cell, list(e ORDER BY vec_id) AS vs FROM a1 GROUP BY cell),
    c1 AS (
      SELECT cell,
             list_transform(list_reduce(vs, (a,b) -> list_transform(range(1, 65), i -> a[i]+b[i])),
                            x -> x / len(vs)) AS c
      FROM m
    ),
    d2t AS (
      SELECT v.vec_id, c1.cell,
             list_reduce(list_transform(range(1, 65), i -> (v.e[i]-c1.c[i])*(v.e[i]-c1.c[i])), (x,y) -> x+y) AS d2
      FROM v, c1
    )
    SELECT vec_id, CAST(cell AS BIGINT) AS cell, ROUND(d2, 6) AS dist2
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn FROM d2t)
    WHERE rn = 1
    """,
)
def kmeans_det_assignments(spark, sf_dir):
    """Deterministic distributed k-means (similarity.kmeans_lloyd_det,
    k=4, one Lloyd round): every float reduction is a sequential left
    fold in a fixed order, so the oracle replays the identical doubles
    and the cluster assignments hash-match BIT-EXACTLY — an iterative ML
    loop on the correctness gate, closing the gap that keeps
    ann_ivf_trained rows-only."""
    out = similarity.kmeans_lloyd_det(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding", k=4, iters=1
    )
    return out.select(
        "vec_id", F.col("cell").cast("bigint").alias("cell"), F.round("dist2", 6).alias("dist2")
    )


@query(
    "curate_corpus",
    oracle="""
    WITH norm AS (
      SELECT doc_id, lang, source, text,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents
    ),
    feat AS (
      SELECT *,
             length(t) AS n_chars_n,
             GREATEST(len(string_split(t, ' ')), 1) AS n_tok,
             length(regexp_replace(t, '[^.,;:!?]', '', 'g')) AS punct,
             len(list_filter(string_split(t, ' '),
                 w -> list_contains(['the','and','of','to','a','in','is','it'], w))) AS sw,
             string_split(t, ' ') AS toks
      FROM norm
    ),
    scored AS (
      SELECT doc_id, lang, source, t, toks, n_chars_n,
             ROUND((LEAST(n_chars_n / 500.0, 1.0) +
                    CASE WHEN n_chars_n * 1.0 / n_tok BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END +
                    CASE WHEN punct * 1.0 / GREATEST(n_chars_n, 1) <= 0.1 THEN 1.0 ELSE 0.5 END +
                    LEAST(sw * 5.0 / n_tok, 1.0)) / 4 + 1e-9, 4) AS quality,
             CASE WHEN len(toks) >= 2 THEN
               ROUND((len(toks) - 1 - len(list_distinct(
                 list_transform(generate_series(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1]))))
                 * 1.0 / (len(toks) - 1) + 1e-9, 4)
             ELSE 0.0 END AS dup2,
             len(list_intersect(list_distinct(toks), ['the','and','of','to','a','in','is','it'])) AS s_en,
             len(list_intersect(list_distinct(toks), ['der','die','das','und','ist','ein','nicht','mit'])) AS s_de,
             len(list_intersect(list_distinct(toks), ['el','la','de','que','y','en','un','es'])) AS s_es,
             len(list_intersect(list_distinct(toks), ['le','la','de','et','un','est','pas','pour'])) AS s_fr
      FROM feat
    ),
    gated AS (
      SELECT doc_id, lang, source, t, n_chars_n, quality,
             md5(t) AS fp
      FROM scored
      WHERE quality >= 0.6 AND dup2 <= 0.3
        AND CASE
              WHEN s_fr > GREATEST(s_en, s_de, s_es, 0) THEN 'fr'
              WHEN s_es > GREATEST(s_en, s_de, 0) THEN 'es'
              WHEN s_de > GREATEST(s_en, 0) THEN 'de'
              WHEN s_en > 0 THEN 'en'
              ELSE 'und'
            END = lang
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS fp_rn
        FROM gated
      ) WHERE fp_rn = 1
    ),
    capped AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY source
          ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT, doc_id
        ) AS cap_rn
        FROM deduped
      ) WHERE cap_rn <= 30
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(quality) + 1e-9, 4) AS avg_quality,
           CAST(SUM(n_chars_n) AS BIGINT) AS total_chars
    FROM capped GROUP BY source
    """,
)
def curate_corpus(spark, sf_dir):
    """Flagship end-to-end curation pipeline, ONE declarative plan:
    quality gate (C4-style score >= 0.6) -> repetition gate (dup-2gram
    <= 0.3) -> language-consistency gate (predicted == recorded) ->
    exact dedup (min doc_id per content fingerprint) -> deterministic
    per-source cap (30 docs, md5-hash order) -> per-source stats.

    All three gates are map-side expressions fused into the single scan;
    the whole pipeline shuffles exactly twice (fingerprint dedup, source
    cap) before the final agg. This is the composition story: every
    stage is an existing operator (score_quality, repetition_stats,
    detect_language, fingerprint) chained through Catalyst as one DAG."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    d = textpipe.score_quality(docs, "text")
    d = textpipe.repetition_stats(d, "text", ns=(2,))
    d = d.withColumn("pred_lang", textpipe.detect_language(F.col("text")))
    d = textpipe.fingerprint(d, "text")
    d = d.filter(
        (F.col("quality") >= 0.6)
        & (F.col("dup_2gram_frac") <= 0.3)
        & (F.col("pred_lang") == F.col("lang"))
    )
    w_fp = Window.partitionBy("fingerprint").orderBy("doc_id")
    d = d.withColumn("__fp_rn__", F.row_number().over(w_fp)).filter(F.col("__fp_rn__") == 1)
    order = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10).cast("bigint")
    w_src = Window.partitionBy("source").orderBy(order.asc(), F.col("doc_id"))
    d = d.withColumn("__cap_rn__", F.row_number().over(w_src)).filter(F.col("__cap_rn__") <= 30)
    from dataframe_kotlin_spark.functions.text import normalize

    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        # +1e-9: averages of 4-decimal scores sit exactly on round
        # boundaries; the nudge keeps both engines on the same side
        # regardless of summation order (see queries/__init__ policy)
        F.round(F.avg("quality") + 1e-9, 4).alias("avg_quality"),
        F.sum(F.length(normalize(F.col("text")))).cast("bigint").alias("total_chars"),
    )


@query(
    "semdedup_survivors",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    c0 AS (SELECT vec_id AS cell, e AS c FROM v WHERE vec_id < 4),
    d1 AS (
      SELECT v.vec_id, v.e, c0.cell,
             list_reduce(list_transform(range(1, 65), i -> (v.e[i]-c0.c[i])*(v.e[i]-c0.c[i])), (x,y) -> x+y) AS d2
      FROM v, c0
    ),
    a1 AS (
      SELECT vec_id, e, cell FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn FROM d1
      ) WHERE rn = 1
    ),
    m AS (SELECT cell, list(e ORDER BY vec_id) AS vs FROM a1 GROUP BY cell),
    c1 AS (
      SELECT cell,
             list_transform(list_reduce(vs, (a,b) -> list_transform(range(1, 65), i -> a[i]+b[i])),
                            x -> x / len(vs)) AS c
      FROM m
    ),
    d2t AS (
      SELECT v.vec_id, v.e, c1.cell,
             list_reduce(list_transform(range(1, 65), i -> (v.e[i]-c1.c[i])*(v.e[i]-c1.c[i])), (x,y) -> x+y) AS d2
      FROM v, c1
    ),
    asg AS (
      SELECT vec_id, e, cell FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn FROM d2t
      ) WHERE rn = 1
    ),
    pr AS (
      SELECT b.vec_id AS ib
      FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE list_reduce(list_transform(range(1, 65), i -> a.e[i]*b.e[i]), (x,y) -> x+y) /
            (sqrt(list_reduce(list_transform(range(1, 65), i -> a.e[i]*a.e[i]), (x,y) -> x+y)) *
             sqrt(list_reduce(list_transform(range(1, 65), i -> b.e[i]*b.e[i]), (x,y) -> x+y))) >= 0.35
    )
    SELECT vec_id, CAST(cell AS BIGINT) AS cell
    FROM asg WHERE vec_id NOT IN (SELECT ib FROM pr)
    """,
)
def semdedup_survivors(spark, sf_dir):
    """SemDeDup semantic dedup (dedup.semdedup_prune; Abbas et al. 2023):
    deterministic k-means cells (k=4, one Lloyd round — the bit-exact
    kmeans_lloyd_det recipe the oracle replays) block the within-cluster
    cosine self-join; above-threshold pairs drop the larger id. The
    whole pass is cell-key-blocked joins — no all-pairs, no collect —
    and every float is a sequential fold, so survivor sets hash-match
    the SQL replay exactly."""
    emb = _t(spark, sf_dir, "embeddings")
    asg = similarity.kmeans_lloyd_det(emb, "vec_id", "embedding", k=4, iters=1)
    tagged = emb.join(asg.select("vec_id", F.col("cell").cast("bigint").alias("cell")), "vec_id")
    # r12: k is PINNED at 4 (the oracle replays every float, which caps
    # k), so the cell shuffle has 4 non-empty partitions and the
    # quadratic within-cell fold serialized onto one task (11.4 s warm
    # at sf0.1, every stage 1 task). Salt the pair space — pair set and
    # every per-pair fold value-identical; see cosine_neardup_pairs.
    # r13: S sized from the observed largest cell, not the core count
    # (VERDICT r12 item 5 — bounded b-side replication).
    out = dedup.semdedup_prune(
        tagged, "cell", "embedding", "vec_id", threshold=0.35,
        salt_parts="auto",
    )
    return out.select("vec_id", "cell")


@query(
    "semdedup_scaled",
    oracle="""
    SELECT CAST((SELECT COUNT(*) FROM embeddings) AS BIGINT) AS n_total,
           TRUE AS partition_ok, TRUE AS prune_sound,
           TRUE AS prune_complete, TRUE AS no_dup_survivors
    """,
)
def semdedup_scaled(spark, sf_dir):
    """The SCALE-POSTURE SemDeDup, driver-gated (VERDICT r7 item 2):
    unlike semdedup_survivors — which pins k=4 deterministic-Lloyd cells
    so DuckDB can replay every float, making the within-cell pair join
    QUADRATIC in N/4 at 100x — this runs the deployment form (the
    SemDeDup paper's): ``train_ivf_centroids`` with DATA-PROPORTIONAL
    cell count (k = max(4, N/500), cell size stays ~500 as the corpus
    grows — the same rule as ann_ivf_scaled; the Arrow dgemm argmin
    engages at k >= 32) and the fast commutative-agg clustering.

    Learned centroids aren't SQL-expressible, so the oracle is the
    boolean-contract kind (the ann_ivf_scaled / r6-HLL template): the
    query emits corpus-level facts the oracle reproduces literally —
    n_total, plus four booleans VERIFIED DISTRIBUTED-SIDE in Spark:
    partition_ok (every vector got exactly one non-null cell in
    [0, k)), prune_sound (the survivor set is exactly disjoint from the
    drop list — since r12 computes pairs ONCE and derives survivors by
    the same left_anti join semdedup_prune performs, this boolean is an
    anti-join structural check, not an independent pair-score recheck;
    dgemm-path score consistency is instead pinned by tests against the
    expr fold), prune_complete (survivors + distinct dropped ids
    partition the corpus exactly), and no_dup_survivors (no two
    IDENTICAL embeddings both survive — identical vectors always share
    a cell and have cosine 1, so clustering nondeterminism can never
    excuse a duplicate pair). A broken cell assignment, pair join,
    threshold, or anti-join flips a boolean and the hash mismatches.
    All checks are aggregates over the same cell-blocked relations the
    operator itself uses — one DAG, no collect, no all-pairs join. Pair
    scoring runs the per-cell BLAS self-similarity ONCE (method='dgemm':
    each vector ships ONCE per cell task and the cell scores as one
    normalized X @ X.T — the interpreted fold measured 65 s of the 100x
    pass alone, and the pair-materialized Arrow form still shipped
    ~1 KB per candidate pair); prune, audit aggregates, and survivor
    derivation all consume that one persisted drop list (r12: 5 dgemm
    passes -> 1), so threshold decisions are path-consistent by
    construction."""
    emb = _t(spark, sf_dir, "embeddings")
    n = emb.count()
    k_cells = max(4, n // 500)
    cents = similarity.train_ivf_centroids(emb, "embedding", "vec_id", k=k_cells, iters=1)
    # `tagged` has three consumers (the prune, the verification pair
    # pass, the partition aggregate) and AQE won't ReusedExchange them —
    # but its lineage is MAP-ONLY (scan + closure dgemm argmin), so the
    # scale-correct choice is RECOMPUTE, not a full-corpus-sized cache:
    # persisting here was A/B'd neutral at 100x and at a literal 100 TB
    # it would trade 3 map passes for 100 TB of cache spill. Contrast
    # jaccard_pairs_prefix's base persist (r9), where the replayed
    # subtree contains the caller's whole shuffle-heavy dedup.
    tagged = similarity.assign_cells(emb, cents, "embedding", "cell")
    # r12 optimization: the per-cell dgemm pair scoring is the query's
    # one expensive pass (cell shuffle + cogroup BLAS), and it used to
    # execute FIVE times — semdedup_prune built its own pairs->dropped->
    # anti-join internally, the verification pass built the same pairs
    # again, and `dropped`/`surv` then fanned into the four audit
    # aggregates with no AQE subtree reuse (the r7-dsir replay class;
    # plans/r12/semdedup_scaled_before.txt shows 5 FlatMapGroupsInPandas
    # nodes). Compute the pairs ONCE, persist only the drop-id list —
    # ids only, bounded by n rows, narrow at any corpus size (the
    # persist-wins shape: expensive replay, cheap cache — unlike the
    # deliberately-recomputed map-only `tagged`) — and derive the
    # survivors by the SAME anti-join semdedup_prune performs
    # (dedup.py:652-656: dropped = distinct id_b, keep = left_anti), so
    # the surviving set is unchanged row for row. 5 dgemm passes -> 1.
    from pyspark import StorageLevel

    pairs = similarity.cosine_neardup_pairs(
        tagged, "cell", vec_col="embedding", id_col="vec_id", threshold=0.35, method="dgemm"
    )
    dropped = cachereg.QUERY_RESULTS.retain(
        pairs.select(F.col("id_b").alias("vec_id"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    surv = tagged.join(dropped, "vec_id", "left_anti")
    a_part = tagged.agg(
        F.count(F.lit(1)).alias("n_asg"),
        F.count_distinct("vec_id").alias("n_ids"),
        F.sum(
            F.when(
                F.col("cell").isNull() | (F.col("cell") < 0) | (F.col("cell") >= k_cells), 1
            ).otherwise(0)
        ).alias("n_bad_cell"),
    )
    a_surv = surv.agg(F.count(F.lit(1)).alias("n_surv"))
    a_drop = dropped.agg(F.count(F.lit(1)).alias("n_drop"))
    a_sound = (
        surv.select("vec_id").join(dropped, "vec_id").agg(F.count(F.lit(1)).alias("n_unsound"))
    )
    a_dup = (
        surv.groupBy("embedding")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("n_dup_groups"))
    )
    return (
        a_part.crossJoin(a_surv)
        .crossJoin(a_drop)
        .crossJoin(a_sound)
        .crossJoin(a_dup)
        .select(
            F.lit(n).cast("bigint").alias("n_total"),
            ((F.col("n_asg") == n) & (F.col("n_ids") == n) & (F.col("n_bad_cell") == 0)).alias(
                "partition_ok"
            ),
            (F.col("n_unsound") == 0).alias("prune_sound"),
            ((F.col("n_surv") + F.col("n_drop")) == n).alias("prune_complete"),
            (F.coalesce(F.col("n_dup_groups"), F.lit(0)) == 0).alias("no_dup_survivors"),
        )
    )



def _cell_disagreement_audit(dis, emb, cents, col_a, col_b):
    """1-row frame (n_real_disagree) for the frame-assignment posture
    queries: expression-fold audit of DISAGREEING rows only — both
    claimed cells' squared distances recomputed as the zip_with fold,
    and a disagreement counts as REAL only when the gap exceeds 1e-9
    relative (otherwise it is the documented cross-path last-ulp tie).
    The joins touch only the disagreeing rows (expected zero), so the
    audit is free at any scale. Shared by ivf_assign_frame_scaled and
    ivf_assign_routed_chunks (r10 review finding: the block had
    diverged-by-copy potential)."""

    def _d2(v, c):
        return F.aggregate(
            F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    ca = cents.select(F.col("cell").alias(col_a), F.col("centroid").alias("__ca__"))
    cb = cents.select(F.col("cell").alias(col_b), F.col("centroid").alias("__cb__"))
    vec = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("__v__"))
    audit = (
        dis.join(vec, "vec_id")
        .join(ca, col_a)
        .join(cb, col_b)
        .select(_d2(F.col("__v__"), F.col("__ca__")).alias("__da__"),
                _d2(F.col("__v__"), F.col("__cb__")).alias("__db__"))
    )
    return audit.agg(
        F.sum(
            F.when(
                F.abs(F.col("__da__") - F.col("__db__"))
                > 1e-9 * (F.lit(1.0) + F.least("__da__", "__db__")),
                1,
            ).otherwise(0)
        ).alias("n_real_disagree")
    )


def _cell_partition_audit(amap, col, k_cells):
    """1-row frame (n_asg, n_ids, n_bad_cell): every vector got exactly
    one cell in [0, k) — the partition_ok evidence, shared by the two
    frame-assignment posture queries."""
    return amap.agg(
        F.count(F.lit(1)).alias("n_asg"),
        F.count_distinct("vec_id").alias("n_ids"),
        F.sum(
            F.when(
                F.col(col).isNull() | (F.col(col) < 0) | (F.col(col) >= k_cells),
                1,
            ).otherwise(0)
        ).alias("n_bad_cell"),
    )


@query(
    "ivf_assign_frame_scaled",
    oracle="""
    SELECT CAST((SELECT COUNT(*) FROM embeddings) AS BIGINT) AS n_total,
           TRUE AS partition_ok, TRUE AS model_shape_ok, TRUE AS paths_agree
    """,
)
def ivf_assign_frame_scaled(spark, sf_dir):
    """EXECUTOR-RESIDENT centroid assignment, driver-gated (VERDICT r8
    item 2): under the k = N/500 rule the centroid model is
    corpus_bytes/500 — linear in the data — so at a literal 100 TB
    embedding corpus the driver-side list (~200 GB) is the first hard
    wall. This runs the past-the-threshold posture end to end:
    ``train_ivf_centroids_frame`` (Lloyd with the model as a persisted
    k-row DataFrame; nothing model-sized ever reaches the driver) +
    the salted cogroup-dgemm argmin assignment (``_assign_frame_map``:
    data shuffles ONCE by salt, the model replicates per salt bucket,
    oversize models split into hash chunks with a (d2, cell) min_by
    merge). The frame path is FORCED here — ``output='auto'`` only
    engages it past 64 MB of centroids, and the gate corpus sits far
    below that; the query exists to keep the big-model code path under
    the same driver gate as the list path it must agree with.

    Learned centroids aren't SQL-expressible, so the oracle is the
    boolean-contract kind (semdedup_scaled's template): n_total plus
    three booleans VERIFIED DISTRIBUTED-SIDE. partition_ok — every
    vector got exactly one cell in [0, k). model_shape_ok — the trained
    frame has exactly k rows whose dimensionality equals the data's.
    paths_agree — the frame assignment matches ``assign_cells`` fed the
    COLLECTED same model (k·dim floats — model parameters, the thing
    the threshold exists to gate, collected here only as the
    verification fixture): both paths argmin the same float64
    c² − 2·X@Cᵀ, but their dgemm batch shapes differ (per-salt-bucket
    cogroup vs Arrow batch), so a razor-edge centroid tie may land
    differently in the last ulp. A disagreement therefore only counts
    as REAL after an expression-fold audit of the two claimed cells
    shows a distance gap above 1e-9 relative — the audit join touches
    only disagreeing rows (expected zero), so it is free at any scale."""
    emb = _t(spark, sf_dir, "embeddings")
    n = emb.count()
    k_cells = max(4, n // 500)
    cents = similarity.train_ivf_centroids_frame(
        emb, "embedding", "vec_id", k=k_cells, iters=1
    )
    # the agreement join and the partition aggregate both consume the
    # frame assignment, whose replay is a full salt SHUFFLE + cogroup of
    # the vectors; the cached relation is only (id, cell) — narrow at
    # any corpus size — so this is the persist-wins shape (expensive
    # replay, cheap cache), unlike semdedup_scaled's map-only `tagged`
    from pyspark import StorageLevel

    amap = cachereg.QUERY_RESULTS.retain(
        similarity._assign_frame_map(
            emb, cents, "embedding", "vec_id", "cell_f"
        ).persist(StorageLevel.MEMORY_AND_DISK)
    )
    model = [list(r["centroid"]) for r in cents.orderBy("cell").collect()]
    tag_l = similarity.assign_cells(emb, model, "embedding", "cell_l").select(
        "vec_id", "cell_l"
    )
    both = amap.join(tag_l, "vec_id")
    dis = both.filter(F.col("cell_f") != F.col("cell_l"))
    a_real = _cell_disagreement_audit(dis, emb, cents, "cell_f", "cell_l")
    a_part = _cell_partition_audit(amap, "cell_f", k_cells)
    a_model = cents.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.min(F.size("centroid")).alias("dim_lo"),
        F.max(F.size("centroid")).alias("dim_hi"),
    )
    a_dim = emb.agg(F.min(F.size("embedding")).alias("data_dim"))
    return (
        a_part.crossJoin(a_model)
        .crossJoin(a_dim)
        .crossJoin(a_real)
        .select(
            F.lit(n).cast("bigint").alias("n_total"),
            ((F.col("n_asg") == n) & (F.col("n_ids") == n) & (F.col("n_bad_cell") == 0)).alias(
                "partition_ok"
            ),
            (
                (F.col("n_cells") == k_cells)
                & (F.col("dim_lo") == F.col("data_dim"))
                & (F.col("dim_hi") == F.col("data_dim"))
            ).alias("model_shape_ok"),
            (F.coalesce(F.col("n_real_disagree"), F.lit(0)) == 0).alias("paths_agree"),
        )
    )


@query(
    "ivf_assign_routed_chunks",
    oracle="""
    SELECT CAST((SELECT COUNT(*) FROM embeddings) AS BIGINT) AS n_total,
           TRUE AS route_plan_ok, TRUE AS partition_ok, TRUE AS paths_agree
    """,
)
def ivf_assign_routed_chunks(spark, sf_dir):
    """The CHUNKED-model scale posture with two-level coarse routing
    (VERDICT r9 item 1), driver-gated: past ``chunk_bytes`` the r9
    layout exploded the DATA G-fold — at the documented k = N/500
    extreme (100 TB corpus, ~200 GB model, G ~ 800 chunks) that is
    ~800 full-corpus re-shuffles per assignment pass, the last genuine
    scale wall in the similarity family. The r10 layout
    (similarity._coarse_layer) groups fine cells under a sqrt(k)-sized
    coarse quantizer, makes chunks groups of coarse cells, and routes
    each row to only the chunks that can hold its nearest fine cell —
    exact by the triangle inequality (d_coarse - radius <= d_fine <=
    the sorted cumulative-count bound U), so data traffic is O(1) in
    model size.

    This query FORCES a multi-chunk model on the gate corpus
    (chunk_bytes sized to ~2 cells per chunk) and verifies the posture
    end to end, emitting the boolean-contract oracle shape
    (ivf_assign_frame_scaled's template):

    - route_plan_ok — the routed plan's physical text contains NO
      data-side ``sequence(0, G-1)`` explode (the replicate layout's
      signature; the model-side salt explode remains) — the VERDICT r9
      done-criterion checked in-query;
    - partition_ok — every vector got exactly one cell in [0, k);
    - paths_agree — routed assignments match the r9 replicate layout
      row for row, with the same last-ulp audit discipline as
      ivf_assign_frame_scaled: both layouts argmin the same float64
      c² − 2·X@Cᵀ per chunk but cogroup different row batches, so a
      razor-edge tie may flip; a disagreement counts as REAL only when
      an expression-fold audit shows a distance gap above 1e-9
      relative (the audit join touches only disagreeing rows —
      expected zero — so it is free at any scale)."""
    import re

    emb = _t(spark, sf_dir, "embeddings")
    n = emb.count()
    # k sized for EVIDENCE, not for load (VERDICT r10 item 4: at
    # k = n/100 this one query was ~40% of the 50-query gate's wall).
    # k=8 with 2-cell chunks still forces 4 chunks — multi-chunk
    # routing, the coarse layer, sub-slot splitting, and the min_by
    # cross-chunk merge all engage — and all three booleans carry the
    # same meaning; the k∝N posture itself is ivf_assign_frame_scaled's
    # job. iters=0 for the same reason: routing exactness must hold for
    # ANY (cell, centroid) frame — the hash-seeded model is as valid a
    # witness as a Lloyd-converged one, and the training loop it skips
    # is exactly what ivf_assign_frame_scaled already gates.
    k_cells = max(8, n // 400)
    cents = similarity.train_ivf_centroids_frame(
        emb, "embedding", "vec_id", k=k_cells, iters=0
    )
    dim_row = emb.select(F.size("embedding").alias("d")).first()
    chunk = similarity.centroid_model_bytes(2, int(dim_row["d"]))
    n_chunks = max(1, -(-similarity.centroid_model_bytes(k_cells, int(dim_row["d"])) // chunk))
    from pyspark import StorageLevel

    routed = cachereg.QUERY_RESULTS.retain(
        similarity._assign_frame_map(
            emb, cents, "embedding", "vec_id", "cell_r",
            chunk_bytes=chunk, route="coarse",
        ).persist(StorageLevel.MEMORY_AND_DISK)
    )
    plan = routed._jdf.queryExecution().executedPlan().toString()  # physical plan only: the full QE print is 4 plans / ~3x the bytes, pure gate latency
    # anchor on the explode's OUTPUT column: the replicate layout's
    # G-fold prints `Generate explode(sequence(0, G-1, ...)) ... [__g__#N]`
    # while the model side's LEGITIMATE salt explodes print `[__salt__#N]`
    # — and the persisted model's plan string still carries its full
    # TRAINING lineage, whose salt explodes collide with a bare
    # sequence(0, G-1) grep whenever salt_parts == G (under the
    # driver's local[8] session the auto salt is 8 = this corpus's
    # chunk count; caught red in r10 pre-flight under vanilla)
    gfold = re.search(
        rf"Generate explode\(sequence\(0, {n_chunks - 1},[^\n]*\[__g__#", plan
    )
    route_plan_ok = gfold is None and "MapInPandas" in plan
    rep = similarity._assign_frame_map(
        emb, cents, "embedding", "vec_id", "cell_p",
        chunk_bytes=chunk, route="replicate",
    )
    both = routed.join(rep, "vec_id")
    dis = both.filter(F.col("cell_r") != F.col("cell_p"))
    a_real = _cell_disagreement_audit(dis, emb, cents, "cell_r", "cell_p")
    a_part = _cell_partition_audit(routed, "cell_r", k_cells)
    return (
        a_part.crossJoin(a_real)
        .select(
            F.lit(n).cast("bigint").alias("n_total"),
            F.lit(bool(route_plan_ok)).alias("route_plan_ok"),
            ((F.col("n_asg") == n) & (F.col("n_ids") == n) & (F.col("n_bad_cell") == 0)).alias(
                "partition_ok"
            ),
            (F.coalesce(F.col("n_real_disagree"), F.lit(0)) == 0).alias("paths_agree"),
        )
    )


@query(
    "dsir_log_weights",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id, lang,
             unnest(t || CASE WHEN len(t) >= 2
                              THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
                              ELSE [] END) AS g
      FROM tok
    ),
    bkt AS (
      SELECT doc_id, lang,
             (('0x' || substr(md5(g), 1, 5))::BIGINT) % 256 AS b
      FROM grams
    ),
    feat AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c FROM bkt GROUP BY 1, 2),
    dq AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n FROM bkt GROUP BY b),
    dt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n FROM bkt WHERE lang = 'en' GROUP BY b),
    nq AS (SELECT CAST(SUM(n) AS DOUBLE) AS N FROM dq),
    nt AS (SELECT CAST(SUM(n) AS DOUBLE) AS N FROM dt),
    w AS (
      SELECT feat.doc_id,
             ROUND(SUM(feat.c * (ln((COALESCE(dt.n, 0) + 1.0) / (nt.N + 256.0))
                               - ln((dq.n + 1.0) / (nq.N + 256.0)))) + 1e-9, 5) AS log_weight
      FROM feat
      JOIN dq USING (b) LEFT JOIN dt USING (b)
      CROSS JOIN nq CROSS JOIN nt
      GROUP BY feat.doc_id
    )
    -- contract: every raw doc gets a weight; feature-less (NULL/empty
    -- text) docs carry the empty-product weight 0.0
    SELECT d.doc_id, COALESCE(w.log_weight, 0.0) AS log_weight
    FROM (SELECT doc_id FROM documents) d LEFT JOIN w USING (doc_id)
    """,
)
def dsir_log_weights(spark, sf_dir):
    """DSIR data selection (sampling.dsir_log_weights; Xie et al. 2023,
    arXiv:2302.03169): importance weights for every document against the
    English-language slice as the target distribution, over 256 hashed
    unigram+bigram buckets with Laplace smoothing. Both feature
    distributions are collected model parameters (<= 256 count rows,
    one eager conditional-agg job) inlined as a literal log-ratio
    array, so the scoring pass is join-free: exactly two gram passes
    over the corpus at any scale (see sampling.dsir_log_weights for the
    AQE ReuseExchange failure that killed the lazy broadcast-join
    form). md5 bucket hashing + final 5 dp rounding keep the weights
    engine-portable."""
    docs = _t(spark, sf_dir, "documents")
    w = sampling.dsir_log_weights(
        docs, target_pred=F.col("lang") == "en", buckets=256, alpha=1.0
    )
    return w.select("doc_id", F.round(F.col("log_weight") + 1e-9, 5).alias("log_weight"))


@query(
    "decontamination_hits",
    oracle="""
    WITH tok AS (
      SELECT doc_id, source,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    g AS (
      SELECT doc_id, source,
             unnest(list_transform(range(1, len(t) - 3), i -> array_to_string(t[i:i+4], ' '))) AS gram
      FROM tok WHERE len(t) >= 5
    ),
    ev AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
    hits AS (
      SELECT g.doc_id, CAST(COUNT(DISTINCT g.gram) AS BIGINT) AS n_hit_grams
      FROM g JOIN ev USING (gram)
      WHERE g.source <> 'src0'
      GROUP BY g.doc_id
    )
    SELECT * FROM hits
    """,
)
def decontamination_hits(spark, sf_dir):
    """Benchmark decontamination (textpipe.ngram_overlap_hits): treat
    source='src0' as the held-out eval set and flag every other document
    sharing a verbatim 5-token window with it (the 13-gram protocol,
    shortened to 5 so the synthetic corpus exercises the hit path). The
    eval gram vocabulary rides the join as the small side; one gram-key
    join + one id groupBy."""
    docs = _t(spark, sf_dir, "documents")
    return textpipe.ngram_overlap_hits(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        "text",
        "doc_id",
        n=5,
    )


@query(
    "duplicate_spans_topk",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    w AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t) - 6),
                                   i -> array_to_string(t[i:i+7], ' '))) AS span
      FROM tok WHERE len(t) >= 8
    ),
    g AS (
      SELECT span, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM w GROUP BY span
    )
    SELECT span, n_docs, n_occurrences FROM g WHERE n_docs >= 2
    ORDER BY n_docs DESC, n_occurrences DESC, span LIMIT 25
    """,
)
def duplicate_spans_topk(spark, sf_dir):
    """Corpus-wide duplicated-span detection (dedup.duplicate_spans,
    r11): every 8-token window, grouped corpus-wide, spans present in
    >= 2 distinct documents, heaviest first — the exact substring-level
    dedup signal document-level dedup misses (boilerplate runs repeated
    VERBATIM inside otherwise-distinct documents; Lee et al. ACL'22's
    motivation for substring dedup). EXACT for width-n spans: any
    duplicated run of >= n tokens contains a duplicated n-window. One
    shuffle (span-key groupBy with map-side combine); the window
    explosion fuses into the scan; key='hash' (hash64) is the 100 TB
    shuffle-key posture, key='text' here so the oracle replays the
    grouping verbatim."""
    docs = _t(spark, sf_dir, "documents")
    out = dedup.duplicate_spans(docs, "doc_id", "text", span_tokens=8, min_docs=2)
    return out.orderBy(
        F.desc("n_docs"), F.desc("n_occurrences"), "span"
    ).limit(25)


@query(
    "span_dup_share",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    w AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t) - 6),
                                   i -> array_to_string(t[i:i+7], ' '))) AS span
      FROM tok WHERE len(t) >= 8
    ),
    dup AS (
      SELECT span FROM w GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    hit AS (
      SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup
      FROM w JOIN dup USING (span) GROUP BY w.doc_id
    ),
    per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows FROM w GROUP BY doc_id)
    SELECT per.doc_id, per.n_windows,
           CAST(COALESCE(hit.n_dup, 0) AS BIGINT) AS n_dup,
           ROUND(COALESCE(hit.n_dup, 0) / per.n_windows + 1e-9, 5) AS dup_fraction
    FROM per LEFT JOIN hit USING (doc_id)
    """,
)
def span_dup_share(spark, sf_dir):
    """Per-document duplicated-span share (dedup.span_dup_fraction,
    r11): the fraction of each document's 8-token windows that appear
    in >= 2 distinct documents corpus-wide — the boilerplate-
    contamination quality signal a curation pipeline thresholds on.
    Scale shape: the duplicated-span vocabulary joins the window
    relation on the span key (AQE broadcasts a small vocabulary,
    shuffles a big one), then one per-id aggregate."""
    docs = _t(spark, sf_dir, "documents")
    out = dedup.span_dup_fraction(docs, "doc_id", "text", span_tokens=8, min_docs=2)
    return out.select(
        "doc_id", "n_windows", "n_dup",
        F.round(F.col("dup_fraction") + 1e-9, 5).alias("dup_fraction"),
    )


@query(
    "excise_duplicate_spans_docs",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    w AS (
      SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
      FROM tok WHERE len(t) >= 8
    ),
    ws AS (SELECT doc_id, i, array_to_string(t[i:i+7], ' ') AS span FROM w),
    spans AS (
      SELECT span, MIN(doc_id) AS keeper
      FROM ws GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    covraw AS (
      SELECT ws.doc_id, ws.i, unnest(range(0, 8)) AS off
      FROM ws JOIN spans USING (span)
      WHERE ws.doc_id <> spans.keeper
    ),
    cov AS (SELECT DISTINCT doc_id, i + off AS j FROM covraw),
    pos AS (
      SELECT doc_id, unnest(t) AS tokk, unnest(range(1, len(t) + 1)) AS j
      FROM tok
    ),
    kept AS (SELECT pos.* FROM pos ANTI JOIN cov USING (doc_id, j)),
    reb AS (
      SELECT doc_id, string_agg(tokk, ' ' ORDER BY j) AS txt
      FROM kept GROUP BY doc_id
    )
    SELECT tok.doc_id,
           CAST(len(t) AS BIGINT) AS n_before,
           CAST(len(string_split(COALESCE(reb.txt, ''), ' ')) AS BIGINT) AS n_after,
           md5(COALESCE(reb.txt, '')) AS dedup_md5
    FROM tok LEFT JOIN reb USING (doc_id)
    """,
)
def excise_duplicate_spans_docs(spark, sf_dir):
    """Span EXCISION, the transform half of the duplicated-span family
    (dedup.excise_duplicate_spans, r11): spans in >= 2 distinct docs
    keep ONE canonical occurrence (the smallest doc_id); every other
    document excises the covered tokens, and the rebuilt text is
    hashed so the oracle pins the transform byte-for-byte (DuckDB
    rebuilds via a positions anti-join + ordered string_agg — the
    relational restatement of Spark's indexed array filter). n_after
    counts tokens of the OUTPUT text under the shared split('')
    quirk (an all-excised or empty document reads 1 — both engines,
    by the documented string_split contract)."""
    docs = _t(spark, sf_dir, "documents")
    from dataframe_kotlin_spark.functions.text import tokens as _toks

    out = dedup.excise_duplicate_spans(docs, "doc_id", "text", span_tokens=8, min_docs=2)
    return out.select(
        "doc_id",
        F.size(_toks(F.col("text"))).cast("bigint").alias("n_before"),
        F.size(F.split(F.col("text_deduped"), " ")).cast("bigint").alias("n_after"),
        F.md5(F.col("text_deduped")).alias("dedup_md5"),
    )


@query(
    "winnow_fingerprint_counts",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             list_transform(range(1, len(t) - 6),
               i -> (('0x' || substr(md5(array_to_string(t[i:i+7], ' ')), 1, 16))::UBIGINT)::HUGEINT
                    - CASE WHEN substr(md5(array_to_string(t[i:i+7], ' ')), 1, 1)
                                IN ('8','9','a','b','c','d','e','f')
                           THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END) AS h
      FROM tok WHERE len(t) >= 8
    ),
    fps AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(h) - 2, 2)),
                                          j -> list_min(h[j:j+3]))) AS fp
      FROM grams
    )
    SELECT doc_id, CAST(len(fp) AS BIGINT) AS n_fingerprints FROM fps
    """,
)
def winnow_fingerprint_counts(spark, sf_dir):
    """Winnowing fingerprint selection (dedup.winnow_fingerprints,
    Schleimer et al. SIGMOD'03; r11): per document, hash every 8-token
    window (hash64) and keep the minimum of every 4 consecutive window
    hashes, distinct — the bounded-output (~2/(w+1) density) candidate
    path for corpus-wide span dedup when exploding every window is too
    much, with the paper's guarantee that any shared run of
    >= n + w - 1 = 11 tokens still shares a selected fingerprint
    (property-pinned in tests). The oracle replays the selection
    exactly: DuckDB computes the same md5-derived 64-bit values in
    HUGEINT with the sign reconstructed, so its list_min agrees with
    Spark's SIGNED array_min ordering. Output is the per-doc selected
    count (raw signed fingerprints don't render identically across the
    engines' integer types; the count pins the selection itself)."""
    docs = _t(spark, sf_dir, "documents")
    fp = dedup.winnow_fingerprints(docs, "doc_id", "text", n=8, w=4)
    return fp.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fingerprints")
    )


@query(
    "winnow_span_pairs",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             list_transform(range(1, len(t) - 6),
               i -> (('0x' || substr(md5(array_to_string(t[i:i+7], ' ')), 1, 16))::UBIGINT)::HUGEINT
                    - CASE WHEN substr(md5(array_to_string(t[i:i+7], ' ')), 1, 1)
                                IN ('8','9','a','b','c','d','e','f')
                           THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END) AS h
      FROM tok WHERE len(t) >= 8
    ),
    fps AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, greatest(len(h) - 2, 2)),
                                                 j -> list_min(h[j:j+3])))) AS fp
      FROM grams
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    ),
    w AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 6),
                                   i -> array_to_string(t[i:i+7], ' '))) AS span
      FROM tok WHERE len(t) >= 8
    )
    SELECT c.id_a, c.id_b, CAST(COUNT(*) AS BIGINT) AS n_shared_spans
    FROM cand c
    JOIN w wa ON wa.doc_id = c.id_a
    JOIN w wb ON wb.doc_id = c.id_b AND wb.span = wa.span
    GROUP BY c.id_a, c.id_b
    """,
)
def winnow_span_pairs(spark, sf_dir):
    """The winnowed span-dedup pipeline (dedup.winnowed_duplicate_pairs,
    r12 — VERDICT r11 item 1: winnow_fingerprints finally gets its
    consumer): fingerprint-bucketed candidate doc pairs (~2/(w+1) of
    windows on the shuffle instead of all of them) verified by a
    targeted shared-window count over CANDIDATE documents only — the
    affordable 100 TB form of corpus-wide span candidate generation.
    Guarantee gated here end to end: every output pair shares >= 1
    exact 8-token window, and any pair sharing a run of >= n + w - 1 =
    11 tokens is present (the SIGMOD'03 winnowing theorem; the oracle
    replays fingerprint selection, candidate self-join, and verify
    join verbatim in DuckDB HUGEINT with the sign reconstructed)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.winnowed_duplicate_pairs(docs, "doc_id", "text", n=8, w=4)


@query(
    "duplicate_spans_hashed",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    w AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t) - 6),
                                   i -> array_to_string(t[i:i+7], ' '))) AS span
      FROM tok WHERE len(t) >= 8
    ),
    g AS (
      SELECT CAST((('0x' || substr(md5(span), 1, 16))::UBIGINT)::HUGEINT
                  - CASE WHEN substr(md5(span), 1, 1)
                              IN ('8','9','a','b','c','d','e','f')
                         THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END
                  AS BIGINT) AS span_hash,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM w GROUP BY 1
    )
    SELECT span_hash, n_docs, n_occurrences FROM g WHERE n_docs >= 2
    ORDER BY n_docs DESC, n_occurrences DESC, span_hash LIMIT 25
    """,
)
def duplicate_spans_hashed(spark, sf_dir):
    """duplicate_spans' ``key='hash'`` posture, oracle-gated (VERDICT
    r11 item 2: the 100 TB shuffle-key path — 8-byte hash64 keys
    instead of ~6x span_tokens bytes of span text — was scale-measured
    in tools/scale_measure.py but never driver-gated; the same
    scale-posture-vs-gate divergence class r9-r11 closed for the
    dedup/assign/search families). hash64 is md5-derived by design
    (dedup.hash64), so DuckDB replays the exact signed 64-bit values
    via the HUGEINT sign-reconstruction recipe the winnowing oracle
    already uses; the signed bigint fits both engines' int64 lanes, so
    the grouping, the >= min_docs filter, and the (n_docs,
    n_occurrences, span_hash) ordering replay bit-for-bit. Spark plan
    unchanged from the text posture except the 8-byte shuffle key."""
    docs = _t(spark, sf_dir, "documents")
    out = dedup.duplicate_spans(
        docs, "doc_id", "text", span_tokens=8, min_docs=2, key="hash"
    )
    return out.orderBy(
        F.desc("n_docs"), F.desc("n_occurrences"), "span_hash"
    ).limit(25)


@query(
    "longest_dup_run",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    w AS (
      SELECT doc_id, i, array_to_string(t[i:i+7], ' ') AS span
      FROM (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
            FROM tok WHERE len(t) >= 8)
    ),
    dup AS (
      SELECT span FROM w GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    ds AS (SELECT w.doc_id, w.i FROM w JOIN dup USING (span)),
    runs AS (
      SELECT doc_id,
             i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS g
      FROM ds
    ),
    rl AS (
      SELECT doc_id, CAST(COUNT(*) + 7 AS BIGINT) AS run_tokens
      FROM runs GROUP BY doc_id, g
    ),
    mx AS (SELECT doc_id, MAX(run_tokens) AS longest FROM rl GROUP BY doc_id)
    SELECT tok.doc_id,
           CAST(GREATEST(len(t) - 7, 0) AS BIGINT) AS n_windows,
           CAST(COALESCE(mx.longest, 0) AS BIGINT) AS longest_dup_run
    FROM tok LEFT JOIN mx USING (doc_id)
    """,
)
def longest_dup_run(spark, sf_dir):
    """Per-document longest duplicated token run
    (dedup.longest_duplicate_run, r12): the length in tokens of the
    longest contiguous region in which every 8-token window is
    duplicated corpus-wide (>= 2 distinct documents) — the statistic
    that separates one long verbatim boilerplate block from scattered
    duplicated 8-grams at equal dup_fraction (Lee et al. ACL'22 report
    this distribution to motivate substring-level dedup). Every
    document emits a row; no duplicated window (or fewer than 8
    tokens) reports 0. Scale shape: the window relation is built once
    and flows through three narrow keyed shuffles — (span, id)
    pre-agg with map-side combine, a span-partitioned count-only
    window for n_docs (one row per containing doc, so hot boilerplate
    is doc-count bounded), and a per-id rollup whose run scan is a
    single JVM-side F.aggregate fold over the doc's sorted duplicated
    starts. The oracle replays the run detection as classic
    gaps-and-islands (i - row_number grouping)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.longest_duplicate_run(
        docs, "doc_id", "text", span_tokens=8, min_docs=2
    )


@query(
    "incremental_new_docs",
    oracle="""
    WITH hist AS (
      SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents WHERE doc_id % 2 = 0
    ),
    batch AS (
      SELECT doc_id, lang,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents WHERE doc_id % 2 = 1
    )
    SELECT b.doc_id, b.lang
    FROM batch b ANTI JOIN hist USING (fp)
    """,
)
def incremental_new_docs(spark, sf_dir):
    """Exact incremental dedup (dedup.incremental_new_docs, r12): the
    production crawl-ingest shape — each new batch is deduplicated
    against the FINGERPRINT STORE of everything already kept, without
    re-reading history's text. History = even doc_ids (its store is
    exact_dedup's fingerprint column), batch = odd doc_ids; the result
    is the batch documents whose normalized-md5 fingerprint is novel.
    One left-anti join on a 16-byte uniform key; at 100 TB the store
    is bucketed by fingerprint (sources.layout) so only the batch
    shuffles."""
    docs = _t(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    store = dedup.exact_dedup(hist, "text", "doc_id").select("fingerprint")
    return dedup.incremental_new_docs(batch, store, "doc_id", "text").select(
        "doc_id", "lang"
    )


@query(
    "incremental_span_contamination",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    wspan AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t) - 6),
                                   i -> array_to_string(t[i:i+7], ' '))) AS span
      FROM tok WHERE len(t) >= 8
    ),
    w AS (
      SELECT doc_id,
             CAST((('0x' || substr(md5(span), 1, 16))::UBIGINT)::HUGEINT
                  - CASE WHEN substr(md5(span), 1, 1)
                              IN ('8','9','a','b','c','d','e','f')
                         THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END
                  AS BIGINT) AS k
      FROM wspan
    ),
    store AS (SELECT DISTINCT k FROM w WHERE doc_id % 2 = 0),
    bw AS (SELECT DISTINCT doc_id, k FROM w WHERE doc_id % 2 = 1),
    per AS (
      SELECT bw.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_windows,
             CAST(SUM(CASE WHEN store.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_seen
      FROM bw LEFT JOIN store USING (k)
      GROUP BY bw.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(per.n_windows, 0) AS BIGINT) AS n_windows,
           CAST(COALESCE(per.n_seen, 0) AS BIGINT) AS n_seen,
           ROUND(COALESCE(per.n_seen / per.n_windows, 0.0) + 1e-9, 5) AS seen_fraction
    FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
    LEFT JOIN per USING (doc_id)
    """,
)
def incremental_span_contamination(spark, sf_dir):
    """Per-batch-document span contamination against a historical SPAN
    STORE (dedup.incremental_span_contamination, r12): the fraction of
    each new document's distinct 8-token windows that history already
    contains — the admit/reject signal for documents that are
    fingerprint-novel but textually almost entirely already-seen.
    History = even doc_ids (its store is span_store's 8-byte hash64
    key column — the at-rest posture, SQL-replayed via the HUGEINT
    sign-reconstruction recipe), batch = odd doc_ids; every batch
    document emits a row (sub-8-token docs report zeros). One store
    join + one per-id rollup; store bucketed by key at scale."""
    docs = _t(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    store = dedup.span_store(hist, "text", span_tokens=8, key="hash")
    out = dedup.incremental_span_contamination(
        batch, store, "doc_id", "text", span_tokens=8, key="hash"
    )
    return out.select(
        "doc_id", "n_windows", "n_seen",
        F.round(F.col("seen_fraction") + 1e-9, 5).alias("seen_fraction"),
    )


@query(
    "psi_drift_priority",
    oracle="""
    WITH base AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr, o_orderpriority AS v
      FROM orders
    ),
    counts AS (SELECT yr, v, CAST(COUNT(*) AS DOUBLE) AS n FROM base GROUP BY 1, 2),
    cats AS (SELECT DISTINCT v FROM counts),
    yrs AS (SELECT DISTINCT yr FROM counts),
    dense AS (
      SELECT yrs.yr, cats.v, COALESCE(counts.n, 0.0) AS n
      FROM yrs CROSS JOIN cats LEFT JOIN counts USING (yr, v)
    ),
    probs AS (
      SELECT yr, v,
             (n + 0.5) / (SUM(n) OVER (PARTITION BY yr)
                          + 0.5 * COUNT(*) OVER (PARTITION BY yr)) AS p
      FROM dense
    ),
    ref AS (SELECT v, p AS q FROM probs WHERE yr = 1995)
    SELECT CAST(probs.yr AS VARCHAR) AS yr,
           ROUND(SUM((p - q) * ln(p / q)) + 1e-9, 6) AS psi
    FROM probs JOIN ref USING (v)
    WHERE yr <> 1995
    GROUP BY probs.yr
    """,
)
def psi_drift_priority(spark, sf_dir):
    """Distribution-drift monitoring (quality.distribution_drift): PSI of
    the order-priority mix in every order year against 1995 as the
    reference — the ingest-gate statistic for 'did this slice of the
    feed change shape'. One scan; the (slice x category) aggregate is
    tiny and every derived stat stays relational."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "yr", F.year("o_orderdate").cast("bigint")
    )
    from dataframe_kotlin_spark.operators.quality import distribution_drift

    out = distribution_drift(o, "o_orderpriority", "yr", ref_slice=1995)
    return out.select("yr", F.round(F.col("psi") + 1e-9, 6).alias("psi"))


@query(
    "mixture_plan_langs",
    oracle="""
    WITH w(lang, weight) AS (
      VALUES ('en', 0.5), ('de', 0.125), ('es', 0.125), ('fr', 0.125), ('zh', 0.125)
    ),
    avail AS (
      SELECT lang, CAST(SUM(n_chars) AS DOUBLE) AS available_tokens
      FROM documents GROUP BY lang
    ),
    -- full outer: a weighted source absent from the corpus still reports
    -- its unmet budget share as deficit (availability 0)
    j AS (
      SELECT lang,
             COALESCE(available_tokens, 0.0) AS av,
             COALESCE(weight, 0.0) * 200000 AS req
      FROM avail FULL OUTER JOIN w USING (lang)
    )
    SELECT lang,
           av AS available_tokens,
           req AS requested_tokens,
           LEAST(req, av * 2.0) AS allocated_tokens,
           CASE WHEN av > 0 THEN ROUND(LEAST(req, av * 2.0) / av + 1e-9, 6)
                ELSE 0.0 END AS epochs,
           req - LEAST(req, av * 2.0) AS deficit_tokens
    FROM j
    """,
)
def mixture_plan_langs(spark, sf_dir):
    """Training-mixture budgeting (sampling.mixture_plan): allocate a
    200k-token budget across languages at a 50/12.5×4 target mix with a
    2-epoch repetition cap; reports the achievable allocation and the
    deficit the cap leaves. One aggregate over the corpus."""
    docs = _t(spark, sf_dir, "documents")
    out = sampling.mixture_plan(
        docs, "lang", "n_chars",
        {"en": 0.5, "de": 0.125, "es": 0.125, "fr": 0.125, "zh": 0.125},
        budget=200000, max_epochs=2.0,
    )
    return out.withColumn("epochs", F.round(F.col("epochs") + 1e-9, 6))


@query(
    "training_mix_report",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, source, n_chars,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
      FROM documents
    ),
    -- stage 1: decontamination vs the src0 benchmark slice (5-gram rule)
    g AS (
      SELECT doc_id, source,
             unnest(list_transform(range(1, len(t) - 3), i -> array_to_string(t[i:i+4], ' '))) AS gram
      FROM tok WHERE len(t) >= 5
    ),
    ev AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
    contaminated AS (
      SELECT DISTINCT g.doc_id FROM g JOIN ev USING (gram) WHERE g.source <> 'src0'
    ),
    pool AS (
      SELECT * FROM tok
      WHERE source <> 'src0' AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    -- stage 2: DSIR selection toward the English slice of the pool
    pg AS (
      SELECT doc_id, lang,
             unnest(t || CASE WHEN len(t) >= 2
                              THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
                              ELSE [] END) AS gr
      FROM pool
    ),
    pb AS (SELECT doc_id, lang, (('0x' || substr(md5(gr), 1, 5))::BIGINT) % 256 AS b FROM pg),
    feat AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c FROM pb GROUP BY 1, 2),
    dq AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n FROM pb GROUP BY b),
    dt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n FROM pb WHERE lang = 'en' GROUP BY b),
    nq AS (SELECT CAST(SUM(n) AS DOUBLE) AS N FROM dq),
    nt AS (SELECT CAST(SUM(n) AS DOUBLE) AS N FROM dt),
    w AS (
      SELECT feat.doc_id,
             SUM(feat.c * (ln((COALESCE(dt.n, 0) + 1.0) / (nt.N + 256.0))
                         - ln((dq.n + 1.0) / (nq.N + 256.0)))) AS lw
      FROM feat JOIN dq USING (b) LEFT JOIN dt USING (b)
      CROSS JOIN nq CROSS JOIN nt
      GROUP BY feat.doc_id
    ),
    selected AS (
      SELECT pool.* FROM pool JOIN w USING (doc_id) WHERE w.lw > -1.0
    ),
    -- stage 3: exact dedup, keep smallest doc_id per normalized text
    kept AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(norm) ORDER BY doc_id) AS rn
        FROM selected
      ) WHERE rn = 1
    )
    -- stage 4: per-language mix report
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM kept GROUP BY lang
    """,
)
def training_mix_report(spark, sf_dir):
    """End-to-end training-data assembly as ONE lazy DAG composing the
    round-3 operators: decontaminate the non-benchmark pool against the
    src0 eval slice (textpipe.ngram_overlap_hits, 5-gram), select docs
    whose DSIR importance weight toward the English slice clears the
    -1.0 threshold (sampling.dsir_log_weights — drops roughly the least
    target-like quartile), exact-dedup keep-smallest-id
    (distinct_by over the md5 fingerprint), and report the surviving
    per-language mix. Nothing collects; every stage is a bucketed join
    or broadcast, so the same plan runs at crawl scale."""
    docs = _t(spark, sf_dir, "documents")
    evalset = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    pool = textpipe.decontaminate(corpus, evalset, "text", "doc_id", n=5)
    # The pool feeds FOUR branches (DSIR's feature bags, its en-slice
    # target, its id join-back, and the selection join below), and the
    # branches are different subplans, so ReuseExchange cannot collapse
    # them — without a persist the 5-gram decontamination join re-executes
    # per branch. The repartition before the persist matters as much as
    # the persist itself: AQE coalesces the anti-join's small shuffle
    # output to ~ONE partition, and persist FREEZES that layout, so every
    # downstream CPU-heavy map stage (the n-gram explode) would run as a
    # single task — measured at 100x as a 3-minute straggler
    # (tools/scale_measure.py training_mix_stages). Same pathology as
    # single-row-group files, cached-frame edition; at production scale
    # the repartition is a cheap rebalance of an already-shuffled frame.
    # Disk-backed persist is the spill-safe choice for a post-filter pool
    # far smaller than the corpus.
    from pyspark import StorageLevel

    pool = cachereg.QUERY_RESULTS.retain(
        pool.repartition(spark.sparkContext.defaultParallelism).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    )
    # target_pred derives the en-slice distribution from the SAME feature
    # bags — one md5-gram pass over the pool instead of two
    w = sampling.dsir_log_weights(
        pool, target_pred=F.col("lang") == "en", buckets=256
    )
    selected = pool.join(w.filter(F.col("log_weight") > -1.0).select("doc_id"), "doc_id")
    from dataframe_kotlin_spark.core.frame import KDataFrame
    from dataframe_kotlin_spark.functions.text import normalize

    kept = KDataFrame(selected.withColumn("__fp__", F.md5(normalize(F.col("text"))))).distinct_by(
        ["__fp__"], order_by=["doc_id"]
    )
    return (
        kept.df.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )
