"""Text-analysis pipeline operators (SURVEY §7 P6): language ID, quality
scoring, token statistics, fingerprinting. All pure Column expressions —
map-only stages that fuse into the scan at 100 TB.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataframe_kotlin_spark.functions.text import (
    STOPWORDS,
    bind1,
    doc_fingerprint,
    normalize,
    quality_score,
    tokens,
)


def detect_language(text: Column) -> Column:
    """Stopword-overlap language ID: argmax over per-language stopword hit
    counts; 'und' (undetermined) when nothing matches. The real-model
    version plugs a pandas_udf into the same column slot."""
    toks = F.array_distinct(tokens(text))
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        score = F.size(F.array_intersect(toks, sw))
        better = score > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, score).otherwise(best_score)
    return best_lang


def text_stats(df: DataFrame, text_col: str) -> DataFrame:
    """Append token/char statistics: n_tokens (whitespace), n_chars_norm,
    approx_bpe_tokens (chars/4 heuristic), mean_word_len."""
    t = F.col(text_col)
    toks = tokens(t)
    # size(NULL array) is -1 under legacy sizeOfNull: NULL text counts 0
    n_tok = F.when(t.isNull(), 0).otherwise(F.size(toks))
    n_chars = F.coalesce(F.length(normalize(t)), F.lit(0))
    return (
        df.withColumn("n_tokens", n_tok.cast("bigint"))
        .withColumn("n_chars_norm", n_chars.cast("bigint"))
        .withColumn("approx_bpe_tokens", F.ceil(n_chars / 4).cast("bigint"))
        .withColumn(
            "mean_word_len",
            # +1e-9 nudges exact .xxxx5 ratios off the rounding boundary,
            # where Spark (shortest-repr) and SQL engines (binary) disagree
            F.round((n_chars - (n_tok - 1)) / F.greatest(n_tok, F.lit(1)) + 1e-9, 4),
        )
    )


def fingerprint(df: DataFrame, text_col: str, out_col: str = "fingerprint") -> DataFrame:
    """Content fingerprint (md5 of normalized text) + a 64-bit rolling-hash
    style short id (first 15 hex digits as bigint) for cheap joins."""
    fp = doc_fingerprint(F.col(text_col))
    return df.withColumn(out_col, fp).withColumn(
        f"{out_col}_id", F.conv(F.substring(fp, 1, 15), 16, 10).cast("bigint")
    )


def score_quality(df: DataFrame, text_col: str, out_col: str = "quality") -> DataFrame:
    # +1e-9: see text_stats — keeps exact-quarter scores off round boundaries
    return df.withColumn(out_col, F.round(quality_score(F.col(text_col)) + 1e-9, 4))


def repetition_stats(
    df: DataFrame, text_col: str, ns: Sequence[int] = (2, 3), method: str = "auto"
) -> DataFrame:
    """Gopher-style within-document repetition metrics (Rae et al. 2021,
    table A1): for each n in ``ns``, the fraction of duplicate n-grams
    (1 - distinct/total). Map-only, fuses into the scan, no shuffle.
    High values flag boilerplate/spam documents that a quality gate
    should drop before training. Reference has no equivalent (pipeline
    extension, SURVEY §7 P6).

    method='expr' is the pure-Column form (transform + array_distinct
    per n — SQL-replayable, but higher-order lambdas never reach
    codegen, so it pays O(len·n) INTERPRETED eval per row per n: the
    same wall simhash_values hit, 16.6 s of the 100x text sweep).
    'numpy' moves ONLY the exact-integer gram counting into one Arrow
    batch UDF (tokenization stays the shared ``tokens()`` expression;
    per doc the counts are len(set(...)) over tuple n-grams) and keeps
    the division + rounding in the IDENTICAL Spark expressions — counts
    are integers with one representation, so the two paths are
    bit-identical by construction (test-pinned on real corpus data,
    nulls/empties/short docs included). 'auto' = 'numpy' (always safe;
    'expr' remains for plan-audit SQL-replay demonstrations)."""
    from dataframe_kotlin_spark.operators.similarity import _check_method

    _check_method(method)
    if method == "auto":
        method = "numpy"
    ns = tuple(ns)

    def frac_expr(total: Column, n_distinct: Column) -> Column:
        # +1e-9: keep exact .xxxx5 ratios off the Spark/duckdb
        # rounding-boundary divergence (see text_stats)
        return F.when(total <= 0, F.lit(0.0)).otherwise(
            F.round((total - n_distinct) / total + 1e-9, 4)
        )

    if method == "numpy":
        from pyspark.sql.types import ArrayType, LongType

        # no type hints: the module's `from __future__ import annotations`
        # stringifies them, which pandas_udf's hint inference rejects
        def gram_counts(tok):
            def counts(t):
                if t is None:
                    return [0] * (2 * len(ns))
                out = []
                lst = list(t)
                for n in ns:
                    total = max(len(lst) - (n - 1), 0)
                    if total <= 0:
                        out += [0, 0]
                    else:
                        out += [
                            total,
                            len(set(zip(*(lst[i:] for i in range(n))))),
                        ]
                return out

            return tok.map(counts)

        gram_counts_udf = F.pandas_udf(gram_counts, ArrayType(LongType()))
        out = df.withColumn("__gc__", gram_counts_udf(tokens(F.col(text_col))))
        for idx, n in enumerate(ns):
            total = F.col("__gc__").getItem(2 * idx)
            nd = F.col("__gc__").getItem(2 * idx + 1)
            out = out.withColumn(f"dup_{n}gram_frac", frac_expr(total, nd))
        return out.drop("__gc__")

    out = df
    for n in ns:
        # The token array is BOUND once per row (text.bind1): the
        # per-gram slice reads a lambda variable — slicing the tokenizer
        # expression inside the lambda would re-run it per gram,
        # O(len^2)/row (functions/text.py interpreted-lambda rule).
        # Guarded: sequence(1, 0) DESCENDS in Spark, so short docs must
        # short-circuit rather than build an inverted range.
        # NOTE: pyspark's transform passes (element, index) to any
        # callable whose SIGNATURE shows two parameters — default args
        # count, so (t, n=n) would get the INDEX bound to n; frac_for
        # reaches bind1 through a genuine 1-parameter closure below
        def frac_for(t: Column, n: int) -> Column:
            total = F.greatest(F.size(t) - (n - 1), F.lit(0))
            n_distinct = F.when(
                F.size(t) >= n,
                F.size(
                    F.array_distinct(
                        F.transform(
                            F.sequence(F.lit(1), F.size(t) - (n - 1)),
                            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
                        )
                    )
                ),
            ).otherwise(F.lit(0))
            return F.when(total <= 0, F.lit(0.0)).otherwise(
                # +1e-9: keep exact .xxxx5 ratios off the Spark/duckdb
                # rounding-boundary divergence (see text_stats)
                F.round((total - n_distinct) / total + 1e-9, 4)
            )

        def make(n: int):
            return lambda t: frac_for(t, n)

        out = out.withColumn(
            f"dup_{n}gram_frac", bind1(tokens(F.col(text_col)), make(n))
        )
    return out


# PII patterns deliberately restricted to syntax valid in BOTH Java regex
# (Spark executors) and RE2 (DuckDB oracle, Go/Rust scrubbers): character
# classes, bounded repetition, \b anchors — no lookaround, no backrefs.
# Order matters only for overlapping digit shapes; these are disjoint.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii(
    df: DataFrame, text_col: str, out_col: str | None = None
) -> DataFrame:
    """Replace emails / SSNs / phone numbers / IPv4 addresses with typed
    placeholder tokens. Map-only chained regexp_replace — stays inside
    whole-stage codegen, no shuffle, no UDF; at 100 TB this is a pure
    scan-speed transform.

    A training-data curation staple the reference lacks (its string ops
    stop at len/lower/upper, Columns.kt:219-221); SURVEY §7-P6 extension.
    """
    c = F.col(text_col)
    for _, pattern, token in PII_RULES:
        c = F.regexp_replace(c, pattern, token)
    return df.withColumn(out_col or text_col, c)


def pii_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Count PII matches per class (adds n_<class> columns) — the audit
    half of redaction: run on a sample to size the blast radius before
    rewriting a corpus."""
    out = df
    for name, pattern, _ in PII_RULES:
        matches = F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))
        # size(NULL array) is -1 under legacy sizeOfNull: NULL text has 0 hits
        out = out.withColumn(
            f"n_{name}",
            F.when(F.col(text_col).isNull(), 0).otherwise(F.size(matches)),
        )
    return out


def chunk_text(
    df: DataFrame,
    text_col: str,
    size: int,
    stride: int | None = None,
    id_cols: Sequence[str] = (),
) -> DataFrame:
    """Split documents into fixed-size character chunks with optional
    overlap (stride < size) — context-window preparation for embedding /
    LLM ingestion. Chunk i covers [i*stride, i*stride + size); the last
    chunk starts at the final stride multiple below len, so every char
    is covered and chunks overlap by (size - stride).

    Map-only: the start offsets come from `sequence` + `transform` over
    the row's own length and `substr` slices JVM-side — no UDF, no
    shuffle, output rows ~ len/stride per doc. The multimodal sibling is
    `multimodal.chunk_pcm_audio` (same shape over binary PCM).

    Emits chunk_id (0-based), char_start (0-based), chunk (the text).
    """
    if stride is None:
        stride = size
    assert 0 < stride <= size, "need 0 < stride <= size"
    n = F.length(F.col(text_col))
    nchunks = (
        F.ceil(F.greatest(n - size, F.lit(0)) / F.lit(float(stride))).cast("bigint") + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(0).cast("bigint"), nchunks - 1),
        lambda i: F.struct(
            i.alias("chunk_id"),
            (i * stride).alias("char_start"),
            F.col(text_col).substr((i * stride + 1).cast("int"), F.lit(size)).alias("chunk"),
        ),
    )
    return df.select(*id_cols, F.explode(chunks).alias("c")).select(
        *id_cols, "c.chunk_id", "c.char_start", "c.chunk"
    )


def _ngram_windows(df: DataFrame, text_col: str, n: int, keep: Sequence[str]) -> DataFrame:
    """One row per n-token window (space-joined), map-side explode.
    Token array bound once per row (text.bind1) — slicing the tokenizer
    expression inside the per-window lambda re-tokenizes per gram,
    O(len^2)/row (functions/text.py interpreted-lambda rule)."""
    toks = tokens(F.col(text_col))
    windows = bind1(
        toks,
        lambda t: F.transform(
            F.sequence(F.lit(1), F.size(t) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        ),
    )
    return (
        df.filter(F.size(toks) >= n)
        .select(*keep, F.explode(windows).alias("__gram__"))
    )


def ngram_overlap_hits(
    corpus: DataFrame,
    evalset: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Eval-set decontamination scan: flag corpus documents sharing any
    verbatim n-token window with a benchmark/eval set (the standard
    13-gram overlap rule used to scrub pretraining data of test-set
    leakage — e.g. GPT-3 appendix C / PaLM's 13-gram protocol; public
    methodology).

    Scale shape: both sides explode map-side to (gram) rows; the eval
    side DISTINCTs to its gram vocabulary (eval sets are tiny next to
    the corpus — AQE broadcasts it when it fits, the equi-join shuffles
    on the gram key when not); one groupBy(id) counts distinct matched
    grams. No driver collect, no all-pairs anything.

    Returns (id_col, n_hit_grams) for FLAGGED documents only.
    """
    from dataframe_kotlin_spark.operators.skew import ensure_scan_parallelism

    # the gram explosion is map-side, so its parallelism is the SCAN
    # split count — single-row-group corpus files would serialize the
    # CPU-heavy window/hash work onto one task (no-op at real scale)
    ev = _ngram_windows(ensure_scan_parallelism(evalset), text_col, n, keep=[]).distinct()
    cg = _ngram_windows(ensure_scan_parallelism(corpus), text_col, n, keep=[id_col])
    return (
        cg.join(ev, "__gram__")
        .groupBy(id_col)
        .agg(F.count_distinct("__gram__").cast("bigint").alias("n_hit_grams"))
    )


def decontaminate(
    corpus: DataFrame,
    evalset: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Drop every corpus document flagged by ngram_overlap_hits (all
    original columns preserved; anti-join on the id)."""
    hits = ngram_overlap_hits(corpus, evalset, text_col, id_col, n)
    return corpus.join(hits.select(id_col), id_col, "left_anti")
