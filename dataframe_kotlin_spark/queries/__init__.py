"""Query registry: every implemented operator from SURVEY.md §2 gets a
named (spark_callable, oracle_sql) pair here. ``__spark_entry__.py``
re-exports this registry to the driver.

Each spark callable has signature (spark, sf_dir) -> DataFrame and goes
through the KDataFrame engine API where the operator exists there, so the
registry doubles as an integration test of the engine surface.

Column-name contract: every computed/aggregate column is aliased
identically in the Spark plan and the oracle SQL (driver hashes values
with columns sorted by name). Floating aggregates are rounded in BOTH to
make the hash deterministic across engines (fp summation order differs).
"""

from __future__ import annotations

from typing import Callable

_SPARK: dict[str, Callable] = {}
_ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; oracle=None -> driver does a rows-only check."""

    def deco(fn):
        _SPARK[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


# The driver's correctness gate evaluates queries in dict insertion order
# and may stop after a fixed count (round 1 checked exactly the first 50).
# Order the registry so the first 50 span every operator family — sources
# through joins, grouping, pivot/reshape, window analytics, TPC-H shapes,
# dedup/similarity/text pipeline — instead of exhausting the budget on one
# module's block.
# Round-11 rotation (VERDICT r10 item 5): oldest-first. The 50-slot
# window = ALL 21 names whose latest green row is r7, then the round's
# FIVE new registrations (the routed SEARCH posture + the
# duplicated-span family — placed AFTER the r7 block so 21 cheaper
# queries absorb the sweep session's cold-start before the
# similarity-heavy new queries run), then 24 of the 50 r8 names,
# new-code-adjacent first — this round touched the similarity
# trainer/seed paths, the two-pass row number (core.frame), and the
# persist registries (cachereg: the jaccard-prefix base, the
# query-result pins, the coarse maps). After the r11 gate runs, no
# name's latest green row is older than r8.
_PRIORITY = [
    # oldest-green rotation: the 21 names whose latest green row is r7
    "cohort_retention", "decimal_exact_ledger", "diff_lag",
    "explode_embeddings", "flatten_nested", "funnel_conversion",
    "moving_average", "q4_priority_exists", "q6_revenue_band",
    "q8_market_share", "q10_returned_items", "q11_important_value",
    "q12_late_priority", "q13_order_distribution", "q14_type_share",
    "q18_large_orders", "sessionize", "sliding_window",
    "split_into_rows", "struct_roundtrip", "tumbling_window",
    # round-11 new registrations: the routed SEARCH posture + the
    # duplicated-span family (exact substring-dedup signals)
    "ann_ivf_routed_topk", "duplicate_spans_topk", "span_dup_share",
    "winnow_fingerprint_counts", "excise_duplicate_spans_docs",
    # window fill: 24 of the 50 r8 names, new-code-adjacent first
    "ann_ivf_topk", "ann_ivf_trained", "kmeans_det_assignments",
    "semdedup_scaled", "neardup_embedding", "simhash_hamming_scaled",
    "jaccard_prefix_pairs", "dedup_then_jaccard",
    "fuzzy_pairs_editdist", "dedup_clusters", "chunked_groups",
    "running_total_scan", "training_mix_report", "bloom_prefilter_join",
    "psi_drift_priority", "pagerank_parts", "bm25_topk",
    "tfidf_top_terms", "doc_fingerprints", "pivot_matches",
    "pivot_multi_agg", "move_restructure", "q15_top_supplier",
    "q16_supplier_relation",
]


def _ordered(d: dict) -> dict:
    out = {k: d[k] for k in _PRIORITY if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def spark_queries() -> dict[str, Callable]:
    _load_all()
    return _ordered(_SPARK)


def oracle_queries() -> dict[str, str]:
    _load_all()
    return _ordered(_ORACLE)


_LOADED = False


def _load_all():
    global _LOADED
    if _LOADED:
        return
    # import for registration side effects
    from dataframe_kotlin_spark.queries import (  # noqa: F401
        approx,
        core,
        joins,
        pipeline,
        reshape,
        tpch_extra,
        windowed,
    )

    _LOADED = True
