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
# Round-8 rotation (VERDICT r7 item 4): oldest-first. The 50-slot
# window = the 3 queries REGISTERED THIS ROUND (the scale-posture twins
# semdedup_scaled + simhash_hamming_scaled and the composed
# dedup_then_jaccard flow — VERDICT r7 items 2-3) first, then ALL 39
# names whose latest green row is r4, then 8 r5 names (leading with
# doc_surprisal_scores and resample_ffill_hours, whose code/measurement
# changed this round) to fill the window. After the r8 gate runs, no
# name's latest green row is older than r5.
_PRIORITY = [
    # first evidence: registered in round 8
    "semdedup_scaled", "simhash_hamming_scaled", "dedup_then_jaccard",
    # oldest-green rotation: every name last checked in round 4
    "ann_ivf_topk", "ann_ivf_trained", "bm25_topk", "chunked_groups",
    "collocations_pmi", "dedup_clusters", "distinct_by_expr",
    "doc_fingerprints", "fuzzy_pairs_editdist", "hash_split_counts",
    "hll_deterministic_customers", "jaccard_prefix_pairs",
    "kmeans_det_assignments", "mix_weighted_counts", "mixture_plan_langs",
    "move_restructure", "neardup_embedding", "pack_sequences_stats",
    "pagerank_parts", "pivot_matches", "pivot_multi_agg",
    "psi_drift_priority", "q15_top_supplier", "q16_supplier_relation",
    "q17_small_quantity", "q19_brand_bands", "q20_promotion_suppliers",
    "q21_waiting_supplier", "q22_idle_balance", "quality_filter",
    "repetition_filter", "reservoir_counts", "running_total_scan",
    "split_leakage_pairs", "term_frequency_topk", "text_stats",
    "tfidf_top_terms", "training_mix_report", "weighted_sample_langs",
    # window fill: r5 names — the two touched this round first
    "doc_surprisal_scores", "resample_ffill_hours",
    "asof_last_purchase", "asof_nearest_purchase", "asof_next_purchase",
    "bigram_lm_topk", "bloom_prefilter_join", "chunk_documents",
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
