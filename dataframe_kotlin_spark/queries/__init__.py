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
# Round-12 rotation (VERDICT r11 item 5): oldest-first. The 50-slot
# window = ALL 26 names whose latest green row is r8, then the round's
# FIVE new registrations (the winnowed span-candidate pipeline, the
# hashed span posture, the longest-duplicated-run statistic, and the
# incremental store-based dedup pair — after the r8 block so 26
# cheaper queries absorb the sweep session's cold-start), then the
# routed-chunks ASSIGN posture DELIBERATELY BEFORE the routed SEARCH
# posture — the two share an exact model lineage, so assign pays the
# one-off training + coarse-layer build and ann_ivf_routed_topk's
# construction becomes a memo hit (VERDICT r11 item 3: 15.6 s
# cold-first -> warm; ann_ivf_routed_topk is re-gated because its
# evidence sizing changed this round) — then 17 of the 50 r9 names,
# new-code-adjacent first (this round touched the similarity
# construction/memo paths, dedup's candidate-pair discipline, and
# core.frame's known_bounds path).
# After the r12 gate runs, no name's latest green row is older than r9.
_PRIORITY = [
    # oldest-green rotation: the 26 names whose latest green row is r8
    "asof_last_purchase", "asof_nearest_purchase", "asof_next_purchase",
    "bigram_lm_topk", "chunk_documents", "collocations_pmi",
    "distinct_by_expr", "doc_surprisal_scores", "hash_split_counts",
    "hll_deterministic_customers", "mix_weighted_counts",
    "mixture_plan_langs", "pack_sequences_stats", "q17_small_quantity",
    "q19_brand_bands", "q20_promotion_suppliers", "q21_waiting_supplier",
    "q22_idle_balance", "quality_filter", "repetition_filter",
    "resample_ffill_hours", "reservoir_counts", "split_leakage_pairs",
    "term_frequency_topk", "text_stats", "weighted_sample_langs",
    # round-12 new registrations (the winnow consumer, the hash
    # posture, the longest-duplicated-run statistic, and the
    # incremental store-based dedup pair)
    "winnow_span_pairs", "duplicate_spans_hashed", "longest_dup_run",
    "incremental_new_docs", "incremental_span_contamination",
    # shared-lineage pair: assign FIRST (pays construction), search
    # second (memo-warm); the search query is re-gated this round
    "ivf_assign_routed_chunks", "ann_ivf_routed_topk",
    # window fill: 17 of the 50 r9 names, new-code-adjacent first
    # (17, not 20 — the five new registrations took three extra slots)
    "ann_ivf_frame_topk", "ivf_assign_frame_scaled",
    "quantize_embeddings_int8", "lsh_candidate_pairs",
    "row_number_rank", "skip_last_tail", "slice_rows_page",
    "drop_rows_inverse", "distinct_by_first", "nth_order_value",
    "split_tokens", "inverted_index", "multimodal_features",
    "merge_rows_lists", "describe_numeric", "corr_pair",
    "agg_minmax_count",
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
