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
# Round-9 rotation (VERDICT r8 item 5): oldest-first. The 50-slot
# window = the round's TWO new queries (the executor-resident centroid
# postures — new code ships with first-round driver evidence), then ALL
# 30 names whose latest green row is r5 (leading with the two the r9
# litrender rewrite could touch via null/value rendering), then 18 of
# the 38 r6 names — again rendering-adjacent first (pivot_null_bucket,
# merge_null_render, transpose_stats, describe_numeric all stringify
# values). After the r9 gate runs, no name's latest green row is older
# than r6.
_PRIORITY = [
    # round-9 new registrations: the executor-resident centroid postures
    # (assignment + end-to-end search)
    "ivf_assign_frame_scaled", "ann_ivf_frame_topk",
    # oldest-green rotation: every name last checked in round 5
    "multimodal_features", "quantize_embeddings_int8",
    "cumulative_sum", "dq_profile_orders", "first_last_events",
    "gather_groups_contacts", "gather_lists", "hypertable_rollup_events",
    "incremental_agg_state", "interarrival_quantiles",
    "interval_join_windows", "inverted_index", "json_extract_props",
    "json_props_extract", "lead_next", "lsh_candidate_pairs",
    "merge_cols_concat", "merge_rows_lists", "neighbour_values",
    "nth_order_value", "percent_rank_dist", "rolling_dedup_events",
    "rolling_range_revenue", "row_number_rank", "salted_join_agg",
    "scd2_status_timeline", "skip_last_tail", "slice_rows_page",
    "split_tokens", "winsorize_zscore_prices",
    # window fill: 18 of the 38 r6 names (the two r9 registrations took
    # the other slots), rendering-adjacent first
    # (this round rewrote core/litrender.py's double path)
    "pivot_null_bucket", "merge_null_render", "transpose_stats",
    "describe_numeric", "null_handling", "update_convert",
    "agg_minmax_count", "anti_join_customers", "approx_distinct_parts",
    "argmax_row", "arithmetic_round", "corr_pair", "count_by_priority",
    "count_conditional", "cube_flag_status", "distinct_by_first",
    "distinct_pair", "drop_rows_inverse",
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
