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
    # round-10 new registration: the chunked-model coarse-routed posture
    "ivf_assign_routed_chunks",
    # oldest-green rotation (VERDICT r9 item 6): the 20 names whose
    # latest green row is round 6
    "digitize_bins", "grouping_sets_qty", "hll_rollup_customers",
    "join_left_nulls", "median_quantity", "merge_upsert_customers",
    "mode_per_segment", "ntile_quartiles", "outer_join_nations",
    "quantiles_price", "rollup_region_nation", "select_project",
    "semi_join_customers", "split_generated_names", "stats_summary",
    "stddev_variance", "string_funcs", "top_k_orders",
    "union_missing_cols", "union_widen",
    # window fill: 29 of the 50 r7 names, new-code-adjacent first —
    # this round touched the similarity frame paths, the dedup persist
    # registry, the join-type alias table, and litrender's JVM gate
    "ann_ivf_scaled", "ann_bruteforce_topk", "semdedup_survivors",
    "jaccard_pairs", "simhash_hamming_pairs", "simhash_values",
    "minhash_signatures", "dedup_exact", "curate_corpus",
    "heavy_hitter_terms", "count_min_term_counts", "language_id",
    "pii_redaction", "dsir_log_weights", "decontamination_hits",
    "join_part_supplier_stats", "except_keys", "intersect_keys",
    "distinct_suppliers_brand", "q3_shipping_priority",
    "q5_local_supplier", "q2_min_cost_supplier", "q7_nation_volume",
    "q9_profit_nation_year", "pivot_counts", "pivot_sum_segments",
    "gather_melt", "q1_pricing_summary", "filter_predicates",
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
