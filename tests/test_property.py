"""Property-based tests (hypothesis): the symbolic row-expression capture
and union type-widening must agree with plain pandas semantics on
arbitrary inputs — not just the fixture values.

Strategy sizes are kept small (Spark job per example is expensive); the
properties run on ONE generated dataset per case with many generated
expressions, which is where the bug surface actually is.
"""

from __future__ import annotations

import operator

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from dataframe_kotlin_spark import KDataFrame
from dataframe_kotlin_spark.core.rowexpr import capture

ROWS = [
    (0, 7, 3.5, "a"),
    (1, -2, 0.0, "b"),
    (2, 0, -1.25, None),
    (3, 100, 7.75, "a"),
    (4, -50, 2.5, "c"),
]


@pytest.fixture(scope="module")
def pdf():
    import pandas as pd

    return pd.DataFrame(ROWS, columns=["id", "i", "d", "s"])


@pytest.fixture(scope="module")
def sdf(spark):
    return spark.createDataFrame(ROWS, "id long, i long, d double, s string")


# expression AST: leaves are columns/constants, nodes are arith/compare ops
ARITH = [operator.add, operator.sub, operator.mul]
CMP = [operator.gt, operator.ge, operator.lt, operator.le, operator.eq]

leaf = st.sampled_from(["i", "d"]) | st.integers(-10, 10).map(lambda v: ("const", v))


@st.composite
def arith_expr(draw, depth=2):
    if depth == 0 or draw(st.booleans()):
        return draw(leaf)
    return (draw(st.sampled_from(ARITH)), draw(arith_expr(depth - 1)), draw(arith_expr(depth - 1)))


def build(node, get):
    if isinstance(node, str):
        return get(node)
    if node[0] == "const":
        return node[1]
    op, a, b = node
    return op(build(a, get), build(b, get))


@given(expr=arith_expr(), cmp=st.sampled_from(CMP))
@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
def test_captured_filter_matches_pandas(sdf, pdf, expr, cmp):
    """filter_expr(lambda r: <arbitrary arithmetic comparison>) keeps the
    same id set as the identical pandas expression."""
    mask = cmp(build(expr, lambda c: pdf[c]), 0)
    if isinstance(mask, bool):  # constant-only expression tree
        want_ids = set(pdf["id"]) if mask else set()
    else:
        want_ids = set(pdf[mask]["id"])

    kdf = KDataFrame(sdf)
    got = kdf.filter_expr(lambda r: cmp(build(expr, lambda c: getattr(r, c)), F.lit(0)))
    got_ids = {r["id"] for r in got.collect()}
    assert got_ids == want_ids


@given(expr=arith_expr())
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
def test_captured_add_matches_pandas(sdf, pdf, expr):
    """add_expr computed values equal the pandas computation (fp-exact:
    same double ops in the same tree shape)."""
    import pandas as pd

    want = build(expr, lambda c: pdf[c])
    if not isinstance(want, pd.Series):
        want = pd.Series([want] * len(pdf))
    kdf = KDataFrame(sdf)
    got = (
        kdf.add_expr("out", lambda r: build(expr, lambda c: getattr(r, c)) + F.lit(0))
        .sort_by("id")
        .collect()
    )
    for row, exp in zip(got, want):
        assert row["out"] == pytest.approx(exp, nan_ok=True)


INT_TYPES = ["int", "bigint", "double", "float"]


@given(lt=st.sampled_from(INT_TYPES), rt=st.sampled_from(INT_TYPES))
@settings(max_examples=16, deadline=None, suppress_health_check=list(HealthCheck))
def test_union_widening_never_loses_values(spark, lt, rt):
    """union of any two numeric column types yields a common type that
    round-trips both sides' values exactly (SURVEY §2.4 baseType merge)."""
    a = KDataFrame(spark.range(3).select(F.col("id").cast(lt).alias("x")))
    b = KDataFrame(spark.range(100, 103).select(F.col("id").cast(rt).alias("x")))
    out = a.union(b)
    vals = sorted(float(r["x"]) for r in out.collect())
    assert vals == [0.0, 1.0, 2.0, 100.0, 101.0, 102.0]
    assert out.nrow() == 6


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=0, max_size=12
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_connected_components_matches_union_find(spark, edges):
    """Iterative min-label propagation equals a driver-side union-find on
    arbitrary small graphs (self-loops and duplicates included)."""
    from dataframe_kotlin_spark.operators.graph import connected_components

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}

    if not edges:
        return
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, max_iter=25).collect()
    }
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3) | st.none(), st.integers(0, 3) | st.none()),
        min_size=1,
        max_size=8,
    ),
    desc_first=st.booleans(),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_sort_null_placement_matches_reference_semantics(spark, rows, desc_first):
    """Multi-key sort: asc = nulls first (reference default), desc =
    nulls last (reversed asc comparator) — checked against a python sort
    with the same comparator chain (SURVEY §2.7)."""
    indexed = [(i, a, b) for i, (a, b) in enumerate(rows)]
    df = KDataFrame(spark.createDataFrame(indexed, "id long, a long, b long"))
    k1 = F.col("a").desc_nulls_last() if desc_first else F.col("a").asc_nulls_first()
    got = [r["id"] for r in df.sort_by(k1, F.col("b").asc_nulls_first(), F.col("id")).collect()]

    def key(t):
        i, a, b = t
        if desc_first:  # desc_nulls_last: nulls sort AFTER all values
            a_key = (a is None, -a if a is not None else 0)
        else:  # asc_nulls_first: nulls sort BEFORE all values
            a_key = (a is not None, a if a is not None else 0)
        return (*a_key, b is not None, b if b is not None else 0, i)

    want = [t[0] for t in sorted(indexed, key=key)]
    assert got == want


@given(
    vals=st.lists(st.tuples(st.integers(0, 2), st.integers(-5, 5)), min_size=1, max_size=10)
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_merge_rows_explode_roundtrip(spark, vals):
    """mergeRows (collapse to lists) then explode returns the original
    multiset of rows (SURVEY §2.6 — explode is mergeRows' inverse)."""
    df = KDataFrame(spark.createDataFrame(vals, "k int, v int"))
    back = df.merge_rows(["v"]).explode("v")
    got = sorted((r["k"], r["v"]) for r in back.collect())
    assert got == sorted(vals)


@given(
    w=st.lists(st.floats(0.05, 1.0), min_size=2, max_size=5),
    salt=st.integers(0, 10_000),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_hash_split_partitions_exhaustively(spark, w, salt):
    """hash_split: any weight vector (normalized) assigns EVERY key to
    EXACTLY one split, deterministically in the salt."""
    from dataframe_kotlin_spark.operators import sampling

    total = sum(w)
    weights = {f"s{i}": x / total for i, x in enumerate(w)}
    df = spark.range(500).withColumnRenamed("id", "k")
    out = sampling.hash_split(df, "k", weights, salt=salt)
    assert out.filter(F.col("split").isNull()).count() == 0
    assert out.count() == 500
    again = sampling.hash_split(df, "k", weights, salt=salt)
    assert out.exceptAll(again).count() == 0


@given(
    budget=st.integers(5, 200),
    sizes=st.lists(st.integers(1, 300), min_size=1, max_size=40),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_pack_sequences_offsets_consistent(spark, budget, sizes):
    """pack_sequences: within every shard, offsets are the exact prefix
    sums in key order, every doc gets exactly one sequence, and a
    sequence's docs are contiguous in key order."""
    from dataframe_kotlin_spark.operators import sampling

    df = spark.createDataFrame(list(enumerate(sizes)), ["k", "n"])
    out = sampling.pack_sequences(df, "k", "n", budget=budget, shards=4)
    rows = sorted(out.collect(), key=lambda r: (r["__shard__"], r["k"]))
    assert len(rows) == len(sizes)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["__shard__"], []).append(r)
    for shard_rows in by_shard.values():
        run = 0
        prev_seq = None
        for r in shard_rows:
            assert r["offset_in_seq"] == run % budget
            expected_seq = (r["__shard__"] << 32) + run // budget
            assert r["seq_id"] == expected_seq
            if prev_seq is not None:
                assert r["seq_id"] >= prev_seq  # sequences advance with key order
            prev_seq = r["seq_id"]
            run += r["n"]


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    sigs=st.lists(st.integers(0, 2**16 - 1), min_size=2, max_size=30, unique=True),
    max_dist=st.integers(1, 4),
)
def test_hamming_pairs_full_recall_property(spark, sigs, max_dist):
    """Pigeonhole blocking must return EXACTLY the brute-force pair set
    for any signatures and any max_dist — full recall is the operator's
    contract, not a statistical property."""
    from dataframe_kotlin_spark.operators.dedup import hamming_pairs

    df = spark.createDataFrame([(i, s) for i, s in enumerate(sigs)], "id long, sig long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_pairs(df, "id", "sig", max_dist, bits=16).collect()
    }
    exp = set()
    for i, a in enumerate(sigs):
        for j in range(i + 1, len(sigs)):
            d = bin(a ^ sigs[j]).count("1")
            if d <= max_dist:
                exp.add((i, j, d))
    assert got == exp


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=st.lists(st.integers(-50, 50), min_size=1, max_size=12))
def test_add_scan_sum_matches_prefix_sums(spark, vals):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, v long"
    )
    out = KDataFrame(df).add_scan("rs", "v", "sum", order_by=["i"])
    got = [r["rs"] for r in out.collect_ordered("i")] if hasattr(out, "collect_ordered") else [
        r["rs"] for r in sorted(out.collect(), key=lambda r: r["i"])
    ]
    acc, exp = 0, []
    for v in vals:
        acc += v
        exp.append(acc)
    assert got == exp


# --- round-3 ops: PSI and DSIR invariants on generated inputs ---


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    counts=st.lists(
        st.tuples(st.sampled_from("abcde"), st.integers(1, 40), st.integers(1, 40)),
        min_size=2, max_size=5, unique_by=lambda t: t[0],
    )
)
def test_psi_nonnegative_and_zero_on_identical(spark, counts):
    """PSI(slice, ref) >= 0 for ANY pair of category distributions
    (Gibbs' inequality on both KL directions), and == 0 when the slice
    duplicates the reference exactly."""
    from dataframe_kotlin_spark.operators.quality import distribution_drift

    rows = []
    for v, n_ref, n_other in counts:
        rows += [("ref", v)] * n_ref + [("other", v)] * n_other + [("twin", v)] * n_ref
    df = spark.createDataFrame(rows, "slc string, v string")
    psi = {r["slc"]: r["psi"] for r in distribution_drift(df, "v", "slc", "ref").collect()}
    assert psi["other"] >= -1e-12
    assert abs(psi["twin"]) < 1e-12


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(seed=st.integers(0, 10_000))
def test_dsir_weight_zero_when_target_is_raw(spark, seed):
    """If the target distribution IS the raw corpus, every document's
    importance log-weight is exactly 0 (p == q term-by-term)."""
    from dataframe_kotlin_spark.operators.sampling import dsir_log_weights

    words = ["alpha", "beta", "gamma", "delta"]
    rows = [
        (i, " ".join(words[(i * 7 + j + seed) % 4] for j in range(5)))
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dsir_log_weights(df, df, buckets=32)
    assert all(abs(r["log_weight"]) < 1e-12 for r in out.collect())


# --- round-6 surface: merge null rendering, split generator, get_group ---

_CELL = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")),
        min_size=0,
        max_size=8,
    ),
)


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(st.tuples(_CELL, _CELL), min_size=1, max_size=6))
def test_merge_null_render_then_split_roundtrip(spark, rows):
    """merge.by(sep) is joinToString: null -> "null"; splitting back on a
    separator absent from the alphabet recovers every part (nulls as the
    "null" string — the reference's own lossy toString mapping)."""
    df = KDataFrame(
        spark.createDataFrame(
            [(i, a, b) for i, (a, b) in enumerate(rows)], "id int, a string, b string"
        )
    )
    merged = df.merge_cols(["a", "b"], into="m", sep="|")
    back = merged.split_col("m", r"\|", into=["a", "b"])
    got = {(r["id"], r["a"], r["b"]) for r in back.df.collect()}
    expected = {
        (i, "null" if a is None else a, "null" if b is None else b)
        for i, (a, b) in enumerate(rows)
    }
    assert got == expected


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(widths=st.lists(st.integers(1, 5), min_size=1, max_size=5), n_named=st.integers(0, 3))
def test_split_generator_names_cover_max_width(spark, widths, n_named):
    """into + extend yields explicit names then splitted{i} up to the max
    split width across the data; values align positionally."""
    rows = [(i, "-".join(["x"] * w)) for i, w in enumerate(widths)]
    df = KDataFrame(spark.createDataFrame(rows, "id int, s string"))
    named = [f"n{j}" for j in range(n_named)]
    out = df.split_col("s", "-", into=named, extend=True)
    w_max = max(widths)
    gen = [f"splitted{j + 1}" for j in range(max(0, w_max - n_named))]
    assert out.columns == ["id"] + named + gen
    # row with width w: first w parts "x", rest null
    for r in out.df.collect():
        w = widths[r["id"]]
        parts = [r[c] for c in out.columns if c != "id"]
        assert parts[:w] == ["x"] * min(w, len(parts))
        assert all(p is None for p in parts[w:])


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    keys=st.lists(st.one_of(st.none(), st.integers(0, 2)), min_size=1, max_size=8),
    probe=st.one_of(st.none(), st.integers(0, 2)),
)
def test_get_group_equals_null_safe_filter(spark, keys, probe):
    """grouped.get_group(v) == the null-safe filter, including None keys."""
    rows = [(i, k) for i, (k) in enumerate(keys)]
    df = KDataFrame(spark.createDataFrame(rows, "id int, k int"))
    got = {r["id"] for r in df.group_by("k").get_group(probe).df.collect()}
    expected = {i for i, k in enumerate(keys) if k == probe or (k is None and probe is None)}
    assert got == expected


# ---- explicit-pivot literal rendering (VERDICT r6 items 5-6) --------------
# The exact class the r5/r6 ADVICE rounds found bugs in: names for explicit
# pivot values must render EXACTLY as Spark's cast-to-string renders the key
# column (str(1) vs "1.0", '1e+20' vs '1.0E20', 'True' vs 'true', tuple
# escaping). Since round 7 the common types render driver-locally
# (core/litrender.py) — this property pins the local renderer against
# Spark's own cast on arbitrary values, and the zero-job contract.

import datetime as _dt
import math as _math

from pyspark.sql import types as _T

from dataframe_kotlin_spark.core.litrender import render_literal

_RL_TYPES = {
    "double": _T.DoubleType(),
    "int": _T.IntegerType(),
    "bigint": _T.LongType(),
    "smallint": _T.ShortType(),
    "boolean": _T.BooleanType(),
    "string": _T.StringType(),
    "date": _T.DateType(),
    "timestamp": _T.TimestampType(),
    "timestamp_ntz": _T.TimestampNTZType(),
}

_naive_ts = st.datetimes(
    min_value=_dt.datetime(1583, 1, 1), max_value=_dt.datetime(9999, 12, 28)
)
_typed_value = st.one_of(
    st.tuples(
        st.just("double"),
        st.one_of(
            st.floats(allow_nan=True, allow_infinity=True),  # incl. fallback zones
            st.floats(min_value=-1e7, max_value=1e7),
            st.integers(-(10**9), 10**9),  # ints pivoting a double column
            st.none(),
        ),
    ),
    st.tuples(st.just("int"), st.one_of(st.integers(-(2**40), 2**40), st.booleans(), st.none())),
    st.tuples(st.just("bigint"), st.integers(-(2**63), 2**63 - 1)),
    st.tuples(st.just("smallint"), st.integers(-(2**20), 2**20)),
    st.tuples(st.just("boolean"), st.booleans()),
    st.tuples(st.just("string"), st.text(max_size=20)),
    st.tuples(st.just("date"), st.dates(min_value=_dt.date(1583, 1, 1))),
    st.tuples(st.just("timestamp"), _naive_ts),
    st.tuples(st.just("timestamp_ntz"), _naive_ts),
)


def _in_local_gate(t: str, v) -> bool:
    """Values the module doc PROMISES render locally (zero extra jobs)."""
    if v is None:
        return False
    if t == "string":
        return isinstance(v, str)
    if t == "boolean":
        return isinstance(v, bool)
    if t in ("int", "bigint", "smallint"):
        lo, hi = {"int": 31, "bigint": 63, "smallint": 15}[t], None
        return isinstance(v, bool) or (
            isinstance(v, int) and -(2 ** lo) <= v <= 2**lo - 1
        )
    if t == "double":
        # r9: the FloatingDecimal emulation is exact for ALL doubles —
        # no fallback zone remains (VERDICT r8 item 1)
        return isinstance(v, (int, float)) and not isinstance(v, bool)
    if t == "date":
        return isinstance(v, _dt.date) and not isinstance(v, _dt.datetime) and v.year >= 1583
    if t in ("timestamp", "timestamp_ntz"):
        return isinstance(v, _dt.datetime) and v.tzinfo is None and v.year >= 1583
    return False


@settings(max_examples=200, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pairs=st.lists(_typed_value, min_size=1, max_size=12))
def test_render_literal_matches_spark_cast(spark, pairs):
    """Whenever render_literal claims a value, its string must equal
    Spark's own lit().cast(dtype).cast('string') — and every value inside
    the documented fast-path gates must be claimed (zero-job contract)."""
    exprs = [
        F.coalesce(F.lit(v).cast(t).cast("string"), F.lit("null")).alias(f"c{i}")
        for i, (t, v) in enumerate(pairs)
    ]
    row = spark.range(1).select(*exprs).first()
    for i, (t, v) in enumerate(pairs):
        local = "null" if v is None else render_literal(v, _RL_TYPES[t], spark)
        if local is not None:
            assert local == row[i], (t, v, local, row[i])
        if _in_local_gate(t, v):
            assert local is not None, (t, v)


# pinned counterexamples from the r5/r6 ADVICE rounds
@pytest.mark.parametrize(
    "t, v, expected",
    [
        ("double", 1, "1.0"),        # str(1) vs Spark "1.0" (ADVICE r5)
        ("double", 0.0, "0.0"),
        ("double", 1e6, "1000000.0"),
        ("double", 12.25, "12.25"),
        # r9 FloatingDecimal-emulation pins (VERDICT r8 item 1): Java 17's
        # pre-Ryu Double.toString is NOT shortest-round-trip — these are
        # the measured JVM strings, now rendered locally with no fallback
        ("double", 2**-24, "5.9604644775390625E-8"),   # the hypothesis counterexample (JDK-4511638)
        ("double", 2**-23, "1.1920928955078125E-7"),
        ("double", 1e20, "1.0E20"),
        # Java's long-arithmetic dtoa branch is strict at the half-ulp
        # boundary (d + 2**23 == 10**23 exactly), so NOT "1.0E23":
        ("double", 1e23, "9.999999999999999E22"),
        # long-branch b+m overflow suppresses the final round-up (JVM quirk)
        ("double", float.fromhex("0x1.3baacb18f2c5ep+84"), "2.3851136372966234E25"),
        ("double", -2.1395081286910736e25, "-2.1395081286910735E25"),
        ("double", 5e-324, "4.9E-324"),                # smallest subnormal: repr says 5e-324
        ("double", 2.2250738585072014e-308, "2.2250738585072014E-308"),  # smallest normal
        ("double", 1.7976931348623157e308, "1.7976931348623157E308"),    # largest finite
        ("double", 1.373428634809579e18, "1.37342863480957901E18"),      # exact-int extra digit
        ("double", float(2**53), "9.007199254740992E15"),
        ("double", float("nan"), "NaN"),
        ("double", float("inf"), "Infinity"),
        ("double", -0.0, "-0.0"),
        ("boolean", True, "true"),   # str(True) vs Spark "true" (ADVICE r5)
        ("int", 300, "300"),
        ("smallint", 2**20, None),   # out of range: cast wraps -> fall back
        ("date", _dt.date(2020, 5, 3), "2020-05-03"),
        ("date", _dt.date(1500, 5, 3), None),  # pre-1583 rebase -> fall back
        ("timestamp", _dt.datetime(2021, 3, 4, 5, 6, 7, 120000), "2021-03-04 05:06:07.12"),
        ("timestamp", _dt.datetime(2021, 3, 4, 5, 6, 7), "2021-03-04 05:06:07"),
    ],
)
def test_render_literal_pinned_cases(spark, t, v, expected):
    local = render_literal(v, _RL_TYPES[t], spark)
    assert local == expected
    if expected is None:
        # the fallback path must still agree with Spark's cast — replay it
        got = (
            spark.range(1)
            .select(F.coalesce(F.lit(v).cast(t).cast("string"), F.lit("null")).alias("c"))
            .first()["c"]
        )
        assert got is not None  # lit-able; _explicit_names renders via this job


def test_explicit_pivot_common_types_launch_no_job(spark, monkeypatch):
    """Explicit pivot values of common types must not launch the range(1)
    rendering job (VERDICT r6 item 5): poison spark.range and render."""
    df = KDataFrame(
        spark.createDataFrame(
            [("a", 1.0, _dt.date(2020, 1, 2), 5)],
            "k string, ratio double, d date, v int",
        )
    )

    def boom(*a, **kw):  # pragma: no cover - failure path
        raise AssertionError("range(1) job launched for common-type explicit pivot values")

    monkeypatch.setattr(type(spark), "range", boom)
    clause = df.group_by("k").pivot("ratio", [1, 2])
    assert clause._explicit_names([1, 2]) == ["1.0", "2.0"]
    dclause = df.group_by("k").pivot("d", [_dt.date(2020, 1, 2)])
    assert dclause._explicit_names([_dt.date(2020, 1, 2)]) == ["2020-01-02"]
    # multi-pivot tuple values render + escape locally too
    mclause = df.group_by("v").pivot(["k", "ratio"], [("a_b", 1)])
    assert mclause._explicit_names([("a_b", 1)]) == ["a\\_b_1.0"]


def test_explicit_pivot_exotic_values_fall_back_to_spark(spark):
    """Values outside the proven gates (1e20 on Java 17, Decimal columns)
    still render through the range(1) job, bit-identical to discovery."""
    from decimal import Decimal

    df = KDataFrame(
        spark.createDataFrame(
            [("a", 1e20, Decimal("1.50"), 5), ("a", 2.0, Decimal("2.25"), 7)],
            "k string, x double, dec decimal(10,2), v int",
        )
    )
    out = df.group_by("k").pivot("x", [1e20, 2.0]).sum("v", default=0)
    assert set(out.columns) == {"k", "1.0E20", "2.0"}
    row = out.collect()[0]
    assert row["1.0E20"] == 5 and row["2.0"] == 7
    dout = df.group_by("k").pivot("dec", [Decimal("1.5"), Decimal("2.25")]).sum("v", default=0)
    assert set(dout.columns) == {"k", "1.50", "2.25"}
    drow = dout.collect()[0]
    assert drow["1.50"] == 5 and drow["2.25"] == 7


# ---- n-gram builders after the bind1 rewrite (round 7) --------------------
# The interpreted-lambda fix (functions/text.bind1) restructured every
# sliding-window builder; these properties pin their OUTPUT against a plain
# Python reference so the 22x speedup can't silently change content. Also
# guards the pyspark arity trap: transform passes (element, index) to any
# callable whose signature shows two parameters (the repetition_stats bug
# this round: a (t, n=n) closure got the INDEX bound to n).

import re as _re


def _pynorm(t: str) -> str:
    return _re.sub(r"\s+", " ", t.lower()).strip()


_texts = st.lists(
    st.text(alphabet=" abcdef", max_size=40), min_size=1, max_size=6
)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=_texts)
def test_ngram_builders_match_python_reference(spark, texts):
    from dataframe_kotlin_spark.functions.text import shingles, word_shingles
    from dataframe_kotlin_spark.operators.textpipe import repetition_stats
    from dataframe_kotlin_spark.queries.pipeline import _sliding_bigrams

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    out = {
        r["id"]: r
        for r in repetition_stats(
            df.select(
                "id",
                "text",
                word_shingles(F.col("text"), 3).alias("ws"),
                shingles(F.col("text"), 5).alias("cs"),
                F.when(
                    F.size(F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")) >= 2,
                    _sliding_bigrams(F.col("text")),
                ).otherwise(F.array()).alias("bi"),
            ),
            "text",
            ns=(2,),
        ).collect()
    }
    for i, t in enumerate(texts):
        toks = _pynorm(t).split(" ")
        r = out[i]
        # word 3-shingles, distinct, first-occurrence order
        ws, seen = [], set()
        if len(toks) >= 3:
            for j in range(len(toks) - 2):
                s = " ".join(toks[j : j + 3])
                if s not in seen:
                    seen.add(s)
                    ws.append(s)
        assert r["ws"] == ws, (t, r["ws"], ws)
        # char 5-shingles, distinct, first-occurrence order
        nm = _pynorm(t)
        cs, seen = [], set()
        if len(nm) >= 5:
            for j in range(len(nm) - 4):
                s = nm[j : j + 5]
                if s not in seen:
                    seen.add(s)
                    cs.append(s)
        assert r["cs"] == cs, (t, r["cs"], cs)
        # sliding bigrams, every occurrence, in order
        bi = [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)] if len(toks) >= 2 else []
        assert r["bi"] == bi, (t, r["bi"], bi)
        # gopher duplicate-bigram fraction
        total = max(len(toks) - 1, 0)
        nd = len(set(bi))
        expect = 0.0 if total <= 0 else round((total - nd) / total + 1e-9, 4)
        assert abs(r["dup_2gram_frac"] - expect) < 1e-9, (t, r["dup_2gram_frac"], expect)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=_texts, depth=st.integers(min_value=1, max_value=4))
def test_bind1_composition_depth_bitexact(spark, texts, depth):
    """VERDICT r7 item 8: bind1-inside-bind1 (nested grams over
    normalized text use at least two levels) must stay bit-equal to the
    naive direct-reference form at EVERY nesting depth — a refactor that
    reintroduces an outer non-attribute reference inside a lambda body
    would change performance silently but must never change content.
    Each level references its bound variable twice, so the naive twin
    repeats the whole subexpression; identical outputs prove the
    transform(array(col), f)[1] binding is pure renaming."""
    from dataframe_kotlin_spark.functions.text import bind1, normalize

    def bound(col, d):
        if d == 0:
            return F.upper(col)
        return bind1(
            normalize(col),
            lambda t: F.concat(bound(t, d - 1), F.lit("|"), F.length(t).cast("string")),
        )

    def naive(col, d):
        if d == 0:
            return F.upper(col)
        n = normalize(col)
        return F.concat(naive(n, d - 1), F.lit("|"), F.length(n).cast("string"))

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    rows = df.select(
        "id",
        bound(F.col("text"), depth).alias("b"),
        naive(F.col("text"), depth).alias("n"),
    ).collect()
    for r in rows:
        assert r["b"] == r["n"], (depth, r["b"], r["n"])


def test_render_literal_timestamp_requires_utc_session(spark):
    """The timestamp fast path is only proven under UTC session + UTC JVM
    zone (lit interprets naive datetimes in the JVM default zone, the
    cast renders in the session zone) — a non-UTC session must fall back
    to the range(1) job rather than render locally."""
    import types

    from dataframe_kotlin_spark.core.litrender import render_literal

    v = _dt.datetime(2021, 3, 4, 5, 6, 7)
    assert render_literal(v, _RL_TYPES["timestamp"], spark) == "2021-03-04 05:06:07"

    class FakeConf:
        def get(self, key):
            return "America/New_York"

    fake = types.SimpleNamespace(conf=FakeConf())
    assert render_literal(v, _RL_TYPES["timestamp"], fake) is None
    # tz-aware datetimes always fall back, even under UTC
    aware = v.replace(tzinfo=_dt.timezone.utc)
    assert render_literal(aware, _RL_TYPES["timestamp"], spark) is None


def test_render_literal_tracks_session_tz_changes(spark):
    """ADVICE r7: the UTC-session check must NOT be cached forever on
    the session — user code can spark.conf.set the session timeZone
    mid-session, and a stale cached True would render timestamp pivot
    names in UTC while the key column stringifies in the new zone."""
    from dataframe_kotlin_spark.core.litrender import render_literal

    v = _dt.datetime(2021, 3, 4, 5, 6, 7)
    # prime any cache under UTC: fast path renders locally
    assert render_literal(v, _RL_TYPES["timestamp"], spark) == "2021-03-04 05:06:07"
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        # the conf change must be seen immediately -> fall back (None)
        assert render_literal(v, _RL_TYPES["timestamp"], spark) is None
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    # and back to UTC the fast path resumes
    assert render_literal(v, _RL_TYPES["timestamp"], spark) == "2021-03-04 05:06:07"


def test_render_literal_double_gated_on_legacy_jvm(spark):
    """java_double_str emulates the PRE-JDK-19 Double.toString; on a
    Ryu-era (19+) JVM the legacy digits would be wrong names, so the
    double fast path must fall back there (r9 review finding). Also:
    a Python int too large for float must fall back, not crash."""
    import types

    from dataframe_kotlin_spark.core.litrender import (
        _legacy_double_jvm,
        render_literal,
    )

    # this container's JVM is 17 -> the fast path engages
    assert _legacy_double_jvm(spark) is True
    assert render_literal(0.5, _RL_TYPES["double"], spark) == "0.5"
    # overflow int: documented fallback instead of OverflowError
    assert render_literal(10**400, _RL_TYPES["double"], spark) is None

    class FakeSystem:
        @staticmethod
        def getProperty(key):
            return "21"

    fake = types.SimpleNamespace(
        _jvm=types.SimpleNamespace(
            java=types.SimpleNamespace(lang=types.SimpleNamespace(System=FakeSystem))
        )
    )
    assert _legacy_double_jvm(fake) is False
    assert render_literal(0.5, _RL_TYPES["double"], fake) is None
    # unreadable version -> conservative fallback
    broken = types.SimpleNamespace()
    assert _legacy_double_jvm(broken) is False
