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
