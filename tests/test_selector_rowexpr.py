"""Selector DSL + row-expression capture (SURVEY §2.2, §2.10)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataframe_kotlin_spark.core import columns as C
from dataframe_kotlin_spark.core.rowexpr import capture, pandas_filter, pandas_map


def test_cols_of_and_typed_selectors(person):
    s = person.schema
    assert C.string_cols(s) == ["name", "city"]
    assert C.int_cols(s) == ["age", "weight"]
    assert C.cols_of(s, T.IntegerType) == ["age", "weight"]


def test_name_selectors(person):
    s = person.schema
    assert C.name_contains(s, "a") == ["name", "age"]
    assert C.starts_with(s, "w") == ["weight"]
    assert C.ends_with(s, "y") == ["city"]


def test_positional_selectors(person):
    s = person.schema
    assert C.all_after(s, "age") == ["city", "weight"]
    assert C.all_since(s, "age") == ["age", "city", "weight"]
    assert C.all_before(s, "age") == ["name"]
    assert C.all_until(s, "age") == ["name", "age"]
    assert C.cols(s, indices=[0, 2]) == ["name", "city"]


def test_set_algebra(person):
    s = person.schema
    sel = C.except_(C.top_level(s), ["city"])
    assert sel == ["name", "age", "weight"]
    assert C.union(["a", "b"], ["b", "c"]) == ["a", "b", "c"]


def test_dfs_recursive_paths(person):
    nested = person.group_cols(["city", "weight"], into="info")
    paths = C.dfs(nested.schema)
    assert paths == ["name", "age", "info.city", "info.weight"]
    only_ints = C.dfs(nested.schema, lambda p, f: isinstance(f.dataType, T.IntegerType))
    assert only_ints == ["age", "info.weight"]


def test_select_cols_with_selector(person):
    out = person.select_cols(lambda s: C.int_cols(s))
    assert out.columns == ["age", "weight"]
    nested = person.group_cols(["city", "weight"], into="info")
    flat = nested.select_cols(lambda s: C.dfs(s))
    assert flat.columns == ["name", "age", "info_city", "info_weight"]


def test_filter_expr_symbolic_capture(person):
    out = person.filter_expr(lambda r: (r.age > 20) & r.city.isNotNull())
    got = {(x["name"], x["age"]) for x in out.collect()}
    assert got == {("Bob", 45), ("Bob", 30), ("Mark", 40), ("Mark", 30)}


def test_filter_expr_stays_native(person):
    # symbolic capture must NOT introduce a Python UDF into the plan
    out = person.filter_expr(lambda r: r.age > 20)
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_add_expr(person):
    out = person.add_expr("bmi_ish", lambda r: r.weight / (r.age * r.age))
    r = {x["name"]: x["bmi_ish"] for x in out.collect() if x["age"] == 15}
    assert abs(r["Alice"] - 54 / 225) < 1e-12


def test_capture_rejects_non_column(person):
    with pytest.raises(TypeError):
        capture(person.df, lambda r: 42)


def test_pandas_filter_fallback(person):
    out = pandas_filter(person.df, lambda pdf: pdf["age"] > 20)
    assert out.count() == 4


def test_pandas_map_fallback(person):
    def double_age(pdf):
        pdf = pdf.copy()
        pdf["age"] = pdf["age"] * 2
        return pdf

    out = pandas_map(person.df, double_age, person.df.schema)
    assert sorted(r["age"] for r in out.collect())[-1] == 90
