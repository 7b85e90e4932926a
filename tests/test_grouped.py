"""Grouping/aggregation/pivot — mirrors reference DataFrameTests grouping
sections, AnimalsTests NaN semantics, PivotTests."""

import math

from pyspark.sql import functions as F


def test_group_count(person):
    out = person.group_by("name").count()
    got = {(r["name"], r["n"]) for r in out.collect()}
    assert got == {("Alice", 2), ("Bob", 2), ("Mark", 3)}


def test_group_multi_agg(person):
    out = person.group_by("name").aggregate(
        F.min("age").alias("min_age"),
        F.max("age").alias("max_age"),
        F.avg("age").alias("mean_age"),
    )
    d = {r["name"]: r for r in out.collect()}
    assert d["Mark"]["min_age"] == 20 and d["Mark"]["max_age"] == 40
    assert d["Alice"]["mean_age"] == 17.5


def test_mean_skipna_true_matches_reference(animals):
    """AnimalsTests.kt:17-19: mean('age', skipNa=true) == 3.4375."""
    out = animals.df.agg(
        F.avg(F.when(~F.isnan("age"), F.col("age"))).alias("m")
    ).collect()[0]
    assert out["m"] == 3.4375


def test_mean_skipna_false_nan_poisons(animals):
    """skipNa=false -> NaN when any value is NaN (api/mean.kt:11-52)."""
    out = animals.df.agg(
        F.when(F.max(F.isnan("age").cast("int")) == 1, float("nan"))
        .otherwise(F.avg("age"))
        .alias("m")
    ).collect()[0]
    assert math.isnan(out["m"])


def test_max_by_argmax_row(person):
    out = person.group_by("name").max_by("age")
    d = {r["name"]: (r["age"], r["city"]) for r in out.collect()}
    assert d == {"Alice": (20, None), "Bob": (45, "Dubai"), "Mark": (40, "Milan")}


def test_min_by_with_tiebreak(spark):
    from dataframe_kotlin_spark import KDataFrame

    df = KDataFrame(
        spark.createDataFrame(
            [("a", 1, 10), ("a", 1, 5), ("a", 2, 1)], "k string, v int, t int"
        )
    )
    out = df.group_by("k").min_by("v", tiebreak="t")
    r = out.collect()[0]
    assert (r["v"], r["t"]) == (1, 5)


def test_values_collect_sorted(person):
    out = person.group_by("name").values("age")
    d = {r["name"]: r["age"] for r in out.collect()}
    assert d["Mark"] == [20, 30, 40]


def test_median_std(person):
    out = person.group_by("name").median_for("age")
    d = {r["name"]: r["age"] for r in out.collect()}
    assert d["Mark"] == 30.0 and d["Alice"] == 17.5  # even count -> mean of middles
    sd = person.group_by("name").std_for("age")
    d2 = {r["name"]: r["age"] for r in sd.collect()}
    assert math.isclose(d2["Mark"], 10.0)


def test_top_k_per_group(person):
    out = person.group_by("name").top_k(1, [F.col("age").desc()])
    ages = {r["name"]: r["age"] for r in out.collect()}
    assert ages == {"Alice": 20, "Bob": 45, "Mark": 40}


def test_pivot_counts_with_defaults(person):
    out = person.group_by("name").pivot("city").count(default=0)
    d = {r["name"]: r for r in out.collect()}
    assert d["Mark"]["Moscow"] == 2 and d["Mark"]["Milan"] == 1
    assert d["Alice"]["Moscow"] == 0  # default fill
    # sorted distinct values -> deterministic column order; the NULL city
    # pivots into a trailing "null" column (reference toString naming,
    # DataFrameTests.kt:938)
    assert out.columns == ["name", "Dubai", "London", "Milan", "Moscow", "Tokyo", "null"]
    assert d["Alice"]["null"] == 1 and d["Mark"]["null"] == 0


def test_pivot_matches(person):
    out = person.group_by("name").pivot("city").matches()
    d = {r["name"]: r for r in out.collect()}
    assert d["Mark"]["Moscow"] is True
    assert d["Alice"]["Moscow"] is False


def test_pivot_matches_custom_markers(person):
    # reference matches(yes, no) custom marker form
    out = person.group_by("name").pivot("city").matches("V", "-")
    d = {r["name"]: r for r in out.collect()}
    assert d["Mark"]["Moscow"] == "V" and d["Alice"]["Moscow"] == "-"


def test_pivot_values_lists(person):
    out = person.group_by("name").pivot("city", ["Moscow"]).values("age")
    d = {r["name"]: r for r in out.collect()}
    assert d["Mark"]["Moscow"] == [20, 30]
    assert d["Alice"]["Moscow"] == []  # collect_list over zero rows


def test_pivot_frames_nested(person):
    out = person.group_by("name").pivot("city", ["Moscow", "Tokyo"]).frames()
    d = {r["name"]: r for r in out.collect()}
    marks = [(r["age"], r["weight"]) for r in d["Mark"]["Moscow"]]
    assert sorted(marks) == [(20, None), (30, 90)]
    assert [(r["age"], r["weight"]) for r in d["Bob"]["Tokyo"]] == [(30, 68)]


def test_pivot_sum(person):
    out = person.group_by("name").pivot("city", ["Moscow", "London"]).sum("age", default=0)
    d = {r["name"]: r for r in out.collect()}
    assert d["Mark"]["Moscow"] == 50
    assert d["Bob"]["Moscow"] == 0


def test_map_groups_apply_in_pandas(person):
    def center(pdf):
        pdf = pdf.copy()
        pdf["age"] = pdf["age"] - pdf["age"].mean()
        return pdf[["name", "age"]]

    out = person.group_by("name").map_groups(center, "name string, age double")
    d = sorted(r["age"] for r in out.collect() if r["name"] == "Mark")
    assert d == [-10.0, 0.0, 10.0]


def test_cube_rollup(person):
    out = person.group_by("name", "city").cube(F.count(F.lit(1)).alias("n"))
    total = [r for r in out.collect() if r["name"] is None and r["city"] is None]
    assert total[0]["n"] == 7


def test_merge_rows(person):
    out = person.select("name", "age").merge_rows(["age"])
    d = {r["name"]: r["age"] for r in out.collect()}
    assert d["Mark"] == [20, 30, 40]


def test_gather(person):
    wide = person.group_by("name").aggregate(
        F.sum("age").alias("sum_age"), F.count(F.lit(1)).alias("cnt")
    )
    long = wide.gather(["sum_age", "cnt"], key_name="metric", value_name="v")
    got = {(r["name"], r["metric"], r["v"]) for r in long.collect()}
    assert ("Mark", "sum_age", 90) in got and ("Mark", "cnt", 3) in got


def test_explode_multi_positional_alignment(spark):
    """Multi-column explode aligns positionally, pads with null
    (api/explode.kt:23-108)."""
    from dataframe_kotlin_spark import KDataFrame

    df = KDataFrame(
        spark.createDataFrame(
            [(1, [1, 2], ["a"]), (2, [3], ["b", "c"])],
            "id int, xs array<int>, ys array<string>",
        )
    )
    out = df.explode("xs", "ys")
    got = {tuple(r) for r in out.collect()}
    assert got == {(1, 1, "a"), (1, 2, None), (2, 3, "b"), (2, None, "c")}


def test_pivot_two_columns_flattened(person2):
    # reference PivotTests `pivot two columns`: combos flatten to
    # first_second columns (separator parity, SURVEY §2.6)
    out = (
        person2.group_by("name")
        .pivot(["origin", "age"], ["London_young", "London_old", "Paris_old"])
        .sum("grade", default=0)
    )
    d = {r["name"]: r for r in out.collect()}
    assert d["Alice"]["London_young"] == 3
    assert d["Alice"]["London_old"] == 5
    assert d["Bob"]["Paris_old"] == 5
    assert d["Mark"]["London_young"] == 0
    # auto-discovered combos are sorted and complete
    auto = person2.group_by("name").pivot(["origin", "age"]).count(default=0)
    assert auto.columns[0] == "name"
    assert "Moscow_young" in auto.columns and "Tokyo_young" in auto.columns


def test_pivot_multi_value_nested_layout(person):
    # reference PivotTests `pivot two values`: multiple aggregates nest
    # as column groups per pivot value (aggregatePivot path composition,
    # api/pivot.kt:27-56) — out["Moscow"]["min_age"]; groupByValue flips
    # the nesting to out["min_age"]["Moscow"]
    from pyspark.sql import types as T

    out = (
        person.group_by("name")
        .pivot("city", ["Moscow", "London"])
        .aggregate(
            F.min("age").alias("min_age"),
            F.max("age").alias("max_age"),
            nested=True,
        )
    )
    assert out.columns == ["name", "Moscow", "London"]
    assert isinstance(out.df.schema["Moscow"].dataType, T.StructType)
    assert [f.name for f in out.df.schema["Moscow"].dataType.fields] == ["min_age", "max_age"]
    d = {r["name"]: r for r in out.collect()}
    flat = (
        person.group_by("name")
        .pivot("city", ["Moscow", "London"])
        .aggregate(F.min("age").alias("min_age"), F.max("age").alias("max_age"))
    )
    fd = {r["name"]: r for r in flat.collect()}
    for n, r in d.items():
        assert r["Moscow"]["min_age"] == fd[n]["Moscow_min_age"]
        assert r["London"]["max_age"] == fd[n]["London_max_age"]

    flipped = (
        person.group_by("name")
        .pivot("city", ["Moscow", "London"])
        .aggregate(
            F.min("age").alias("min_age"),
            F.max("age").alias("max_age"),
            nested=True,
            group_by_value=True,
        )
    )
    assert flipped.columns == ["name", "min_age", "max_age"]
    assert [f.name for f in flipped.df.schema["min_age"].dataType.fields] == ["Moscow", "London"]
    fl = {r["name"]: r for r in flipped.collect()}
    for n in d:
        assert fl[n]["min_age"]["Moscow"] == d[n]["Moscow"]["min_age"]


def test_pivot_multi_separator_collision_and_nulls(spark):
    # ("a_b","c") vs ("a","b_c") must stay distinct columns (the
    # separator is escaped inside values), and a NULL in a pivot column
    # stringifies to "null" — the reference's toString naming
    # (DataFrameTests.kt:938) — instead of dropping the row
    from dataframe_kotlin_spark import KDataFrame

    df = KDataFrame(
        spark.createDataFrame(
            [
                ("g", "a_b", "c", 1),
                ("g", "a", "b_c", 10),
                ("g", None, "x", 100),
                ("g", "y", None, 1000),
            ],
            "k string, p1 string, p2 string, v int",
        )
    )
    out = df.group_by("k").pivot(["p1", "p2"]).sum("v", default=0)
    row = out.collect()[0]
    cols = set(out.columns) - {"k"}
    assert cols == {"a\\_b_c", "a_b\\_c", "null_x", "y_null"}  # no collision
    vals = sorted(row[c] for c in cols)
    assert vals == [1, 10, 100, 1000]  # every combo kept, none merged


def test_merge_rows_keep_nulls(spark):
    # reference DataFrameTests `merge rows keep nulls` vs `drop nulls`
    from dataframe_kotlin_spark import KDataFrame

    df = KDataFrame(
        spark.createDataFrame(
            [("a", 1), ("a", None), ("b", 2)], "k string, v int"
        )
    )
    dropped = {r["k"]: r["v"] for r in df.merge_rows(["v"]).collect()}
    assert dropped == {"a": [1], "b": [2]}
    kept = {r["k"]: r["v"] for r in df.merge_rows(["v"], drop_nulls=False).collect()}
    assert kept == {"a": [None, 1], "b": [2]}  # sort_array: nulls first


def test_pivot_nested_underscore_prefix_values(spark):
    # a pivot value that is an underscore-prefix of another ("New" vs
    # "New_York") must not claim the longer value's columns: assignment
    # matches the longest value first
    from pyspark.sql import types as T

    from dataframe_kotlin_spark.core.frame import KDataFrame

    df = KDataFrame(
        spark.createDataFrame(
            [("g1", "New", 1), ("g1", "New_York", 10), ("g2", "New", 3)],
            "g string, city string, v int",
        )
    )
    out = df.group_by("g").pivot("city", ["New", "New_York"]).aggregate(
        F.min("v").alias("min_v"), F.max("v").alias("max_v"), nested=True
    )
    assert out.columns == ["g", "New", "New_York"]
    for v in ("New", "New_York"):
        assert [f.name for f in out.df.schema[v].dataType.fields] == ["min_v", "max_v"]
    d = {r["g"]: r for r in out.collect()}
    assert d["g1"]["New"]["min_v"] == 1
    assert d["g1"]["New_York"]["max_v"] == 10
    assert d["g2"]["New_York"]["min_v"] is None


def test_pivot_nested_computed_group_key(person):
    # computed/aliased grouping keys resolve through the output schema,
    # not the Column expression string
    out = (
        person.group_by(F.substring("name", 1, 1).alias("initial"))
        .pivot("city", ["Moscow", "London"])
        .aggregate(F.min("age").alias("min_age"), F.max("age").alias("max_age"), nested=True)
    )
    assert out.columns == ["initial", "Moscow", "London"]
    d = {r["initial"]: r for r in out.collect()}
    assert d["M"]["Moscow"]["min_age"] == 20
    assert d["A"]["London"]["max_age"] == 15


def test_pivot_null_vs_literal_null_string_merge(spark):
    # reference toString parity: a NULL key and the literal string
    # "null" name the SAME column (Kotlin's value.toString()), on both
    # the single- and multi-column paths — and never produce two
    # duplicate "null" columns (which would break by-name access and
    # the nested layout)
    from dataframe_kotlin_spark import KDataFrame

    df = KDataFrame(
        spark.createDataFrame(
            [("g", "null", 1), ("g", None, 10), ("g", "x", 100)],
            "k string, p string, v int",
        )
    )
    out = df.group_by("k").pivot("p").sum("v", default=0)
    assert sorted(out.columns) == ["k", "null", "x"]  # no duplicates
    row = out.collect()[0]
    assert row["null"] == 11 and row["x"] == 100

    df2 = KDataFrame(
        spark.createDataFrame(
            [("g", "null", "a", 1), ("g", None, "a", 10)],
            "k string, p1 string, p2 string, v int",
        )
    )
    out2 = df2.group_by("k").pivot(["p1", "p2"]).sum("v", default=0)
    assert sorted(out2.columns) == ["k", "null_a"]
    assert out2.collect()[0]["null_a"] == 11


def test_pivot_bool_keys_nested_layout(spark):
    # non-string pivot keys name columns exactly as Spark's cast does
    # ("true"/"false", not Python str(True)="True") — the nested layout
    # must find and struct them instead of silently dropping every
    # pivot column
    from dataframe_kotlin_spark import KDataFrame
    from pyspark.sql import types as T

    df = KDataFrame(
        spark.createDataFrame(
            [("g", True, 1, 2.0), ("g", False, 3, 4.0), ("h", True, 5, 6.0)],
            "k string, flag boolean, a int, w double",
        )
    )
    res = df.group_by("k").pivot("flag").aggregate(
        F.max("a").alias("a"), F.max("w").alias("w"), nested=True
    )
    assert sorted(res.columns) == ["false", "k", "true"]
    for c in ("true", "false"):
        f = res.df.schema[c]
        assert isinstance(f.dataType, T.StructType)
        assert f.dataType.names == ["a", "w"]
    got = {r["k"]: r for r in res.collect()}
    assert got["g"]["true"]["a"] == 1 and got["g"]["false"]["a"] == 3
    assert got["h"]["false"] is None or got["h"]["false"]["a"] is None


def test_pivot_explicit_numeric_values_spark_rendered(spark):
    # ADVICE r5 (medium): explicit pivot values on a DOUBLE column must
    # render their names via Spark's cast — Python str(1) is "1" but the
    # stringified key column holds "1.0", so a str()-derived name would
    # silently match nothing and fill with the default
    from dataframe_kotlin_spark import KDataFrame

    df = KDataFrame(
        spark.createDataFrame(
            [("a", 1.0, 5), ("a", 2.0, 7), ("b", 1.0, 11)],
            "k string, ratio double, v int",
        )
    )
    out = df.group_by("k").pivot("ratio", [1, 2]).sum("v", default=0)
    assert set(out.columns) == {"k", "1.0", "2.0"}
    d = {r["k"]: r for r in out.collect()}
    assert d["a"]["1.0"] == 5 and d["a"]["2.0"] == 7
    assert d["b"]["1.0"] == 11 and d["b"]["2.0"] == 0

    # booleans keep Spark's lowercase naming through the same path
    bdf = KDataFrame(
        spark.createDataFrame([("a", True, 1), ("a", False, 2)], "k string, f boolean, v int")
    )
    bout = bdf.group_by("k").pivot("f", [True, False]).sum("v", default=0)
    assert set(bout.columns) == {"k", "true", "false"}
    br = bout.collect()[0]
    assert br["true"] == 1 and br["false"] == 2


def test_pivot_explicit_multi_tuple_values_escaped(spark):
    # ADVICE r5 (low): explicit multi-pivot values as tuples go through
    # the same separator escaping as discovery, so a part containing "_"
    # matches its escaped key; a pre-joined plain string still matches
    # verbatim for separator-free parts
    from dataframe_kotlin_spark import KDataFrame

    df = KDataFrame(
        spark.createDataFrame(
            [("g", "a_b", "c", 1), ("g", "a", "b_c", 10), ("g", "p", "q", 100)],
            "k string, p1 string, p2 string, v int",
        )
    )
    out = df.group_by("k").pivot(
        ["p1", "p2"], [("a_b", "c"), ("a", "b_c"), "p_q"]
    ).sum("v", default=0)
    assert set(out.columns) == {"k", "a\\_b_c", "a_b\\_c", "p_q"}
    row = out.collect()[0]
    assert row["a\\_b_c"] == 1 and row["a_b\\_c"] == 10 and row["p_q"] == 100

    import pytest as _pytest

    with _pytest.raises(ValueError, match="2-tuples"):
        df.group_by("k").pivot(["p1", "p2"], [("only_one",)]).sum("v")
