"""Positional slicing, row lookups, column-tree ops, transpose, zip,
parse — the SURVEY §2.2/§2.8/§2.9 surface added after the core engine.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataframe_kotlin_spark import KDataFrame


@pytest.fixture(scope="module")
def kdf(person):
    return person


ORDER = ["name", "age"]


def test_head_tail_rows(kdf):
    names = [r["name"] for r in kdf.sort_by("name", "age").collect()]
    head = [r["name"] for r in kdf.head_rows(3, ORDER).sort_by("name", "age").collect()]
    tail = [r["name"] for r in kdf.tail_rows(2, ORDER).sort_by("name", "age").collect()]
    assert head == names[:3]
    assert sorted(tail) == sorted(names[-2:])


def test_drop_first_skip_last(kdf):
    n = kdf.nrow()
    assert kdf.drop_first(2, ORDER).nrow() == n - 2
    out = kdf.skip_last(2, ORDER)
    assert out.nrow() == n - 2
    kept = [r["name"] for r in out.sort_by("name", "age").collect()]
    full = [r["name"] for r in kdf.sort_by("name", "age").collect()]
    assert kept == full[:-2]


def test_rows_at_slice(kdf):
    full = kdf.sort_by("name", "age").collect()
    at = kdf.rows_at([0, 2], ORDER).sort_by("name", "age").collect()
    assert [r["name"] for r in at] == [full[0]["name"], full[2]["name"]]
    sl = kdf.slice_rows(1, 4, ORDER).sort_by("name", "age").collect()
    assert [r["name"] for r in sl] == [r["name"] for r in full[1:4]]


def test_row_lookups_quantifiers(kdf):
    assert kdf.first_row(F.col("city") == "Dubai")["name"] == "Bob"
    assert kdf.first_row(F.col("city") == "Atlantis") is None
    with pytest.raises(ValueError):
        kdf.single_row(F.col("name") == "Alice")  # two Alices in fixture
    assert kdf.any_rows(F.col("age") > 40)
    assert not kdf.any_rows(F.col("age") > 400)
    assert kdf.all_rows(F.col("age") > 0)
    assert not kdf.all_rows(F.col("age") > 20)
    assert kdf.count_rows(F.col("age") > 20) == kdf.df.filter("age > 20").count()


def test_duplicate_row(kdf):
    out = kdf.duplicate_row(F.col("name") == "Bob", 3)
    rows = out.collect()
    assert len(rows) == 3 and all(r["name"] == "Bob" for r in rows)


def test_column_tree_ops(kdf):
    cols = kdf.columns
    moved = kdf.move_after(cols[0], cols[-1])
    assert moved.columns[-1] == cols[0]
    ins = kdf.insert_col("age2", F.col("age") * 2, at=1)
    assert ins.columns[1] == "age2"
    assert ins.first_row(F.col("name") == "Bob")["age2"] == 2 * kdf.first_row(
        F.col("name") == "Bob"
    )["age"]
    rep = kdf.replace_col("age", F.col("age") + 100)
    assert rep.columns == kdf.columns  # position kept
    assert rep.first_row(F.col("name") == "Bob")["age"] > 100


def test_count_by(kdf):
    out = {r["city"]: r["n"] for r in kdf.count_by("city").collect()}
    assert out == {
        r["city"]: r["n"]
        for r in kdf.df.groupBy("city").agg(F.count("*").alias("n")).collect()
    }


def test_transpose_row(kdf):
    out = kdf.transpose_row(order_by=ORDER).collect()
    assert [r["name"] for r in out] == kdf.columns
    first = kdf.sort_by(*ORDER).collect()[0]
    vals = {r["name"]: r["value"] for r in out}
    assert vals["name"] == first["name"]
    assert vals["age"] == str(first["age"])


def test_zip_frames(spark):
    a = KDataFrame(spark.createDataFrame([(1, "a"), (2, "b")], "id int, x string"))
    b = KDataFrame(spark.createDataFrame([(10, "A"), (20, "B")], "id2 int, y string"))
    out = a.zip_frames(b, ["id"], ["id2"]).sort_by("id").collect()
    assert [(r["id"], r["id2"]) for r in out] == [(1, 10), (2, 20)]
    assert [(r["x"], r["y"]) for r in out] == [("a", "A"), ("b", "B")]


def test_parse_cascade(spark):
    df = spark.createDataFrame(
        [("1", "1.5", "true", "2020-01-02", "x")],
        "i string, d string, b string, dt string, s string",
    )
    out = KDataFrame(df).parse()
    types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert types["i"] in ("int", "bigint")
    assert types["d"] == "double"
    assert types["b"] == "boolean"
    assert types["s"] == "string"


def test_guess_type_single_column(spark):
    df = spark.createDataFrame([("1", "2")], "a string, b string")
    out = KDataFrame(df).guess_type("a")
    types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert types["a"] in ("int", "bigint")
    assert types["b"] == "string"  # untouched


def test_gather_clauses(spark):
    df = KDataFrame(
        spark.createDataFrame(
            [(1, 10, 20, None), (2, 5, None, 30)],
            "id int, m_a int, m_b int, m_c int",
        )
    )
    out = df.gather(
        ["m_a", "m_b", "m_c"],
        key_name="metric",
        value_name="v",
        where=F.col("v") > 5,
        map_values=lambda c: c * 10,
        map_names=lambda c: F.regexp_replace(c, "^m_", ""),
    ).sort_by("id", "metric").collect()
    assert [(r["id"], r["metric"], r["v"]) for r in out] == [
        (1, "a", 100),
        (1, "b", 200),
        (2, "c", 300),
    ]


def test_gather_presence(spark):
    df = KDataFrame(
        spark.createDataFrame(
            [(1, True, False), (2, True, True)], "id int, f1 boolean, f2 boolean"
        )
    )
    out = df.gather_presence(["f1", "f2"]).sort_by("id", "key").collect()
    assert [(r["id"], r["key"]) for r in out] == [(1, "f1"), (2, "f1"), (2, "f2")]


def test_split_col_name_generator(spark):
    df = KDataFrame(spark.createDataFrame([("a-b-c",), ("x-y",)], "s string"))
    out = df.split_col("s", "-")
    assert out.columns == ["s_1", "s_2", "s_3"]
    rows = out.sort_by("s_1").collect()
    assert (rows[0]["s_1"], rows[0]["s_2"], rows[0]["s_3"]) == ("a", "b", "c")
    assert (rows[1]["s_1"], rows[1]["s_2"], rows[1]["s_3"]) == ("x", "y", None)


def test_update_at_and_not_null(kdf):
    out = kdf.update_at("age", [0, 1], F.lit(99), order_by=ORDER)
    ages = [r["age"] for r in out.sort_by(*ORDER).collect()]
    assert ages[:2] == [99, 99] and 99 not in ages[2:]
    out2 = kdf.update_not_null("city", F.upper(F.col("city")))
    cities = {r["city"] for r in out2.collect()}
    assert None in cities and all(c is None or c.isupper() for c in cities)


def test_convert_epoch_millis(spark):
    df = KDataFrame(spark.createDataFrame([(0,), (86_400_000,)], "t long"))
    out = df.convert_epoch_millis("t", to="date").collect()
    assert sorted(str(r["t"]) for r in out) == ["1970-01-01", "1970-01-02"]


def test_merge_upsert(spark):
    base = KDataFrame(
        spark.createDataFrame([(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, s string, v int")
    )
    updates = KDataFrame(
        spark.createDataFrame([(2, "B", None), (4, "d", 40)], "k int, s string, v int")
    )
    out = {r["k"]: (r["s"], r["v"]) for r in base.merge_upsert(updates, ["k"]).collect()}
    # update row wins wholesale (including its explicit null), new key inserts
    assert out == {1: ("a", 10), 2: ("B", None), 3: ("c", 30), 4: ("d", 40)}


def test_split_col_inward_nests(spark):
    df = KDataFrame(spark.createDataFrame([("a-b", 1), ("c-d", 2)], "s string, n int"))
    out = df.split_col("s", "-", into=["l", "r"], inward=True)
    assert dict(out.df.dtypes)["s"].startswith("struct")
    rows = {r["n"]: (r["s"]["l"], r["s"]["r"]) for r in out.collect()}
    assert rows == {1: ("a", "b"), 2: ("c", "d")}


def test_neighbours_relative_rows(spark):
    df = KDataFrame(spark.createDataFrame([(i, i * 10) for i in range(1, 5)], "i int, v int"))
    out = df.neighbours("v", [-1, 0, 1], order_by=["i"]).collect()
    d = {r["i"]: r["v_neighbours"] for r in out}
    assert d[1] == [None, 10, 20]
    assert d[2] == [10, 20, 30]
    assert d[4] == [30, 40, None]


def test_add_scan_running_ops(spark):
    df = KDataFrame(
        spark.createDataFrame(
            [(1, 2.0, "a"), (2, -3.0, None), (3, 0.0, "c"), (4, 4.0, None)],
            "i int, x double, s string",
        )
    )
    out = (
        df.add_scan("rsum", "x", "sum", order_by=["i"])
        .add_scan("rprod", "x", "product", order_by=["i"])
        .add_scan("carry", "s", "last_non_null", order_by=["i"])
        .add_scan("cat", F.coalesce(F.col("s"), F.lit("_")), "concat", order_by=["i"])
    )
    d = {r["i"]: r for r in out.collect()}
    assert [d[i]["rsum"] for i in range(1, 5)] == [2.0, -1.0, -1.0, 3.0]
    assert [round(d[i]["rprod"], 9) for i in range(1, 5)] == [2.0, -6.0, 0.0, 0.0]
    assert [d[i]["carry"] for i in range(1, 5)] == ["a", "a", "c", "c"]
    assert d[4]["cat"] == "a_c_"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        df.add_scan("bad", "x", "fibonacci", order_by=["i"])


def test_parse_custom_datetime_format(spark):
    # reference ParserTests `parse datetime with custom format`:
    # unregistered format stays string; after addDateTimeFormat it parses
    from dataframe_kotlin_spark.sources.csv import (
        add_datetime_format,
        clear_datetime_formats,
    )

    df = spark.createDataFrame([("04.02.2021 19:44:32",)], "col string")
    try:
        out = KDataFrame(df).try_parse()
        assert dict(out.df.dtypes)["col"] == "string"
        add_datetime_format("dd.MM.yyyy HH:mm:ss")
        out2 = KDataFrame(df).parse()
        assert dict(out2.df.dtypes)["col"].startswith("timestamp")
        assert out2.collect()[0]["col"].year == 2021
    finally:
        clear_datetime_formats()


def test_parse_strict_raises_on_unparseable(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("a",), ("b",)], "col string")
    with _pytest.raises(ValueError):
        KDataFrame(df).parse(strict=True)
    # tryParse: unchanged
    out = KDataFrame(df).try_parse()
    assert dict(out.df.dtypes)["col"] == "string"


def test_update_nested_struct_field(spark):
    # DataFrameTreeTests: update a nested leaf in place, tree shape kept
    df = KDataFrame(
        spark.createDataFrame(
            [((1, "x"), "r1"), ((2, "y"), "r2")], "g struct<a:int,b:string>, id string"
        )
    )
    out = df.update("g.a", where=F.col("g.a") > 1, with_expr=F.lit(99))
    assert dict(out.df.dtypes)["g"] == "struct<a:int,b:string>"
    got = {r["id"]: r["g"]["a"] for r in out.collect()}
    assert got == {"r1": 1, "r2": 99}
    # two-level nesting
    df2 = KDataFrame(
        spark.createDataFrame([(((5,),),)], "o struct<i:struct<v:int>>")
    )
    out2 = df2.update("o.i.v", with_expr=F.col("o.i.v") * 2)
    assert out2.collect()[0]["o"]["i"]["v"] == 10


def test_rename_nested_field(spark):
    df = KDataFrame(
        spark.createDataFrame([((1, "x"), 9)], "g struct<a:int,b:string>, v int")
    )
    out = df.rename({"g.a": "alpha", "v": "value"})
    assert dict(out.df.dtypes)["g"] == "struct<alpha:int,b:string>"
    assert out.columns == ["g", "value"]
    assert out.collect()[0]["g"]["alpha"] == 1


def test_ndistinct(person):
    # DataFrameTests `nunique`: typed.name.ndistinct() shouldBe 3
    assert person.ndistinct("name") == 3
