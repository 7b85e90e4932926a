"""Core KDataFrame ops on the person fixture — mirrors the reference's
DataFrameTests (exact shape + value assertions)."""

import math

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests.conftest import rows


def test_select_and_ncol(person):
    out = person.select("name", "age")
    assert out.columns == ["name", "age"]
    assert out.nrow() == 7


def test_filter(person):
    out = person.filter(F.col("age") > 25)
    assert out.nrow() == 4


def test_drop_rows_keeps_null_predicate_rows(person):
    # city == 'Moscow' is null for Alice(20, city=null): drop must keep her
    out = person.drop_rows(F.col("city") == "Moscow")
    assert out.nrow() == 5
    assert ("Alice", 20) in {(r["name"], r["age"]) for r in out.collect()}


def test_drop_nulls_any_all(person):
    assert person.drop_nulls(["city", "weight"]).nrow() == 4
    assert person.drop_nulls(["city", "weight"], where_all_null=True).nrow() == 7
    assert person.drop_nulls(["weight"]).nrow() == 5


def test_drop_na_handles_nan(animals):
    out = animals.drop_na(["age"])
    assert out.nrow() == 8  # 10 rows - 2 NaN


def test_distinct_and_distinct_by(person):
    assert person.distinct(["name"]).nrow() == 3
    # keep-first by insertion order (row order = age asc here for Mark: 20)
    first = person.distinct_by(["name"], order_by=["age"])
    got = {(r["name"], r["age"]) for r in first.collect()}
    assert got == {("Alice", 15), ("Bob", 30), ("Mark", 20)}
    # distinctByExpr (api/distinctBy.kt:20-26): computed key expression,
    # no pre-aliased column — here "first letter of name"
    by_initial = person.distinct_by([F.substring("name", 1, 1)], order_by=["age", "name"])
    names = sorted(r["name"] for r in by_initial.collect())
    assert names == ["Alice", "Bob", "Mark"]


def test_take_ordered(person):
    out = person.take_ordered(2, [F.col("age").desc()])
    assert [r["age"] for r in out.collect()] == [45, 40]


def test_add_update_fill(person):
    out = (
        person.add("age2", F.col("age") * 2)
        .update("city", where=F.col("city") == "Moscow", with_expr=F.lit("RU"))
        .fill_nulls("weight", F.lit(0))
    )
    data = {(r["name"], r["age"]): r for r in out.collect()}
    assert data[("Mark", 20)]["city"] == "RU"
    assert data[("Mark", 20)]["weight"] == 0
    assert data[("Alice", 15)]["age2"] == 30


def test_convert_cast(person):
    out = person.convert("age", "double")
    assert dict(out.df.dtypes)["age"] == "double"


def test_sort_by_nulls_first_default(person):
    # reference default: asc, nulls first (api/sort.kt:57-83)
    out = person.sort_by("weight").collect()
    assert out[0]["weight"] is None and out[1]["weight"] is None
    assert [r["weight"] for r in out[2:]] == [54, 55, 68, 87, 90]


def test_sort_by_desc_nulls_last(person):
    out = person.sort_by_desc("weight").collect()
    assert [r["weight"] for r in out[:5]] == [90, 87, 68, 55, 54]
    assert out[5]["weight"] is None


def test_union_widening(spark):
    from dataframe_kotlin_spark import KDataFrame

    a = KDataFrame(spark.createDataFrame([("x", 1)], "name string, age int"))
    b = KDataFrame(spark.createDataFrame([("y", 2.5)], "name string, weight double"))
    out = a.union(b)
    assert set(out.columns) == {"name", "age", "weight"}
    assert out.nrow() == 2
    got = {tuple(r) for r in out.collect()}
    assert ("x", 1, None) in got and ("y", None, 2.5) in got


def test_union_type_widening_int_double(spark):
    from dataframe_kotlin_spark import KDataFrame

    a = KDataFrame(spark.createDataFrame([(1,)], "v int"))
    b = KDataFrame(spark.createDataFrame([(2.5,)], "v double"))
    out = a.union(b)
    assert dict(out.df.dtypes)["v"] == "double"
    assert sorted(r["v"] for r in out.collect()) == [1.0, 2.5]


def test_group_ungroup_flatten(person):
    nested = person.group_cols(["city", "weight"], into="info")
    assert set(nested.columns) == {"name", "age", "info"}
    assert isinstance(nested.schema["info"].dataType, T.StructType)
    back = nested.ungroup_col("info")
    assert set(back.columns) == {"name", "age", "city", "weight"}
    flat = nested.flatten()
    assert set(flat.columns) == {"name", "age", "info_city", "info_weight"}


def test_remove_and_rename(person):
    out = person.remove("weight").rename({"city": "location"})
    assert out.columns == ["name", "age", "location"]


def test_merge_cols_and_split(person):
    merged = person.merge_cols(["name", "city"], into="tag", sep="-")
    tags = {r["tag"] for r in merged.collect()}
    assert "Alice-London" in tags
    split_back = merged.split_col("tag", "-", into=["n", "c"])
    got = {(r["n"], r["c"]) for r in split_back.collect()}
    assert ("Alice", "London") in got


def test_describe(person):
    d = {r["column"]: r for r in person.describe().collect()}
    assert d["weight"]["nulls"] == 2
    assert d["name"]["unique"] == 3
    assert d["age"]["mean"] == 200 / 7
    # top/freq (api/describe.kt:40-45): Mark appears 3x of 7
    assert d["name"]["top"] == "Mark" and d["name"]["freq"] == 3


def test_corr_matrix(person):
    m = {r["column"]: r for r in person.corr_matrix().collect()}
    assert math.isclose(m["age"]["age"], 1.0)
    assert "weight" in m


def test_with_row_id(person):
    out = person.with_row_id("rid", order_by=["age", "name"])
    ids = [r["rid"] for r in out.df.orderBy("rid").collect()]
    assert ids == list(range(7))


def test_chunked(person):
    out = person.chunked(3, order_by=["age", "name"])
    counts = {r["chunk"]: r["n"] for r in out.df.groupBy("chunk").agg(F.count("*").alias("n")).collect()}
    assert counts == {0: 3, 1: 3, 2: 1}


def test_intersect_except(person):
    a = person.select("name")
    b = person.filter(F.col("age") > 25).select("name")
    assert {r["name"] for r in a.intersect_rows(b).collect()} == {"Bob", "Mark"}
    # exceptAll keeps multiplicity: Alice x2 minus 0 = 2
    out = a.except_rows(b).collect()
    assert sorted(r["name"] for r in out) == ["Alice", "Alice", "Mark"]


def test_is_empty(person):
    assert not person.is_empty()
    assert person.filter(F.lit(False)).is_empty()


def test_register_tables_sql_equals_dataframe(spark):
    from pyspark.sql import functions as F

    from dataframe_kotlin_spark.session import register_tables

    names = register_tables(spark, "/root/testdata/sf0.001")
    assert "lineitem" in names and "events" in names
    got = spark.sql(
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag"
    ).collect()
    exp = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))
    # events view carries the normalized timestamp type
    t = dict(spark.table("events").dtypes)["ts"]
    assert t.startswith("timestamp")


def test_recommended_conf_scales():
    from dataframe_kotlin_spark.session import recommended_conf

    small = recommended_conf(total_cores=32, dataset_bytes=10 << 30)
    big = recommended_conf(total_cores=16_000, dataset_bytes=100 << 40)
    assert int(small["spark.sql.shuffle.partitions"]) >= 80
    # 100 TB: partition count is size-bound, not core-bound, and capped
    bp = int(big["spark.sql.shuffle.partitions"])
    assert 40_000 <= bp <= 200_000
    assert big["spark.sql.adaptive.enabled"] == "true"
    # broadcast ceiling never exceeds 64 MB
    assert int(big["spark.sql.autoBroadcastJoinThreshold"]) <= 64 << 20
