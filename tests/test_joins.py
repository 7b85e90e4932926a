"""Join flavors on person ⋈ person2 — mirrors the reference JoinTests
(src/test/kotlin/org/jetbrains/dataframe/person/JoinTests.kt)."""

from pyspark.sql import functions as F


def test_inner_join_default_keys_and_collision_suffix(person, person2):
    # default keys = name intersection {name, age}? person2.age is string →
    # join on explicit name; age collides → age_1 (JoinTests.kt:46)
    out = person.inner_join(person2, on=["name"])
    assert "age_1" in out.columns  # right-side collision renamed
    # reference: 7 left rows x matching grades
    assert out.nrow() == 16


def test_left_join(person, person2):
    out = person.left_join(person2.filter(F.col("grade") >= 4), on=["name"])
    # every left row appears; Mark has no grade>=4 → null-padded
    assert out.nrow() >= 7
    mark = [r for r in out.collect() if r["name"] == "Mark"]
    assert all(r["grade"] is None for r in mark)


def test_right_join(person, person2):
    out = person.right_join(person2, on=["name"])
    assert out.nrow() == 16  # all right rows match


def test_outer_join(spark, person, person2):
    from dataframe_kotlin_spark import KDataFrame

    extra = KDataFrame(
        spark.createDataFrame([("Zoe", "Oslo", 9, "young")], person2.schema)
    )
    out = person.outer_join(person2.union(extra), on=["name"])
    names = {r["name"] for r in out.collect()}
    assert "Zoe" in names


def test_filter_join_semi(person, person2):
    out = person.filter_join(person2.filter(F.col("grade") == 1), on=["name"])
    # semi: right columns dropped, only Mark rows remain
    assert set(out.columns) == set(person.columns)
    assert {r["name"] for r in out.collect()} == {"Mark"}
    assert out.nrow() == 3


def test_exclude_join_anti(person, person2):
    out = person.exclude_join(person2.filter(F.col("grade") == 1), on=["name"])
    assert set(out.columns) == set(person.columns)
    assert {r["name"] for r in out.collect()} == {"Alice", "Bob"}
    # cross-check vs filterJoin complement (reference JoinTests.kt:101-117)
    semi = person.filter_join(person2.filter(F.col("grade") == 1), on=["name"])
    assert out.nrow() + semi.nrow() == person.nrow()


def test_null_safe_join_keys(spark):
    """Reference hash join matches null keys to null keys
    (api/join.kt:149-152); SQL `=` does not. null_safe=True restores it."""
    from dataframe_kotlin_spark import KDataFrame

    a = KDataFrame(spark.createDataFrame([("x", 1), (None, 2)], "k string, va int"))
    b = KDataFrame(spark.createDataFrame([("x", 10), (None, 20)], "k string, vb int"))
    plain = a.inner_join(b, on=["k"])
    assert plain.nrow() == 1  # null keys don't match under `=`
    safe = a.inner_join(b, on=["k"], null_safe=True)
    assert safe.nrow() == 2
    got = {(r["va"], r["vb"]) for r in safe.collect()}
    assert (2, 20) in got


def test_broadcast_right_plan(person, person2):
    out = person.inner_join(person2, on=["name"], broadcast_right=True)
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_default_key_intersection(spark):
    from dataframe_kotlin_spark import KDataFrame

    a = KDataFrame(spark.createDataFrame([(1, "x")], "id int, a string"))
    b = KDataFrame(spark.createDataFrame([(1, "y")], "id int, b string"))
    out = a.join(b)  # on inferred: id
    assert out.nrow() == 1
    assert set(out.columns) == {"id", "a", "b"}


def test_join_on_struct_column_key(spark):
    # DataFrameTreeTests: ColumnGroup join keys — struct equality is
    # field-wise in Spark, so a group key needs no expansion
    from dataframe_kotlin_spark import KDataFrame

    l = KDataFrame(
        spark.createDataFrame(
            [((1, "x"), 10), ((2, "y"), 20)], "g struct<a:int,b:string>, v int"
        )
    )
    r = KDataFrame(
        spark.createDataFrame(
            [((1, "x"), "one"), ((3, "z"), "three")], "g struct<a:int,b:string>, s string"
        )
    )
    out = l.join(r, on=["g"]).collect()
    assert len(out) == 1
    assert out[0]["v"] == 10 and out[0]["s"] == "one"


def test_join_on_nested_leaf_path(spark):
    from dataframe_kotlin_spark import KDataFrame
    from pyspark.sql import functions as F

    l = KDataFrame(
        spark.createDataFrame(
            [((1, "x"), 10), ((2, "y"), 20)], "g struct<a:int,b:string>, v int"
        )
    ).df.alias("l")
    r = spark.createDataFrame(
        [(1, "one"), (2, "two")], "a int, s string"
    ).alias("r")
    out = l.join(r, F.col("l.g.a") == F.col("r.a")).select("v", "s").collect()
    assert {(x["v"], x["s"]) for x in out} == {(10, "one"), (20, "two")}
