"""Ports of reference MoveTests.kt:1-87 plus the rest of the move
surface (api/move.kt:13-139): into / under / toTop / to(i) / toLeft /
toRight / after. All moves are pure projections — the last test pins
zero exchanges in the physical plan."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataframe_kotlin_spark import KDataFrame


def _names(kdf):
    return kdf.df.columns


def _fields(kdf, path):
    dt = dict(kdf.df.dtypes)
    f = kdf.df.schema
    node = f
    for seg in path.split("."):
        node = node[seg].dataType
    assert isinstance(node, T.StructType)
    return [x.name for x in node.fields]


@pytest.fixture(scope="module")
def movedf(spark):
    # MoveTests.kt:11-13: flat columns whose NAMES contain dots
    names = ["q", "a.b", "b.c", "w", "a.c.d", "e.f", "b.d", "r"]
    row = tuple(range(len(names)))
    df = spark.createDataFrame([row], ", ".join(f"`{n}` int" for n in names))
    return KDataFrame(df)


@pytest.fixture(scope="module")
def grouped(movedf):
    # MoveTests.kt:14: move dotted names into nested groups
    dotted = [c for c in movedf.df.columns if "." in c]
    return movedf.move(*dotted).into(lambda p: ".".join(p).split("."))


def test_batch_grouping(grouped):
    # MoveTests.kt:17-23: new groups pin to their first member's slot
    assert _names(grouped) == ["q", "a", "b", "w", "e", "r"]
    assert _fields(grouped, "a") == ["b", "c"]
    assert _fields(grouped, "a.c") == ["d"]
    assert _fields(grouped, "b") == ["c", "d"]
    assert _fields(grouped, "e") == ["f"]


def test_batch_ungrouping(grouped):
    # MoveTests.kt:38-43: every nested leaf back to a dotted flat name
    leaves = []

    def walk(prefix, dtype):
        for f in dtype.fields:
            p = f"{prefix}.{f.name}" if prefix else f.name
            if isinstance(f.dataType, T.StructType):
                walk(p, f.dataType)
            else:
                leaves.append(p)

    walk("", grouped.df.schema)
    nested = [p for p in leaves if "." in p]
    ungrouped = grouped.move(*nested).into(lambda p: [".".join(p)])
    assert _names(ungrouped) == ["q", "a.b", "a.c.d", "b.c", "b.d", "w", "e.f", "r"]


def test_move_under_new_and_existing_group(spark):
    df = KDataFrame(
        spark.createDataFrame([(1, "x", 2.0, True)], "k int, s string, v double, f boolean")
    )
    out = df.move("s", "v").under("payload")
    assert _names(out) == ["k", "payload", "f"]
    assert _fields(out, "payload") == ["s", "v"]
    # moving another column under the EXISTING group appends at its end
    out2 = out.move("f").under("payload")
    assert _names(out2) == ["k", "payload"]
    assert _fields(out2, "payload") == ["s", "v", "f"]
    row = out2.df.collect()[0]
    assert row["payload"]["s"] == "x" and row["payload"]["f"] is True


def test_move_to_top(grouped):
    # pull a nested leaf to top level, with and without a rename fn
    out = grouped.move("a.c.d").to_top()
    assert "d" in _names(out)
    assert _fields(out, "a") == ["b"]  # c pruned when emptied
    out2 = grouped.move("a.c.d").to_top(lambda p: "_".join(p))
    assert "a_c_d" in _names(out2)
    assert out2.df.collect()[0]["a_c_d"] == 4


def test_move_to_index_left_right(spark):
    df = KDataFrame(spark.createDataFrame([(1, 2, 3, 4)], "a int, b int, c int, d int"))
    assert _names(df.move("c").to(0)) == ["c", "a", "b", "d"]
    assert _names(df.move("a", "d").to(1)) == ["b", "a", "d", "c"]
    assert _names(df.move("c").to_left()) == ["c", "a", "b", "d"]
    assert _names(df.move("a").to_right()) == ["b", "c", "d", "a"]
    # values ride along
    assert df.move("c").to(0).df.collect()[0][0] == 3


def test_move_after(spark):
    df = KDataFrame(spark.createDataFrame([(1, 2, 3, 4)], "a int, b int, c int, d int"))
    assert _names(df.move("a").after("c")) == ["b", "c", "a", "d"]
    assert _names(df.move("d", "a").after("b")) == ["b", "d", "a", "c"]


def test_move_after_inside_group(spark):
    df = KDataFrame(
        spark.createDataFrame([(1, 2, 3)], "x int, y int, z int")
    ).move("y", "z").under("g")
    out = df.move("x").after("g.y")
    assert _names(out) == ["g"]
    assert _fields(out, "g") == ["y", "x", "z"]
    assert out.df.collect()[0]["g"]["x"] == 1


def test_move_from_nested_to_nested(spark):
    df = KDataFrame(spark.createDataFrame([(1, 2, 3)], "k int, u int, v int"))
    g = df.move("u", "v").under("src")
    out = g.move("src.v").into(["dst", "v2"])
    assert _names(out) == ["k", "src", "dst"]
    assert _fields(out, "src") == ["u"]
    assert _fields(out, "dst") == ["v2"]
    assert out.df.collect()[0]["dst"]["v2"] == 3


def test_move_into_indexed(spark):
    df = KDataFrame(spark.createDataFrame([(1, 2, 3)], "a int, b int, c int"))
    out = df.move("b", "c").into_indexed(lambda p, i: [f"g{i}", p[-1]])
    assert _names(out) == ["a", "g0", "g1"]
    assert _fields(out, "g0") == ["b"] and _fields(out, "g1") == ["c"]


def test_move_missing_column_raises(spark):
    df = KDataFrame(spark.createDataFrame([(1,)], "a int"))
    with pytest.raises(KeyError):
        df.move("nope").to_left()


def test_move_is_projection_only(spark, movedf):
    dotted = [c for c in movedf.df.columns if "." in c]
    out = movedf.move(*dotted).into(lambda p: ".".join(p).split("."))
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
