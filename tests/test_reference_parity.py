"""Systematic port of reference person/DataFrameTests.kt over the SAME
7-row person fixture (conftest PERSON_ROWS == BaseTest.df). Each test
names its reference case; expected values are the reference's literals.

Positional cases (index updates, slicing, chunking, first/last) carry an
explicit __idx__ ordering column, since the engine has no implicit row
order (SURVEY §4.2-2)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataframe_kotlin_spark.core.frame import KDataFrame
from dataframe_kotlin_spark.core import columns as sel


def cities(kdf):
    return [r["city"] for r in kdf.df.collect()]


@pytest.fixture(scope="module")
def indexed(person):
    # insertion order as data (reference row index)
    rows = person.df.collect()
    spark = person.df.sparkSession
    # fresh StructType: StructType.add would MUTATE the shared fixture schema
    schema = T.StructType(
        list(person.df.schema.fields) + [T.StructField("__idx__", T.LongType())]
    )
    return KDataFrame(
        spark.createDataFrame([tuple(r) + (i,) for i, r in enumerate(rows)], schema)
    )


# --- update family ---


def test_update(person):
    # `update`: age doubled, schema unchanged
    res = person.update("age", with_expr=F.col("age") * 2)
    assert res.columns == person.columns
    assert sorted(r["age"] for r in res.df.collect()) == sorted(
        r["age"] * 2 for r in person.df.collect()
    )


def test_conditional_update(person):
    # `conditional update`: age>25 -> null
    res = person.update("age", where=F.col("age") > 25, with_expr=F.lit(None))
    got = [r["age"] for r in res.df.collect()]
    assert sorted(a for a in got if a is not None) == [15, 20, 20]
    assert got.count(None) == 4


def test_update_cells_by_index(indexed):
    # `update cells by index`: at(2, 4).with(100)
    res = indexed.update_at("age", [2, 4], F.lit(100), order_by=["__idx__"])
    got = {r["__idx__"]: r["age"] for r in res.df.collect()}
    assert got[2] == 100 and got[4] == 100
    assert got[0] == 15 and got[1] == 45


def test_update_cells_by_index_range(indexed):
    # `update cells by index range`: at(2..4).with(100)
    res = indexed.update_at("age", [2, 3, 4], F.lit(100), order_by=["__idx__"])
    got = {r["__idx__"]: r["age"] for r in res.df.collect()}
    assert [got[i] for i in range(7)] == [15, 45, 100, 100, 100, 20, 30]


def test_null_to_zero(person):
    # `null to zero`: weight nulls -> 0
    for res in (
        person.null_to_zero("weight"),
        person.fill_nulls("weight", F.lit(0)),
    ):
        assert sorted(r["weight"] for r in res.df.collect()) == [0, 0, 54, 55, 68, 87, 90]


def test_reset_to_null(person):
    # `resetToNull`: update { all() }.withNull()
    res = person
    for c in person.columns:
        res = res.update(c, with_expr=F.lit(None).cast(person.df.schema[c].dataType))
    assert all(v is None for r in res.df.collect() for v in r)


def test_update_not_null(person):
    # update().notNull{}: only non-null cells rewritten
    res = person.update_not_null("weight", F.col("weight") + 1)
    assert sorted(r["weight"] for r in res.df.collect() if r["weight"] is not None) == [
        55, 56, 69, 88, 91,
    ]
    assert sum(1 for r in res.df.collect() if r["weight"] is None) == 2


# --- sorting ---


def test_sort(person):
    # `sort`: name asc + age desc -> city column order
    res = person.sort_by("name", F.col("age").desc())
    assert cities(res) == [None, "London", "Dubai", "Tokyo", "Milan", "Moscow", "Moscow"]


def test_sort_nulls_first(person):
    # `sort nulls first`: plain city key -> null leads
    assert cities(person.sort_by("city"))[0] is None


def test_sort_nulls_last(person):
    # `sort nulls last`: city.nullsLast
    got = cities(person.sort_by(F.col("city").asc_nulls_last()))
    assert got[-1] is None
    assert got[:-1] == sorted(got[:-1])


def test_sort_desc(person):
    # sortByDesc: all keys desc
    ages = [r["age"] for r in person.sort_by_desc("age").df.collect()]
    assert ages == sorted(ages, reverse=True)


# --- filter / dropNulls ---


def test_filter(person):
    # `filter`: age>20 && weight != null -> [Bob, Bob, Mark]
    res = person.filter((F.col("age") > 20) & F.col("weight").isNotNull())
    assert sorted(r["name"] for r in res.df.collect()) == ["Bob", "Bob", "Mark"]


def test_drop_nulls_one(person):
    # `drop nulls 1`
    res = person.drop_nulls(["weight"])
    assert all(r["weight"] is not None for r in res.df.collect())
    assert res.nrow() == 5


def test_drop_where_all_null(person):
    # `drop where all null`: null weight where Alice, then
    # dropNulls(weight, city, whereAllNull) drops only the row with BOTH null
    filtered = person.update("weight", where=F.col("name") == "Alice", with_expr=F.lit(None))
    assert filtered.drop_nulls(["weight", "city"], where_all_null=True).nrow() == 6


def test_drop_where_any_null(person):
    # `drop where any null`
    filtered = person.update("weight", where=F.col("name") == "Alice", with_expr=F.lit(None))
    expected = filtered.count_rows(F.col("weight").isNotNull() & F.col("city").isNotNull())
    assert filtered.drop_nulls(["weight", "city"]).nrow() == expected == 3


# --- select / move ---


def test_select_one_and_two(person):
    assert person.select("age").columns == ["age"]
    assert person.select("age", "city").columns == ["age", "city"]


def test_select_if_name_length(person):
    # `select if`: cols { name.length == 4 } -> [name, city]
    res = person.select_cols(lambda s: sel.cols(s, pred=lambda f: len(f.name) == 4))
    assert res.columns == ["name", "city"]


def test_select_by_type(person):
    # `select by type`: colsOf<String?> -> [name, city]
    res = person.select_cols(lambda s: sel.cols_of(s, T.StringType))
    assert res.columns == ["name", "city"]


def test_select_with_rename(person):
    # `select with rename 2`
    res = person.select(F.col("name").alias("Name"))
    assert res.columns == ["Name"]


def test_move_one_column(person):
    # `move one column`: moveTo(1) { city }
    assert person.move("city").to(1).columns == ["name", "city", "age", "weight"]


def test_move_several_columns(person):
    # `move several columns`: moveTo(2) { name and city }
    assert person.move("name", "city").to(2).columns == ["age", "weight", "name", "city"]


def test_move_to_left_right(person):
    # `move several columns to left` / `to right`
    assert person.move("weight", "age").to_left().columns == ["weight", "age", "name", "city"]
    assert person.move("weight", "name").to_right().columns == ["age", "city", "weight", "name"]


# --- positional / slicing ---


def test_slicing(indexed):
    # `slicing`: typed[1..2]
    res = indexed.slice_rows(1, 3, order_by=["__idx__"])
    assert res.nrow() == 2
    assert sorted(r["__idx__"] for r in res.df.collect()) == [1, 2]


def test_select_several_rows(indexed):
    # `select several rows`: df[2, 4]
    res = indexed.rows_at([2, 4], order_by=["__idx__"])
    assert sorted(r["age"] for r in res.df.collect()) == [20, 30]


def test_chunked(indexed):
    # `chunked`: 7 rows / 2 -> sizes [2,2,2,1]
    res = indexed.chunked(2, order_by=["__idx__"])
    sizes = sorted(
        r["n"] for r in res.df.groupBy("chunk").agg(F.count("*").alias("n")).collect()
    )
    assert sizes == [1, 2, 2, 2]


def test_first_last(indexed):
    # `first last`
    assert indexed.first_row()["name"] is not None
    first = indexed.sort_by("__idx__").first_row()
    assert (first["name"], first["age"]) == ("Alice", 15)


# --- distinct / counts / stats ---


def test_distinct_pair(person):
    # `distinct`: select(name, city).distinct() -> 6 unique pairs
    assert person.distinct(["name", "city"]).nrow() == 6


def test_distinct_by_first_per_key(indexed):
    # `distinct by`: first occurrence per name
    res = indexed.distinct_by(["name"], order_by=["__idx__"])
    got = {r["name"]: r["age"] for r in res.df.collect()}
    assert got == {"Alice": 15, "Bob": 45, "Mark": 20}


def test_count_pred(person):
    # DataFrameTests count usages: age > 25 matches 4 rows
    assert person.count_rows(F.col("age") > 25) == 4
    assert person.count_rows() == 7


def test_nrow_ncol_size(person):
    # `size`
    assert (person.ncol(), person.nrow()) == (4, 7)


def test_mean_age(person):
    # BasicMath mean of age = 200/7
    got = person.df.agg(F.avg("age")).collect()[0][0]
    assert abs(got - 200 / 7) < 1e-12


def test_equals_after_identity_update(person):
    # `equals`: update age with itself is a no-op
    res = person.update("age", with_expr=F.col("age"))
    assert sorted(map(tuple, res.df.collect())) == sorted(map(tuple, person.df.collect()))


# --- group get ---


def test_get_group_by_single_key(person):
    # groupBy { name }["Mark"] == filter { name == "Mark" }
    grouped = person.group_by("name")
    mark = grouped.get_group("Mark") if hasattr(grouped, "get_group") else person.filter(
        F.col("name") == "Mark"
    )
    assert mark.nrow() == 3


def test_union_with_self(person):
    # `merge similar dataframes`: df.union(df).union(df) -> 3x rows
    res = person.union(person).union(person)
    assert res.nrow() == 21
    assert res.columns == person.columns


# --- DataFrameTreeTests.kt: nested column-group semantics over the
# grouped person frame (name + info{age, city} + weight) ---


@pytest.fixture(scope="module")
def tree(person):
    return person.group_cols(["age", "city"], into="info")


def test_tree_group_cols(tree, person):
    # `group cols`: nested group created, leaves preserved
    assert tree.columns == ["name", "info", "weight"]
    assert tree.df.schema["info"].dataType.names == ["age", "city"]


def test_tree_select_nested_path(tree):
    # `select`: nested path projection
    res = tree.select("info.age")
    assert [f.name for f in res.df.schema.fields] == ["age"]
    assert sorted(r[0] for r in res.df.collect()) == [15, 20, 20, 30, 30, 40, 45]


def test_tree_filter_on_nested(tree):
    # `filter` through the group
    res = tree.filter(F.col("info.age") > 30)
    assert sorted(r["name"] for r in res.df.collect()) == ["Bob", "Mark"]


def test_tree_update_nested(tree):
    # `update`: rewrite a leaf inside the group
    res = tree.update("info.age", with_expr=F.col("info.age") + 1)
    assert res.df.schema["info"].dataType.names == ["age", "city"]
    assert sorted(r["info"]["age"] for r in res.df.collect()) == [16, 21, 21, 31, 31, 41, 46]


def test_tree_sort_by_nested(tree):
    # `sort`: order by a leaf under the group
    ages = [r["info"]["age"] for r in tree.sort_by("info.age").df.collect()]
    assert ages == sorted(ages)


def test_tree_distinct_at_column_group(tree):
    # `distinct at column group`: distinct over the struct column
    assert tree.select("info").distinct().nrow() == 7  # all (age, city) unique
    two = tree.select("name").distinct()
    assert two.nrow() == 3


def test_tree_ungroup_roundtrip(tree, person):
    # `column ungroup`: splice leaves back to the top level
    back = tree.ungroup_col("info")
    assert set(back.columns) == set(person.columns)
    assert sorted(map(tuple, back.select("name", "age", "city", "weight").df.collect())) == sorted(
        map(tuple, person.df.collect())
    )


def test_tree_flatten_prefixes(tree):
    # flatten with minimal-prefix dedup
    flat = tree.flatten()
    assert "name" in flat.columns and "weight" in flat.columns
    assert not any("." in c for c in flat.columns)


def test_tree_join_with_path(tree, spark):
    # `join with left path`: join keyed on a nested column
    ages = spark.createDataFrame([(15, "minor"), (45, "adult")], "age int, cls string")
    joined = tree.df.join(ages, tree.df["info.age"] == ages["age"], "inner")
    assert sorted(r["cls"] for r in joined.collect()) == ["adult", "minor"]


def test_tree_move_under(person):
    # `move and group`: move a top-level col under a group path
    res = person.group_cols(["age"], into="info").move("city").under("info")
    assert res.df.schema["info"].dataType.names == ["age", "city"]
    assert res.columns == ["name", "info", "weight"]


def test_sort_with_comparator(person):
    # `sortWith` (api/sort.kt:35-40): opaque comparator, driver-side by
    # contract — order by name length desc, then age asc
    def cmp(a, b):
        return (len(b["name"]) - len(a["name"])) or (a["age"] - b["age"])

    res = person.sort_with(cmp)
    got = [(r["name"], r["age"]) for r in res.df.collect()]
    assert got == [
        ("Alice", 15), ("Alice", 20),
        ("Mark", 20), ("Mark", 30), ("Mark", 40),
        ("Bob", 30), ("Bob", 45),
    ]


def test_sort_with_row_cap(person):
    with pytest.raises(ValueError, match="driver cap"):
        person.sort_with(lambda a, b: 0, limit=3)


# --- review-fix regressions (core) ---


def test_union_widen_two_decimals_stays_decimal(spark):
    from dataframe_kotlin_spark.core.frame import KDataFrame

    a = KDataFrame(spark.sql("SELECT CAST(1.25 AS DECIMAL(10,2)) AS amt"))
    b = KDataFrame(spark.sql("SELECT CAST(2.0001 AS DECIMAL(12,4)) AS amt"))
    out = a.union(b)
    assert out.df.schema["amt"].dataType == T.DecimalType(12, 4)
    assert sorted(str(r["amt"]) for r in out.df.collect()) == ["1.2500", "2.0001"]


def test_remove_flat_column_with_dot_in_name(spark):
    from dataframe_kotlin_spark.core.frame import KDataFrame

    df = KDataFrame(
        spark.createDataFrame([(1, 2)], "id int, `a.b` int")
    )
    out = df.remove("a.b")
    assert out.columns == ["id"]


def test_corr_matrix_separator_collision(spark):
    from dataframe_kotlin_spark.core.frame import KDataFrame

    rows = [(1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 5.0, -4.0)]
    df = KDataFrame(spark.createDataFrame(rows, "`a` double, `a__a` double, `b` double"))
    m = {r["column"]: r for r in df.corr_matrix().df.collect()}
    assert abs(m["a"]["a"] - 1.0) < 1e-12
    # the (a, a__a) and (a__a, a) cells must be the SAME value and not
    # leak from a colliding alias
    assert abs(m["a"]["a__a"] - m["a__a"]["a"]) < 1e-12
    assert m["a"]["b"] < 0  # negative correlation preserved


def test_transpose_row_quote_in_name(spark):
    from dataframe_kotlin_spark.core.frame import KDataFrame

    df = KDataFrame(spark.createDataFrame([(5,)], ["it's"]))
    out = df.transpose_row().df.collect()
    assert [(r["name"], r["value"]) for r in out] == [("it's", "5")]


# -- GatherTests parity (reference GatherTests.kt) ------------------------

GATHER_JSON = """
[
  {"name": "abc",
   "normal":   {"c1": "a", "c2": "b", "c3": "c"},
   "reversed": {"c1": "c", "c2": "b", "c3": "a"},
   "first":    {"c1": "c"}},
  {"name": "qw",
   "normal":   {"c1": "q", "c2": "w"},
   "reversed": {"c1": "w", "c2": "q"},
   "first":    {"c1": "q"}}
]
"""


def test_gather_groups_reference_case(spark):
    # GatherTests.gather: gather all struct columns except name; key =
    # group name, struct fields splice into c1/c2/c3 with nulls where a
    # group lacks the field
    from dataframe_kotlin_spark.sources.json import read_json_str

    df = KDataFrame(read_json_str(spark, GATHER_JSON))
    out = df.gather_groups(["normal", "reversed", "first"], key_name="mode").df
    assert out.columns == ["name", "mode", "c1", "c2", "c3"]
    rows = {(r["name"], r["mode"]): (r["c1"], r["c2"], r["c3"]) for r in out.collect()}
    assert rows[("abc", "normal")] == ("a", "b", "c")
    assert rows[("abc", "reversed")] == ("c", "b", "a")
    assert rows[("abc", "first")] == ("c", None, None)
    assert rows[("qw", "normal")] == ("q", "w", None)
    assert rows[("qw", "reversed")] == ("w", "q", None)
    assert rows[("qw", "first")] == ("q", None, None)
    assert len(rows) == 6


def test_gather_groups_null_cell_vs_all_null_fields(spark):
    # advice r4: dropNulls removes rows whose gathered CELL is null —
    # not rows whose non-null struct happens to have all-null fields
    df = KDataFrame(
        spark.createDataFrame(
            [(1, (None,), (9,)), (2, None, (8,))],
            "id int, a struct<x:int>, b struct<x:int>",
        )
    )
    out = df.gather_groups(["a", "b"], key_name="k").df
    rows = {(r["id"], r["k"]): r["x"] for r in out.collect()}
    # row 1's a-cell is a NON-null struct with a null field: kept
    assert rows[(1, "a")] is None
    # row 2's a-cell is a null struct: dropped
    assert (2, "a") not in rows
    assert rows[(1, "b")] == 9 and rows[(2, "b")] == 8
    assert len(rows) == 3


def test_gather_groups_rejects_non_struct(spark):
    import pytest as _pytest

    df = KDataFrame(spark.createDataFrame([(1, 2)], "a int, b int"))
    with _pytest.raises(ValueError, match="not a struct"):
        df.gather_groups(["a"])


def test_gather_list_cells_re_explode(spark):
    # gather.kt:70-71: a Many (list) cell expands to one row per element
    df = KDataFrame(
        spark.createDataFrame(
            [(1, ["a", "b"], ["x"]), (2, [], None)],
            "id int, u array<string>, v array<string>",
        )
    )
    out = df.gather(["u", "v"], key_name="k", value_name="val").df
    rows = sorted((r["id"], r["k"], r["val"]) for r in out.collect())
    assert rows == [(1, "u", "a"), (1, "u", "b"), (1, "v", "x")]
    # drop_nulls=False keeps empty/null lists as null-value rows
    out2 = df.gather(["u", "v"], key_name="k", value_name="val", drop_nulls=False).df
    rows2 = sorted(
        ((r["id"], r["k"], r["val"]) for r in out2.collect()),
        key=lambda t: (t[0], t[1], t[2] or ""),
    )
    assert (2, "u", None) in rows2 and (2, "v", None) in rows2


def test_gather_list_cells_where_and_map(spark):
    df = KDataFrame(
        spark.createDataFrame([(1, [1, 2, 3], [4])], "id int, u array<int>, v array<int>")
    )
    out = df.gather(
        ["u", "v"],
        key_name="k",
        value_name="val",
        where=F.col("val") >= 2,
        map_values=lambda c: c * 10,
    ).df
    rows = sorted((r["id"], r["k"], r["val"]) for r in out.collect())
    assert rows == [(1, "u", 20), (1, "u", 30), (1, "v", 40)]


# -- MoveTests flatten parity (reference MoveTests.kt:53-72) ---------------


@pytest.fixture
def move_grouped(spark):
    # MoveTests fixture: flat cols q,a.b,b.c,w,a.c.d,e.f,b.d,r grouped by
    # dot-split -> columns q, a{b,c{d}}, b{c,d}, w, e{f}, r
    row = (1, (2, (3,)), (4, 5), 6, (7,), 8)
    schema = (
        "q int, a struct<b:int,c:struct<d:int>>, b struct<c:int,d:int>, "
        "w int, e struct<f:int>, r int"
    )
    return KDataFrame(spark.createDataFrame([row], schema))


def test_flatten_one(move_grouped):
    # MoveTests `flatten one`: only group a flattens; b and e stay groups
    out = move_grouped.flatten(cols=["a"]).df
    assert out.columns == ["q", "a_b", "a_c_d", "b", "w", "e", "r"]


def test_flatten_several(move_grouped):
    # MoveTests `flatten several`: selector {a.c and a and b} — a.c folds
    # into root a (top()); e survives as a group
    out = move_grouped.flatten(cols=["a.c", "a", "b"]).df
    assert out.columns == ["q", "a_b", "a_c_d", "b_c", "b_d", "w", "e", "r"]


def test_flatten_all_custom_sep(move_grouped):
    # MoveTests `flatten all` with separator "."
    out = move_grouped.flatten(".").df
    assert out.columns == ["q", "a.b", "a.c.d", "b.c", "b.d", "w", "e.f", "r"]


def test_flatten_nested_root_stays_in_parent(spark):
    # a nested-only root keeps its leaves inside the parent struct, named
    # relative to the parent (flatten.kt getRootPrefix path)
    df = KDataFrame(
        spark.createDataFrame(
            [((1, (2, 3)),)], "a struct<x:int,c:struct<d:int,e:int>>"
        )
    )
    out = df.flatten(cols=["a.c"]).df
    assert out.columns == ["a"]
    inner = out.schema["a"].dataType
    assert [f.name for f in inner.fields] == ["x", "c_d", "c_e"]
    r = out.collect()[0]["a"]
    assert (r["x"], r["c_d"], r["c_e"]) == (1, 2, 3)


def test_flatten_clash_with_untouched_sibling(spark):
    # advice r4: the dedup set must pre-seed with NON-flattened output
    # names — a plain column a_b next to struct a{b} previously yielded
    # two a_b columns, making downstream selects ambiguous
    df = KDataFrame(
        spark.createDataFrame([(((1,)), 2)], "a struct<b:int>, a_b int")
    )
    out = df.flatten().df
    assert out.columns == ["a_b_1", "a_b"]
    r = out.collect()[0]
    assert (r["a_b_1"], r["a_b"]) == (1, 2)


def test_flatten_name_clash_dedup(spark):
    # ColumnNameGenerator.addUnique: clashing flattened names take _k
    # suffixes in encounter order
    df = KDataFrame(
        spark.createDataFrame(
            [(((1,), 2),)], "a struct<b:struct<c:int>,b_c:int>"
        )
    )
    out = df.flatten().df
    assert out.columns == ["a_b_c", "a_b_c_1"]
    r = out.collect()[0]
    assert (r["a_b_c"], r["a_b_c_1"]) == (1, 2)


# -- PivotTests parity (reference person/PivotTests.kt:64-410) -------------
# The reference's heterogeneous Any `value` column lands as STRING here
# (a relational column has one type); list (Many) cells come from
# pivot.values(), nested layouts from aggregate(nested=True).


@pytest.fixture
def pivot_kv(spark):
    rows = [
        ("Alice", "age", "15"), ("Alice", "city", "London"),
        ("Alice", "weight", "54"), ("Bob", "age", "45"),
        ("Bob", "weight", "87"), ("Mark", "age", "20"),
        ("Mark", "city", "Moscow"), ("Mark", "weight", None),
        ("Alice", "age", "55"),
    ]
    return KDataFrame(
        spark.createDataFrame(rows, "name string, key string, value string")
    )


def _drop_first_row(kdf):
    # PivotTests `typed.drop(1)`: drops the ("Alice","age","15") row
    return KDataFrame(
        kdf.df.filter(
            ~((F.col("name") == "Alice") & (F.col("key") == "age") & (F.col("value") == "15"))
        )
    )


def test_pivottests_matches(pivot_kv):
    filtered = _drop_first_row(pivot_kv)
    res = filtered.group_by("name").pivot("key").matches().df
    assert res.columns == ["name", "age", "city", "weight"]  # 1 + ndistinct keys
    assert res.count() == 3  # ndistinct names
    actual = {
        (r["name"], c)
        for r in res.collect()
        for c in ("age", "city", "weight")
        if r[c]
    }
    expected = {(r["name"], r["key"]) for r in filtered.df.collect()}
    assert actual == expected
    assert all(dict(res.dtypes)[c] == "boolean" for c in ("age", "city", "weight"))


def test_pivottests_matches_yes_no(pivot_kv):
    # `pivot matches yes no`: 8 yes cells, 1 no (Bob has no city)
    res = _drop_first_row(pivot_kv).group_by("name").pivot("key").matches("yes", "no").df
    cells = [r[c] for r in res.collect() for c in ("age", "city", "weight")]
    assert cells.count("yes") == 8
    assert cells.count("no") == 1


def test_pivottests_simple_pivot_default(pivot_kv):
    # `simple pivot` with default "-": the default fills MISSING cells
    # (Bob×city) but NOT a present null value (Mark×weight) — reference
    # defaultExpected keeps Mark.weight null while Bob.city becomes "-"
    cell = F.when(F.count(F.lit(1)) > 0, F.first("value")).otherwise(F.lit("-"))
    res = pivot_kv.group_by("name").pivot("key", ["age", "city", "weight"]).aggregate(cell).df
    rows = {r["name"]: r for r in res.collect()}
    assert rows["Bob"]["city"] == "-"
    assert rows["Mark"]["weight"] is None
    assert rows["Alice"]["city"] == "London"
    # multi-match cell via values(): Alice has both ages
    lists = pivot_kv.group_by("name").pivot("key", ["age"]).values("value").df
    assert {tuple(r["age"]) for r in lists.collect()} == {("15", "55"), ("45",), ("20",)}


def test_pivottests_key_transform(pivot_kv):
    # `pivot with transform`: key.map { "_$it" } prefixes pivot columns
    pre = KDataFrame(pivot_kv.df.withColumn("key", F.concat(F.lit("_"), F.col("key"))))
    res = pre.group_by("name").pivot("key").count(default=0).df
    assert set(res.columns[1:]) == {"_age", "_city", "_weight"}


def test_pivottests_value_map(pivot_kv):
    # `pivot with value map`: value.map { "_$it" } — null maps to "_null"
    pre = KDataFrame(
        pivot_kv.df.withColumn(
            "value", F.concat(F.lit("_"), F.coalesce(F.col("value"), F.lit("null")))
        )
    )
    res = pre.group_by("name").pivot("key", ["age", "city", "weight"]).values("value").df
    rows = {r["name"]: r for r in res.collect()}
    assert rows["Alice"]["age"] == ["_15", "_55"]
    assert rows["Mark"]["weight"] == ["_null"]
    assert rows["Bob"]["city"] == []  # missing cell, no value rows


def test_pivottests_two_values_separate(pivot_kv):
    # `pivot two values group by value` (values(separate = true)):
    # ncol == 1 key + one group per AGGREGATE, pivot values inside
    typed = KDataFrame(
        pivot_kv.df.withColumn(
            "type",
            F.when(F.col("value").rlike("^[0-9]+$"), F.lit("Int")).otherwise(F.lit("String")),
        )
    )
    res = typed.group_by("name").pivot("key", ["age", "city", "weight"]).aggregate(
        F.first("value").alias("value"),
        F.first("type").alias("type"),
        nested=True,
        group_by_value=True,
    ).df
    assert len(res.columns) == 3  # name + value group + type group
    assert res.columns == ["name", "value", "type"]
    assert [f.name for f in res.schema["value"].dataType.fields] == ["age", "city", "weight"]


def test_pivottests_aggregate_several_into(pivot_kv):
    # `pivot aggregate several into`: every pivot value becomes a group
    # of the named aggregates
    res = pivot_kv.group_by("name").pivot("key", ["age", "city", "weight"]).aggregate(
        F.min("value").alias("first value"),
        F.max("value").alias("last value"),
        nested=True,
    ).df
    for c in ("age", "city", "weight"):
        assert [f.name for f in res.schema[c].dataType.fields] == ["first value", "last value"]


def test_pivottests_with_grouping(pivot_kv):
    # `pivot with grouping` (withGrouping("keys")): pivot columns nest
    # under one group
    res = (
        pivot_kv.group_by("name")
        .pivot("key", ["age", "city", "weight"])
        .count(default=0)
        .group_cols(["age", "city", "weight"], "keys")
        .df
    )
    assert res.columns == ["name", "keys"]
    assert [f.name for f in res.schema["keys"].dataType.fields] == ["age", "city", "weight"]


def test_pivottests_gather_roundtrip(pivot_kv):
    # PivotTests.gather: pivot -> gather inverts back to the non-null
    # rows; list (Many) cells re-explode one row per element
    piv = pivot_kv.group_by("name").pivot("key", ["age", "city", "weight"]).values("value")
    back = piv.gather(["age", "city", "weight"], key_name="key", value_name="value").df
    got = sorted((r["name"], r["key"], r["value"]) for r in back.collect())
    want = sorted(
        (r["name"], r["key"], r["value"])
        for r in pivot_kv.df.filter(F.col("value").isNotNull()).collect()
    )
    assert got == want


def test_pivottests_gather_with_name_conversion(pivot_kv):
    # `gather with name conversion`: keys pivoted as "__<key>", gathered
    # back with mapNames { it.substring(2) }
    pre = KDataFrame(pivot_kv.df.withColumn("key", F.concat(F.lit("__"), F.col("key"))))
    piv = pre.group_by("name").pivot("key", ["__age", "__city", "__weight"]).values("value")
    back = piv.gather(
        ["__age", "__city", "__weight"],
        key_name="key",
        value_name="value",
        map_names=lambda c: F.substring(c, 3, 10_000),
    ).df
    got = sorted((r["name"], r["key"], r["value"]) for r in back.collect())
    want = sorted(
        (r["name"], r["key"], r["value"])
        for r in pivot_kv.df.filter(F.col("value").isNotNull()).collect()
    )
    assert got == want
