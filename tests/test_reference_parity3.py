"""Reference-parity batch 3: person/DataFrameTests.kt behaviors not yet
covered by test_reference_parity.py. Each test cites the reference test
(name + line in src/test/kotlin/org/jetbrains/dataframe/person/
DataFrameTests.kt). Order-sensitive reference semantics (insertion
order) are expressed with an explicit ``__idx__`` order column, per the
engine's unordered relational model (SURVEY §2.2 flag).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataframe_kotlin_spark import KDataFrame


@pytest.fixture()
def indexed(person):
    rows = person.df.collect()
    spark = person.df.sparkSession
    schema = T.StructType(
        list(person.df.schema.fields) + [T.StructField("__idx__", T.LongType())]
    )
    return KDataFrame(
        spark.createDataFrame([tuple(r) + (i,) for i, r in enumerate(rows)], schema)
    )


# --- grouping / aggregation ------------------------------------------------


def test_groupby_aggregate_matrix(person):
    # `groupBy` (DataFrameTests.kt:585): the big multi-stat aggregate —
    # n, old count, median age, min age, all-with-weights, oldest origin
    # (maxBy age -> city), youngest origin, per-group age lists.
    res = (
        person.group_by("name")
        .aggregate(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("age") > 25, 1)).alias("old_count"),
            F.median("age").alias("median_age"),
            F.min("age").alias("min_age"),
            F.bool_and(F.col("weight").isNotNull()).alias("all_with_weights"),
            F.max_by("city", "age").alias("oldest_origin"),
            F.min_by("city", "age").alias("youngest_origin"),
            F.sort_array(F.collect_list("age")).alias("ages"),
        )
        .df.orderBy("name")
        .collect()
    )
    got = {r["name"]: r for r in res}
    assert [r["name"] for r in res] == ["Alice", "Bob", "Mark"]
    assert [got[n]["n"] for n in ("Alice", "Bob", "Mark")] == [2, 2, 3]
    assert [got[n]["old_count"] for n in ("Alice", "Bob", "Mark")] == [0, 2, 2]
    assert [got[n]["median_age"] for n in ("Alice", "Bob", "Mark")] == [17.5, 37.5, 30.0]
    assert [got[n]["min_age"] for n in ("Alice", "Bob", "Mark")] == [15, 30, 20]
    assert [got[n]["all_with_weights"] for n in ("Alice", "Bob", "Mark")] == [
        True,
        True,
        False,
    ]
    assert [got[n]["oldest_origin"] for n in ("Alice", "Bob", "Mark")] == [
        None,
        "Dubai",
        "Milan",
    ]
    assert [got[n]["youngest_origin"] for n in ("Alice", "Bob", "Mark")] == [
        "London",
        "Tokyo",
        "Moscow",
    ]
    assert got["Alice"]["ages"] == [15, 20]
    assert got["Bob"]["ages"] == [30, 45]
    assert got["Mark"]["ages"] == [20, 30, 40]


def test_groupby_meanof(person):
    # `groupBy meanOf` (:674): meanOf{age*2} == aggregate{mean(age)*2}
    a = (
        person.group_by("name")
        .aggregate(F.mean(F.col("age") * 2).alias("m"))
        .df.orderBy("name")
        .collect()
    )
    b = (
        person.group_by("name")
        .aggregate((F.mean("age") * 2).alias("m"))
        .df.orderBy("name")
        .collect()
    )
    assert [r["m"] for r in a] == [r["m"] for r in b]


def test_frame_min_and_nullable_max(person):
    # `min` (:680) / `nullable max` (:699)
    row = person.df.agg(
        F.min("age").alias("mn"), F.max("weight").alias("mx")
    ).collect()[0]
    assert row["mn"] == 15
    assert row["mx"] == 90


def test_minby_maxby_frame_level(person):
    # `nullable minBy` (:718): dropNulls(weight).minBy(weight) -> Alice;
    # `maxBy` (:733): maxBy(age) -> Bob
    mn = person.drop_nulls(["weight"]).take_ordered(1, ["weight"]).df.collect()[0]
    assert mn["name"] == "Alice"
    mx = person.take_ordered(1, [F.col("age").desc()]).df.collect()[0]
    assert mx["name"] == "Bob"


def test_empty_group_by(person):
    # `empty group by` (:1241): grouping an empty frame yields no groups
    assert person.filter(F.lit(False)).group_by("name").count().df.count() == 0


def test_groupby_no_keys(person):
    # `groupBy none` (:1808): aggregation without keys -> one global row
    res = person.group_by().aggregate(
        F.max("age").alias("max_age"), F.count(F.lit(1)).alias("n")
    )
    rows = res.df.collect()
    assert len(rows) == 1
    assert rows[0]["max_age"] == 45 and rows[0]["n"] == 7


def test_column_stats(person):
    # `column stats` (:1248)
    ages = [15, 45, 20, 40, 30, 20, 30]
    row = person.df.agg(
        F.mean("age").alias("mean"),
        F.min("age").alias("min"),
        F.max("age").alias("max"),
        F.sum("age").alias("sum"),
    ).collect()[0]
    assert row["mean"] == pytest.approx(sum(ages) / len(ages))
    assert row["min"] == min(ages)
    assert row["max"] == max(ages)
    assert row["sum"] == sum(ages)


# --- add / union / distinct / append --------------------------------------


def test_add_year_column(person, indexed):
    # `add one column` (:750): year = 2020 - age
    res = indexed.add("year", F.lit(2020) - F.col("age"))
    got = [r["year"] for r in res.df.orderBy("__idx__").collect()]
    assert got == [2005, 1975, 2000, 1980, 1990, 2000, 1990]


def test_merge_similar_frames_bag(person):
    # `merge similar dataframes` (:822): df + df + df = bag concat
    res = person.concat(person, person)
    assert res.df.count() == 21
    counts = {
        r["name"]: r["count"]
        for r in res.df.groupBy("name").count().collect()
    }
    assert counts == {"Alice": 6, "Bob": 6, "Mark": 9}


def test_union_different_column_type(person, spark):
    # `union dataframes with different type of the same column` (:861):
    # int age ∪ double age widens to the common (double) type, nullable
    other = spark.createDataFrame([(32.6,), (56.3,), (None,)], "age double")
    res = person.select("age").union(KDataFrame(other))
    assert isinstance(res.df.schema["age"].dataType, T.DoubleType)
    assert res.df.schema["age"].nullable
    got = sorted(r["age"] for r in res.df.collect() if r["age"] is not None)
    assert got == sorted([15.0, 45.0, 20.0, 40.0, 30.0, 20.0, 30.0, 32.6, 56.3])
    assert res.df.count() == 10


def test_distinct_counts(person):
    # `distinct` (:871)
    assert person.select("name", "city").distinct().df.count() == 6
    d = person.distinct(["name", "city"])
    assert d.df.count() == 6 and len(d.df.columns) == 2


def test_distinct_by_variants(person, indexed):
    # `distinct by` (:879) incl. distinctByExpr forms
    assert person.distinct_by(["name"], order_by=["age"]).df.count() == 3
    assert person.distinct_by(["name", "city"], order_by=["age"]).df.count() == 6
    assert (
        person.distinct_by([F.floor(F.col("age") / 10)], order_by=["age"]).df.count()
        == 4
    )
    assert (
        indexed.distinct_by(
            [F.substring("city", 1, 1)], order_by=["__idx__"]
        ).df.count()
        == 5
    )


def test_append_row_widens_nullability(person):
    # `addRow` (:888): appending a null into a non-nullable column widens
    # that column to nullable instead of raising
    from dataframe_kotlin_spark.sources.build import append_rows

    res = append_rows(person.df, ("Bob", None, "Paris", None))
    assert res.count() == 8
    assert res.schema["age"].nullable  # widened by the null
    assert not res.schema["name"].nullable  # untouched columns keep theirs
    row = [r for r in res.collect() if r["city"] == "Paris"][0]
    assert row["name"] == "Bob" and row["age"] is None and row["weight"] is None


def test_append_many(person):
    # `append many` (:1564)
    from dataframe_kotlin_spark.sources.build import append_rows

    res = append_rows(person.df, ("Zed", 1, "Oslo", 1), ("Yan", 2, "Bern", 2))
    assert res.count() == 9


# --- rename / replace / structure ------------------------------------------


def test_rename_preserves_position(person):
    # `rename` (:904): renamed columns keep their positions
    res = person.rename({"name": "name2", "age": "age2"})
    assert res.df.columns == ["name2", "age2", "city", "weight"]
    assert sorted(r["name2"] for r in res.df.collect()) == sorted(
        r["name"] for r in person.df.collect()
    )


def test_nunique(person):
    # `nunique` (:926)
    assert person.ndistinct("name") == 3


def test_encode_names(person, indexed):
    # `encode names` (:931): distinct names get dense ids, joined back.
    # Reference ids follow first-seen order (Alice,Bob,Mark = 0,1,2);
    # name order is alphabetical here so the ids coincide.
    encoding = person.distinct(["name"]).with_row_id("name_id", order_by=["name"])
    res = indexed.left_join(encoding, on=["name"])
    got = [r["name_id"] for r in res.df.orderBy("__idx__").collect()]
    assert got == [0, 1, 2, 2, 1, 0, 2]


def test_replace_with_expression(person):
    # replace (:1448) + `replace with expression` (:1472): replace the
    # column in place == the update form; position preserved
    res = person.replace_col("age", F.lit(2021) - F.col("age"))
    exp = person.update("age", with_expr=F.lit(2021) - F.col("age"))
    assert res.df.columns == exp.df.columns
    assert sorted(map(tuple, res.df.collect())) == sorted(map(tuple, exp.df.collect()))


def test_replace_two_columns(person):
    # `replace two columns` (:1465): age*2 and weight*2 at once
    res = person.replace_col("age", F.col("age") * 2).replace_col(
        "weight", F.col("weight") * 2
    )
    exp = person.update("age", with_expr=F.col("age") * 2).update(
        "weight", with_expr=F.col("weight") * 2
    )
    assert res.df.columns == exp.df.columns == ["name", "age", "city", "weight"]
    assert sorted(map(tuple, res.df.collect())) == sorted(map(tuple, exp.df.collect()))


def test_move_to_position(person):
    # `move to position` (:1271): move age to index 2
    assert person.df.columns[1] == "age"
    moved = person.move("age").to(2)
    assert moved.df.columns == ["name", "city", "age", "weight"]
    assert moved.df.count() == 7


def test_add_dataframe_positional(indexed):
    # `add dataframe` (:1480): positional column-concat of two halves
    # reassembles the original frame
    left = indexed.select("name", "age", "__idx__")
    right = indexed.select("city", "weight", F.col("__idx__").alias("__idx2__"))
    res = left.zip_frames(right, order_by=["__idx__"], other_order_by=["__idx2__"])
    got = [
        (r["name"], r["age"], r["city"], r["weight"])
        for r in res.df.orderBy("__idx__").collect()
    ]
    exp = [
        (r["name"], r["age"], r["city"], r["weight"])
        for r in indexed.df.orderBy("__idx__").collect()
    ]
    assert got == exp


# --- positional slicing -----------------------------------------------------


def test_range_slice(indexed):
    # `range slice` (:1261): df[3..5] -> rows 3,4,5
    res = indexed.slice_rows(3, 6, order_by=["__idx__"])
    assert [r["name"] for r in res.df.orderBy("__idx__").collect()] == [
        "Mark",
        "Bob",
        "Alice",
    ]


def test_range_slice_two_times(indexed):
    # `range slice two times` (:1266): df[3..5][1..2] -> rows 4,5
    first = indexed.slice_rows(3, 6, order_by=["__idx__"])
    res = first.slice_rows(1, 3, order_by=["__idx__"])
    assert [r["name"] for r in res.df.orderBy("__idx__").collect()] == ["Bob", "Alice"]


# --- pivot / gather / merge rows -------------------------------------------


def test_pivot_matches_pairs(person):
    # `pivot to bool merged rows` (:989): the true cells of the presence
    # matrix are exactly the distinct (name, city) pairs ("null" for the
    # null city, as the reference's toString does)
    res = person.group_by("name").pivot("city").matches()
    cols = [c for c in res.df.columns if c != "name"]
    pairs = set()
    for r in res.df.collect():
        for c in cols:
            if r[c]:
                pairs.add((r["name"], c))
    exp = {
        (r["name"], str(r["city"]) if r["city"] is not None else "null")
        for r in person.df.collect()
    }
    assert pairs == exp
    # true-cell count = distinct (name, city) pairs
    assert len(pairs) == person.select("name", "city").distinct().df.count()


def test_gather_bool_roundtrip(person):
    # `gather bool` (:1025): matches -> gather(where value) -> city column
    # equals the distinct (name, city-as-string) projection
    pivoted = person.group_by("name").pivot("city").matches()
    bool_cols = [
        f.name
        for f in pivoted.df.schema.fields
        if isinstance(f.dataType, T.BooleanType)
    ]
    res = pivoted.gather(
        bool_cols, key_name="city", value_name="hit", where=F.col("hit")
    ).select("name", "city")
    got = sorted(map(tuple, res.df.collect()))
    exp = sorted(
        (r["name"], str(r["city"]) if r["city"] is not None else "null")
        for r in person.select("name", "city").distinct().df.collect()
    )
    assert got == exp


def test_merge_rows_null_flag_sizes(person):
    # `merge rows keep nulls` (:1033) / `drop nulls` (:1051): total list
    # elements = 7 with nulls kept, 6 with nulls dropped
    kept = person.select("name", "city").merge_rows(["city"], drop_nulls=False)
    assert sum(len(r["city"]) for r in kept.df.collect()) == 7
    dropped = person.select("name", "city").merge_rows(["city"], drop_nulls=True)
    assert sum(len(r["city"]) for r in dropped.df.collect()) == 6


def test_pivot_max(person):
    # `pivot max` (:1822): name × city -> max(age)
    res = person.group_by("name").pivot("city").aggregate(F.max("age"))
    got = {r["name"]: r.asDict() for r in res.df.collect()}
    assert got["Bob"]["Dubai"] == 45 and got["Bob"]["Tokyo"] == 30
    assert got["Mark"]["Moscow"] == 30 and got["Mark"]["Milan"] == 40
    assert got["Alice"]["London"] == 15
    assert got["Alice"].get("Dubai") is None


def test_merge_cols_with_conversion(person):
    # `merge cols with conversion` (:1181): pivot counts -> merge the int
    # columns by summing -> equals the plain groupBy count (works only
    # because the null city pivots into a "null" column, so no rows are
    # lost in the pivot)
    pivoted = person.group_by("name").pivot("city").count()
    int_cols = [
        f.name
        for f in pivoted.df.schema.fields
        if isinstance(f.dataType, (T.IntegerType, T.LongType))
    ]
    merged = pivoted.merge_cols(
        int_cols,
        into="cities",
        combine=lambda cs: sum(
            (F.coalesce(c, F.lit(0)) for c in cs[1:]), F.coalesce(cs[0], F.lit(0))
        ),
    )
    exp = person.group_by("name").count(name="cities")
    assert sorted(map(tuple, merged.df.select("name", "cities").collect())) == sorted(
        map(tuple, exp.df.collect())
    )
    # merged column takes the first source column's position
    assert merged.df.columns == ["name", "cities"]


def test_aggregate_dataframe_with_pivot(person):
    # `aggregate dataframe with pivot` (:1851): one summary row mixing a
    # plain count, a per-name pivoted max(age), and a weight total
    pivoted = person.group_by().pivot("name").aggregate(F.max("age"))
    other = person.group_by().aggregate(
        F.count(F.lit(1)).alias("count"), F.sum("weight").alias("total_weight")
    )
    row = other.df.crossJoin(pivoted.df).collect()
    assert len(row) == 1
    r = row[0]
    assert (r["count"], r["Alice"], r["Bob"], r["Mark"], r["total_weight"]) == (
        7,
        20,
        45,
        40,
        354,
    )


def test_pivot_mean_values_nested(person):
    # `pivot mean values` (:1838): nested layout — each city column is a
    # struct of double means {age, weight}
    res = person.group_by("name").pivot("city").aggregate(
        F.mean("age").alias("age"), F.mean("weight").alias("weight"), nested=True
    )
    city_fields = [f for f in res.df.schema.fields if f.name != "name"]
    assert len(city_fields) == 6  # 5 cities + "null"
    for f in city_fields:
        assert isinstance(f.dataType, T.StructType)
        assert f.dataType.names == ["age", "weight"]
        for sub in f.dataType.fields:
            assert isinstance(sub.dataType, T.DoubleType)
    got = {r["name"]: r for r in res.df.collect()}
    assert got["Mark"]["Moscow"]["age"] == 25.0  # mean(20, 30)
    assert got["Alice"]["null"]["age"] == 20.0


def test_groupby_with_computed_key(person):
    # `groupBy with map` (:1803): grouping by a computed key expression
    res = person.group_by(F.lower(F.col("name")).alias("name")).count()
    assert sorted(r["name"] for r in res.df.collect()) == ["alice", "bob", "mark"]


def test_find_the_longest_string(person):
    # `find the longest string` (:1873)
    longest = (
        "Taumatawhakatangihangakoauauotamateaturipukakapikimaungahoronuku"
        "pokaiwhenuakitanatahu"
    )
    updated = person.update(
        "city", where=F.col("city") == "Dubai", with_expr=F.lit(longest)
    )
    stacked = updated.gather(["name", "city"], key_name="col", value_name="val")
    top = stacked.df.agg(F.max_by("val", F.length("val")).alias("v")).collect()[0]
    assert top["v"] == longest


# --- null / NaN handling ----------------------------------------------------


def test_drop_where_any_all_na(spark):
    # `drop where any na` (:1741) / `all na` (:1754): NaN counts as
    # missing alongside null
    nan = float("nan")
    df = KDataFrame(
        spark.createDataFrame(
            [(1.0, 2.0), (nan, 3.0), (None, 4.0), (nan, None), (5.0, None)],
            "a double, b double",
        )
    )
    assert df.drop_na(["a", "b"]).df.count() == 1  # only (1.0, 2.0)
    assert df.drop_na(["a"]).df.count() == 2  # (1.0,2.0), (5.0,None)


# --- nested (tree) fixture: person2-style struct frame ----------------------


@pytest.fixture()
def tree2(person):
    # DataFrameTreeTests' typed2: nameAndCity{name, city} + age + weight
    return person.group_cols(["name", "city"], into="nameAndCity")


def test_tree_all_except(person):
    # `all except` (DataFrameTreeTests.kt:389): group everything but
    # name under info, then select everything but info == select(name)
    moved = person.group_cols(["age", "city", "weight"], into="info")
    actual = moved.select(*[c for c in moved.df.columns if c != "info"])
    assert actual.df.columns == ["name"]
    assert sorted(r["name"] for r in actual.df.collect()) == sorted(
        r["name"] for r in person.df.collect()
    )


def test_tree_move_and_group(person):
    # `move and group` (:397): grouping by the non-struct remainder
    moved = person.group_cols(["age", "city", "weight"], into="info")
    keys = [c for c in moved.df.columns if c != "info"]
    assert moved.group_by(*keys).count().df.count() == person.ndistinct("name")


def test_tree_append_nulls(tree2):
    # `append nulls` (:593): appending an all-null row widens
    # nullability; the null struct cell reads as null leaf fields
    from dataframe_kotlin_spark.sources.build import append_rows

    res = append_rows(tree2.df, (None, None, None))
    assert res.count() == 8
    assert res.schema["age"].nullable
    nulls = res.filter(F.col("age").isNull())
    row = nulls.select(
        F.col("nameAndCity.name").alias("n"), F.col("nameAndCity.city").alias("c")
    ).collect()
    assert len(row) == 1 and row[0]["n"] is None and row[0]["c"] is None


def test_tree_dropnulls_no_args(tree2, person):
    # `filter not null without arguments` (:629): dropNulls() on the
    # nested frame == dropNulls(weight) then group — the struct CELL is
    # never null, so only the top-level weight nulls drop rows
    res = tree2.drop_nulls()
    exp = person.drop_nulls(["weight"]).group_cols(["name", "city"], into="nameAndCity")
    assert res.df.count() == exp.df.count() == 5
    assert sorted(
        (r["nameAndCity"]["name"], r["age"]) for r in res.df.collect()
    ) == sorted((r["nameAndCity"]["name"], r["age"]) for r in exp.df.collect())


def test_tree_select_group_keeps_struct(tree2):
    # `select group` (:634): selecting the group column + a leaf keeps
    # the struct intact under its name
    res = tree2.select("nameAndCity", "age")
    assert res.df.columns == ["nameAndCity", "age"]
    assert isinstance(res.df.schema["nameAndCity"].dataType, T.StructType)


def test_distance_from_last_zero(spark):
    # TipsAndTricksTests.kt:9 `distance from last zero`: the reference
    # writes a self-referencing row closure (prev.Y + 1); relationally
    # the same scan is Y = idx - last_zero_idx with a running max window
    # — one partition-able pass, no sequential dependency
    from pyspark.sql import Window

    xs = [7, 2, 0, 3, 4, 2, 5, 0, 3, 4]
    df = spark.createDataFrame(list(enumerate(xs)), "idx long, x int")
    w = Window.orderBy("idx").rowsBetween(Window.unboundedPreceding, 0)
    last_zero = F.max(F.when(F.col("x") == 0, F.col("idx"))).over(w)
    out = df.withColumn(
        "Y",
        F.when(F.col("x") == 0, F.lit(0)).otherwise(
            F.col("idx") - F.coalesce(last_zero, F.lit(-1))
        ),
    )
    got = [r["Y"] for r in out.orderBy("idx").collect()]
    assert got == [1, 2, 0, 1, 2, 3, 4, 0, 1, 2]


# --- parse roundtrip --------------------------------------------------------


def test_parse_roundtrip(person):
    # `parse` (:1291): weight -> string -> parse() -> Int again, equal
    as_str = person.convert("weight", "string")
    assert isinstance(as_str.df.schema["weight"].dataType, T.StringType)
    back = as_str.parse(["weight"])
    assert isinstance(back.df.schema["weight"].dataType, T.IntegerType)
    assert sorted(map(tuple, back.df.collect())) == sorted(
        map(tuple, person.df.collect())
    )
