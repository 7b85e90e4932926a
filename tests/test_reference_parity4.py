"""Fourth reference-parity batch: the remainder surfaced by the
round-6 exhaustive test accounting (PARITY.md). Each test cites its
reference case by name; expected values are the reference's literals.

Covers: builder family (BuildTests + DataFrameTests create-with-*),
grouped get-group access, split/merge naming + null-rendering parity
(including the `joinColsToString` null divergence this sweep exposed in
merge_cols), pivot-without-index and per-aggregate pivot defaults,
NaN/date filters, selector positional family, JSON edge shapes, and
render-to-string formats.
"""

import datetime
import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataframe_kotlin_spark import KDataFrame
from dataframe_kotlin_spark.sources.build import dataframe_of, dataframe_of_fill, from_map
from dataframe_kotlin_spark.sources.csv import read_csv, read_delim_str
from dataframe_kotlin_spark.sources.json import read_json_str
from dataframe_kotlin_spark.sources.render import row_to_string, to_string
from dataframe_kotlin_spark.core import columns as sel


# --- builders (person/BuildTests.kt, DataFrameTests.kt create-with-*) ---


def test_create_with_duplicate_columns(spark):
    # `create with duplicate columns`: expects IllegalArgumentException
    with pytest.raises(ValueError, match="duplicate"):
        dataframe_of(spark, ["col", "col"], "Alice", 1, "Bob", 2)


def test_from_map_unequal_column_sizes(spark):
    # `unequal column sizes` (BuildTests.kt:44): 2-row frame + 3-value col
    with pytest.raises(ValueError, match="unequal"):
        from_map(spark, {"name": ["Alice", "Bob"], "id": [1, 2, 3]})


def test_builder_fill_family(spark):
    # `create with vararg doubles and fill equal`: fill(5, true)
    df = dataframe_of_fill(spark, ["1.0", "2.5"], lambda _: [True] * 5)
    assert df.count() == 5 and len(df.columns) == 2
    assert all(all(v is True for v in r) for r in df.collect())

    # `create with list of names and fill nulls`: nulls<Double>(10).
    # All-null columns carry no type evidence; the engine's from_map
    # represents them as string-typed null columns (build.py contract).
    df = dataframe_of_fill(spark, ["first", "second"], lambda _: [None] * 10)
    assert df.count() == 10
    assert all(v is None for r in df.collect() for v in r)

    # `create with list of names and fill true`: fill(5) { true }
    df = dataframe_of_fill(spark, ["first", "second"], lambda _: [True] * 5)
    assert [f.dataType for f in df.schema.fields] == [T.BooleanType()] * 2

    # `create with int range header and int range data `: 5x5, col == row+1
    df = dataframe_of_fill(spark, [str(i) for i in range(1, 6)], lambda _: list(range(1, 6)))
    assert df.count() == 5 and len(df.columns) == 5

    # `create with list builder`: dataFrameOf(4..10 step 2){ List(10){it} }
    df = dataframe_of_fill(spark, ["4", "6", "8", "10"], lambda h: [int(h)] * 10)
    assert df.count() == 10
    assert all(r[c] == int(c) for r in df.collect() for c in df.columns)

    # `create with vararg header and builder`: name -> its chars
    df = dataframe_of_fill(spark, ["first", "secon", "third"], lambda n: list(n))
    assert df.count() == 5
    for c in df.columns:
        assert "".join(r[c] for r in df.select(c).collect()) == c

    # `create with random`: shape/type contract with a deterministic
    # generator standing in for randomInt (no ambient randomness)
    df = dataframe_of_fill(spark, list("abcdef"), lambda n: [(ord(n) * 7 + i) % 100 for i in range(3)])
    assert df.count() == 3 and len(df.columns) == 6
    assert all(isinstance(f.dataType, T.LongType) for f in df.schema.fields)


def test_null_column_all_nulls(spark):
    # `null column test`: dataFrameOf("col")(null, null) — column survives
    # with every cell null (reference type Any?; engine: string-typed,
    # the from_map all-null representation)
    df = dataframe_of(spark, ["col"], None, None)
    vals = [r["col"] for r in df.collect()]
    assert vals == [None, None]


# --- grouped access (DataFrameTests.kt get-group family) ---


def test_get_group_by_complex_and_partial_key(person):
    # `get group by complex key`: ["Tokyo","Bob"] == filter both
    g = person.group_by("city", "name")
    got = g.get_group("Tokyo", "Bob")
    assert [tuple(r) for r in got.df.collect()] == [("Bob", 30, "Tokyo", 68)]
    # `get group by partial key`: ["Tokyo"] == filter city only
    part = g.get_group("Tokyo")
    assert part.nrow() == 1
    # a None key value matches NULL keys (eqNullSafe)
    assert person.group_by("city").get_group(None).nrow() == 1
    with pytest.raises(ValueError):
        g.get_group("Tokyo", "Bob", "extra")


def test_group_and_sort(person):
    # `group and sort`: groupBy{name}.sortBy{name.desc and age}.ungroup ==
    # plain sortBy — grouping is relational metadata, sort passes through
    res = person.sort_by(F.col("name").desc(), "age")
    names = [r["name"] for r in res.df.collect()]
    assert names == ["Mark", "Mark", "Mark", "Bob", "Bob", "Alice", "Alice"]
    ages = [r["age"] for r in res.df.collect()]
    assert ages == [20, 30, 40, 30, 45, 15, 20]


def test_aggregate_into_grouped_column(person):
    # `aggregate into grouped column`: meanFor{age and weight} into "mean"
    # -> struct column with double fields age, weight
    res = person.group_by("name").aggregate(
        F.struct(F.avg("age").alias("age"), F.avg("weight").alias("weight")).alias("mean")
    )
    assert res.columns == ["name", "mean"]
    f = dict(zip(res.df.schema.fieldNames(), res.df.schema.fields))["mean"]
    assert isinstance(f.dataType, T.StructType)
    assert f.dataType.fieldNames() == ["age", "weight"]
    assert all(isinstance(x.dataType, T.DoubleType) for x in f.dataType.fields)


def test_mean_for_all_columns(person):
    # `mean for all columns`: groupBy{name}.mean() -> name, age, weight
    res = person.group_by("name").mean_for("age", "weight")
    assert res.columns == ["name", "age", "weight"]
    assert res.nrow() == 3
    got = {r["name"]: r for r in res.df.collect()}
    assert got["Alice"]["age"] == 17.5 and got["Alice"]["weight"] == 54.5


# --- select with computed columns (DataFrameTests.kt) ---


def test_select_with_map_and_rename(person):
    # `select with map and rename` / `get column with map`:
    # name.map{lowercase} named "Name"
    res = person.df.select(F.lower("name").alias("Name"))
    assert res.columns == ["Name"]
    assert sorted(r["Name"] for r in res.collect()) == sorted(
        r["name"].lower() for r in person.df.collect()
    )


def test_select_all_after_since_before_until(person):
    # `select all after`: allAfter/allSince/allBefore/allUntil around age
    sc = person.df.schema
    assert sel.all_after(sc, "age") == ["city", "weight"]
    assert sel.all_since(sc, "age") == ["age", "city", "weight"]
    assert sel.all_before(sc, "age") == ["name"]
    assert sel.all_until(sc, "age") == ["name", "age"]


# --- filters (DoubleTests, DataFrameTests between/dates) ---


def test_filter_nan_equality(spark):
    # `filter not null with nans`: age == NaN matches exactly the NaN row
    # (engine columns are typed, so the mixed-type cells become doubles)
    df = spark.createDataFrame(
        [(2.3,), (float("nan"),), (1.0,), (3.0,)], "age double"
    )
    assert df.filter(F.isnan("age")).count() == 1
    # Spark's NaN semantics treat NaN = NaN as TRUE (unlike standard SQL),
    # which matches the reference's `age eq Double.NaN` exactly
    assert df.filter(F.col("age") == float("nan")).count() == 1


def test_between(person):
    # `between`: exclusive (20,40) -> 2; inclusive [20,40] -> 5
    from dataframe_kotlin_spark.functions.math import between

    assert person.df.filter(between(F.col("age"), 20, 40, include_boundaries=False)).count() == 2
    assert person.df.filter(between(F.col("age"), 20, 40)).count() == 5


def test_compare_comparable_dates(person, spark):
    # `compare comparable`: add a date column descending by row position,
    # filter date >= base-3d keeps 4 rows
    base = datetime.date(2020, 6, 15)
    rows = [
        t + (base - datetime.timedelta(days=i),)
        for i, t in enumerate(r for r in person.df.collect())
    ]
    df = spark.createDataFrame(
        [tuple(r) for r in rows], "name string, age int, city string, weight int, date date"
    )
    assert df.filter(F.col("date") >= F.lit(base - datetime.timedelta(days=3))).count() == 4


# --- split / merge naming parity (DataFrameTests.kt split*) ---


@pytest.fixture()
def merged_info(person):
    # merge{age and city and weight}.by(",").into("info") — stringified
    return person.merge_cols(["age", "city", "weight"], into="info", sep=",")


def test_join_cols_to_string_renders_nulls(person):
    # `joinColsToString`: merge.by(", ") is Kotlin joinToString — a null
    # part renders as "null" ("20, Moscow, null"), not dropped
    merged = person.merge_cols(["age", "city", "weight"], into="info", sep=", ")
    infos = {r["info"] for r in merged.df.collect()}
    assert "20, Moscow, null" in infos
    assert "20, null, 55" in infos
    assert "15, London, 54" in infos


def test_split_string_col_roundtrip(merged_info, person):
    # `splitCol` / `splitStringCol2`: split back into 3 named columns ==
    # the stringified original
    res = merged_info.split_col("info", ",", into=["age", "city", "weight"])
    got = sorted(tuple(r) for r in res.df.select("name", "age", "city", "weight").collect())
    expected = sorted(
        (r["name"], str(r["age"]), "null" if r["city"] is None else r["city"],
         "null" if r["weight"] is None else str(r["weight"]))
        for r in person.df.collect()
    )
    assert got == expected


def test_split_string_col_trim(person):
    # `splitStringCol`: merged by " - ", split by "-" with trim=true
    merged = person.merge_cols(["age", "city", "weight"], into="info", sep=" - ")
    res = merged.split_col("info", "-", into=["age", "city", "weight"], trim=True)
    row = {r["name"]: r for r in res.df.collect()}
    # all Alice rows: pick via a full tuple instead
    got = {tuple(r) for r in res.df.select("age", "city", "weight").collect()}
    assert ("15", "London", "54") in got
    assert ("20", "Moscow", "null") in got


def test_split_default_generator_names(merged_info):
    # `splitStringColWithDefaultgenerator`: split(info).into("age") ->
    # remainder named splitted1, splitted2
    res = merged_info.split_col("info", ",", into=["age"], extend=True)
    assert res.columns == ["name", "age", "splitted1", "splitted2"]
    # `splitStringColGenerateNames`: custom generator "extra$it"
    res2 = merged_info.split_col(
        "info", ",", into=["age"], generator=lambda i: f"extra{i}"
    )
    assert res2.columns == ["name", "age", "extra1", "extra2"]


def test_split_age_into_digits(person):
    # `splitAgeIntoDigits`: split{age}.by{digits(it)}.into{"digit$it"} —
    # least-significant digit first
    digits = F.transform(
        F.sequence(F.lit(0), F.lit(1)),
        lambda i: (F.col("age") / F.pow(F.lit(10.0), i.cast("double"))).cast("int") % 10,
    )
    res = person.split_col("age", parts=digits, generator=lambda i: f"digit{i}")
    assert res.columns == ["name", "city", "weight", "digit1", "digit2"]
    got = {(r["digit1"], r["digit2"]) for r in res.df.collect()}
    assert (5, 1) in got  # 15
    assert (5, 4) in got  # 45


def test_split_string_cols_two_at_once(person):
    # `splitStringCols`: merge (name,city) and (age,weight), split both
    # with per-source names — composed as two split_col passes
    merged = person.merge_cols(["name", "city"], into="nameAndCity", sep=", ").merge_cols(
        ["age", "weight"], into="info"
    )
    res = merged.split_col("nameAndCity", ", ", into=["name", "city"])
    # info is an array column — spread positionally
    out = res.df.select(
        "name",
        "city",
        F.col("info")[0].alias("age"),
        F.col("info")[1].alias("weight"),
    )
    got = sorted(tuple(r) for r in out.collect())
    expected = sorted(
        (r["name"], "null" if r["city"] is None else r["city"], r["age"], r["weight"])
        for r in person.df.collect()
    )
    assert got == expected


def test_merge_cols_untyped_list(person):
    # `mergeCols`: merge{age and city and weight}.into("info") — a 3-item
    # cell per row (reference List<Any?>; engine array<string> since
    # Spark arrays are homogeneous — SURVEY §4.2 typed-cell divergence)
    casted = KDataFrame(
        person.df.select(
            "name",
            F.col("age").cast("string").alias("age"),
            "city",
            F.col("weight").cast("string").alias("weight"),
        )
    )
    merged = casted.merge_cols(["age", "city", "weight"], into="info")
    assert merged.columns == ["name", "info"]
    lens = {len(r["info"]) for r in merged.df.collect()}
    assert lens == {3}


# --- pivot parity (DataFrameTests + person/PivotTests + root PivotTests) ---


@pytest.fixture()
def pivot_kv(spark):
    # person/PivotTests.kt:16-26 fixture (values stringified — Spark
    # columns are homogeneous; same representation as parity batch 1)
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


def test_pivot_to_bool_distinct_rows(person):
    # `pivot to bool distinct rows`: matches over (name, age) — each row's
    # own city column true, everything else false
    res = person.group_by("name", "age").pivot("city").matches().df
    src = {(r["name"], r["age"]): str(r["city"]) if r["city"] is not None else "null"
           for r in person.df.collect()}
    for r in res.collect():
        city = src[(r["name"], r["age"])]
        for c in res.columns[2:]:
            assert r[c] == (c == city)


def test_pivot_to_bool_with_conversion(person):
    # `pivot to bool with conversion`: lowercase city keys, matches, then
    # gather-back where true == the distinct lowercased pairs
    filtered = KDataFrame(
        person.df.filter(F.col("city").isNotNull()).withColumn("city", F.lower("city"))
    )
    res = filtered.group_by("name", "age").pivot("city").matches()
    cities = [c for c in res.columns if c not in ("name", "age")]
    gathered = res.gather(cities, key_name="city", value_name="hit").filter(F.col("hit"))
    got = {(r["name"], r["age"], r["city"]) for r in gathered.df.collect()}
    expected = {(r["name"], r["age"], r["city"]) for r in filtered.df.collect()}
    assert got == expected


def test_pivot_to_matrix(person, spark):
    # `pivot to matrix`: names x names grid, sum = len(name)+len(other)
    names = [r["name"] for r in person.df.select("name").distinct().collect()]
    src = KDataFrame(
        person.df.select("name")
        .withColumn("other", F.explode(F.array(*[F.lit(n) for n in names])))
        .withColumn("sum", F.length("name") + F.length("other"))
    )
    matrix = src.group_by("name").pivot("other").aggregate(F.first("sum")).df
    assert len(matrix.columns) == 1 + len(names)
    row = {r["name"]: r for r in matrix.collect()}
    assert row["Bob"]["Alice"] == 8 and row["Mark"]["Mark"] == 8


def test_pivot_with_index_transform(pivot_kv):
    # `pivot with index transform`: groupBy key mapped "_$it"
    pre = KDataFrame(pivot_kv.df.withColumn("name", F.concat(F.lit("_"), "name")))
    res = pre.group_by("name").pivot("key").aggregate(F.first("value")).df
    assert sorted(r["name"] for r in res.collect()) == ["_Alice", "_Bob", "_Mark"]


def test_pivot_with_two_index_columns(pivot_kv):
    # `pivot with two index columns`: pivot by the value's type name,
    # grouped by (name, key) — here a derived kind column
    pre = KDataFrame(
        pivot_kv.df.filter(F.col("value").isNotNull()).withColumn(
            "kind",
            F.when(F.col("value").rlike("^[0-9]+$"), "Int").otherwise("String"),
        )
    )
    res = pre.group_by("name", "key").pivot("kind").values("value").df
    assert set(res.columns) == {"name", "key", "Int", "String"}
    row = {(r["name"], r["key"]): r for r in res.collect()}
    assert row[("Alice", "age")]["Int"] == ["15", "55"]
    assert row[("Alice", "city")]["String"] == ["London"]
    assert row[("Alice", "city")]["Int"] == []


def test_pivot_without_index(pivot_kv):
    # `pivot one value without index` / `pivot plain`: zero-key groupBy —
    # one global row, a column per pivot value
    res = pivot_kv.group_by().pivot("name").aggregate(F.count(F.lit(1))).df
    assert sorted(res.columns) == ["Alice", "Bob", "Mark"]
    assert res.count() == 1
    r = res.collect()[0]
    assert (r["Alice"], r["Bob"], r["Mark"]) == (4, 2, 3)


def test_pivot_two_values_without_index(pivot_kv):
    # `pivot two values without index group by value`: zero-key pivot of
    # two aggregates, nested by aggregate name (separate=true)
    res = pivot_kv.group_by().pivot("name").aggregate(
        F.sort_array(F.collect_list("key")).alias("key"),
        F.sort_array(F.collect_list("value")).alias("value"),
        nested=True,
        group_by_value=True,
    ).df
    assert sorted(res.columns) == ["key", "value"]
    r = res.collect()[0]
    assert len(r["key"]["Alice"]) == 4
    assert r["value"]["Bob"] == ["45", "87"]


def test_pivot_rename_with_default(spark):
    # root PivotTests.kt `pivot with rename`: values{ c default '?' into
    # "d" and (c into "e") } — per-alias default fills only "d"
    df = KDataFrame(
        spark.createDataFrame(
            [(0, "q", "x"), (1, "q", "y"), (1, "w", "z")], "a int, b string, c string"
        )
    )
    res = df.group_by("a").pivot("b").aggregate(
        F.first("c").alias("d"),
        F.first("c").alias("e"),
        default={"d": "?"},
        nested=True,
    ).df
    rows = {r["a"]: r for r in res.collect()}
    assert rows[0]["w"]["d"] == "?" and rows[0]["w"]["e"] is None
    assert rows[1]["w"]["d"] == "z" and rows[1]["w"]["e"] == "z"
    assert rows[0]["q"]["d"] == "x"


def test_pivot_aggregate_with_default(spark):
    # root PivotTests.kt `pivot aggregate with default`: per-aggregate
    # defaults — first default '-', last default '?'
    df = KDataFrame(
        spark.createDataFrame(
            [(0, "q", "x"), (1, "q", "y"), (1, "w", "z")], "a int, b string, c string"
        )
    )
    res = df.group_by("a").pivot("b").aggregate(
        F.min("c").alias("first"),
        F.max("c").alias("last"),
        default={"first": "-", "last": "?"},
        nested=True,
    ).df
    rows = {r["a"]: r for r in res.collect()}
    assert rows[0]["w"]["first"] == "-" and rows[0]["w"]["last"] == "?"
    assert rows[1]["w"]["first"] == "z"


# --- nested grouping (DataFrameTreeTests) ---


def test_tree_group_by_nested_key(person):
    # DataFrameTreeTests `groupBy`: groupBy{nameAndCity.name}.max{age} ==
    # flat groupBy{name}.max{age}
    nested = person.group_cols(["name", "city"], into="nameAndCity")
    res = nested.group_by(F.col("nameAndCity.name").alias("name")).aggregate(
        F.max("age").alias("age")
    )
    flat = person.group_by("name").aggregate(F.max("age").alias("age"))
    assert sorted(tuple(r) for r in res.df.collect()) == sorted(
        tuple(r) for r in flat.df.collect()
    )


# --- frame-level means (AnimalsTests / BasicMathTests edge) ---


def test_mean_of_empty_is_nan(animals):
    # `mean of empty`: all-NaN doubles -> NaN; all-null ints -> NaN
    # (engine recipe: coalesce the avg with a NaN literal — Spark's avg
    # of all-null is null, the reference's is NaN)
    cleared = animals.df.withColumn("age", F.lit(float("nan"))).withColumn(
        "visits", F.lit(None).cast("int")
    )
    r = cleared.agg(
        F.avg("age").alias("age"),
        F.coalesce(F.avg("visits"), F.lit(float("nan"))).alias("visits"),
    ).collect()[0]
    assert math.isnan(r["age"]) and math.isnan(r["visits"])


# --- explode with empty/null collections (DataFrameTreeTests) ---


def test_explode_keeps_empty_and_null_collections(spark):
    # `explodeFrameColumnWithNulls`: explode(dropEmpty=false) keeps one
    # null row for a null or empty collection — nrow = sum(max(size,1))
    df = KDataFrame(
        spark.createDataFrame(
            [
                (1, [{"q": 1}, {"q": 2}]),
                (2, None),
                (3, []),
                (4, [{"q": 9}]),
            ],
            "id int, grp array<struct<q:int>>",
        )
    )
    res = df.explode("grp", outer=True)
    assert res.nrow() == 2 + 1 + 1 + 1
    kept = {r["id"] for r in res.df.filter(F.col("grp").isNull()).collect()}
    assert kept == {2, 3}
    # dropEmpty=true (plain explode) drops them
    assert df.explode("grp").nrow() == 3


# --- io edge shapes (io/CsvTests, io/ReadTests) ---


def test_csv_read_lines_zero(spark, tmp_path):
    # `read first rows`: readLines=0 -> header only, 0 rows
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    df = read_csv(spark, str(p), read_lines=0)
    assert df.columns == ["a", "b"]
    assert df.count() == 0
    assert read_csv(spark, str(p), read_lines=10).count() == 2


def test_read_json_nulls(spark):
    # `readJsonNulls`: a all-null (nullable), b dense
    df = read_json_str(spark, '[{"a":null, "b":1},{"a":null, "b":2}]')
    assert df.count() == 2
    assert all(r["a"] is None for r in df.collect())
    assert [r["b"] for r in df.orderBy("b").collect()] == [1, 2]


def test_json_array_of_arrays(spark):
    # `array of arrays`: values[0][1][1] == 5
    df = read_json_str(spark, '{"values": [[1,2,3],[4,5,6],[7,8,9]]}')
    v = df.collect()[0]["values"]
    assert v[1][1] == 5


# --- rendering (person/RenderingTests, rendering/RenderingTests) ---


def test_row_to_string(person):
    # `row to string`: "{ name:Alice, age:15, city:London, weight:54 }"
    alice = person.df.filter((F.col("name") == "Alice") & (F.col("age") == 15)).collect()[0]
    assert row_to_string(alice) == "{ name:Alice, age:15, city:London, weight:54 }"
    # nulls render as "null" (Kotlin toString)
    mark = person.df.filter((F.col("name") == "Mark") & (F.col("age") == 20)).collect()[0]
    assert row_to_string(mark) == "{ name:Mark, age:20, city:Moscow, weight:null }"


def test_render_truncates_long_unicode_cells(spark):
    # `render row with unicode values as table`: long multi-line unicode
    # cell renders truncated with "...", newlines flattened
    value = "Шёл Шива по шоссе, сокрушая сущее.\nА на встречу Саша шла, круглое сосущая"
    df = spark.createDataFrame([(value,)], "col string")
    rendered = to_string(df, max_cell=40)
    assert "Шива" in rendered
    body = rendered.splitlines()[-1]
    assert "..." in body
    assert "Саша" not in body
