"""Pivot / gather / explode / split / merge queries (SURVEY §2.6, §2.9)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dataframe_kotlin_spark.core.frame import KDataFrame
from dataframe_kotlin_spark.queries import query


def _t(spark, sf_dir: str, name: str) -> KDataFrame:
    if name == "events":
        from dataframe_kotlin_spark.session import load_events

        return KDataFrame(load_events(spark, sf_dir))
    return KDataFrame(spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet")))


@query(
    "pivot_counts",
    oracle="""
    SELECT l_returnflag,
           CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END), 0) AS BIGINT) AS F,
           CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END), 0) AS BIGINT) AS O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_counts(spark, sf_dir):
    """pivot(col).count() with explicit sorted value list for deterministic
    column order + default fill (api/pivot.kt:27-56, countBy docs
    reference.md:1149-1161)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.group_by("l_returnflag").pivot("l_linestatus", ["F", "O"]).count(default=0).df


@query(
    "pivot_null_bucket",
    oracle="""
    SELECT o_orderstatus,
           COUNT(CASE WHEN NULLIF(o_orderpriority, '1-URGENT') = '2-HIGH' THEN 1 END) AS "2-HIGH",
           COUNT(CASE WHEN NULLIF(o_orderpriority, '1-URGENT') = '3-MEDIUM' THEN 1 END) AS "3-MEDIUM",
           COUNT(CASE WHEN NULLIF(o_orderpriority, '1-URGENT') = '4-NOT SPECIFIED' THEN 1 END) AS "4-NOT SPECIFIED",
           COUNT(CASE WHEN NULLIF(o_orderpriority, '1-URGENT') = '5-LOW' THEN 1 END) AS "5-LOW",
           COUNT(CASE WHEN NULLIF(o_orderpriority, '1-URGENT') IS NULL THEN 1 END) AS "null"
    FROM orders GROUP BY o_orderstatus
    """,
)
def pivot_null_bucket(spark, sf_dir):
    """NULL pivot keys land in a "null"-named column — the reference's
    toString naming (person/DataFrameTests.kt:938 `pivot matches`
    asserts pivoted[row]["null"]; round-5 parity fix). Nulls are
    synthesized with NULLIF since the test tables ship fully non-null;
    single pivot pass, two-phase count aggregate."""
    o = _t(spark, sf_dir, "orders")
    prio = KDataFrame(
        o.df.withColumn(
            "prio", F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
        )
    )
    return (
        prio.group_by("o_orderstatus").pivot("prio").count(default=0).df
    )


@query(
    "pivot_sum_segments",
    oracle="""
    SELECT c_nationkey,
           ROUND(COALESCE(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN c_acctbal END), 0), 2) AS AUTOMOBILE,
           ROUND(COALESCE(SUM(CASE WHEN c_mktsegment = 'BUILDING'   THEN c_acctbal END), 0), 2) AS BUILDING,
           ROUND(COALESCE(SUM(CASE WHEN c_mktsegment = 'FURNITURE'  THEN c_acctbal END), 0), 2) AS FURNITURE,
           ROUND(COALESCE(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN c_acctbal END), 0), 2) AS HOUSEHOLD,
           ROUND(COALESCE(SUM(CASE WHEN c_mktsegment = 'MACHINERY'  THEN c_acctbal END), 0), 2) AS MACHINERY
    FROM customer GROUP BY c_nationkey
    """,
)
def pivot_sum_segments(spark, sf_dir):
    """pivot with value aggregation + default (PivotAggregations.kt:24-94).
    Explicit value list -> single-pass pivot, no distinct-scan job."""
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    c = _t(spark, sf_dir, "customer")
    out = c.group_by("c_nationkey").pivot("c_mktsegment", segs).aggregate(F.sum("c_acctbal"))
    fixed = [F.round(F.coalesce(F.col(f"`{s}`"), F.lit(0.0)), 2).alias(s) for s in segs]
    return out.df.select("c_nationkey", *fixed)


@query(
    "pivot_matches",
    oracle="""
    SELECT n_nationkey,
           CASE WHEN SUM(CASE WHEN c_mktsegment = 'BUILDING'  THEN 1 ELSE 0 END) > 0 THEN TRUE ELSE FALSE END AS has_building,
           CASE WHEN SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) > 0 THEN TRUE ELSE FALSE END AS has_machinery
    FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
)
def pivot_matches(spark, sf_dir):
    """pivot.matches() boolean presence matrix
    (GroupedPivotAggregations.kt:36-37)."""
    n = _t(spark, sf_dir, "nation").select(F.col("n_nationkey"))
    c = _t(spark, sf_dir, "customer").rename({"c_nationkey": "n_nationkey"})
    joined = n.left_join(c, on=["n_nationkey"])
    return (
        joined.group_by("n_nationkey")
        .aggregate(
            (F.sum(F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)) > 0).alias("has_building"),
            (F.sum(F.when(F.col("c_mktsegment") == "MACHINERY", 1).otherwise(0)) > 0).alias("has_machinery"),
        )
        .df
    )


@query(
    "gather_melt",
    oracle="""
    SELECT l_returnflag, metric, ROUND(val, 2) AS val FROM (
      SELECT l_returnflag, 'qty' AS metric, SUM(l_quantity) AS val FROM lineitem GROUP BY l_returnflag
      UNION ALL
      SELECT l_returnflag, 'tax' AS metric, SUM(l_tax) AS val FROM lineitem GROUP BY l_returnflag
      UNION ALL
      SELECT l_returnflag, 'disc' AS metric, SUM(l_discount) AS val FROM lineitem GROUP BY l_returnflag
    )
    """,
)
def gather_melt(spark, sf_dir):
    """gather (wide->long unpivot, api/gather.kt:13-117) over an aggregated
    wide frame, via Spark's native melt."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.group_by("l_returnflag").aggregate(
        F.sum("l_quantity").alias("qty"),
        F.sum("l_tax").alias("tax"),
        F.sum("l_discount").alias("disc"),
    )
    return (
        wide.gather(["qty", "tax", "disc"], key_name="metric", value_name="val")
        .add("val", F.round(F.col("val"), 2))
        .df
    )


@query(
    "explode_embeddings",
    oracle="""
    SELECT vec_id, label, ROUND(CAST(u.val AS DOUBLE), 6) AS component
    FROM (SELECT vec_id, label, UNNEST(embedding) AS val FROM embeddings
          WHERE vec_id % 20 = 0) u
    """,
)
def explode_embeddings(spark, sf_dir):
    """explode of an array column (api/explode.kt:23-108). Multiset compare
    makes position irrelevant; values rounded as double on both sides."""
    e = _t(spark, sf_dir, "embeddings")
    return (
        e.filter(F.col("vec_id") % 20 == 0)
        .select("vec_id", "label", F.col("embedding").alias("component"))
        .explode("component")
        .add("component", F.round(F.col("component").cast("double"), 6))
        .df
    )


@query(
    "split_tokens",
    oracle="""
    SELECT doc_id,
           SPLIT_PART(text, ' ', 1) AS tok1,
           SPLIT_PART(text, ' ', 2) AS tok2,
           LEN(STRING_SPLIT(text, ' ')) AS n_tokens
    FROM documents
    """,
)
def split_tokens(spark, sf_dir):
    """split(col).by(' ').into(...) horizontal split (api/split.kt:11-114)
    + token count."""
    d = _t(spark, sf_dir, "documents")
    parts = F.split(F.col("text"), " ")
    return (
        d.add("tok1", parts.getItem(0))
        .add("tok2", parts.getItem(1))
        .add("n_tokens", F.size(parts).cast("bigint"))
        .select("doc_id", "tok1", "tok2", "n_tokens")
        .df
    )


@query(
    "split_into_rows",
    oracle="""
    SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS word
    FROM documents WHERE doc_id % 25 = 0
    """,
)
def split_into_rows(spark, sf_dir):
    """split(...).intoRows() = explode(split(...)) (api/split.kt:116)."""
    d = _t(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") % 25 == 0).select("doc_id", F.col("text").alias("word")).df.withColumn(
        "word", F.explode(F.split(F.col("word"), " "))
    )


@query(
    "merge_cols_concat",
    oracle="""
    SELECT s_suppkey,
           CONCAT_WS('|', s_name, CAST(s_nationkey AS VARCHAR)) AS supplier_tag
    FROM supplier
    """,
)
def merge_cols_concat(spark, sf_dir):
    """merge(cols).by(sep).into(name) -> concat_ws (api/merge.kt:5-21)."""
    s = _t(spark, sf_dir, "supplier")
    return (
        s.add("nat", F.col("s_nationkey").cast("string"))
        .merge_cols(["s_name", "nat"], into="supplier_tag", sep="|")
        .select("s_suppkey", "supplier_tag")
        .df
    )


@query(
    "merge_rows_lists",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT CAST(o_orderkey % 97 AS BIGINT))), ',')
             AS key_mods
    FROM orders GROUP BY o_orderstatus, o_orderpriority
    """,
)
def merge_rows_lists(spark, sf_dir):
    """mergeRows: collapse a column into list cells per group, sorted for
    determinism (api/mergeRows.kt:13-33).

    The list cells are serialized to a ','-joined string for the gate:
    the driver's canonicalizer sorts raw pandas cells and cannot hash
    Python lists, so both sides emit the same delimited-string form
    (semantics unchanged — order and membership fully determined by
    sort_array over distinct values)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderstatus", "o_orderpriority", (F.col("o_orderkey") % 97).alias("key_mods"))
        .df.groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.array_join(
                F.sort_array(F.array_distinct(F.collect_list("key_mods"))), ","
            ).alias("key_mods")
        )
    )


@query(
    "struct_roundtrip",
    oracle="""
    SELECT o_orderkey, o_orderstatus AS status, ROUND(o_totalprice, 2) AS price
    FROM orders WHERE o_orderkey % 10 = 0
    """,
)
def struct_roundtrip(spark, sf_dir):
    """Column-tree ops: group(cols).into(struct) then ungroup + flatten back
    (api/group.kt:10-18, api/ungroup.kt:11-15, api/flatten.kt:9-31).
    Output is flat so the oracle sees the same relation."""
    o = _t(spark, sf_dir, "orders")
    nested = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.col("o_orderstatus").alias("status"),
            F.round("o_totalprice", 2).alias("price"),
        )
        .group_cols(["status", "price"], into="info")
    )
    assert "info" in nested.columns and len(nested.columns) == 2
    return nested.ungroup_col("info").df


@query(
    "flatten_nested",
    oracle="""
    SELECT o_orderkey, o_orderstatus AS meta_status, o_orderdate AS meta_date,
           ROUND(o_totalprice, 2) AS fin_price
    FROM orders WHERE o_orderstatus <> 'O'
    """,
)
def flatten_nested(spark, sf_dir):
    """flatten(sep) over a two-level struct tree (api/flatten.kt:9-31)."""
    o = _t(spark, sf_dir, "orders")
    nested = (
        o.filter(F.col("o_orderstatus") != "O")
        .select(
            "o_orderkey",
            F.struct(
                F.col("o_orderstatus").alias("status"),
                F.col("o_orderdate").alias("date"),
            ).alias("meta"),
            F.struct(F.round("o_totalprice", 2).alias("price")).alias("fin"),
        )
    )
    return nested.flatten(sep="_").df


@query(
    "json_props_extract",
    oracle="""
    SELECT event_id, CAST(props->>'$.k' AS INT) AS k_val
    FROM events WHERE event_type = 'purchase'
    """,
)
def json_props_extract(spark, sf_dir):
    """JSON column normalization (reference readJson nested-object handling,
    io/json.kt:27-131) -> JSON path extraction on a string column."""
    e = _t(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type") == "purchase")
        .add("k_val", F.get_json_object(F.col("props"), "$.k").cast("int"))
        .select("event_id", "k_val")
        .df
    )


@query(
    "pivot_multi_agg",
    oracle="""
    SELECT o_orderstatus,
           COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS urgent_n,
           ROUND(COALESCE(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END), 0), 2) AS urgent_total,
           COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS low_n,
           ROUND(COALESCE(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END), 0), 2) AS low_total
    FROM orders GROUP BY o_orderstatus
    """,
)
def pivot_multi_agg(spark, sf_dir):
    """Multi-aggregate pivot: the reference nests multiple stats under
    each pivot value as column groups (GroupedPivotAggregations.kt:20-129,
    groupByValue layout); the relational layout is {value}_{agg} flat
    columns (SURVEY §2.6 flatten-with-separator parity). Single pivot
    pass, both aggs in one Expand-free aggregation."""
    o = _t(spark, sf_dir, "orders")
    out = (
        o.group_by("o_orderstatus")
        .pivot("o_orderpriority", ["1-URGENT", "5-LOW"])
        .aggregate(
            F.count(F.lit(1)).alias("n"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total"),
        )
    )
    return out.df.select(
        "o_orderstatus",
        F.col("`1-URGENT_n`").alias("urgent_n"),
        F.col("`1-URGENT_total`").alias("urgent_total"),
        F.col("`5-LOW_n`").alias("low_n"),
        F.col("`5-LOW_total`").alias("low_total"),
    )


@query(
    "gather_lists",
    oracle="""
    SELECT p_partkey, 'name_words' AS src, unnest(string_split(p_name, ' ')) AS word
    FROM part
    UNION ALL
    SELECT p_partkey, 'type_words' AS src, unnest(string_split(p_type, ' ')) AS word
    FROM part
    """,
)
def gather_lists(spark, sf_dir):
    """gather over list-valued (Many) cells re-explodes to one row per
    element with the source column as the key (api/gather.kt:70-71
    `.explode(valuesColumn)`; round-4 addition). Map-only: melt +
    explode, no shuffle."""
    p = _t(spark, sf_dir, "part").df.select(
        "p_partkey",
        F.split("p_name", " ").alias("name_words"),
        F.split("p_type", " ").alias("type_words"),
    )
    return KDataFrame(p).gather(
        ["name_words", "type_words"], key_name="src", value_name="word"
    ).df


@query(
    "gather_groups_contacts",
    oracle="""
    SELECT c_custkey, 'ident' AS grp, c_name AS name,
           CAST(NULL AS DOUBLE) AS bal, CAST(NULL AS VARCHAR) AS seg
    FROM customer
    UNION ALL
    SELECT c_custkey, 'account' AS grp, NULL AS name,
           CAST(c_acctbal AS DOUBLE) AS bal, c_mktsegment AS seg
    FROM customer
    """,
)
def gather_groups_contacts(spark, sf_dir):
    """Struct-column gather (reference ColumnGroup gather,
    api/gather.kt:104-108 + GatherTests.gather; round-4 addition):
    key = group name, fields union across groups, missing fields null.
    Map-only stack of schema-normalized structs — no shuffle."""
    c = _t(spark, sf_dir, "customer").df.select(
        "c_custkey",
        F.struct(F.col("c_name").alias("name")).alias("ident"),
        F.struct(
            F.col("c_acctbal").cast("double").alias("bal"),
            F.col("c_mktsegment").alias("seg"),
        ).alias("account"),
    )
    return KDataFrame(c).gather_groups(["ident", "account"], key_name="grp").df


@query(
    "merge_null_render",
    oracle="""
    SELECT o_orderkey,
           CONCAT_WS(', ', o_orderstatus,
                     COALESCE(CAST(NULLIF(o_orderpriority, '1-URGENT') AS VARCHAR),
                              'null')) AS tag
    FROM orders
    """,
)
def merge_null_render(spark, sf_dir):
    """merge.by(sep) is Kotlin joinToString (api/merge.kt:18): a NULL
    part renders as the literal "null" instead of being dropped
    (DataFrameTests.kt:1089 joinColsToString expects "20, Moscow, null"
    — the round-6 parity fix in merge_cols). Nulls are synthesized with
    NULLIF since the test tables ship fully non-null. Map-only."""
    o = _t(spark, sf_dir, "orders")
    return (
        KDataFrame(
            o.df.withColumn(
                "prio_n", F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
            )
        )
        .merge_cols(["o_orderstatus", "prio_n"], into="tag", sep=", ")
        .select("o_orderkey", "tag")
        .df
    )


@query(
    "split_generated_names",
    oracle="""
    SELECT p_partkey,
           STRING_SPLIT(p_name, ' ')[1] AS color,
           STRING_SPLIT(p_name, ' ')[2] AS splitted1
    FROM part
    """,
)
def split_generated_names(spark, sf_dir):
    """split(col).into("name") with the reference's overflow name
    generator: explicit names first, the remainder named splitted{i}
    (api/split.kt:60 nameGenerator; DataFrameTests.kt:1134
    splitStringColWithDefaultgenerator — the round-6 split_col
    extend/generator parity). p_name is always "<color> <noun>", so the
    generated width is deterministic. Map-only plus the one
    metadata-sized max(size) width job."""
    p = _t(spark, sf_dir, "part")
    return (
        p.select("p_partkey", "p_name")
        .split_col("p_name", " ", into=["color"], extend=True)
        .df
    )
