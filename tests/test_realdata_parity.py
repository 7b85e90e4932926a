"""Real-data parity: the reference's withRealData/io tests over its own
data files (securities.csv pivot shape — Securities.kt:17-22; deeply
nested playlistItems.json / ghost.json — PlaylistJsonTest.kt,
io/ReadTests.kt:12). The files live in the reference checkout; tests
skip cleanly when it is absent so the repo stays standalone.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataframe_kotlin_spark import KDataFrame

DATA = "/root/reference/data"

needs_data = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference data checkout not present"
)


@needs_data
def test_securities_pivot_shape(spark):
    # Securities.kt:17-22: rename(id->rowId), pivot `columns`, values of
    # `data` -> 100 x 17
    from dataframe_kotlin_spark.sources.csv import read_csv

    df = KDataFrame(read_csv(spark, f"{DATA}/securities.csv"))
    res = (
        df.rename({"id": "rowId"})
        .group_by("rowId")
        .pivot("columns")
        .values("data")
    )
    assert res.df.count() == 100
    assert len(res.df.columns) == 17


@needs_data
def test_ghost_json_reads_nested(spark):
    # io/ReadTests.kt:12 `ghost`: the deeply nested blog export loads;
    # posts is an array of structs with stable inner fields
    from dataframe_kotlin_spark.sources.json import read_json

    df = read_json(spark, f"{DATA}/ghost.json")
    assert df.count() == 1
    posts_t = df.schema["posts"].dataType
    assert isinstance(posts_t, T.ArrayType) and isinstance(
        posts_t.elementType, T.StructType
    )
    posts = df.select(F.explode("posts").alias("p")).select("p.*")
    assert posts.count() >= 1
    assert {"id", "title", "html"} <= set(posts.columns)


@pytest.fixture()
def playlist_items(spark):
    if not os.path.isdir(DATA):
        pytest.skip("reference data checkout not present")
    from dataframe_kotlin_spark.sources.json import read_json

    df = read_json(spark, f"{DATA}/playlistItems.json")
    return KDataFrame(df.select(F.explode("items").alias("it")).select("it.*"))


def test_playlist_items_shape(playlist_items):
    # PlaylistJsonTest: 50 items with the snippet.thumbnails tree
    assert playlist_items.df.count() == 50
    snip = playlist_items.df.schema["snippet"].dataType
    assert isinstance(snip, T.StructType)
    thumbs = snip["thumbnails"].dataType
    assert isinstance(thumbs, T.StructType)
    assert {"default", "medium", "high", "standard"} <= set(thumbs.names)


def test_playlist_deep_update(playlist_items):
    # `deep update` (PlaylistJsonTest.kt:222): rewrite a 3-level nested
    # leaf in place — tree shape unchanged, values transformed
    up = playlist_items.update(
        "snippet.thumbnails.default.url",
        with_expr=F.upper(F.col("snippet.thumbnails.default.url")),
    )
    assert up.df.schema["snippet"].dataType.names == (
        playlist_items.df.schema["snippet"].dataType.names
    )
    vals = up.df.select(F.col("snippet.thumbnails.default.url").alias("u")).collect()
    assert all(r["u"] == r["u"].upper() for r in vals if r["u"] is not None)


def test_playlist_deep_batch_update(playlist_items):
    # `deep batch update` (:236): two nested leaves in one logical step
    up = playlist_items.update(
        "snippet.thumbnails.default.url",
        with_expr=F.upper(F.col("snippet.thumbnails.default.url")),
    ).update(
        "snippet.thumbnails.high.url",
        with_expr=F.upper(F.col("snippet.thumbnails.high.url")),
    )
    got = up.df.select(
        F.col("snippet.thumbnails.default.url").alias("d"),
        F.col("snippet.thumbnails.high.url").alias("h"),
    ).collect()
    for r in got:
        if r["d"] is not None:
            assert r["d"] == r["d"].upper()
        if r["h"] is not None:
            assert r["h"] == r["h"].upper()


def test_playlist_deep_remove(playlist_items):
    # `deep remove` (:262): drop nested fields at three depths — the
    # top-level etag, snippet.channelId, and two thumbnail groups
    before = playlist_items.df.schema
    n_thumb = len(before["snippet"].dataType["thumbnails"].dataType.names)
    rm = playlist_items.remove(
        "snippet.thumbnails.default",
        "snippet.thumbnails.maxres",
        "snippet.channelId",
        "etag",
    )
    after = rm.df.schema
    assert len(after.names) == len(before.names) - 1  # etag gone
    assert "channelId" not in after["snippet"].dataType.names
    thumbs = after["snippet"].dataType["thumbnails"].dataType.names
    assert len(thumbs) == n_thumb - 2
    assert "default" not in thumbs and "maxres" not in thumbs


def test_playlist_select_group(playlist_items):
    # `select group` (:255): selecting a nested group yields one struct
    # column; selecting its leaves yields three
    one = playlist_items.df.select(F.col("snippet.thumbnails.default"))
    assert len(one.columns) == 1
    leaves = playlist_items.df.select(F.col("snippet.thumbnails.default.*"))
    assert len(leaves.columns) == 3
