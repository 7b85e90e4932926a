"""Shared Spark session + reference fixtures (FIXTURES.md).

The person/person2/animals/weather frames are the reference's canonical
test fixtures (BaseTest.kt:11-19, JoinTests.kt:11-19, AnimalsTests.kt:8-14,
SeriesTests.kt:10-23) — kept verbatim since the reference's tests assert
exact values against them.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T

from dataframe_kotlin_spark import KDataFrame
from dataframe_kotlin_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # small local parallelism: tiny fixture frames, fewer/faster tasks
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark(
        "tests",
        extra_conf={
            "spark.sql.shuffle.partitions": "4",
            "spark.default.parallelism": "4",
        },
    )
    yield s


PERSON_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("age", T.IntegerType(), False),
        T.StructField("city", T.StringType(), True),
        T.StructField("weight", T.IntegerType(), True),
    ]
)

PERSON_ROWS = [
    ("Alice", 15, "London", 54),
    ("Bob", 45, "Dubai", 87),
    ("Mark", 20, "Moscow", None),
    ("Mark", 40, "Milan", None),
    ("Bob", 30, "Tokyo", 68),
    ("Alice", 20, None, 55),
    ("Mark", 30, "Moscow", 90),
]


@pytest.fixture(scope="session")
def person(spark):
    return KDataFrame(spark.createDataFrame(PERSON_ROWS, PERSON_SCHEMA))


PERSON2_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("origin", T.StringType(), True),
        T.StructField("grade", T.IntegerType(), False),
        T.StructField("age", T.StringType(), True),
    ]
)

PERSON2_ROWS = [
    ("Alice", "London", 3, "young"),
    ("Alice", "London", 5, "old"),
    ("Bob", "Tokyo", 4, "young"),
    ("Bob", "Paris", 5, "old"),
    ("Mark", "Moscow", 1, "young"),
    ("Mark", "Moscow", 2, "old"),
    ("Bob", "Paris", 4, None),
]


@pytest.fixture(scope="session")
def person2(spark):
    return KDataFrame(spark.createDataFrame(PERSON2_ROWS, PERSON2_SCHEMA))


ANIMALS_ROWS = [
    ("cat", 2.5, 1, "yes"),
    ("cat", 3.0, 3, "yes"),
    ("snake", 0.5, 2, "no"),
    ("dog", float("nan"), 3, "yes"),
    ("dog", 5.0, 2, "no"),
    ("cat", 2.0, 3, "no"),
    ("snake", 4.5, 1, "no"),
    ("cat", float("nan"), 1, "yes"),
    ("dog", 7.0, 2, "no"),
    ("dog", 3.0, 1, "no"),
]


@pytest.fixture(scope="session")
def animals(spark):
    return KDataFrame(
        spark.createDataFrame(ANIMALS_ROWS, "animal string, age double, visits int, priority string")
    )


WEATHER_ROWS = [
    (0, "Moscow", 1, 14),
    (1, "London", 1, 10),
    (2, "Moscow", 3, 18),
    (3, "London", 3, 16),
    (4, "Moscow", 6, 16),
    (5, "London", 6, 23),
    (6, "Moscow", 4, 13),
    (7, "London", 4, 22),
    (8, "Moscow", 2, 20),
    (9, "London", 2, 15),
    (10, "Moscow", 5, 10),
    (11, "London", 5, 18),
]


@pytest.fixture(scope="session")
def weather(spark):
    return KDataFrame(
        spark.createDataFrame(WEATHER_ROWS, "row_id int, city string, day int, temp int")
    )


def rows(kdf, *cols, order_by=None):
    """Collect to a sorted list of tuples for exact assertions."""
    df = kdf.df if isinstance(kdf, KDataFrame) else kdf
    if cols:
        df = df.select(*cols)
    out = [tuple(r) for r in df.collect()]
    return sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t))
