"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship TPC-H-Q1-shape query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator registry from
``dataframe_kotlin_spark.queries`` (one entry per implemented operator
from SURVEY.md §2 plus the §7-P6 pipeline extensions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    from dataframe_kotlin_spark.queries import spark_queries

    return spark_queries()["q1_pricing_summary"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dataframe_kotlin_spark.queries import spark_queries

    return spark_queries()


def oracle_sql() -> dict[str, str]:
    from dataframe_kotlin_spark.queries import oracle_queries

    return oracle_queries()
