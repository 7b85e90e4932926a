"""dataframe_kotlin_spark — a PySpark-native analytics engine with the
operator surface of GangCheng0619/dataframe_kotlin (a Kotlin DataFrame
library fork; see SURVEY.md).

The reference is an eager single-process columnar dataframe library; this
engine re-expresses every operator as a *lazy* Spark logical plan so
Catalyst/Tungsten/AQE pick the physical strategy, which is what makes the
same API hold at 100 TB on a real cluster.

Entry points:
    from dataframe_kotlin_spark import KDataFrame, get_spark
    kdf = KDataFrame(spark.read.parquet(...))
"""

from dataframe_kotlin_spark.core.frame import KDataFrame
from dataframe_kotlin_spark.session import get_spark, load_tables

__all__ = ["KDataFrame", "get_spark", "load_tables"]
__version__ = "0.1.0"
