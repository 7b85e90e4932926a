from dataframe_kotlin_spark.core.frame import KDataFrame
from dataframe_kotlin_spark.core.grouped import KGroupedFrame, KPivotClause

__all__ = ["KDataFrame", "KGroupedFrame", "KPivotClause"]
