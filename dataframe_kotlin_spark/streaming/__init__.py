from dataframe_kotlin_spark.streaming.windows import tumbling_agg, sliding_agg, sessionize

__all__ = ["tumbling_agg", "sliding_agg", "sessionize"]
