from dataframe_kotlin_spark.operators import dedup, similarity, textpipe, multimodal

__all__ = ["dedup", "similarity", "textpipe", "multimodal"]
