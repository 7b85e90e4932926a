from dataframe_kotlin_spark.sources.csv import read_csv, read_tsv, write_csv
from dataframe_kotlin_spark.sources.json import read_json, write_json
from dataframe_kotlin_spark.sources.guess import read
from dataframe_kotlin_spark.sources.build import (
    dataframe_of,
    from_map,
    from_rows,
    append_rows,
    to_map,
)

__all__ = [
    "read_csv",
    "read_tsv",
    "write_csv",
    "read_json",
    "write_json",
    "read",
    "dataframe_of",
    "from_map",
    "from_rows",
    "append_rows",
    "to_map",
]
