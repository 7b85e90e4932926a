from dataframe_kotlin_spark.sources.csv import read_csv, read_delim_str, read_tsv, write_csv
from dataframe_kotlin_spark.sources.json import read_json, write_json
from dataframe_kotlin_spark.sources.guess import read
from dataframe_kotlin_spark.sources.layout import (
    morton_code,
    write_bucketed,
    write_hive_partitioned,
    write_sorted,
    write_zordered,
)
from dataframe_kotlin_spark.sources.robust import (
    read_orc,
    write_orc,
    read_csv_robust,
    read_json_robust,
    read_csv_split,
    read_json_split,
    split_good_bad,
)
from dataframe_kotlin_spark.sources.build import (
    dataframe_of,
    dataframe_of_fill,
    from_map,
    from_objects,
    from_rows,
    to_objects,
    append_rows,
    to_map,
)
from dataframe_kotlin_spark.sources.render import to_html, to_string
from dataframe_kotlin_spark.sources.formatting import (
    FormattedFrame,
    FormattingDSL,
    RGBColor,
    format_frame,
)

__all__ = [
    "read_csv",
    "read_delim_str",
    "read_tsv",
    "write_csv",
    "read_json",
    "write_json",
    "read",
    "dataframe_of",
    "dataframe_of_fill",
    "from_objects",
    "to_objects",
    "to_html",
    "to_string",
    "format_frame",
    "FormattedFrame",
    "FormattingDSL",
    "RGBColor",
    "from_map",
    "from_rows",
    "append_rows",
    "to_map",
    "read_orc",
    "write_orc",
    "read_csv_robust",
    "read_json_robust",
    "read_csv_split",
    "read_json_split",
    "split_good_bad",
    "write_bucketed",
    "write_sorted",
    "write_hive_partitioned",
    "write_zordered",
    "morton_code",
]
