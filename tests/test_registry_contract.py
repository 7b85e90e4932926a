"""Registry-wide output contract lint.

The driver's correctness gate canonicalizes results with a raw pandas
``sort_values`` over result cells; Python list/dict cells are unhashable
there, so ANY ArrayType/MapType/StructType output column records an
``err`` at the gate — indistinguishable from a broken operator (this
exact failure produced 3 err rows in round 4: merge_rows_lists,
inverted_index, quantize_embeddings_int8). Queries that logically
produce collections must serialize them to delimited strings on BOTH
engines (Spark ``array_join`` / DuckDB ``array_to_string``).

This lint walks every ``queries()`` entry's output schema and fails on
any complex-typed column, so the bug class cannot recur.
"""

from pyspark.sql.types import ArrayType, MapType, StructType

from dataframe_kotlin_spark.queries import oracle_queries, spark_queries

SF = "/root/testdata/sf0.001"


def test_no_complex_typed_output_columns(spark):
    offenders = []
    for name, fn in spark_queries().items():
        df = fn(spark, SF)
        bad = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders.append(f"{name} -> {bad}")
    assert not offenders, (
        "complex-typed output columns crash the driver gate's canonicalizer; "
        "serialize them (array_join / array_to_string) in BOTH the Spark "
        "query and its oracle SQL: " + "; ".join(offenders)
    )


def test_no_complex_typed_oracle_cells():
    """Mirror lint for the DuckDB side: a LIST/STRUCT/MAP cell coming out
    of the ORACLE sql crashes the driver's canonicalizer exactly like a
    Spark ArrayType output (pandas ``sort_values`` on unhashable cells),
    so both engines must serialize collections. Runs every oracle at
    sf0.001 — DuckDB-only, seconds total."""
    import duckdb
    import numpy as np

    from dataframe_kotlin_spark.session import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    offenders = []
    for name, sql in oracle_queries().items():
        df = con.sql(sql).df()
        for c in df.columns:
            col = df[c]
            if col.dtype == object and col.map(
                lambda v: isinstance(v, (list, tuple, dict, np.ndarray))
            ).any():
                offenders.append(f"{name}.{c}")
    assert not offenders, (
        "oracle SQL returns collection-typed cells that crash the driver "
        "gate's canonicalizer; serialize with array_to_string/list_sort on "
        "the DuckDB side too: " + "; ".join(offenders)
    )


def test_priority_window_is_valid():
    """The first 50 registry names are the driver's gate window: they must
    all exist, be unique, and each carry an oracle (no rows-only entries
    burning a window slot)."""
    from dataframe_kotlin_spark.queries import _PRIORITY

    names = set(spark_queries())
    oracle = oracle_queries()
    assert len(_PRIORITY) == 50
    assert len(set(_PRIORITY)) == 50
    assert not [n for n in _PRIORITY if n not in names]
    assert not [n for n in _PRIORITY if n not in oracle]
