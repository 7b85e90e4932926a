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
