"""String-dispatch parameter guards (VERDICT r8 item 7).

Every user-facing string-dispatch parameter must fail loudly on a typo
instead of silently falling through to a default branch. The method=
sites gained `_check_method` in r8 (tests/test_ann_ivf.py,
tests/test_centroid_frame.py pin those); this file pins the remaining
dispatch sites: asof_join's `direction`, add_scan's `op`, and the
`how=` sites that delegate validation to Spark's own join-type check
(documented here so a future refactor that stops delegating knows a
guard is load-bearing).
"""

import pytest
from pyspark.sql import functions as F

from dataframe_kotlin_spark.core.frame import KDataFrame
from dataframe_kotlin_spark.operators import temporal


def test_asof_join_rejects_unknown_direction(spark):
    left = spark.createDataFrame([(1, 10)], "k int, ts int")
    right = spark.createDataFrame([(1, 9, 1.0)], "k int, ts int, v double")
    with pytest.raises(ValueError, match="direction"):
        temporal.asof_join(
            left, right, ["k"], "ts", "ts", ["v"], direction="backwards"
        )


def test_add_scan_rejects_non_associative_op(spark):
    kdf = KDataFrame(spark.createDataFrame([(1, 2.0)], "i int, x double"))
    with pytest.raises(ValueError, match="sum/product/min/max"):
        kdf.add_scan("y", "x", "median", order_by=["i"])


def test_join_how_typo_fails_loudly(spark):
    # `how` goes through the _JOIN_TYPES alias table; an unknown string
    # used to surface as a bare KeyError — now a ValueError naming the
    # valid set, consistent with the method=/direction= guards.
    a = KDataFrame(spark.createDataFrame([(1, "x")], "k int, a string"))
    b = KDataFrame(spark.createDataFrame([(1, "y")], "k int, b string"))
    with pytest.raises(ValueError, match="how must be one of"):
        a.join(b, how="innerr")


def test_join_cross_rejected_with_pointer(spark):
    # VERDICT r10 item 8: 'cross' is not a keyed join — the error names
    # the two real alternatives (zip_frames / raw crossJoin) instead of
    # listing it among the unknown-alias typos.
    a = KDataFrame(spark.createDataFrame([(1, "x")], "k int, a string"))
    b = KDataFrame(spark.createDataFrame([(1, "y")], "k int, b string"))
    with pytest.raises(ValueError, match="zip_frames"):
        a.join(b, how="cross")


def test_interval_join_how_typo_fails_loudly(spark):
    ev = spark.createDataFrame([(1, 5)], "k int, ts int")
    iv = spark.createDataFrame([(1, 0, 10, "w")], "k int, lo int, hi int, tag string")
    with pytest.raises(ValueError, match="inner-only"):
        temporal.interval_join(
            ev, iv, "ts", "lo", "hi", 10, keys=["k"], how="lefty"
        )


def test_join_spark_canonical_names_pass_through(spark):
    # ADVICE r9: 'left_outer' / 'left_semi' are legitimate Spark names;
    # the alias table now accepts them instead of rejecting with a
    # message that only listed the short aliases.
    a = KDataFrame(spark.createDataFrame([(1, "x"), (2, "y")], "k int, a string"))
    b = KDataFrame(spark.createDataFrame([(1, "z")], "k int, b string"))
    assert a.join(b, how="left_outer").df.count() == 2
    assert a.join(b, how="left_semi").df.columns == ["k", "a"]
    assert a.join(b, how="left_anti").df.count() == 1
    assert a.join(b, how="full_outer").df.count() == 2
