"""Query registry: every implemented operator from SURVEY.md §2 gets a
named (spark_callable, oracle_sql) pair here. ``__spark_entry__.py``
re-exports this registry to the driver.

Each spark callable has signature (spark, sf_dir) -> DataFrame and goes
through the KDataFrame engine API where the operator exists there, so the
registry doubles as an integration test of the engine surface.

Column-name contract: every computed/aggregate column is aliased
identically in the Spark plan and the oracle SQL (driver hashes values
with columns sorted by name). Floating aggregates are rounded in BOTH to
make the hash deterministic across engines (fp summation order differs).
"""

from __future__ import annotations

from typing import Callable

_SPARK: dict[str, Callable] = {}
_ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; oracle=None -> driver does a rows-only check."""

    def deco(fn):
        _SPARK[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


def spark_queries() -> dict[str, Callable]:
    _load_all()
    return dict(_SPARK)


def oracle_queries() -> dict[str, str]:
    _load_all()
    return dict(_ORACLE)


_LOADED = False


def _load_all():
    global _LOADED
    if _LOADED:
        return
    # import for registration side effects
    from dataframe_kotlin_spark.queries import (  # noqa: F401
        approx,
        core,
        joins,
        pipeline,
        reshape,
        tpch_extra,
        windowed,
    )

    _LOADED = True
