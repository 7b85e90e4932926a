"""Grouping, aggregation, and pivot (SURVEY §2.5, §2.6).

The reference materializes groups as a FrameColumn (api/groupBy.kt:19-56);
relationally we never do — ``KGroupedFrame`` holds (df, keys) lazily and
terminal aggregations compile straight to ``groupBy().agg(...)`` so Spark
runs partial aggregation before the shuffle. Groups only materialize as
values (collect_list of structs) when the program genuinely uses them as
data (``values()``, ``map_groups``).
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class KGroupedFrame:
    def __init__(self, df: DataFrame, keys: list[Column]):
        self.df = df
        self.keys = keys

    def _gdf(self):
        return self.df.groupBy(*self.keys)

    def _wrap(self, df: DataFrame):
        from dataframe_kotlin_spark.core.frame import KDataFrame

        return KDataFrame(df)

    # -- terminal aggregations -------------------------------------------
    def aggregate(self, *aggs: Column) -> "KDataFrame":
        """Multi-statistic named outputs: agg(expr.alias(name), ...).
        Reference DSL `stat into "name"`: api/aggregate.kt:14-43."""
        return self._wrap(self._gdf().agg(*aggs))

    agg = aggregate

    def count(self, pred: Column | None = None, name: str = "n") -> "KDataFrame":
        """Group size / conditional count (default 0).
        Reference: api/aggregation/GroupByAggregations.kt:30-31."""
        e = F.count(F.lit(1)) if pred is None else F.sum(F.when(pred, 1).otherwise(0))
        return self._wrap(self._gdf().agg(e.alias(name)))

    def sum_for(self, *cols: str) -> "KDataFrame":
        """Type-preserving sums. Reference: GroupByAggregations.kt:83-89."""
        return self._wrap(self._gdf().agg(*[F.sum(c).alias(c) for c in cols]))

    def mean_for(self, *cols: str) -> "KDataFrame":
        return self._wrap(self._gdf().agg(*[F.avg(c).alias(c) for c in cols]))

    def min_for(self, *cols: str) -> "KDataFrame":
        return self._wrap(self._gdf().agg(*[F.min(c).alias(c) for c in cols]))

    def max_for(self, *cols: str) -> "KDataFrame":
        return self._wrap(self._gdf().agg(*[F.max(c).alias(c) for c in cols]))

    def std_for(self, *cols: str) -> "KDataFrame":
        """Sample stddev. NOTE: the reference's std computes
        sqrt(sum((x-mean)^2)) *without* dividing by n-1 (api/std.kt:58-99,
        a bug); we implement standard stddev_samp (SURVEY §2.5 flag)."""
        return self._wrap(self._gdf().agg(*[F.stddev_samp(c).alias(c) for c in cols]))

    def median_for(self, *cols: str) -> "KDataFrame":
        """Exact median, even count -> mean of middles (matches reference
        api/median.kt:20-30). percentile() is exact in Spark."""
        return self._wrap(self._gdf().agg(*[F.percentile(F.col(c), F.lit(0.5)).alias(c) for c in cols]))

    def max_by(self, order_col: str | Column, tiebreak: str | Column | None = None) -> "KDataFrame":
        """Whole argmax row per group (reference minBy/maxBy,
        GroupByAggregations.kt:53-77). max_by(struct(*), key) keeps it a
        single partial-aggregatable pass — no window, no second shuffle.
        A tiebreak column makes the result deterministic."""
        return self._arg_extreme(order_col, tiebreak, descending=True)

    def min_by(self, order_col: str | Column, tiebreak: str | Column | None = None) -> "KDataFrame":
        return self._arg_extreme(order_col, tiebreak, descending=False)

    def _arg_extreme(self, order_col, tiebreak, descending: bool) -> "KDataFrame":
        oc = F.col(order_col) if isinstance(order_col, str) else order_col
        if tiebreak is not None:
            tb = F.col(tiebreak) if isinstance(tiebreak, str) else tiebreak
            # invert tiebreak under max so ties resolve to smallest tiebreak
            key = F.struct(oc.alias("k"), (-tb if descending else tb).alias("t"))
        else:
            key = oc
        fn = F.max_by if descending else F.min_by
        payload = F.struct(*[F.col(c) for c in self.df.columns])
        row = fn(payload, key).alias("__row__")
        out = self._gdf().agg(row).select("__row__.*")
        return self._wrap(out)

    def values(self, *cols: str, sort: bool = True) -> "KDataFrame":
        """Collect group values into lists. Reference:
        GroupByAggregations.kt:33-37. Sorted for determinism."""
        aggs = []
        for c in cols:
            e = F.collect_list(c)
            if sort:
                e = F.sort_array(e)
            aggs.append(e.alias(c))
        return self._wrap(self._gdf().agg(*aggs))

    def top_k(self, k: int, order_by: Sequence[Column], name: str = "rank") -> "KDataFrame":
        """Top-k rows per group via ranked window (single shuffle)."""
        from pyspark.sql import Window

        w = Window.partitionBy(*self.keys).orderBy(*order_by)
        return self._wrap(
            self.df.withColumn(name, F.row_number().over(w)).filter(F.col(name) <= k)
        )

    def map_groups(self, fn: Callable, schema) -> "KDataFrame":
        """Arbitrary frame->frame transform per group via applyInPandas
        (Arrow-batched). Reference mapGroups: GroupedDataFrame.kt:23."""
        return self._wrap(self._gdf().applyInPandas(fn, schema))

    def get_group(self, *values) -> "KDataFrame":
        """One group's rows by key value — full key or a PREFIX of it
        (reference grouped["Tokyo","Bob"] and partial grouped["Tokyo"],
        person/DataFrameTests.kt:361-373). Relationally this is a filter
        on the key expressions, so it stays a pushed-down scan predicate
        instead of materializing groups. A None matches a NULL key
        (eqNullSafe)."""
        if len(values) > len(self.keys):
            raise ValueError(
                f"{len(values)} key values given but the grouping has "
                f"only {len(self.keys)} keys"
            )
        pred = F.lit(True)
        for k, v in zip(self.keys, values):
            pred = pred & k.eqNullSafe(F.lit(v))
        return self._wrap(self.df.filter(pred))

    def pivot(
        self, pivot_col: str | Sequence[str], values: Sequence | None = None
    ) -> "KPivotClause":
        """Single- or multi-column pivot. The reference's two-column
        `pivot { name and key }` yields nested column groups
        (PivotTests.kt:161-184); relationally we flatten the combo to one
        `first_second` column per distinct pair — the separator-flatten
        parity documented in SURVEY §2.6."""
        return KPivotClause(self, pivot_col, values)

    # grouping-set extensions the reference lacks (SURVEY §2.5 last row)
    def cube(self, *aggs: Column) -> "KDataFrame":
        return self._wrap(self.df.cube(*self.keys).agg(*aggs))

    def rollup(self, *aggs: Column) -> "KDataFrame":
        return self._wrap(self.df.rollup(*self.keys).agg(*aggs))

    def grouping_sets(self, sets: Sequence[Sequence[str]], *aggs: Column) -> "KDataFrame":
        """Explicit GROUPING SETS (arbitrary subsets of the group keys,
        unlike cube/rollup's fixed lattices). One Expand pass — each input
        row is replicated once per set, then a single hash aggregate."""
        key_cols = [F.col(k) if isinstance(k, str) else k for k in self.keys]
        return self._wrap(
            self.df.groupingSets([[F.col(c) for c in s] for s in sets], *key_cols).agg(*aggs)
        )


class KPivotClause:
    """groupBy(idx).pivot(col).agg(...) with explicit sorted value list for
    deterministic column order (SURVEY §3.3). Reference: api/pivot.kt:27-56.
    """

    def __init__(
        self,
        grouped: KGroupedFrame,
        pivot_col: str | Sequence[str],
        values: Sequence | None,
    ):
        self.grouped = grouped
        self.multi = not isinstance(pivot_col, str)
        self.pivot_cols = list(pivot_col) if self.multi else [pivot_col]
        self.pivot_col = "__pivot__"
        self.pivot_values = values

    def _explicit_names(self, vals: Sequence) -> list[str]:
        """Render explicit pivot values EXACTLY as the stringified key
        column renders the data: cast each literal to the pivot
        column's own type, then to string. Python ``str()`` diverges
        (str(1) is "1" but a double column keys as "1.0"; str(1e20) is
        "1e+20" vs Spark's "1.0E20"; str(True) is "True" vs "true"),
        so a Python-rendered name can silently match nothing.

        Common (value, type) pairs render DRIVER-LOCALLY via
        ``core.litrender.render_literal`` — proven bit-identical to
        Spark's cast and property-tested against it — so explicit-value
        pivots on int/long/bool/double/date/timestamp/string keys
        launch ZERO extra jobs. Anything the local renderer can't prove
        (Decimal, float32, pre-1583 dates, out-of-range ints, doubles
        in Java 17's non-shortest-toString zone) falls back to one
        metadata-sized ``spark.range(1)`` job for just that remainder.

        Multi-column pivots take each value as a tuple/list of parts
        (one per pivot column); parts are escaped with the same
        backslash transform as discovery before the "_" concat. A plain
        STRING for a multi pivot is matched verbatim against the
        concatenated key (caller must pre-escape any "_" or "\\" inside
        parts themselves — pass a tuple to get that for free).
        """
        from dataframe_kotlin_spark.core.litrender import render_literal

        df = self.grouped.df
        dtypes = {f.name: f.dataType for f in df.schema.fields}

        def esc_py(s: str) -> str:
            return s.replace("\\", "\\\\").replace("_", "\\_")

        flat: list[tuple[object, str]] = []  # (value, column) pairs to render
        shapes: list[int] = []  # parts per explicit value; 0 = verbatim
        verbatim: dict[int, str] = {}
        for idx, v in enumerate(vals):
            if self.multi:
                if isinstance(v, str):
                    verbatim[idx] = v
                    shapes.append(0)
                    continue
                if not isinstance(v, (tuple, list)) or len(v) != len(self.pivot_cols):
                    raise ValueError(
                        f"multi-column pivot over {self.pivot_cols} takes explicit "
                        f"values as {len(self.pivot_cols)}-tuples (or a pre-joined "
                        f"string), got {v!r}"
                    )
                parts = list(v)
            else:
                parts = [v]
            shapes.append(len(parts))
            flat.extend(zip(parts, self.pivot_cols))
        spark = df.sparkSession
        rendered: list[str | None] = [
            "null" if pv is None else render_literal(pv, dtypes[pc], spark)
            for pv, pc in flat
        ]
        pending = [i for i, r in enumerate(rendered) if r is None]
        if pending:  # exotic remainder: one metadata-sized range(1) job
            exprs = [
                F.coalesce(
                    F.lit(flat[i][0]).cast(dtypes[flat[i][1]]).cast("string"),
                    F.lit("null"),
                ).alias(f"c{i}")
                for i in pending
            ]
            row = spark.range(1).select(*exprs).first()
            for i, v in zip(pending, row):
                rendered[i] = v
        names: list[str] = []
        pos = 0
        for idx, n in enumerate(shapes):
            if n == 0:
                names.append(verbatim[idx])
                continue
            parts = rendered[pos : pos + n]
            pos += n
            names.append("_".join(esc_py(p) for p in parts) if self.multi else parts[0])
        return names

    def _src(self):
        # The pivot ALWAYS runs over a stringified key column: the
        # reference names pivot columns via toString (DataFrameTests.kt
        # :938 `pivot matches` asserts a "null" column for the null
        # city), so a NULL key and the literal string "null" land in the
        # SAME column — reference toString parity, and it keeps output
        # names unique (a raw None pivot value next to a real "null"
        # string would produce two columns both named `null`, which
        # breaks by-name access and the nested layout). Stringifying
        # also makes non-string keys (bool/num/date) name their columns
        # exactly as Spark's cast does, so the nested layout's
        # name-matching never drops columns.
        if not self.multi:
            return self.grouped.df.withColumn(
                "__pivot__",
                F.coalesce(F.col(self.pivot_cols[0]).cast("string"), F.lit("null")),
            )
        # Escape the separator inside values before concat: without it,
        # distinct pairs like ("a_b","c") and ("a","b_c") would collide
        # into one "a_b_c" column and their aggregates would merge
        # silently. Backslash first, then "_" -> "\_" keeps the
        # separator mapping injective. (NULL vs literal "null" still
        # merge — that is the reference's toString semantics, same as
        # the single-column path above, NOT a separator artifact.)
        def esc(c):
            s = F.coalesce(F.col(c).cast("string"), F.lit("null"))
            s = F.replace(s, F.lit("\\"), F.lit("\\\\"))
            return F.replace(s, F.lit("_"), F.lit("\\_"))

        return self.grouped.df.withColumn(
            "__pivot__", F.concat_ws("_", *[esc(c) for c in self.pivot_cols])
        )

    def _value_list(self):
        vals = self.pivot_values
        if vals is None:
            src = self._src()
            vals = sorted(
                r[0] for r in src.select(self.pivot_col).distinct().collect()
            )
            self.pivot_values = vals  # cache: one discovery pass per clause
        else:
            # explicit values match against the stringified key column;
            # names are rendered by Spark's own cast so numeric/temporal
            # values can't silently miss (ADVICE r5)
            vals = self._explicit_names(vals)
        return list(vals)

    def _pivoted(self):
        return self._src().groupBy(*self.grouped.keys).pivot(
            self.pivot_col, self._value_list()
        )

    def aggregate(
        self, *aggs: Column, default=None, nested: bool = False, group_by_value: bool = False
    ) -> "KDataFrame":
        """Pivot aggregation. Flattened names (``value_agg``) by default —
        the oracle-hashable layout. ``nested=True`` reproduces the
        reference's column-group layout for MULTI-aggregate pivots
        (api/pivot.kt:27-56 aggregatePivot path composition,
        PivotTests.kt `pivot two values`): each pivot value becomes a
        struct of the aggregate columns (``out["London"]["min_age"]``);
        ``group_by_value=True`` flips the nesting to aggregate-name
        outer (reference ``groupByValue`` — ``out["min_age"]["London"]``).
        """
        out = self._pivoted().agg(*aggs)
        if isinstance(default, dict):
            # per-aggregate defaults (reference `first() default '-' into
            # "first"` — root PivotTests.kt `pivot aggregate with default`,
            # `pivot with rename`): key = aggregate alias, applied to every
            # pivot column carrying that alias suffix ("<value>_<alias>",
            # or the alias itself for a single-agg pivot).
            for alias, fill in default.items():
                targets = [
                    c
                    for c in out.columns
                    if c == alias or c.endswith("_" + alias)
                ]
                if targets:
                    out = out.na.fill(fill, subset=targets)
        elif default is not None:
            out = out.na.fill(default)
        from dataframe_kotlin_spark.core.frame import KDataFrame

        if not nested or len(aggs) < 2:
            return KDataFrame(out)
        # key columns lead the pivot output in grouping order — read them
        # from the result schema (robust for computed/aliased keys, where
        # the Column expression string is NOT the output name)
        keys = out.columns[: len(self.grouped.keys)]
        vals = self._value_list()  # already Spark-compatible name strings
        # Spark names multi-agg pivot columns "<value>_<aggAlias>". Assign
        # each column to exactly ONE (value, suffix) pair, matching the
        # LONGEST value first so a value that is an underscore-prefix of
        # another ("New" vs "New_York") cannot claim the longer value's
        # columns.
        vals_by_len = sorted(vals, key=len, reverse=True)
        assign: dict[str, tuple[str, str]] = {}
        suffixes: list[str] = []
        for c in out.columns:
            if c in keys:
                continue
            for v in vals_by_len:
                if c.startswith(v + "_"):
                    s = c[len(v) + 1 :]
                    assign[c] = (v, s)
                    if s not in suffixes:
                        suffixes.append(s)
                    break
        if group_by_value:
            groups = [
                F.struct(
                    *[F.col(f"`{c}`").alias(cv) for c, (cv, cs) in assign.items() if cs == s]
                ).alias(s)
                for s in suffixes
            ]
        else:
            groups = [
                F.struct(
                    *[F.col(f"`{c}`").alias(cs) for c, (cv, cs) in assign.items() if cv == v]
                ).alias(v)
                for v in vals
                if any(cv == v for cv, _ in assign.values())
            ]
        return KDataFrame(out.select(*[F.col(f"`{k}`") for k in keys], *groups))

    def count(self, default: int = 0) -> "KDataFrame":
        return self.aggregate(F.count(F.lit(1)), default=default)

    def sum(self, col: str, default=None) -> "KDataFrame":
        return self.aggregate(F.sum(col), default=default)

    def matches(self, yes=None, no=None) -> "KDataFrame":
        """Presence matrix. Reference: GroupedPivotAggregations.kt:36-37.
        Default boolean; ``matches(yes, no)`` substitutes custom marker
        values (reference `matches("V", "-")` form)."""
        out = self._pivoted().agg(F.count(F.lit(1)))
        from dataframe_kotlin_spark.core.frame import KDataFrame

        # output schema leads with the grouping columns (robust for
        # computed/aliased keys)
        keys = out.columns[: len(self.grouped.keys)]

        def cell(c):
            hit = F.coalesce(F.col(f"`{c}`"), F.lit(0)) > 0
            if yes is None and no is None:
                return hit.alias(c)
            return F.when(hit, F.lit(yes)).otherwise(F.lit(no)).alias(c)
        fixed = [F.col(c) if c in keys else cell(c) for c in out.columns]
        return KDataFrame(out.select(*fixed))

    def values(self, col: str) -> "KDataFrame":
        """Per-cell value lists (reference PivotAggregations.values —
        multi-match cells hold all matched values). Deterministic list
        order via sort_array, since collect_list order is partition-
        dependent."""
        return self.aggregate(F.sort_array(F.collect_list(col)))

    def frames(self) -> "KDataFrame":
        """Per-cell nested frames (reference pivot .frames(): each cell is
        the sub-frame of rows landing there) as arrays of structs over the
        non-key, non-pivot columns — Spark's relational encoding of the
        reference's FrameColumn cells."""
        keys = [c._jc.toString() if hasattr(c, "_jc") else str(c) for c in self.grouped.keys]
        rest = [
            c
            for c in self.grouped.df.columns
            if c not in keys and c not in self.pivot_cols
        ]
        cell = F.sort_array(F.collect_list(F.struct(*[F.col(c) for c in rest])))
        return self.aggregate(cell)
