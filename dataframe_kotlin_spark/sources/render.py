"""Presentation renderers (SURVEY §2.1: io/html.kt, io/string.kt,
api/format.kt).

The reference renders frames to HTML/string for notebooks and supports
conditional cell styling (`format { col }.where { pred }.with { style }`).
These are driver-side presentation features by definition — they exist to
show a HUMAN a bounded number of rows — so the only scale rule that
matters is the `limit(n)` pushed into the plan BEFORE collecting:
rendering never materializes more than ``n`` rows regardless of table
size (Spark plans CollectLimit, which short-circuits the scan).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame


def to_string(df: DataFrame, n: int = 20, max_cell: int | None = None) -> str:
    """Reference io/string.kt renderToString: plain-text table of the
    first n rows. ``max_cell`` truncates long cell values with "..." and
    flattens embedded newlines to spaces (reference renderValueForStdout,
    rendering/RenderingTests.kt `render row with unicode values as
    table` — truncation counts CHARACTERS, so multi-byte text truncates
    at the same width as ASCII)."""
    pdf = df.limit(n).toPandas()
    if max_cell is not None:
        def trunc(v):
            if isinstance(v, str):
                v = v.replace("\n", " ")
                if len(v) > max_cell:
                    return v[: max_cell - 3] + "..."
            return v

        pdf = pdf.map(trunc)
    return pdf.to_string(index=False)


def row_to_string(row) -> str:
    """Reference DataRow.toString() — "{ name:Alice, age:15, ... }"
    (person/DataFrameTests.kt:1256 `row to string`); nulls render as
    Kotlin's "null"."""
    inner = ", ".join(
        f"{k}:{'null' if v is None else v}" for k, v in row.asDict().items()
    )
    return "{ " + inner + " }"


def to_html(
    df: DataFrame,
    n: int = 20,
    styles: dict[str, Callable[[Any], str]] | None = None,
) -> str:
    """Reference io/html.kt toHTML + api/format.kt conditional styling.

    ``styles`` maps column name -> (cell value -> CSS declaration string,
    e.g. "color: red" or "" for no styling), mirroring the reference's
    `format { col }.where { pred }.with { style }` chain in the one way
    that matters: style is a pure function of the cell value, applied
    after the bounded collect.
    """
    pdf = df.limit(n).toPandas()
    if not styles:
        return pdf.to_html(index=False)
    styler = pdf.style.hide(axis="index")
    for col, fn in styles.items():
        if col in pdf.columns:
            styler = styler.map(lambda v, _fn=fn: _fn(v) or "", subset=[col])
    return styler.to_html()
