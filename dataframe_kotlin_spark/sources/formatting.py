"""Fluent conditional-styling clause: ``format(cols).where(pred).with_(style)``.

Mirrors reference api/format.kt:1-138 — ``RGBColor``, the ``FormattingDSL``
(background / textColor / bold / italic / underline / linearBg gradient),
``ColorClause.where``, attribute merging (``and`` — later formatter wins
per CSS property), and ``FormattedFrame`` whose chained ``format`` calls
stack formatters (format.kt:105-109,131-138).

Presentation is driver-side by definition (it renders a bounded number of
rows for a human): the only scale rule is the ``limit(n)`` pushed into the
plan BEFORE collecting, so Spark plans CollectLimit and never scans more
than needed. Style evaluation is pure Python over the collected page.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from html import escape
from typing import Any, Callable

from pyspark.sql import DataFrame

# --- colors & attributes (format.kt:7-30,41-77) ---


@dataclass(frozen=True)
class RGBColor:
    r: int
    g: int
    b: int

    def encode(self) -> str:
        """``#rrggbb`` — format.kt:9-13 encRgb/encHex (lowercase hex)."""
        return "#{:02x}{:02x}{:02x}".format(self.r, self.g, self.b)


CellAttributes = tuple[tuple[str, str], ...]  # ordered (css-prop, value)


def merge_attributes(
    a: CellAttributes | None, b: CellAttributes | None
) -> CellAttributes | None:
    """``a and b`` (format.kt:27-31 + MergedAttributes.attributes):
    concatenate then de-dup by property, LAST occurrence winning."""
    if not b:
        return a
    if not a:
        return b
    merged: dict[str, str] = {}
    for k, v in (*a, *b):
        merged[k] = v
    return tuple(merged.items())


class FormattingDSL:
    """The style vocabulary handed to ``with_`` lambdas (format.kt:41-77)."""

    black = RGBColor(0, 0, 0)
    white = RGBColor(255, 255, 255)
    green = RGBColor(0, 255, 0)
    red = RGBColor(255, 0, 0)
    blue = RGBColor(0, 0, 255)
    gray = RGBColor(128, 128, 128)
    dark_gray = RGBColor(169, 169, 169)
    light_gray = RGBColor(211, 211, 211)

    italic: CellAttributes = (("font-style", "italic"),)
    bold: CellAttributes = (("font-weight", "bold"),)
    underline: CellAttributes = (("text-decoration", "underline"),)

    @staticmethod
    def rgb(r: int, g: int, b: int) -> RGBColor:
        return RGBColor(r, g, b)

    @staticmethod
    def attribute(name: str, value: str) -> CellAttributes:
        return ((name, value),)

    @classmethod
    def background(cls, color: RGBColor | int, g: int = None, b: int = None) -> CellAttributes:
        if not isinstance(color, RGBColor):
            color = RGBColor(color, g, b)
        return cls.attribute("background-color", color.encode())

    @classmethod
    def text_color(cls, color: RGBColor | int, g: int = None, b: int = None) -> CellAttributes:
        if not isinstance(color, RGBColor):
            color = RGBColor(color, g, b)
        return cls.attribute("color", color.encode())

    @staticmethod
    def linear(
        value: float,
        from_: tuple[float, RGBColor],
        to: tuple[float, RGBColor],
    ) -> RGBColor:
        """Linear color interpolation, endpoints auto-ordered and values
        clamped (format.kt:70-93)."""
        a, ca = from_
        b, cb = to
        if float(a) > float(b):
            a, ca, b, cb = b, cb, a, ca
        x = float(value)
        if x < float(a):
            return ca
        if x > float(b):
            return cb
        if float(a) == float(b):
            return ca  # degenerate range (constant column): flat color
        t = (x - float(a)) / (float(b) - float(a))
        comp = lambda lo, hi: int(lo + t * (hi - lo))  # noqa: E731 (toInt truncation)
        return RGBColor(comp(ca.r, cb.r), comp(ca.g, cb.g), comp(ca.b, cb.b))

    @classmethod
    def linear_bg(
        cls,
        value: float,
        from_: tuple[float, RGBColor],
        to: tuple[float, RGBColor],
    ) -> CellAttributes:
        return cls.background(cls.linear(value, from_, to))


# formatter(dsl, value) -> attributes; filter(row_dict, value) -> bool
CellFormatter = Callable[[type[FormattingDSL], Any], CellAttributes | None]
RowCellFilter = Callable[[dict, Any], bool]
RowColFormatter = Callable[[dict, str], CellAttributes | None]


@dataclass(frozen=True)
class ColorClause:
    """``df.format(cols)`` / ``formatted.format(cols)`` (format.kt:111-121)."""

    df: DataFrame
    selector: tuple[str, ...] | None = None  # None = all columns
    old_formatter: RowColFormatter | None = None
    filter: RowCellFilter | None = None

    def where(self, pred: RowCellFilter) -> "ColorClause":
        """Restrict styling to cells where ``pred(row_dict, value)`` holds
        (format.kt:123 ColorClause.where)."""
        return replace(self, filter=pred)

    def with_(self, formatter: CellFormatter) -> "FormattedFrame":
        """Attach the style function; chained formats stack, later clauses
        overriding earlier ones per CSS property (format.kt:131-138)."""
        cols = set(self.selector) if self.selector is not None else None
        old, flt = self.old_formatter, self.filter

        def fmt(row: dict, col: str) -> CellAttributes | None:
            old_attrs = old(row, col) if old else None
            if cols is None or col in cols:
                value = row.get(col)
                if flt is None or flt(row, value):
                    return merge_attributes(old_attrs, formatter(FormattingDSL, value))
            return old_attrs

        return FormattedFrame(self.df, fmt)

    def linear_bg(
        self, from_: tuple[float, RGBColor], to: tuple[float, RGBColor]
    ) -> "FormattedFrame":
        """Numeric gradient background shortcut (format.kt:127-129);
        null cells stay unstyled."""
        return self.with_(
            lambda dsl, v: dsl.linear_bg(v, from_, to) if v is not None else None
        )


@dataclass
class FormattedFrame:
    """A frame plus its accumulated cell formatter (format.kt:100-109)."""

    df: DataFrame
    formatter: RowColFormatter | None = None

    def format(self, *cols: str) -> ColorClause:
        sel = tuple(cols) if cols else None
        return ColorClause(self.df, sel, self.formatter)

    def to_html(self, n: int = 20) -> str:
        """Bounded render: limit(n) goes into the PLAN (CollectLimit), the
        formatter runs over the collected page only (io/html.kt toHTML with
        cellFormatter)."""
        rows = [r.asDict(recursive=True) for r in self.df.limit(n).collect()]
        cols = self.df.columns
        out = ["<table><thead><tr>"]
        out += [f"<th>{escape(c)}</th>" for c in cols]
        out.append("</tr></thead><tbody>")
        for row in rows:
            out.append("<tr>")
            for c in cols:
                attrs = self.formatter(row, c) if self.formatter else None
                v = row.get(c)
                txt = escape("" if v is None else str(v))
                if attrs:
                    # quote=True: attribute values may derive from cell
                    # data — a stray double quote must not break out of
                    # the style attribute
                    css = escape(
                        "; ".join(f"{k}: {v}" for k, v in attrs), quote=True
                    )
                    out.append(f'<td style="{css}">{txt}</td>')
                else:
                    out.append(f"<td>{txt}</td>")
            out.append("</tr>")
        out.append("</tbody></table>")
        return "".join(out)


def format_frame(df: DataFrame, *cols: str) -> ColorClause:
    """Entry point: ``format_frame(df, "a", "b").where(...).with_(...)``
    (format.kt:111-118 DataFrame.format)."""
    return FormattedFrame(df).format(*cols)
