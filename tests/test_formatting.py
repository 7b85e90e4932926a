"""Fluent format{} clause — reference api/format.kt:1-138 semantics:
gradient math, attribute merging, chained formatter stacking, where
filters with row access."""

from dataframe_kotlin_spark.sources.formatting import (
    FormattingDSL as dsl,
    RGBColor,
    format_frame,
    merge_attributes,
)


def test_rgb_encode_lowercase_hex():
    assert RGBColor(255, 0, 160).encode() == "#ff00a0"
    assert dsl.white.encode() == "#ffffff"
    assert dsl.black.encode() == "#000000"


def test_linear_gradient_truncation_and_clamp():
    lo, hi = (0, dsl.black), (10, dsl.white)
    # midpoint: 0 + 0.5*255 = 127.5 -> toInt truncation = 127 (format.kt:88-92)
    assert dsl.linear(5, lo, hi) == RGBColor(127, 127, 127)
    # clamped outside the range (format.kt:86-87)
    assert dsl.linear(-3, lo, hi) == dsl.black
    assert dsl.linear(99, lo, hi) == dsl.white
    # endpoints auto-ordered when from > to (format.kt:72-76)
    assert dsl.linear(5, (10, dsl.white), (0, dsl.black)) == RGBColor(127, 127, 127)


def test_merge_attributes_later_wins():
    a = (("color", "#ff0000"), ("font-weight", "bold"))
    b = (("color", "#0000ff"),)
    assert dict(merge_attributes(a, b))["color"] == "#0000ff"
    assert dict(merge_attributes(a, b))["font-weight"] == "bold"
    assert merge_attributes(None, b) == b
    assert merge_attributes(a, None) == a


def test_format_where_with_html(spark):
    df = spark.createDataFrame(
        [(1, -5.0), (2, 3.0), (3, 0.0)], "id int, bal double"
    )
    html = (
        format_frame(df, "bal")
        .where(lambda row, v: v < 0)
        .with_(lambda d, v: d.text_color(d.red))
        .to_html()
    )
    assert html.count('style="color: #ff0000"') == 1
    assert "<th>bal</th>" in html
    # unstyled cells carry no style attribute
    assert html.count("<td>3.0</td>") == 1


def test_format_chained_formatters_stack(spark):
    df = spark.createDataFrame([(1, -5.0)], "id int, bal double")
    ff = (
        format_frame(df, "bal")
        .with_(lambda d, v: merge_attributes(d.bold, d.text_color(d.red)))
        .format("bal")
        .with_(lambda d, v: d.text_color(d.blue))  # later clause wins on color
    )
    html = ff.to_html()
    assert "font-weight: bold" in html
    assert "color: #0000ff" in html
    assert "#ff0000" not in html


def test_format_all_columns_and_row_filter(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id int, tag string")
    # no selector -> every column; filter reads OTHER columns off the row
    html = (
        format_frame(df)
        .where(lambda row, v: row["id"] == 2)
        .with_(lambda d, v: d.italic)
        .to_html()
    )
    assert html.count("font-style: italic") == 2  # both cells of row id=2


def test_linear_bg_clause_skips_nulls(spark):
    df = spark.createDataFrame([(0.0,), (10.0,), (None,)], "v double")
    html = (
        format_frame(df, "v").linear_bg((0, dsl.white), (10, dsl.black)).to_html()
    )
    assert "background-color: #ffffff" in html
    assert "background-color: #000000" in html
    assert html.count("background-color") == 2  # null row unstyled


def test_kdataframe_format_entry(spark):
    from dataframe_kotlin_spark.core.frame import KDataFrame

    df = KDataFrame(spark.createDataFrame([(9,)], "n int"))
    html = df.format("n").with_(lambda d, v: d.underline).to_html(n=5)
    assert "text-decoration: underline" in html
