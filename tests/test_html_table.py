"""HTML table source tests (sources/html_table.py)."""

from __future__ import annotations

import pytest

from econdatapipeline_spark.sources.html_table import (
    extract_tables,
    read_html_table,
)

PAGE = """
<html><body>
<h1>Monthly indicators</h1>
<table>
  <tr><th>Date</th><th>Retail Sales</th><th>Autos</th></tr>
  <tr><td>2024-01-01</td><td>1,234.5</td><td>77</td></tr>
  <tr><td>2024-02-01</td><td>1,300.0</td><td>81</td></tr>
</table>
<table>
  <tr><td>note</td><td>preliminary&nbsp;data</td></tr>
</table>
</body></html>
"""


def test_extract_two_tables():
    tables = extract_tables(PAGE)
    assert len(tables) == 2
    assert tables[0][0] == ["Date", "Retail Sales", "Autos"]
    assert tables[0][1][1] == "1,234.5"
    assert tables[1][0][1] == "preliminary data"


def test_read_with_header_promotion(spark):
    df = read_html_table(spark, PAGE, table_index=0)
    assert df.columns == ["date", "retail_sales", "autos"]
    rows = sorted(r["date"] for r in df.collect())
    assert rows == ["2024-01-01", "2024-02-01"]


def test_colspan_rowspan_expansion(spark):
    html = """<table>
      <tr><th rowspan="2">k</th><th colspan="2">vals</th></tr>
      <tr><th>a</th><th>b</th></tr>
      <tr><td>x</td><td>1</td><td>2</td></tr>
    </table>"""
    t = extract_tables(html)[0]
    assert t[0] == ["k", "vals", "vals"]
    assert t[1] == ["k", "a", "b"]  # rowspan fills position 0
    assert t[2] == ["x", "1", "2"]


def test_escaped_markup_stays_literal_cell_text():
    # Escaped markup inside a cell must parse as text, not live tags —
    # a pre-feed html.unescape would materialize a phantom nested
    # table and lose the cell text.
    html = (
        "<table><tr>"
        "<td>&lt;table&gt;&lt;tr&gt;&lt;td&gt;x&lt;/td&gt;&lt;/tr&gt;&lt;/table&gt;</td>"
        "<td>ok</td>"
        "</tr></table>"
    )
    tables = extract_tables(html)
    assert len(tables) == 1
    assert tables[0] == [["<table><tr><td>x</td></tr></table>", "ok"]]


def test_entities_decode_exactly_once():
    html = "<table><tr><td>&amp;amp;</td><td>a &amp; b</td></tr></table>"
    t = extract_tables(html)[0]
    assert t[0] == ["&amp;", "a & b"]


def test_ragged_rows_pad_null(spark):
    html = "<table><tr><td>a</td><td>b</td></tr><tr><td>only</td></tr></table>"
    df = read_html_table(spark, html, header=False)
    rows = df.collect()
    assert len(rows) == 2
    short = [r for r in rows if r["c0"] == "only"][0]
    assert short["c1"] is None


def test_bytes_input_and_missing_table(spark):
    df = read_html_table(spark, PAGE.encode(), table_index=1, header=False)
    assert df.count() == 1
    with pytest.raises(ValueError):
        read_html_table(spark, "<html>no tables</html>")


def test_pipeline_into_normalizer_types(spark):
    from pyspark.sql import functions as F

    df = read_html_table(spark, PAGE, table_index=0)
    typed = df.select(
        F.col("date").cast("date"),
        F.regexp_replace("retail_sales", ",", "").cast("double").alias("sales"),
    )
    r = sorted(typed.collect(), key=lambda r: r["date"])
    assert r[0]["sales"] == 1234.5
