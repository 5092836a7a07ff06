"""XLSX byte-scan source: reader, range slice, corpus scan, EDB vertical.

Fixture workbooks are fabricated with the module's own minimal writer
(inline strings) plus hand-built XML for the shared-strings and
formula-cell shapes the writer doesn't emit — so the reader is tested
against both producers.
"""

import io
import zipfile

import pytest

from econdatapipeline_spark.registry import DatasetSpec
from econdatapipeline_spark.sources.excel_grid import normalize_edb_grid
from econdatapipeline_spark.sources.xlsx import (
    col_to_index,
    extract_data,
    read_sheet,
    read_xlsx_corpus,
    slice_range,
    write_xlsx,
)

def test_col_to_index():
    assert [col_to_index(c) for c in ["A", "K", "Z", "AA", "AB", "BA"]] == [
        0, 10, 25, 26, 27, 52,
    ]


def test_roundtrip_types():
    grid = [
        ["Month", 2023, 2024],
        ["July", 1.5, None],
        ["August", True, "n/a"],
    ]
    back = read_sheet(write_xlsx({"Data": grid}))
    assert back == grid


def test_sheet_selection_and_missing_sheet():
    content = write_xlsx({"First": [[1]], "Second": [[2]]})
    assert read_sheet(content, "Second") == [[2]]
    assert read_sheet(content) == [[1]]  # default = first sheet
    with pytest.raises(KeyError):
        read_sheet(content, "Nope")


def test_shared_strings_and_formula_cells():
    # hand-built workbook: shared strings, cached formula result, error
    # cell, and a refless <c> (spec-legal, advances sequentially)
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c>'
        '<c t="s"><v>1</v></c>'  # refless -> B1
        '<c r="C1" t="str"><f>A1&amp;B1</f><v>cached</v></c>'
        '<c r="D1" t="e"><v>#DIV/0!</v></c></row>'
        "</sheetData></worksheet>"
    )
    shared = (
        f'<sst xmlns="{ns}"><si><t>hello</t></si>'
        "<si><r><t>wor</t></r><r><t>ld</t></r></si></sst>"
    )
    base = write_xlsx({"S": [[None]]})
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(base)) as src, zipfile.ZipFile(buf, "w") as dst:
        for item in src.namelist():
            if item != "xl/worksheets/sheet1.xml":
                dst.writestr(item, src.read(item))
        dst.writestr("xl/worksheets/sheet1.xml", sheet)
        dst.writestr("xl/sharedStrings.xml", shared)
    # D1 is an error cell -> None, so the used area ends at column C
    assert read_sheet(buf.getvalue()) == [["hello", "world", "cached"]]


def test_slice_range_pads_outside_used_area():
    grid = [[1, 2], [3, 4]]
    assert slice_range(grid, "B2:C3") == [[4, None], [None, None]]
    with pytest.raises(ValueError):
        slice_range(grid, "2B:C3")


def test_extract_data_rejects_corrupt_ole():
    # OLE2-prefixed but invalid bytes -> clear error from the .xls path
    # (valid BIFF8 dispatch is covered in test_xls.py)
    with pytest.raises(ValueError, match="magic"):
        extract_data(b"\xd0\xcf\x11\xe0junkjunk", "Sheet1", "A1:B2")


def _edb_workbook() -> bytes:
    """Reference-shaped EDB sheet: title rows above, grid at A6:D9."""
    title = [["Retail sales", None, None, None]]
    blanks = [[None] * 4] * 4  # rows 2-5; grid occupies rows 6-8
    grid = [
        ["Month", 2023, 2024, 2025],
        ["July", "100", "110.5", "120"],
        ["August", "101", "n/a", "121"],
    ]
    return write_xlsx({"RETAIL": title + blanks + grid})


def test_extract_data_range():
    rows = extract_data(_edb_workbook(), "RETAIL", "A6:D8")
    assert rows[0] == ["Month", 2023, 2024, 2025]
    assert rows[1][0] == "July" and rows[2][2] == "n/a"


def test_xlsx_feeds_edb_normalize(spark):
    rows = extract_data(_edb_workbook(), "RETAIL", "A6:D8")
    spec = DatasetSpec(name="retail", source="edb_monthly", value_columns=("sales",))
    out = normalize_edb_grid(spark, rows, spec).collect()
    # July FY2023 -> 2022-07-01; 'n/a' coerces to null and drops
    got = {(str(r["date"]), r["sales"]) for r in out}
    assert ("2022-07-01", 100.0) in got
    assert ("2023-07-01", 110.5) in got
    assert len([g for g in got if g[0].endswith("08-01")]) == 2  # n/a dropped


def test_corpus_scan(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"wb{i}.xlsx").write_bytes(
            write_xlsx({"S": [["Month", 2020 + i], ["July", 10 * i]]})
        )
    df = read_xlsx_corpus(spark, str(tmp_path / "*.xlsx"), "A1:B2")
    rows = df.collect()
    assert len(rows) == 12  # 3 files x 4 non-null cells
    by_file = {r["path"].rsplit("/", 1)[-1] for r in rows}
    assert by_file == {"wb0.xlsx", "wb1.xlsx", "wb2.xlsx"}
    cells = {(r["path"].rsplit("/", 1)[-1], r["row"], r["col"]): r["cell"] for r in rows}
    assert cells[("wb2.xlsx", 1, 1)] == "20"
