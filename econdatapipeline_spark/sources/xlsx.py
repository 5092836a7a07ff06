"""Minimal stdlib-only XLSX byte scan (source S1/S3).

The reference downloads Excel workbooks and slices a named sheet's cell
range into a headerless grid (``BaseEDBScraper.extract_data``,
reference core_local/azure_common_scrapers.py:66-79; NYU workbook read
at core_local/azure_nyu_scraper.py:40-69,86). It does so with
``pandas.read_excel``; this environment has no xlrd/openpyxl, so this
module implements the subset of the XLSX format those paths need using
only ``zipfile`` + ``xml.etree`` — an .xlsx file is a zip of XML parts:

    xl/workbook.xml            sheet name -> r:id
    xl/_rels/workbook.xml.rels r:id -> worksheet part path
    xl/sharedStrings.xml       shared-string table (optional)
    xl/worksheets/sheetN.xml   <row r="1"><c r="A1" t="s"><v>0</v>...

Workbooks here are KB-sized config-driven downloads (13x11 grids), so
parsing is driver-side by design; the *output* grid feeds
``normalize_edb_grid``'s distributed column program. For a hypothetical
huge spreadsheet corpus the same functions run per-file inside
``mapInPandas`` over a binaryFile scan (see ``read_xlsx_corpus``).

Legacy binary ``.XLS`` (BIFF8) — the format the reference's EDB site
actually serves — is handled by the sibling ``sources.xls`` module
(minimal OLE2 + BIFF8 record parser); ``extract_data`` dispatches on
the file magic so both formats feed the same ``slice_range`` /
``normalize_edb_grid`` path.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_REL = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_CELL_REF = re.compile(r"^([A-Z]+)([0-9]+)$")


def col_to_index(letters: str) -> int:
    """'A' -> 0, 'K' -> 10, 'AA' -> 26 (base-26 bijective)."""
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _cell_value(cell: ET.Element, shared: list[str]):
    """Decode one <c> element to a Python scalar (None for blank/error)."""
    t = cell.get("t", "n")
    if t == "inlineStr":
        is_el = cell.find(f"{_NS}is")
        if is_el is None:
            return None
        return "".join(t_el.text or "" for t_el in is_el.iter(f"{_NS}t"))
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "str":
        return v.text
    if t == "b":
        return v.text == "1"
    if t == "e":
        return None
    # numeric: int when integral so fiscal-year headers melt as '2023'
    # not '2023.0' (the reference's header row is `int(y)` cast,
    # azure_common_scrapers.py:119)
    f = float(v.text)
    return int(f) if f.is_integer() else f


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ET.fromstring(data).iter(f"{_NS}si"):
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _sheet_part(zf: zipfile.ZipFile, sheet_name: str | None) -> str:
    """Resolve a sheet name to its worksheet part path via the rels map."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rel_ns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
    target_by_rid = {
        r.get("Id"): r.get("Target") for r in rels.iter(f"{rel_ns}Relationship")
    }
    sheets = []
    for sh in wb.iter(f"{_NS}sheet"):
        target = target_by_rid[sh.get(f"{_NS_REL}id")]
        if not target.startswith("/"):
            target = "xl/" + target
        sheets.append((sh.get("name"), target.lstrip("/")))
    if sheet_name is None:
        return sheets[0][1]
    for name, part in sheets:
        if name == sheet_name:
            return part
    raise KeyError(
        f"sheet {sheet_name!r} not in workbook (have {[s[0] for s in sheets]})"
    )


def read_sheet(content: bytes, sheet_name: str | None = None) -> list[list]:
    """Parse one worksheet into a dense row-major grid (None = blank).

    Mirrors what ``pd.read_excel(..., header=None)`` hands the
    reference: a rectangular grid addressed by absolute row/column, so
    A1-style ranges slice it directly.
    """
    with zipfile.ZipFile(io.BytesIO(content)) as zf:
        shared = _shared_strings(zf)
        part = _sheet_part(zf, sheet_name)
        root = ET.fromstring(zf.read(part))
    cells: dict[tuple[int, int], object] = {}
    max_r = max_c = -1
    for ri, row in enumerate(root.iter(f"{_NS}row")):
        r_attr = row.get("r")
        r = int(r_attr) - 1 if r_attr else ri
        next_c = 0
        for cell in row.iter(f"{_NS}c"):
            ref = cell.get("r")
            if ref:
                m = _CELL_REF.match(ref)
                c = col_to_index(m.group(1))
            else:  # refless cells advance sequentially (spec allows this)
                c = next_c
            next_c = c + 1
            val = _cell_value(cell, shared)
            if val is not None:
                cells[(r, c)] = val
                max_r = max(max_r, r)
                max_c = max(max_c, c)
    grid = [[None] * (max_c + 1) for _ in range(max_r + 1)]
    for (r, c), val in cells.items():
        grid[r][c] = val
    return grid


def slice_range(grid: list[list], data_location: str) -> list[list]:
    """Slice an 'A6:K18'-style absolute range out of a sheet grid.

    Reference ``extract_data`` does this with ``df.iloc[start_row:
    end_row+1, start_col:end_col+1]`` after converting the A1 refs
    (azure_common_scrapers.py:70-79). Cells outside the sheet's used
    area come back as None, like pandas' NaN padding.
    """
    start, end = data_location.split(":")
    m1, m2 = _CELL_REF.match(start.upper()), _CELL_REF.match(end.upper())
    if not m1 or not m2:
        raise ValueError(f"bad range {data_location!r}")
    c1, r1 = col_to_index(m1.group(1)), int(m1.group(2)) - 1
    c2, r2 = col_to_index(m2.group(1)), int(m2.group(2)) - 1
    out = []
    for r in range(r1, r2 + 1):
        src = grid[r] if r < len(grid) else []
        out.append([src[c] if c < len(src) else None for c in range(c1, c2 + 1)])
    return out


def extract_data(
    content: bytes, sheet_name: str | None, data_location: str
) -> list[list]:
    """Byte-for-byte analog of ``BaseEDBScraper.extract_data``:
    workbook bytes + sheet + A1 range -> headerless grid rows, ready
    for ``normalize_edb_grid``. Dispatches on the file magic: zip ->
    .xlsx, OLE2 -> legacy BIFF8 .xls (the format the EDB site serves,
    reference azure_common_scrapers.py:35-79).
    """
    if content[:2] == b"\xd0\xcf":  # OLE2 magic = legacy .xls
        from econdatapipeline_spark.sources.xls import read_sheet_xls

        return slice_range(read_sheet_xls(content, sheet_name), data_location)
    return slice_range(read_sheet(content, sheet_name), data_location)


def read_xlsx_corpus(spark, path_glob: str, data_location: str):
    """Distributed scan of MANY workbooks: binaryFile source -> one
    Arrow-batched parser per file -> exploded (path, row, col, cell)
    long table.

    This is the 100 TB shape of S1: each executor task receives a batch
    of (path, content) rows and runs the same stdlib parser per file —
    parallelism across files, never within one (workbooks are small;
    files >> cores is the scaling axis). Downstream range-slice +
    normalize are ordinary DataFrame ops on the long output.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("path", StringType()),
            StructField("row", IntegerType()),
            StructField("col", IntegerType()),
            StructField("cell", StringType()),
        ]
    )

    def parse_batches(batches):
        import pandas as pd

        for pdf in batches:
            paths, rows_, cols_, vals = [], [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                grid = slice_range(read_sheet(bytes(content)), data_location)
                for r, row in enumerate(grid):
                    for c, val in enumerate(row):
                        if val is None:
                            continue
                        paths.append(path)
                        rows_.append(r)
                        cols_.append(c)
                        vals.append(str(val))
            yield pd.DataFrame(
                {"path": paths, "row": rows_, "col": cols_, "cell": vals}
            )

    files = spark.read.format("binaryFile").load(path_glob)
    # repartition by path so one giant directory listing still fans out
    return (
        files.select("path", "content")
        .repartition(F.col("path"))
        .mapInPandas(parse_batches, schema=out_schema)
    )


def write_xlsx(sheets: dict[str, list[list]]) -> bytes:
    """Minimal XLSX writer (inline strings only) — enough to round-trip
    ``read_sheet`` in tests and to fabricate the reference's cached
    workbook downloads deterministically. Not a general-purpose writer.
    """

    def a1(r: int, c: int) -> str:
        letters = ""
        c += 1
        while c:
            c, rem = divmod(c - 1, 26)
            letters = chr(ord("A") + rem) + letters
        return f"{letters}{r + 1}"

    def esc(s: str) -> str:
        return (
            s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )

    sheet_xmls = []
    for rows in sheets.values():
        body = []
        for r, row in enumerate(rows):
            cells = []
            for c, val in enumerate(row):
                if val is None:
                    continue
                if isinstance(val, bool):
                    cells.append(f'<c r="{a1(r, c)}" t="b"><v>{int(val)}</v></c>')
                elif isinstance(val, (int, float)):
                    cells.append(f'<c r="{a1(r, c)}"><v>{val}</v></c>')
                else:
                    cells.append(
                        f'<c r="{a1(r, c)}" t="inlineStr"><is><t>{esc(str(val))}</t></is></c>'
                    )
            body.append(f'<row r="{r + 1}">{"".join(cells)}</row>')
        sheet_xmls.append(
            '<?xml version="1.0"?><worksheet xmlns='
            '"http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f'<sheetData>{"".join(body)}</sheetData></worksheet>'
        )

    names = list(sheets)
    sheet_entries = "".join(
        f'<sheet name="{esc(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0"?><workbook xmlns='
        '"http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
        f'relationships"><sheets>{sheet_entries}</sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?><Relationships xmlns='
        '"http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxml'
            'formats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + "</Relationships>"
    )
    content_types = (
        '<?xml version="1.0"?><Types xmlns='
        '"http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxml'
        'formats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            for i in range(len(names))
        )
        + "</Types>"
    )
    root_rels = (
        '<?xml version="1.0"?><Relationships xmlns='
        '"http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        for i, x in enumerate(sheet_xmls):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", x)
    return buf.getvalue()
