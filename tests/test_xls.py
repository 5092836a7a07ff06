"""Legacy BIFF8 .XLS source: OLE2 container, record parser, EDB vertical.

Fixtures are fabricated with the module's own minimal writer plus
hand-built record streams for the shapes the writer doesn't emit (RK,
MULRK, SST split across CONTINUE, ministream-resident workbook) — so
the reader is tested against both producers, mirroring test_xlsx.py.
"""

import struct

import pytest

from econdatapipeline_spark.registry import DatasetSpec
from econdatapipeline_spark.sources.excel_grid import normalize_edb_grid
from econdatapipeline_spark.sources.xls import (
    _BOF,
    _CONTINUE,
    _EOF,
    _MULRK,
    _RK,
    _SST,
    _ole2_container,
    _rec,
    _rk_value,
    read_sheet_xls,
    workbook_stream,
    write_xls,
)
from econdatapipeline_spark.sources.xlsx import extract_data


def test_roundtrip_types():
    grid = [
        ["Month", 2023, 2024],
        ["July", 1.5, None],
        ["August", True, "n/a"],
        ["Sept", -7, 0.25],
    ]
    assert read_sheet_xls(write_xls({"Data": grid})) == grid


def test_sheet_selection_and_missing_sheet():
    content = write_xls({"First": [[1]], "Second": [[2]]})
    assert read_sheet_xls(content, "Second") == [[2]]
    assert read_sheet_xls(content) == [[1]]  # default = first sheet
    with pytest.raises(KeyError):
        read_sheet_xls(content, "Nope")


def test_rk_encoding_all_four_forms():
    # fInt / fInt+div100 / IEEE-top-30-bits / negative int
    assert _rk_value((1234 << 2) | 2) == 1234
    assert _rk_value((1234 << 2) | 3) == 12.34
    half = struct.unpack("<Q", struct.pack("<d", 0.5))[0]
    assert _rk_value((half >> 32) & 0xFFFFFFFC) == 0.5
    assert _rk_value(((-5 & 0x3FFFFFFF) << 2) | 2) == -5


def _substreams_to_xls(globals_body: bytes, sheet_body: bytes, name: str = "S") -> bytes:
    """Assemble hand-built record bodies into a valid .xls container."""
    bof_g = _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
    bof_s = _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))
    nm = struct.pack("<B", len(name)) + b"\x00" + name.encode("latin-1")
    # two-pass for the BOUNDSHEET offset
    bsheet = lambda pos: _rec(0x0085, struct.pack("<IH", pos, 0) + nm)  # noqa: E731
    glob = bof_g + bsheet(0) + globals_body + _rec(_EOF, b"")
    glob = bof_g + bsheet(len(glob)) + globals_body + _rec(_EOF, b"")
    return _ole2_container(glob + bof_s + sheet_body + _rec(_EOF, b""))


def test_rk_and_mulrk_records():
    sheet = _rec(_RK, struct.pack("<HHHI", 0, 0, 0, (42 << 2) | 2))
    # MULRK row 1, cols 0-2: 1, 2.5, 300
    half = struct.unpack("<Q", struct.pack("<d", 2.5))[0]
    rks = [(1 << 2) | 2, (half >> 32) & 0xFFFFFFFC, (300 << 2) | 2]
    mulrk = struct.pack("<HH", 1, 0)
    for rk in rks:
        mulrk += struct.pack("<HI", 0, rk)
    mulrk += struct.pack("<H", 2)
    sheet += _rec(_MULRK, mulrk)
    grid = read_sheet_xls(_substreams_to_xls(b"", sheet))
    assert grid == [[42, None, None], [1, 2.5, 300]]


def test_sst_split_across_continue():
    # "hello world" splits after 'hello'; the CONTINUE restates grbit.
    # Second string switches to utf-16 ("café—") to cover the
    # uncompressed branch.
    s2 = "café—"
    sst = struct.pack("<II", 2, 2)  # total, unique
    sst += struct.pack("<HB", 11, 0) + b"hello"
    cont = b"\x00" + b" world"
    cont += struct.pack("<HB", len(s2), 1) + s2.encode("utf-16-le")
    globals_body = _rec(_SST, sst) + _rec(_CONTINUE, cont)
    sheet = _rec(0x00FD, struct.pack("<HHHI", 0, 0, 0, 0))  # LABELSST
    sheet += _rec(0x00FD, struct.pack("<HHHI", 0, 1, 0, 1))
    grid = read_sheet_xls(_substreams_to_xls(globals_body, sheet))
    assert grid == [["hello world", s2]]


def _mini_container(stream: bytes) -> bytes:
    """Wrap a sub-4096-byte stream as a ministream-resident Workbook —
    the layout real Excel uses for small files (write_xls pads to the
    FAT instead, so this exercises the reader's miniFAT path)."""
    assert len(stream) < 4096
    n_mini = (len(stream) + 63) // 64
    mini = stream + b"\x00" * (n_mini * 64 - len(stream))
    n_mini_sect = (len(mini) + 511) // 512
    mini += b"\x00" * (n_mini_sect * 512 - len(mini))
    # sectors: 0 FAT, 1 dir, 2 miniFAT, 3.. ministream
    fat = [0xFFFFFFFD, 0xFFFFFFFE, 0xFFFFFFFE]
    fat += [3 + i + 1 for i in range(n_mini_sect - 1)] + [0xFFFFFFFE]
    fat += [0xFFFFFFFF] * (128 - len(fat))
    minifat = [i + 1 for i in range(n_mini - 1)] + [0xFFFFFFFE]
    minifat += [0xFFFFFFFF] * (128 - len(minifat))

    def dirent(name, typ, start, sz, child):
        raw = name.encode("utf-16-le") + b"\x00\x00"
        ent = bytearray(128)
        ent[0 : len(raw)] = raw
        struct.pack_into("<H", ent, 64, len(raw))
        ent[66] = typ
        ent[67] = 1
        struct.pack_into("<iii", ent, 68, -1, -1, child)
        struct.pack_into("<I", ent, 116, start)
        struct.pack_into("<Q", ent, 120, sz)
        return bytes(ent)

    directory = (
        dirent("Root Entry", 5, 3, len(mini), 1)
        + dirent("Workbook", 2, 0, len(stream), -1)
        + bytes(128)
        + bytes(128)
    )
    header = bytearray(512)
    header[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 28, 0xFFFE)
    struct.pack_into("<H", header, 30, 9)
    struct.pack_into("<H", header, 32, 6)
    struct.pack_into("<I", header, 44, 1)  # 1 FAT sector
    struct.pack_into("<I", header, 48, 1)  # dir at sector 1
    struct.pack_into("<I", header, 56, 4096)
    struct.pack_into("<I", header, 60, 2)  # miniFAT at sector 2
    struct.pack_into("<I", header, 64, 1)
    struct.pack_into("<i", header, 68, -2)
    struct.pack_into("<I", header, 72, 0)
    struct.pack_into("<I", header, 76, 0)
    for i in range(1, 109):
        struct.pack_into("<i", header, 76 + i * 4, -1)
    return (
        bytes(header)
        + struct.pack("<128I", *fat)
        + directory
        + struct.pack("<128I", *minifat)
        + mini
    )


def test_ministream_resident_workbook():
    grid = [["tiny", 1], [None, 2.5]]
    big = write_xls({"S": grid})
    biff = workbook_stream(big).rstrip(b"\x00")
    content = _mini_container(biff)
    assert len(workbook_stream(content)) == len(biff)
    assert read_sheet_xls(content) == grid


def test_rejects_non_ole():
    with pytest.raises(ValueError, match="magic"):
        read_sheet_xls(b"\xd0\xcf\x11\xe0junkjunk")


def _edb_xls() -> bytes:
    """Reference-shaped EDB sheet: title rows above, grid at A6:D8."""
    title = [["Retail sales", None, None, None]]
    blanks = [[None] * 4] * 4
    grid = [
        ["Month", 2023, 2024, 2025],
        ["July", "100", "110.5", "120"],
        ["August", "101", "n/a", "121"],
    ]
    return write_xls({"RETAIL": title + blanks + grid})


def test_extract_data_dispatches_on_magic():
    rows = extract_data(_edb_xls(), "RETAIL", "A6:D8")
    assert rows[0] == ["Month", 2023, 2024, 2025]
    assert rows[1][0] == "July" and rows[2][2] == "n/a"


def test_xls_feeds_edb_normalize(spark):
    """S1 parity vertical: BIFF8 bytes -> extract_data -> EDB column
    program (reference: azure_common_scrapers.py:35-79 + 100-140)."""
    rows = extract_data(_edb_xls(), "RETAIL", "A6:D8")
    spec = DatasetSpec(name="retail", source="edb_monthly", value_columns=("sales",))
    out = normalize_edb_grid(spark, rows, spec).collect()
    got = {(str(r["date"]), r["sales"]) for r in out}
    assert ("2022-07-01", 100.0) in got
    assert ("2023-07-01", 110.5) in got
    assert len([g for g in got if g[0].endswith("08-01")]) == 2  # n/a dropped
