"""Minimal stdlib-only legacy ``.XLS`` (BIFF8) byte scan (source S1).

The reference's primary EDB source serves legacy binary ``.XLS``
workbooks (reference core_local/azure_common_scrapers.py:35-79 reads
them with ``pd.read_excel``/xlrd); this environment has neither xlrd
nor any OLE2 library, so this module implements the minimal subset of
the two formats involved, from their public specifications
([MS-CFB] compound file binary and [MS-XLS] BIFF8):

- an OLE2/CFB container reader (FAT, miniFAT, directory) that locates
  the ``Workbook``/``Book`` stream, and
- a BIFF8 record parser covering the record types real worksheet data
  uses: BOF, BOUNDSHEET, SST (+CONTINUE), LABELSST, LABEL, NUMBER,
  RK, MULRK, FORMULA cached numbers, BOOLERR.

Output is the same dense row-major grid ``xlsx.read_sheet`` produces,
so ``slice_range``/``extract_data``/``normalize_edb_grid`` run
unchanged on either format. Workbooks are KB-sized config-driven
downloads, parsed driver-side (or per-file inside ``mapInPandas`` for
a workbook corpus — see ``xlsx.read_xlsx_corpus`` for the shape).

A fixture writer (``write_xls``) emits a spec-minimal BIFF8 file so
tests exercise the reader without binary blobs in the repo.
"""

from __future__ import annotations

import struct

OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD

# BIFF8 record opcodes actually used by worksheet data.
_BOF = 0x0809
_EOF = 0x000A
_BOUNDSHEET = 0x0085
_SST = 0x00FC
_CONTINUE = 0x003C
_LABELSST = 0x00FD
_LABEL = 0x0204
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_FORMULA = 0x0006
_BOOLERR = 0x0205


# ---------------------------------------------------------------- OLE2 / CFB


def _sector_chain(data: bytes, fat: list[int], start: int, size: int) -> bytes:
    out = bytearray()
    sid = start
    while sid not in (_ENDOFCHAIN, _FREESECT) and len(out) < size + 512:
        off = 512 + sid * 512
        out += data[off : off + 512]
        sid = fat[sid]
    return bytes(out[:size])


def _read_directory(data: bytes, fat: list[int], first_dir: int) -> list[dict]:
    # Directory stream size isn't recorded in v3 headers; walk the chain.
    raw = bytearray()
    sid = first_dir
    while sid not in (_ENDOFCHAIN, _FREESECT):
        off = 512 + sid * 512
        raw += data[off : off + 512]
        sid = fat[sid]
    entries = []
    for i in range(0, len(raw), 128):
        ent = raw[i : i + 128]
        if len(ent) < 128:
            break
        name_len = struct.unpack("<H", ent[64:66])[0]
        name = ent[: max(0, name_len - 2)].decode("utf-16-le", "replace")
        entries.append(
            {
                "name": name,
                "type": ent[66],
                "start": struct.unpack("<I", ent[116:120])[0],
                "size": struct.unpack("<Q", ent[120:128])[0],
            }
        )
    return entries


def workbook_stream(content: bytes) -> bytes:
    """Extract the BIFF ``Workbook`` (or BIFF5 ``Book``) stream from an
    OLE2 compound file, handling both FAT- and ministream-resident
    streams (streams under 4096 bytes live in the root entry's
    ministream, addressed by the miniFAT in 64-byte minisectors).
    """
    if content[:8] != OLE_MAGIC:
        raise ValueError("not an OLE2 compound file (bad magic)")
    sector_shift = struct.unpack("<H", content[30:32])[0]
    if sector_shift != 9:  # 512-byte sectors; v4 (4096) never used by Excel 97
        raise NotImplementedError(f"unsupported sector size 2^{sector_shift}")
    n_fat = struct.unpack("<I", content[44:48])[0]
    first_dir = struct.unpack("<I", content[48:52])[0]
    first_minifat = struct.unpack("<I", content[60:64])[0]
    n_minifat = struct.unpack("<I", content[64:68])[0]
    first_difat = struct.unpack("<I", content[68:72])[0]
    n_difat = struct.unpack("<I", content[72:76])[0]

    difat = list(struct.unpack("<109I", content[76:512]))
    sid = first_difat
    for _ in range(n_difat):
        off = 512 + sid * 512
        block = struct.unpack("<128I", content[off : off + 512])
        difat += block[:127]
        sid = block[127]
    fat_sectors = [s for s in difat if s != _FREESECT][:n_fat]
    fat: list[int] = []
    for s in fat_sectors:
        off = 512 + s * 512
        fat += struct.unpack("<128I", content[off : off + 512])

    entries = _read_directory(content, fat, first_dir)
    root = next(e for e in entries if e["type"] == 5)
    wb = next(
        (e for e in entries if e["type"] == 2 and e["name"] in ("Workbook", "Book")),
        None,
    )
    if wb is None:
        raise ValueError(
            f"no Workbook stream (have {[e['name'] for e in entries if e['type'] == 2]})"
        )
    if wb["size"] >= 4096:
        return _sector_chain(content, fat, wb["start"], wb["size"])

    # Ministream path: the root entry's stream holds all mini sectors;
    # the miniFAT chains them in 64-byte units.
    ministream = _sector_chain(content, fat, root["start"], root["size"])
    minifat: list[int] = []
    sid = first_minifat
    for _ in range(n_minifat):
        off = 512 + sid * 512
        minifat += struct.unpack("<128I", content[off : off + 512])
        sid = fat[sid]
    out = bytearray()
    msid = wb["start"]
    while msid not in (_ENDOFCHAIN, _FREESECT) and len(out) < wb["size"] + 64:
        out += ministream[msid * 64 : msid * 64 + 64]
        msid = minifat[msid] if msid < len(minifat) else _ENDOFCHAIN
    return bytes(out[: wb["size"]])


# ------------------------------------------------------------- BIFF8 records


def _records(stream: bytes):
    """Yield (opcode, data, offset) for each BIFF record."""
    pos = 0
    n = len(stream)
    while pos + 4 <= n:
        op, ln = struct.unpack_from("<HH", stream, pos)
        yield op, stream[pos + 4 : pos + 4 + ln], pos
        pos += 4 + ln


class _SegCursor:
    """Cursor over SST record data + its CONTINUE segments.

    XLUnicodeString char runs may split at a segment boundary, where a
    fresh option-flags byte restates the encoding for the remainder —
    the one genuinely fiddly rule in BIFF8 ([MS-XLS] 2.5.293).
    """

    def __init__(self, segments: list[bytes]):
        self.segs = segments
        self.i = 0
        self.pos = 0

    def _remaining(self) -> int:
        return len(self.segs[self.i]) - self.pos

    def _advance_seg(self) -> None:
        while self.i < len(self.segs) and self.pos >= len(self.segs[self.i]):
            self.i += 1
            self.pos = 0

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            self._advance_seg()
            take = min(n, self._remaining())
            out += self.segs[self.i][self.pos : self.pos + take]
            self.pos += take
            n -= take
        return bytes(out)

    def read_chars(self, n_chars: int, high_byte: bool) -> str:
        """Read a char run that may cross segment boundaries (each
        boundary restates the grbit byte)."""
        out = []
        remaining = n_chars
        while remaining > 0:
            self._advance_seg()
            avail = self._remaining()
            if avail == 0:
                break
            width = 2 if high_byte else 1
            take = min(remaining, avail // width)
            if take == 0:
                # Split mid-char cannot happen per spec (runs split on
                # char boundaries); a zero here means the next segment
                # starts with a fresh grbit.
                self.pos += avail  # skip padding (defensive)
                continue
            raw = self.read(take * width)
            out.append(
                raw.decode("utf-16-le") if high_byte else raw.decode("latin-1")
            )
            remaining -= take
            if remaining > 0:
                # Crossing into the next segment: re-read option flags.
                self._advance_seg()
                high_byte = bool(self.read(1)[0] & 0x01)
        return "".join(out)

    def read_string(self) -> str:
        n_chars = struct.unpack("<H", self.read(2))[0]
        flags = self.read(1)[0]
        high = bool(flags & 0x01)
        rich_runs = struct.unpack("<H", self.read(2))[0] if flags & 0x08 else 0
        ext_size = struct.unpack("<I", self.read(4))[0] if flags & 0x04 else 0
        s = self.read_chars(n_chars, high)
        self.read(rich_runs * 4 + ext_size)
        return s


def _parse_sst(data: bytes, continues: list[bytes]) -> list[str]:
    cur = _SegCursor([data[8:], *continues])  # skip cstTotal/cstUnique
    total_unique = struct.unpack("<I", data[4:8])[0]
    return [cur.read_string() for _ in range(total_unique)]


def _short_string(data: bytes, off: int) -> str:
    """BOUNDSHEET-style string: 1-byte length + grbit + chars."""
    n = data[off]
    high = bool(data[off + 1] & 0x01)
    raw = data[off + 2 : off + 2 + n * (2 if high else 1)]
    return raw.decode("utf-16-le") if high else raw.decode("latin-1")


def _rk_value(rk: int):
    if rk & 0x02:  # integer: signed 30-bit
        v = rk >> 2
        if v & 0x20000000:
            v -= 0x40000000
        val: float | int = v
    else:  # top 30 bits of an IEEE double
        val = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    if rk & 0x01:
        val = val / 100
    return int(val) if isinstance(val, float) and val.is_integer() else val


def _num(f: float):
    """Match xlsx._cell_value: integral floats come back as int (the
    reference's header row is ``int(y)`` cast, azure_common_scrapers
    .py:119)."""
    return int(f) if f.is_integer() else f


def read_sheet_xls(content: bytes, sheet_name: str | None = None) -> list[list]:
    """Parse one worksheet of a BIFF8 ``.XLS`` into a dense row-major
    grid (None = blank), identical in shape to ``xlsx.read_sheet``.
    """
    stream = workbook_stream(content)

    # Pass 1: globals substream — SST and the sheet directory.
    sheets: list[tuple[str, int]] = []  # (name, BOF offset)
    sst: list[str] = []
    pending_sst: bytes | None = None
    sst_continues: list[bytes] = []
    for op, data, _off in _records(stream):
        if op == _BOUNDSHEET:
            bof_pos = struct.unpack("<I", data[:4])[0]
            sheets.append((_short_string(data, 6), bof_pos))
        elif op == _SST:
            pending_sst = data
            sst_continues = []
        elif op == _CONTINUE and pending_sst is not None:
            sst_continues.append(data)
        elif pending_sst is not None and op not in (_SST, _CONTINUE):
            sst = _parse_sst(pending_sst, sst_continues)
            pending_sst = None
        if op == _EOF:
            break  # end of globals substream
    if pending_sst is not None:
        sst = _parse_sst(pending_sst, sst_continues)
    if not sheets:
        raise ValueError("no BOUNDSHEET records (not a BIFF8 workbook?)")

    if sheet_name is None:
        start = sheets[0][1]
    else:
        for name, pos in sheets:
            if name == sheet_name:
                start = pos
                break
        else:
            raise KeyError(
                f"sheet {sheet_name!r} not in workbook (have {[s[0] for s in sheets]})"
            )

    # Pass 2: the selected worksheet substream.
    cells: dict[tuple[int, int], object] = {}
    max_r = max_c = -1

    def put(r: int, c: int, val) -> None:
        nonlocal max_r, max_c
        if val is None:
            return
        cells[(r, c)] = val
        max_r = max(max_r, r)
        max_c = max(max_c, c)

    in_sheet = False
    for op, data, off in _records(stream):
        if off < start:
            continue
        if op == _BOF:
            if in_sheet:
                break  # ran into the next substream
            in_sheet = True
            continue
        if not in_sheet:
            continue
        if op == _EOF:
            break
        if op == _LABELSST:
            r, c, _ixfe, isst = struct.unpack("<HHHI", data[:10])
            put(r, c, sst[isst])
        elif op == _NUMBER:
            r, c, _ixfe = struct.unpack("<HHH", data[:6])
            put(r, c, _num(struct.unpack("<d", data[6:14])[0]))
        elif op == _RK:
            r, c, _ixfe, rk = struct.unpack("<HHHI", data[:10])
            put(r, c, _rk_value(rk))
        elif op == _MULRK:
            r, c_first = struct.unpack("<HH", data[:4])
            c_last = struct.unpack("<H", data[-2:])[0]
            for i in range(c_last - c_first + 1):
                rk = struct.unpack("<I", data[4 + i * 6 + 2 : 4 + i * 6 + 6])[0]
                put(r, c_first + i, _rk_value(rk))
        elif op == _LABEL:
            r, c, _ixfe = struct.unpack("<HHH", data[:6])
            cur = _SegCursor([data[6:]])
            put(r, c, cur.read_string())
        elif op == _BOOLERR:
            r, c, _ixfe, v, is_err = struct.unpack("<HHHBB", data[:8])
            if not is_err:  # errors -> blank, like xlsx t="e"
                put(r, c, bool(v))
        elif op == _FORMULA:
            r, c, _ixfe = struct.unpack("<HHH", data[:6])
            result = data[6:14]
            if result[6:8] != b"\xff\xff":  # cached numeric result
                put(r, c, _num(struct.unpack("<d", result)[0]))
            # string/bool/error cached results need the trailing STRING
            # record; EDB grids don't use formula cells, skipped.

    grid = [[None] * (max_c + 1) for _ in range(max_r + 1)]
    for (r, c), val in cells.items():
        grid[r][c] = val
    return grid


# ------------------------------------------------------------ fixture writer


def _biff_string(s: str) -> bytes:
    """XLUnicodeRichExtendedString, uncompressed iff non-latin1."""
    try:
        raw = s.encode("latin-1")
        return struct.pack("<HB", len(s), 0) + raw
    except UnicodeEncodeError:
        return struct.pack("<HB", len(s), 1) + s.encode("utf-16-le")


def _rec(op: int, data: bytes) -> bytes:
    return struct.pack("<HH", op, len(data)) + data


def write_xls(sheets: dict[str, list[list]]) -> bytes:
    """Minimal BIFF8-in-OLE2 writer — enough to round-trip
    ``read_sheet_xls`` in tests and fabricate the reference's cached
    ``.XLS`` downloads deterministically. Emits LABELSST (via a real
    SST), NUMBER, and BOOLERR records; not a general-purpose writer.
    """
    # Collect shared strings across all sheets (Excel's actual layout).
    strings: list[str] = []
    index: dict[str, int] = {}
    n_cells = 0
    for rows in sheets.values():
        for row in rows:
            for val in row:
                if isinstance(val, str):
                    n_cells += 1
                    if val not in index:
                        index[val] = len(strings)
                        strings.append(val)

    def sheet_substream(rows: list[list]) -> bytes:
        out = bytearray(_rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0)))
        for r, row in enumerate(rows):
            for c, val in enumerate(row):
                if val is None:
                    continue
                if isinstance(val, bool):
                    out += _rec(_BOOLERR, struct.pack("<HHHBB", r, c, 0, int(val), 0))
                elif isinstance(val, str):
                    out += _rec(
                        _LABELSST, struct.pack("<HHHI", r, c, 0, index[val])
                    )
                else:
                    out += _rec(_NUMBER, struct.pack("<HHHd", r, c, 0, float(val)))
        out += _rec(_EOF, b"")
        return bytes(out)

    bodies = [sheet_substream(rows) for rows in sheets.values()]
    sst_data = struct.pack("<II", n_cells, len(strings)) + b"".join(
        _biff_string(s) for s in strings
    )

    # Two-pass assembly: BOUNDSHEET records store absolute BOF offsets.
    def globals_substream(offsets: list[int]) -> bytes:
        out = bytearray(_rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0)))
        for (name, _), pos in zip(sheets.items(), offsets):
            try:
                nm = struct.pack("<B", len(name)) + b"\x00" + name.encode("latin-1")
            except UnicodeEncodeError:
                nm = (
                    struct.pack("<B", len(name))
                    + b"\x01"
                    + name.encode("utf-16-le")
                )
            out += _rec(_BOUNDSHEET, struct.pack("<IH", pos, 0) + nm)
        out += _rec(_SST, sst_data)
        out += _rec(_EOF, b"")
        return bytes(out)

    glob = globals_substream([0] * len(bodies))
    offsets = []
    pos = len(glob)
    for b in bodies:
        offsets.append(pos)
        pos += len(b)
    glob = globals_substream(offsets)
    assert len(globals_substream([0] * len(bodies))) == len(glob)
    biff = glob + b"".join(bodies)

    return _ole2_container(biff)


def _ole2_container(stream: bytes) -> bytes:
    """Wrap a stream as /Workbook in a single-FAT-sector OLE2 file.

    The stream is padded to >= 4096 bytes so it lives in the regular
    FAT (no ministream needed); one FAT sector addresses 64 KB, far
    beyond any fixture. The READER still handles ministreams, so it
    accepts real-world small files too.
    """
    size = len(stream)
    padded = stream + b"\x00" * (max(4096, (size + 511) // 512 * 512) - size)
    # The zero tail is declared part of the stream so it stays >= the
    # 4096 mini cutoff and lives in the regular FAT (trailing zeros
    # after the final EOF record are ignored by BIFF readers).
    size = len(padded)
    n_stream = len(padded) // 512
    # sector 0: FAT, sector 1: directory, sectors 2..: the stream
    fat = [_FATSECT, _ENDOFCHAIN]
    fat += [2 + i + 1 for i in range(n_stream - 1)] + [_ENDOFCHAIN]
    fat += [_FREESECT] * (128 - len(fat))
    fat_sector = struct.pack("<128I", *fat)

    def dirent(name: str, typ: int, start: int, sz: int, child: int) -> bytes:
        raw = name.encode("utf-16-le") + b"\x00\x00"
        ent = bytearray(128)
        ent[0 : len(raw)] = raw
        struct.pack_into("<H", ent, 64, len(raw))
        ent[66] = typ
        ent[67] = 1  # black
        struct.pack_into("<iii", ent, 68, -1, -1, child)
        struct.pack_into("<I", ent, 116, start)
        struct.pack_into("<Q", ent, 120, sz)
        return bytes(ent)

    directory = (
        dirent("Root Entry", 5, _ENDOFCHAIN, 0, 1)
        + dirent("Workbook", 2, 2, size, -1)
        + bytes(128)
        + bytes(128)
    )

    header = bytearray(512)
    header[0:8] = OLE_MAGIC
    struct.pack_into("<H", header, 24, 0x003E)  # minor version
    struct.pack_into("<H", header, 26, 0x0003)  # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)  # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)  # 64-byte minisectors
    struct.pack_into("<I", header, 44, 1)  # 1 FAT sector
    struct.pack_into("<I", header, 48, 1)  # directory at sector 1
    struct.pack_into("<I", header, 56, 4096)  # mini cutoff
    struct.pack_into("<i", header, 60, -2)  # no miniFAT
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<i", header, 68, -2)  # no DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    struct.pack_into("<I", header, 76, 0)  # DIFAT[0] = FAT sector 0
    for i in range(1, 109):
        struct.pack_into("<i", header, 76 + i * 4, -1)

    return bytes(header) + fat_sector + directory + padded
