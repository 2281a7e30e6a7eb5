"""Minimal XLS (BIFF8) reader — stdlib only.

Covers the reference's HSSF path (ExcelParser.java:80-81 builds an
HSSFWorkbook; the golden fixture is src/test/resources/test.xls). Formats
are public: [MS-CFB] (OLE2 compound file) + [MS-XLS] (BIFF8 record stream).

Scope: first worksheet, the cell record types the reference's switch can
produce values from (ExcelParser.java:236-249) — LABELSST/LABEL (STRING),
NUMBER/RK/MULRK (NUMERIC, with date-format detection via the XF/FORMAT
tables), BOOLERR (BOOLEAN / ERROR). FORMULA cells are skipped like the
reference. Output is the same :class:`Sheet` shape the xlsx reader
produces, so row-extraction semantics (column count, contiguous item count,
null suppression) are shared via ``sheet_to_documents``.
"""

from __future__ import annotations

import struct

from excelastic_spark.sources.workbook import (
    Cell,
    Sheet,
    WorkbookError,
    is_date_format,
)

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREE = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE


def _read_chain(data: bytes, fat: list[int], start: int, sector_size: int,
                header_size: int) -> bytes:
    out = []
    sect = start
    seen = 0
    limit = len(fat) + 2
    while sect != _ENDOFCHAIN and sect != _FREE:
        off = header_size + sect * sector_size
        out.append(data[off:off + sector_size])
        if sect >= len(fat) or (seen := seen + 1) > limit:
            raise WorkbookError("corrupt CFB FAT chain")
        sect = fat[sect]
    return b"".join(out)


def cfb_stream(data: bytes, names: tuple[str, ...]) -> bytes:
    """Extract the first stream whose name matches ``names`` from an OLE2
    compound file ([MS-CFB] §2)."""
    if data[:8] != _CFB_MAGIC:
        raise WorkbookError("not an OLE2 compound file")
    (sector_shift,) = struct.unpack_from("<H", data, 30)
    (mini_shift,) = struct.unpack_from("<H", data, 32)
    sector_size = 1 << sector_shift
    mini_size = 1 << mini_shift
    (n_fat,) = struct.unpack_from("<I", data, 44)
    (dir_start,) = struct.unpack_from("<I", data, 48)
    (mini_cutoff,) = struct.unpack_from("<I", data, 56)
    (minifat_start,) = struct.unpack_from("<I", data, 60)
    (n_minifat,) = struct.unpack_from("<I", data, 64)
    (difat_start,) = struct.unpack_from("<I", data, 68)
    (n_difat,) = struct.unpack_from("<I", data, 72)

    # DIFAT: 109 entries in header + chained DIFAT sectors
    difat = list(struct.unpack_from("<109I", data, 76))
    sect = difat_start
    per = sector_size // 4 - 1
    for _ in range(n_difat):
        off = 512 + sect * sector_size
        vals = struct.unpack_from(f"<{per + 1}I", data, off)
        difat.extend(vals[:-1])
        sect = vals[-1]
        if sect in (_ENDOFCHAIN, _FREE):
            break
    fat: list[int] = []
    for fs in difat[:n_fat]:
        if fs in (_ENDOFCHAIN, _FREE):
            continue
        off = 512 + fs * sector_size
        fat.extend(struct.unpack_from(f"<{sector_size // 4}I", data, off))

    directory = _read_chain(data, fat, dir_start, sector_size, 512)
    entries = []
    for i in range(len(directory) // 128):
        e = directory[i * 128:(i + 1) * 128]
        (name_len,) = struct.unpack_from("<H", e, 64)
        name = e[: max(0, name_len - 2)].decode("utf-16-le", "ignore")
        obj_type = e[66]
        (start,) = struct.unpack_from("<I", e, 116)
        (size,) = struct.unpack_from("<Q", e, 120)
        entries.append((name, obj_type, start, size))
    target = None
    for name, obj_type, start, size in entries:
        if obj_type == 2 and name in names:
            target = (start, size)
            break
    if target is None:
        raise WorkbookError(f"no {names} stream in compound file")
    start, size = target
    if size >= mini_cutoff:
        return _read_chain(data, fat, start, sector_size, 512)[:size]
    # mini-stream: root entry's chain holds the ministream bytes
    root = next(e for e in entries if e[1] == 5)
    ministream = _read_chain(data, fat, root[2], sector_size, 512)
    minifat: list[int] = []
    sect = minifat_start
    for _ in range(n_minifat):
        off = 512 + sect * sector_size
        minifat.extend(struct.unpack_from(f"<{sector_size // 4}I", data, off))
        sect = fat[sect]
        if sect in (_ENDOFCHAIN, _FREE):
            break
    out = []
    msect = start
    while msect not in (_ENDOFCHAIN, _FREE):
        out.append(ministream[msect * mini_size:(msect + 1) * mini_size])
        msect = minifat[msect]
    return b"".join(out)[:size]


# --------------------------------------------------------------------------
# BIFF8 record stream

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
_BOOLERR = 0x0205
_FORMULA = 0x0006
_ROW = 0x0208
_BLANK = 0x0201
_MULBLANK = 0x00BE
_FORMAT = 0x041E
_XF = 0x00E0
_DATE1904 = 0x0022

# BIFF built-in formats that FORMAT records may not restate (subset needed
# for date detection; ids match ECMA/OOXML builtins)
_SHEET_DT = 0x0010


def _records(stream: bytes, pos: int = 0):
    n = len(stream)
    while pos + 4 <= n:
        rtype, rlen = struct.unpack_from("<HH", stream, pos)
        yield rtype, stream[pos + 4:pos + 4 + rlen], pos
        pos += 4 + rlen


class _SSTReader:
    """XLUnicodeRichExtendedString array spanning SST + CONTINUE records.
    At each CONTINUE boundary that falls inside character data, a fresh
    option byte precedes the remaining characters ([MS-XLS] §2.5.293)."""

    def __init__(self, chunks: list[bytes]):
        self.chunks = chunks
        self.ci = 0
        self.pos = 0

    def _remaining(self) -> int:
        return len(self.chunks[self.ci]) - self.pos

    def _advance(self) -> None:
        while self.ci < len(self.chunks) and self._remaining() == 0:
            self.ci += 1
            self.pos = 0

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n:
            self._advance()
            take = min(n, self._remaining())
            c = self.chunks[self.ci]
            out += c[self.pos:self.pos + take]
            self.pos += take
            n -= take
        return bytes(out)

    def read_string(self) -> str:
        cch, grbit = struct.unpack("<HB", self.read(3))
        rich = bool(grbit & 0x08)
        ext = bool(grbit & 0x04)
        c_run = struct.unpack("<H", self.read(2))[0] if rich else 0
        cb_ext = struct.unpack("<I", self.read(4))[0] if ext else 0
        high = bool(grbit & 0x01)
        chars: list[str] = []
        remaining = cch
        while remaining:
            self._advance()
            avail = self._remaining()
            if avail == 0:
                raise WorkbookError("truncated SST")
            if high:
                take = min(remaining, avail // 2)
                if take == 0:
                    raise WorkbookError("split utf-16 char in SST")
                chars.append(self.read(take * 2).decode("utf-16-le"))
            else:
                take = min(remaining, avail)
                chars.append(self.read(take).decode("latin-1"))
            remaining -= take
            if remaining:
                # continuation boundary: new option byte for the rest
                (grbit2,) = struct.unpack("<B", self.read(1))
                high = bool(grbit2 & 0x01)
        self.read(4 * c_run + cb_ext)
        return "".join(chars)


def _decode_rk(rk: int) -> float:
    f_x100 = rk & 0x01
    f_int = rk & 0x02
    if f_int:
        val = rk >> 2
        if val & 0x20000000:  # sign-extend 30-bit
            val -= 0x40000000
        num = float(val)
    else:
        num = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    return num / 100.0 if f_x100 else num


def _unistr(data: bytes, pos: int) -> str:
    """Single-record XLUnicodeString (LABEL payloads)."""
    cch, grbit = struct.unpack_from("<HB", data, pos)
    pos += 3
    if grbit & 0x08:
        pos += 2
    if grbit & 0x04:
        pos += 4
    if grbit & 0x01:
        return data[pos:pos + 2 * cch].decode("utf-16-le")
    return data[pos:pos + cch].decode("latin-1")


def load_xls(data: bytes) -> tuple[Sheet, bool]:
    """Parse the first worksheet of an xls payload -> (Sheet, date1904)."""
    wb = cfb_stream(data, ("Workbook", "Book"))
    # ---- workbook globals substream ----
    sst: list[str] = []
    formats: dict[int, str] = {}
    xf_fmts: list[int] = []
    sheet_offsets: list[int] = []
    date1904 = False
    it = _records(wb)
    first = next(it, None)
    if first is None or first[0] != _BOF:
        raise WorkbookError("xls: missing workbook BOF")
    for rtype, payload, pos in it:
        if rtype == _EOF:
            break
        if rtype == _BOUNDSHEET:
            (lb,) = struct.unpack_from("<I", payload, 0)
            sheet_offsets.append(lb)
        elif rtype == _DATE1904:
            date1904 = struct.unpack_from("<H", payload, 0)[0] == 1
        elif rtype == _FORMAT:
            (ifmt,) = struct.unpack_from("<H", payload, 0)
            formats[ifmt] = _unistr(payload, 2)
        elif rtype == _XF:
            (ifmt,) = struct.unpack_from("<H", payload, 2)
            xf_fmts.append(ifmt)
        elif rtype == _SST:
            chunks = [payload[8:]]
            # gather immediately-following CONTINUE records
            save = pos
            for rt2, pl2, _ in _records(wb, pos + 4 + len(payload)):
                if rt2 != _CONTINUE:
                    break
                chunks.append(pl2)
            (cst_unique,) = struct.unpack_from("<I", payload, 4)
            rd = _SSTReader(chunks)
            for _ in range(cst_unique):
                sst.append(rd.read_string())

    if not sheet_offsets:
        raise WorkbookError("xls: no sheets")

    def is_date(ixfe: int) -> bool:
        if ixfe >= len(xf_fmts):
            return False
        ifmt = xf_fmts[ixfe]
        return is_date_format(ifmt, formats.get(ifmt))

    # ---- first worksheet substream ----
    rows: dict[int, dict[int, Cell]] = {}
    present: set[int] = set()

    def put(rw: int, col: int, cell: Cell | None) -> None:
        present.add(rw)
        if cell is not None:
            rows.setdefault(rw, {})[col] = cell

    start = sheet_offsets[0]
    if wb[start:start + 2] != struct.pack("<H", _BOF):
        raise WorkbookError("xls: bad sheet offset")
    for rtype, payload, _ in _records(wb, start):
        if rtype == _EOF:
            break
        elif rtype == _ROW:
            (rw,) = struct.unpack_from("<H", payload, 0)
            present.add(rw)
        elif rtype == _LABELSST:
            rw, col, _ixfe, isst = struct.unpack_from("<HHHI", payload, 0)
            put(rw, col, Cell("s", sst[isst]))
        elif rtype == _LABEL:
            rw, col, _ixfe = struct.unpack_from("<HHH", payload, 0)
            put(rw, col, Cell("s", _unistr(payload, 6)))
        elif rtype == _NUMBER:
            rw, col, ixfe = struct.unpack_from("<HHH", payload, 0)
            (num,) = struct.unpack_from("<d", payload, 6)
            put(rw, col, Cell("n", num, is_date=is_date(ixfe)))
        elif rtype == _RK:
            rw, col, ixfe, rk = struct.unpack_from("<HHHI", payload, 0)
            put(rw, col, Cell("n", _decode_rk(rk), is_date=is_date(ixfe)))
        elif rtype == _MULRK:
            rw, col_first = struct.unpack_from("<HH", payload, 0)
            (col_last,) = struct.unpack_from("<H", payload, len(payload) - 2)
            for j in range(col_last - col_first + 1):
                ixfe, rk = struct.unpack_from("<HI", payload, 4 + 6 * j)
                put(rw, col_first + j,
                    Cell("n", _decode_rk(rk), is_date=is_date(ixfe)))
        elif rtype == _BOOLERR:
            rw, col, _ixfe, val, f_err = struct.unpack_from(
                "<HHHBB", payload, 0
            )
            # ERROR cells: no case in the reference switch -> skipped
            put(rw, col, None if f_err else Cell("b", bool(val)))
        elif rtype in (_BLANK,):
            (rw,) = struct.unpack_from("<H", payload, 0)
            present.add(rw)
        elif rtype == _MULBLANK:
            (rw,) = struct.unpack_from("<H", payload, 0)
            present.add(rw)
        elif rtype == _FORMULA:
            (rw,) = struct.unpack_from("<H", payload, 0)
            present.add(rw)  # cell exists; value skipped like the reference
    return Sheet(rows, present), date1904


def parse_xls_rows(data: bytes, offset: int = 1) -> tuple[list[str], list[dict]]:
    from excelastic_spark.sources.workbook import sheet_to_documents

    sheet, date1904 = load_xls(data)
    return sheet_to_documents(sheet, offset, date1904)
