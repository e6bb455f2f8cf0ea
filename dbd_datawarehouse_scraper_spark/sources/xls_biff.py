"""Minimal legacy ``.xls`` (BIFF8) reader, pure stdlib.

The reference accepts legacy ``.xls`` company lists via pandas/xlrd
(scraper_v2.py:522-556); minimal images have neither. This module reads
the flat sheets those inputs use — a header row plus string/number
cells — directly from the two public binary formats involved:

- **MS-CFB**: the OLE2 compound-file container (512-byte header, DIFAT
  → FAT → sector chains, 128-byte directory entries, mini-stream for
  streams under the 4096-byte cutoff);
- **MS-XLS**: the BIFF8 record stream inside the ``Workbook`` entry
  (BOUNDSHEET sheet directory, SST shared strings with CONTINUE
  segmentation, LABELSST/NUMBER/RK/MULRK/LABEL cell records).

Scope is deliberately minimal: no formulas, no rich-text runs beyond
skipping them, no 1904 date handling (the reference's inputs are names
and registration numbers). Anything structurally unexpected raises
``ValueError`` — the caller turns that into a conversion-path message.

Driver-side by design, like the xlsx fallback: Excel inputs are small
human-curated lists; the 100 TB side of the engine is never Excel.
"""

from __future__ import annotations

import struct


_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREESECT = -1


def _cfb_open_stream(data: bytes, names: tuple[str, ...]) -> bytes:
    """Return the bytes of the first directory stream matching one of
    ``names`` from an in-memory CFB file."""
    if data[:8] != _CFB_MAGIC:
        raise ValueError("not an OLE2 compound file")
    ssz = 1 << struct.unpack_from("<H", data, 30)[0]
    mssz = 1 << struct.unpack_from("<H", data, 32)[0]
    n_fat = struct.unpack_from("<I", data, 44)[0]
    dir_start = struct.unpack_from("<i", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    minifat_start = struct.unpack_from("<i", data, 60)[0]
    difat_start = struct.unpack_from("<i", data, 68)[0]
    n_difat = struct.unpack_from("<I", data, 72)[0]

    def sector(sid: int) -> bytes:
        off = 512 + sid * ssz
        if off + ssz > len(data):
            raise ValueError("sector beyond end of file")
        return data[off : off + ssz]

    per = ssz // 4
    difat = list(struct.unpack_from("<109i", data, 76))
    sid = difat_start
    for _ in range(n_difat):
        vals = struct.unpack(f"<{per}i", sector(sid))
        difat.extend(vals[:-1])
        sid = vals[-1]
    fat: list[int] = []
    for fsid in [s for s in difat if s >= 0][:n_fat]:
        fat.extend(struct.unpack(f"<{per}i", sector(fsid)))

    def chain(start: int, table: list[int]) -> list[int]:
        out, seen, cur = [], set(), start
        while cur >= 0:
            if cur in seen or cur >= len(table):
                raise ValueError("corrupt sector chain")
            seen.add(cur)
            out.append(cur)
            cur = table[cur]
        return out

    dirdata = b"".join(sector(s) for s in chain(dir_start, fat))
    entries = []
    for off in range(0, len(dirdata) - 127, 128):
        nlen = struct.unpack_from("<H", dirdata, off + 64)[0]
        name = dirdata[off : off + max(0, nlen - 2)].decode(
            "utf-16-le", errors="ignore"
        )
        etype = dirdata[off + 66]
        start = struct.unpack_from("<i", dirdata, off + 116)[0]
        size = struct.unpack_from("<Q", dirdata, off + 120)[0]
        entries.append((name, etype, start, size))

    target = next((e for e in entries if e[0] in names and e[1] == 2), None)
    if target is None:
        raise ValueError(f"no {'/'.join(names)} stream in compound file")
    _, _, start, size = target

    if size >= mini_cutoff:
        raw = b"".join(sector(s) for s in chain(start, fat))
        return raw[:size]

    # small stream: bytes live in the root entry's mini stream,
    # addressed by the mini FAT in 64-byte mini sectors
    root = next((e for e in entries if e[1] == 5), None)
    if root is None:
        raise ValueError("compound file has no root entry")
    ministream = b"".join(sector(s) for s in chain(root[2], fat))[: root[3]]
    minifat: list[int] = []
    if minifat_start >= 0:
        for s in chain(minifat_start, fat):
            minifat.extend(struct.unpack(f"<{per}i", sector(s)))
    raw = b"".join(
        ministream[ms * mssz : (ms + 1) * mssz] for ms in chain(start, minifat)
    )
    return raw[:size]


class _SegReader:
    """Reader over SST + CONTINUE record payloads. Character data that
    spills into a CONTINUE record restarts with a fresh grbit byte —
    the one genuinely tricky rule in BIFF8 string storage."""

    def __init__(self, segments: list[bytes]):
        self._segs = segments
        self._i = 0
        self._o = 0

    def _avail(self) -> int:
        return len(self._segs[self._i]) - self._o

    def _advance(self) -> None:
        while self._i < len(self._segs) - 1 and self._avail() == 0:
            self._i += 1
            self._o = 0

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            self._advance()
            take = min(n, self._avail())
            if take == 0:
                raise ValueError("truncated SST")
            out += self._segs[self._i][self._o : self._o + take]
            self._o += take
            n -= take
        return bytes(out)

    def read_string(self) -> str:
        cch = struct.unpack("<H", self.read(2))[0]
        flags = self.read(1)[0]
        high = flags & 0x01
        ext = flags & 0x04
        rich = flags & 0x08
        crun = struct.unpack("<H", self.read(2))[0] if rich else 0
        cbext = struct.unpack("<I", self.read(4))[0] if ext else 0
        remaining, text = cch, []
        while remaining > 0:
            if self._avail() == 0:
                self._advance()
                high = self.read(1)[0] & 0x01  # fresh grbit per CONTINUE
            if high:
                take = min(remaining, self._avail() // 2)
                text.append(self.read(take * 2).decode("utf-16-le"))
            else:
                take = min(remaining, self._avail())
                text.append(self.read(take).decode("latin-1"))
            if take == 0:
                raise ValueError("truncated SST string")
            remaining -= take
        if crun:
            self.read(4 * crun)
        if cbext:
            self.read(cbext)
        return "".join(text)


def _rk_value(rk: int) -> float:
    """``rk`` is the signed 32-bit RK field: bit0 = ÷100, bit1 = int
    payload (arithmetic shift) vs high 30 bits of an IEEE double."""
    if rk & 0x02:
        val = float(rk >> 2)  # Python >> on negatives is arithmetic
    else:
        val = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    return val / 100.0 if rk & 0x01 else val


def _num_str(value: float) -> str:
    return str(int(value)) if value == int(value) and abs(value) < 1e15 else str(value)


def _short_string(data: bytes, off: int) -> tuple[str, int]:
    """ShortXLUnicodeString (BOUNDSHEET names): cch u8, grbit u8."""
    cch = data[off]
    high = data[off + 1] & 0x01
    if high:
        return data[off + 2 : off + 2 + 2 * cch].decode("utf-16-le"), off + 2 + 2 * cch
    return data[off + 2 : off + 2 + cch].decode("latin-1"), off + 2 + cch


def read_xls(path: str, sheet_name: str | int = 0):
    """Parse a BIFF8 ``.xls`` into a string-typed pandas DataFrame with
    the first row as header — the same contract as the minimal xlsx
    reader (files.py)."""
    import pandas as pd

    with open(path, "rb") as fh:
        data = fh.read()
    stream = _cfb_open_stream(data, ("Workbook", "Book"))

    # pass 1: record index, sheet directory, shared strings
    records: list[tuple[int, int, int]] = []  # (opcode, data_off, length)
    off = 0
    while off + 4 <= len(stream):
        op, ln = struct.unpack_from("<HH", stream, off)
        if op == 0x0000 and ln == 0x0000:
            break  # zero padding after the last EOF
        records.append((op, off + 4, ln))
        off += 4 + ln

    sheets: list[tuple[str, int]] = []  # (name, stream offset of sheet BOF)
    sst: list[str] = []
    for idx, (op, doff, ln) in enumerate(records):
        if op == 0x0085:  # BOUNDSHEET
            pos = struct.unpack_from("<I", stream, doff)[0]
            name, _ = _short_string(stream, doff + 6)
            sheets.append((name, pos))
        elif op == 0x00FC:  # SST (+ following CONTINUEs)
            segs = [stream[doff + 8 : doff + ln]]  # skip total/unique counts
            unique = struct.unpack_from("<I", stream, doff + 4)[0]
            for op2, doff2, ln2 in records[idx + 1 :]:
                if op2 != 0x003C:  # CONTINUE
                    break
                segs.append(stream[doff2 : doff2 + ln2])
            reader = _SegReader(segs)
            sst = [reader.read_string() for _ in range(unique)]

    if not sheets:
        raise ValueError("BIFF stream has no BOUNDSHEET records")
    if isinstance(sheet_name, int):
        if not 0 <= sheet_name < len(sheets):
            raise ValueError(f"sheet index {sheet_name} out of range")
        target_off = sheets[sheet_name][1]
    else:
        match = next((p for n, p in sheets if n == sheet_name), None)
        if match is None:
            raise ValueError(f"no sheet named {sheet_name!r}")
        target_off = match

    # pass 2: cell records of the selected sheet substream (BOF..EOF)
    cells: dict[int, dict[int, str]] = {}

    def put(row: int, col: int, value: str) -> None:
        cells.setdefault(row, {})[col] = value

    off = target_off
    depth = 0
    while off + 4 <= len(stream):
        op, ln = struct.unpack_from("<HH", stream, off)
        doff = off + 4
        if op == 0x0809:  # BOF
            depth += 1
        elif op == 0x000A:  # EOF
            depth -= 1
            if depth <= 0:
                break
        elif op == 0x00FD:  # LABELSST
            row, col = struct.unpack_from("<HH", stream, doff)
            isst = struct.unpack_from("<I", stream, doff + 6)[0]
            put(row, col, sst[isst])
        elif op == 0x0203:  # NUMBER
            row, col = struct.unpack_from("<HH", stream, doff)
            put(row, col, _num_str(struct.unpack_from("<d", stream, doff + 6)[0]))
        elif op == 0x027E:  # RK
            row, col = struct.unpack_from("<HH", stream, doff)
            put(row, col, _num_str(_rk_value(struct.unpack_from("<i", stream, doff + 6)[0])))
        elif op == 0x00BD:  # MULRK
            row, col0 = struct.unpack_from("<HH", stream, doff)
            n = (ln - 6) // 6
            for i in range(n):
                rk = struct.unpack_from("<i", stream, doff + 4 + 6 * i + 2)[0]
                put(row, col0 + i, _num_str(_rk_value(rk)))
        elif op == 0x0204:  # LABEL (inline string cell)
            row, col = struct.unpack_from("<HH", stream, doff)
            cch = struct.unpack_from("<H", stream, doff + 6)[0]
            high = stream[doff + 8] & 0x01
            raw = stream[doff + 9 : doff + 9 + (2 * cch if high else cch)]
            put(row, col, raw.decode("utf-16-le" if high else "latin-1"))
        off = doff + ln

    if not cells:
        return pd.DataFrame()
    width = max(max(r) for r in cells.values()) + 1
    ordered = [
        [cells.get(ri, {}).get(ci) for ci in range(width)]
        for ri in range(max(cells) + 1)
    ]
    header = [
        h if h is not None else f"col{i}" for i, h in enumerate(ordered[0])
    ]
    return pd.DataFrame(ordered[1:], columns=header, dtype=object)
