"""Compound File Binary (OLE2 / MS-CFB) reader + minimal writer.

Legacy binary Office formats (.doc, .xls) are CFB containers holding named
streams ("WordDocument", "1Table", "Workbook").  The reference extracts
them through Tika (BasicGeoTemporalProcessing.java:135-157); this engine
parses the container directly with the stdlib — the published [MS-CFB]
structure needs nothing beyond ``struct``:

* header: 512 bytes — magic D0CF11E0A1B11AE1, sector-size shift, DIFAT
  head (109 FAT sector numbers inline), first directory sector;
* FAT: uint32 per sector forming next-sector chains;
* directory: 128-byte entries (UTF-16 name, type, start sector, size);
* streams below the 4096-byte mini cutoff chain through the mini-FAT over
  the root entry's mini stream (64-byte mini sectors).

The writer emits minimal-but-conformant single-level containers (512-byte
sectors, header DIFAT only, streams padded past the mini cutoff so the
regular FAT serves everything) — enough for deterministic .doc/.xls test
fixtures that ALSO follow the real layout a Word/Excel reader expects.
"""

from __future__ import annotations

import struct

MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD


def is_cfb(payload: bytes) -> bool:
    return payload[:8] == MAGIC


class CfbReader:
    def __init__(self, payload: bytes):
        if not is_cfb(payload):
            raise ValueError("not a CFB (OLE2) payload")
        self.buf = payload
        (self.sector_shift,) = struct.unpack_from("<H", payload, 30)
        (self.mini_shift,) = struct.unpack_from("<H", payload, 32)
        (self.n_fat,) = struct.unpack_from("<I", payload, 44)
        (self.dir_start,) = struct.unpack_from("<I", payload, 48)
        (self.mini_cutoff,) = struct.unpack_from("<I", payload, 56)
        (self.minifat_start,) = struct.unpack_from("<I", payload, 60)
        (self.n_minifat,) = struct.unpack_from("<I", payload, 64)
        (self.difat_start,) = struct.unpack_from("<I", payload, 68)
        (self.n_difat,) = struct.unpack_from("<I", payload, 72)
        self.ssz = 1 << self.sector_shift
        self.mssz = 1 << self.mini_shift

        # DIFAT: 109 header entries + optional DIFAT sector chain
        difat = list(struct.unpack_from("<109I", payload, 76))
        s = self.difat_start
        per = self.ssz // 4 - 1
        for _ in range(self.n_difat):
            ent = struct.unpack_from(f"<{per + 1}I", payload,
                                     self._off(s))
            difat.extend(ent[:per])
            s = ent[per]
        self.fat: list[int] = []
        per_fat = self.ssz // 4
        for fs in difat:
            if fs in (_FREESECT, _ENDOFCHAIN):
                continue
            self.fat.extend(struct.unpack_from(f"<{per_fat}I", payload,
                                               self._off(fs)))

        # directory entries
        self.entries: list[dict] = []
        for sec in self._chain(self.dir_start):
            off = self._off(sec)
            for k in range(self.ssz // 128):
                e = off + k * 128
                (nlen,) = struct.unpack_from("<H", payload, e + 64)
                if nlen < 2:
                    continue
                name = payload[e:e + nlen - 2].decode("utf-16-le")
                otype = payload[e + 66]
                (start,) = struct.unpack_from("<I", payload, e + 116)
                (size,) = struct.unpack_from("<Q", payload, e + 120)
                self.entries.append({"name": name, "type": otype,
                                     "start": start, "size": size})
        root = next(e for e in self.entries if e["type"] == 5)
        self._mini_container = self._read_chain(root["start"], root["size"])
        self.minifat: list[int] = []
        per_fat = self.ssz // 4
        for sec in self._chain(self.minifat_start) \
                if self.minifat_start != _ENDOFCHAIN else []:
            self.minifat.extend(struct.unpack_from(
                f"<{per_fat}I", payload, self._off(sec)))

    def _off(self, sector: int) -> int:
        return 512 + sector * self.ssz

    def _chain(self, start: int) -> list[int]:
        out = []
        s = start
        seen = set()
        while s not in (_ENDOFCHAIN, _FREESECT) and s < len(self.fat):
            if s in seen:
                raise ValueError("CFB FAT chain cycle")
            seen.add(s)
            out.append(s)
            s = self.fat[s]
        return out

    def _read_chain(self, start: int, size: int) -> bytes:
        parts = [self.buf[self._off(s):self._off(s) + self.ssz]
                 for s in self._chain(start)]
        return b"".join(parts)[:size]

    def _read_mini(self, start: int, size: int) -> bytes:
        parts = []
        s = start
        seen = set()
        while s not in (_ENDOFCHAIN, _FREESECT) and s < len(self.minifat):
            if s in seen:
                raise ValueError("CFB miniFAT chain cycle")
            seen.add(s)
            parts.append(self._mini_container[s * self.mssz:
                                              (s + 1) * self.mssz])
            s = self.minifat[s]
        return b"".join(parts)[:size]

    def stream_names(self) -> list[str]:
        return [e["name"] for e in self.entries if e["type"] == 2]

    def read_stream(self, name: str) -> bytes:
        e = next((e for e in self.entries
                  if e["type"] == 2 and e["name"] == name), None)
        if e is None:
            raise KeyError(name)
        if e["size"] < self.mini_cutoff:
            return self._read_mini(e["start"], e["size"])
        return self._read_chain(e["start"], e["size"])


def write_cfb(streams: dict[str, bytes]) -> bytes:
    """Minimal conformant CFB: 512-byte sectors, header-DIFAT only, every
    stream padded past the 4096-byte mini cutoff (so no mini-FAT needed).
    Suitable for a handful of streams (test fixtures)."""
    ssz = 512
    names = list(streams)
    datas = []
    for n in names:
        d = streams[n]
        # pad CONTENT (and the recorded size) past the 4096-byte mini
        # cutoff: per [MS-CFB] a smaller stream must live in the mini
        # stream; zero-padding instead keeps the writer FAT-only and is
        # harmless to FIB-offset (.doc) and record-walking (.xls) readers
        if len(d) < 4096:
            d = d + b"\x00" * (4096 - len(d))
        padded = d + b"\x00" * ((-len(d)) % ssz)
        datas.append((d, padded))

    n_dir_entries = 1 + len(names)
    n_dir_sectors = (n_dir_entries * 128 + ssz - 1) // ssz
    data_sectors = [len(p) // ssz for _d, p in datas]
    # FAT layout: [fat sectors][dir sectors][stream sectors...]
    total_data = n_dir_sectors + sum(data_sectors)
    # solve FAT sector count (each FAT sector maps 128 sectors)
    n_fat = 1
    while (total_data + n_fat + 127) // 128 > n_fat:
        n_fat += 1
    if n_fat > 109:
        # the header DIFAT holds 109 FAT sector numbers; this writer does
        # not emit DIFAT chain sectors — fail loudly instead of writing a
        # silently-truncated container (review finding)
        raise ValueError(
            f"write_cfb supports up to ~7 MB of streams (109 FAT sectors); "
            f"needed {n_fat}")

    fat: list[int] = []
    for i in range(n_fat):
        fat.append(_FATSECT)
    dir_start = len(fat)
    for i in range(n_dir_sectors):
        fat.append(dir_start + i + 1 if i < n_dir_sectors - 1
                   else _ENDOFCHAIN)
    starts = []
    for cnt in data_sectors:
        s0 = len(fat)
        starts.append(s0)
        for i in range(cnt):
            fat.append(s0 + i + 1 if i < cnt - 1 else _ENDOFCHAIN)
    while len(fat) % 128:
        fat.append(_FREESECT)

    # directory entries: root + streams (flat red-black tree: root's
    # child is entry 1; each entry's right sibling is the next)
    def dirent(name: str, otype: int, start: int, size: int,
               child: int, right: int) -> bytes:
        raw = name.encode("utf-16-le") + b"\x00\x00"
        e = bytearray(128)
        e[0:len(raw)] = raw
        struct.pack_into("<H", e, 64, len(raw))
        e[66] = otype
        e[67] = 1   # black
        struct.pack_into("<i", e, 68, -1)        # left
        struct.pack_into("<i", e, 72, right)     # right
        struct.pack_into("<i", e, 76, child)     # child
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    dirents = [dirent("Root Entry", 5, _ENDOFCHAIN, 0,
                      1 if names else -1, -1)]
    for i, n in enumerate(names):
        right = i + 2 if i + 1 < len(names) else -1
        dirents.append(dirent(n, 2, starts[i], len(datas[i][0]), -1, right))
    dirblob = b"".join(dirents)
    dirblob += b"\x00" * ((-len(dirblob)) % ssz)

    header = bytearray(512)
    header[0:8] = MAGIC
    struct.pack_into("<H", header, 24, 0x003E)   # minor version
    struct.pack_into("<H", header, 26, 0x0003)   # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)   # little-endian
    struct.pack_into("<H", header, 30, 9)        # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)        # 64-byte mini sectors
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<I", header, 48, dir_start)
    struct.pack_into("<I", header, 56, 4096)     # mini cutoff
    struct.pack_into("<I", header, 60, _ENDOFCHAIN)  # no miniFAT
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no DIFAT sectors
    struct.pack_into("<I", header, 72, 0)
    for i in range(109):
        struct.pack_into("<I", header, 76 + 4 * i,
                         i if i < n_fat else _FREESECT)

    fatblob = b"".join(struct.pack("<I", v) for v in fat)
    body = fatblob + dirblob + b"".join(p for _d, p in datas)
    return bytes(header) + body
