"""JPEG (ITU-T.81, 8-bit) — pure python/numpy.

Decoder: marker walk (SOI/APPn/DQT/DHT/SOF0/SOF2/DRI/SOS/RSTn/EOI),
canonical Huffman tables from BITS/HUFFVAL, bit reader with 0xFF00 byte
unstuffing, per-MCU entropy decode (DC prediction + AC run/length
zigzag), dequant, 8x8 IDCT as two numpy matrix products, libjpeg-style
triangle chroma upsampling, YCbCr->RGB.  Supports baseline sequential
(SOF0) AND — round 5 — progressive (SOF2, Annex G: spectral selection +
successive approximation, DC/AC first + refinement scans, EOB runs),
4:4:4 and 4:2:0 (any h/v factor combination the SOF declares),
grayscale, and restart intervals.  Arithmetic coding and 12-bit raise.

Encoder: the deterministic test-image counterpart — Annex K example
quantization + Huffman tables, 4:4:4, interchange format.  JPEG is lossy,
so roundtrips assert bounded pixel error; exactness evidence comes from
two-way cross-decoding against Java ImageIO (pinned in pytest).

No reference-repo counterpart exists for this file: the reference wraps
Tika/ImageMetadataExtractor for media (XText's conversion layer); this
module exists so the Spark pipeline's media columns decode with zero
native dependencies.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index i of the scan -> (row, col) of the 8x8 block
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# 8x8 DCT-II basis matrix: A[u, x] = c(u)/2 * cos((2x+1)u pi/16)
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _A.T @ block @ _A


def _dct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T

# Annex K.1 luminance / K.2 chrominance quantization tables (natural order)
_QY = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99])
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99])

# Annex K.3 Huffman table specs: (BITS[1..16], HUFFVAL)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman: (length, code) -> value."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    """value -> (code, length)."""
    enc = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            enc[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return enc


class _BitReader:
    """Entropy-coded segment reader: 0xFF00 unstuffing; 0xFFD0-D7 restart
    markers surface via ``at_marker``/``sync_restart``."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24:
            if self.pos >= len(self.d):
                self.cur = (self.cur << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = self.d[self.pos]
            if b == 0xFF:
                nxt = self.d[self.pos + 1] if self.pos + 1 < len(self.d) else 0
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: stop filling; sync_restart consumes
                    self.cur = (self.cur << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
                else:
                    # EOI or other marker: pad with zeros
                    self.cur = (self.cur << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.cur = ((self.cur << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: dict) -> int:
        ln = 0
        code = 0
        while ln < 16:
            code = (code << 1) | self.read_bit()
            ln += 1
            v = table.get((ln, code))
            if v is not None:
                return v
        raise ValueError("corrupt JPEG Huffman stream")

    def sync_restart(self):
        """Byte-align and consume the RSTn marker."""
        self.cur = 0
        self.nbits = 0
        while self.pos + 1 < len(self.d):
            if self.d[self.pos] == 0xFF and 0xD0 <= self.d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected JPEG restart marker")


def _extend(v: int, t: int) -> int:
    """DC/AC amplitude: t-bit value to signed (T.81 F.12)."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JPEG -> uint8 RGB (h, w, 3) (grayscale is
    replicated).  Progressive/arithmetic/12-bit raise."""
    if not payload or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}      # (class 0=DC/1=AC, id)
    comps = None
    w = h = None
    restart = 0
    progressive = False
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        (seg_len,) = struct.unpack_from(">H", payload, i + 2)
        body = payload[i + 4:i + 2 + seg_len]
        if marker == 0xC4:                      # DHT (possibly several)
            p = 0
            while p < len(body):
                tc_th = body[p]
                bits = list(body[p + 1:p + 17])
                n = sum(bits)
                vals = list(body[p + 17:p + 17 + n])
                if len(bits) < 16 or len(vals) < n:
                    raise ValueError("JPEG DHT segment truncated")
                huff[(tc_th >> 4, tc_th & 0x0F)] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xDB:                    # DQT
            p = 0
            while p < len(body):
                pq_tq = body[p]
                if pq_tq >> 4:
                    raise ValueError("16-bit quant tables not supported")
                tbl = np.zeros(64)
                tbl[_ZZ] = np.frombuffer(body[p + 1:p + 65], dtype=np.uint8)
                qt[pq_tq & 0x0F] = tbl.reshape(8, 8)
                p += 65
        elif marker in (0xC0, 0xC2):            # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            if len(body) < 6:
                raise ValueError("JPEG SOF segment truncated")
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if len(body) < 6 + 3 * nc:
                raise ValueError("JPEG SOF0 component list truncated")
            if w == 0 or h == 0:
                raise ValueError("JPEG frame with zero dimension")
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            if nc not in (1, 3):
                # 4-component Adobe CMYK/YCCK would silently decode the
                # first three planes as YCbCr — garbage pixels with no
                # error (review finding); raise like the other bounds
                raise ValueError(
                    f"JPEG with {nc} components not supported "
                    f"(grayscale and YCbCr only; CMYK/YCCK need an "
                    f"Adobe-transform path)")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError(
                        f"JPEG sampling factors {hs}x{vs} out of range")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential "
                f"(SOF0) and progressive (SOF2) supported")
        elif marker == 0xDD:                    # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:                    # SOS: entropy data follows
            if len(body) < 1 or len(body) < 1 + 2 * body[0]:
                raise ValueError("JPEG SOS segment truncated")
            ns = body[0]
            sel = {}
            for c in range(ns):
                cs, tables = body[1 + 2 * c], body[2 + 2 * c]
                sel[cs] = (tables >> 4, tables & 0x0F)
            # a corrupt stream with SOS before SOF, or missing DQT/DHT
            # tables, is a MALFORMED payload: raise ValueError here so
            # decoder='auto' hash-falls-back instead of a KeyError/
            # TypeError escaping _decode_scan mid-Arrow-stage (ADVICE r4)
            if comps is None:
                raise ValueError("JPEG SOS before SOF frame header")
            if progressive:
                # Annex G: hand the walk to the multi-scan decoder from
                # this SOS marker on (its scans validate their own
                # table needs — a DC-only scan needs no AC table)
                return _decode_progressive(payload, i, w, h, comps,
                                           qt, huff, restart)
            for comp in comps:
                if comp["id"] not in sel:
                    raise ValueError(
                        f"JPEG SOS missing component {comp['id']}")
                if comp["tq"] not in qt:
                    raise ValueError(
                        f"JPEG missing DQT table {comp['tq']}")
                dc_id, ac_id = sel[comp["id"]]
                if (0, dc_id) not in huff or (1, ac_id) not in huff:
                    raise ValueError(
                        f"JPEG missing DHT table for component {comp['id']}")
            data_start = i + 2 + seg_len
            return _decode_scan(payload, data_start, w, h, comps, sel,
                                qt, huff, restart)
        elif marker == 0xD9:                    # EOI
            break
        i += 2 + seg_len
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(payload, pos, w, h, comps, sel, qt, huff, restart):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    pred = [0] * len(comps)
    br = _BitReader(payload, pos)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                br.sync_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t = huff[(0, sel[c["id"]][0])]
                ac_t = huff[(1, sel[c["id"]][1])]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64)
                        t = br.decode(dc_t)
                        diff = _extend(br.read_bits(t), t) if t else 0
                        pred[ci] += diff
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = br.decode(ac_t)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break               # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index out of range")
                            coef[_ZZ[k]] = _extend(br.read_bits(s), s)
                            k += 1
                        block = _idct2(coef.reshape(8, 8) * q) + 128
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block
            n_mcu += 1
    return _planes_to_rgb(planes, comps, hmax, vmax, w, h)


def _up2(a: np.ndarray, axis: int) -> np.ndarray:
    """Factor-2 triangle upsampling along ``axis`` (libjpeg 'fancy'
    h2v1/h2v2 filter, 3:1 weights with edge clamping): decoders built on
    libjpeg (ImageIO included) use this, so matching it keeps subsampled
    cross-conformance within IDCT rounding instead of ~60 gray levels at
    chroma edges."""
    n = a.shape[axis]
    idx = np.arange(n)
    prev = a.take(np.maximum(idx - 1, 0), axis=axis)
    nxt = a.take(np.minimum(idx + 1, n - 1), axis=axis)
    even = (3 * a + prev) / 4
    odd = (3 * a + nxt) / 4
    out = np.stack([even, odd], axis=axis + 1)
    shape = list(a.shape)
    shape[axis] *= 2
    return out.reshape(shape)


def _planes_to_rgb(planes, comps, hmax, vmax, w, h) -> np.ndarray:
    """Shared reconstruction tail: chroma upsampling + YCbCr->RGB (or
    grayscale replication)."""
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy == 2:
            p = _up2(p, 0)
        elif fy > 1:
            p = np.repeat(p, fy, axis=0)
        if fx == 2:
            p = _up2(p, 1)
        elif fx > 1:
            p = np.repeat(p, fx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.dstack([g, g, g])
    y, cb, cr = full[0], full[1] - 128, full[2] - 128
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.dstack([r, g, b]), 0, 255).astype(np.uint8)


def _next_marker(payload: bytes, pos: int) -> int:
    """First real marker at/after ``pos``: skips entropy data, stuffed
    0xFF00 bytes, fill 0xFFs, and restart markers."""
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        nxt = payload[pos + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            pos += 2
        elif nxt == 0xFF:
            pos += 1
        else:
            return pos
    raise ValueError("JPEG entropy stream ends without a marker")


def _decode_progressive(payload, pos, w, h, comps, qt, huff, restart):
    """Progressive DCT decode (ITU-T.81 Annex G, round 5): scans
    accumulate DCT coefficients — DC first/refinement (interleaved or
    single-component), AC first with EOB runs, AC successive-
    approximation refinement — then one dequant+IDCT reconstruction.
    ``pos`` points at the first SOS marker; DHT/DQT/DRI may appear
    between scans and update the live tables."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coefs = []
    for c in comps:
        # MCU-padded block grid (interleaved scans cover it fully);
        # non-interleaved scans address the ceil(comp_size/8) prefix
        coefs.append(np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                              dtype=np.int64))
        comp_w = -(-w * c["h"] // hmax)        # ceil(w * h_i / hmax)
        comp_h = -(-h * c["v"] // vmax)
        c["bw"], c["bh"] = -(-comp_w // 8), -(-comp_h // 8)

    while pos + 1 < len(payload):
        marker = payload[pos + 1]
        if marker == 0xD9:                      # EOI
            break
        (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4:pos + 2 + seg_len]
        if marker == 0xC4:                      # DHT between scans
            p = 0
            while p < len(body):
                tc_th = body[p]
                bits = list(body[p + 1:p + 17])
                n = sum(bits)
                vals = list(body[p + 17:p + 17 + n])
                if len(bits) < 16 or len(vals) < n:
                    raise ValueError("JPEG DHT segment truncated")
                huff[(tc_th >> 4, tc_th & 0x0F)] = \
                    _build_decode_table(bits, vals)
                p += 17 + n
            pos += 2 + seg_len
        elif marker == 0xDD:
            (restart,) = struct.unpack_from(">H", body, 0)
            pos += 2 + seg_len
        elif marker == 0xDA:
            if len(body) < 4 or len(body) < 4 + 2 * body[0]:
                raise ValueError("JPEG SOS segment truncated")
            ns = body[0]
            scomps, tsel = [], {}
            for c in range(ns):
                cs, tables = body[1 + 2 * c], body[2 + 2 * c]
                match = [x for x in comps if x["id"] == cs]
                if not match:
                    raise ValueError(f"JPEG scan references unknown "
                                     f"component {cs}")
                scomps.append(match[0])
                tsel[cs] = (tables >> 4, tables & 0x0F)
            ss, se, ahal = body[1 + 2 * ns:4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if ss > se or se > 63:
                raise ValueError(f"JPEG bad spectral band {ss}..{se}")
            if ss == 0 and se != 0:
                raise ValueError("progressive DC scan must have Se=0 "
                                 "(a baseline-shaped 0..63 scan in a "
                                 "SOF2 frame is malformed)")
            if ss > 0 and ns != 1:
                raise ValueError("progressive AC scan must be "
                                 "single-component")
            data_start = pos + 2 + seg_len
            _progressive_scan(payload, data_start, comps, scomps, tsel,
                              coefs, huff, restart, mcux, mcuy,
                              ss, se, ah, al)
            pos = _next_marker(payload, data_start)
        elif marker in (0xD8, 0x01):            # length-less markers
            pos += 2
        else:                                   # APPn/COM/DQT etc.
            pos += 2 + seg_len

    planes = []
    for ci, c in enumerate(comps):
        if c["tq"] not in qt:
            raise ValueError(f"JPEG missing DQT table {c['tq']}")
        q = qt[c["tq"]]                         # (8, 8), natural order
        grid = coefs[ci]
        by, bx = grid.shape[:2]
        plane = np.zeros((by * 8, bx * 8), dtype=np.float64)
        for yb in range(by):
            for xb in range(bx):
                blk = grid[yb, xb]
                if not blk.any():
                    plane[yb * 8:yb * 8 + 8, xb * 8:xb * 8 + 8] = 128
                    continue
                coef = np.zeros(64)
                coef[_ZZ] = blk                 # zigzag -> natural
                plane[yb * 8:yb * 8 + 8, xb * 8:xb * 8 + 8] = \
                    _idct2(coef.reshape(8, 8) * q) + 128
        planes.append(plane)
    return _planes_to_rgb(planes, comps, hmax, vmax, w, h)


def _progressive_scan(payload, data_start, comps, scomps, tsel, coefs,
                      huff, restart, mcux, mcuy, ss, se, ah, al):
    br = _BitReader(payload, data_start)
    eobrun = 0
    n_units = 0

    def check(tbl_key, what):
        if tbl_key not in huff:
            raise ValueError(f"JPEG missing {what} table {tbl_key[1]}")
        return huff[tbl_key]

    if ss == 0:                                 # DC scan
        pred = {c["id"]: 0 for c in scomps}
        interleaved = len(scomps) > 1
        if interleaved:
            units = [(my, mx) for my in range(mcuy) for mx in range(mcux)]
        else:
            c = scomps[0]
            units = [(by, bx) for by in range(c["bh"])
                     for bx in range(c["bw"])]
        for uy, ux in units:
            if restart and n_units and n_units % restart == 0:
                br.sync_restart()
                pred = {c["id"]: 0 for c in scomps}
            for c in scomps:
                ci = comps.index(c)
                if interleaved:
                    blocks = [(uy * c["v"] + by, ux * c["h"] + bx)
                              for by in range(c["v"])
                              for bx in range(c["h"])]
                else:
                    blocks = [(uy, ux)]
                for yb, xb in blocks:
                    cell = coefs[ci][yb, xb]
                    if ah == 0:
                        dc_t = check((0, tsel[c["id"]][0]), "DC")
                        t = br.decode(dc_t)
                        if t > 15:
                            raise ValueError(
                                f"JPEG DC category {t} out of range")
                        diff = _extend(br.read_bits(t), t) if t else 0
                        pred[c["id"]] += diff
                        cell[0] = pred[c["id"]] << al
                    else:
                        if br.read_bit():
                            cell[0] |= 1 << al
            n_units += 1
        return

    # AC scan: single component, raster over its block grid
    c = scomps[0]
    ci = comps.index(c)
    ac_t = check((1, tsel[c["id"]][1]), "AC")
    for by in range(c["bh"]):
        for bx in range(c["bw"]):
            if restart and n_units and n_units % restart == 0:
                br.sync_restart()
                eobrun = 0
            n_units += 1
            cell = coefs[ci][by, bx]
            if ah == 0:                         # first AC pass
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = br.decode(ac_t)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.read_bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC index out of band")
                    cell[k] = _extend(br.read_bits(s), s) << al
                    k += 1
            else:                               # AC refinement
                eobrun = _refine_ac(cell, br, ac_t, ss, se, al, eobrun)


def _refine_ac(cell, br, ac_t, ss, se, al, eobrun) -> int:
    """AC successive-approximation refinement for one block
    (T.81 G.1.2.3): returns the updated EOB run.  NB the EOB-run count
    here INCLUDES the current block (eobrun = 1 << r), unlike the
    first-pass scan where it excludes it — the remainder of the current
    block still carries correction bits for its nonzero history."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.decode(ac_t)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                # r == 15 (ZRL): skip 16 zero-history coefficients via
                # the advance loop below
            else:
                if s != 1:
                    raise ValueError("AC refinement with s != 1")
                newval = p1 if br.read_bit() else m1
            while k <= se:
                if cell[k] != 0:
                    if br.read_bit() and (cell[k] & p1) == 0:
                        cell[k] += p1 if cell[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                cell[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if cell[k] != 0:
                if br.read_bit() and (cell[k] & p1) == 0:
                    cell[k] += p1 if cell[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


# --- encoder (deterministic test images; Annex K tables, 4:4:4) -----------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.cur = (self.cur << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.cur)
                if self.cur == 0xFF:
                    self.out.append(0x00)       # byte stuffing
                self.cur = 0
                self.nbits = 0

    def flush(self):
        while self.nbits:
            self.write(1, 1)                    # pad with 1s


def _mag(v: int) -> tuple[int, int]:
    """value -> (size category, amplitude bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits


def make_jpeg(width: int, height: int, seed: int = 0,
              pixels: np.ndarray | None = None) -> bytes:
    """Baseline JPEG encoder (Annex K tables, 4:4:4): the deterministic
    writer used to exercise the decoder; lossy, so tests bound pixel
    error rather than asserting identity."""
    if pixels is None:
        y, x = np.mgrid[0:height, 0:width]
        r = ((x * 7 + seed) % 256).astype(np.uint8)
        g = ((y * 11 + seed * 3) % 256).astype(np.uint8)
        b = (((x + y) * 5 + seed * 7) % 256).astype(np.uint8)
        pixels = np.dstack([r, g, b])
    h, w = pixels.shape[:2]
    rgb = pixels.astype(np.float64)
    yy = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2] + 128
    cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2] + 128
    planes = [yy, cb, cr]
    qts = [_QY.reshape(8, 8).astype(np.float64),
           _QC.reshape(8, 8).astype(np.float64),
           _QC.reshape(8, 8).astype(np.float64)]
    dc_enc = [_build_encode_table(*_DC_LUM), _build_encode_table(*_DC_CHR),
              _build_encode_table(*_DC_CHR)]
    ac_enc = [_build_encode_table(*_AC_LUM), _build_encode_table(*_AC_CHR),
              _build_encode_table(*_AC_CHR)]

    bw = _BitWriter()
    pred = [0, 0, 0]
    bh = -(-h // 8)
    bwid = -(-w // 8)
    for my in range(bh):
        for mx in range(bwid):
            for ci in range(3):
                p = planes[ci]
                blk = np.empty((8, 8))
                y0, x0 = my * 8, mx * 8
                src = p[y0:min(y0 + 8, h), x0:min(x0 + 8, w)]
                blk[:src.shape[0], :src.shape[1]] = src
                if src.shape[0] < 8:            # edge replication
                    blk[src.shape[0]:, :] = blk[src.shape[0] - 1, :]
                if src.shape[1] < 8:
                    blk[:, src.shape[1]:] = blk[:, src.shape[1] - 1:src.shape[1]]
                coef = np.round(_dct2(blk - 128) / qts[ci]).astype(np.int64)
                zz = coef.ravel()[_ZZ]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                t, bits = _mag(diff)
                code, ln = dc_enc[ci][t]
                bw.write(code, ln)
                if t:
                    bw.write(bits, t)
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_enc[ci][0xF0]
                        bw.write(code, ln)
                        run -= 16
                    t, bits = _mag(v)
                    code, ln = ac_enc[ci][(run << 4) | t]
                    bw.write(code, ln)
                    bw.write(bits, t)
                    run = 0
                if run:
                    code, ln = ac_enc[ci][0x00]     # EOB
                    bw.write(code, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", 0xFF00 | marker, len(body) + 2) + body

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        zz = tbl.ravel()[_ZZ].astype(np.uint8)
        return seg(0xDB, bytes([tid]) + zz.tobytes())

    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (b"\xff\xd8"
            + dqt(0, qts[0]) + dqt(1, qts[1])
            + dht(0, 0, _DC_LUM) + dht(1, 0, _AC_LUM)
            + dht(0, 1, _DC_CHR) + dht(1, 1, _AC_CHR)
            + sof + sos + bytes(bw.out) + b"\xff\xd9")


def exif_orientation(payload: bytes) -> int:
    """EXIF orientation (tag 0x0112) from the first APP1 Exif segment:
    TIFF header (II/MM), IFD0 entry walk, SHORT value 1..8.  Orientation
    is ADVISORY — any malformed/absent EXIF returns 1 (upright), never
    raises; every read is bounds-guarded against the segment."""
    i = 2
    if payload[:2] != b"\xff\xd8":
        return 1
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            break                       # entropy data before APP1: give up
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker in (0xDA, 0xD9):      # SOS/EOI: EXIF must precede scan
            break
        (seg_len,) = struct.unpack_from(">H", payload, i + 2)
        if seg_len < 2 or i + 2 + seg_len > len(payload):
            break
        if marker == 0xE1 and payload[i + 4:i + 10] == b"Exif\x00\x00":
            t = payload[i + 10:i + 2 + seg_len]     # TIFF stream
            if len(t) < 8:
                return 1
            if t[:4] == b"II*\x00":
                u16, u32 = "<H", "<I"
            elif t[:4] == b"MM\x00*":
                u16, u32 = ">H", ">I"
            else:
                return 1
            (ifd0,) = struct.unpack_from(u32, t, 4)
            if ifd0 + 2 > len(t):
                return 1
            (n,) = struct.unpack_from(u16, t, ifd0)
            n = min(n, (len(t) - ifd0 - 2) // 12)
            for k in range(n):
                e = ifd0 + 2 + 12 * k
                (tag,) = struct.unpack_from(u16, t, e)
                (typ,) = struct.unpack_from(u16, t, e + 2)
                if tag == 0x0112 and typ == 3:      # SHORT
                    (v,) = struct.unpack_from(u16, t, e + 8)
                    return v if 1 <= v <= 8 else 1
            return 1
        i += 2 + seg_len
    return 1


def apply_exif_orientation(img: np.ndarray, orientation: int) -> np.ndarray:
    """Corrective transform for EXIF orientations 1..8 (the PIL
    ``exif_transpose`` mapping): returns the upright image."""
    o = orientation
    if o == 2:
        return img[:, ::-1]
    if o == 3:
        return img[::-1, ::-1]
    if o == 4:
        return img[::-1]
    if o == 5:                           # transpose (main diagonal)
        return img.swapaxes(0, 1)
    if o == 6:                           # stored rotated: correct 90 CW
        return np.rot90(img, 3)
    if o == 7:                           # transverse (anti-diagonal)
        return img.swapaxes(0, 1)[::-1, ::-1]
    if o == 8:
        return np.rot90(img, 1)
    return img


def add_exif_orientation(payload: bytes, orientation: int) -> bytes:
    """Insert a minimal APP1 Exif segment (little-endian TIFF, one IFD0
    entry: Orientation) right after SOI — the test-fixture writer."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    tiff = (b"II*\x00" + struct.pack("<I", 8)
            + struct.pack("<H", 1)
            + struct.pack("<HHI", 0x0112, 3, 1)
            + struct.pack("<HH", orientation, 0)
            + struct.pack("<I", 0))
    body = b"Exif\x00\x00" + tiff
    seg = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    return payload[:2] + seg + payload[2:]
