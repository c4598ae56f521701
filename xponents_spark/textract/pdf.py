"""PDF text-layer recovery — the XText PDF-conversion equivalent
(SURVEY.md §2.1 S1; the reference delegates to Tika, usage at
``/root/reference/Examples/src/main/java/org/opensextant/examples/
BasicGeoTemporalProcessing.java:135-157``).  Fresh pure-python design per
the north rule: no external PDF library exists in this environment, and the
common machine-generated case needs only

1. object/stream segmentation of the raw bytes,
2. zlib inflation of ``/FlateDecode`` content streams (stdlib),
3. interpretation of the text-showing operators inside ``BT``/``ET``
   blocks: ``Tj``, ``'``, ``"`` and ``TJ`` arrays, with ``Td/TD/T*``
   treated as line breaks,
4. PDF string unescaping (``\\(`` ``\\)`` ``\\\\`` ``\\n`` octal) and hex
   strings, UTF-16BE when BOM-prefixed else cp1252-ish single-byte.

Limitations (documented, deliberate): no CMap/ToUnicode subset-font
remapping, no encrypted documents — the text layer of standard-encoding
PDFs (the overwhelming machine-generated majority) recovers exactly.

``make_simple_pdf`` is the deterministic fixture generator used by tests
and the ``pdf_text_recovery`` oracle query: it emits a valid single-page
PDF whose content stream Flate-compresses one ``Tj`` per input line, so
extraction must round-trip the exact text.
"""

from __future__ import annotations

import re
import zlib

# --- extraction ---------------------------------------------------------------

# capture through to `endstream` WITHOUT trying to strip the preceding EOL
# in the regex: compressed data may itself end in 0x0D/0x0A bytes which an
# `\r?\n` would wrongly eat (decompressobj ignores the trailing EOL instead)
_STREAM = re.compile(rb"stream\r?\n(.*?)endstream", re.S)
_BT_ET = re.compile(rb"BT(.*?)ET", re.S)
# text-showing / line ops inside a BT block, in document order:
#   (str) Tj | (str) ' | (str) "-op | [ ... ] TJ | Td TD T* as breaks
_TEXT_OP = re.compile(
    rb"""(?:
        \(((?:[^()\\]|\\.)*)\)\s*(?:Tj|'|")   # literal string shows
      | <([0-9A-Fa-f\s]*)>\s*(?:Tj|'|")       # hex string shows
      | \[((?:[^\]\\]|\\.)*)\]\s*TJ           # array show
      | (T\*|Td|TD)                           # line movements
    )""", re.X | re.S)
_ARRAY_STR = re.compile(rb"\(((?:[^()\\]|\\.)*)\)|<([0-9A-Fa-f\s]*)>")
_ESCAPE = re.compile(rb"\\(\d{1,3}|.)", re.S)
_ESC_MAP = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


def _unescape(raw: bytes) -> bytes:
    def sub(m):
        g = m.group(1)
        if g.isdigit():
            return bytes([int(g, 8) & 0xFF])
        return _ESC_MAP.get(g, g)
    return _ESCAPE.sub(sub, raw)


def _decode_pdf_string(raw: bytes) -> str:
    if raw.startswith(b"\xfe\xff"):
        return raw[2:].decode("utf-16-be", errors="replace")
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        # PDFDocEncoding is latin-ish; cp1252 covers the printable range
        return raw.decode("cp1252", errors="replace")


def _hex_bytes(h: bytes) -> bytes:
    h = re.sub(rb"\s", b"", h)
    if len(h) % 2:
        h += b"0"
    return bytes.fromhex(h.decode("ascii"))


def is_pdf(payload: bytes) -> bool:
    return payload[:5] == b"%PDF-"


def extract_pdf_text(payload: bytes) -> str:
    """Recover the text layer of a PDF byte payload.  Lines join with
    newlines per Td/TD/T*/' line movement; pages and BT blocks separate
    with newlines; output is the raw recovered text (callers squeeze)."""
    pieces: list[str] = []
    for sm in _STREAM.finditer(payload):
        data = sm.group(1)
        try:
            data = zlib.decompressobj().decompress(data)
        except zlib.error:
            # uncompressed content stream (or non-Flate: skip below);
            # drop the EOL that separates data from `endstream`
            data = data.rstrip(b"\r\n")
        if b"BT" not in data:
            continue
        for bt in _BT_ET.finditer(data):
            line: list[str] = []
            lines: list[str] = []

            def flush():
                if line:
                    lines.append("".join(line))
                    line.clear()

            for op in _TEXT_OP.finditer(bt.group(1)):
                lit, hx, arr, move = op.groups()
                if move is not None:
                    flush()
                elif lit is not None:
                    line.append(_decode_pdf_string(_unescape(lit)))
                elif hx is not None:
                    line.append(_decode_pdf_string(_hex_bytes(hx)))
                elif arr is not None:
                    for s in _ARRAY_STR.finditer(arr):
                        l2, h2 = s.groups()
                        if l2 is not None:
                            line.append(_decode_pdf_string(_unescape(l2)))
                        else:
                            line.append(_decode_pdf_string(_hex_bytes(h2)))
            flush()
            if lines:
                pieces.append("\n".join(lines))
    return "\n".join(pieces)


# --- deterministic fixture generator -------------------------------------------

def _escape_pdf_string(s: str) -> bytes:
    out = bytearray()
    for b in s.encode("utf-8"):
        if b in (0x28, 0x29, 0x5C):        # ( ) backslash
            out += b"\\" + bytes([b])
        elif b == 0x0A:
            out += b"\\n"
        elif b == 0x0D:
            out += b"\\r"
        else:
            out.append(b)
    return bytes(out)


def make_simple_pdf(text: str) -> bytes:
    """One-page PDF whose Flate-compressed content stream shows ``text``
    one source line per Tj.  Valid xref so any reader opens it; extraction
    round-trips the text exactly."""
    shows = b"BT /F1 10 Tf 36 800 Td\n"
    first = True
    for ln in text.split("\n"):
        if not first:
            shows += b"0 -12 Td\n"
        shows += b"(" + _escape_pdf_string(ln) + b") Tj\n"
        first = False
    shows += b"ET"
    content = zlib.compress(shows, 6)

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() + b" /Filter /FlateDecode >>\n"
        b"stream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    buf = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, 1):
        offsets.append(len(buf))
        buf += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    buf += b"0000000000 65535 f \n"
    for off in offsets:
        buf += f"{off:010d} 00000 n \n".encode()
    buf += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
            + b"\n%%EOF\n")
    return bytes(buf)
