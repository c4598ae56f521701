"""Office-format text recovery: DOCX / ODT (zip+XML) and RTF — pure stdlib.

The reference covers office formats through Tika (XText conversion,
doc/README_xtext.md); this build recovers the text layer directly:

* DOCX: ZIP container, ``word/document.xml`` WordprocessingML — paragraphs
  are ``<w:p>``, text runs ``<w:t>``, explicit breaks ``<w:br/>``/tabs.
* ODT: ZIP container, ``content.xml`` — ``<text:p>``/``<text:h>`` blocks.
* RTF: control-word stream — ``\\par`` marks paragraphs, ``\\'hh`` hex
  escapes, ``\\uN`` unicode escapes, groups to skip (fonttbl etc.).

Like ``textract.pdf`` this ships deterministic writers
(:func:`make_simple_docx` / :func:`make_simple_rtf`) so roundtrip identity
is testable without any external fixture or codec.
"""

from __future__ import annotations

import io
import re
import zipfile

_W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_TEXT_NS = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"


def is_zip(payload: bytes) -> bool:
    return payload[:4] == b"PK\x03\x04"


def zip_kind(payload: bytes) -> str | None:
    """'docx' / 'odt' for recognized zip containers, else None."""
    if not is_zip(payload):
        return None
    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as z:
            names = set(z.namelist())
    except zipfile.BadZipFile:
        return None
    if "word/document.xml" in names:
        return "docx"
    if "content.xml" in names and "mimetype" in names:
        return "odt"
    return None


def _el_text(el, ns: str) -> str:
    """WordprocessingML paragraph -> text (runs + explicit breaks/tabs)."""
    parts = []
    for node in el.iter():
        if node.tag == ns + "t":
            parts.append(node.text or "")
        elif node.tag in (ns + "br", ns + "cr"):
            parts.append("\n")
        elif node.tag == ns + "tab":
            parts.append("\t")
    return "".join(parts)


def extract_docx_text(payload: bytes) -> str:
    import xml.etree.ElementTree as ET
    with zipfile.ZipFile(io.BytesIO(payload)) as z:
        root = ET.fromstring(z.read("word/document.xml"))
    paras = [_el_text(p, _W_NS) for p in root.iter(_W_NS + "p")]
    return "\n".join(paras)


def extract_odt_text(payload: bytes) -> str:
    import xml.etree.ElementTree as ET
    with zipfile.ZipFile(io.BytesIO(payload)) as z:
        root = ET.fromstring(z.read("content.xml"))
    paras = []
    for tag in ("p", "h"):
        for el in root.iter(_TEXT_NS + tag):
            paras.append("".join(el.itertext()))
    return "\n".join(paras)


# --- RTF ---------------------------------------------------------------------

_RTF_SKIP_GROUPS = {"fonttbl", "colortbl", "stylesheet", "info", "pict",
                    "*"}  # \* marks ignorable destinations
_RTF_TOKEN = re.compile(
    rb"\\'([0-9a-fA-F]{2})"          # hex escape
    rb"|\\u(-?\d+) ?"                 # unicode escape (space = delimiter)
    rb"|\\([a-zA-Z]+)(-?\d+)? ?"      # control word
    rb"|\\([^a-zA-Z])"                # control symbol
    rb"|([{}])"                       # group delimiters
    rb"|([^\\{}]+)")                  # plain text run


def is_rtf(payload: bytes) -> bool:
    return payload[:5] == b"{\\rtf"


def extract_rtf_text(payload: bytes) -> str:
    out: list[str] = []
    depth = 0
    skip_until = -1     # skip while depth > skip_until's entry depth
    uc_stack = [1]      # \ucN is group-scoped; spec default 1
    pending = 0         # fallback chars still to skip after a \uN
    for m in _RTF_TOKEN.finditer(payload):
        hexesc, uni, word, num, sym, brace, text = m.groups()
        if brace == b"{":
            depth += 1
            uc_stack.append(uc_stack[-1])
            pending = 0          # fallback cannot span group boundaries
            continue
        if brace == b"}":
            depth -= 1
            if len(uc_stack) > 1:
                uc_stack.pop()
            pending = 0
            if skip_until >= 0 and depth < skip_until:
                skip_until = -1
            continue
        if skip_until >= 0:
            continue
        if word is not None:
            w = word.decode("ascii")
            if w == "uc" and num is not None:
                # \ucN: how many ANSI fallback chars follow each \uN
                uc_stack[-1] = max(0, int(num))
            elif w in _RTF_SKIP_GROUPS:
                skip_until = depth
            elif w == "par" or w == "line":
                out.append("\n")
            elif w == "tab":
                out.append("\t")
            pending = 0          # any control word ends the fallback run
            continue
        if sym is not None:
            if sym == b"*":
                skip_until = depth
            elif sym in (b"\\", b"{", b"}"):
                out.append(sym.decode("ascii"))
            elif sym == b"~":
                out.append(" ")
            continue
        if hexesc is not None:
            if pending > 0:      # \'hh as a \uN fallback byte: skip it
                pending -= 1
                continue
            out.append(bytes([int(hexesc, 16)]).decode("windows-1252",
                                                       errors="replace"))
            continue
        if uni is not None:
            # per spec the NEXT \ucN fallback chars (any ANSI chars or
            # \'hh escapes, not just a literal '?') are alternates for
            # non-unicode readers and must be skipped (review finding:
            # skipping only '?' duplicated real-world fallback text)
            pending = uc_stack[-1]
            cu = int(uni) & 0xFFFF
            # Word encodes non-BMP chars as UTF-16 surrogate PAIRS of \uN
            # escapes; combine them — a lone surrogate is not valid UTF-8
            # and would crash Arrow serialization downstream
            if 0xD800 <= cu <= 0xDBFF:
                out.append(cu)          # high surrogate: park until the low
            elif 0xDC00 <= cu <= 0xDFFF:
                if out and isinstance(out[-1], int):
                    hi = out.pop()
                    out.append(chr(0x10000 + ((hi - 0xD800) << 10)
                                   + (cu - 0xDC00)))
                else:
                    out.append("�")   # stray low surrogate
            else:
                out.append(chr(cu))
            continue
        if text is not None:
            if pending > 0:      # consume fallback BYTES from this run
                k = min(pending, len(text))
                text = text[k:]
                pending -= k
                if not text:
                    continue
            out.append(text.decode("windows-1252", errors="replace")
                       .replace("\r", "").replace("\n", ""))
    # a high surrogate never followed by its low half -> replacement char
    return "".join("�" if isinstance(p, int) else p for p in out).strip()


# --- deterministic writers (test fixtures without codecs) --------------------

def make_simple_docx(text: str) -> bytes:
    """Minimal valid-enough DOCX: one document.xml, one paragraph per input
    line.  Deterministic bytes (fixed date in zip entries)."""
    from xml.sax.saxutils import escape
    paras = "".join(
        f"<w:p><w:r><w:t xml:space=\"preserve\">{escape(line)}</w:t></w:r></w:p>"
        for line in text.split("\n"))
    doc = ("<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>"
           "<w:document xmlns:w=\"http://schemas.openxmlformats.org/"
           "wordprocessingml/2006/main\"><w:body>"
           f"{paras}</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        info = zipfile.ZipInfo("word/document.xml", (2020, 1, 1, 0, 0, 0))
        z.writestr(info, doc)
    return buf.getvalue()


def _rtf_u(cu: int) -> str:
    """RTF \\uN escape: N is a SIGNED 16-bit decimal, followed by the
    ANSI fallback char that \\uc1 readers (the spec default) skip —
    without it a conformant reader consumes the next real character."""
    return f"\\u{cu - 0x10000 if cu >= 0x8000 else cu}?"


def make_simple_rtf(text: str) -> bytes:
    body = []
    for line in text.split("\n"):
        for ch in line:
            o = ord(ch)
            if ch in "\\{}":
                body.append("\\" + ch)
            elif o < 128:
                body.append(ch)
            elif o <= 0xFFFF:
                body.append(_rtf_u(o))
            else:
                # astral chars encode as a UTF-16 surrogate pair of \uN
                # escapes (what Word writes)
                o -= 0x10000
                body.append(_rtf_u(0xD800 + (o >> 10)))
                body.append(_rtf_u(0xDC00 + (o & 0x3FF)))
        body.append("\\par ")
    if body and body[-1] == "\\par ":
        body.pop()      # no trailing paragraph break
    return ("{\\rtf1\\ansi{\\fonttbl{\\f0 Helvetica;}}"
            + "".join(body) + "}").encode("windows-1252", errors="replace")
