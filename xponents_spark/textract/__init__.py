"""Main-content extraction — the XText-equivalent stage (SURVEY.md §2.1 S1).

The reference wraps Tika for file conversion and exposes an HTML scrubber
(``XText.enableHTMLScrubber``, usage at ``/root/reference/Examples/src/main/
java/org/opensextant/examples/BasicGeoTemporalProcessing.java:135-157``).
Per the build's north rule this stage is a fresh design: the input is
already a text column, so "conversion" means

1. charset repair for byte payloads (:func:`decode_bytes`),
2. HTML boilerplate removal via a block-level tag/link-density heuristic
   (the published boilerpipe/readability family of methods),
3. whitespace canonicalization (``squeeze_whitespace``).

Everything is pure-Python over single strings; the Spark pipeline maps it
over pandas batches inside ``mapInPandas`` (no per-row Python UDFs).
"""

from __future__ import annotations

import html as _html
import re

from ..functions.textnorm import squeeze_whitespace

_HTML_HINT = re.compile(r"<\s*(?:html|body|div|p|br|span|head|nav|table|h[1-6])\b", re.I)
# containers stripped wholesale: non-content by construction
_DROP_BLOCKS = re.compile(
    r"<(script|style|head|nav|header|footer|aside|noscript|svg|form|iframe)\b[^>]*>.*?</\1\s*>",
    re.I | re.S)
_COMMENTS = re.compile(r"<!--.*?-->", re.S)
# id/class naming that marks boilerplate even in generic divs
_BOILER_ATTR = re.compile(r'(?:id|class)\s*=\s*["\'][^"\']*'
                          r'(?:nav|menu|footer|sidebar|banner|breadcrumb|advert|cookie|share|social)',
                          re.I)
_BLOCK_SPLIT = re.compile(r"<(?:p|div|td|th|li|article|section|main|h[1-6]|blockquote|pre|tr|br)\b[^>]*/?>", re.I)
_TAG = re.compile(r"<[^>]+>")
_ANCHOR_TEXT = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.I | re.S)


def is_htmlish(text: str) -> bool:
    return _HTML_HINT.search(text) is not None


def extract_main_content(text: str) -> str:
    """Turn text -> extracted main content.

    Plain text passes through whitespace-squeezed.  HTML-ish text is scrubbed:
    script/style/nav/header/footer/aside blocks drop, remaining markup splits
    into blocks, and each block is kept if its link density < 0.5 and it
    carries real text (len >= 3 after tag strip).  Survivors join with single
    spaces.  Deterministic; tested for exact recovery of wrapped content.
    """
    if not text:
        return ""
    if not is_htmlish(text):
        return squeeze_whitespace(text)

    doc = _COMMENTS.sub(" ", text)
    # iterate: nested same-name blocks need repeated passes (regex is non-nesting)
    prev = None
    while prev != doc:
        prev = doc
        doc = _DROP_BLOCKS.sub(" ", doc)

    # drop generic elements whose id/class flags boilerplate (non-nested scan)
    doc = _drop_flagged_elements(doc)

    kept: list[str] = []
    for block in _BLOCK_SPLIT.split(doc):
        if not block or not block.strip():
            continue
        anchor_len = sum(len(_TAG.sub("", m)) for m in _ANCHOR_TEXT.findall(block))
        visible = squeeze_whitespace(_html.unescape(_TAG.sub(" ", block)))
        if not visible or len(visible) < 3:
            continue
        link_density = anchor_len / max(1, len(visible))
        if link_density >= 0.5:
            continue
        kept.append(visible)
    return squeeze_whitespace(" ".join(kept))


_FLAGGED_OPEN = re.compile(r"<([a-z][a-z0-9]*)\b[^>]*>", re.I)


def _drop_flagged_elements(doc: str) -> str:
    """Remove elements whose open tag carries a boilerplate id/class.
    Single linear scan balancing same-name tags."""
    out = []
    i = 0
    n = len(doc)
    while i < n:
        m = _FLAGGED_OPEN.search(doc, i)
        if not m:
            out.append(doc[i:])
            break
        if not _BOILER_ATTR.search(m.group(0)):
            out.append(doc[i:m.end()])
            i = m.end()
            continue
        out.append(doc[i:m.start()])
        name = m.group(1).lower()
        depth = 1
        j = m.end()
        pat = re.compile(rf"<(/?){name}\b[^>]*>", re.I)
        while depth and (m2 := pat.search(doc, j)):
            depth += -1 if m2.group(1) else 1
            j = m2.end()
        i = j if depth == 0 else m.end()
    return "".join(out)


def convert_document(payload: bytes, doc_password: str | None = None) -> str:
    """XText-equivalent conversion dispatcher (doc-in -> text-out, the API
    shape of ConvertedDocument): PDF payloads go through the text-layer
    recovery (:mod:`.pdf`); DOCX/ODT/RTF through the office text recovery
    (:mod:`.office` — the Tika-class formats, pure stdlib); anything else
    charset-decodes and, when HTML-ish, scrubs boilerplate."""
    return convert_document_kind(payload, doc_password)[0]


def convert_document_kind(payload: bytes,
                          doc_password: str | None = None) -> tuple[str, str]:
    """(extracted text, sniffed kind) in ONE dispatch — the Spark batch
    stage needs both columns, and format detection (CFB DIFAT/FAT/dir
    parse in particular) must run once per payload, not once per output
    column."""
    from .office import (extract_doc_text, extract_docx_text,
                         extract_odt_text, extract_pptx_text,
                         extract_rtf_text, extract_xls_text,
                         extract_xlsx_text, is_rtf, zip_kind)
    from .pdf import extract_pdf_text, is_pdf
    if payload is None:
        return "", "empty"
    if is_pdf(payload):
        return squeeze_whitespace(extract_pdf_text(payload)), "pdf"
    zk = zip_kind(payload)
    if zk == "docx":
        return squeeze_whitespace(extract_docx_text(payload)), "docx"
    if zk == "xlsx":
        return squeeze_whitespace(extract_xlsx_text(payload)), "xlsx"
    if zk == "pptx":
        return squeeze_whitespace(extract_pptx_text(payload)), "pptx"
    if zk == "odt":
        return squeeze_whitespace(extract_odt_text(payload)), "odt"
    if zk:
        # other zip container: fall through to charset decode of the bytes
        return extract_main_content(decode_bytes(payload)), zk
    if is_rtf(payload):
        return squeeze_whitespace(extract_rtf_text(payload)), "rtf"
    # legacy binary Office (CFB containers) — round-3: parsed directly,
    # no Tika (textract/cfb.py + the [MS-DOC]/BIFF8 readers).  ONE
    # container parse serves detection and extraction (review finding:
    # is_doc/is_xls each rebuilt the full reader)
    from .cfb import CfbReader, is_cfb
    if is_cfb(payload):
        try:
            r = CfbReader(payload)
            names = set(r.stream_names())
        except Exception:
            names = set()
        if "EncryptionInfo" in names and "EncryptedPackage" in names:
            # encrypted OOXML ([MS-OFFCRYPTO] 2.3.4, round 5): the CFB
            # wraps an AES-encrypted docx/xlsx zip (agile 4.4 CBC or
            # standard/CryptoAPI x.2 ECB); decrypt with the job password
            # and recurse on the inner package.  Same degrade contract
            # as doc-encrypted: a protected file must not fail the
            # 100 TB task
            from .agile import AgileDecryptError, decrypt_ooxml_package
            try:
                pkg = decrypt_ooxml_package(r, doc_password)
            except AgileDecryptError:
                return "", "ooxml-encrypted"
            text, inner = convert_document_kind(pkg, doc_password)
            return text, inner
        if "WordDocument" in names:
            from .office import EncryptedDocError
            try:
                return squeeze_whitespace(
                    extract_doc_text(payload, reader=r,
                                     password=doc_password)), "doc"
            except EncryptedDocError:
                # a protected file must not fail the 100 TB task: degrade
                # to empty text with a distinguishing kind so downstream
                # audits can count (and optionally re-run with passwords)
                return "", "doc-encrypted"
        if "Workbook" in names or "Book" in names:
            return squeeze_whitespace(extract_xls_text(payload, reader=r)), "xls"
    text = decode_bytes(payload)
    if is_htmlish(text[:4096]):
        return extract_main_content(text), "html"
    return extract_main_content(text), "text"


def doc_kind(payload: bytes) -> str:
    """Payload sniffing: pdf / docx / odt / rtf / doc / xls / html / text
    (the ConvertedDocument mime analog)."""
    from .office import is_rtf, zip_kind
    from .pdf import is_pdf
    if payload is None:
        return "empty"
    if is_pdf(payload):
        return "pdf"
    zk = zip_kind(payload)
    if zk:
        return zk
    if is_rtf(payload):
        return "rtf"
    # ONE container parse decides doc vs xls (mirrors convert_document;
    # is_doc + is_xls would each rebuild the full DIFAT/FAT/dir reader)
    from .cfb import CfbReader, is_cfb
    if is_cfb(payload):
        try:
            names = set(CfbReader(payload).stream_names())
        except Exception:
            names = set()
        if "WordDocument" in names:
            return "doc"
        if "Workbook" in names or "Book" in names:
            return "xls"
    if is_htmlish(decode_bytes(payload[:4096])):
        return "html"
    return "text"


def convert_binary_docs(df, payload_col: str = "payload",
                        out_col: str = "text",
                        doc_password: str | None = None):
    """Spark plumbing: binary payload column -> extracted text column plus
    conversion metadata (the reference's ConvertedDocument carries
    buffer/filesize/mime — BasicGeoTemporalProcessing.java:135-157) via one
    Arrow-batched mapInPandas stage (no per-row Python UDF).
    ``doc_password``: job-level password for RC4-encrypted legacy .doc
    payloads (rides the closure to every worker); files it does not open
    degrade to kind='doc-encrypted' with empty text."""
    import pandas as pd
    from pyspark.sql import types as T

    fields = [f for f in df.schema.fields if f.name != payload_col]
    schema = T.StructType(fields + [
        T.StructField(out_col, T.StringType()),
        T.StructField("doc_kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ])
    names = [f.name for f in fields]

    def run(batches):
        for pdf in batches:
            payloads = pdf[payload_col].tolist()
            out = pdf[names].copy()
            pairs = [convert_document_kind(p, doc_password) for p in payloads]
            out[out_col] = [t for t, _ in pairs]
            out["doc_kind"] = [k for _, k in pairs]
            out["n_bytes"] = [len(p) if p is not None else 0 for p in payloads]
            yield out

    return df.mapInPandas(run, schema=schema)


def decode_bytes(payload: bytes) -> str:
    """Charset/encoding normalization for binary payload columns: BOM sniff,
    UTF-8, then windows-1252 fallback (the common mislabeled-latin1 case);
    clean UTF-8 additionally gets the double-encoding repair (mojibake is
    by definition VALID utf-8 carrying the wrong characters)."""
    if payload.startswith(b"\xef\xbb\xbf"):
        return payload[3:].decode("utf-8", errors="replace")
    if payload.startswith((b"\xff\xfe", b"\xfe\xff")):
        return payload.decode("utf-16", errors="replace")
    try:
        return repair_mojibake(payload.decode("utf-8"))
    except UnicodeDecodeError:
        return payload.decode("windows-1252", errors="replace")


# mojibake signature: a char that IS the cp1252/latin-1 image of a UTF-8
# lead byte (0xC2-0xEF) immediately followed by the image of a continuation
# byte (0x80-0xBF).  The continuation-image set is computed from the real
# codec tables, plus U+0080-U+009F for the five bytes cp1252 leaves
# unmapped (a latin-1 mis-decode surfaces those as C1 controls).
_CONT_IMAGES = "".join(
    {bytes([b]).decode("windows-1252", errors="ignore") or chr(b)
     for b in range(0x80, 0xC0)})
_MOJIBAKE_HINT = re.compile(
    "[Â-ï][" + re.escape(_CONT_IMAGES) + "]")


def repair_mojibake(s: str, max_passes: int = 2) -> str:
    """Undo UTF-8-read-as-cp1252/latin-1 double encoding ('cafÃ©'
    -> 'café'), the single most common real-crawl text corruption
    (XText's charset-repair concern; ftfy's core fix).

    Conservative by construction: repairs only when (a) the lead-byte/
    continuation-byte signature is present, (b) the WHOLE string
    re-encodes strictly (cp1252 first, then latin-1 — mixed clean+broken
    strings are left alone rather than half-repaired), and (c) the
    re-decode is strict UTF-8.  Clean text in any language is untouched
    (CJK/Arabic fail (b); plain accented prose fails (a) or (c)).  Two
    passes undo the double-mojibake case."""
    for _ in range(max_passes):
        if not _MOJIBAKE_HINT.search(s):
            return s
        raw = None
        for enc in ("windows-1252", "latin-1"):
            try:
                raw = s.encode(enc)
                break
            except UnicodeEncodeError:
                continue
        if raw is None:
            return s
        try:
            fixed = raw.decode("utf-8")
        except UnicodeDecodeError:
            return s
        if fixed == s:
            return s
        s = fixed
    return s
