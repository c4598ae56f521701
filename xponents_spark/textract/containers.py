"""Container payloads: archives (zip / tar / tar.gz / gz) and mail
(EML / MBOX) — pure stdlib, Arrow-batched.

The reference walks folders and archives with XText's ArchiveNavigator and
converts RFC-822 mail with its MessageConverter before per-document
conversion (SURVEY §2.1 S1; ``XText.extractText(path)`` usage in
``Examples/src/main/java/org/opensextant/examples/BasicGeoTemporalProcessing.java:135-157``).
In the table world a container is a binary CELL, so the equivalent is an
EXPLODING conversion: one input row with an archive/mailbox payload becomes
one output row per contained document, each recovered through the same
:func:`xponents_spark.textract.convert_document_kind` dispatcher (nested
docx-inside-zip, pdf-attachment-inside-eml, ... all land on the existing
format readers).

Scale/hostile-input contract (the 100 TB rule: one bad cell must not kill
the stage, and one adversarial cell must not OOM an executor):

* expansion caps — total decompressed bytes, entry count, and per-entry
  bytes are bounded per payload; a zip bomb degrades to the entries that
  fit plus one ``truncated`` marker row, never an executor OOM;
* recursion — nested containers (zip in zip, eml attachment in zip) are
  walked to ``max_depth``; deeper ones surface as binary leaves;
* corrupt payloads — yield a single ``error`` marker row (the stage stays
  total, same contract as ``decoder='auto'``).

Everything is deterministic: entry order is container order (zip central
directory / tar stream / mbox message order), so gate oracles can pin
exact (entry_path, text) rows.
"""

from __future__ import annotations

import gzip
import io
import tarfile
import zipfile
from typing import Iterator

# expansion caps (per container payload, applied at every nesting level
# against the SHARED budget — a zip-of-zips cannot multiply them)
MAX_TOTAL_BYTES = 256 * 1024 * 1024
MAX_ENTRIES = 10_000
MAX_ENTRY_BYTES = 64 * 1024 * 1024
MAX_DEPTH = 3


def container_kind(payload: bytes) -> str | None:
    """'zip' / 'tar' / 'gz' / 'eml' / 'mbox' for container payloads, else
    None.  A zip that is a recognized OOXML/ODT *document* is NOT a
    container (the office readers own it)."""
    if payload is None or len(payload) < 4:
        return None
    if payload[:4] == b"PK\x03\x04":
        from .office import zip_kind
        return None if zip_kind(payload) else "zip"
    if payload[:2] == b"\x1f\x8b":
        return "gz"
    if len(payload) > 262 and payload[257:262] == b"ustar":
        return "tar"
    if payload[:5] == b"From " and b"\nFrom:" in payload[:4096]:
        return "mbox"
    if _looks_like_rfc822(payload):
        return "eml"
    return None


def _looks_like_rfc822(payload: bytes) -> bool:
    """Conservative RFC-822 sniff: the first 2048 bytes must contain BOTH a
    ``From:`` and a ``Subject:`` header line (start-of-line match).  Plain
    prose mentioning 'From:' mid-line does not qualify."""
    head = b"\n" + payload[:2048].replace(b"\r\n", b"\n")
    return b"\nFrom:" in head and b"\nSubject:" in head


class _Budget:
    """Shared expansion budget across all nesting levels of one payload."""

    def __init__(self) -> None:
        self.bytes_left = MAX_TOTAL_BYTES
        self.entries_left = MAX_ENTRIES

    def admit(self, n: int) -> bool:
        if self.entries_left <= 0 or self.bytes_left < n:
            return False
        self.entries_left -= 1
        self.bytes_left -= n
        return True


def iter_container_entries(payload: bytes, kind: str | None = None,
                           _depth: int = 0,
                           _budget: _Budget | None = None,
                           _prefix: str = "",
                           ) -> Iterator[tuple[str, str, bytes | None]]:
    """Yield ``(entry_path, status, entry_bytes)`` for every document inside
    a container, depth-first, nested containers flattened with ``/``-joined
    paths.  ``status`` is ``ok`` | ``truncated`` (budget hit; bytes None) |
    ``error`` (corrupt container; bytes None) | ``deep`` (nesting beyond
    MAX_DEPTH; raw bytes passed through as a leaf)."""
    budget = _budget or _Budget()
    kind = kind or container_kind(payload)
    try:
        if kind == "zip":
            yield from _iter_zip(payload, _depth, budget, _prefix)
        elif kind == "gz":
            yield from _iter_gz(payload, _depth, budget, _prefix)
        elif kind == "tar":
            yield from _iter_tar(io.BytesIO(payload), _depth, budget,
                                 _prefix)
        elif kind == "eml":
            yield from _iter_eml(payload, _depth, budget, _prefix)
        elif kind == "mbox":
            yield from _iter_mbox(payload, _depth, budget, _prefix)
        else:
            # not a container: a single leaf document
            yield _prefix or "payload", "ok", payload
    except Exception:
        yield _prefix or "payload", "error", None


def _descend(name: str, data: bytes, depth: int, budget: _Budget,
             ) -> Iterator[tuple[str, str, bytes | None]]:
    inner = container_kind(data)
    if inner:
        if depth + 1 >= MAX_DEPTH:
            yield name, "deep", data
        else:
            yield from iter_container_entries(data, inner, depth + 1,
                                              budget, name + "/")
    else:
        yield name, "ok", data


def _iter_zip(payload, depth, budget, prefix):
    with zipfile.ZipFile(io.BytesIO(payload)) as z:
        for info in z.infolist():
            if info.is_dir():
                continue
            name = prefix + info.filename
            if info.file_size > MAX_ENTRY_BYTES or \
                    not budget.admit(info.file_size):
                yield name, "truncated", None
                return
            try:
                # read() enforces the declared size against the actual
                # stream, so a lying zip-bomb header cannot overrun the
                # admitted budget
                data = z.read(info)
            except Exception:
                yield name, "error", None
                continue
            yield from _descend(name, data, depth, budget)


def _iter_gz(payload, depth, budget, prefix):
    # single-member gzip; tar.gz is sniffed from the decompressed head.
    # Decompress in bounded chunks — the gzip header does not declare the
    # inflated size, so the cap must be enforced DURING inflation
    name = prefix + "gz-member"
    with gzip.GzipFile(fileobj=io.BytesIO(payload)) as g:
        chunks, total = [], 0
        while True:
            chunk = g.read(1 << 20)
            if not chunk:
                break
            total += len(chunk)
            if total > min(MAX_ENTRY_BYTES, budget.bytes_left):
                yield name, "truncated", None
                return
            chunks.append(chunk)
    data = b"".join(chunks)
    if len(data) > 262 and data[257:262] == b"ustar":
        yield from _iter_tar(io.BytesIO(data), depth, budget, prefix)
        return
    if not budget.admit(len(data)):
        yield name, "truncated", None
        return
    yield from _descend(name, data, depth, budget)


def _iter_tar(fileobj, depth, budget, prefix):
    with tarfile.open(fileobj=fileobj, mode="r") as t:
        for member in t:
            if not member.isfile():
                continue
            name = prefix + member.name
            if member.size > MAX_ENTRY_BYTES or not budget.admit(member.size):
                yield name, "truncated", None
                return
            f = t.extractfile(member)
            if f is None:
                continue
            yield from _descend(name, f.read(), depth, budget)


def _iter_eml(payload, depth, budget, prefix):
    """RFC-822 message: one ``headers`` pseudo-entry (Subject/From/To/Date
    — the metadata XText's MessageConverter surfaces), one entry per body
    part, attachments descended like archive entries."""
    import email
    import email.policy
    msg = email.message_from_bytes(payload, policy=email.policy.default)
    hdr = "\n".join(f"{h}: {msg[h]}" for h in ("Subject", "From", "To",
                                               "Date") if msg[h])
    if budget.admit(len(hdr)):
        yield prefix + "headers", "ok", hdr.encode("utf-8")
    else:
        # budget exhausted: leave an explicit marker like every archive
        # path does, not a silently-missing row
        yield prefix + "headers", "truncated", None
    part_n = 0
    for part in msg.walk():
        if part.is_multipart():
            continue
        part_n += 1
        fname = part.get_filename()
        name = prefix + (f"attachment/{fname}" if fname
                         else f"body-{part_n}")
        try:
            data = part.get_payload(decode=True)  # qp / base64 undone
        except Exception:
            yield name, "error", None
            continue
        if data is None:
            continue
        if not part.get_content_type().startswith("multipart") and \
                part.get_content_type() == "text/plain" and not fname:
            charset = part.get_content_charset() or "utf-8"
            try:
                data = data.decode(charset, errors="replace").encode("utf-8")
            except LookupError:
                pass
        if len(data) > MAX_ENTRY_BYTES or not budget.admit(len(data)):
            yield name, "truncated", None
            return
        yield from _descend(name, data, depth, budget)


def _iter_mbox(payload, depth, budget, prefix):
    """mboxo split: messages start at ``From `` separator lines.  Each
    message yields through the EML walker under ``msg-N/``."""
    body = payload.replace(b"\r\n", b"\n")
    if not body.startswith(b"From "):
        raise ValueError("not an mbox payload")
    msgs = body.split(b"\nFrom ")
    for i, raw in enumerate(msgs):
        if i > 0:
            raw = b"From " + raw
        # drop the mbox separator line itself
        _, _, msg_bytes = raw.partition(b"\n")
        yield from _iter_eml(msg_bytes, depth, budget,
                             f"{prefix}msg-{i + 1}/")


def extract_container_entries(df, payload_col: str = "payload",
                              doc_password: str | None = None):
    """Spark stage: explode container payload rows into one row per
    contained document, text-recovered in place.

    Input: any DataFrame with a binary ``payload_col``.  Output: the other
    columns carried through, plus ``entry_path`` (container-relative,
    nested containers ``/``-flattened), ``entry_status``
    (ok/truncated/error/deep), ``entry_kind`` (sniffed format of the leaf),
    ``text`` (recovered via the standard dispatcher; empty for non-ok
    rows) and ``n_bytes``.

    ONE Arrow-batched mapInPandas — no shuffle, no per-row Python UDF;
    entry rows stream out batch-by-batch so a 10k-entry archive never
    materializes as one Python list per executor thread.  At 100 TB this
    is a map-only stage exactly like ``convert_binary_docs``; skew from
    giant archives is bounded by the expansion caps (MAX_TOTAL_BYTES per
    cell) and, upstream, by the same salted repartition the extraction
    pipeline applies to long conversations.
    """
    import pandas as pd
    from pyspark.sql import types as T

    from . import convert_document_kind

    fields = [f for f in df.schema.fields if f.name != payload_col]
    schema = T.StructType(fields + [
        T.StructField("entry_path", T.StringType()),
        T.StructField("entry_status", T.StringType()),
        T.StructField("entry_kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ])
    names = [f.name for f in fields]

    def run(batches):
        for pdf in batches:
            rows = {n: [] for n in names}
            paths, statuses, kinds, texts, sizes = [], [], [], [], []
            for idx in range(len(pdf)):
                payload = pdf[payload_col].iloc[idx]
                for path, status, data in iter_container_entries(payload):
                    for n in names:
                        rows[n].append(pdf[n].iloc[idx])
                    paths.append(path)
                    statuses.append(status)
                    if status in ("ok", "deep") and data is not None:
                        text, kind = convert_document_kind(data,
                                                           doc_password)
                        kinds.append(kind)
                        texts.append(text)
                        sizes.append(len(data))
                    else:
                        kinds.append(None)
                        texts.append("")
                        sizes.append(0)
            out = pd.DataFrame(rows | {
                "entry_path": paths, "entry_status": statuses,
                "entry_kind": kinds, "text": texts, "n_bytes": sizes})
            yield out[list(schema.fieldNames())]

    return df.mapInPandas(run, schema=schema)


# --- deterministic writers (test fixtures without external data) -----------

def make_simple_zip(entries: list[tuple[str, bytes]]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, data in entries:
            z.writestr(zipfile.ZipInfo(name, (2020, 1, 1, 0, 0, 0)), data)
    return buf.getvalue()


def make_simple_tgz(entries: list[tuple[str, bytes]]) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as t:
        for name, data in entries:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 1577836800          # 2020-01-01, deterministic
            t.addfile(info, io.BytesIO(data))
    gz = io.BytesIO()
    with gzip.GzipFile(fileobj=gz, mode="wb", mtime=0) as g:
        g.write(buf.getvalue())
    return gz.getvalue()


def make_simple_eml(subject: str, body: str,
                    attachments: list[tuple[str, bytes]] | None = None,
                    sender: str = "a@example.org",
                    to: str = "b@example.org") -> bytes:
    """RFC-822 multipart fixture: quoted-printable text/plain body plus
    base64 attachments — both transfer decodings on the read path."""
    import quopri
    from email.utils import formatdate
    b = "----=_fixture_boundary"
    lines = [f"From: {sender}", f"To: {to}", f"Subject: {subject}",
             f"Date: {formatdate(1577836800)}", "MIME-Version: 1.0",
             f'Content-Type: multipart/mixed; boundary="{b}"', "",
             f"--{b}", 'Content-Type: text/plain; charset="utf-8"',
             "Content-Transfer-Encoding: quoted-printable", "",
             quopri.encodestring(body.encode("utf-8")).decode("ascii"),
             ""]
    import base64
    for fname, data in attachments or []:
        lines += [f"--{b}", "Content-Type: application/octet-stream",
                  "Content-Transfer-Encoding: base64",
                  f'Content-Disposition: attachment; filename="{fname}"', "",
                  base64.encodebytes(data).decode("ascii"), ""]
    lines.append(f"--{b}--")
    return "\r\n".join(lines).encode("ascii", errors="strict")


def make_simple_mbox(messages: list[bytes]) -> bytes:
    out = []
    for m in messages:
        out.append(b"From fixture@example.org Wed Jan  1 00:00:00 2020\n")
        out.append(m.replace(b"\r\n", b"\n"))
        if not m.endswith(b"\n"):
            out.append(b"\n")
    return b"".join(out)
