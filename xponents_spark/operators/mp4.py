"""ISO base media file format (MP4) container parsing — pure stdlib.

The H.264/H.265 CODECS are the declared ffmpeg slot; the CONTAINER is
not: an MP4's box tree (ftyp/moov/trak/mdia/stbl) carries everything the
frame-sampling operator needs — movie duration/timescale, per-track
handler types, and the sample tables (stts decode times, stsz sizes,
stsc/stco chunk layout) that locate every sample's exact byte range in
the file.  ``parse_mp4`` walks that tree; ``sample_table`` flattens it to
(timestamp_ms, offset, size) per sample, so ``sample_frames`` schedules
on REAL timestamps and can slice REAL (still codec-compressed) sample
payloads.  ``make_minimal_mp4`` writes a conformant single-video-track
file for tests.

No reference counterpart: the reference routes video to Tika metadata
(XText's conversion layer); this exists so Spark media columns carry real
container structure with zero native dependencies.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field


def _walk(buf: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) at one nesting level."""
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack_from(">I", buf, i)
        btype = buf[i + 4:i + 8]
        body = i + 8
        if size == 1:                      # 64-bit largesize
            if i + 16 > end:
                break                      # truncated largesize header
            (size,) = struct.unpack_from(">Q", buf, i + 8)
            body = i + 16
        elif size == 0:                    # to end of enclosing box
            size = end - i
        # size must cover its own header (8 or 16 bytes) — a largesize in
        # [8, 15] would otherwise invert the body range and metadata
        # would be read from the NEXT box (review finding)
        if size < body - i or i + size > end:
            break                          # corrupt size: stop honestly
        yield btype, body, i + size
        i += size


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts"}


@dataclass
class Mp4Track:
    handler: str = ""
    timescale: int = 0
    duration: int = 0
    movie_timescale: int = 0                     # for elst segment durations
    stts: list = field(default_factory=list)     # (count, delta)
    stsz: list = field(default_factory=list)     # sample sizes
    stsc: list = field(default_factory=list)     # (first_chunk, per_chunk)
    stco: list = field(default_factory=list)     # chunk offsets
    elst: list = field(default_factory=list)     # (seg_dur, media_time, rate)

    @property
    def duration_ms(self) -> int:
        return int(self.duration * 1000 / self.timescale) \
            if self.timescale else 0


@dataclass
class Mp4Info:
    timescale: int = 0
    duration: int = 0
    brands: list = field(default_factory=list)
    tracks: list = field(default_factory=list)

    @property
    def duration_ms(self) -> int:
        return int(self.duration * 1000 / self.timescale) \
            if self.timescale else 0


def parse_mp4(payload: bytes) -> Mp4Info:
    """Box-tree walk -> movie + per-track metadata and sample tables."""
    info = Mp4Info()

    def visit(start: int, end: int, track: Mp4Track | None):
        for btype, b0, b1 in _walk(payload, start, end):
            if btype == b"ftyp":
                info.brands = [payload[p:p + 4].decode("ascii", "replace")
                               for p in range(b0, b1, 4)]
            elif btype == b"mvhd":
                ver = payload[b0]
                if ver == 1:
                    info.timescale, info.duration = struct.unpack_from(
                        ">IQ", payload, b0 + 20)
                else:
                    info.timescale, info.duration = struct.unpack_from(
                        ">II", payload, b0 + 12)
            elif btype == b"trak":
                t = Mp4Track()
                info.tracks.append(t)
                visit(b0, b1, t)
            elif btype == b"mdhd" and track is not None:
                ver = payload[b0]
                if ver == 1:
                    track.timescale, track.duration = struct.unpack_from(
                        ">IQ", payload, b0 + 20)
                else:
                    track.timescale, track.duration = struct.unpack_from(
                        ">II", payload, b0 + 12)
            elif btype == b"hdlr" and track is not None:
                track.handler = payload[b0 + 8:b0 + 12].decode(
                    "ascii", "replace")
            elif btype == b"stts" and track is not None:
                (n,) = struct.unpack_from(">I", payload, b0 + 4)
                # entry counts are bounded by the BOX SIZE (a corrupt
                # count must not drive a billion-iteration loop — review
                # finding); per-entry sample counts are bounded by the
                # file size at expansion time in sample_table
                n = min(n, (b1 - b0 - 8) // 8)
                track.stts = [struct.unpack_from(">II", payload,
                                                 b0 + 8 + 8 * k)
                              for k in range(n)]
            elif btype == b"stsz" and track is not None:
                fixed, n = struct.unpack_from(">II", payload, b0 + 4)
                if fixed:
                    # a fixed-size table declares no per-sample bytes, so
                    # cap the count by what the FILE could possibly hold
                    n = min(n, len(payload) // max(fixed, 1) + 1)
                    track.stsz = [fixed] * n
                else:
                    n = min(n, (b1 - b0 - 12) // 4)
                    track.stsz = [
                        struct.unpack_from(">I", payload, b0 + 12 + 4 * k)[0]
                        for k in range(n)]
            elif btype == b"stsc" and track is not None:
                (n,) = struct.unpack_from(">I", payload, b0 + 4)
                n = min(n, (b1 - b0 - 8) // 12)
                track.stsc = [struct.unpack_from(">III", payload,
                                                 b0 + 8 + 12 * k)[:2]
                              for k in range(n)]
            elif btype == b"stco" and track is not None:
                (n,) = struct.unpack_from(">I", payload, b0 + 4)
                n = min(n, (b1 - b0 - 8) // 4)
                track.stco = [struct.unpack_from(">I", payload,
                                                 b0 + 8 + 4 * k)[0]
                              for k in range(n)]
            elif btype == b"elst" and track is not None:
                ver = payload[b0]
                (n,) = struct.unpack_from(">I", payload, b0 + 4)
                if ver == 1:                 # u64 duration, i64 media_time
                    n = min(n, (b1 - b0 - 8) // 20)
                    track.elst = [struct.unpack_from(">Qqi", payload,
                                                     b0 + 8 + 20 * k)[:3]
                                  for k in range(n)]
                else:                        # u32 duration, i32 media_time
                    n = min(n, (b1 - b0 - 8) // 12)
                    track.elst = [struct.unpack_from(">Iii", payload,
                                                     b0 + 8 + 12 * k)[:3]
                                  for k in range(n)]
            elif btype in _CONTAINERS:
                visit(b0, b1, track)

    visit(0, len(payload), None)
    if not info.tracks and not info.timescale:
        raise ValueError("not an ISO-BMFF (MP4) payload or no moov box")
    for t in info.tracks:                # elst durations use movie ticks
        t.movie_timescale = info.timescale
    return info


def _apply_elst(media_ts: list[int], track: Mp4Track) -> list[int | None]:
    """Map media timestamps (media-timescale ticks) to PRESENTATION ticks
    through the track's edit list (ISO 14496-12 §8.6.6): empty edits
    (media_time == -1) delay presentation by segment_duration (movie
    ticks -> media ticks); normal edits map media range
    [media_time, media_time + seg_dur) onto the presentation cursor;
    dwell edits (rate == 0) HOLD the sample at media_time for the
    segment duration — that sample is presented once at the cursor (the
    latest sample at-or-before media_time, ISO 14496-12 §8.6.6.1), then
    the cursor advances without consuming further media.  Samples
    outside every edit return None (not presented)."""
    if not track.elst:
        return list(media_ts)
    scale = (track.timescale / track.movie_timescale
             if track.timescale and track.movie_timescale else 1.0)
    out: list[int | None] = [None] * len(media_ts)
    cursor = 0                                   # presentation, media ticks
    for seg_dur, media_time, rate in track.elst:
        seg_media = int(seg_dur * scale)
        if media_time == -1:                     # empty edit: pure delay
            cursor += seg_media
            continue
        if rate == 0:                            # dwell: held frame, once
            best = None
            for i, ts in enumerate(media_ts):
                if ts <= media_time and (best is None
                                         or ts > media_ts[best]):
                    best = i
            if best is not None and out[best] is None:
                out[best] = cursor
            cursor += seg_media
            continue
        lo, hi = media_time, media_time + seg_media
        for i, ts in enumerate(media_ts):
            if lo <= ts < hi and out[i] is None:  # first edit wins
                out[i] = cursor + (ts - lo)
        cursor += seg_media
    return out


def sample_table(track: Mp4Track) -> list[tuple[int, int, int]]:
    """Flatten the stts/stsz/stsc/stco tables -> one
    (timestamp_ms, byte_offset, byte_size) triple per sample — the real
    frame schedule a codec plugin would decode from.  Timestamps are
    PRESENTATION times: the edit list, when present, is applied
    (delays, media offsets, dwells); samples an edit excludes are
    dropped from the schedule."""
    # total samples are bounded by the (box-size-capped) stsz table: a
    # hostile stts entry declaring 2^32 samples must not expand past what
    # the file actually holds sizes for (review finding)
    max_samples = len(track.stsz)
    media = []
    t = 0
    for count, delta in track.stts:
        for _ in range(min(count, max_samples - len(media))):
            media.append(t)
            t += delta
        if len(media) >= max_samples:
            break
    pres = _apply_elst(media, track)
    times = [int(p * 1000 / track.timescale)
             if track.timescale else 0
             for p in pres if p is not None]
    presented = [i for i, p in enumerate(pres) if p is not None]
    # chunk layout: stsc runs give samples-per-chunk from each first_chunk
    offsets = []
    n_chunks = len(track.stco)
    runs = list(track.stsc) + [(n_chunks + 1, 0)]
    si = 0
    for r in range(len(track.stsc)):
        first, per = runs[r]
        last = runs[r + 1][0]
        # clamp to chunk 1: a hostile first_chunk=0 would otherwise read
        # stco[-1] via negative indexing — silently wrong offsets
        # instead of an honest skip (ADVICE r4)
        for chunk in range(max(first, 1), min(last, n_chunks + 1)):
            off = track.stco[chunk - 1]
            for _ in range(per):
                if si >= len(track.stsz):
                    break
                offsets.append(off)
                off += track.stsz[si]
                si += 1
    out = []
    for k, oi in enumerate(presented):   # oi = original sample index
        if oi < len(offsets) and oi < len(track.stsz):
            out.append((times[k], offsets[oi], track.stsz[oi]))
    return out


def video_track(info: Mp4Info) -> Mp4Track | None:
    for t in info.tracks:
        if t.handler == "vide":
            return t
    return None


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + btype + body


def make_minimal_mp4(n_frames: int = 10, fps: int = 5,
                     frame_size: int = 32, seed: int = 0,
                     elst: list[tuple[int, int, int]] | None = None) -> bytes:
    """Single-video-track MP4 test fixture: ftyp + mdat (deterministic
    fake sample bytes — the codec payload slot) + moov with full sample
    tables, spec-shaped box layouts (84-byte tkhd v0, stsd present).
    Frame byte ranges in the mdat are exact.  No external ISO-BMFF
    validator exists in this sandbox, so conformance is asserted against
    the spec's byte layouts and this module's parser, not a third-party
    tool (unlike the image codecs, which cross-check vs Java ImageIO)."""
    timescale = 1000
    delta = timescale // fps
    duration = n_frames * delta
    samples = [bytes((seed * 31 + k * 7 + j) % 256
                     for j in range(frame_size)) for k in range(n_frames)]
    mdat_body = b"".join(samples)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    mdat = _box(b"mdat", mdat_body)
    mdat_off = len(ftyp) + 8           # offset of first sample byte

    mvhd = _box(b"mvhd", b"\x00\x00\x00\x00"
                + struct.pack(">II", 0, 0)
                + struct.pack(">II", timescale, duration)
                + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
                + b"\x00" * 10
                + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                              0x40000000)
                + b"\x00" * 24 + struct.pack(">I", 2))
    mdhd = _box(b"mdhd", b"\x00\x00\x00\x00"
                + struct.pack(">IIII", 0, 0, timescale, duration)
                + struct.pack(">HH", 0x55C4, 0))
    hdlr = _box(b"hdlr", b"\x00\x00\x00\x00" + b"\x00" * 4 + b"vide"
                + b"\x00" * 12 + b"fake\x00")
    # stsd: mandatory sample description — one opaque 'fake' video entry
    # (86-byte VisualSampleEntry shell; a real file would carry avc1+avcC)
    vse = (b"\x00" * 6 + struct.pack(">H", 1)          # reserved + ref idx
           + b"\x00" * 16
           + struct.pack(">HH", 64, 64)                # width, height
           + struct.pack(">II", 0x480000, 0x480000)    # dpi
           + b"\x00" * 4 + struct.pack(">H", 1)        # frame count
           + b"\x00" * 32                              # compressor name
           + struct.pack(">Hh", 24, -1))               # depth, color table
    stsd = _box(b"stsd", b"\x00\x00\x00\x00" + struct.pack(">I", 1)
                + _box(b"fake", vse))
    stts = _box(b"stts", b"\x00\x00\x00\x00" + struct.pack(">I", 1)
                + struct.pack(">II", n_frames, delta))
    stsz = _box(b"stsz", b"\x00\x00\x00\x00"
                + struct.pack(">II", frame_size, n_frames))
    stsc = _box(b"stsc", b"\x00\x00\x00\x00" + struct.pack(">I", 1)
                + struct.pack(">III", 1, n_frames, 1))
    stco = _box(b"stco", b"\x00\x00\x00\x00" + struct.pack(">I", 1)
                + struct.pack(">I", mdat_off))
    stbl = _box(b"stbl", stsd + stts + stsz + stsc + stco)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    # tkhd v0 body = 84 bytes: create/modify/id/reserved/duration (20)
    # + reserved[8] + layer/altgroup/volume/reserved (8) + matrix[36]
    # + width/height fixed-point (8) — review finding: the first cut
    # dropped the reserved[8] block
    tkhd = _box(b"tkhd", b"\x00\x00\x00\x07"
                + struct.pack(">IIIII", 0, 0, 1, 0, duration)
                + b"\x00" * 8
                + struct.pack(">HHHH", 0, 0, 0, 0)
                + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                              0x40000000)
                + struct.pack(">II", 64 << 16, 64 << 16))
    edts = b""
    if elst:                  # (segment_duration, media_time, rate_16_16)
        body = b"\x00\x00\x00\x00" + struct.pack(">I", len(elst))
        for seg_dur, media_time, rate in elst:
            body += struct.pack(">Iii", seg_dur, media_time, rate)
        edts = _box(b"edts", _box(b"elst", body))
    trak = _box(b"trak", tkhd + edts + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
