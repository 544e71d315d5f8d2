"""Pure-Python media header codecs for the multimodal pipeline.

No PIL/ffmpeg in this container, but image/audio/video *metadata* decode is
just header parsing — struct reads over the first bytes of the payload.
This module provides:

- Encoders that synthesize minimal REAL container files (used by fixtures
  and ``documents_as_media``): PNG (zlib IDAT, decodable by any PNG reader),
  GIF87a (header + logical screen descriptor + global color table), JPEG
  (SOI + APP0/JFIF + SOF0 frame header), WAV (RIFF/WAVE PCM fmt + data),
  MP4 (ftyp + moov/mvhd/trak/tkhd box tree).
- ``decode_media_bytes``: magic-byte sniff + per-format header walk
  returning (format, width, height, duration_ms, sample_rate). This is the
  real decode path wired into ``multimodal.decode_media`` — the hash stub
  survives only for unknown payloads, clearly flagged via format='unknown'.

Pixel/sample payloads are synthetic (zero scanlines / silent PCM): the
files are structurally valid and the headers carry real values, which is
what metadata decode at 100 TB reads. A full-frame decoder (PIL/pyav) slots
into the same mapInPandas stage unchanged.

Reference parity note: the reference (AnyCrawl) has no media pipeline; this
implements the task brief's multimodal-columns requirement
(decode/feature-extract as Arrow-batched stages over binary columns).
"""

from __future__ import annotations

import struct
import zlib

# --------------------------------------------------------------------------
# Encoders (fixture synthesis)
# --------------------------------------------------------------------------


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def make_png(width: int, height: int) -> bytes:
    """Minimal real PNG: 8-bit RGB, zero pixels, one zlib IDAT."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = bytes(height * (1 + 3 * width))  # filter byte 0 + zero scanline
    return (b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw, 9))
            + _png_chunk(b"IEND", b""))


def make_gif(width: int, height: int) -> bytes:
    """GIF87a header + logical screen descriptor + 2-entry global color
    table + trailer (header-only fixture: no LZW image data)."""
    lsd = struct.pack("<HHBBB", width, height, 0x80, 0, 0)
    gct = b"\x00\x00\x00\xff\xff\xff"
    return b"GIF87a" + lsd + gct + b"\x3b"


def make_jpeg(width: int, height: int) -> bytes:
    """JPEG SOI + APP0(JFIF) + SOF0 frame header + EOI. The SOF0 segment is
    where every JPEG stores its dimensions; scan data is omitted."""
    # APP0 length 16 = len field(2) + 'JFIF\0'(5) + version(2) + units(1)
    # + density(4) + thumbnail dims(2)
    app0 = (struct.pack(">HH", 0xFFE0, 16) + b"JFIF\x00"
            + b"\x01\x02" + b"\x00" + struct.pack(">HH", 72, 72) + bytes(2))
    sof0 = (struct.pack(">HHBHHB", 0xFFC0, 17, 8, height, width, 3)
            + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]))
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def make_wav(sample_rate: int, n_samples: int) -> bytes:
    """RIFF/WAVE, PCM mono 16-bit, ``n_samples`` zero samples."""
    data = bytes(2 * n_samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_bmp(width: int, height: int) -> bytes:
    """BMP file header + BITMAPINFOHEADER (24-bit, no compression); pixel
    data omitted (header-only fixture, like the GIF encoder)."""
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, 0,
                      2835, 2835, 0, 0)
    return b"BM" + struct.pack("<IHHI", 14 + 40, 0, 0, 54) + dib


def make_webp(width: int, height: int, variant: str = "vp8") -> bytes:
    """WebP RIFF container in one of its three bitstream flavours:

    - ``vp8``  — lossy: keyframe tag + 0x9D012A start code + 14-bit dims
    - ``vp8l`` — lossless: 0x2F signature + (w-1, h-1) packed LE bitfield
    - ``vp8x`` — extended: canvas (w-1, h-1) as 24-bit LE fields
    """
    if variant == "vp8":
        body = (bytes(3) + b"\x9d\x01\x2a"
                + struct.pack("<HH", width & 0x3FFF, height & 0x3FFF))
        tag = b"VP8 "
    elif variant == "vp8l":
        bits = (width - 1) | ((height - 1) << 14)
        body = b"\x2f" + struct.pack("<I", bits)
        tag = b"VP8L"
    elif variant == "vp8x":
        body = (bytes(4)
                + (width - 1).to_bytes(3, "little")
                + (height - 1).to_bytes(3, "little"))
        tag = b"VP8X"
    else:
        raise ValueError(f"unknown webp variant {variant!r}")
    chunk = tag + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


# MPEG1 Layer III constants (frame header tables)
_MP3_BITRATES = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                 256, 320]
_MP3_RATES = [44100, 48000, 32000]


def make_mp3(sample_rate: int, n_frames: int, with_id3: bool = False) -> bytes:
    """``n_frames`` silent MPEG1 Layer III frames at 128 kbit/s (bitrate
    index 9), optionally behind an ID3v2.4 tag (syncsafe size + padding)."""
    sr_idx = _MP3_RATES.index(sample_rate)
    frame_len = 144 * 128_000 // sample_rate
    header = bytes([0xFF, 0xFB, (9 << 4) | (sr_idx << 2), 0])
    frames = (header + bytes(frame_len - 4)) * n_frames
    if with_id3:
        body = bytes(32)
        sz = len(body)
        syncsafe = bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                          (sz >> 7) & 0x7F, sz & 0x7F])
        return b"ID3\x04\x00\x00" + syncsafe + body + frames
    return frames


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + tag + body


def make_mp4(width: int, height: int, duration_units: int,
             timescale: int = 600) -> bytes:
    """ftyp + moov(mvhd + trak(tkhd)) box tree — the boxes every MP4
    metadata reader walks; no mdat."""
    mvhd = (bytes(4)                        # version/flags
            + bytes(8)                      # ctime/mtime
            + struct.pack(">II", timescale, duration_units)
            + struct.pack(">I", 0x00010000)  # rate 1.0
            + struct.pack(">H", 0x0100)      # volume 1.0
            + bytes(10) + bytes(36)          # reserved + identity matrix slot
            + bytes(24) + struct.pack(">I", 2))  # predefines + next track
    tkhd = (b"\x00\x00\x00\x07"             # version 0, flags: enabled
            + bytes(8)                      # ctime/mtime
            + struct.pack(">I", 1) + bytes(4)  # track id + reserved
            + struct.pack(">I", duration_units)
            + bytes(8) + bytes(4)           # reserved + layer/group
            + bytes(2) + bytes(2)           # volume + reserved
            + bytes(36)                     # matrix slot
            + struct.pack(">II", width << 16, height << 16))
    moov = _box(b"moov", _box(b"mvhd", mvhd) + _box(b"trak", _box(b"tkhd", tkhd)))
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    return ftyp + moov


# --------------------------------------------------------------------------
# Decoders (header parsing — the real decode path)
# --------------------------------------------------------------------------

_EMPTY = {"format": "unknown", "width": 0, "height": 0,
          "duration_ms": 0, "sample_rate": 0}


def _decode_png(b: bytes) -> dict:
    # IHDR is required to be the first chunk: sig(8) + len(4) + 'IHDR'(4)
    if len(b) < 24 or b[12:16] != b"IHDR":
        return dict(_EMPTY, format="png")
    w, h = struct.unpack(">II", b[16:24])
    return {"format": "png", "width": w, "height": h,
            "duration_ms": 0, "sample_rate": 0}


def _decode_gif(b: bytes) -> dict:
    if len(b) < 10:
        return dict(_EMPTY, format="gif")
    w, h = struct.unpack("<HH", b[6:10])
    return {"format": "gif", "width": w, "height": h,
            "duration_ms": 0, "sample_rate": 0}


def _decode_jpeg(b: bytes) -> dict:
    # Segment walk: FF marker, 2-byte big-endian length (inclusive) for all
    # segments except the standalone markers. Dimensions live in SOFn.
    i = 2
    n = len(b)
    while i + 3 < n:
        if b[i] != 0xFF:
            i += 1
            continue
        # JPEG allows runs of 0xFF fill bytes before a marker — treating a
        # fill 0xFF as the marker byte would read a garbage segment length
        while i + 1 < n and b[i + 1] == 0xFF:
            i += 1
        if i + 3 >= n:
            break
        marker = b[i + 1]
        if marker in (0xD8, 0xD9, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            break
        seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
        if marker in (0xC0, 0xC1, 0xC2, 0xC3) and i + 9 <= n:
            h, w = struct.unpack(">HH", b[i + 5:i + 9])
            return {"format": "jpeg", "width": w, "height": h,
                    "duration_ms": 0, "sample_rate": 0}
        if marker == 0xDA:  # start of scan — no SOF found before it
            break
        i += 2 + seg_len
    return dict(_EMPTY, format="jpeg")


def _decode_wav(b: bytes) -> dict:
    # RIFF chunk walk: each subchunk = tag(4) + size(4LE) + body, padded to
    # even length.
    sample_rate = 0
    byte_rate = 0
    data_bytes = 0
    i = 12
    n = len(b)
    while i + 8 <= n:
        tag = b[i:i + 4]
        size = struct.unpack("<I", b[i + 4:i + 8])[0]
        if tag == b"fmt " and i + 8 + 16 <= n:
            _, _, sample_rate, byte_rate, _, _ = struct.unpack(
                "<HHIIHH", b[i + 8:i + 24])
        elif tag == b"data":
            data_bytes = size
        i += 8 + size + (size & 1)
    dur = data_bytes * 1000 // byte_rate if byte_rate else 0
    return {"format": "wav", "width": 0, "height": 0,
            "duration_ms": dur, "sample_rate": sample_rate}


def _decode_mp4(b: bytes) -> dict:
    def walk(lo: int, hi: int, path: tuple[bytes, ...]):
        """Yield (tag_path, body_lo, body_hi) over the box tree."""
        i = lo
        while i + 8 <= hi:
            size = struct.unpack(">I", b[i:i + 4])[0]
            tag = b[i + 4:i + 8]
            if size < 8 or i + size > hi:
                break
            yield path + (tag,), i + 8, i + size
            if tag in (b"moov", b"trak"):
                yield from walk(i + 8, i + size, path + (tag,))
            i += size

    timescale = duration = width = height = 0
    for path, lo, hi in walk(0, len(b), ()):
        if path[-1] == b"mvhd" and hi - lo >= 20:
            # version 1 boxes use 64-bit create/modify times and duration:
            # timescale sits at +20 (after ver/flags + 2x8-byte times), not
            # +12 — reading the v0 offsets lands inside the times and
            # yields garbage durations
            version = b[lo]
            if version == 1 and hi - lo >= 32:
                timescale = struct.unpack(">I", b[lo + 20:lo + 24])[0]
                duration = struct.unpack(">Q", b[lo + 24:lo + 32])[0]
            else:
                timescale, duration = struct.unpack(">II", b[lo + 12:lo + 20])
        elif path[-1] == b"tkhd" and hi - lo >= 84:
            w_fp, h_fp = struct.unpack(">II", b[hi - 8:hi])
            width, height = w_fp >> 16, h_fp >> 16
    dur_ms = duration * 1000 // timescale if timescale else 0
    return {"format": "mp4", "width": width, "height": height,
            "duration_ms": dur_ms, "sample_rate": 0}


def _decode_bmp(b: bytes) -> dict:
    # 'BM' alone is too weak a magic (ordinary text can start with it);
    # require a known DIB header size at offset 14 before trusting the
    # dimension fields. Unrecognized -> the caller's 'unknown' stub path.
    if len(b) < 22:
        return dict(_EMPTY)
    dib = struct.unpack("<I", b[14:18])[0]
    if dib not in (12, 16, 40, 52, 56, 64, 108, 124):
        return dict(_EMPTY)
    if dib == 12:  # BITMAPCOREHEADER: 16-bit dims
        w, h = struct.unpack("<HH", b[18:22])
        return {"format": "bmp", "width": w, "height": h,
                "duration_ms": 0, "sample_rate": 0}
    if len(b) < 26:  # dib >= 16 carries 4-byte signed dims at offset 18
        return dict(_EMPTY)
    w, h = struct.unpack("<ii", b[18:26])
    # negative height = top-down DIB; dimension is its magnitude
    return {"format": "bmp", "width": abs(w), "height": abs(h),
            "duration_ms": 0, "sample_rate": 0}


def _decode_webp(b: bytes) -> dict:
    # RIFF chunk walk after the 12-byte RIFF/WEBP header; dimensions live in
    # whichever bitstream chunk comes first (VP8 / VP8L / VP8X).
    i, n = 12, len(b)
    while i + 8 <= n:
        tag = b[i:i + 4]
        size = struct.unpack("<I", b[i + 4:i + 8])[0]
        lo = i + 8
        if tag == b"VP8 " and lo + 10 <= n and b[lo + 3:lo + 6] == b"\x9d\x01\x2a":
            w, h = struct.unpack("<HH", b[lo + 6:lo + 10])
            return {"format": "webp", "width": w & 0x3FFF,
                    "height": h & 0x3FFF, "duration_ms": 0, "sample_rate": 0}
        if tag == b"VP8L" and lo + 5 <= n and b[lo] == 0x2F:
            bits = struct.unpack("<I", b[lo + 1:lo + 5])[0]
            return {"format": "webp", "width": (bits & 0x3FFF) + 1,
                    "height": ((bits >> 14) & 0x3FFF) + 1,
                    "duration_ms": 0, "sample_rate": 0}
        if tag == b"VP8X" and lo + 10 <= n:
            w = 1 + int.from_bytes(b[lo + 4:lo + 7], "little")
            h = 1 + int.from_bytes(b[lo + 7:lo + 10], "little")
            return {"format": "webp", "width": w, "height": h,
                    "duration_ms": 0, "sample_rate": 0}
        i = lo + size + (size & 1)
    return dict(_EMPTY, format="webp")


def _decode_mp3(b: bytes) -> dict:
    i = 0
    if b.startswith(b"ID3") and len(b) >= 10:
        sz = (b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9]
        i = 10 + sz + (10 if b[5] & 0x10 else 0)  # +footer when flagged
    n = len(b)
    frames = samples = sr = 0
    while i + 4 <= n:
        if b[i] != 0xFF or (b[i + 1] & 0xE0) != 0xE0:
            break
        version = (b[i + 1] >> 3) & 3
        layer = (b[i + 1] >> 1) & 3
        if version != 3 or layer != 1:   # MPEG1 Layer III only
            break
        br_idx = b[i + 2] >> 4
        sr_idx = (b[i + 2] >> 2) & 3
        pad = (b[i + 2] >> 1) & 1
        if br_idx in (0, 15) or sr_idx == 3:
            break
        sr = _MP3_RATES[sr_idx]
        flen = 144 * _MP3_BITRATES[br_idx] * 1000 // sr + pad
        if flen < 4:
            break
        frames += 1
        samples += 1152                  # MPEG1 Layer III samples/frame
        i += flen
    if frames == 0:
        # 'ID3'/sync-byte prefixes occur in ordinary text; without at least
        # one valid MPEG frame this is not an MP3 — unknown-stub path
        return dict(_EMPTY)
    dur = samples * 1000 // sr
    return {"format": "mp3", "width": 0, "height": 0,
            "duration_ms": dur, "sample_rate": sr}


def decode_media_bytes(payload: bytes) -> dict:
    """Sniff the container by magic bytes and parse its header. Returns
    {format, width, height, duration_ms, sample_rate}; format='unknown'
    (all-zero fields) for unrecognized payloads."""
    b = payload or b""
    if b.startswith(b"\x89PNG\r\n\x1a\n"):
        return _decode_png(b)
    if b.startswith((b"GIF87a", b"GIF89a")):
        return _decode_gif(b)
    if b.startswith(b"\xff\xd8"):
        return _decode_jpeg(b)
    if b.startswith(b"RIFF") and b[8:12] == b"WAVE":
        return _decode_wav(b)
    if b.startswith(b"RIFF") and b[8:12] == b"WEBP":
        return _decode_webp(b)
    if b.startswith(b"BM") and len(b) >= 22:
        return _decode_bmp(b)
    if len(b) >= 12 and b[4:8] == b"ftyp":
        return _decode_mp4(b)
    if (b.startswith(b"ID3")
            or (len(b) >= 2 and b[0] == 0xFF and (b[1] & 0xE0) == 0xE0)):
        return _decode_mp3(b)
    return dict(_EMPTY)
