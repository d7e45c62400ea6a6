"""Pure-numpy codecs for UNCOMPRESSED media containers.

No media library ships in this environment, but the classic
uncompressed formats need none: RIFF/WAVE PCM is a fixed 44-byte
header + int16 samples, and binary PNM (P5 grayscale / P6 RGB) is an
ASCII header + raw bytes.  These are real, spec-conformant encoders
and decoders (public formats: RIFF/WAVE per the Microsoft/IBM 1991
spec, PNM per the netpbm format docs), so the engine's media decode
stage is a REAL kernel for wav/ppm/pgm payloads — the
NotImplementedError integration point remains only for COMPRESSED
codecs (jpeg/mp3/h264), which genuinely need external libraries.

Reference analog: the raster ingest readers (FILDA_IO.py:570-706)
— binary blobs -> typed arrays + QA, decoded with per-batch
vectorized numpy.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# RIFF/WAVE PCM16
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono PCM -> canonical 44-byte-header WAV bytes."""
    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    n_channels, bits = 1, 16
    byte_rate = sample_rate * n_channels * bits // 8
    block_align = n_channels * bits // 8
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, n_channels, sample_rate,
                                byte_rate, block_align, bits)
        + b"data" + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(payload: bytes):
    """WAV bytes -> (samples int16 ndarray, sample_rate).  Raises
    ValueError on malformed input (the stage maps that to a QA flag).
    Walks RIFF chunks, so extra chunks (LIST/fact) are tolerated."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sample_rate, bits, data = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt, _nch, sample_rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0)
            if fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={fmt}, bits={bits})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return np.frombuffer(data, dtype="<i2"), int(sample_rate)


def audio_features(samples: np.ndarray, sample_rate: int) -> np.ndarray:
    """float64[4]: RMS, peak, zero-crossing rate, duration seconds —
    all over the normalized [-1, 1) signal."""
    x = np.asarray(samples, dtype=np.float64) / 32768.0
    if x.size == 0:
        return np.zeros(4)
    rms = float(np.sqrt(np.mean(x * x)))
    peak = float(np.max(np.abs(x)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if x.size > 1 else 0.0
    return np.array([rms, peak, zcr, x.size / float(sample_rate)])


# ---------------------------------------------------------------------------
# Binary PNM (P5 = grayscale, P6 = RGB)
# ---------------------------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 image (h, w) -> P5 or (h, w, 3) -> P6 bytes."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        magic, h, w = b"P5", *a.shape
    elif a.ndim == 3 and a.shape[2] == 3:
        magic, (h, w) = b"P6", a.shape[:2]
    else:
        raise ValueError("expected (h,w) or (h,w,3) uint8")
    return magic + f"\n{w} {h}\n255\n".encode() + a.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """P5/P6 bytes -> uint8 ndarray (h, w) or (h, w, 3).  Handles
    whitespace/comment tokens per the netpbm spec."""
    if len(payload) < 2 or payload[0:1] != b"P" or payload[1:2] not in b"56":
        raise ValueError("not a binary PNM payload")
    channels = 3 if payload[1:2] == b"6" else 1
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit PNM supported")
    need = w * h * channels
    raw = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    return raw.reshape((h, w, 3) if channels == 3 else (h, w))


def block_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-style resize by block averaging (the reference's 2x2
    block-mean aggregation generalized, FILDA_BT.py:62-66): bin each
    output cell over its source index range.  Works for any size
    ratio; float64 out."""
    a = np.asarray(img, dtype=np.float64)
    if a.ndim == 3:
        return np.stack([block_resize(a[:, :, c], out_h, out_w)
                         for c in range(a.shape[2])], axis=2)
    h, w = a.shape
    ye = np.linspace(0, h, out_h + 1).astype(np.int64)
    xe = np.linspace(0, w, out_w + 1).astype(np.int64)
    csum = np.zeros((h + 1, w + 1))
    csum[1:, 1:] = a.cumsum(0).cumsum(1)
    out = (csum[ye[1:, None], xe[None, 1:]] - csum[ye[1:, None], xe[None, :-1]]
           - csum[ye[:-1, None], xe[None, 1:]] + csum[ye[:-1, None], xe[None, :-1]])
    area = ((ye[1:] - ye[:-1])[:, None] * (xe[1:] - xe[:-1])[None, :]).astype(np.float64)
    return out / np.maximum(area, 1)


def image_features(img: np.ndarray, grid: int = 3) -> np.ndarray:
    """float64[2 + grid*grid]: global mean/std + grid x grid
    block-averaged grayscale thumbnail (all /255-normalized)."""
    a = np.asarray(img, dtype=np.float64)
    gray = a.mean(axis=2) if a.ndim == 3 else a
    thumb = block_resize(gray, grid, grid).ravel() / 255.0
    return np.concatenate([[gray.mean() / 255.0, gray.std() / 255.0], thumb])


# ---------------------------------------------------------------------------
# Raw video container: "RVID" + nframes/h/w + concatenated P6 frames
# ---------------------------------------------------------------------------

RVID_MAGIC = b"RVID"


def encode_rvid(frames: np.ndarray) -> bytes:
    """uint8 (n, h, w, 3) -> raw-video bytes (header + raw RGB)."""
    f = np.asarray(frames, dtype=np.uint8)
    n, h, w, c = f.shape
    assert c == 3
    return RVID_MAGIC + struct.pack("<III", n, h, w) + f.tobytes()


def decode_rvid(payload: bytes) -> np.ndarray:
    """raw-video bytes -> uint8 (n, h, w, 3)."""
    if payload[:4] != RVID_MAGIC:
        raise ValueError("not an RVID payload")
    n, h, w = struct.unpack_from("<III", payload, 4)
    raw = np.frombuffer(payload, dtype=np.uint8, count=n * h * w * 3, offset=16)
    return raw.reshape(n, h, w, 3)


def rvid_frame(payload: bytes, index: int) -> np.ndarray:
    """Decode ONE frame without touching the rest of the payload
    (frame offsets are computable from the header — the seekability a
    real container gives a frame-sampling stage)."""
    if payload[:4] != RVID_MAGIC:
        raise ValueError("not an RVID payload")
    n, h, w = struct.unpack_from("<III", payload, 4)
    if not (0 <= index < n):
        raise IndexError(index)
    sz = h * w * 3
    raw = np.frombuffer(payload, dtype=np.uint8, count=sz, offset=16 + index * sz)
    return raw.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# PNG (real, stdlib-only: zlib + numpy).  8-bit depth, color types
# gray(0)/RGB(2)/RGBA(6), non-interlaced — the common web subset.
# ---------------------------------------------------------------------------

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 (h,w) gray / (h,w,3) RGB / (h,w,4) RGBA -> PNG bytes.
    ``filter_type`` 0-4 applies that scanline filter to EVERY row
    (1-4 exist to exercise the decoder's unfiltering paths)."""
    import struct
    import zlib

    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        ctype, ch = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] in (3, 4):
        ch = a.shape[2]
        ctype = 2 if ch == 3 else 6
    else:
        raise ValueError("expected (h,w), (h,w,3) or (h,w,4) uint8")
    h, w = a.shape[:2]
    rows = a.reshape(h, w * ch).astype(np.int16)
    prev = np.zeros(w * ch, dtype=np.int16)
    out = bytearray()
    for y in range(h):
        cur = rows[y]
        left = np.zeros_like(cur)
        left[ch:] = cur[:-ch]
        upleft = np.zeros_like(prev)
        upleft[ch:] = prev[:-ch]
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - left
        elif filter_type == 2:
            filt = cur - prev
        elif filter_type == 3:
            filt = cur - (left + prev) // 2
        elif filter_type == 4:
            p = left + prev - upleft
            pa_ = np.abs(p - left)
            pb = np.abs(p - prev)
            pc_ = np.abs(p - upleft)
            pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                            np.where(pb <= pc_, prev, upleft))
            filt = cur - pred
        else:
            raise ValueError("filter_type in 0..4")
        out.append(filter_type)
        out += (filt % 256).astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 ndarray (h,w) / (h,w,3) / (h,w,4).  Real
    decoder: chunk walk, zlib inflate, all five scanline filters
    unfiltered (Sub via per-lane cumsum; Average/Paeth per-pixel along
    the row, vectorized across channels)."""
    import struct
    import zlib

    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    idat = []
    w = h = ctype = None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", data)
            if depth != 8 or ctype not in (0, 2, 6) or inter != 0:
                raise ValueError("unsupported PNG variant (need 8-bit, "
                                 "gray/RGB/RGBA, non-interlaced)")
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG scanline data")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = raw[y * (stride + 1)]
        row = np.frombuffer(raw, np.uint8, stride,
                            y * (stride + 1) + 1).astype(np.int32)
        if f == 0:
            rec = row
        elif f == 1:  # Sub: per-lane wraparound cumsum
            rec = np.cumsum(row.reshape(-1, ch), axis=0) % 256
            rec = rec.reshape(-1)
        elif f == 2:
            rec = (row + prev) % 256
        elif f in (3, 4):
            rec = np.empty(stride, dtype=np.int32)
            lanes = rec.reshape(-1, ch)
            rl = row.reshape(-1, ch)
            pl = prev.reshape(-1, ch)
            left = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                up = pl[x]
                if f == 3:
                    lanes[x] = (rl[x] + (left + up) // 2) % 256
                else:
                    upleft = pl[x - 1] if x else np.zeros(ch, dtype=np.int32)
                    p = left + up - upleft
                    pa_ = np.abs(p - left)
                    pb = np.abs(p - up)
                    pc_ = np.abs(p - upleft)
                    pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                                    np.where(pb <= pc_, up, upleft))
                    lanes[x] = (rl[x] + pred) % 256
                left = lanes[x]
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img
