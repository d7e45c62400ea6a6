"""Pure-numpy/stdlib codecs for media containers.

No media library ships in this environment, but every format whose
compression is stdlib-expressible needs none: RIFF/WAVE PCM is a
fixed 44-byte header + int16 samples, binary PNM (P5/P6) is an ASCII
header + raw bytes, PNG is zlib DEFLATE + five scanline filters
(unfiltered here in numpy), and GIF is LZW implemented from scratch.
These are real, spec-conformant encoders and decoders (public
formats: RIFF/WAVE per the Microsoft/IBM 1991 spec, PNM per the
netpbm docs, PNG per RFC 2083 / the W3C PNG spec, GIF per the
CompuServe GIF89a spec), so the engine's media decode stage is a
REAL kernel for wav/ppm/pgm/png/gif payloads — the
NotImplementedError integration point remains only for DCT/
entropy-coded codecs (jpeg/mp3/h264), which genuinely need external
libraries.

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


# ---------------------------------------------------------------------------
# GIF (GIF89a, LZW) — public spec: GIF89a specification, CompuServe 1990
# ---------------------------------------------------------------------------

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    """GIF-variant LZW over palette indices.  Variable-width codes
    (mcs+1 .. 12 bits, LSB-first packing), CLEAR emitted up front and
    again whenever the code table fills at 4096 — the exact stream a
    conforming decoder expects.  Dictionary keyed by
    (prefix_code, next_index); the encoder's width bump lags its own
    table by one entry so it always matches the width the DECODER has
    when reading that code (the classic off-by-one of this format)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = mcs + 1
    emit(clear, code_size)
    table: dict[tuple[int, int], int] = {}
    nxt = eoi + 1
    it = iter(indices.tolist())
    prefix = next(it)
    for k in it:
        key = (prefix, k)
        got = table.get(key)
        if got is not None:
            prefix = got
            continue
        emit(prefix, code_size)
        table[key] = nxt
        nxt += 1
        if nxt == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        elif nxt == 4096:
            emit(clear, code_size)
            table.clear()
            nxt = eoi + 1
            code_size = mcs + 1
        prefix = k
    emit(prefix, code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, mcs: int, n_pixels: int) -> np.ndarray:
    """Inverse of ``_lzw_encode``: LSB-first variable-width code read,
    table rebuilt per the spec (incl. the KwKwK self-reference case
    and deferred-clear handling).  Per-code Python loop — inherently
    sequential table growth; bounded by the image's pixel count and
    run inside the actor-pool decode stage, never on the driver."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    roots = [bytes([i]) for i in range(1 << mcs)]
    out = bytearray()
    table = list(roots) + [b"", b""]
    code_size = mcs + 1
    acc = nbits = pos = 0
    prev: int | None = None
    while len(out) < n_pixels:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(roots) + [b"", b""]
            code_size = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first GIF code")
            out += table[code]
            prev = code
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = table[prev] + table[prev][:1]
        else:
            raise ValueError("GIF code out of range")
        out += entry
        if len(table) < 4096:
            table.append(table[prev] + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = code
    if len(out) < n_pixels:
        raise ValueError("GIF pixel data short")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def encode_gif(img: np.ndarray) -> bytes:
    """uint8 (h,w) gray / (h,w,3) RGB with <=256 distinct colors ->
    single-frame GIF89a bytes (exact palette, non-interlaced).  Images
    with more colors must be quantized by the CALLER (posterize) —
    this encoder never silently loses color information."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = np.stack([a, a, a], axis=2)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("expected (h,w) or (h,w,3) uint8")
    h, w = a.shape[:2]
    if h * w == 0:
        # explicit, like the other encoders' validation — otherwise the
        # LZW encoder's first next(it) raises StopIteration (PEP 479)
        raise ValueError("empty image (h*w == 0)")
    flat = a.reshape(-1, 3)
    # palette = unique colors in first-appearance order, via a packed key
    key = (flat[:, 0].astype(np.uint32) << 16) \
        | (flat[:, 1].astype(np.uint32) << 8) | flat[:, 2]
    uniq, first, inv = np.unique(key, return_index=True, return_inverse=True)
    if len(uniq) > 256:
        raise ValueError(f"{len(uniq)} colors > 256; quantize first")
    order = np.argsort(first, kind="stable")
    rank = np.empty(len(uniq), dtype=np.int64)
    rank[order] = np.arange(len(uniq))
    indices = rank[inv].astype(np.uint16)
    palette = flat[np.sort(first)]
    bits = max(1, int(len(palette) - 1).bit_length())
    gct = np.zeros(((1 << bits), 3), dtype=np.uint8)
    gct[: len(palette)] = palette
    mcs = max(2, bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    out += gct.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(mcs)
    lzw = _lzw_encode(indices, mcs)
    for i in range(0, len(lzw), 255):
        block = lzw[i:i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes -> uint8 (h,w,3) RGB of the FIRST image frame.  Real
    decoder: screen descriptor + global/local color table, extension
    blocks skipped, LZW inflate, interlaced row reorder when flagged."""
    if payload[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(payload):
                raise ValueError("truncated GIF")
            ln = payload[p]
            p += 1 + ln
            if ln == 0:
                return p

    while pos < len(payload):
        intro = payload[pos]
        if intro == 0x21:                    # extension: label + sub-blocks
            pos = skip_subblocks(pos + 2)
        elif intro == 0x2C:                  # image descriptor
            _l, _t, w, h, ipack = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            ct = gct
            if ipack & 0x80:
                n = 2 << (ipack & 0x07)
                ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if ct is None:
                raise ValueError("GIF image with no color table")
            mcs = payload[pos]
            pos += 1
            chunks = []
            while True:
                ln = payload[pos]
                pos += 1
                if ln == 0:
                    break
                chunks.append(payload[pos:pos + ln])
                pos += ln
            idx = _lzw_decode(b"".join(chunks), mcs, w * h)
            if idx.max(initial=0) >= len(ct):
                raise ValueError("GIF index outside color table")
            img = ct[idx].reshape(h, w, 3)
            if ipack & 0x40:                 # interlaced: 8/8/4/2 pass order
                rows = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                                       np.arange(2, h, 4), np.arange(1, h, 2)])
                out = np.empty_like(img)
                out[rows] = img
                img = out
            return img
        elif intro == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{intro:02x}")
    raise ValueError("GIF contains no image data")
