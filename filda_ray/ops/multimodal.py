"""Multimodal column stages (image/audio/video as opaque binary).

The engine treats media as ``binary`` columns with typed metadata and
runs decode / feature-extract / resize / frame-sample as actor-pool
map_batches stages.  Decode is REAL for every format expressible with
the stdlib + numpy — RIFF/WAVE PCM16, binary PNM (P5/P6), PNG
(zlib inflate + scanline unfilter), GIF (from-scratch LZW), and the
RVID raw-video container (``kernels.media``):
``RawMediaDecoder`` sniffs the payload magic, decodes, and extracts
numeric features (RMS/peak/ZCR for audio; mean/std + block-averaged
thumbnail for images; first-frame image features for video), with a
decode QA flag for undecodable payloads.  Only perceptual-audio /
motion-video codecs (mp3/h264) genuinely require external libraries
this container does not ship — ``NotImplementedDecoder`` marks that
integration point, and ``DeterministicFakeDecoder`` remains as a
seeded plumbing-only stand-in.

Reference analog: the per-granule raster ingest stages (READ_IMG /
READ_DNB, FILDA_IO.py:383-567) — heavy binary blobs decoded once per
worker-held state, vectorized per batch, with QA flags for undecodable
input.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import autoscale

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),       # "image" | "audio" | "video"
        ("payload", pa.binary()),    # opaque encoded bytes
        ("meta_width", pa.int32()),
        ("meta_height", pa.int32()),
        ("meta_sample_rate", pa.int32()),
    ]
)


class NotImplementedDecoder:
    """Integration point for perceptual-audio/motion-video codecs
    (mp3/h264), which need libsndfile/ffmpeg-class libraries this
    container does not ship.  __init__ is where those handles would be
    created (once per actor).  Everything spec-expressible from
    scratch — wav, pnm, PNG (zlib), GIF (LZW), JPEG (baseline +
    progressive T.81), rvid — is decoded for REAL by
    ``RawMediaDecoder``."""

    def __init__(self, target_size: tuple[int, int] = (64, 64)):
        raise NotImplementedError(
            "no mp3/h264 codec libraries in this environment; "
            "RawMediaDecoder handles wav/pnm/png/gif/jpeg/rvid payloads for real"
        )


class RawMediaDecoder:
    """REAL decode + feature extraction for uncompressed payloads.

    Per payload: sniff the container magic, decode with the pure-numpy
    codecs in ``kernels.media``, and emit a fixed-width float32
    feature vector (zero-padded), feat_mean, and decode_ok.  Feature
    layouts: audio = [rms, peak, zcr, seconds]; image = [mean, std,
    3x3 thumbnail]; video = image features of frame 0 + [n_frames].
    Undecodable/truncated payloads set decode_ok=False with zero
    features (QA-flag convention of the raster readers,
    FILDA_IO.py:404-412)."""

    FEATURE_DIM = 16

    def __init__(self, feature_dim: int = FEATURE_DIM, grid: int = 3):
        from ..kernels import media

        self.m = media
        self.feature_dim = feature_dim
        self.grid = grid

    def _features(self, payload: bytes | None):
        m = self.m
        if not payload:
            return np.zeros(self.feature_dim, dtype=np.float32), False
        try:
            if payload[:4] == b"RIFF":
                f = m.audio_features(*m.decode_wav(payload))
            elif payload[:8] == m.PNG_MAGIC:
                img = m.decode_png(payload)
                if img.ndim == 3 and img.shape[2] == 4:
                    img = img[:, :, :3]  # drop alpha for the feature grid
                f = m.image_features(img, self.grid)
            elif payload[:6] in m.GIF_MAGICS:
                f = m.image_features(m.decode_gif(payload), self.grid)
            elif payload[:2] == m.JPEG_MAGIC:
                f = m.image_features(m.decode_jpeg(payload), self.grid)
            elif payload[:1] == b"P" and payload[1:2] in b"56":
                f = m.image_features(m.decode_ppm(payload), self.grid)
            elif payload[:4] == m.RVID_MAGIC:
                frames = m.decode_rvid(payload)
                f = np.concatenate([m.image_features(frames[0], self.grid),
                                    [float(len(frames))]])
            else:
                raise ValueError("unknown container magic")
        except Exception:
            return np.zeros(self.feature_dim, dtype=np.float32), False
        out = np.zeros(self.feature_dim, dtype=np.float32)
        out[: min(len(f), self.feature_dim)] = f[: self.feature_dim]
        return out, True

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.empty((len(payloads), self.feature_dim), dtype=np.float32)
        ok = np.empty(len(payloads), dtype=bool)
        for i, p in enumerate(payloads):
            feats[i], ok[i] = self._features(p)
        mean = feats.mean(axis=1).astype(np.float64)
        return (
            batch.drop_columns(["payload"])  # heavy bytes leave the stream here
            .append_column("features", pa.array(list(feats),
                                                pa.list_(pa.float32(), self.feature_dim)))
            .append_column("feat_mean", pa.array(mean))
            .append_column("decode_ok", pa.array(ok))
        )


class DeterministicFakeDecoder:
    """Seeded stand-in decoder: features are a pure function of the
    payload bytes (blake2b-seeded), so outputs are reproducible and
    testable without media libs.  Emits the same output schema the
    real decoder would: fixed-length float32 feature vector + basic
    stats + a decode QA flag."""

    FEATURE_DIM = 16

    def __init__(self, feature_dim: int = FEATURE_DIM):
        import hashlib

        self._hash = hashlib.blake2b
        self.feature_dim = feature_dim

    def _features(self, payload: bytes | None) -> tuple[np.ndarray, bool]:
        if not payload:
            return np.zeros(self.feature_dim, dtype=np.float32), False
        digest = self._hash(payload, digest_size=self.feature_dim * 4).digest()
        raw = np.frombuffer(digest, dtype=np.uint32).astype(np.float64)
        return (raw / np.float64(1 << 32)).astype(np.float32), True

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.empty((len(payloads), self.feature_dim), dtype=np.float32)
        ok = np.empty(len(payloads), dtype=bool)
        for i, p in enumerate(payloads):
            feats[i], ok[i] = self._features(p)
        mean = feats.mean(axis=1).astype(np.float64)
        return (
            batch.drop_columns(["payload"])  # heavy bytes leave the stream here
            .append_column("features", pa.array(list(feats), pa.list_(pa.float32(), self.feature_dim)))
            .append_column("feat_mean", pa.array(mean))
            .append_column("decode_ok", pa.array(ok))
        )


def decode_media(ds, *, decoder=DeterministicFakeDecoder, concurrency: int = 4,
                 batch_size: int = 64):
    """Actor-pool decode stage.

    ``batch_size`` is deliberately SMALL: media payloads are large, so
    batch bytes = batch_size x payload size must fit the worker heap
    (ray_guide memory notes) — 64 x ~5 MB ~ 320 MB per in-flight batch.
    """
    return ds.map_batches(
        decoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=autoscale(concurrency),
    )


def synth_media(sf_dir: str, kind: str = "image"):
    """Deterministic media table derived from documents (payload =
    utf-8 text bytes standing in for an unknown/compressed container;
    exercises the decode-QA path)."""
    import ray.data as rd

    from ..sources import read_parquet_clean

    def to_media(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = len(batch)
        text = pc.cast(batch.column("text"), pa.string())
        return pa.table(
            {
                "media_id": batch.column("doc_id"),
                "kind": pa.array([kind] * n, pa.string()),
                "payload": pc.cast(text, pa.binary()),
                "meta_width": pa.array(np.full(n, 640, dtype=np.int32)),
                "meta_height": pa.array(np.full(n, 480, dtype=np.int32)),
                "meta_sample_rate": pa.array(np.zeros(n, dtype=np.int32)),
            }
        )

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(to_media, batch_format="pyarrow")


IMG_SIZE = 24          # synthesized image side (pixels)
WAV_RATE = 8000
WAV_SAMPLES = 1024
VID_FRAMES = 6
VID_SIZE = 16


def _synth_image(doc_id: int) -> np.ndarray:
    """Deterministic RGB gradient+checker pattern keyed by doc_id."""
    y, x = np.mgrid[0:IMG_SIZE, 0:IMG_SIZE]
    base = (doc_id * 37) % 251
    r = (x * 255 // IMG_SIZE + base) % 256
    g = (y * 255 // IMG_SIZE + base * 2) % 256
    b = (((x // 4 + y // 4) % 2) * 200 + base) % 256
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def _synth_audio(doc_id: int) -> np.ndarray:
    """Deterministic int16 sine whose frequency is keyed by doc_id."""
    freq = 200.0 + (doc_id * 13) % 1800
    t = np.arange(WAV_SAMPLES, dtype=np.float64) / WAV_RATE
    return (np.sin(2 * np.pi * freq * t) * 12000).astype(np.int16)


def synth_media_raw(sf_dir: str, kind: str = "image"):
    """Deterministic media table with REAL encoded payloads: PNG/P6/GIF
    images (containers cycle by id, PNG cycling its scanline filter,
    GIF over a posterized copy so the exact-palette encoder applies),
    PCM16 WAV audio, or RVID raw video (frame f = the doc's image
    rolled by f rows) — decodable end-to-end by ``RawMediaDecoder``
    with no media library."""
    import ray.data as rd

    from ..kernels import media
    from ..sources import read_parquet_clean

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        payloads, w, h, sr = [], [], [], []
        for i in ids:
            i = int(i)
            if kind == "audio":
                payloads.append(media.encode_wav(_synth_audio(i), WAV_RATE))
                w.append(0); h.append(0); sr.append(WAV_RATE)
            elif kind == "video":
                img = _synth_image(i)[:VID_SIZE, :VID_SIZE]
                frames = np.stack([np.roll(img, f, axis=0)
                                   for f in range(VID_FRAMES)])
                payloads.append(media.encode_rvid(frames))
                w.append(VID_SIZE); h.append(VID_SIZE); sr.append(0)
            else:
                img = _synth_image(i)
                # cycle containers so the decoder's magic sniffing is
                # exercised on real mixed corpora: PNG (cycling the
                # scanline filter), binary PPM, GIF (posterized to fit
                # the exact-palette encoder), JPEG (alternating 4:4:4
                # and the common web 4:2:0 layout, baseline and
                # progressive/SOF2 — the two layouts real crawls carry)
                r = i % 4
                if r == 0:
                    payloads.append(media.encode_png(img, filter_type=(i // 4) % 5))
                elif r == 1:
                    payloads.append(media.encode_ppm(img))
                elif r == 2:
                    payloads.append(media.encode_gif(img & 0xC0))
                else:
                    payloads.append(media.encode_jpeg(
                        img, quality=90,
                        subsample="420" if (i // 4) % 2 else "444",
                        progressive=bool((i // 8) % 2)))
                w.append(IMG_SIZE); h.append(IMG_SIZE); sr.append(0)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array([kind] * len(ids), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "meta_width": pa.array(np.array(w, dtype=np.int32)),
                "meta_height": pa.array(np.array(h, dtype=np.int32)),
                "meta_sample_rate": pa.array(np.array(sr, dtype=np.int32)),
            }
        )

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return ds.map_batches(to_media, batch_format="pyarrow")


def frame_sample(ds, *, every_k: int = 5, max_frames: int = 16,
                 frame_bytes: int = 256, batch_size: int = 64):
    """Video frame-sampling stage: each payload expands to its sampled
    frame rows (the flat_map shape of the media pipeline).

    RVID payloads get REAL frame extraction: each sampled frame is
    seek-decoded from its computed offset (never decoding the frames
    in between) and re-encoded as a standalone P6 image payload, so
    sampled frames flow straight back into ``RawMediaDecoder``.
    Other payloads fall back to deterministic byte slices (the
    plumbing-only behavior for unknown containers).  Small batches
    keep batch_size x max_frames x frame size within the worker heap.
    """
    from ..kernels import media

    def f(batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        ids = batch.column("media_id").to_numpy()
        kinds = batch.column("kind").to_pylist()
        out_id, out_idx, out_frames, out_kind = [], [], [], []
        for mid, kind, p in zip(ids, kinds, payloads):
            p = p or b""
            if p[:4] == media.RVID_MAGIC:
                import struct

                n_frames = min(max_frames, struct.unpack_from("<I", p, 4)[0])
                for fi in range(0, n_frames, every_k):
                    out_id.append(int(mid))
                    out_idx.append(fi)
                    out_kind.append(kind)
                    out_frames.append(media.encode_ppm(media.rvid_frame(p, fi)))
                continue
            n_frames = min(max_frames, max(1, len(p) // frame_bytes))
            for fi in range(0, n_frames, every_k):
                out_id.append(int(mid))
                out_idx.append(fi)
                out_kind.append(kind)
                out_frames.append(p[fi * frame_bytes:(fi + 1) * frame_bytes])
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "kind": pa.array(out_kind, pa.string()),
                "frame_index": pa.array(out_idx, pa.int32()),
                "frame_payload": pa.array(out_frames, pa.binary()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)
