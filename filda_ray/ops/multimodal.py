"""Multimodal column stages (image/audio/video as opaque binary).

The engine treats media as ``binary`` columns with typed metadata and
runs decode / feature-extract / resize / frame-sample as actor-pool
map_batches stages.  This container ships no image/audio libraries, so
the DECODE KERNELS are stubs — ``DeterministicFakeDecoder`` (seeded,
reproducible pseudo-decode used by tests and queries) or
``NotImplementedDecoder`` (raises, marking the integration point) —
while all the Ray-side plumbing is real and tested: schema handling,
actor signature, batch sizing for large payloads, output layout.

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
    """The real-decoder integration point.  __init__ is where PIL /
    libsndfile / pyav handles would be created (once per actor)."""

    def __init__(self, target_size: tuple[int, int] = (64, 64)):
        raise NotImplementedError(
            "no image/audio libraries in this environment; use "
            "DeterministicFakeDecoder for the plumbing-exercising path"
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
    utf-8 text bytes standing in for encoded media)."""
    import ray.data as rd

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

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(to_media, batch_format="pyarrow")


def frame_sample(ds, *, every_k: int = 5, max_frames: int = 16,
                 frame_bytes: int = 256, batch_size: int = 64):
    """Video frame-sampling stage: each payload expands to its sampled
    frame rows (the flat_map shape of the media pipeline).

    Without a codec in this container the 'frames' are deterministic
    payload slices (frame i = bytes [i*frame_bytes, (i+1)*frame_bytes));
    the REAL part is the plumbing a codec version would share: row
    multiplication with a frame_index column, per-frame payloads
    leaving the stream as new rows, and small batches so
    batch_size x max_frames x frame size stays within the worker heap.
    """

    def f(batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        ids = batch.column("media_id").to_numpy()
        kinds = batch.column("kind").to_pylist()
        out_id, out_idx, out_frames, out_kind = [], [], [], []
        for mid, kind, p in zip(ids, kinds, payloads):
            p = p or b""
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
