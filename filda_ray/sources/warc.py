"""WARC 1.0 source/sink — Common Crawl's native archive format,
implemented from the public ISO 28500 spec with stdlib gzip only.

Layout matches real CC archives: each record is its OWN gzip member,
members concatenated into a ``.warc.gz`` file, so a reader can split
records without decompressing the whole file sequentially per record
and a writer can stream-append.  One archive file = one Ray read task
(the standard unit for CC — files are ~1 GB); parallelism comes from
the file count, exactly like production WARC processing.

Payloads here are the raw response body (the synthetic profile embeds
no HTTP headers); the record carries WARC-Type, WARC-Target-URI,
WARC-Date (second precision — the synthetic warc_ts values are whole
seconds) and Content-Length.
"""

from __future__ import annotations

import gzip
import os
import uuid
import zlib
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa

_CRLF = b"\r\n"


def warc_record_bytes(url: str, ts_us: int, payload: bytes) -> bytes:
    """One uncompressed WARC/1.0 response record."""
    dt = datetime.fromtimestamp(ts_us / 1e6, tz=timezone.utc)
    head = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: response" + _CRLF
        + b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF
        + b"WARC-Date: " + dt.strftime("%Y-%m-%dT%H:%M:%SZ").encode() + _CRLF
        + b"Content-Length: " + str(len(payload)).encode() + _CRLF
        + _CRLF
    )
    return head + payload + _CRLF + _CRLF


def parse_warc_members(blob: bytes):
    """Yield (url, ts_us, payload) from a member-per-record .warc.gz
    blob.  Uses zlib's unused_data to walk the concatenated gzip
    members — no temp files, no double scan."""
    pos = 0
    view = memoryview(blob)
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        rec = d.decompress(view[pos:])
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("corrupt gzip member in WARC stream")
        pos += consumed
        head, _, rest = rec.partition(_CRLF + _CRLF)
        url, ts_us, clen = None, None, None
        for line in head.split(_CRLF):
            k, _, v = line.partition(b": ")
            if k == b"WARC-Target-URI":
                url = v.decode("utf-8")
            elif k == b"WARC-Date":
                dt = datetime.strptime(v.decode(), "%Y-%m-%dT%H:%M:%SZ")
                ts_us = int(dt.replace(tzinfo=timezone.utc).timestamp() * 1e6)
            elif k == b"Content-Length":
                clen = int(v)
        if url is None or ts_us is None or clen is None:
            raise ValueError("WARC record missing required headers")
        yield url, ts_us, bytes(rest[:clen])


def parse_warc_plain(buf: bytes):
    """Yield (url, ts_us, payload) from an UNCOMPRESSED record stream
    (what Arrow's transparent .gz detection hands a reader): records
    delimited by their own Content-Length + the trailing CRLFCRLF."""
    pos = 0
    while pos < len(buf):
        end = buf.find(_CRLF + _CRLF, pos)
        if end < 0:
            break
        head = buf[pos:end]
        url, ts_us, clen = None, None, None
        for line in head.split(_CRLF):
            k, _, v = line.partition(b": ")
            if k == b"WARC-Target-URI":
                url = v.decode("utf-8")
            elif k == b"WARC-Date":
                dt = datetime.strptime(v.decode(), "%Y-%m-%dT%H:%M:%SZ")
                ts_us = int(dt.replace(tzinfo=timezone.utc).timestamp() * 1e6)
            elif k == b"Content-Length":
                clen = int(v)
        if url is None or ts_us is None or clen is None:
            raise ValueError("WARC record missing required headers")
        body = end + 4
        yield url, ts_us, buf[body:body + clen]
        pos = body + clen + 4


def parse_warc(blob: bytes):
    """Dispatch on the gzip magic: member-per-record .warc.gz blobs
    walk gzip members; already-decompressed streams (Arrow readers
    detect .gz and decompress transparently) parse records directly."""
    if blob[:2] == b"\x1f\x8b":
        yield from parse_warc_members(blob)
    else:
        yield from parse_warc_plain(blob)


def write_warc(ds, out_dir: str, *, url_col: str = "url",
               ts_col: str = "warc_ts", payload_col: str = "html") -> list[str]:
    """Distributed WARC sink: each block becomes one ``.warc.gz``
    (member-per-record, CC layout) written by its map task; returns
    the written file list from the tiny (path, n_records) manifest
    the stream reduces to.  Per-record gzip is inherent to the format
    (one C deflate call per record)."""
    os.makedirs(out_dir, exist_ok=True)

    def sink(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64())})
        urls = batch.column(url_col).to_pylist()
        ts = batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        payloads = batch.column(payload_col).to_pylist()
        name = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.warc.gz")
        # temp-file + atomic rename: a task killed mid-write leaves only
        # a .tmp the reader's glob ignores, never a truncated archive
        with open(name + ".tmp", "wb") as f:
            for u, t, p in zip(urls, ts, payloads):
                if isinstance(p, str):
                    p = p.encode("utf-8")
                f.write(gzip.compress(warc_record_bytes(u, int(t), p or b""),
                                      mtime=0))
        os.replace(name + ".tmp", name)
        return pa.table({"path": pa.array([name]),
                         "n_records": pa.array([len(batch)], pa.int64())})

    manifest = ds.map_batches(sink, batch_format="pyarrow").take_all()
    return sorted(r["path"] for r in manifest)


def read_warc(path_or_paths) -> "ray.data.Dataset":
    """WARC source: one read task per archive file (the CC unit of
    parallelism); each task walks the gzip members and emits
    (url, warc_ts, payload) rows."""
    import glob

    import ray.data as rd

    p = path_or_paths
    if isinstance(p, str) and os.path.isdir(p):
        p = sorted(glob.glob(os.path.join(p, "*.warc.gz")))
    files = rd.read_binary_files(p)

    def parse(batch) -> pa.Table:
        urls, tss, payloads = [], [], []
        for blob in batch["bytes"]:
            for u, t, pay in parse_warc(bytes(blob)):
                urls.append(u)
                tss.append(t)
                payloads.append(pay)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(np.array(tss, np.int64)).cast(pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
        })

    return files.map_batches(parse, batch_format="numpy", batch_size=1)
