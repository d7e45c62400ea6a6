"""JSONL (newline-delimited JSON) source/sink — the other ubiquitous
web-corpus interchange format alongside WARC (crawl index shards,
WET-derived corpora, public dataset dumps all ship as ``.jsonl.gz``).

Layout mirrors ``sources.warc``: the sink writes one ``.jsonl.gz``
per block from its own map task (distributed, no driver byte
handling; the stream reduces to a tiny (path, n_records) manifest),
and the source runs one read task per file — parallelism comes from
the file count, the standard unit for sharded JSONL corpora.  Stdlib
``json`` + ``gzip`` for the sink; the source inflates and hands the
buffer to ``pyarrow.json`` (Arrow's C++ NDJSON reader), so parse cost
is one vectorized call per file, not a Python loop per row.

Reference analog: the tabular side-input readers (FILDA_IO.py's CSV /
flat-table loaders) — line-oriented text sources decoded once per
task into typed columns.
"""

from __future__ import annotations

import gzip
import io
import json
import os
import uuid

import pyarrow as pa


def write_jsonl(ds, out_dir: str, *, columns: list[str] | None = None) -> list[str]:
    """Distributed JSONL sink: each block becomes one ``.jsonl.gz``
    written by its map task; returns the sorted file list from the
    tiny manifest the stream reduces to.

    Values must be JSON-native (string / int / float / bool / null) —
    cast timestamps to integer epoch-us and binary to base64/hex
    UPSTREAM so the round-trip is exact rather than locale-formatted;
    a non-JSON-native column raises immediately with the column name.
    """
    os.makedirs(out_dir, exist_ok=True)

    def sink(batch: pa.Table) -> pa.Table:
        if columns is not None:
            batch = batch.select(columns)
        if len(batch) == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64())})
        for field in batch.schema:
            t = field.type
            ok = (pa.types.is_string(t) or pa.types.is_large_string(t)
                  or pa.types.is_integer(t) or pa.types.is_floating(t)
                  or pa.types.is_boolean(t) or pa.types.is_null(t))
            if not ok:
                raise TypeError(
                    f"write_jsonl: column {field.name!r} has non-JSON-native "
                    f"type {t}; cast upstream (timestamps -> epoch-us int64, "
                    f"binary -> hex/base64)")
        rows = batch.to_pylist()
        name = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.jsonl.gz")
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            for r in rows:
                gz.write(json.dumps(r, ensure_ascii=False,
                                    separators=(",", ":")).encode("utf-8"))
                gz.write(b"\n")
        # temp-file + atomic rename: a task killed mid-write leaves only
        # a .tmp the reader's glob ignores, never a truncated shard
        with open(name + ".tmp", "wb") as f:
            f.write(buf.getvalue())
        os.replace(name + ".tmp", name)
        return pa.table({"path": pa.array([name]),
                         "n_records": pa.array([len(batch)], pa.int64())})

    manifest = ds.map_batches(sink, batch_format="pyarrow").take_all()
    return sorted(r["path"] for r in manifest)


def read_jsonl(path_or_paths) -> "ray.data.Dataset":
    """JSONL source: one read task per ``.jsonl[.gz]`` file; each task
    inflates (when gzipped) and parses with Arrow's C++ NDJSON reader
    — typed columns out, no per-row Python.

    Prefer passing the manifest list ``write_jsonl`` returned: it names
    exactly the shards of the successful sink attempts, so a retried
    sink task's orphan shard can never be read twice.  The directory
    form globs ``*.jsonl[.gz]`` for externally-produced corpora."""
    import glob

    import ray.data as rd
    from pyarrow import json as pa_json

    p = path_or_paths
    if isinstance(p, str) and os.path.isdir(p):
        p = sorted(glob.glob(os.path.join(p, "*.jsonl"))
                   + glob.glob(os.path.join(p, "*.jsonl.gz")))
    files = rd.read_binary_files(p)

    def parse(batch) -> pa.Table:
        tables = []
        for blob in batch["bytes"]:
            raw = bytes(blob)
            if raw[:2] == b"\x1f\x8b":
                raw = gzip.decompress(raw)
            tables.append(pa_json.read_json(io.BytesIO(raw)))
        return pa.concat_tables(tables, promote_options="default")

    return files.map_batches(parse, batch_format="numpy", batch_size=1)
