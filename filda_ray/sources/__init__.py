"""Deterministic synthetic sources (no external data).

The engine's primary input is a Parquet table of Common-Crawl-style
pages ``(url, warc_ts, html, text, lang)`` per BASELINE.json
input_hint.  The sandbox testdata provides a ``documents`` table; the
``pages`` source derives the page table from it with *pure integer /
IEEE-double arithmetic that is mirrored 1:1 in SQL*, so every derived
column (host, lat/lon, tiles, background stats) is checkable against a
DuckDB oracle on the same parquet files.
"""

from __future__ import annotations


def read_parquet_clean(path, *, columns=None, **kw):
    """``ray.data.read_parquet`` with a metadata-free explicit schema.

    The testdata parquet files embed a ``b'pandas'`` schema-metadata
    dict; pyarrow schemas carrying it are UNHASHABLE, so every Ray
    shuffle-reduce over blocks descended from such a read logs
    'Failed to hash the schemas (for deduplication)' and skips the
    schema-dedup fast path.  Deriving the (column-pruned) schema from
    the file footer and passing it explicitly strips the metadata at
    the source — one footer read on the driver, zero per-block cost.
    Schema-level metadata only; field metadata (hashable) is kept.
    """
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    f = path[0] if isinstance(path, (list, tuple)) and path else path
    if isinstance(f, str) and os.path.isdir(f):
        cand = sorted(glob.glob(os.path.join(f, "**", "*.parquet"),
                                recursive=True))
        f = cand[0] if cand else f
    try:
        sch = pq.read_schema(f)
        names = columns if columns is not None else sch.names
        clean = pa.schema([sch.field(n) for n in names]).remove_metadata()
    except Exception:
        return rd.read_parquet(path, columns=columns, **kw)
    return rd.read_parquet(path, columns=columns, schema=clean, **kw)
