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


def read_parquet_unify(paths, *, columns=None):
    """Schema-evolution read: union-by-name over Parquet files whose
    schemas DRIFT (a 100-TB corpus accumulates added/dropped columns
    across crawl generations).  Per-file column-pruned reads; each
    file's blocks gain its missing columns as typed nulls and are
    projected to one canonical column order; the union is a zero-copy
    concatenation of streams (no shuffle).

    Schemas come from one footer read per file on the driver (the same
    metadata Ray's planner reads); conflicting types for a shared
    column raise via ``pa.unify_schemas`` rather than corrupting data.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    paths = [paths] if isinstance(paths, str) else list(paths)
    schemas = [pq.read_schema(p).remove_metadata() for p in paths]
    unified = pa.unify_schemas(schemas)
    if columns is not None:
        unified = pa.schema([unified.field(c) for c in columns])
    names = list(unified.names)

    parts = []
    for p, sch in zip(paths, schemas):
        have = [c for c in names if sch.get_field_index(c) != -1]

        def widen(batch: pa.Table, _have=tuple(have)) -> pa.Table:
            cols = []
            for f in unified:
                if f.name in _have:
                    cols.append(batch.column(f.name).cast(f.type))
                else:
                    cols.append(pa.nulls(len(batch), f.type))
            return pa.Table.from_arrays(cols, schema=unified)

        parts.append(read_parquet_clean(p, columns=have)
                     .map_batches(widen, batch_format="pyarrow"))
    out = parts[0]
    return out.union(*parts[1:]) if len(parts) > 1 else out
