"""Pages table synthesis — deterministic and SQL-mirrorable.

Maps the driver's ``documents`` table (doc_id, text, lang, source,
n_chars) to the input_hint page shape::

    url:string  warc_ts:timestamp[us]  html:binary  text:string  lang:string

Every derived quantity is pure integer + IEEE-double arithmetic so the
DuckDB oracle computes bit-identical values (``sql_*`` helpers below
emit the mirroring SQL expressions from the same constants).

Host assignment is zipf-ish skewed (host 0 receives ~3% of pages at
N_HOSTS=1000) to exercise mega-host / mega-cell salting, mirroring the
fire-cluster skew the reference's Pool.map suffers from
(FILDA.py:1061-1088, SURVEY.md §4 skew row).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import read_parquet_clean

N_HOSTS = 1000
_HOST_MIX = 2654435761          # Knuth multiplicative constant
_HOST_MOD = 4294967296          # 2^32
_TS_PRIME = 7919
_TS_RANGE_S = 7776000           # 90 days (reference climatology window)
TS_EPOCH = "2024-01-01 00:00:00"
_TS_EPOCH_US = 1704067200000000  # 2024-01-01 in unix micros

_LAT_A, _LAT_B, _LAT_P = 40503, 9973, 100003
_LON_A, _LON_B, _LON_P = 69621, 12345, 99991
LAT_MIN, LAT_SPAN = -60.0, 145.0   # valid-latitude band (FILDA_IO.py:406-408)
LON_MIN, LON_SPAN = -180.0, 360.0

HTML_PREFIX = '<!doctype html><html><head><meta charset="utf-8"><title>host{host_id}</title></head><body><p>'
HTML_SUFFIX = "</p></body></html>"


# ---------------------------------------------------------------------------
# numpy side (used inside map_batches)
# ---------------------------------------------------------------------------

def host_id_of(doc_id: np.ndarray) -> np.ndarray:
    d = np.asarray(doc_id, dtype=np.int64)
    u = ((d * _HOST_MIX) % _HOST_MOD) / float(_HOST_MOD)
    return np.floor(N_HOSTS * u * u).astype(np.int64)


def host_lat(host_id: np.ndarray) -> np.ndarray:
    h = (np.asarray(host_id, dtype=np.int64) * _LAT_A + _LAT_B) % _LAT_P
    return LAT_MIN + (LAT_SPAN * h) / float(_LAT_P)


def host_lon(host_id: np.ndarray) -> np.ndarray:
    h = (np.asarray(host_id, dtype=np.int64) * _LON_A + _LON_B) % _LON_P
    return LON_MIN + (LON_SPAN * h) / float(_LON_P)


def url_of(doc_id: np.ndarray, host_id: np.ndarray) -> np.ndarray:
    host_s = pc.utf8_lpad(pc.cast(pa.array(np.asarray(host_id, np.int64)),
                                  pa.string()), 4, "0")
    doc_s = pc.cast(pa.array(np.asarray(doc_id, np.int64)), pa.string())
    url = pc.binary_join_element_wise(
        "https://host", host_s, ".example.com/doc/", doc_s, "")
    return np.asarray(url.to_pylist(), dtype=object)


def warc_ts_us(doc_id: np.ndarray) -> np.ndarray:
    d = np.asarray(doc_id, dtype=np.int64)
    return _TS_EPOCH_US + ((d * _TS_PRIME) % _TS_RANGE_S) * 1_000_000


def render_html(host_id: np.ndarray, texts) -> np.ndarray:
    """bytes html per row; ``kernels.textkit.extract_text`` inverts it
    byte-for-byte (the per-row invariant).

    Deliberately per-row: this is the INDEPENDENT property-test twin
    the round-trip tests compare against.  The hot path is
    ``synth_pages_batch`` below, which builds the same html with
    vectorized ``pc.binary_join_element_wise`` — keeping this twin
    loop-based means the tests are not comparing a kernel to itself."""
    out = np.empty(len(host_id), dtype=object)
    for i, t in enumerate(texts):
        pre = HTML_PREFIX.format(host_id=f"{host_id[i]:04d}")
        out[i] = (pre + (t or "") + HTML_SUFFIX).encode("utf-8")
    return out


def synth_pages_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> pages batch (map_batches body, Arrow in/out).

    Fully vectorized: host/coord arithmetic in numpy, url/html
    construction with pyarrow.compute string kernels (no Python loop)."""
    doc_id = batch.column("doc_id").to_numpy()
    host = host_id_of(doc_id)
    host_s = pc.utf8_lpad(pc.cast(pa.array(host, pa.int64()), pa.string()), 4, "0")
    doc_s = pc.cast(pa.array(doc_id, pa.int64()), pa.string())
    url = pc.binary_join_element_wise("https://host", host_s, ".example.com/doc/", doc_s, "")
    text = batch.column("text").cast(pa.string())
    html_str = pc.binary_join_element_wise(
        '<!doctype html><html><head><meta charset="utf-8"><title>host', host_s,
        "</title></head><body><p>", pc.fill_null(text, ""), "</p></body></html>", "",
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_id, pa.int64()),
            "url": url,
            "warc_ts": pa.array(warc_ts_us(doc_id), pa.timestamp("us")),
            "html": pc.cast(html_str, pa.binary()),
            "text": text,
            "lang": batch.column("lang").cast(pa.string()),
        }
    )


REPLICA_STRIDE = 10_000_000


def read_pages(sf_dir: str, *, replicate: int = 1):
    """ray.data pipeline: documents.parquet -> pages Dataset.

    Column-pruned read (doc_id, text, lang only) + one vectorized
    map_batches; streams — no materialization.

    ``replicate`` > 1 deterministically tiles the corpus (bench-scale
    synthesis): replica r shifts doc_id by r*REPLICA_STRIDE, which
    re-derives new hosts/coordinates/timestamps — a larger page table
    with the same statistical shape, no external data.
    """
    import ray.data as rd

    if replicate > 1:
        # RANGE-DRIVEN replication: the source Dataset has one row per
        # OUTPUT page (rd.range), with the tiny base corpus broadcast
        # once via ray.put and gathered per task.  This keeps Ray's
        # row accounting truthful — a downstream stage's min-rows
        # bundling counts REAL pages, not pre-expansion documents.
        # (The previous in-stream expander multiplied rows inside
        # map_batches; any fused consumer with a large batch_size —
        # the histogram/count partials — then bundled by PRE-expansion
        # rows and collapsed the whole chain to ONE task: a 1.27M-page
        # hex background measured as one 29.8 s task.  Range-driven
        # synthesis removes that hazard class: fused-chain bundles are
        # post-expansion by construction, no materialize barrier
        # needed.)  Bench-synthesis path only; replicate=1 production
        # reads stream straight from parquet.
        import pyarrow.parquet as pq
        import ray

        base = pq.read_table(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text", "lang"])
        ref = ray.put(base)
        nb = len(base)
        total = nb * replicate

        def synth_range(batch: pa.Table) -> pa.Table:
            t = ray.get(ref)      # zero-copy plasma read, per task
            ids = batch.column("id").to_numpy()
            i = (ids % nb).astype(np.int64)
            r = (ids // nb).astype(np.int64)
            rows = t.take(pa.array(i))
            doc = rows.column("doc_id").to_numpy() + r * REPLICA_STRIDE
            rows = rows.set_column(
                rows.schema.get_field_index("doc_id"), "doc_id",
                pa.array(doc, pa.int64()))
            return synth_pages_batch(rows)

        ds = rd.range(total,
                      override_num_blocks=int(np.clip(total // 65536, 32, 2048)))
        return ds.map_batches(synth_range, batch_format="pyarrow")

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return ds.map_batches(synth_pages_batch, batch_format="pyarrow", batch_size=None)


def write_pages_parquet(sf_dir: str, out_dir: str, *, replicate: int = 1,
                        min_rows_per_file: int = 200_000) -> str:
    """Materialize the synthesized pages table to Parquet (the actual
    input_hint shape: url, warc_ts, html, text, lang + doc_id).

    Bench prep path: synthesis happens ONCE, untimed; benchmark runs
    then read a real page table like production would."""
    import os

    import ray.data as rd

    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return out_dir
    ds = read_pages(sf_dir, replicate=replicate)
    # one file per block: repartition so the table lands as MANY
    # mid-sized files — a single giant file reads as ONE Ray task
    # (observed: 716 MB single file -> 1 read task serializing the
    # whole scan) and breaks both read parallelism and resumability
    n_files = max(16, ds.count() // max(min_rows_per_file, 1))
    ds = ds.repartition(int(n_files))
    ds.write_parquet(out_dir)
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write("ok")
    return out_dir


def read_pages_parquet(pages_dir: str):
    """Read a materialized pages table (column-pruned: html/text only
    live until the extraction stage drops them).

    Read parallelism is forced to ~4x cluster CPUs: Ray's default is
    one task per FILE, and a mid-sized table (e.g. 26 files on 32
    CPUs) under-parallelizes the decode-heavy scan (measured 18.6 s ->
    15.3 s at 128 blocks for the 5.12M-page flagship read)."""
    import ray

    n_blocks = 64
    try:
        if ray.is_initialized():
            n_blocks = max(16, 4 * int(ray.cluster_resources().get("CPU", 16)))
    except Exception:
        pass
    return read_parquet_clean(
        pages_dir, columns=["doc_id", "url", "warc_ts", "html", "text", "lang"],
        override_num_blocks=n_blocks,
    )


def host_of_url(urls) -> np.ndarray:
    """host_id back out of the url (string kernel; SQL mirror uses
    regexp_extract).  Demonstrates the url-parsing ingest path."""
    # https://host{NNNN}.example.com/doc/{id}
    col = urls if isinstance(urls, (pa.Array, pa.ChunkedArray)) else \
        pa.array(list(urls), pa.string())
    return host_of_url_arrow(col).to_numpy(zero_copy_only=False)


def host_of_url_arrow(url_col):
    """Vectorized Arrow twin of ``host_of_url`` (slice + cast; no
    per-row Python) — the hot-path variant."""
    import pyarrow as pa
    import pyarrow.compute as pc

    return pc.cast(pc.utf8_slice_codeunits(url_col, 12, 16), pa.int64())


# ---------------------------------------------------------------------------
# SQL mirrors (same constants; emit DuckDB expressions)
# ---------------------------------------------------------------------------

def sql_host_id(doc_id: str = "doc_id") -> str:
    u = f"((({doc_id} * {_HOST_MIX}) % {_HOST_MOD}) / {float(_HOST_MOD)!r})"
    return f"cast(floor({N_HOSTS} * {u} * {u}) as bigint)"


def sql_lat(host_id: str) -> str:
    return (f"({LAT_MIN!r} + ({LAT_SPAN!r} * (({host_id} * {_LAT_A} + {_LAT_B}) % {_LAT_P}))"
            f" / {float(_LAT_P)!r})")


def sql_lon(host_id: str) -> str:
    return (f"({LON_MIN!r} + ({LON_SPAN!r} * (({host_id} * {_LON_A} + {_LON_B}) % {_LON_P}))"
            f" / {float(_LON_P)!r})")


def sql_url(doc_id: str, host_id: str) -> str:
    return ("('https://host' || lpad(cast(" + host_id + " as varchar), 4, '0')"
            " || '.example.com/doc/' || cast(" + doc_id + " as varchar))")


def sql_warc_ts(doc_id: str = "doc_id") -> str:
    return (f"(TIMESTAMP '{TS_EPOCH}' + to_seconds(({doc_id} * {_TS_PRIME}) % {_TS_RANGE_S}))")


def sql_pages_cte(docs_view: str = "documents") -> str:
    """CTE body producing the page table + host/lat/lon in SQL."""
    return f"""
    SELECT doc_id,
           {sql_url('doc_id', sql_host_id('doc_id'))} AS url,
           {sql_warc_ts('doc_id')} AS warc_ts,
           text, lang,
           {sql_host_id('doc_id')} AS host_id,
           {sql_lat(sql_host_id('doc_id'))} AS lat,
           {sql_lon(sql_host_id('doc_id'))} AS lon
    FROM {docs_view}
    """
