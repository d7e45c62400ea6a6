"""Driver-contract queries: Ray Data implementations + DuckDB oracles.

Every SQL-expressible operator from SURVEY.md §2 gets a pair
(ray_impl(sf_dir) -> table, oracle_sql) with IDENTICAL column names.
Float-valued outputs either use exact-in-double integer arithmetic
(counts, integer sums, cents) or identical per-row IEEE expressions,
so order-insensitive value hashes agree; genuinely order-dependent
float sums are avoided by design (documented per query).

Ray is initialised by the DRIVER; nothing here calls ray.init().
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..kernels import cells
from ..ops import relational as rel
from ..ops import shuffle_partitions
from ..ops import temporal
from ..ops.dedup import dedup_exact
from ..ops.text import quality_op
from ..sources import pages as P
from ..sources import read_parquet_clean
from ..sources import polygons as PG
from ..pipelines import flagship

BUCKET_30D_US = 2_592_000 * 1_000_000
SQL_PC_TILE = (
    "cast(least(greatest(cast(floor((lat+90)/10.0) as bigint),0),17)*36 + "
    "((cast(floor((lon+180)/10.0) as bigint) % 36)+36)%36 as int)"
)


def _rd():
    import ray.data as rd

    return rd


_SCRATCH_REGISTERED: set[str] = set()


def _scratch_dir(prefix: str, sf_dir: str) -> str:
    """Per-(input, process) scratch dir under /tmp.  Keyed by pid as
    well as input so two concurrent runs over the same sf_dir cannot
    rmtree each other's live files (the lazy read-backs need their
    shards alive until consumption, so cleanup must not happen before
    process exit).  Wiped on entry for within-process reuse and again
    at interpreter exit, so normal runs leak nothing; only a SIGKILLed
    run leaks one dir."""
    import atexit
    import hashlib
    import os
    import shutil

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    d = f"/tmp/{prefix}{key}_{os.getpid()}"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    if d not in _SCRATCH_REGISTERED:
        _SCRATCH_REGISTERED.add(d)
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def _round_half_up(x: np.ndarray) -> np.ndarray:
    """DuckDB's round() is half-away-from-zero; numpy's is half-even.
    Mirror DuckDB for positive values (all money columns here)."""
    return np.floor(x + 0.5)


def _nan_to_null(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    for c in cols:
        df[c] = df[c].astype(object).where(~pd.isna(df[c]), None)
    return df


# ---------------------------------------------------------------------------
# flagship contextual detection (full SQL oracle)
# ---------------------------------------------------------------------------

FLAGSHIP_COLS = ["doc_id", "url", "pc_tile", "n_chars", "bg_median", "bg_mad",
                 "bg_n", "bg_trim", "win_ring", "score", "status", "admin_id"]


def q_flagship(sf_dir: str):
    det = flagship.detect_pipeline(sf_dir)
    return det.select_columns(FLAGSHIP_COLS)


def sql_flagship() -> str:
    pages = P.sql_pages_cte()
    return f"""
WITH pages AS ({pages}),
tiled AS (
  SELECT doc_id, url, lat, lon,
         cast(length(text) as bigint) AS n_chars,
         least(greatest(cast(floor((lat+90)/10.0) as bigint),0),17) AS trow,
         ((cast(floor((lon+180)/10.0) as bigint) % 36)+36)%36 AS tcol,
         {SQL_PC_TILE} AS pc_tile
  FROM pages
),
tiles AS (SELECT DISTINCT pc_tile, trow, tcol FROM tiled),
nbr AS (
  SELECT t.pc_tile AS center,
         cast(n.n_chars as double) AS v,
         greatest(abs(n.trow - t.trow),
                  least(abs(n.tcol - t.tcol), 36 - abs(n.tcol - t.tcol))) AS dist
  FROM tiles t JOIN tiled n
    ON abs(n.trow - t.trow) <= 2
   AND least(abs(n.tcol - t.tcol), 36 - abs(n.tcol - t.tcol)) <= 2
),
bg AS (
  SELECT center AS pc_tile,
         median(CASE WHEN dist <= 1 THEN v END) AS bg1_median,
         mad(CASE WHEN dist <= 1 THEN v END)    AS bg1_mad,
         count(CASE WHEN dist <= 1 THEN 1 END)  AS bg1_n,
         median(v) AS bg2_median,
         mad(v)    AS bg2_mad,
         count(*)  AS bg2_n
  FROM nbr GROUP BY center
),
r1 AS (
  SELECT center, v, row_number() OVER (PARTITION BY center ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY center) AS cnt
  FROM nbr WHERE dist <= 1
),
trim1 AS (
  SELECT center AS pc_tile, avg(v) AS bg1_trim
  FROM r1 WHERE rn <= greatest(1, cast(floor(cnt * 0.25) as bigint))
  GROUP BY center
),
r2 AS (
  SELECT center, v, row_number() OVER (PARTITION BY center ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY center) AS cnt
  FROM nbr
),
trim2 AS (
  SELECT center AS pc_tile, avg(v) AS bg2_trim
  FROM r2 WHERE rn <= greatest(1, cast(floor(cnt * 0.25) as bigint))
  GROUP BY center
),
j AS (
  SELECT d.doc_id, d.url, d.pc_tile, d.n_chars, d.lat, d.lon,
         CASE WHEN b.bg1_n >= 10 THEN b.bg1_median ELSE b.bg2_median END AS bg_median,
         CASE WHEN b.bg1_n >= 10 THEN b.bg1_mad    ELSE b.bg2_mad    END AS bg_mad,
         CASE WHEN b.bg1_n >= 10 THEN b.bg1_n      ELSE b.bg2_n      END AS bg_n,
         CASE WHEN b.bg1_n >= 10 THEN t1.bg1_trim  ELSE t2.bg2_trim  END AS bg_trim,
         cast(CASE WHEN b.bg1_n >= 10 THEN 1 ELSE 2 END as int) AS win_ring
  FROM tiled d JOIN bg b USING (pc_tile)
  LEFT JOIN trim1 t1 USING (pc_tile)
  LEFT JOIN trim2 t2 USING (pc_tile)
)
SELECT doc_id, url, pc_tile, n_chars, bg_median, bg_mad, bg_n, bg_trim, win_ring,
       (n_chars - bg_median) / (1.4826 * bg_mad + 1e-9) AS score,
       cast(CASE WHEN bg_n < 10 THEN 0
                 WHEN (n_chars - bg_median) / (1.4826 * bg_mad + 1e-9) >= 6.0 THEN 2
                 WHEN (n_chars - bg_median) / (1.4826 * bg_mad + 1e-9) >= 3.0 THEN 1
                 ELSE 0 END as int) AS status,
       {PG.sql_admin_id('lat', 'lon')} AS admin_id
FROM j
"""


# ---------------------------------------------------------------------------
# geocode + tiles
# ---------------------------------------------------------------------------

def q_geocode(sf_dir: str):
    from ..sources.gazetteer import geocode

    ds = P.read_pages(sf_dir).drop_columns(["html"])
    ds = geocode(ds)

    def tile(b: pa.Table) -> pa.Table:
        lat = b.column("lat").to_numpy()
        lon = b.column("lon").to_numpy()
        return b.append_column("pc_tile", pa.array(cells.pc_tile(lat, lon)))

    ds = ds.map_batches(tile, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "url", "host_id", "lat", "lon", "country", "pc_tile"])


def sql_geocode() -> str:
    return f"""
WITH pages AS ({P.sql_pages_cte()})
SELECT doc_id, url, host_id, lat, lon,
       'A' || lpad(cast({PG.sql_admin_id('lat', 'lon')} as varchar), 2, '0') AS country,
       {SQL_PC_TILE} AS pc_tile
FROM pages
"""


def q_bbox_query(sf_dir: str):
    """Spatial bbox query: the bbox->tile cover (kernels.cells
    .bbox_tiles, the reference get_tiles planner) prunes FIRST — in
    product form that is read_product_partitions opening only covered
    part dirs (tested in test_resume) — then the exact box predicate
    trims the cover's edge tiles."""
    from ..sources.gazetteer import geocode

    la0, la1, lo0, lo1 = -10.0, 30.0, 20.0, 90.0
    cover = cells.bbox_tiles(la0, la1, lo0, lo1)

    ds = geocode(P.read_pages(sf_dir).drop_columns(["html"]))

    def f(b: pa.Table) -> pa.Table:
        lat = b.column("lat").to_numpy()
        lon = b.column("lon").to_numpy()
        t = cells.pc_tile(lat, lon)
        m = (np.isin(t, cover) & (lat >= la0) & (lat <= la1)
             & (lon >= lo0) & (lon <= lo1))
        return pa.table({"doc_id": b.column("doc_id").filter(pa.array(m)),
                         "url": b.column("url").filter(pa.array(m)),
                         "lat": pa.array(lat[m]), "lon": pa.array(lon[m]),
                         "pc_tile": pa.array(t[m])})

    return ds.map_batches(f, batch_format="pyarrow")


def sql_bbox_query() -> str:
    return f"""
WITH pages AS ({P.sql_pages_cte()})
SELECT doc_id, url, lat, lon, {SQL_PC_TILE} AS pc_tile
FROM pages
WHERE lat BETWEEN -10.0 AND 30.0 AND lon BETWEEN 20.0 AND 90.0
"""


_RADIUS_QUERY_POINTS = [(0, 40.0, -74.0), (1, -23.5, -46.6), (2, 35.7, 139.7)]
_RADIUS_KM = 3000.0


def q_radius_join(sf_dir: str):
    """Point-radius spatial join (ops.hotspot.radius_join): per-query
    bbox tile covers broadcast as ONE prefilter, exact haversine only
    on cover survivors; emits every (page, query point) pair within
    3000 km with the great-circle distance."""
    from ..ops.hotspot import radius_join
    from ..sources.gazetteer import geocode

    qid, qla, qlo = zip(*_RADIUS_QUERY_POINTS)
    ds = geocode(P.read_pages(sf_dir).drop_columns(["html", "text"]))
    out = radius_join(ds, query_lat=qla, query_lon=qlo, query_ids=qid,
                      radius_km=_RADIUS_KM, keep_cols=["doc_id"])
    return out.select_columns(["doc_id", "query_id", "lat", "lon", "dist_km"])


_NEAREST_SITES = [(10, 48.8, 2.3), (20, -33.9, 151.2), (30, 1.35, 103.8),
                  (40, 37.8, -122.4), (50, -1.3, 36.8)]


def q_nearest_site(sf_dir: str):
    """Spatial kNN (k=1) join: each page's nearest broadcast site +
    great-circle distance (ops.hotspot.nearest_point_join); one
    vectorized O(batch x Q) haversine argmin per batch, rows never
    shuffle."""
    from ..ops.hotspot import nearest_point_join
    from ..sources.gazetteer import geocode

    qid, qla, qlo = zip(*_NEAREST_SITES)
    ds = geocode(P.read_pages(sf_dir).drop_columns(["html", "text"]))
    out = nearest_point_join(ds, query_lat=qla, query_lon=qlo, query_ids=qid,
                             keep_cols=["doc_id"])
    return out.select_columns(["doc_id", "nearest_id", "dist_km"])


def sql_nearest_site() -> str:
    pts = ", ".join(f"({i}, {la}, {lo})" for i, la, lo in _NEAREST_SITES)
    hav = """2.0 * 6371.0088 * asin(sqrt(least(
        pow(sin(radians(q.qlat - p.lat) / 2), 2)
        + cos(radians(p.lat)) * cos(radians(q.qlat))
          * pow(sin(radians(q.qlon - p.lon) / 2), 2), 1.0)))"""
    return f"""
WITH pages AS ({P.sql_pages_cte()}),
q(site_id, qlat, qlon) AS (VALUES {pts}),
d AS (SELECT p.doc_id, cast(q.site_id as bigint) AS nearest_id,
             {hav} AS dist_km,
             row_number() OVER (PARTITION BY p.doc_id
                                ORDER BY {hav}, q.site_id) AS rn
      FROM pages p CROSS JOIN q)
SELECT doc_id, nearest_id, dist_km FROM d WHERE rn = 1
"""


def sql_radius_join() -> str:
    pts = ", ".join(f"({i}, {la}, {lo})" for i, la, lo in _RADIUS_QUERY_POINTS)
    hav = """2.0 * 6371.0088 * asin(sqrt(least(
        pow(sin(radians(q.qlat - p.lat) / 2), 2)
        + cos(radians(p.lat)) * cos(radians(q.qlat))
          * pow(sin(radians(q.qlon - p.lon) / 2), 2), 1.0)))"""
    return f"""
WITH pages AS ({P.sql_pages_cte()}),
q(query_id, qlat, qlon) AS (VALUES {pts})
SELECT p.doc_id, cast(q.query_id as bigint) AS query_id, p.lat, p.lon,
       {hav} AS dist_km
FROM pages p CROSS JOIN q
WHERE {hav} <= {_RADIUS_KM}
"""


# ---------------------------------------------------------------------------
# extraction invariant (byte-identical text per url)
# ---------------------------------------------------------------------------

def q_extract(sf_dir: str):
    from ..ops.text import extract_text_op

    ds = extract_text_op(P.read_pages(sf_dir))

    def measure(b: pa.Table) -> pa.Table:
        ext = b.column("extracted_text").to_pylist()
        n = np.fromiter((len(t or "") for t in ext), dtype=np.int64, count=len(ext))
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "url": b.column("url"),
                "n_chars_extracted": pa.array(n),
                "text_match": b.column("text_match"),
            }
        )

    return ds.map_batches(measure, batch_format="pyarrow")


def sql_extract() -> str:
    return f"""
WITH pages AS ({P.sql_pages_cte()})
SELECT doc_id, url, cast(length(text) as bigint) AS n_chars_extracted, TRUE AS text_match
FROM pages
"""


# ---------------------------------------------------------------------------
# quality features
# ---------------------------------------------------------------------------

def q_quality(sf_dir: str):
    rd = _rd()
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = quality_op(ds)
    return ds.select_columns(
        ["doc_id", "n_chars", "n_tokens", "mean_token_len", "digit_ratio",
         "space_ratio", "distinct_ratio"]
    )


def sql_quality() -> str:
    return """
SELECT doc_id,
       cast(length(text) as bigint) AS n_chars,
       cast(array_length(string_split(text, ' ')) as bigint) AS n_tokens,
       cast(length(replace(text, ' ', '')) as double)
         / array_length(string_split(text, ' ')) AS mean_token_len,
       cast(length(regexp_replace(text, '[^0-9]', '', 'g')) as double)
         / length(text) AS digit_ratio,
       cast(length(text) - length(replace(text, ' ', '')) as double)
         / length(text) AS space_ratio,
       cast(array_length(list_distinct(string_split(text, ' '))) as double)
         / array_length(string_split(text, ' ')) AS distinct_ratio
FROM documents
"""


# ---------------------------------------------------------------------------
# exact dedup (md5 oracle)
# ---------------------------------------------------------------------------

def q_dedup(sf_dir: str):
    rd = _rd()
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return dedup_exact(ds).select_columns(["doc_id", "content_md5"])


def sql_dedup() -> str:
    return """
SELECT min(doc_id) AS doc_id, md5(text) AS content_md5
FROM documents GROUP BY md5(text)
"""


# ---------------------------------------------------------------------------
# per-tile counts (A5 duplicate-count analog)
# ---------------------------------------------------------------------------

def q_tile_counts(sf_dir: str):
    ds = flagship.narrow_pages(sf_dir)
    counts = ds.groupby("pc_tile", num_partitions=shuffle_partitions()).count()

    def rn(b: pa.Table) -> pa.Table:
        return b.rename_columns(["pc_tile", "n_pages"])

    return counts.map_batches(rn, batch_format="pyarrow")


def sql_tile_counts() -> str:
    return f"""
WITH pages AS ({P.sql_pages_cte()})
SELECT {SQL_PC_TILE} AS pc_tile, count(*) AS n_pages
FROM pages GROUP BY 1
"""


# ---------------------------------------------------------------------------
# climatology (A6 analog): per host x 30-day bucket
# ---------------------------------------------------------------------------

def q_climatology(sf_dir: str):
    ds = P.read_pages(sf_dir).drop_columns(["html"])

    def prep(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        n = np.fromiter((len(t or "") for t in texts), dtype=np.int64, count=len(texts))
        from ..sources.pages import host_of_url_arrow

        host = host_of_url_arrow(b.column("url")).to_numpy(zero_copy_only=False)
        ts = b.column("warc_ts").cast(pa.int64()).to_numpy()
        bucket = temporal.time_bucket(ts, 2_592_000)
        return pa.table(
            {"host_id": pa.array(host), "bucket_us": pa.array(bucket),
             "n_chars": pa.array(n)}
        )

    narrow = ds.map_batches(prep, batch_format="pyarrow")
    clim = temporal.climatology(narrow, key_cols=["host_id", "bucket_us"], value_col="n_chars")
    df = clim.select_columns(["host_id", "bucket_us", "n", "mean", "std"]).to_pandas()
    df = _nan_to_null(df, ["std"])
    df["std"] = df["std"].astype(np.float64)
    return pa.Table.from_pandas(df, preserve_index=False)


def sql_climatology() -> str:
    return f"""
WITH pages AS ({P.sql_pages_cte()}),
g AS (
  SELECT {P.sql_host_id('doc_id')} AS host_id,
         cast(floor(epoch_us(warc_ts) / {BUCKET_30D_US}) as bigint) * {BUCKET_30D_US} AS bucket_us,
         count(*) AS n,
         sum(cast(length(text) as double)) AS s,
         sum(cast(length(text) as double) * cast(length(text) as double)) AS ss
  FROM pages GROUP BY 1, 2
)
SELECT host_id, bucket_us, n,
       s / n AS mean,
       CASE WHEN n > 1 THEN sqrt(greatest((ss - n * (s/n) * (s/n)) / (n - 1), 0.0)) END AS std
FROM g
"""


# ---------------------------------------------------------------------------
# windowed event aggregate (streaming-shaped)
# ---------------------------------------------------------------------------

def q_window_events(sf_dir: str):
    rd = _rd()
    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])
    b = temporal.bucket_op(ds, "ts", 3600)

    def to_us(t: pa.Table) -> pa.Table:
        return t.append_column("bucket_us", t.column("bucket_ts").cast(pa.int64())).drop_columns(
            ["bucket_ts", "ts"]
        )

    b = b.map_batches(to_us, batch_format="pyarrow")
    from ray.data.aggregate import Count, Max, Min

    out = b.groupby(["event_type", "bucket_us"], num_partitions=shuffle_partitions()).aggregate(
        Count(alias_name="n"),
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"),
    )
    return out


def sql_window_events() -> str:
    return """
SELECT event_type,
       cast(floor(epoch_us(ts) / 3600000000) as bigint) * 3600000000 AS bucket_us,
       count(*) AS n,
       min(value) AS min_value,
       max(value) AS max_value
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# as-of join (nearest-period lookup, SURVEY §2.9)
# ---------------------------------------------------------------------------

def q_asof(sf_dir: str):
    rd = _rd()
    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type", "value"])
    left = ev.filter(expr="event_type == 'purchase'").drop_columns(["event_type"])
    right = ev.filter(expr="event_type == 'click'")

    def prep_right(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "ts": b.column("ts"),
                "prev_ts": b.column("ts"),
                "prev_value": b.column("value"),
            }
        )

    right = right.map_batches(prep_right, batch_format="pyarrow")
    # exercise the scale path: (key-hash, 7-day time chunk)
    # co-partitioning with boundary carries — oracle-checked vs
    # DuckDB ASOF JOIN, so chunking provably preserves semantics
    out = temporal.asof_join(left, right, on="ts", by="user_id",
                             right_cols=["user_id", "ts", "prev_ts", "prev_value"],
                             num_buckets=32, time_chunk_us=7 * 86_400 * 1_000_000)
    df = out.to_pandas()
    res = pd.DataFrame(
        {
            "event_id": df["event_id"].astype(np.int64),
            "user_id": df["user_id"].astype(np.int64),
            "ts_us": df["ts"].astype("datetime64[us]").astype(np.int64),
            "prev_ts_us": df["prev_ts"].astype("datetime64[us]").astype(object).where(
                df["prev_ts"].notna(), None
            ),
            "prev_value": df["prev_value"].astype(object).where(df["prev_value"].notna(), None),
        }
    )
    res["prev_ts_us"] = res["prev_ts_us"].map(
        lambda v: None if v is None else int(pd.Timestamp(v).value // 1000)
    )
    return pa.Table.from_pandas(res, preserve_index=False).cast(
        pa.schema(
            [("event_id", pa.int64()), ("user_id", pa.int64()), ("ts_us", pa.int64()),
             ("prev_ts_us", pa.int64()), ("prev_value", pa.float64())]
        )
    )


def sql_asof() -> str:
    return """
SELECT l.event_id,
       l.user_id,
       epoch_us(l.ts) AS ts_us,
       epoch_us(r.ts) AS prev_ts_us,
       r.value AS prev_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


# ---------------------------------------------------------------------------
# grouped top-k
# ---------------------------------------------------------------------------

def q_unigram_logprob(sf_dir: str):
    """Per-document mean unigram log-probability (CCNet-style
    LM-perplexity proxy for quality gating): corpus-MLE token
    probabilities from one bucketed hash shuffle, broadcast, per-doc
    searchsorted mean (ops/text.unigram_logprob_op)."""
    from ..ops.text import unigram_logprob_op

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return unigram_logprob_op(ds)


def sql_unigram_logprob() -> str:
    return """
WITH toks AS (
  SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS tok
  FROM documents
),
tot AS (SELECT cast(count(*) AS double) AS n FROM toks),
vocab AS (SELECT tok, cast(count(*) AS double) AS c FROM toks GROUP BY tok)
SELECT t.doc_id,
       cast(count(*) AS bigint) AS n_tokens,
       round(avg(ln(v.c / (SELECT n FROM tot))), 9) AS logprob
FROM toks t JOIN vocab v USING (tok)
GROUP BY t.doc_id
"""


def q_cap_per_host(sf_dir: str):
    """Per-domain quota sampling — keep the newest 3 pages per HOST
    (domain balancing, the standard web-corpus crawl-budget cap).
    Exercises the bucketed grouped top-k on a HIGH-cardinality key
    (one group per host) with a timestamp order + url tie-break."""
    from ..sources.pages import read_pages

    pages = read_pages(sf_dir)

    def narrow(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "url": pc.cast(b.column("url"), pa.string()),
            "host": pc.utf8_slice_codeunits(
                pc.cast(b.column("url"), pa.string()), 8, 28),
            "ts_us": b.column("warc_ts").cast(pa.timestamp("us")).cast(pa.int64()),
        })

    out = rel.top_k_per_group(
        pages.map_batches(narrow, batch_format="pyarrow"),
        group_col="host", value_col="ts_us", k=3,
        ascending=False, tie_col="url")
    return out.select_columns(["host", "url", "ts_us"])


def sql_cap_per_host() -> str:
    from ..sources.pages import sql_pages_cte

    return f"""
WITH pages AS ({sql_pages_cte()})
SELECT host, url, ts_us FROM (
  SELECT url, substring(url, 9, 20) AS host,
         cast(epoch_us(warc_ts) as bigint) AS ts_us,
         row_number() OVER (PARTITION BY substring(url, 9, 20)
                            ORDER BY epoch_us(warc_ts) DESC, url) AS rn
  FROM pages) WHERE rn <= 3
"""


def q_topk_orders(sf_dir: str):
    rd = _rd()
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                         columns=["o_orderpriority", "o_orderkey", "o_totalprice"])
    out = rel.top_k_per_group(ds, group_col="o_orderpriority", value_col="o_totalprice",
                              k=3, ascending=False, tie_col="o_orderkey")
    return out.select_columns(["o_orderpriority", "o_orderkey", "o_totalprice"])


def sql_topk_orders() -> str:
    return """
SELECT o_orderpriority, o_orderkey, o_totalprice
FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# hash join + broadcast join pipeline (revenue per nation)
# ---------------------------------------------------------------------------

def q_join_revenue(sf_dir: str):
    rd = _rd()
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])

    def cents_preagg(b: pa.Table) -> pa.Table:
        """Per-batch pre-aggregation BELOW the join: o_custkey
        functionally determines the final group (nation), so partial
        (sum, count) per custkey is exact — the join then moves ≤
        distinct-custkeys rows per block instead of every order row
        (aggregation pushdown; the 100 TB shuffle saver)."""
        v = b.column("o_totalprice").to_numpy()
        t = pa.table({
            "o_custkey": b.column("o_custkey"),
            "cents": pa.array(_round_half_up(v * 100.0).astype(np.int64)),
        })
        g = t.group_by("o_custkey").aggregate([("cents", "sum"), ("cents", "count")])
        return g.rename_columns(["o_custkey", "cents", "cnt"])

    pre = orders.map_batches(cents_preagg, batch_format="pyarrow", batch_size=65536)
    from ray.data.aggregate import Sum as _Sum

    # NO intermediate groupby(o_custkey): the final n_name aggregate
    # sums partials anyway, so merging per-custkey first would buy
    # nothing and cost a full extra hash shuffle (measured 7.7 s ->
    # 3.9 s at sf0.1 dropping it); the join moves <= blocks x
    # distinct-custkeys partial rows either way
    j = rel.hash_join(pre, cust, on="o_custkey", right_on="c_custkey", how="inner",
                      num_partitions=8)
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    j = rel.broadcast_join(j, nation.rename_columns(["c_nationkey", "n_name"]),
                           on="c_nationkey")
    out = j.groupby("n_name", num_partitions=shuffle_partitions()).aggregate(
        _Sum("cnt", alias_name="n_orders"), _Sum("cents", alias_name="total_cents")
    )
    return out


def sql_join_revenue() -> str:
    return """
SELECT n_name, count(*) AS n_orders,
       cast(sum(cast(round(o_totalprice * 100.0) as bigint)) as bigint) AS total_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# semi / anti joins (broadcast key set)
# ---------------------------------------------------------------------------

def _urgent_orderkeys(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    t = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"])
    return t.filter(pc.equal(t.column("o_orderpriority"), "1-URGENT")).column(
        "o_orderkey"
    ).to_numpy()


def q_semi(sf_dir: str):
    rd = _rd()
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber", "l_quantity"])
    return rel.semi_anti_filter(li, _urgent_orderkeys(sf_dir), on="l_orderkey")


def sql_semi() -> str:
    return """
SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


def q_anti(sf_dir: str):
    rd = _rd()
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber", "l_quantity"])
    return rel.semi_anti_filter(li, _urgent_orderkeys(sf_dir), on="l_orderkey", anti=True)


def sql_anti() -> str:
    return """
SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


# ---------------------------------------------------------------------------
# Bloom-filter pre-filtered semi/anti joins (exact; big side never
# shuffles in the broadcast-verify path, only survivors in the join
# path) — the 100 TB plan for the reference's background-set
# exclusion joins (FILDA.py:637-652)
# ---------------------------------------------------------------------------

def _high_orders(sf_dir: str):
    """HIGH-priority orders as a streaming Dataset (the Bloom build
    side) — deliberately NOT a driver-side key collect."""
    import pyarrow.compute as pc

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_orderpriority"])

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b.column("o_orderpriority"), "2-HIGH")).select(
            ["o_orderkey"]
        )

    return ds.map_batches(keep, batch_format="pyarrow")


def q_bloom_semi(sf_dir: str):
    from ..ops.bloom import bloom_semi_anti_join

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_linenumber", "l_quantity"])
    return bloom_semi_anti_join(li, _high_orders(sf_dir), on="l_orderkey",
                                right_on="o_orderkey")


def sql_bloom_semi() -> str:
    return """
SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '2-HIGH')
"""


def q_bloom_anti(sf_dir: str):
    from ..ops.bloom import bloom_semi_anti_join

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_linenumber", "l_quantity"])
    return bloom_semi_anti_join(li, _high_orders(sf_dir), on="l_orderkey",
                                right_on="o_orderkey", anti=True)


def sql_bloom_anti() -> str:
    return """
SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '2-HIGH')
"""


# ---------------------------------------------------------------------------
# heavy hitters (mergeable Misra–Gries sketch; exact — err_upper 0 —
# whenever capacity ≥ true distinct count, which holds for the events
# user domain at every test scale, so the sketch is SQL-oracled)
# ---------------------------------------------------------------------------

def q_heavy_hitters(sf_dir: str):
    from ..ops.sketch import approx_heavy_hitters

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id"])
    return approx_heavy_hitters(ev, "user_id", capacity=8192, top_n=50)


def sql_heavy_hitters() -> str:
    return """
SELECT user_id AS key,
       cast(count(*) as bigint) AS est_count,
       cast(0 as bigint) AS err_upper
FROM events
GROUP BY user_id
ORDER BY est_count DESC, key
LIMIT 50
"""


# ---------------------------------------------------------------------------
# grouped approximate quantiles (mergeable per-key KLL; exact — no
# compaction — while a key's count ≤ k, which holds for events/user at
# every test scale, so the sketch is SQL-oracled with nearest-rank
# semantics.  Literals are cast to DOUBLE on the SQL side so ceil()
# sees the same float64 q*n as numpy, not exact DECIMAL.)
# ---------------------------------------------------------------------------

def q_user_value_quantiles(sf_dir: str):
    from ..ops.sketch import approx_quantiles_per_key

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id", "value"])
    return approx_quantiles_per_key(ev, "user_id", "value", qs=(0.25, 0.5, 0.9))


def sql_user_value_quantiles() -> str:
    def pick(q: str, name: str) -> str:
        return (f"max(CASE WHEN rn = greatest(1, cast(ceil(cast({q} as double)*cnt) "
                f"as bigint)) THEN value END) AS {name}")

    return f"""
WITH s AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY user_id) AS cnt
  FROM events
  WHERE value IS NOT NULL
)
SELECT user_id,
       {pick('0.25', 'q25')},
       {pick('0.5', 'q50')},
       {pick('0.9', 'q90')}
FROM s
GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# trimmed lowest-25% mean (A2 analog)
# ---------------------------------------------------------------------------

def q_trimmed(sf_dir: str):
    rd = _rd()
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_quantity"])
    return rel.trimmed_low_mean_per_group(ds, group_col="l_returnflag",
                                          value_col="l_quantity", frac=0.25)


def sql_trimmed() -> str:
    return """
WITH s AS (
  SELECT l_returnflag, l_quantity,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS cnt
  FROM lineitem
)
SELECT l_returnflag,
       avg(cast(l_quantity as double)) AS trimmed_mean,
       cast(count(*) as bigint) AS n_used
FROM s
WHERE rn <= greatest(1, cast(floor(cnt * 0.25) as bigint))
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# global low-quantile threshold (A3 analog)
# ---------------------------------------------------------------------------

def q_low_quantile(sf_dir: str):
    rd = _rd()
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"])

    def batch_cents(b: pa.Table) -> pa.Table:
        v = b.column("l_extendedprice").to_numpy()
        return pa.table({"cents": pa.array(_round_half_up(v * 100.0).astype(np.int64))})

    cents = ds.map_batches(batch_cents, batch_format="pyarrow")
    # bottom-k selection must be global: per-batch partial bottom-k
    # (k = 1% of total) then one small final sort — mirror of the
    # reference's exact global sort-head (FILDA.py:174-177)
    total = cents.count()
    k = max(1, int(np.floor(total * 0.01)))

    def partial(b: pa.Table) -> pa.Table:
        v = np.sort(b.column("cents").to_numpy())[:k]
        return pa.table({"cents": pa.array(v)})

    low = cents.map_batches(partial, batch_format="pyarrow").sort("cents").limit(k)
    vals = low.to_pandas()["cents"].to_numpy()
    thr = float(np.sum(vals)) / k / 100.0
    return pa.table({"threshold": pa.array([thr], pa.float64()),
                     "k": pa.array([k], pa.int64())})


def sql_low_quantile() -> str:
    return """
WITH s AS (
  SELECT cast(round(l_extendedprice * 100.0) as bigint) AS cents,
         row_number() OVER (ORDER BY round(l_extendedprice * 100.0)) AS rn,
         count(*) OVER () AS cnt
  FROM lineitem
)
SELECT sum(cents) / greatest(1, cast(floor(cnt * 0.01) as bigint)) / 100.0 AS threshold,
       greatest(1, cast(floor(cnt * 0.01) as bigint)) AS k
FROM s
WHERE rn <= greatest(1, cast(floor(cnt * 0.01) as bigint))
GROUP BY cnt
"""


# ---------------------------------------------------------------------------
# q1-style pricing summary
# ---------------------------------------------------------------------------

def q_pricing(sf_dir: str):
    rd = _rd()
    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount", "l_tax"],
    )

    def derive(b: pa.Table) -> pa.Table:
        ep = b.column("l_extendedprice").to_numpy()
        disc = b.column("l_discount").to_numpy()
        tax = b.column("l_tax").to_numpy()
        charge = _round_half_up(ep * (1.0 - disc) * (1.0 + tax) * 100.0).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "qty": b.column("l_quantity").cast(pa.float64()),
                "charge_cents": pa.array(charge),
            }
        )

    d = ds.map_batches(derive, batch_format="pyarrow")
    from ray.data.aggregate import Count, Sum

    out = d.groupby(["l_returnflag", "l_linestatus"], num_partitions=shuffle_partitions()).aggregate(
        Sum("qty", alias_name="sum_qty"),
        Sum("charge_cents", alias_name="sum_charge_cents"),
        Count(alias_name="count_order"),
    )
    return out


def sql_pricing() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       cast(sum(cast(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 100.0) as bigint)) as bigint)
         AS sum_charge_cents,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# embedding brute-force cosine top-k
# ---------------------------------------------------------------------------

def q_embed_topk(sf_dir: str):
    import pyarrow.parquet as pq
    from ..ops.embed import cosine_topk

    rd = _rd()
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qsel = qt.slice(0, 3)
    queries = np.asarray(qsel.column("embedding").to_pylist(), dtype=np.float64)
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = cosine_topk(ds, queries, k=10, dtype=np.float64)

    def rounded(b: pa.Table) -> pa.Table:
        v = b.column("cosine").to_numpy()
        # DuckDB round(x, 6) is half-away-from-zero
        c = np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5) / 1e6
        return pa.table(
            {
                "query_id": b.column("query_id").cast(pa.int32()),
                "vec_id": b.column("vec_id"),
                "cosine": pa.array(c),
            }
        )

    return out.map_batches(rounded, batch_format="pyarrow")


def sql_embed_topk() -> str:
    return """
WITH q AS (SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id < 3),
s AS (
  SELECT cast(q.qid as int) AS query_id, e.vec_id,
         list_cosine_similarity(cast(e.embedding as DOUBLE[]),
                                cast(q.embedding as DOUBLE[])) AS c
  FROM embeddings e CROSS JOIN q
)
SELECT query_id, vec_id, round(c, 6) AS cosine
FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rn FROM s)
WHERE rn <= 10
"""


# ---------------------------------------------------------------------------
# skew-aware / hierarchical / gather-join aggregates
# ---------------------------------------------------------------------------

def _narrow(sf_dir: str):
    return flagship.narrow_pages(sf_dir)


def q_salted_host_counts(sf_dir: str):
    """Two-stage salted count per host (mega-host skew demo); result
    identical to a plain group count — which is exactly the oracle."""
    from ..ops.rollup import salted_aggregate_count

    return salted_aggregate_count(_narrow(sf_dir), "host_id", out_col="n_pages")


def sql_salted_host_counts() -> str:
    return f"""
WITH pages AS ({P.sql_pages_cte()})
SELECT host_id, count(*) AS n_pages FROM pages GROUP BY host_id
"""


def q_tile_rollup(sf_dir: str):
    from ..ops.rollup import parent_rollup

    return parent_rollup(_narrow(sf_dir), value_col="n_chars", factor=2)


def sql_tile_rollup() -> str:
    return f"""
WITH pages AS ({P.sql_pages_cte()}),
tiled AS (
  SELECT cast(length(text) as double) AS v,
         least(greatest(cast(floor((lat+90)/10.0) as bigint),0),17) AS trow,
         ((cast(floor((lon+180)/10.0) as bigint) % 36)+36)%36 AS tcol
  FROM pages
)
SELECT cast((trow // 2) * 18 + (tcol // 2) as int) AS parent_tile,
       count(*) AS n,
       sum(v) AS sum_value,
       sum(v) / count(*) AS mean_value
FROM tiled GROUP BY 1
"""


RESAMPLE_OFFSETS = ((0, 0.5), (1, 0.25), (3, 0.25))  # exact binary fractions


def q_resample_hosts(sf_dir: str):
    """Weighted gather-join resample (M9 analog): per host, weighted
    mean of (host, host+1, host+3) total n_chars, renormalized over
    hosts that exist."""
    import ray.data as rd

    from ..ops.rollup import weighted_resample
    from ray.data.aggregate import Sum

    hv = (
        _narrow(sf_dir)
        .groupby("host_id", num_partitions=shuffle_partitions())
        .aggregate(Sum("n_chars", alias_name="v"))
    )
    hv_tbl = pa.concat_tables(
        list(hv.iter_batches(batch_format="pyarrow", batch_size=None))
    )
    hosts = hv_tbl.column("host_id").to_numpy()
    edges = pa.table(
        {
            "dst": pa.array(np.repeat(hosts, len(RESAMPLE_OFFSETS))),
            "src": pa.array(
                np.stack([(hosts + d) % P.N_HOSTS for d, _ in RESAMPLE_OFFSETS], axis=1).ravel()
            ),
            "weight": pa.array(np.tile(np.array([w for _, w in RESAMPLE_OFFSETS]), len(hosts))),
        }
    )
    out = weighted_resample(hv_tbl.rename_columns(["key", "v"]),
                            rd.from_arrow(edges), key_col="key")

    def rn(b: pa.Table) -> pa.Table:
        return b.rename_columns(["host_id", "resampled", "n_src"])

    return out.map_batches(rn, batch_format="pyarrow")


def sql_resample_hosts() -> str:
    offs = " UNION ALL ".join(
        f"SELECT host_id AS dst, (host_id + {d}) % {P.N_HOSTS} AS src, {w!r} AS w FROM hv"
        for d, w in RESAMPLE_OFFSETS
    )
    return f"""
WITH pages AS ({P.sql_pages_cte()}),
hv AS (SELECT host_id, cast(sum(length(text)) as double) AS v FROM pages GROUP BY host_id),
e AS ({offs})
SELECT e.dst AS host_id,
       sum(e.w * s.v) / sum(e.w) AS resampled,
       count(*) AS n_src
FROM e JOIN hv s ON s.host_id = e.src
GROUP BY e.dst
"""


def q_candidate_union(sf_dir: str):
    """Two candidate predicates -> union -> exact dedup (the M12
    candidate-merge pattern: np.concatenate + np.unique,
    FILDA.py:491-497, as union + distinct_rows)."""
    rd = _rd()
    import pyarrow.compute as pac

    from ..ops.relational import distinct_rows
    from ..ops.text import quality_op

    base = quality_op(
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ).select_columns(["doc_id", "n_chars", "distinct_ratio"])
    c1 = base.map_batches(
        lambda b: b.filter(pac.greater_equal(b.column("n_chars"), 400)),
        batch_format="pyarrow",
    )
    c2 = base.map_batches(
        lambda b: b.filter(pac.less(b.column("distinct_ratio"), 0.5)),
        batch_format="pyarrow",
    )
    merged = distinct_rows(c1.union(c2), ["doc_id"])
    return merged.select_columns(["doc_id", "n_chars"])


def sql_candidate_union() -> str:
    dr = ("cast(array_length(list_distinct(string_split(text, ' '))) as double)"
          " / array_length(string_split(text, ' '))")
    return f"""
SELECT doc_id, cast(length(text) as bigint) AS n_chars FROM documents WHERE length(text) >= 400
UNION
SELECT doc_id, cast(length(text) as bigint) AS n_chars FROM documents WHERE {dr} < 0.5
"""


def q_hash_sample(sf_dir: str):
    """Deterministic Bernoulli-by-hash sample + split assignment."""
    rd = _rd()
    from ..ops.sample import hash_sample, split_assign

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    ds = hash_sample(ds, "doc_id", 0.5, seed=0)
    ds = split_assign(ds, "doc_id", seed=1)
    return ds.select_columns(["doc_id", "lang", "split"])


def sql_hash_sample() -> str:
    from ..ops.sample import sql_hash_uniform, sql_split_assign

    return f"""
SELECT doc_id, lang, {sql_split_assign('doc_id', seed=1)} AS split
FROM documents
WHERE {sql_hash_uniform('doc_id', 0)} < 0.5
"""


def q_stratified(sf_dir: str):
    """Balanced per-language sample: exactly 10 docs per lang, chosen
    by smallest hash-uniform(doc_id) — deterministic and repartition-
    stable; per-batch prune bounds the shuffle at n x strata rows."""
    from ..ops.sample import stratified_sample

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang"])
    return stratified_sample(ds, "lang", "doc_id", 10, seed=2)


def sql_stratified() -> str:
    from ..ops.sample import sql_hash_uniform

    return f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY {sql_hash_uniform('doc_id', 2)}, doc_id) AS rn
  FROM documents) WHERE rn <= 10
"""


def q_vocab(sf_dir: str):
    rd = _rd()
    from ..ops.text import vocab_count

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["text"])
    return vocab_count(ds, top_k=20)


def sql_vocab() -> str:
    return """
SELECT token, n FROM (
  SELECT token, count(*) AS n
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token
  ORDER BY n DESC, token ASC LIMIT 20
)
"""


def q_tfidf(sf_dir: str):
    """Per-doc top-3 TF-IDF terms over a bounded (top-DF) vocabulary.
    Ranking uses the ROUNDED score on both sides so the per-doc
    cutoff is reproducible against the SQL oracle."""
    from ..ops.text import tfidf_top_terms

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return tfidf_top_terms(ds, vocab_size=5000, per_doc=3)


def sql_tfidf() -> str:
    return """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
vocab AS (SELECT token, df FROM dfreq ORDER BY df DESC, token LIMIT 5000),
scored AS (
  SELECT tf.doc_id, tf.token,
         floor(cast(tf.tf as double)
               * ln(cast((SELECT count(*) FROM documents) as double) / cast(v.df as double))
               * cast(1000000 as double) + cast(0.5 as double)) / cast(1000000 as double)
           AS tfidf
  FROM tf JOIN vocab v USING (token)
)
SELECT doc_id, token, tfidf FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
  FROM scored
) WHERE rn <= 3
"""


def q_running_totals(sf_dir: str):
    """Per-user running sum/count ordered by (ts, event_id) — the
    chunked design: a shuffle group is one (user, 7-day chunk); chunk
    offsets ride the same shuffle as tagged rows, so event data moves
    exactly once even for a mega-user."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_id", "ts", "value"])

    def cents(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy()
        return pa.table({"user_id": b.column("user_id"),
                         "event_id": b.column("event_id"),
                         "ts": b.column("ts"),
                         "cents": pa.array(_round_half_up(v * 100.0).astype(np.int64))})

    out = temporal.running_aggregate(ds.map_batches(cents, batch_format="pyarrow"),
                                     key_col="user_id", ts_col="ts",
                                     tie_col="event_id", value_col="cents")

    def clean(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b.column("k"),
                         "event_id": b.column("tie"),
                         "running_sum": b.column("running_sum").cast(pa.int64()),
                         "running_n": b.column("running_n").cast(pa.int64())})

    return out.map_batches(clean, batch_format="pyarrow")


def sql_running_totals() -> str:
    return """
SELECT user_id, event_id,
       sum(cents) OVER w AS running_sum,
       cast(count(*) OVER w AS bigint) AS running_n
FROM (SELECT user_id, event_id, ts,
             cast(floor(value * 100.0 + 0.5) AS bigint) AS cents FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_moving_avg(sf_dir: str):
    """Per-user 4-row moving sum/avg (SQL ROWS BETWEEN 3 PRECEDING AND
    CURRENT ROW): the chunked co-partitioning with cumulative tail-W
    carries, exact across sparse chunks (temporal.moving_aggregate)."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_id", "ts", "value"])

    def cents(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy()
        return pa.table({"user_id": b.column("user_id"),
                         "event_id": b.column("event_id"),
                         "ts": b.column("ts"),
                         "cents": pa.array(_round_half_up(v * 100.0).astype(np.int64))})

    out = temporal.moving_aggregate(ds.map_batches(cents, batch_format="pyarrow"),
                                    key_col="user_id", ts_col="ts",
                                    tie_col="event_id", value_col="cents",
                                    window=4)

    def clean(b: pa.Table) -> pa.Table:
        ms = b.column("moving_sum").cast(pa.int64())
        mn = b.column("moving_n").cast(pa.int64())
        avg = ms.to_numpy() / mn.to_numpy().astype(np.float64)
        return pa.table({"user_id": b.column("k"),
                         "event_id": b.column("tie"),
                         "moving_sum": ms, "moving_n": mn,
                         "moving_avg": pa.array(avg)})

    return out.map_batches(clean, batch_format="pyarrow")


def sql_moving_avg() -> str:
    return """
SELECT user_id, event_id,
       sum(cents) OVER w AS moving_sum,
       cast(count(*) OVER w AS bigint) AS moving_n,
       sum(cents) OVER w / cast(count(*) OVER w AS double) AS moving_avg
FROM (SELECT user_id, event_id, ts,
             cast(floor(value * 100.0 + 0.5) AS bigint) AS cents FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""


def q_range_window(sf_dir: str):
    """Per-user trailing-6-hour sum/count (SQL RANGE BETWEEN INTERVAL
    PRECEDING AND CURRENT ROW; equal-ts peers share a frame): the
    carry is a row-local boundary predicate — no reduce stage — and
    one bounded-bucket shuffle resolves every frame with twin
    searchsorted passes (temporal.range_aggregate)."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_id", "ts", "value"])

    def cents(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy()
        return pa.table({"user_id": b.column("user_id"),
                         "event_id": b.column("event_id"),
                         "ts": b.column("ts"),
                         "cents": pa.array(_round_half_up(v * 100.0).astype(np.int64))})

    out = temporal.range_aggregate(ds.map_batches(cents, batch_format="pyarrow"),
                                   key_col="user_id", ts_col="ts",
                                   tie_col="event_id", value_col="cents",
                                   interval_us=6 * 3600 * 10**6)

    def clean(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b.column("k"),
                         "event_id": b.column("tie"),
                         "cents": b.column("v").cast(pa.int64()),
                         "range_sum": b.column("range_sum").cast(pa.int64()),
                         "range_n": b.column("range_n").cast(pa.int64())})

    return out.map_batches(clean, batch_format="pyarrow")


def sql_range_window() -> str:
    return """
SELECT user_id, event_id, cents,
       sum(cents) OVER w AS range_sum,
       cast(count(*) OVER w AS bigint) AS range_n
FROM (SELECT user_id, event_id, ts,
             cast(floor(value * 100.0 + 0.5) AS bigint) AS cents FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 6 HOUR PRECEDING AND CURRENT ROW)
"""


def q_count_distinct(sf_dir: str):
    """Exact grouped COUNT(DISTINCT ...): bounded-bucket distinct on
    (group, value) pairs first — the only stage that sees raw rows —
    then a small groupby count.  The exact sibling of the HLL
    `approx_distinct_per_key` (same two-stage shape, sketch-free)."""
    from ray.data.aggregate import Count

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "user_id"])
    d = rel.distinct_rows(ds, ["event_type", "user_id"])
    out = d.groupby("event_type", num_partitions=shuffle_partitions(5)).aggregate(
        Count(alias_name="n_users"))

    def clean(b: pa.Table) -> pa.Table:
        return pa.table({"event_type": b.column("event_type"),
                         "n_users": b.column("n_users").cast(pa.int64())})

    return out.map_batches(clean, batch_format="pyarrow")


def sql_count_distinct() -> str:
    return """
SELECT event_type, cast(count(DISTINCT user_id) AS bigint) AS n_users
FROM events GROUP BY event_type
"""


def q_median_quantity(sf_dir: str):
    """Exact per-group median + MAD over a bounded value domain
    (integral l_quantity): (group, value)->count histogram partials +
    the shared weighted-median kernel — counts shuffle, rows never do
    (ops.stats_agg.grouped_median_exact)."""
    from ..ops import stats_agg as SA

    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_returnflag", "l_quantity"])
    out = SA.grouped_median_exact(ds, group_col="l_returnflag",
                                  value_col="l_quantity")

    def clean(b: pa.Table) -> pa.Table:
        return pa.table({"l_returnflag": b.column("l_returnflag"),
                         "median_qty": b.column("median_v"),
                         "mad_qty": b.column("mad_v"),
                         "n": b.column("n").cast(pa.int64())})

    return out.map_batches(clean, batch_format="pyarrow")


def sql_median_quantity() -> str:
    return """
SELECT l_returnflag,
       cast(median(l_quantity) AS double) AS median_qty,
       cast(mad(l_quantity) AS double) AS mad_qty,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


def q_quantiles_quantity(sf_dir: str):
    """Exact per-group quantile_cont (p25/p50/p75) over the bounded
    l_quantity domain — histogram partials + one linear-interpolation
    kernel pass per group (ops.stats_agg.grouped_quantiles_exact)."""
    from ..ops import stats_agg as SA

    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_linestatus", "l_quantity"])
    return SA.grouped_quantiles_exact(ds, group_col="l_linestatus",
                                      value_col="l_quantity",
                                      probs=(0.25, 0.5, 0.75))


def sql_quantiles_quantity() -> str:
    return """
SELECT l_linestatus,
       quantile_cont(l_quantity, 0.25) AS q25,
       quantile_cont(l_quantity, 0.50) AS q50,
       quantile_cont(l_quantity, 0.75) AS q75,
       count(*) AS n
FROM lineitem GROUP BY l_linestatus
"""


def q_corr_qty_discount(sf_dir: str):
    """Grouped corr/covar/regression via one-pass integer co-moment
    partials (ops.stats_agg): the shuffle moves 6 int64 sums per
    (block, group), never rows.  Quantity and discount*100 are
    integer-valued, so partial-sum order cannot perturb the result and
    the finalize expression is bit-identical to the SQL oracle's."""
    from ..ops import stats_agg as SA

    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_returnflag", "l_quantity", "l_discount"])

    def prep(b: pa.Table) -> pa.Table:
        q = b.column("l_quantity").to_numpy().astype(np.int64)
        d = _round_half_up(b.column("l_discount").to_numpy() * 100.0).astype(np.int64)
        return pa.table({"l_returnflag": b.column("l_returnflag"),
                         "qty": pa.array(q), "disc100": pa.array(d)})

    mo = SA.grouped_comoments(ds.map_batches(prep, batch_format="pyarrow"),
                              group_cols=["l_returnflag"], x_col="qty", y_col="disc100")
    out = mo.map_batches(SA.comoment_finalize, batch_format="pyarrow")

    def clean(b: pa.Table) -> pa.Table:
        return pa.table({"l_returnflag": b.column("l_returnflag"),
                         "n": b.column("n").cast(pa.int64()),
                         "corr": b.column("corr"),
                         "covar_samp": b.column("covar_samp"),
                         "slope": b.column("slope"),
                         "intercept": b.column("intercept")})

    return out.map_batches(clean, batch_format="pyarrow")


def sql_corr_qty_discount() -> str:
    # same bigint sums, same finalize expression shape (see
    # stats_agg.comoment_finalize contract) => bit-identical doubles
    return """
WITH g AS (
  SELECT l_returnflag,
         count(*) AS n,
         sum(cast(l_quantity as bigint)) AS sx,
         sum(cast(round(l_discount*100) as bigint)) AS sy,
         sum(cast(l_quantity as bigint) * cast(l_quantity as bigint)) AS sxx,
         sum(cast(round(l_discount*100) as bigint) * cast(round(l_discount*100) as bigint)) AS syy,
         sum(cast(l_quantity as bigint) * cast(round(l_discount*100) as bigint)) AS sxy
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, cast(n as bigint) AS n,
       (sxy - sx*sy/n) / (sqrt(sxx - sx*sx/n) * sqrt(syy - sy*sy/n)) AS corr,
       (sxy - sx*sy/n) / (n - 1) AS covar_samp,
       (sxy - sx*sy/n) / (sxx - sx*sx/n) AS slope,
       (sy - ((sxy - sx*sy/n) / (sxx - sx*sx/n)) * sx) / n AS intercept
FROM g
"""


def q_argmax_events(sf_dir: str):
    """SQL max_by with a deterministic tie-break (min event_id among
    equals), as a two-level distributed argmax: per-block winners
    before the shuffle, so the groupby sees ≤ groups×blocks rows."""
    from ..ops import stats_agg as SA

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "event_id", "user_id", "value"])
    return SA.arg_extreme_per_group(ds, group_col="event_type",
                                    value_col="value", tie_col="event_id")


def sql_argmax_events() -> str:
    return """
SELECT event_type, event_id, user_id, value FROM (
  SELECT event_type, event_id, user_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rn
  FROM events) WHERE rn = 1
"""


def q_first_last_value(sf_dir: str):
    """SQL first_value/last_value OVER (PARTITION BY user ORDER BY ts,
    event_id): per-block argmin/argmax partials shrink each winner
    table to <= groups x blocks rows BEFORE its shuffle, the two tiny
    winner tables join each other, and the event data moves through
    exactly ONE hash join against that small side."""
    from ..ops import stats_agg as SA

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_id", "ts", "value"])

    def cents(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy()
        return pa.table({"user_id": b.column("user_id"),
                         "event_id": b.column("event_id"),
                         "ts": b.column("ts"),
                         "cents": pa.array(_round_half_up(v * 100.0).astype(np.int64))})

    cds = ds.map_batches(cents, batch_format="pyarrow")

    def keep(name):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({"user_id": b.column("user_id"),
                             name: b.column("cents").cast(pa.int64())})
        return f

    first = SA.arg_extreme_per_group(cds, group_col="user_id", value_col="ts",
                                     tie_col="event_id", ascending=True
                                     ).map_batches(keep("first_cents"),
                                                   batch_format="pyarrow")
    last = SA.arg_extreme_per_group(cds, group_col="user_id", value_col="ts",
                                    tie_col="event_id", ascending=False
                                    ).map_batches(keep("last_cents"),
                                                  batch_format="pyarrow")
    side = first.join(last, join_type="inner", on=("user_id",),
                      num_partitions=shuffle_partitions())
    out = cds.join(side, join_type="inner", on=("user_id",),
                   num_partitions=shuffle_partitions())

    def clean(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b.column("user_id"),
                         "event_id": b.column("event_id"),
                         "cents": b.column("cents").cast(pa.int64()),
                         "first_cents": b.column("first_cents"),
                         "last_cents": b.column("last_cents")})

    return out.map_batches(clean, batch_format="pyarrow")


def sql_first_last_value() -> str:
    return """
SELECT user_id, event_id, cents,
       first_value(cents) OVER w AS first_cents,
       last_value(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING) AS last_cents
FROM (SELECT user_id, event_id, ts,
             cast(floor(value * 100.0 + 0.5) AS bigint) AS cents FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_returned_revenue(sf_dir: str):
    """TPC-H Q10 shape — three-table join at lineitem scale: returned
    items' revenue per customer, top 20.  The big side is pre-shrunk
    twice before any shuffle: the returnflag predicate rides into the
    parquet scanner, and per-batch (orderkey -> cents) partials
    aggregate BELOW the first join; both joins then move partial rows,
    and the final top-k is a per-block heap, never a global sort."""
    import pyarrow.dataset as pds

    from ray.data.aggregate import Sum

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_returnflag"],
        filter=pds.field("l_returnflag") == "R")

    def rev_partial(b: pa.Table) -> pa.Table:
        p = b.column("l_extendedprice").to_numpy()
        d = b.column("l_discount").to_numpy()
        cents = _round_half_up(p * (1.0 - d) * 100.0).astype(np.int64)
        t = pa.table({"l_orderkey": b.column("l_orderkey"),
                      "cents": pa.array(cents)})
        g = t.group_by("l_orderkey").aggregate([("cents", "sum")])
        return g.rename_columns(["l_orderkey", "cents"])

    pre = li.map_batches(rev_partial, batch_format="pyarrow",
                         batch_size=65536)
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])
    j = rel.hash_join(pre, orders, on="l_orderkey", right_on="o_orderkey",
                      how="inner", num_partitions=shuffle_partitions())
    per_cust = j.groupby("o_custkey", num_partitions=shuffle_partitions()).aggregate(
        Sum("cents", alias_name="revenue_cents"))
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_name", "c_acctbal"])
    out = rel.hash_join(per_cust, cust, on="o_custkey", right_on="c_custkey",
                        how="inner", num_partitions=shuffle_partitions())
    k = 20

    def partial_top(b: pa.Table) -> pa.Table:
        # Ray's join drops the RIGHT key column; o_custkey == c_custkey
        v = b.column("revenue_cents").to_numpy(zero_copy_only=False)
        kk = min(k, len(v))
        if kk == 0:
            return b
        top = np.lexsort((b.column("o_custkey").to_numpy(zero_copy_only=False),
                          -v.astype(np.float64)))[:kk]
        return b.take(pa.array(np.sort(top)))

    small = out.map_batches(partial_top, batch_format="pyarrow").to_pandas()
    small = small.sort_values(["revenue_cents", "o_custkey"],
                              ascending=[False, True],
                              kind="mergesort").head(k).reset_index(drop=True)
    return pa.table({"c_custkey": pa.array(small["o_custkey"].astype(np.int64)),
                     "c_name": pa.array(small["c_name"]),
                     "c_acctbal": pa.array(small["c_acctbal"]),
                     "revenue_cents": pa.array(small["revenue_cents"].astype(np.int64))})


def sql_returned_revenue() -> str:
    return """
SELECT c_custkey, c_name, c_acctbal,
       cast(sum(cast(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
                     as bigint)) as bigint) AS revenue_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal
ORDER BY revenue_cents DESC, c_custkey
LIMIT 20
"""


def q_revenue_share(sf_dir: str):
    """ratio_to_report window (share of grand total per group): one
    grouped sum, then the grand total re-aggregated from the tiny
    group table and broadcast back as a scalar — never a second pass
    over the data."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderpriority", "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        v = b.column("o_totalprice").to_numpy()
        return pa.table({"o_orderpriority": b.column("o_orderpriority"),
                         "cents": pa.array(_round_half_up(v * 100.0).astype(np.int64))})

    per = ds.map_batches(cents, batch_format="pyarrow").groupby(
        "o_orderpriority", num_partitions=shuffle_partitions()).aggregate(
        Sum("cents", alias_name="cents")).materialize()
    total = sum(b.column("cents").to_numpy().sum()
                for b in per.iter_batches(batch_format="pyarrow", batch_size=None))

    def share(b: pa.Table) -> pa.Table:
        c = b.column("cents").cast(pa.int64())
        return pa.table({"o_orderpriority": b.column("o_orderpriority"),
                         "cents": c,
                         "share": pc.divide(c.cast(pa.float64()), float(total))})

    return per.map_batches(share, batch_format="pyarrow")


def sql_revenue_share() -> str:
    return """
WITH g AS (
  SELECT o_orderpriority,
         cast(sum(cast(floor(o_totalprice * 100.0 + 0.5) as bigint)) as bigint)
             AS cents
  FROM orders GROUP BY o_orderpriority)
SELECT o_orderpriority, cents,
       cents / cast(sum(cents) OVER () as double) AS share
FROM g
"""


def q_pushdown_high_value(sf_dir: str):
    """Predicate pushdown at the READ: the row filter rides into the
    pyarrow scanner (read_parquet(filter=...)), so row groups whose
    min/max statistics exclude it never leave storage — the
    prune-at-the-read lever for selective scans; only then a tiny
    grouped aggregate."""
    import pyarrow.dataset as pds

    from ray.data.aggregate import Count, Sum

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderpriority", "o_totalprice"],
                            filter=pds.field("o_totalprice") > 400000.0)

    def cents(b: pa.Table) -> pa.Table:
        v = b.column("o_totalprice").to_numpy()
        return pa.table({"o_orderpriority": b.column("o_orderpriority"),
                         "cents": pa.array(_round_half_up(v * 100.0).astype(np.int64))})

    return ds.map_batches(cents, batch_format="pyarrow").groupby(
        "o_orderpriority", num_partitions=shuffle_partitions()).aggregate(
        Count(alias_name="n_orders"), Sum("cents", alias_name="total_cents"))


def sql_pushdown_high_value() -> str:
    return """
SELECT o_orderpriority, cast(count(*) as bigint) AS n_orders,
       cast(sum(cast(floor(o_totalprice * 100.0 + 0.5) as bigint)) as bigint)
           AS total_cents
FROM orders WHERE o_totalprice > 400000.0
GROUP BY o_orderpriority
"""


def q_rollup_revenue(sf_dir: str):
    """GROUP BY ROLLUP(priority, year) from ONE full shuffle: coarser
    levels re-aggregate the finest level's tiny output (ops.stats_agg
    .rollup_sums).  Money quantized to int64 cents for order-proof
    sums."""
    import pyarrow.compute as pc

    from ..ops import stats_agg as SA

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderpriority", "o_orderdate", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        cents = _round_half_up(b.column("o_totalprice").to_numpy() * 100.0).astype(np.int64)
        return pa.table({
            "o_orderpriority": b.column("o_orderpriority"),
            "o_year": pc.year(b.column("o_orderdate")).cast(pa.int64()),
            "cents": pa.array(cents)})

    return SA.rollup_sums(ds.map_batches(prep, batch_format="pyarrow"),
                          key_cols=["o_orderpriority", "o_year"],
                          key_types={"o_orderpriority": pa.string(),
                                     "o_year": pa.int64()},
                          value_col="cents", count_col="n_orders",
                          sum_col="revenue_cents")


def sql_rollup_revenue() -> str:
    return """
WITH o AS (
  SELECT o_orderpriority, cast(year(o_orderdate) as bigint) AS o_year,
         cast(round(o_totalprice*100) as bigint) AS cents
  FROM orders)
SELECT o_orderpriority, o_year,
       cast(count(*) as bigint) AS n_orders,
       cast(sum(cents) as bigint) AS revenue_cents
FROM o GROUP BY ROLLUP(o_orderpriority, o_year)
"""


def q_line_repetition(sf_dir: str):
    """Duplicate-line boilerplate metrics per document: one Arrow
    split per batch + C-hashtable groupby over (row, line) pairs —
    exact string equality, no per-row Python loop (kernels.textkit
    .line_stats)."""
    from ..ops import text as T

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = T.repetition_op(ds)

    def clean(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.greater(b.column("n_lines"), 0))  # null texts out
        return b.drop_columns(["text"])

    return out.map_batches(clean, batch_format="pyarrow")


def sql_line_repetition() -> str:
    return """
WITH l AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line
  FROM documents WHERE text IS NOT NULL
),
p AS (SELECT doc_id, line, count(*) AS c FROM l GROUP BY 1, 2)
SELECT doc_id,
       cast(sum(c) as bigint) AS n_lines,
       cast(count(*) as bigint) AS n_distinct_lines,
       cast(max(c) as bigint) AS max_line_occ,
       1.0 - count(*) / cast(sum(c) as double) AS dup_line_frac
FROM p GROUP BY doc_id
"""


def q_mode_event_type(sf_dir: str):
    """Per-user modal event type (deterministic tie-break: smallest
    value among equally frequent), via per-block count partials then a
    distributed argmax over the counts (ops.stats_agg.mode_per_group)."""
    from ..ops import stats_agg as SA

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])
    out = SA.mode_per_group(ds, group_col="user_id", value_col="event_type")

    def clean(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b.column("user_id"),
                         "event_type": b.column("event_type"),
                         "n_occ": b.column("n_occ").cast(pa.int64())})

    return out.map_batches(clean, batch_format="pyarrow")


def sql_mode_event_type() -> str:
    return """
SELECT user_id, event_type, n_occ FROM (
  SELECT user_id, event_type, cast(count(*) as bigint) AS n_occ,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY count(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type) WHERE rn = 1
"""


def q_salted_join_events(sf_dir: str):
    """Skew-proof inner join: events.user_id is a 150-key hot
    distribution over ~5k rows/key, so the join key is salted and the
    customer side replicated per salt (relational.salted_join) — one
    hot key spreads over n_salts joiners instead of one.  Money
    quantized to cents below the join (aggregation-friendly int64)."""
    from ray.data.aggregate import Count, Sum

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        cents = _round_half_up(b.column("value").to_numpy() * 100.0).astype(np.int64)
        return pa.table({"user_id": b.column("user_id"),
                         "cents": pa.array(cents)})

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_nationkey"])
    cust = cust.map_batches(
        lambda b: b.rename_columns(["user_id", "c_nationkey"]),
        batch_format="pyarrow")
    j = rel.salted_join(ev.map_batches(prep, batch_format="pyarrow"), cust,
                        on="user_id", n_salts=4, num_partitions=8)
    out = j.groupby("c_nationkey", num_partitions=shuffle_partitions(25)).aggregate(
        Count(alias_name="n_events"), Sum("cents", alias_name="value_cents"))

    def clean(b: pa.Table) -> pa.Table:
        return pa.table({"c_nationkey": b.column("c_nationkey"),
                         "n_events": b.column("n_events").cast(pa.int64()),
                         "value_cents": b.column("value_cents").cast(pa.int64())})

    return out.map_batches(clean, batch_format="pyarrow")


def sql_salted_join_events() -> str:
    return """
SELECT c_nationkey, cast(count(*) as bigint) AS n_events,
       cast(sum(cast(round(value*100) as bigint)) as bigint) AS value_cents
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_nationkey
"""


def q_scrub_pii(sf_dir: str):
    """Curation scrub (emails / IPv4s / digit runs -> fixed tokens)
    over the events props payload: one vectorized RE2 pass per pattern
    (ops.text.scrub_op); pyarrow and DuckDB share the RE2 engine, so
    the oracle is bit-identical by construction.  The digit threshold
    is 2 here so the synthetic corpus actually exercises the masking
    (SCRUB_PATTERNS' production default is 7+)."""
    from ..ops import text as T

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_id", "props"])
    out = T.scrub_op(ds, text_col="props", patterns=_scrub_query_patterns())

    def measure(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = b.column("scrubbed_props")
        return pa.table({"event_id": b.column("event_id"),
                         "scrubbed_props": s,
                         "n_masked": pc.count_substring(s, "<NUM>").cast(pa.int64())})

    return out.map_batches(measure, batch_format="pyarrow")


def _scrub_query_patterns():
    from ..ops.text import SCRUB_PATTERNS

    return SCRUB_PATTERNS[:2] + ((r"\d{2,}", "<NUM>"),)


def sql_scrub_pii() -> str:
    expr = "props"
    for pat, rep in _scrub_query_patterns():
        # DuckDB single-quoted strings keep backslashes literal
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    return f"""
WITH s AS (SELECT event_id, {expr} AS scrubbed_props FROM events)
SELECT event_id, scrubbed_props,
       cast((length(scrubbed_props)
             - length(replace(scrubbed_props, '<NUM>', ''))) // 5
            as bigint) AS n_masked
FROM s
"""


def q_normalize_text(sf_dir: str):
    """Curation text normalization (NFC, lowercase, whitespace
    collapse, trim) on pure Arrow kernels; RE2 on both sides makes the
    regex semantics identical to DuckDB's regexp_replace."""
    from ..ops import text as T

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = T.normalize_op(ds)
    return out.map_batches(lambda b: b.drop_columns(["text"]),
                           batch_format="pyarrow")


def sql_normalize_text() -> str:
    return r"""
SELECT doc_id,
       trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'), ' ') AS norm_text,
       cast(length(trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'), ' ')) as bigint) AS n_chars_norm
FROM documents
"""


def q_explode_embeddings(sf_dir: str):
    """SQL unnest WITH ORDINALITY over a list<float> column: offset-
    based repeats + zero-copy flatten (relational.explode_list), no
    shuffle, streams block by block.  Bounded to 50 vectors so the
    oracle compare stays small."""
    import pyarrow.compute as pc

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    ds = ds.map_batches(
        lambda b: b.filter(pc.less(b.column("vec_id"), 50)),
        batch_format="pyarrow")
    out = rel.explode_list(ds, "embedding", value_col="v", index_col="pos")
    return out.map_batches(
        lambda b: pa.table({"vec_id": b.column("vec_id"),
                            "pos": b.column("pos"),
                            "v": b.column("v").cast(pa.float64())}),
        batch_format="pyarrow")


def sql_explode_embeddings() -> str:
    return """
SELECT vec_id,
       cast(generate_subscripts(embedding, 1) as bigint) AS pos,
       cast(unnest(embedding) as double) AS v
FROM embeddings WHERE vec_id < 50
"""


def q_user_journeys(sf_dir: str):
    """Per-user ordered event sequence (SQL string_agg ORDER BY):
    narrow 3-column shuffle, vectorized per-group sort + one join
    (relational.collect_sorted); deterministic under ts ties via the
    value tie-break mirrored in the oracle's ORDER BY."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type", "ts"])
    out = rel.collect_sorted(ds, group_col="user_id", value_col="event_type",
                             order_col="ts")
    return out.map_batches(
        lambda b: pa.table({"user_id": b.column("user_id"),
                            "seq": b.column("seq"),
                            "n": b.column("n").cast(pa.int64())}),
        batch_format="pyarrow")


def sql_user_journeys() -> str:
    return """
SELECT user_id,
       string_agg(event_type, ',' ORDER BY ts, event_type) AS seq,
       cast(count(*) as bigint) AS n
FROM events GROUP BY user_id
"""


def q_json_props(sf_dir: str):
    """JSON field extraction from the event props payload: one RE2
    extract per batch for flat scalar keys, per-row json.loads only
    for rows the regex misses (kernels.textkit.json_extract_int)."""
    import pyarrow.compute as pc

    from ..kernels.textkit import json_extract_int

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_id", "props"])

    def f(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(b.column("event_id"), 2000))
        return pa.table({"event_id": b.column("event_id"),
                         "k": json_extract_int(b.column("props"), "k")})

    return ds.map_batches(f, batch_format="pyarrow")


def sql_json_props() -> str:
    return """
SELECT event_id, try_cast(json_extract_string(props, '$.k') as bigint) AS k
FROM events WHERE event_id < 2000
"""


def q_curation_pipeline(sf_dir: str):
    """End-to-end corpus curation CHAIN, the composition a real
    training-data run uses — normalize -> quality gate -> exact dedup
    (min doc_id wins) -> train/val/test split — every stage the
    engine's own operator, the whole chain one streaming plan with a
    single shuffle (the dedup buckets), and the ENTIRE composition
    SQL-oracled end-to-end."""
    import pyarrow.compute as pc

    from ..ops import text as T
    from ..ops.dedup import dedup_exact
    from ..ops.sample import split_assign

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "lang"])
    ds = T.normalize_op(ds)

    def gate(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b.column("n_chars_norm"), 50))
        return b.drop_columns(["text"])

    ds = ds.map_batches(gate, batch_format="pyarrow")
    ds = dedup_exact(ds, text_col="norm_text", id_col="doc_id")
    ds = split_assign(ds, "doc_id", seed=1)

    def clean(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b.column("doc_id"),
                         "lang": b.column("lang"),
                         "n_chars_norm": b.column("n_chars_norm").cast(pa.int64()),
                         "content_md5": b.column("content_md5"),
                         "split": b.column("split")})

    return ds.map_batches(clean, batch_format="pyarrow")


def sql_curation_pipeline() -> str:
    from ..ops.sample import sql_split_assign

    return rf"""
WITH n AS (
  SELECT doc_id, lang,
         trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'), ' ') AS norm_text
  FROM documents),
q AS (
  SELECT doc_id, lang, norm_text,
         cast(length(norm_text) as bigint) AS n_chars_norm
  FROM n WHERE length(norm_text) >= 50),
d AS (
  SELECT *, md5(norm_text) AS content_md5,
         row_number() OVER (PARTITION BY norm_text ORDER BY doc_id) AS rn
  FROM q)
SELECT doc_id, lang, n_chars_norm, content_md5,
       {sql_split_assign('doc_id', seed=1)} AS split
FROM d WHERE rn = 1
"""


def q_asof_forward(sf_dir: str):
    """FORWARD as-of join (pandas merge_asof direction parity): for
    each order, the first shipment date on/after the order date within
    the order — the temporal.asof_join co-partitioned path with
    direction='forward'."""
    o = read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_orderdate"])
    o = o.map_batches(lambda b: b.rename_columns(["o_orderkey", "ts"]),
                      batch_format="pyarrow")
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_shipdate"])
    li = li.map_batches(
        lambda b: pa.table({"o_orderkey": b.column("l_orderkey"),
                            "ts": b.column("l_shipdate"),
                            "next_ship": b.column("l_shipdate")}),
        batch_format="pyarrow")
    out = temporal.asof_join(o, li, on="ts", by="o_orderkey",
                             direction="forward", right_cols=["next_ship"])

    def clean(b: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": b.column("o_orderkey"),
                         "ts": b.column("ts"),
                         "next_ship": b.column("next_ship").cast(pa.timestamp("us"))})

    return out.map_batches(clean, batch_format="pyarrow")


def sql_asof_forward() -> str:
    return """
SELECT o_orderkey, o_orderdate AS ts, min(l_shipdate) AS next_ship
FROM orders LEFT JOIN lineitem
  ON l_orderkey = o_orderkey AND l_shipdate >= o_orderdate
GROUP BY 1, 2
"""


def q_cube_revenue(sf_dir: str):
    """GROUP BY CUBE(status, priority): all four grouping sets from
    ONE full shuffle; every coarser set re-aggregates the finest
    level's tiny output (ops.stats_agg.cube_sums)."""
    from ..ops import stats_agg as SA

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderstatus", "o_orderpriority",
                                     "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        cents = _round_half_up(b.column("o_totalprice").to_numpy() * 100.0).astype(np.int64)
        return pa.table({"o_orderstatus": b.column("o_orderstatus"),
                         "o_orderpriority": b.column("o_orderpriority"),
                         "cents": pa.array(cents)})

    return SA.cube_sums(ds.map_batches(prep, batch_format="pyarrow"),
                        key_cols=["o_orderstatus", "o_orderpriority"],
                        key_types={"o_orderstatus": pa.string(),
                                   "o_orderpriority": pa.string()},
                        value_col="cents", count_col="n_orders",
                        sum_col="revenue_cents")


def sql_cube_revenue() -> str:
    return """
WITH o AS (
  SELECT o_orderstatus, o_orderpriority,
         cast(round(o_totalprice*100) as bigint) AS cents
  FROM orders)
SELECT o_orderstatus, o_orderpriority,
       cast(count(*) as bigint) AS n_orders,
       cast(sum(cents) as bigint) AS revenue_cents
FROM o GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


def q_grouping_sets_revenue(sf_dir: str):
    """GROUP BY GROUPING SETS((status, priority), (status), ()): the
    user-chosen subsets — not the full cube — all derived from ONE
    full shuffle (ops.stats_agg.grouping_sets_sums)."""
    from ..ops import stats_agg as SA

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderstatus", "o_orderpriority",
                                     "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        cents = _round_half_up(b.column("o_totalprice").to_numpy() * 100.0).astype(np.int64)
        return pa.table({"o_orderstatus": b.column("o_orderstatus"),
                         "o_orderpriority": b.column("o_orderpriority"),
                         "cents": pa.array(cents)})

    return SA.grouping_sets_sums(
        ds.map_batches(prep, batch_format="pyarrow"),
        sets=[["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        key_types={"o_orderstatus": pa.string(),
                   "o_orderpriority": pa.string()},
        value_col="cents", count_col="n_orders", sum_col="revenue_cents")


def sql_grouping_sets_revenue() -> str:
    return """
WITH o AS (
  SELECT o_orderstatus, o_orderpriority,
         cast(round(o_totalprice*100) as bigint) AS cents
  FROM orders)
SELECT o_orderstatus, o_orderpriority,
       cast(count(*) as bigint) AS n_orders,
       cast(sum(cents) as bigint) AS revenue_cents
FROM o GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                               (o_orderstatus), ())
"""


def q_dedup_keep_newest(sf_dir: str):
    """Keep-newest dedup policy: one row per distinct props payload,
    the winner being max ts (max event_id among ts ties) — the
    keep-latest-crawl curation policy on dedup_exact's bounded-bucket
    machinery (keep='last', priority_col)."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "props"])
    out = dedup_exact(ds, text_col="props", id_col="event_id",
                      keep="last", priority_col="ts")
    return out.map_batches(
        lambda b: pa.table({"event_id": b.column("event_id"),
                            "ts": b.column("ts"),
                            "props": b.column("props")}),
        batch_format="pyarrow")


def sql_dedup_keep_newest() -> str:
    return """
SELECT event_id, ts, props FROM (
  SELECT event_id, ts, props,
         row_number() OVER (PARTITION BY props
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1
"""


def q_intersect_users(sf_dir: str):
    """SQL INTERSECT: distinct event users that are also customer
    keys — bounded-bucket distinct composed with the Bloom-prefiltered
    exact semi join (neither raw table fully shuffles)."""
    from ..ops.bloom import bloom_semi_anti_join

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id"])
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey"])
    d = rel.distinct_rows(ev, ["user_id"])
    return bloom_semi_anti_join(d, cust, on="user_id", right_on="c_custkey")


def sql_intersect_users() -> str:
    return """
SELECT user_id FROM events
INTERSECT
SELECT c_custkey FROM customer
"""


def q_except_custkeys(sf_dir: str):
    """SQL EXCEPT: customer keys with no events — the same composition
    with the anti side."""
    from ..ops.bloom import bloom_semi_anti_join

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey"])
    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id"])
    d = rel.distinct_rows(cust, ["c_custkey"])
    return bloom_semi_anti_join(d, ev, on="c_custkey", right_on="user_id",
                                anti=True)


def sql_except_custkeys() -> str:
    return """
SELECT c_custkey FROM customer
EXCEPT
SELECT user_id FROM events
"""


def q_lag_events(sf_dir: str):
    """SQL lag()/lead() over (user, ts) without per-key full histories
    in one worker: (key, 7-day chunk) groups + boundary-row carries
    that ride the main shuffle."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_id", "ts", "value"])

    def cents(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy()
        return pa.table({"user_id": b.column("user_id"),
                         "event_id": b.column("event_id"),
                         "ts": b.column("ts"),
                         "cents": pa.array(_round_half_up(v * 100.0).astype(np.int64))})

    cds = ds.map_batches(cents, batch_format="pyarrow")
    lag = temporal.lag_lead(cds, key_col="user_id", ts_col="ts",
                            tie_col="event_id", value_col="cents", shift="lag")

    def clean(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b.column("k"),
                         "event_id": b.column("tie"),
                         "cents": b.column("v").cast(pa.int64()),
                         "lag_value": b.column("lag_value")})

    return lag.map_batches(clean, batch_format="pyarrow")


def sql_lag_events() -> str:
    return """
SELECT user_id, event_id, cents,
       cast(lag(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS double) AS lag_value
FROM (SELECT user_id, event_id, ts,
             cast(floor(value * 100.0 + 0.5) AS bigint) AS cents FROM events)
"""


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot_events(sf_dir: str):
    """SQL PIVOT shape: one wide row per user with per-event-type
    (sum, count) columns.  Values convert to integer cents BEFORE
    aggregation so sums are bit-exact regardless of summation order;
    per-batch pivot_table partials combine below the shuffle."""
    from ..ops.rollup import pivot_agg

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type", "value"])

    def cents(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b.column("user_id"),
                         "event_type": b.column("event_type"),
                         "cents": pa.array(_round_half_up(v * 100.0).astype(np.int64))})

    return pivot_agg(ds.map_batches(cents, batch_format="pyarrow"),
                     "user_id", "event_type", "cents", list(EVENT_TYPES))


def sql_pivot_events() -> str:
    pieces = []
    for c in EVENT_TYPES:
        pieces.append(f"cast(sum(CASE WHEN event_type = '{c}' THEN "
                      f"cast(floor(value * 100.0 + 0.5) AS bigint) ELSE 0 END) AS bigint) AS {c}_sum")
    for c in EVENT_TYPES:
        pieces.append(f"cast(sum(CASE WHEN event_type = '{c}' THEN 1 ELSE 0 END) AS bigint) AS {c}_n")
    cols = ",\n       ".join(pieces)
    return f"""
SELECT user_id,
       {cols}
FROM events GROUP BY user_id
"""


def q_rank_orders(sf_dir: str):
    """Global window-function family (rank / dense_rank / row_number
    / ntile / percent_rank / cume_dist) over order totalprice WITHOUT
    a global sort: KLL boundaries -> one range shuffle with local
    sorts -> driver cumsum of per-range counts (n_ranges ints) ->
    narrow offset map.  All six methods share the single shuffle."""
    from ..ops.rank import global_rank

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_totalprice"])
    out = global_rank(ds, "o_totalprice",
                      methods=("rank", "dense_rank", "row_number",
                               "ntile", "percent_rank", "cume_dist"),
                      tie_cols=["o_orderkey"], k_tiles=7)

    def proj(b: pa.Table) -> pa.Table:
        return b.select(["o_orderkey", "rank", "dense_rank", "row_number",
                         "ntile", "percent_rank", "cume_dist"])

    return out.map_batches(proj, batch_format="pyarrow")


def sql_rank_orders() -> str:
    return """
SELECT o_orderkey,
       rank() OVER (ORDER BY o_totalprice) AS rank,
       dense_rank() OVER (ORDER BY o_totalprice) AS dense_rank,
       row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS row_number,
       ntile(7) OVER (ORDER BY o_totalprice, o_orderkey) AS ntile,
       percent_rank() OVER (ORDER BY o_totalprice) AS percent_rank,
       cume_dist() OVER (ORDER BY o_totalprice) AS cume_dist
FROM orders
"""


def q_custdist(sf_dir: str):
    """TPC-H Q13 shape: order-count distribution per customer through
    a LEFT OUTER hash join, so zero-order customers survive with
    count 0.  Scale: orders pre-aggregate to <= #customers rows BEFORE
    the join (aggregation pushdown); the outer join and both groupbys
    are cluster-bounded shuffles."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_orderpriority"])

    def pre(b: pa.Table) -> pa.Table:
        t = b.filter(pc.not_equal(b.column("o_orderpriority"), "1-URGENT"))
        g = pa.table({"o_custkey": t.column("o_custkey")}).group_by(
            "o_custkey").aggregate([("o_custkey", "count")])
        return g.rename_columns(["o_custkey", "n"])

    per_cust = orders.map_batches(pre, batch_format="pyarrow", batch_size=65536)
    per_cust = per_cust.groupby("o_custkey", num_partitions=shuffle_partitions()).aggregate(
        Sum("n", alias_name="n"))
    j = rel.hash_join(cust, per_cust, on="c_custkey", right_on="o_custkey",
                      how="left_outer", num_partitions=shuffle_partitions())

    def ccount(b: pa.Table) -> pa.Table:
        return pa.table({"c_count": pc.fill_null(b.column("n"), 0).cast(pa.int64())})

    out = j.map_batches(ccount, batch_format="pyarrow").groupby(
        "c_count", num_partitions=shuffle_partitions()).aggregate(
        Count(alias_name="custdist"))

    def clean(b: pa.Table) -> pa.Table:
        return pa.table({"c_count": b.column("c_count"),
                         "custdist": b.column("custdist").cast(pa.int64())})

    return out.map_batches(clean, batch_format="pyarrow")


def sql_custdist() -> str:
    return """
SELECT c_count, cast(count(*) AS bigint) AS custdist FROM (
  SELECT c.c_custkey, count(o.o_custkey) AS c_count
  FROM customer c LEFT OUTER JOIN (
    SELECT o_custkey FROM orders WHERE o_orderpriority <> '1-URGENT') o
    ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey)
GROUP BY c_count
"""


def q_graph_components(sf_dir: str):
    """Connected components over a similarity graph (the transitive-
    closure step of near-dup clustering).  The graph here is SQL-
    expressible so the distributed alternating-star algorithm can be
    hash-checked end-to-end: edges link doc_id -> doc_id+20 when both
    share a source and sit within 100 chars of each other (sources are
    striped by doc_id %% 20, so these are consecutive docs per source)."""
    from ..ops.graph import connected_components

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "source", "n_chars"])

    def aside(b: pa.Table) -> pa.Table:
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({"join_id": pa.array(did + 20),
                         "doc_a": b.column("doc_id"),
                         "src_a": b.column("source"),
                         "nc_a": b.column("n_chars")})

    def bside(b: pa.Table) -> pa.Table:
        return pa.table({"join_id": b.column("doc_id"),
                         "doc_b": b.column("doc_id"),
                         "src_b": b.column("source"),
                         "nc_b": b.column("n_chars")})

    j = rel.hash_join(docs.map_batches(aside, batch_format="pyarrow"),
                      docs.map_batches(bside, batch_format="pyarrow"),
                      on="join_id", num_partitions=shuffle_partitions())

    def keep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ok = pc.and_(pc.equal(b.column("src_a"), b.column("src_b")),
                     pc.less_equal(pc.abs(pc.subtract(b.column("nc_a"),
                                                      b.column("nc_b"))), 100))
        return b.filter(ok).select(["doc_a", "doc_b"])

    edges = j.map_batches(keep, batch_format="pyarrow")
    return connected_components(edges, out_node="doc_id", out_comp="component")


def sql_graph_components() -> str:
    return """
WITH RECURSIVE
e AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM documents a JOIN documents b
    ON b.doc_id = a.doc_id + 20 AND b.source = a.source
   AND abs(b.n_chars - a.n_chars) <= 100
),
edges AS (SELECT u, v FROM e UNION SELECT v AS u, u AS v FROM e),
nodes AS (SELECT DISTINCT u AS n FROM edges),
reach(src, node) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT r.src, e2.v FROM reach r JOIN edges e2 ON e2.u = r.node
)
SELECT src AS doc_id, cast(min(node) AS bigint) AS component
FROM reach GROUP BY src
"""


def q_sessionize(sf_dir: str):
    rd = _rd()
    from ..ops.temporal import sessionize

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    out = sessionize(ds, key_col="user_id", ts_col="ts", gap_s=1800)

    def clean(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b.column("user_id").cast(pa.int64()),
                "n_sessions": b.column("n_sessions").cast(pa.int64()),
                "n_events": b.column("n_events").cast(pa.int64()),
            }
        )

    return out.map_batches(clean, batch_format="pyarrow")


def sql_sessionize() -> str:
    return """
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                      > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
)
SELECT user_id, cast(sum(new_s) as bigint) AS n_sessions, count(*) AS n_events
FROM o GROUP BY user_id
"""


def q_vector_stats(sf_dir: str):
    """Per-row list-column aggregate (A7 posterior-summarization
    analog: per-fire trace matrix -> per-row stats, MCBEF.py:916-933;
    95% HDI + half-sample mode per MCBEF.py:856-889)."""
    rd = _rd()
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def stats(b: pa.Table) -> pa.Table:
        from ..kernels.stats import hdi_bounds
        from ..ops.embed import _to_matrix

        mat = _to_matrix(b.column("embedding"), np.float64)
        s = np.sort(mat, axis=1)
        hlo, hhi = hdi_bounds(s, 0.95)
        mlo, mhi = hdi_bounds(s, 0.5)
        return pa.table(
            {
                "vec_id": b.column("vec_id"),
                "vec_mean": pa.array(mat.mean(axis=1)),
                "vec_min": pa.array(s[:, 0]),
                "vec_max": pa.array(s[:, -1]),
                "vec_median": pa.array(np.median(mat, axis=1)),
                "vec_hdi_lo": pa.array(hlo),
                "vec_hdi_hi": pa.array(hhi),
                "vec_mode": pa.array((mlo + mhi) / 2.0),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def sql_vector_stats() -> str:
    return """
WITH s AS (
  SELECT vec_id, cast(embedding as DOUBLE[]) AS e,
         list_sort(cast(embedding as DOUBLE[])) AS l,
         cast(len(embedding) as bigint) AS d
  FROM embeddings
),
w95 AS (
  SELECT vec_id, l[i] AS lo, l[i + cast(ceil(0.95*d) as bigint) - 1] AS hi,
         row_number() OVER (PARTITION BY vec_id
           ORDER BY l[i + cast(ceil(0.95*d) as bigint) - 1] - l[i], i) AS rn
  FROM s, unnest(range(1, d - cast(ceil(0.95*d) as bigint) + 2)) AS t(i)
),
w50 AS (
  SELECT vec_id, l[i] AS lo, l[i + cast(ceil(0.5*d) as bigint) - 1] AS hi,
         row_number() OVER (PARTITION BY vec_id
           ORDER BY l[i + cast(ceil(0.5*d) as bigint) - 1] - l[i], i) AS rn
  FROM s, unnest(range(1, d - cast(ceil(0.5*d) as bigint) + 2)) AS t(i)
)
SELECT s.vec_id,
       list_aggregate(e, 'avg') AS vec_mean,
       list_aggregate(e, 'min') AS vec_min,
       list_aggregate(e, 'max') AS vec_max,
       list_aggregate(e, 'median') AS vec_median,
       a.lo AS vec_hdi_lo, a.hi AS vec_hdi_hi,
       (b.lo + b.hi) / 2.0 AS vec_mode
FROM s
JOIN (SELECT vec_id, lo, hi FROM w95 WHERE rn = 1) a USING (vec_id)
JOIN (SELECT vec_id, lo, hi FROM w50 WHERE rn = 1) b USING (vec_id)
"""


# ---------------------------------------------------------------------------
# rows-only queries (non-SQL-expressible; pytest-checked instead)
# ---------------------------------------------------------------------------

def q_cells(sf_dir: str):
    ds = flagship.narrow_pages(sf_dir)
    return ds.select_columns(["doc_id", "hex_r7", "s2_l12", "hex_prefix"])


def sql_cells() -> str:
    """SQL mirror of the full tiling surface: hex res-7 packed ids,
    hex partition prefixes, AND S2 level-12 cell ids — the complete
    from-scratch S2 pipeline (lat/lon -> XYZ -> cube face (u,v) ->
    quadratic ST -> leaf (i,j) -> 12-level Hilbert walk -> 64-bit id)
    expressed in SQL, with the Hilbert state machine unrolled from the
    same public traversal tables the kernel uses.  Trig is bit-exact
    between numpy and DuckDB (verified empirically; both use libm)."""
    from ..kernels import cells as C
    from ..kernels.s2 import _IJ_TO_POS, _POS_TO_ORIENT, DEFAULT_LEVEL

    pages = P.sql_pages_cte()
    hex_prefix_cte = _sql_hex_cte_prefix(C.HEX_DEFAULT_RES)
    hex_cells = hex_prefix_cte[: hex_prefix_cte.index(",\nocc AS")]

    # Hilbert walk: one chained CTE per level, generated from the
    # kernel's tables so SQL and numpy provably share constants
    steps = []
    prev = "h_init"
    for n, k in enumerate(range(DEFAULT_LEVEL - 1, -1, -1)):
        d_cases = []
        for orient in range(4):
            inner = " ".join(
                f"WHEN {ij} THEN {int(_IJ_TO_POS[orient][ij])}" for ij in range(4))
            d_cases.append(
                f"WHEN {orient} THEN (CASE ((i // {1 << k}) % 2) * 2 + (j // {1 << k}) % 2 {inner} END)")
        cur = f"h{n + 1}"
        steps.append(f"""
{cur} AS (
  SELECT doc_id, i, j, face, pos * 4 + d AS pos,
         CASE WHEN d = 0 THEN xor(orient, 1)
              WHEN d = 3 THEN xor(orient, 3)
              ELSE orient END AS orient
  FROM (SELECT *, CASE orient {' '.join(d_cases)} END AS d FROM {prev})
)""")
        prev = cur
    assert int(_POS_TO_ORIENT[0]) == 1 and int(_POS_TO_ORIENT[3]) == 3
    hilbert = ",".join(steps)
    shift = 2 * (30 - DEFAULT_LEVEL) + 1
    lsb = 1 << (2 * (30 - DEFAULT_LEVEL))

    return f"""{hex_cells},
hexed AS (
  SELECT doc_id, {_sql_hex_pack(C.HEX_DEFAULT_RES)} AS hex_r7,
         cast(((cast(floor(q / 32.0) as bigint) + 32768) % 65536) * 65536
              + ((cast(floor(r / 32.0) as bigint) + 32768) % 65536) as uinteger)
           AS hex_prefix
  FROM cells
),
pts AS (SELECT doc_id, lat, lon FROM pages),
xyz AS (
  SELECT doc_id,
         cos(radians(lat)) * cos(radians(lon)) AS x,
         cos(radians(lat)) * sin(radians(lon)) AS y,
         sin(radians(lat)) AS z
  FROM pts
),
f0 AS (
  SELECT doc_id, x, y, z,
         CASE WHEN abs(x) >= abs(y)
              THEN (CASE WHEN abs(x) >= abs(z) THEN 0 ELSE 2 END)
              ELSE (CASE WHEN abs(y) >= abs(z) THEN 1 ELSE 2 END) END AS fa
  FROM xyz
),
faced AS (
  SELECT doc_id, x, y, z,
         fa + CASE WHEN (CASE fa WHEN 0 THEN x WHEN 1 THEN y ELSE z END) < 0
                   THEN 3 ELSE 0 END AS face
  FROM f0
),
uv AS (
  SELECT doc_id, face,
         CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z
                   WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u,
         CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z
                   WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS v
  FROM faced
),
st AS (
  SELECT doc_id, face,
         CASE WHEN u >= 0.0 THEN 0.5 * sqrt(greatest(1.0 + 3.0 * u, 0.0))
              ELSE 1.0 - 0.5 * sqrt(greatest(1.0 - 3.0 * u, 0.0)) END AS s,
         CASE WHEN v >= 0.0 THEN 0.5 * sqrt(greatest(1.0 + 3.0 * v, 0.0))
              ELSE 1.0 - 0.5 * sqrt(greatest(1.0 - 3.0 * v, 0.0)) END AS t
  FROM uv
),
h_init AS (
  SELECT doc_id,
         least(greatest(cast(floor(s * {1 << DEFAULT_LEVEL}) as bigint), 0), {(1 << DEFAULT_LEVEL) - 1}) AS i,
         least(greatest(cast(floor(t * {1 << DEFAULT_LEVEL}) as bigint), 0), {(1 << DEFAULT_LEVEL) - 1}) AS j,
         face, cast(0 as bigint) AS pos, face % 2 AS orient
  FROM st
),{hilbert}
SELECT hx.doc_id, hx.hex_r7,
       cast(cast({prev}.face as hugeint) * {1 << 61}
            + cast({prev}.pos as hugeint) * {1 << shift} + {lsb} as ubigint) AS s2_l12,
       hx.hex_prefix
FROM hexed hx JOIN {prev} ON {prev}.doc_id = hx.doc_id
"""


def q_pip_biome(sf_dir: str):
    from ..ops.pip import pip_join

    ds = flagship.narrow_pages(sf_dir)
    return pip_join(ds).select_columns(["doc_id", "admin_id", "biome_id"])


def sql_pip_biome() -> str:
    """SQL mirror of the point-in-polygon join: the crossing-number ray
    cast becomes per-(point, polygon) edge-crossing parity over a
    literal edge table (biome layer is deterministic code, so its
    vertices embed exactly); first-match = min pid among containing
    polygons (GridIndex candidate order), -1 outside.  Horizontal
    edges: the parity filter is false before the division, and DuckDB
    double/0 yields NULL which the AND also rejects — matching the
    engine's masked-divide semantics."""
    pages = P.sql_pages_cte()
    rows = []
    for pid, _, verts in PG.biome_polygons():
        n = len(verts)
        for i in range(n):
            x0, y0 = verts[i]
            x1, y1 = verts[(i + 1) % n]
            rows.append(f"({pid}, {float(x0)!r}, {float(y0)!r}, "
                        f"{float(x1)!r}, {float(y1)!r})")
    edges = ", ".join(rows)
    return f"""
WITH pages AS ({pages}),
pts AS (SELECT doc_id, lat, lon FROM pages),
edges AS (SELECT * FROM (VALUES {edges}) AS t(pid, x0, y0, x1, y1)),
par AS (
  SELECT p.doc_id, e.pid,
         count(*) FILTER (
           WHERE ((e.y0 <= p.lat) != (e.y1 <= p.lat))
             AND p.lon < e.x0 + (p.lat - e.y0) * (e.x1 - e.x0) / (e.y1 - e.y0)
         ) AS crossings
  FROM pts p CROSS JOIN edges e
  GROUP BY p.doc_id, e.pid
),
inside AS (
  SELECT doc_id, min(pid) AS biome_id FROM par
  WHERE crossings % 2 = 1 GROUP BY doc_id
)
SELECT p.doc_id,
       {PG.sql_admin_id('p.lat', 'p.lon')} AS admin_id,
       cast(coalesce(i.biome_id, -1) as int) AS biome_id
FROM pts p LEFT JOIN inside i ON i.doc_id = p.doc_id
"""


def q_minhash(sf_dir: str):
    rd = _rd()
    from ..ops.dedup import minhash_lsh_pairs

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return minhash_lsh_pairs(ds)


def q_neardup_verified(sf_dir: str):
    """LSH candidates -> distributed exact-Jaccard verification
    (signature shingling streams over the corpus; per-pair verify
    streams over the pairs)."""
    rd = _rd()
    from ..ops.dedup import minhash_lsh_pairs, verify_jaccard_op

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs)
    return verify_jaccard_op(pairs, docs, threshold=0.5)


def q_neardup_clusters(sf_dir: str):
    """Full near-dup CLUSTERING: LSH candidates -> exact-Jaccard
    verify -> transitive closure (alternating-star connected
    components) -> (doc_id, cluster_id).  cluster_id = min doc_id in
    the component, so `keep rows where doc_id == cluster_id` is the
    canonical one-per-cluster dedup policy.  Rows-only at the driver
    (MinHash uses wrapping uint64 arithmetic DuckDB cannot express);
    pytest oracle = planted chain a~b~c with a !~ c."""
    from ..ops.dedup import minhash_lsh_pairs, verify_jaccard_op
    from ..ops.graph import connected_components

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs)
    verified = verify_jaccard_op(pairs, docs, threshold=0.5)
    return connected_components(verified, out_node="doc_id",
                                out_comp="cluster_id")


def q_neardup_filtered(sf_dir: str):
    """The user-facing ENDPOINT of the near-dup machinery: the corpus
    with non-representative cluster members REMOVED (cluster_id = min
    doc_id stays).  Losers come from the clustering chain; the corpus
    is filtered by an exact Bloom ANTI join, so document rows never
    shuffle and the loser set never lands on the driver.  Rows-only
    (MinHash upstream); pytest oracle = planted duplicate chain."""
    import pyarrow.compute as pc

    from ..ops.bloom import bloom_semi_anti_join
    from ..ops.dedup import minhash_lsh_pairs, verify_jaccard_op
    from ..ops.graph import connected_components

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs)
    verified = verify_jaccard_op(pairs, docs, threshold=0.5)
    clusters = connected_components(verified, out_node="doc_id",
                                    out_comp="cluster_id")
    losers = clusters.map_batches(
        lambda b: b.filter(pc.not_equal(b.column("doc_id"),
                                        b.column("cluster_id")))
                   .select(["doc_id"]),
        batch_format="pyarrow")
    narrow = read_parquet_clean(f"{sf_dir}/documents.parquet",
                                columns=["doc_id", "n_chars"])
    return bloom_semi_anti_join(narrow, losers, on="doc_id", anti=True)


def q_simhash(sf_dir: str):
    rd = _rd()
    from ..ops.dedup import simhash_pairs

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_pairs(ds)


def q_knn_hotspots(sf_dir: str):
    from ..ops.hotspot import knn_hotspots

    ds = flagship.narrow_pages(sf_dir)
    out = knn_hotspots(ds, k_ring=1)
    return out.select_columns(["doc_id", "hex_r7", "n_kring"])


def sql_knn_hotspots() -> str:
    """Full-resolution kNN hotspot oracle (halo-exchange k-ring counts
    at the engine's actual res-7 grid)."""
    from ..kernels import cells as C

    offs = C.hex_disk_offsets(1)
    disk_rows = ", ".join(f"({int(dq)},{int(dr)})" for dq, dr in offs)
    prefix = _sql_hex_cte_prefix(C.HEX_DEFAULT_RES)
    prefix = prefix[: prefix.index(",\nocc AS")]
    return prefix + f""",
cnt AS (SELECT q, r, cast(count(*) as bigint) AS n FROM cells GROUP BY q, r),
disk1 AS (SELECT * FROM (VALUES {disk_rows}) AS t(dq, dr)),
nk AS (
  SELECT o.q, o.r, cast(sum(c.n) as int) AS n_kring
  FROM cnt o JOIN disk1 d ON true
  JOIN cnt c ON c.q = o.q + d.dq AND c.r = o.r + d.dr
  GROUP BY o.q, o.r
)
SELECT cl.doc_id, {_sql_hex_pack(C.HEX_DEFAULT_RES, "cl.q", "cl.r")} AS hex_r7,
       nk.n_kring
FROM cells cl JOIN nk ON nk.q = cl.q AND nk.r = cl.r
"""


def q_ann_lsh(sf_dir: str):
    import pyarrow.parquet as pq
    from ..ops.embed import lsh_bucket_topk

    rd = _rd()
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]).slice(0, 3)
    queries = np.asarray(qt.column("embedding").to_pylist(), dtype=np.float64)
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return lsh_bucket_topk(ds, queries, k=10, nbits=8)


def q_pq_topk(sf_dir: str):
    """Product-quantized ANN: train codebooks on a hash-random sample,
    encode the corpus to m=8 uint8 codes (32x compression), answer 3
    queries by ADC LUT scan (ops/embed.pq_*).  Rows-only; recall and
    self-retrieval are pytest-pinned vs brute-force cosine
    (test_pq_adc_recall_and_self_retrieval)."""
    import pyarrow.parquet as pq

    from ..ops.embed import pq_encode, pq_topk, pq_train

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    books = pq_train(ds, m=8, nbits=8, sample_size=2000, seed=0)
    codes = pq_encode(ds, books)
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["embedding"]).slice(0, 3)
    queries = np.asarray(qt.column("embedding").to_pylist(), dtype=np.float64)
    return pq_topk(codes, books, queries, k=10)


def q_bpe_tokenize(sf_dir: str):
    """REAL learned-vocabulary token counting: byte-level BPE trained
    on a deterministic hash-random sample (driver-side — merge
    selection is sequential), corpus encoded by an actor pool holding
    the compiled rank table (ops/bpe).  Rows-only: BPE is not
    SQL-expressible; pytest pins round-trip decode == original bytes
    and encode-vs-reference equality (test_bpe_roundtrip_and_ratio)."""
    from ..ops.bpe import bpe_encode_op, train_bpe_on_corpus

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    merges = train_bpe_on_corpus(ds, n_merges=100, sample_size=300, seed=0)
    out = bpe_encode_op(ds, merges)
    return out.select_columns(["doc_id", "n_tokens", "n_bytes",
                               "tokens_per_byte"])


def q_group_centroids(sf_dir: str):
    """Per-label embedding centroid (vector aggregate): one zero-copy
    matrix sum per (block, label) — vectors never shuffle, only
    (label, dim-sum blob, count) partials — merged in a bounded
    groupby; output EXPLODED as (label, pos, v) so the SQL mirror is a
    plain per-dimension avg over unnest WITH ORDINALITY."""
    from ..ops import pd_table as _pdt
    from ..ops.embed import _to_matrix

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["label", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        v = _to_matrix(b.column("embedding"), np.float64)
        lab = b.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.unique(lab)
        sums, ns = [], []
        for L in u:
            m = lab == L
            sums.append(v[m].sum(axis=0).tobytes())
            ns.append(int(m.sum()))
        return pa.table({"label": pa.array(u),
                         "s": pa.array(sums, pa.large_binary()),
                         "n": pa.array(np.array(ns, np.int64))})

    def merge(g):
        s = np.stack([np.frombuffer(x, np.float64) for x in g["s"]]).sum(axis=0)
        n = int(g["n"].sum())
        mean = s / n
        return _pdt(pd.DataFrame({
            "label": np.full(len(mean), int(g["label"].iloc[0]), np.int64),
            "pos": np.arange(len(mean), dtype=np.int64),
            "v": mean}))

    from ..ops import shuffle_partitions

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("label", num_partitions=shuffle_partitions())
            .map_groups(merge, batch_format="pandas"))


def sql_group_centroids() -> str:
    return """
WITH x AS (
  SELECT label,
         cast(generate_subscripts(embedding, 1) - 1 as bigint) AS pos,
         cast(unnest(embedding) as double) AS v
  FROM embeddings
)
SELECT label, pos, avg(v) AS v FROM x GROUP BY label, pos
"""


def q_centroid_distance(sf_dir: str):
    """Prototype-distance curation signal: cosine of every embedding
    to its OWN label's centroid (far-from-prototype rows are label
    noise).  Centroids from the same matrix-sum partials as
    group_centroids, broadcast once; per batch one GEMM row-gather —
    vectors never shuffle."""
    import ray

    from ..ops import shuffle_partitions
    from ..ops.embed import _to_matrix
    from ..ops.workercache import worker_state

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "label", "embedding"])
    cent_tbl = q_group_centroids(sf_dir).to_pandas()
    labels = np.sort(cent_tbl["label"].unique())
    dim = int(cent_tbl["pos"].max()) + 1
    C = np.zeros((labels.max() + 1, dim))
    for L in labels:
        sub = cent_tbl[cent_tbl.label == L].sort_values("pos")
        C[L] = sub["v"].to_numpy()
    ref = ray.put(C)

    def f(b: pa.Table) -> pa.Table:
        c = worker_state(ref, lambda: ray.get(ref))
        v = _to_matrix(b.column("embedding"), np.float64)
        lab = b.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        cv = c[lab]
        dot = (v * cv).sum(axis=1)
        cos = dot / (np.linalg.norm(v, axis=1) * np.linalg.norm(cv, axis=1))
        return pa.table({"vec_id": b.column("vec_id"),
                         "label": b.column("label").cast(pa.int64()),
                         "cos_to_centroid": pa.array(cos)})

    return ds.map_batches(f, batch_format="pyarrow")


def sql_centroid_distance() -> str:
    return """
WITH x AS (
  SELECT vec_id, label,
         cast(generate_subscripts(embedding, 1) - 1 as bigint) AS pos,
         cast(unnest(embedding) as double) AS v
  FROM embeddings
),
c AS (SELECT label, pos, avg(v) AS cv FROM x GROUP BY 1, 2),
cn AS (SELECT label, sqrt(sum(cv * cv)) AS nc FROM c GROUP BY 1),
d AS (
  SELECT x.vec_id, x.label, sum(x.v * c.cv) AS dot, sqrt(sum(x.v * x.v)) AS nv
  FROM x JOIN c ON x.label = c.label AND x.pos = c.pos
  GROUP BY 1, 2
)
SELECT d.vec_id, cast(d.label as bigint) AS label,
       d.dot / (d.nv * cn.nc) AS cos_to_centroid
FROM d JOIN cn USING (label)
"""


def q_label_margin(sf_dir: str):
    """Label-noise margin: cos(own-label centroid) minus the BEST
    cosine to any OTHER label's centroid — negative margin = the
    embedding sits closer to another class's prototype (mislabeled
    candidate).  Same broadcast-centroid GEMM as centroid_distance,
    one (rows x labels) matmul per batch."""
    import ray

    from ..ops.embed import _to_matrix
    from ..ops.workercache import worker_state

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "label", "embedding"])
    cent_tbl = q_group_centroids(sf_dir).to_pandas()
    labels = np.sort(cent_tbl["label"].unique())
    dim = int(cent_tbl["pos"].max()) + 1
    C = np.zeros((labels.max() + 1, dim))
    for L in labels:
        C[L] = cent_tbl[cent_tbl.label == L].sort_values("pos")["v"].to_numpy()
    ref = ray.put(C)

    def f(b: pa.Table) -> pa.Table:
        c = worker_state(ref, lambda: ray.get(ref))
        cn = np.linalg.norm(c, axis=1)
        v = _to_matrix(b.column("embedding"), np.float64)
        lab = b.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        cos = (v @ c.T) / (np.linalg.norm(v, axis=1, keepdims=True) * cn[None])
        own = cos[np.arange(len(v)), lab]
        masked = cos.copy()
        masked[np.arange(len(v)), lab] = -np.inf
        best_other = masked.max(axis=1)
        return pa.table({"vec_id": b.column("vec_id"),
                         "label": b.column("label").cast(pa.int64()),
                         "margin": pa.array(own - best_other)})

    return ds.map_batches(f, batch_format="pyarrow")


def sql_label_margin() -> str:
    return """
WITH x AS (
  SELECT vec_id, label,
         cast(generate_subscripts(embedding, 1) - 1 as bigint) AS pos,
         cast(unnest(embedding) as double) AS v
  FROM embeddings
),
c AS (SELECT label, pos, avg(v) AS cv FROM x GROUP BY 1, 2),
cn AS (SELECT label, sqrt(sum(cv * cv)) AS nc FROM c GROUP BY 1),
nv AS (SELECT vec_id, sqrt(sum(v * v)) AS nv FROM x GROUP BY 1),
allcos AS (
  SELECT x.vec_id, x.label AS own_label, c.label AS c_label,
         sum(x.v * c.cv) / (any_value(nv.nv) * any_value(cn.nc)) AS cos
  FROM x
  JOIN c ON x.pos = c.pos
  JOIN cn ON c.label = cn.label
  JOIN nv ON x.vec_id = nv.vec_id
  GROUP BY 1, 2, 3
)
SELECT a.vec_id, cast(a.own_label as bigint) AS label,
       max(CASE WHEN a.c_label = a.own_label THEN a.cos END)
         - max(CASE WHEN a.c_label <> a.own_label THEN a.cos END) AS margin
FROM allcos a
GROUP BY 1, 2
"""


def q_kmeans_clusters(sf_dir: str):
    """Distributed Lloyd's k-means over the embedding corpus (streaming
    sum-partials; vectors never shuffle) + cluster-balanced curation
    sample (kmeans_assign -> stratified_sample per cluster).  Output:
    one row per cluster with corpus count, capped-sample count, and
    centroid norm.  Rows-only: iterative k-means is not
    SQL-expressible; the algorithm is pytest-pinned against a
    driver-side numpy Lloyd from the identical init
    (test_kmeans_distributed_matches_numpy)."""
    from ..ops.embed import kmeans_assign, kmeans_distributed
    from ..ops.sample import stratified_sample

    k, cap = 8, 20
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    cent, counts = kmeans_distributed(ds, k=k, iters=3, seed=0)
    assigned = kmeans_assign(ds, cent, out_col="cluster")
    samp = stratified_sample(assigned.select_columns(["vec_id", "cluster"]),
                             "cluster", "vec_id", cap)
    ns = samp.groupby("cluster").count().to_pandas()
    n_samp = np.zeros(k, dtype=np.int64)
    n_samp[ns["cluster"].to_numpy()] = ns["count()"].to_numpy()
    return pa.table({
        "cluster": pa.array(np.arange(k, dtype=np.int32)),
        "n_total": pa.array(counts.astype(np.int64)),
        "n_sampled": pa.array(n_samp),
        "centroid_norm": pa.array(np.linalg.norm(cent, axis=1)),
    })


def q_ivf_topk(sf_dir: str):
    """IVF-partitioned ANN: build a centroid-partitioned index (scratch
    dir), then answer 3 queries reading ONLY the probed partitions —
    the block-skipping scale path; brute-force cosine_topk is the
    recall oracle (full-probe equality is pytest-pinned)."""
    import pyarrow.parquet as pq

    from ..ops.embed import ivf_build, ivf_topk

    rd = _rd()
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    idx = _scratch_dir("ivf_", sf_dir)
    ivf_build(ds, idx, n_centroids=16, sample_size=1000, seed=1)
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"]).slice(0, 3)
    queries = np.asarray(qt.column("embedding").to_pylist(), dtype=np.float64)
    return ivf_topk(idx, queries, k=10, nprobe=4)


def q_embedding_neardup(sf_dir: str):
    """Embedding-cosine near-dup over the corpus unioned with an
    id-shifted copy of itself: every vector pairs with its exact
    duplicate (cosine 1.0, LSH recall 1 for identical vectors), so the
    expected pair count equals the corpus size — a deterministic
    rows-only check of the multi-table sign-LSH path."""
    rd = _rd()
    from ..ops.embed import embedding_neardup

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def shift(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.set_column(b.schema.get_field_index("vec_id"), "vec_id",
                            pc.add(b.column("vec_id"), 1_000_000))

    both = ds.union(ds.map_batches(shift, batch_format="pyarrow"))
    return embedding_neardup(both, threshold=0.999)


def q_langid(sf_dir: str):
    rd = _rd()
    from ..ops.text import langid_op

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return langid_op(ds).select_columns(["doc_id", "lang_guess"])


WINDOW_START_US = 1704067200000000  # 2024-01-01, matches events span
N_WINDOWS = 80
WINDOW_SPAN_US = 8 * 3600 * 1_000_000   # 8h windows
WINDOW_STEP_US = 9 * 3600 * 1_000_000   # 9h apart (gaps + no overlap)


def _windows_table() -> pa.Table:
    wid = np.arange(N_WINDOWS, dtype=np.int64)
    start = WINDOW_START_US + wid * WINDOW_STEP_US
    return pa.table({"window_id": pa.array(wid),
                     "start_us": pa.array(start),
                     "end_us": pa.array(start + WINDOW_SPAN_US)})


def q_range_join(sf_dir: str):
    """Interval join: events matched to deterministic 8h windows
    (start <= ts < end); bucketed broadcast probe, no event shuffle."""
    rd = _rd()
    from ..ops.temporal import range_join

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])
    out = range_join(ev, _windows_table())

    def clean(b: pa.Table) -> pa.Table:
        return pa.table(
            {"event_id": b.column("event_id"),
             "ts_us": b.column("ts").cast(pa.int64()),
             "window_id": b.column("window_id")}
        )

    return out.map_batches(clean, batch_format="pyarrow")


def sql_range_join() -> str:
    return f"""
WITH w AS (
  SELECT i AS window_id,
         {WINDOW_START_US} + i * {WINDOW_STEP_US} AS start_us,
         {WINDOW_START_US} + i * {WINDOW_STEP_US} + {WINDOW_SPAN_US} AS end_us
  FROM (SELECT unnest(range(0, {N_WINDOWS})) AS i)
)
SELECT e.event_id, epoch_us(e.ts) AS ts_us, w.window_id
FROM events e JOIN w
  ON epoch_us(e.ts) >= w.start_us AND epoch_us(e.ts) < w.end_us
"""


def q_window_user_value(sf_dir: str):
    """Tumbling per-key value aggregate via ``temporal.window_aggregate``
    (daily buckets per user; integer cents so sums are order-exact)."""
    rd = _rd()
    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])

    def cents(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy()
        return pa.table({"user_id": b.column("user_id"), "ts": b.column("ts"),
                         "cents": pa.array(_round_half_up(v * 100.0).astype(np.int64))})

    out = temporal.window_aggregate(ds.map_batches(cents, batch_format="pyarrow"),
                                    key_col="user_id", ts_col="ts",
                                    value_col="cents", bucket_s=86400)

    def clean(b: pa.Table) -> pa.Table:
        return pa.table(
            {"user_id": b.column("user_id").cast(pa.int64()),
             "bucket_us": b.column("bucket_ts").cast(pa.timestamp("us")).cast(pa.int64()),
             "sum_value": b.column("sum_value").cast(pa.int64()),
             "n": b.column("n").cast(pa.int64()),
             "mean_value": b.column("mean_value").cast(pa.float64())}
        )

    return out.map_batches(clean, batch_format="pyarrow")


def sql_window_user_value() -> str:
    return """
SELECT user_id,
       cast(floor(epoch_us(ts) / 86400000000) as bigint) * 86400000000 AS bucket_us,
       cast(sum(cast(round(value * 100.0) as bigint)) as bigint) AS sum_value,
       count(*) AS n,
       cast(sum(cast(round(value * 100.0) as bigint)) as double) / count(*) AS mean_value
FROM events GROUP BY 1, 2
"""


HOP_SPAN_US = 6 * 3600 * 1_000_000   # 6h windows
HOP_STEP_US = 3 * 3600 * 1_000_000   # hopping every 3h (overlap 2x)
N_HOP = 240


def _hop_windows_table() -> pa.Table:
    wid = np.arange(N_HOP, dtype=np.int64)
    start = WINDOW_START_US + wid * HOP_STEP_US
    return pa.table({"window_id": pa.array(wid),
                     "start_us": pa.array(start),
                     "end_us": pa.array(start + HOP_SPAN_US)})


def q_hopping_agg(sf_dir: str):
    """Hopping-window aggregate (overlapping windows): each event joins
    every window covering it (bucketed broadcast interval probe, no
    event shuffle) and the per-window stats reduce with a small
    groupby — the streaming hopping-window composition.  Aggregates
    are order-independent (count/min/max) so the hash is exact."""
    rd = _rd()
    from ray.data.aggregate import Count, Max, Min

    from ..ops.temporal import range_join

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "value"])
    j = range_join(ev, _hop_windows_table())
    return j.groupby("window_id", num_partitions=shuffle_partitions()).aggregate(
        Count(alias_name="n"),
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"),
    )


def sql_hopping_agg() -> str:
    return f"""
WITH w AS (
  SELECT i AS window_id,
         {WINDOW_START_US} + i * {HOP_STEP_US} AS start_us,
         {WINDOW_START_US} + i * {HOP_STEP_US} + {HOP_SPAN_US} AS end_us
  FROM (SELECT unnest(range(0, {N_HOP})) AS i)
)
SELECT w.window_id, count(*) AS n, min(e.value) AS min_value, max(e.value) AS max_value
FROM events e JOIN w
  ON epoch_us(e.ts) >= w.start_us AND epoch_us(e.ts) < w.end_us
GROUP BY w.window_id
"""


def q_hopping_distinct(sf_dir: str):
    """Sliding-window DISTINCT users (overlapping 6h windows): events
    probe the broadcast window table (range_join, no event shuffle),
    (window, user) pairs dedup in bounded buckets, then a tiny count
    per window — streaming sliding-cardinality composition."""
    from ray.data.aggregate import Count

    from ..ops.relational import distinct_rows
    from ..ops.temporal import range_join

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])
    j = range_join(ev, _hop_windows_table())
    d = distinct_rows(j.select_columns(["window_id", "user_id"]),
                      ["window_id", "user_id"])
    out = d.groupby("window_id", num_partitions=shuffle_partitions()).aggregate(
        Count(alias_name="n_users"))
    return out.map_batches(
        lambda b: pa.table({"window_id": b.column("window_id").cast(pa.int64()),
                            "n_users": b.column("n_users").cast(pa.int64())}),
        batch_format="pyarrow")


def sql_hopping_distinct() -> str:
    return f"""
WITH w AS (
  SELECT i AS window_id,
         {WINDOW_START_US} + i * {HOP_STEP_US} AS start_us,
         {WINDOW_START_US} + i * {HOP_STEP_US} + {HOP_SPAN_US} AS end_us
  FROM (SELECT unnest(range(0, {N_HOP})) AS i)
)
SELECT cast(w.window_id as bigint) AS window_id,
       cast(count(DISTINCT e.user_id) as bigint) AS n_users
FROM events e JOIN w
  ON epoch_us(e.ts) >= w.start_us AND epoch_us(e.ts) < w.end_us
GROUP BY w.window_id
"""


DECAY_HALF_LIFE_US = 86400.0 * 1e6  # 1-day half-life (engine + oracle)


def q_decayed_value(sf_dir: str):
    """Time-decayed per-user value (feature-store op): sum of
    value * 0.5^((t_last - t)/half_life) at each user's LATEST event —
    one bucketed shuffle of (user, ts, value), per-bucket vectorized
    segment max + decay-weighted reduceat.  Order-independent (the
    aggregate is a plain sum), so the oracle hash is exact to float
    rounding."""
    from ..kernels.hashing import splitmix64
    from ..ops import pd_table as _pdt

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "value"])
    nb = shuffle_partitions()

    def add_bucket(b: pa.Table) -> pa.Table:
        k = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        bk = (splitmix64(k.astype(np.uint64)) % np.uint64(16 * nb)).astype(np.int64)
        return b.append_column("bk", pa.array(bk))

    def per_bucket(g):
        k = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = g["value"].to_numpy(np.float64)
        order = np.lexsort((ts, k))
        k, ts, v = k[order], ts[order], v[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        seg_id = np.cumsum(np.r_[True, k[1:] != k[:-1]]) - 1
        tmax = np.maximum.reduceat(ts, starts)
        w = v * np.power(0.5, (tmax[seg_id] - ts) / DECAY_HALF_LIFE_US)
        return _pdt(pd.DataFrame({
            "user_id": k[starts],
            "decayed_value": np.add.reduceat(w, starts)}))

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bk", num_partitions=nb)
            .map_groups(per_bucket, batch_format="pandas"))


def sql_decayed_value() -> str:
    return f"""
WITH m AS (SELECT user_id, max(ts) AS tmax FROM events GROUP BY 1)
SELECT e.user_id,
       sum(e.value * power(0.5,
           (epoch_us(m.tmax) - epoch_us(e.ts)) / {DECAY_HALF_LIFE_US!r}))
         AS decayed_value
FROM events e JOIN m USING (user_id)
GROUP BY e.user_id
"""


def q_top_anomalies(sf_dir: str):
    """Global top-20 pages by anomaly score: per-batch partial top-k
    inside map_batches, then one tiny final sort+limit — streaming
    consumption, nothing materializes beyond 20 rows per block."""
    det = flagship.detect_pipeline(sf_dir).select_columns(
        ["doc_id", "url", "pc_tile", "score", "status"]
    )
    k = 20

    def partial(b: pa.Table) -> pa.Table:
        s = np.nan_to_num(b.column("score").to_numpy(zero_copy_only=False), nan=-np.inf)
        kk = min(k, len(s))
        if kk == 0:
            return b
        # tie-break by doc_id within the batch so boundary-score ties
        # select exactly the rows the final (score DESC, doc_id ASC)
        # sort would keep
        top = np.lexsort((b.column("doc_id").to_numpy(zero_copy_only=False), -s))[:kk]
        return b.take(pa.array(np.sort(top)))

    out = det.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["score", "doc_id"], ascending=[False, True],
                          kind="mergesort").head(k).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def sql_top_anomalies() -> str:
    inner = sql_flagship()
    return f"""
SELECT doc_id, url, pc_tile, score, status FROM ({inner})
ORDER BY score DESC, doc_id ASC LIMIT 20
"""


def q_hex_background(sf_dir: str):
    """Contextual background on the fine hex grid (north_star's
    per-pixel kernel on the H3-style index; ring-1/ring-2)."""
    from ..ops.background import background_stats_hex

    narrow = flagship.narrow_pages(sf_dir)
    return background_stats_hex(narrow, "n_chars")


# coarse-ladder hex oracle: the SAME engine path (hex encode ->
# halo-exchange background) at a coarser resolution whose axial
# arithmetic is 1:1 SQL-expressible (cube-round via round_even); this
# promotes the hex background from rows-only to a full DuckDB oracle.
HEX_ORACLE_RES = 4


def q_hex_tile_stats(sf_dir: str):
    """Hex k-ring background median/MAD/n at the coarse oracle
    resolution — identical math to ``hex_background`` (same
    ``background_stats_hex`` halo path), cells unpacked to (q, r)
    axial columns for the SQL compare."""
    from ..kernels import cells as C
    from ..ops.background import background_stats_hex

    narrow = flagship.narrow_pages(sf_dir)

    def recode(b: pa.Table) -> pa.Table:
        lat = b.column("lat").to_numpy(zero_copy_only=False)
        lon = b.column("lon").to_numpy(zero_copy_only=False)
        cell = C.hex_cell(lat, lon, HEX_ORACLE_RES)
        return pa.table({"hex_c": pa.array(cell, pa.uint64()),
                         "n_chars": b.column("n_chars")})

    ds = narrow.select_columns(["lat", "lon", "n_chars"]).map_batches(
        recode, batch_format="pyarrow")
    bg = background_stats_hex(ds, "n_chars", cell_col="hex_c")

    def unpack(b: pa.Table) -> pa.Table:
        _, q, r = C.hex_unpack(b.column("cell").to_numpy(zero_copy_only=False))
        out = pa.table({"q": pa.array(q), "r": pa.array(r)})
        for c in b.column_names:
            if c != "cell":
                out = out.append_column(c, b.column(c))
        return out

    return bg.map_batches(unpack, batch_format="pyarrow")


def _sql_hex_cte_prefix(res: int = HEX_ORACLE_RES) -> str:
    """Shared CTE chain: pages -> axial cube-round cells -> occupied
    cells -> disk(2) neighborhood histogram -> per-cell ring stats.
    Used by the hex background AND hex detect oracles (coarse-ladder
    and full fine-resolution variants — the arithmetic is resolution-
    independent)."""
    from ..kernels import cells as C

    pages = P.sql_pages_cte()
    size = C.HEX_BASE_DEG / (C.HEX_APERTURE ** res)
    c_q = float(np.sqrt(3.0) / 3.0)
    c_y = float(1.0 / 3.0)
    c_r = float(2.0 / 3.0)
    offs = C.hex_disk_offsets(2)
    rings = ((np.abs(offs[:, 0]) + np.abs(offs[:, 1])
              + np.abs(offs[:, 0] + offs[:, 1])) // 2)
    disk_rows = ", ".join(f"({int(dq)},{int(dr)},{int(k)})"
                          for (dq, dr), k in zip(offs, rings))
    return f"""
WITH pages AS ({pages}),
ax AS (
  SELECT doc_id, cast(length(text) as bigint) AS n_chars,
         {c_q!r}*(lon/{size!r}) - {c_y!r}*(lat/{size!r}) AS qf,
         {c_r!r}*(lat/{size!r}) AS rf
  FROM pages
),
rnd AS (
  SELECT doc_id, n_chars, qf, rf, -qf-rf AS yf,
         round_even(qf, 0) AS rx, round_even(-qf-rf, 0) AS ry,
         round_even(rf, 0) AS rz
  FROM ax
),
cells AS (
  SELECT doc_id, n_chars,
         cast(CASE WHEN abs(rx-qf) > abs(ry-yf) AND abs(rx-qf) > abs(rz-rf)
              THEN -ry-rz ELSE rx END as bigint) AS q,
         cast(CASE WHEN NOT (abs(rx-qf) > abs(ry-yf) AND abs(rx-qf) > abs(rz-rf))
                   AND abs(rz-rf) > abs(ry-yf)
              THEN -rx-ry ELSE rz END as bigint) AS r
  FROM rnd
),
occ AS (SELECT DISTINCT q, r FROM cells),
disk AS (SELECT * FROM (VALUES {disk_rows}) AS t(dq, dr, ring)),
nbr AS (
  SELECT o.q AS cq, o.r AS cr, cast(c.n_chars as double) AS v, d.ring
  FROM occ o JOIN disk d ON true
  JOIN cells c ON c.q = o.q + d.dq AND c.r = o.r + d.dr
),
bgagg AS (
  SELECT cq AS q, cr AS r,
         median(CASE WHEN ring <= 1 THEN v END) AS bg1_median,
         mad(CASE WHEN ring <= 1 THEN v END)    AS bg1_mad,
         cast(count(CASE WHEN ring <= 1 THEN 1 END) as bigint) AS bg1_n,
         median(v) AS bg2_median,
         mad(v)    AS bg2_mad,
         cast(count(*) as bigint) AS bg2_n
  FROM nbr GROUP BY cq, cr
)"""


def sql_hex_tile_stats() -> str:
    return _sql_hex_cte_prefix() + """
SELECT q, r, bg1_median, bg1_mad, bg1_n, bg2_median, bg2_mad, bg2_n
FROM bgagg
"""


def q_knn_hotspots_coarse(sf_dir: str):
    """kNN hotspot counts (halo-exchange k-ring neighbor sum) at the
    oracle resolution — promoted to a full SQL oracle via the same
    axial cube-round cell arithmetic as hex_tile_stats."""
    from ..kernels import cells as C
    from ..ops.hotspot import knn_hotspots

    narrow = flagship.narrow_pages(sf_dir)

    def recode(b: pa.Table) -> pa.Table:
        lat = b.column("lat").to_numpy(zero_copy_only=False)
        lon = b.column("lon").to_numpy(zero_copy_only=False)
        cell = C.hex_cell(lat, lon, HEX_ORACLE_RES)
        return pa.table({"doc_id": b.column("doc_id"),
                         "hex_c": pa.array(cell, pa.uint64())})

    ds = narrow.select_columns(["doc_id", "lat", "lon"]).map_batches(
        recode, batch_format="pyarrow")
    out = knn_hotspots(ds, k_ring=1, cell_col="hex_c")

    def unpack(b: pa.Table) -> pa.Table:
        _, q, r = C.hex_unpack(b.column("hex_c").to_numpy(zero_copy_only=False))
        return pa.table({"doc_id": b.column("doc_id"),
                         "q": pa.array(q), "r": pa.array(r),
                         "n_kring": b.column("n_kring")})

    return out.map_batches(unpack, batch_format="pyarrow")


def sql_knn_hotspots_coarse() -> str:
    from ..kernels import cells as C

    offs = C.hex_disk_offsets(1)
    disk_rows = ", ".join(f"({int(dq)},{int(dr)})" for dq, dr in offs)
    # reuse the cube-round cell CTE chain, then count instead of median
    prefix = _sql_hex_cte_prefix()
    prefix = prefix[: prefix.index(",\nocc AS")]  # keep pages/ax/rnd/cells
    return prefix + f""",
cnt AS (SELECT q, r, cast(count(*) as bigint) AS n FROM cells GROUP BY q, r),
disk1 AS (SELECT * FROM (VALUES {disk_rows}) AS t(dq, dr)),
nk AS (
  SELECT o.q, o.r, cast(sum(c.n) as int) AS n_kring
  FROM cnt o JOIN disk1 d ON true
  JOIN cnt c ON c.q = o.q + d.dq AND c.r = o.r + d.dr
  GROUP BY o.q, o.r
)
SELECT cl.doc_id, cl.q, cl.r, nk.n_kring
FROM cells cl JOIN nk ON nk.q = cl.q AND nk.r = cl.r
"""


def q_hotspot_clusters(sf_dir: str):
    """Grid-DBSCAN at the oracle hex resolution: dense cells
    (>= 2 pages) cluster through ring-1 adjacency via the distributed
    connected-components loop; isolated dense cells label themselves
    (ops.hotspot.hotspot_clusters)."""
    from ..kernels import cells as C
    from ..ops.hotspot import hotspot_clusters

    narrow = flagship.narrow_pages(sf_dir)

    def recode(b: pa.Table) -> pa.Table:
        lat = b.column("lat").to_numpy(zero_copy_only=False)
        lon = b.column("lon").to_numpy(zero_copy_only=False)
        cell = C.hex_cell(lat, lon, HEX_ORACLE_RES)
        return pa.table({"hex_c": pa.array(cell, pa.uint64())})

    ds = narrow.select_columns(["lat", "lon"]).map_batches(
        recode, batch_format="pyarrow")
    out = hotspot_clusters(ds, cell_col="hex_c", min_count=2, k_ring=1)

    def unpack(b: pa.Table) -> pa.Table:
        _, q, r = C.hex_unpack(b.column("hex_c").to_numpy(zero_copy_only=False))
        return pa.table({"q": pa.array(q), "r": pa.array(r),
                         "n": b.column("n").cast(pa.int64()),
                         "cluster_id": b.column("cluster_id").cast(pa.int64())})

    return out.map_batches(unpack, batch_format="pyarrow")


def sql_hotspot_clusters() -> str:
    from ..kernels import cells as C

    offs = [o for o in C.hex_disk_offsets(1) if not (o[0] == 0 and o[1] == 0)]
    ring_rows = ", ".join(f"({int(dq)},{int(dr)})" for dq, dr in offs)
    prefix = _sql_hex_cte_prefix()
    prefix = prefix[: prefix.index(",\nocc AS")]
    prefix = prefix.replace("WITH pages AS", "WITH RECURSIVE pages AS", 1)
    pk1 = _sql_hex_pack(HEX_ORACLE_RES, "d1.q", "d1.r")
    pk2 = _sql_hex_pack(HEX_ORACLE_RES, "d2.q", "d2.r")
    pkd = _sql_hex_pack(HEX_ORACLE_RES, "d.q", "d.r")
    return prefix + f""",
cnt AS (SELECT q, r, count(*) AS n FROM cells GROUP BY q, r),
dense AS (SELECT q, r, n FROM cnt WHERE n >= 2),
ring1 AS (SELECT * FROM (VALUES {ring_rows}) AS t(dq, dr)),
e AS (
  SELECT cast({pk1} as bigint) AS u, cast({pk2} as bigint) AS v
  FROM dense d1 JOIN ring1 o ON true
  JOIN dense d2 ON d2.q = d1.q + o.dq AND d2.r = d1.r + o.dr
),
edges AS (SELECT u, v FROM e
          UNION SELECT v, u FROM e
          UNION SELECT cast({pkd} as bigint), cast({pkd} as bigint) FROM dense d),
reach(src, node) AS (
  SELECT u, u FROM edges
  UNION
  SELECT r.src, e2.v FROM reach r JOIN edges e2 ON e2.u = r.node
),
lab AS (SELECT src, min(node) AS cluster_id FROM reach GROUP BY src)
SELECT d.q, d.r, cast(d.n as bigint) AS n,
       cast(l.cluster_id as bigint) AS cluster_id
FROM dense d JOIN lab l ON l.src = cast({pkd} as bigint)
"""


def _sql_hex_pack(res: int, q: str = "q", r: str = "r") -> str:
    """SQL expression packing axial (q, r) into the engine's uint64
    cell id: [4b res | 28b q+bias | 28b r+bias] (kernels/cells.py
    hex_pack, bias 2^27)."""
    return (f"cast(({res} * 72057594037927936 + ({q} + 134217728) * 268435456"
            f" + ({r} + 134217728)) as ubigint)")


def sql_hex_background() -> str:
    """Full-resolution (res-7) hex k-ring background oracle — the
    north-star per-pixel kernel checked against DuckDB END-TO-END at
    the engine's actual grid resolution (not just the coarse ladder)."""
    from ..kernels import cells as C

    return _sql_hex_cte_prefix(C.HEX_DEFAULT_RES) + f"""
SELECT {_sql_hex_pack(C.HEX_DEFAULT_RES)} AS cell,
       bg1_median, bg1_mad, bg1_n, bg2_median, bg2_mad, bg2_n
FROM bgagg
"""


def sql_hex_detect() -> str:
    """Full-resolution per-page hex contextual classification oracle."""
    from ..kernels import cells as C

    return _sql_hex_cte_prefix(C.HEX_DEFAULT_RES) + f"""
SELECT c.doc_id,
       {_sql_hex_pack(C.HEX_DEFAULT_RES, "c.q", "c.r")} AS hex_r7,
       c.n_chars,
       CASE WHEN b.bg1_n >= 10 THEN b.bg1_median ELSE b.bg2_median END AS bg_median,
       CASE WHEN b.bg1_n >= 10 THEN b.bg1_mad    ELSE b.bg2_mad    END AS bg_mad,
       CASE WHEN b.bg1_n >= 10 THEN b.bg1_n      ELSE b.bg2_n      END AS bg_n,
       cast(CASE WHEN b.bg1_n >= 10 THEN 1 ELSE 2 END as int) AS win_ring,
       (c.n_chars - CASE WHEN b.bg1_n >= 10 THEN b.bg1_median ELSE b.bg2_median END)
         / (1.4826 * (CASE WHEN b.bg1_n >= 10 THEN b.bg1_mad ELSE b.bg2_mad END) + 1e-9)
         AS score,
       cast(CASE
         WHEN (CASE WHEN b.bg1_n >= 10 THEN b.bg1_n ELSE b.bg2_n END) < 10 THEN 0
         WHEN (c.n_chars - CASE WHEN b.bg1_n >= 10 THEN b.bg1_median ELSE b.bg2_median END)
              / (1.4826 * (CASE WHEN b.bg1_n >= 10 THEN b.bg1_mad ELSE b.bg2_mad END) + 1e-9)
              >= 6.0 THEN 2
         WHEN (c.n_chars - CASE WHEN b.bg1_n >= 10 THEN b.bg1_median ELSE b.bg2_median END)
              / (1.4826 * (CASE WHEN b.bg1_n >= 10 THEN b.bg1_mad ELSE b.bg2_mad END) + 1e-9)
              >= 3.0 THEN 1
         ELSE 0 END as int) AS status
FROM cells c JOIN bgagg b ON b.q = c.q AND b.r = c.r
"""


def q_hex_detect_coarse(sf_dir: str):
    """Per-page hex contextual classification at the oracle resolution
    — the north-star per-pixel kernel (hex bg via halo exchange ->
    own-cell k-ring robust-z) promoted to a full SQL oracle."""
    from ..kernels import cells as C
    from ..ops.background import background_stats_hex
    from ..ops.detect import contextual_detect_hex

    narrow = flagship.narrow_pages(sf_dir)

    def recode(b: pa.Table) -> pa.Table:
        lat = b.column("lat").to_numpy(zero_copy_only=False)
        lon = b.column("lon").to_numpy(zero_copy_only=False)
        cell = C.hex_cell(lat, lon, HEX_ORACLE_RES)
        return pa.table({"doc_id": b.column("doc_id"),
                         "hex_c": pa.array(cell, pa.uint64()),
                         "n_chars": b.column("n_chars")})

    ds = narrow.select_columns(["doc_id", "lat", "lon", "n_chars"]).map_batches(
        recode, batch_format="pyarrow").materialize()
    bg = background_stats_hex(ds, "n_chars", cell_col="hex_c")
    out = contextual_detect_hex(ds, bg, "n_chars", cell_col="hex_c")

    def unpack(b: pa.Table) -> pa.Table:
        _, q, r = C.hex_unpack(b.column("hex_c").to_numpy(zero_copy_only=False))
        t = pa.table({"doc_id": b.column("doc_id"),
                      "q": pa.array(q), "r": pa.array(r),
                      "n_chars": b.column("n_chars")})
        for c in ("bg_median", "bg_mad", "bg_n", "win_ring", "score", "status"):
            t = t.append_column(c, b.column(c))
        return t

    return out.map_batches(unpack, batch_format="pyarrow")


def sql_hex_detect_coarse() -> str:
    return _sql_hex_cte_prefix() + """
SELECT c.doc_id, c.q, c.r, c.n_chars,
       CASE WHEN b.bg1_n >= 10 THEN b.bg1_median ELSE b.bg2_median END AS bg_median,
       CASE WHEN b.bg1_n >= 10 THEN b.bg1_mad    ELSE b.bg2_mad    END AS bg_mad,
       CASE WHEN b.bg1_n >= 10 THEN b.bg1_n      ELSE b.bg2_n      END AS bg_n,
       cast(CASE WHEN b.bg1_n >= 10 THEN 1 ELSE 2 END as int) AS win_ring,
       (c.n_chars - CASE WHEN b.bg1_n >= 10 THEN b.bg1_median ELSE b.bg2_median END)
         / (1.4826 * (CASE WHEN b.bg1_n >= 10 THEN b.bg1_mad ELSE b.bg2_mad END) + 1e-9)
         AS score,
       cast(CASE
         WHEN (CASE WHEN b.bg1_n >= 10 THEN b.bg1_n ELSE b.bg2_n END) < 10 THEN 0
         WHEN (c.n_chars - CASE WHEN b.bg1_n >= 10 THEN b.bg1_median ELSE b.bg2_median END)
              / (1.4826 * (CASE WHEN b.bg1_n >= 10 THEN b.bg1_mad ELSE b.bg2_mad END) + 1e-9)
              >= 6.0 THEN 2
         WHEN (c.n_chars - CASE WHEN b.bg1_n >= 10 THEN b.bg1_median ELSE b.bg2_median END)
              / (1.4826 * (CASE WHEN b.bg1_n >= 10 THEN b.bg1_mad ELSE b.bg2_mad END) + 1e-9)
              >= 3.0 THEN 1
         ELSE 0 END as int) AS status
FROM cells c JOIN bgagg b ON b.q = c.q AND b.r = c.r
"""


def q_hex_detect(sf_dir: str):
    """Per-page anomaly classification against the FINE hex-grid
    background (north_star per-pixel kernel end-to-end: hex bg via
    halo exchange -> per-row robust-z against the own-cell k-ring)."""
    from ..ops.background import background_stats_hex
    from ..ops.detect import contextual_detect_hex

    narrow = flagship.narrow_pages(sf_dir).materialize()
    bg = background_stats_hex(narrow, "n_chars")
    out = contextual_detect_hex(narrow, bg, "n_chars")
    return out.select_columns(["doc_id", "hex_r7", "n_chars", "bg_median", "bg_mad",
                               "bg_n", "win_ring", "score", "status"])


def q_fingerprints(sf_dir: str):
    rd = _rd()
    from ..ops.text import fingerprint_op

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return fingerprint_op(ds).select_columns(["doc_id", "fingerprint", "simhash"])


def q_estimate(sf_dir: str):
    """Per-tile estimate summary.  Means are rounded half-up to 6
    decimals: distributed vs single-threaded summation orders differ
    at ~1 ulp, which would perturb the oracle compare's value-sorted
    row order (the established rounded-column pattern)."""
    from .estimate import estimate_pipeline, summarize

    df = summarize(estimate_pipeline(sf_dir)).to_pandas()
    for c in ("mean_p", "mean_t"):
        df[c] = _round_half_up(df[c].to_numpy() * 1e6) / 1e6
    return df


def q_media_features(sf_dir: str):
    from ..ops.multimodal import decode_media, synth_media

    out = decode_media(synth_media(sf_dir))
    return out.select_columns(["media_id", "kind", "feat_mean", "decode_ok"])


def q_media_decode_real(sf_dir: str):
    """REAL media decode (no media libraries): P6 images, PCM16 WAV,
    and RVID raw video synthesized with spec-conformant encoders, then
    decoded + feature-extracted by RawMediaDecoder; plus a corrupt
    payload class exercising the decode-QA flag."""
    from ..ops.multimodal import RawMediaDecoder, decode_media, synth_media_raw

    parts = [synth_media_raw(sf_dir, kind=k) for k in ("image", "audio", "video")]
    ds = parts[0].union(*parts[1:])
    out = decode_media(ds, decoder=RawMediaDecoder)
    return out.select_columns(["media_id", "kind", "feat_mean", "decode_ok"])


def q_media_frames_real(sf_dir: str):
    """RVID video -> seek-decoded sampled frames re-encoded as P6 ->
    RawMediaDecoder features per frame (the full real media pipeline:
    container -> frame sampling -> per-frame decode)."""
    from ..ops.multimodal import (RawMediaDecoder, decode_media, frame_sample,
                                  synth_media_raw)

    frames = frame_sample(synth_media_raw(sf_dir, kind="video"), every_k=2,
                          max_frames=6)

    def as_media(b: pa.Table) -> pa.Table:
        return pa.table({"media_id": b.column("media_id"),
                         "kind": b.column("kind"),
                         "frame_index": b.column("frame_index"),
                         "payload": b.column("frame_payload")})

    out = decode_media(frames.map_batches(as_media, batch_format="pyarrow"),
                       decoder=RawMediaDecoder)
    return out.select_columns(["media_id", "frame_index", "feat_mean", "decode_ok"])


def q_estimate_posteriors(sf_dir: str):
    """Estimator with posterior traces -> per-row 95% HDI + mode
    (MCBEF post_processing analog; trace lives with the row, no
    shuffle)."""
    from ..ops.score import score_op, summarize_posteriors

    ds = flagship.narrow_pages(sf_dir)
    scored = score_op(ds, emit_trace=True)
    return summarize_posteriors(scored).select_columns(
        ["doc_id", "est_t", "est_qa", "est_t_hdi_lo", "est_t_hdi_hi", "est_t_mode"]
    )


def q_media_frames(sf_dir: str):
    """Video frame-sampling plumbing: media rows expand to sampled
    frame rows (deterministic byte-slice frames; codec-shaped
    flat_map).  Payload emitted hex-encoded so the byte-slice
    arithmetic is SQL-oracle-comparable."""
    import binascii

    from ..ops.multimodal import frame_sample, synth_media

    frames = frame_sample(synth_media(sf_dir, kind="video"), every_k=3, max_frames=9)

    def hexed(b: pa.Table) -> pa.Table:
        hx = [binascii.hexlify(v or b"").decode() for v in
              b.column("frame_payload").to_pylist()]
        return (b.drop_columns(["frame_payload"])
                .append_column("frame_hex", pa.array(hx, pa.string())))

    return frames.map_batches(hexed, batch_format="pyarrow")


def sql_media_frames() -> str:
    """SQL mirror of the byte-slice frame sampler: n_frames =
    min(9, max(1, bytes//256)), indices 0,3,6, frame = 256-byte blob
    substring, hex-encoded."""
    pages = P.sql_pages_cte()
    return f"""
WITH pages AS ({pages}),
media AS (
  SELECT doc_id AS media_id, cast(coalesce(text, '') as blob) AS payload
  FROM pages
),
sized AS (
  SELECT media_id, payload,
         least(9, greatest(1, octet_length(payload) // 256)) AS n_frames
  FROM media
),
fi AS (SELECT * FROM (VALUES (0), (3), (6)) AS t(frame_index))
SELECT s.media_id, 'video' AS kind, cast(f.frame_index as int) AS frame_index,
       -- DuckDB substring has no BLOB overload: slice the hex string
       -- instead (byte [a, b) == hex chars [2a, 2b))
       substring(lower(hex(s.payload)), f.frame_index * 512 + 1, 512) AS frame_hex
FROM sized s JOIN fi f ON f.frame_index < s.n_frames
"""


def q_score(sf_dir: str):
    from ..ops.score import score_op

    ds = flagship.narrow_pages(sf_dir)
    return score_op(ds).select_columns(["doc_id", "est_p", "est_t", "est_qa"])


def _sql_score_cte() -> str:
    """Shared CTE chain for the estimator oracles: pages -> observed
    (mtl, validity) -> 64x64 grid -> per-row argmin fit.  The grid
    argmin becomes a cross join with row_number ordered by (err, flat
    index) — np.argmin's first-of-ties rule; grid values reproduce
    np.linspace bit-for-bit (i*step + start; endpoint forced)."""
    pages = P.sql_pages_cte()
    step_p = (0.95 - 0.05) / 63
    step_t = (12.0 - 2.0) / 63
    return f"""
WITH pages AS ({pages}),
obs AS (
  SELECT doc_id,
         cast(length(text) as double) AS n_chars,
         cast(array_length(string_split(text, ' ')) as double) AS n_tokens
  FROM pages
),
m AS (
  SELECT doc_id, n_chars, n_tokens,
         (n_tokens > 0 AND n_chars > 0) AS valid,
         CASE WHEN n_tokens > 0 AND n_chars > 0
              THEN (n_chars - greatest(n_tokens - 1, 0)) / greatest(n_tokens, 1)
              ELSE NULL END AS mtl
  FROM obs
),
grid AS (
  -- every literal cast to DOUBLE: DuckDB parses bare decimal literals
  -- as DECIMAL and a pure-literal expression stays in decimal
  -- arithmetic, which breaks bit-exactness vs numpy float64
  SELECT pi.i AS pi, ti.i AS ti,
         CASE WHEN pi.i = 63 THEN cast(0.95 as double)
              ELSE cast(0.05 as double) + pi.i * cast({step_p!r} as double)
         END AS p,
         CASE WHEN ti.i = 63 THEN cast(12.0 as double)
              ELSE cast(2.0 as double) + ti.i * cast({step_t!r} as double)
         END AS t
  FROM range(64) pi(i) CROSS JOIN range(64) ti(i)
),
bip AS (SELECT doc_id, mtl FROM m WHERE valid AND n_tokens >= 20),
fit AS (
  SELECT doc_id, p, t, err FROM (
    SELECT b.doc_id, g.p, g.t,
           (g.p * g.t + (1.0 - g.p) * 4.0 - b.mtl)
             * (g.p * g.t + (1.0 - g.p) * 4.0 - b.mtl) AS err,
           row_number() OVER (
             PARTITION BY b.doc_id
             ORDER BY (g.p * g.t + (1.0 - g.p) * 4.0 - b.mtl)
                      * (g.p * g.t + (1.0 - g.p) * 4.0 - b.mtl) ASC,
                      g.pi * 64 + g.ti ASC) AS rn
    FROM bip b CROSS JOIN grid g
  ) WHERE rn = 1
),
est AS (
  SELECT m.doc_id, m.n_chars, m.n_tokens, m.valid, m.mtl,
         CASE WHEN NOT m.valid THEN NULL
              WHEN m.n_tokens >= 20 THEN (CASE WHEN f.err < 4.0 THEN f.p ELSE 1.0 END)
              ELSE 1.0 END AS est_p,
         CASE WHEN NOT m.valid THEN NULL
              WHEN m.n_tokens >= 20 THEN (CASE WHEN f.err < 4.0 THEN f.t ELSE m.mtl END)
              ELSE m.mtl END AS est_t,
         cast(CASE WHEN NOT m.valid THEN 3
                   WHEN m.n_tokens >= 20 THEN (CASE WHEN f.err < 4.0 THEN 0 ELSE 2 END)
                   ELSE 1 END as int) AS est_qa
  FROM m LEFT JOIN fit f ON f.doc_id = m.doc_id
)"""


def sql_score() -> str:
    return _sql_score_cte() + """
SELECT doc_id, est_p, est_t, est_qa FROM est
"""


def sql_estimate_posteriors() -> str:
    """SQL mirror of the posterior-trace summaries: the trace is the
    32 likelihood-best grid points by (err, flat index) — deterministic
    since the engine's stable-argsort selection — and the 95% HDI /
    half-sample mode are shortest-window scans over the sorted trace
    (first window on width ties, matching kernels/stats.hdi_bounds)."""
    return _sql_score_cte() + """,
tr AS (
  SELECT b.doc_id, g.t,
         row_number() OVER (
           PARTITION BY b.doc_id
           ORDER BY (g.p * g.t + (1.0 - g.p) * 4.0 - b.mtl)
                    * (g.p * g.t + (1.0 - g.p) * 4.0 - b.mtl) ASC,
                    g.pi * 64 + g.ti ASC) AS rn
  FROM bip b CROSS JOIN grid g
),
arr AS (
  SELECT doc_id, list(t ORDER BY t) AS ts FROM tr WHERE rn <= 32 GROUP BY doc_id
),
w95 AS (
  SELECT a.doc_id, i.i,
         list_extract(a.ts, cast(i.i as int) + 30) - list_extract(a.ts, cast(i.i as int)) AS w
  FROM arr a CROSS JOIN range(1, 3) i(i)
),
h95 AS (
  SELECT doc_id, i FROM (
    SELECT doc_id, i, row_number() OVER (PARTITION BY doc_id ORDER BY w ASC, i ASC) AS rn
    FROM w95) WHERE rn = 1
),
w50 AS (
  SELECT a.doc_id, i.i,
         list_extract(a.ts, cast(i.i as int) + 15) - list_extract(a.ts, cast(i.i as int)) AS w
  FROM arr a CROSS JOIN range(1, 18) i(i)
),
h50 AS (
  SELECT doc_id, i FROM (
    SELECT doc_id, i, row_number() OVER (PARTITION BY doc_id ORDER BY w ASC, i ASC) AS rn
    FROM w50) WHERE rn = 1
),
post AS (
  SELECT a.doc_id,
         list_extract(a.ts, cast(h95.i as int)) AS g_lo,
         list_extract(a.ts, cast(h95.i as int) + 30) AS g_hi,
         (list_extract(a.ts, cast(h50.i as int))
          + list_extract(a.ts, cast(h50.i as int) + 15)) / 2.0 AS g_mode
  FROM arr a
  JOIN h95 ON h95.doc_id = a.doc_id
  JOIN h50 ON h50.doc_id = a.doc_id
)
SELECT e.doc_id, e.est_t, e.est_qa,
       CASE WHEN e.est_qa = 0 THEN p.g_lo ELSE e.est_t END AS est_t_hdi_lo,
       CASE WHEN e.est_qa = 0 THEN p.g_hi ELSE e.est_t END AS est_t_hdi_hi,
       CASE WHEN e.est_qa = 0 THEN p.g_mode ELSE e.est_t END AS est_t_mode
FROM est e LEFT JOIN post p ON p.doc_id = e.doc_id
"""


def sql_estimate_summary() -> str:
    """SQL mirror of the per-tile estimate summary: the mirrored
    estimator joined back to the page tiles, grouped by (tile, QA)."""
    return _sql_score_cte() + f""",
tiled2 AS (
  SELECT e.est_qa, e.est_p, e.est_t, {SQL_PC_TILE} AS pc_tile
  FROM est e JOIN pages ON pages.doc_id = e.doc_id
)
SELECT pc_tile, est_qa, cast(count(*) as bigint) AS n,
       round(avg(est_p), 6) AS mean_p, round(avg(est_t), 6) AS mean_t
FROM tiled2 GROUP BY pc_tile, est_qa
"""


def sql_langid() -> str:
    """SQL mirror of the stopword-profile language heuristic
    (kernels/textkit.py lang_id): distinct ASCII-token set intersected
    with each language's stopword list; winner = highest hit count,
    alphabetical on ties, 'und' when no evidence."""
    from ..kernels.textkit import _LANG_PROFILES

    langs = sorted(_LANG_PROFILES)
    hit_cols = ",\n         ".join(
        "len(list_intersect(toks, ["
        + ", ".join(f"'{w}'" for w in sorted(_LANG_PROFILES[lang]))
        + f"])) AS h_{lang}"
        for lang in langs
    )
    mx = "greatest(" + ", ".join(f"h_{lang}" for lang in langs) + ")"
    pick = " ".join(f"WHEN h_{lang} = {mx} THEN '{lang}'" for lang in langs)
    return f"""
WITH toked AS (
  SELECT doc_id,
         list_distinct(regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z]+')) AS toks
  FROM documents
),
hits AS (
  SELECT doc_id,
         {hit_cols}
  FROM toked
)
SELECT doc_id,
       CASE WHEN {mx} = 0 THEN 'und' {pick} ELSE 'und' END AS lang_guess
FROM hits
"""


def sql_estimate_eval() -> str:
    """SQL mirror of evaluate_op (the MCBEF_EVAL analog): re-run the
    fitted forward model, residual = observed mtl - model, eval QA by
    residual magnitude/validity."""
    return _sql_score_cte() + """
SELECT doc_id, est_p, est_t, est_qa,
       CASE WHEN est_qa = 3 THEN NULL
            ELSE est_p * est_t + (1.0 - est_p) * 4.0 END AS model_mtl,
       CASE WHEN est_qa = 3 THEN NULL
            ELSE mtl - (est_p * est_t + (1.0 - est_p) * 4.0) END AS eval_resid,
       cast(CASE WHEN est_qa = 3 THEN 2
                 WHEN abs(mtl - (est_p * est_t + (1.0 - est_p) * 4.0)) <= 2.0 THEN 0
                 ELSE 1 END as int) AS eval_qa
FROM est
"""


def q_estimate_eval(sf_dir: str):
    """Forward-model re-evaluation product QA (MCBEF_EVAL analog,
    MCBEF_EVAL.py:85-134): modeled signal, observed-minus-model
    residual, and eval QA flag per scored row."""
    from ..ops.score import evaluate_op, score_op

    ds = flagship.narrow_pages(sf_dir)
    out = evaluate_op(score_op(ds))
    return out.select_columns(
        ["doc_id", "est_p", "est_t", "est_qa", "model_mtl", "eval_resid", "eval_qa"]
    )


def q_dedup_incremental(sf_dir: str):
    """Incremental exact dedup of a NEW crawl against a PRIOR corpus
    (ops.dedup.dedup_incremental): prior = doc_id%10 < 3, new = the
    rest.  The prior side ships only content hashes; the anti join is
    Bloom-prefiltered so non-colliding new rows never shuffle; the
    within-new dedup is the bounded-bucket first-wins pass."""
    from ..ops.dedup import dedup_incremental

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])

    def part(keep_prior: bool):
        def f(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy()
            mask = (ids % 10 < 3) if keep_prior else (ids % 10 >= 3)
            return b.filter(pa.array(mask))
        return f

    prior = docs.map_batches(part(True), batch_format="pyarrow")
    new = docs.map_batches(part(False), batch_format="pyarrow")
    out = dedup_incremental(new, prior)
    return out.map_batches(
        lambda b: pa.table({"doc_id": b.column("doc_id"),
                            "content_md5": b.column("content_md5")}),
        batch_format="pyarrow")


def sql_dedup_incremental() -> str:
    return """
WITH prior AS (
  SELECT md5(text) AS content_md5 FROM documents
  WHERE doc_id % 10 < 3 AND text IS NOT NULL
),
nw AS (
  SELECT doc_id, md5(text) AS content_md5 FROM documents
  WHERE doc_id % 10 >= 3 AND text IS NOT NULL
),
surv AS (
  SELECT n.* FROM nw n
  WHERE NOT EXISTS (SELECT 1 FROM prior p WHERE p.content_md5 = n.content_md5)
)
SELECT doc_id, content_md5 FROM surv
QUALIFY row_number() OVER (PARTITION BY content_md5 ORDER BY doc_id) = 1
"""


def q_gopher_filter(sf_dir: str):
    """Gopher-style (Rae et al. 2021) document quality rules as a
    keep/reasons-bitmask filter: every signal is ONE vectorized RE2
    count per batch (ops.text.gopher_filter_op), SQL-replicable via
    DuckDB regexp_extract_all lengths (both engines run RE2, so the
    counts are identical by construction)."""
    from ..ops.text import gopher_filter_op

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = gopher_filter_op(ds)

    def clean(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.is_valid(b.column("text")))
        return b.drop_columns(["text"])

    return out.map_batches(clean, batch_format="pyarrow")


def sql_gopher_filter() -> str:
    stop = r"\b(the|be|to|of|and|that|have|with|a|in)\b"
    return f"""
WITH s AS (
  SELECT doc_id,
    cast(len(regexp_extract_all(text, '\\S+')) as bigint) AS n_words,
    cast(length(text) as double)
      - len(regexp_extract_all(text, '\\s')) AS word_chars,
    cast(len(regexp_extract_all(text, '\\S*[A-Za-z]\\S*')) as double) AS n_alpha,
    cast(len(regexp_extract_all(text, '{stop}')) as bigint) AS n_stopwords,
    cast(len(regexp_extract_all(text, chr(10))) as double) + 1.0 AS n_lines,
    cast(len(regexp_extract_all(text, '(?m)\\.\\.\\.$')) as double) AS n_ell,
    cast(len(regexp_extract_all(text, '(?m)^[-*]')) as double) AS n_bul,
    cast(len(regexp_extract_all(text, '#|\\.\\.\\.')) as double) AS n_sym
  FROM documents WHERE text IS NOT NULL
),
m AS (
  SELECT doc_id, n_words, n_stopwords, n_lines, n_ell, n_bul,
    CASE WHEN n_words > 0 THEN word_chars / n_words ELSE 0.0 END AS mean_word_len,
    CASE WHEN n_words > 0 THEN n_sym / n_words ELSE 0.0 END AS symbol_ratio,
    CASE WHEN n_words > 0 THEN n_alpha / n_words ELSE 0.0 END AS alpha_frac,
    n_bul / n_lines AS bullet_frac,
    n_ell / n_lines AS ellipsis_frac
  FROM s
)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
       ellipsis_frac, alpha_frac, n_stopwords,
       cast(
         (CASE WHEN n_words < 50 OR n_words > 100000 THEN 1 ELSE 0 END)
       + (CASE WHEN mean_word_len < 3.0 OR mean_word_len > 10.0 THEN 2 ELSE 0 END)
       + (CASE WHEN symbol_ratio >= 0.1 THEN 4 ELSE 0 END)
       + (CASE WHEN bullet_frac > 0.9 THEN 8 ELSE 0 END)
       + (CASE WHEN ellipsis_frac >= 0.3 THEN 16 ELSE 0 END)
       + (CASE WHEN alpha_frac <= 0.8 THEN 32 ELSE 0 END)
       + (CASE WHEN n_stopwords < 2 THEN 64 ELSE 0 END) as bigint) AS gopher_reasons,
       (CASE WHEN n_words < 50 OR n_words > 100000 THEN 1 ELSE 0 END)
       + (CASE WHEN mean_word_len < 3.0 OR mean_word_len > 10.0 THEN 2 ELSE 0 END)
       + (CASE WHEN symbol_ratio >= 0.1 THEN 4 ELSE 0 END)
       + (CASE WHEN bullet_frac > 0.9 THEN 8 ELSE 0 END)
       + (CASE WHEN ellipsis_frac >= 0.3 THEN 16 ELSE 0 END)
       + (CASE WHEN alpha_frac <= 0.8 THEN 32 ELSE 0 END)
       + (CASE WHEN n_stopwords < 2 THEN 64 ELSE 0 END) = 0 AS gopher_keep
FROM m
"""


def q_char_entropy(sf_dir: str):
    """Shannon character entropy per document (low-entropy spam
    signal): one vectorized unique-run pass per batch
    (kernels.textkit.char_entropy), no shuffle.  SQL mirror: per-char
    unnest + -sum(p*log2(p)).

    Emitted rounded to 9 dp on BOTH sides: the synthetic corpus
    contains distinct docs with byte-identical character histograms,
    and DuckDB's per-group summation order makes such pairs differ in
    the last ulp — which flips their relative order under the driver's
    sort-by-all-columns value hash (found by the sf0.1 sweep; exact at
    any scale after rounding)."""
    from ..kernels.textkit import char_entropy

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        ent = char_entropy(batch.column("text").to_pylist())
        ent = np.round(ent, 9)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "char_entropy": pa.array(ent)})

    return ds.map_batches(f, batch_format="pyarrow")


def sql_char_entropy() -> str:
    return """
WITH chars AS (
  SELECT doc_id, substring(text, cast(i as int), 1) AS ch,
         length(text) AS len
  FROM documents, unnest(range(1, length(text) + 1)) AS t(i)
  WHERE text IS NOT NULL AND length(text) > 0
),
freq AS (
  SELECT doc_id, ch, cast(count(*) as double) AS cnt, any_value(len) AS len
  FROM chars GROUP BY doc_id, ch
),
ent AS (
  SELECT doc_id, -sum((cnt / len) * log2(cnt / len)) AS char_entropy
  FROM freq GROUP BY doc_id
)
SELECT d.doc_id, round(e.char_entropy, 9) AS char_entropy
FROM documents d LEFT JOIN ent e USING(doc_id)
"""


def q_compression_signal(sf_dir: str):
    """zlib compression ratio + char entropy per document (RefinedWeb-
    style template/spam gates).  Rows-only: no SQL zlib exists; the
    kernel is pytest-pinned against direct zlib/Counter references
    (test_compression_signal_matches_zlib)."""
    from ..ops.text import compression_op

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return compression_op(ds).select_columns(
        ["doc_id", "raw_bytes", "zlib_bytes", "zlib_ratio", "char_entropy"])


def q_dup_ngrams(sf_dir: str):
    """Cross-document duplicated-trigram metrics (span-level
    contamination/boilerplate signal): hash-only DF partials over
    within-doc-distinct word trigrams -> bounded groupby -> broadcast
    membership count per doc (ops/text.dup_ngram_stats)."""
    from ..ops.text import dup_ngram_stats

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return dup_ngram_stats(ds, n=3, min_df=2)


def sql_dup_ngrams() -> str:
    return """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         cast(generate_subscripts(string_split(text, ' '), 1) as bigint) AS ord
  FROM documents
),
ng AS (
  SELECT doc_id, ord,
         tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS ngram
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
  QUALIFY lead(tok, 2) OVER w IS NOT NULL
),
df AS (SELECT ngram, count(DISTINCT doc_id) AS df FROM ng GROUP BY ngram),
per AS (
  SELECT n.doc_id, count(*) AS n_ngrams,
         sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS n_dup
  FROM ng n JOIN df f USING (ngram) GROUP BY n.doc_id
)
SELECT d.doc_id,
       cast(coalesce(p.n_ngrams, 0) as bigint) AS n_ngrams,
       cast(coalesce(p.n_dup, 0) as bigint) AS n_dup_ngrams,
       CASE WHEN p.n_ngrams > 0
            THEN cast(p.n_dup as double) / p.n_ngrams END AS dup_ngram_frac
FROM documents d LEFT JOIN per p USING (doc_id)
"""


def q_full_outer_activity(sf_dir: str):
    """FULL OUTER join of two keyed aggregates — per-(user, day) click
    totals vs error totals (days with only one activity kind survive
    with nulls on the other side).  Ray's native full_outer hash join;
    both inputs are already-reduced aggregate tables, so the join
    moves (users x days) rows, never the event stream.

    Value sums are rounded to 9 dp on BOTH sides: distinct (user, day)
    groups can sum to the same total, and engine-vs-DuckDB summation
    order then differs in the last ulp — flipping their relative order
    under the driver's sort-by-all-columns hash (found by the sf0.1
    sweep)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from ..ops import shuffle_partitions

    def side(kind: str, prefix: str):
        ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                                columns=["user_id", "event_type", "ts",
                                         "value"])

        def prep(b: pa.Table) -> pa.Table:
            b = b.filter(pc.equal(b.column("event_type"), kind))
            return pa.table({
                "user_id": b.column("user_id"),
                "day": pc.floor_temporal(b.column("ts"), unit="day"),
                "value": b.column("value"),
            })

        agg = (ds.map_batches(prep, batch_format="pyarrow")
               .groupby(["user_id", "day"],
                        num_partitions=shuffle_partitions())
               .aggregate(Sum("value", alias_name=f"{prefix}_value"),
                          Count(alias_name=f"n_{prefix}s")))
        return agg.map_batches(
            lambda b, p=prefix: pa.table({
                "user_id": b.column("user_id"),
                "day": b.column("day"),
                f"{p}_value": pa.array(np.round(
                    b.column(f"{p}_value").to_numpy(zero_copy_only=False), 9)),
                f"n_{p}s": b.column(f"n_{p}s").cast(pa.int64()),
            }), batch_format="pyarrow")

    clicks, errors = side("click", "click"), side("error", "error")
    return clicks.join(errors, join_type="full_outer",
                       num_partitions=shuffle_partitions(),
                       on=("user_id", "day"))


def sql_full_outer_activity() -> str:
    return """
WITH c AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         round(sum(value), 9) AS click_value,
         cast(count(*) as bigint) AS n_clicks
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
),
e AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         round(sum(value), 9) AS error_value,
         cast(count(*) as bigint) AS n_errors
  FROM events WHERE event_type = 'error' GROUP BY 1, 2
)
SELECT coalesce(c.user_id, e.user_id) AS user_id,
       coalesce(c.day, e.day) AS day,
       c.click_value, c.n_clicks, e.error_value, e.n_errors
FROM c FULL JOIN e ON c.user_id = e.user_id AND c.day = e.day
"""


def q_schema_evolution(sf_dir: str):
    """Union-by-name read over Parquet files with DRIFTED schemas:
    generation A carries (doc_id, text, n_chars), generation B
    (doc_id, lang, n_chars); the unified stream fills each side's
    missing column with typed nulls (sources.read_parquet_unify, one
    footer read per file, no shuffle).  The two generations are
    written deterministically from the documents table so the oracle
    is a pure CASE projection."""
    import os
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..sources import read_parquet_unify

    tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text", "lang", "n_chars"])
    d = _scratch_dir("schevo_", sf_dir)
    ga = tbl.filter(pc.less(tbl.column("doc_id"), 250)).select(
        ["doc_id", "text", "n_chars"])
    gb = tbl.filter(pc.greater_equal(tbl.column("doc_id"), 250)).select(
        ["doc_id", "lang", "n_chars"])
    pq.write_table(ga, os.path.join(d, "gen_a.parquet"))
    pq.write_table(gb, os.path.join(d, "gen_b.parquet"))
    return read_parquet_unify([os.path.join(d, "gen_a.parquet"),
                               os.path.join(d, "gen_b.parquet")])


def sql_schema_evolution() -> str:
    return """
SELECT doc_id,
       CASE WHEN doc_id < 250 THEN text END AS text,
       CASE WHEN doc_id >= 250 THEN lang END AS lang,
       n_chars
FROM documents
"""


def q_dup_span_removal(sf_dir: str):
    """C4-style duplicated-span removal: every token covered by a
    cross-document duplicated trigram is dropped, survivors reassemble
    in order (ops/text.remove_dup_spans — shared DF pass with
    dup_ngrams, broadcast dup set, vectorized binary_join
    reassembly)."""
    from ..ops.text import remove_dup_spans

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return remove_dup_spans(ds, n=3, min_df=2)


def sql_dup_span_removal() -> str:
    return """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         cast(generate_subscripts(string_split(text, ' '), 1) as bigint) AS ord
  FROM documents
),
ng AS (
  SELECT doc_id, ord,
         tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS ngram
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
  QUALIFY lead(tok, 2) OVER w IS NOT NULL
),
df AS (SELECT ngram, count(DISTINCT doc_id) AS df FROM ng GROUP BY ngram),
dup_pos AS (
  SELECT n.doc_id, n.ord FROM ng n JOIN df f USING (ngram) WHERE f.df >= 2
),
covered AS (
  SELECT DISTINCT t.doc_id, t.ord
  FROM toks t JOIN dup_pos d
    ON t.doc_id = d.doc_id AND t.ord BETWEEN d.ord AND d.ord + 2
),
kept AS (
  SELECT t.doc_id, t.tok, t.ord
  FROM toks t ANTI JOIN covered c
    ON t.doc_id = c.doc_id AND t.ord = c.ord
),
agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY ord) AS text_clean,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, count(*) AS n_segs FROM toks GROUP BY doc_id)
SELECT d.doc_id, coalesce(a.text_clean, '') AS text_clean,
       cast(t.n_segs - coalesce(a.n_kept, 0) as bigint) AS n_removed
FROM documents d LEFT JOIN agg a USING (doc_id) LEFT JOIN tot t USING (doc_id)
"""


def q_ngram_top20(sf_dir: str):
    """Corpus phrase mining: top-20 word trigrams by count.  N-gram
    strings built vectorized (split + shifted binary_join_element_wise,
    row-boundary masked), dict partials pre-aggregate before the
    bounded groupby, streaming top-k merge (ops/text.ngram_count)."""
    from ..ops.text import ngram_count

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["text"])
    return ngram_count(ds, n=3, top_k=20)


def sql_ngram_top20() -> str:
    return """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         cast(generate_subscripts(string_split(text, ' '), 1) as bigint) AS ord
  FROM documents
),
ng AS (
  SELECT tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS ngram
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
  QUALIFY lead(tok, 2) OVER w IS NOT NULL
)
SELECT ngram, cast(count(*) as bigint) AS n
FROM ng GROUP BY ngram
ORDER BY n DESC, ngram ASC
LIMIT 20
"""


def q_robust_scale(sf_dir: str):
    """Per-group robust feature scaling: z = (x - group_median) /
    group_MAD.  The per-group stats come from the exact histogram-
    partial median/MAD aggregate (rows never shuffle), then the tiny
    (groups x 3) stats table broadcasts back onto the row stream —
    the canonical normalize-by-group-statistics feature-engineering
    shape."""
    import pyarrow.compute as pc

    from ..ops import stats_agg as SA
    from ..ops.relational import broadcast_join

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"])
    stats = SA.grouped_median_exact(
        ds.select_columns(["l_returnflag", "l_quantity"]),
        group_col="l_returnflag", value_col="l_quantity")
    small = pa.concat_tables(list(stats.iter_batches(batch_format="pyarrow",
                                                     batch_size=None)))
    joined = broadcast_join(ds, small, on="l_returnflag")

    def z(b: pa.Table) -> pa.Table:
        q = b.column("l_quantity").cast(pa.float64())
        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "l_linenumber": b.column("l_linenumber"),
            "l_returnflag": b.column("l_returnflag"),
            "l_quantity": b.column("l_quantity"),
            "robust_z": pc.divide(pc.subtract(q, b.column("median_v")),
                                  b.column("mad_v")),
        })

    return joined.map_batches(z, batch_format="pyarrow")


def sql_robust_scale() -> str:
    return """
WITH m AS (
  SELECT l_returnflag, median(l_quantity) AS med, mad(l_quantity) AS md
  FROM lineitem GROUP BY 1
)
SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, l.l_quantity,
       (l.l_quantity - m.med) / m.md AS robust_z
FROM lineitem l JOIN m USING (l_returnflag)
"""


def q_extract_links(sf_dir: str):
    """REAL HTML outlink extraction vs a never-parsing oracle (the
    url_canonicalize pattern): pages with 1 + doc_id%3 anchors are
    synthesized as a pure function of doc_id, the engine string-
    PARSES them (two vectorized split_pattern passes — Arrow has no
    extract-all kernel), and the SQL derives the expected link set
    from the arithmetic directly.  Any extractor bug = value
    mismatch."""
    from ..ops.text import extract_links

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        pages = []
        for d in ids:
            d = int(d)
            anchors = "".join(
                f'<li><a href="https://host{(d * 7 + j) % 500:04d}'
                f'.example.com/doc/{d * 31 + j}">link {j}</a></li>'
                for j in range(1 + d % 3))
            pages.append(f"<html><body><ul>{anchors}</ul></body></html>")
        return pa.table({"doc_id": batch.column("doc_id"),
                         "html": pa.array([p.encode() for p in pages],
                                          pa.binary())})

    return extract_links(ds.map_batches(synth, batch_format="pyarrow"))


def sql_extract_links() -> str:
    return """
SELECT doc_id, cast(j as bigint) AS link_ord,
       'https://host' || lpad(cast((doc_id * 7 + j) % 500 as varchar), 4, '0')
         || '.example.com/doc/' || cast(doc_id * 31 + j as varchar) AS href
FROM documents, unnest(range(0, 1 + doc_id % 3)) AS t(j)
"""


def q_host_indegree(sf_dir: str):
    """Crawl-graph in-degree: extracted outlinks -> target host (one
    RE2 extract per batch) -> count partials -> bounded groupby ->
    top-20 hosts.  The engine PARSES hrefs; the oracle counts the
    arithmetic residues without parsing."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ..ops import shuffle_partitions
    from ..ops.background import HIST_BATCH_ROWS

    links = q_extract_links(sf_dir)

    def host_partial(b: pa.Table) -> pa.Table:
        h = pc.extract_regex(b.column("href"), r"^https://(?P<host>[^/]+)/")
        host = pc.struct_field(h, "host")
        vc = host.combine_chunks().value_counts() if isinstance(
            host, pa.ChunkedArray) else host.value_counts()
        return pa.table({"host": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    merged = (links.map_batches(host_partial, batch_format="pyarrow",
                                batch_size=HIST_BATCH_ROWS)
              .groupby("host", num_partitions=shuffle_partitions())
              .aggregate(Sum("n", alias_name="n")))

    def topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(["n", "host"],
                                       ascending=[False, True],
                                       kind="mergesort").head(20)
        return pa.Table.from_pandas(df, preserve_index=False)

    df = (merged.map_batches(
        lambda b: pa.table({"host": b.column("host"),
                            "n": b.column("n").cast(pa.int64())}),
        batch_format="pyarrow")
        .map_batches(topk, batch_format="pyarrow").to_pandas())
    df = df.sort_values(["n", "host"], ascending=[False, True],
                        kind="mergesort").head(20)
    return pa.Table.from_pandas(df.reset_index(drop=True),
                                preserve_index=False)


def sql_host_indegree() -> str:
    return """
SELECT 'host' || lpad(cast((doc_id * 7 + j) % 500 as varchar), 4, '0')
         || '.example.com' AS host,
       cast(count(*) as bigint) AS n
FROM documents, unnest(range(0, 1 + doc_id % 3)) AS t(j)
GROUP BY 1
ORDER BY n DESC, host ASC
LIMIT 20
"""


def q_pagerank_hosts(sf_dir: str):
    """Crawl-graph PageRank over host->host link edges (source host =
    the page's own host, targets from the synthetic anchor arithmetic;
    ops/graph.pagerank — tagged-union merge iterations, ranks never
    driver-resident).  Full SQL oracle (sql_pagerank_hosts): the
    fixed-iteration power iteration is expressed as 5 chained CTEs in
    DuckDB, each carrying (node, rank) — same dangling-mass handling,
    same per-edge multiplicity.  Returns the COMPLETE rank table (no
    top-k: a float-rank selection boundary would make cross-engine
    membership fragile; the driver's sorted-hash compare handles the
    full set exactly).  Also pinned against numpy power iteration
    (test_pagerank_matches_numpy)."""
    from ..ops.graph import pagerank
    from ..sources.pages import host_id_of

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])

    def edges_of(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        k = (1 + (ids % 3)).astype(np.int64)
        rep_ids = np.repeat(ids, k)
        src = np.repeat(host_id_of(ids), k)
        off = np.arange(len(rep_ids)) - np.repeat(
            np.r_[0, np.cumsum(k)][:-1], k)
        dst = (rep_ids * 7 + off) % 500
        return pa.table({"src": pa.array(src.astype(np.int64)),
                         "dst": pa.array(dst.astype(np.int64))})

    e = ds.map_batches(edges_of, batch_format="pyarrow")
    ranks = pagerank(e, iters=5)
    return ranks


def sql_pagerank_hosts() -> str:
    """Fixed-iteration (5) PageRank as chained CTEs — same semantics
    as ops/graph.pagerank: nodes = distinct endpoints, outdeg counts
    parallel edges, rank' = (1-d)/N + d*dangling/N + d*sum(rank/outdeg
    over in-edges), dangling mass from the PRE-update ranks of
    outdeg-0 nodes."""
    from ..sources.pages import sql_host_id

    d = 0.85
    parts = [f"""
WITH edges AS (
  SELECT {sql_host_id('doc_id')} AS src,
         cast((doc_id * 7 + j) % 500 AS bigint) AS dst
  FROM documents, unnest(range(0, 1 + doc_id % 3)) AS t(j)
), nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
), deg AS (
  SELECT n.node, cast(coalesce(c.cnt, 0) AS bigint) AS outdeg
  FROM nodes n LEFT JOIN (
    SELECT src AS node, count(*) AS cnt FROM edges GROUP BY src) c
  ON n.node = c.node
), nn AS (
  SELECT cast(count(*) AS double) AS n FROM nodes
), r0 AS (
  SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes
)"""]
    for it in range(1, 6):
        p, c = f"r{it - 1}", f"r{it}"
        parts.append(f""", {c} AS (
  SELECT dg.node,
         (1.0 - {d}) / (SELECT n FROM nn)
         + {d} * (SELECT coalesce(sum(p.rank), 0)
                  FROM {p} p JOIN deg g ON p.node = g.node
                  WHERE g.outdeg = 0) / (SELECT n FROM nn)
         + {d} * coalesce(s.insum, 0) AS rank
  FROM deg dg LEFT JOIN (
    SELECT e.dst AS node, sum(p.rank / g.outdeg) AS insum
    FROM edges e
    JOIN {p} p ON p.node = e.src
    JOIN deg g ON g.node = e.src
    GROUP BY e.dst) s ON dg.node = s.node
)""")
    parts.append("\nSELECT node, rank FROM r5")
    return "".join(parts)


def q_warc_roundtrip(sf_dir: str):
    """WARC archive round-trip: the synthesized page table is written
    as member-per-record .warc.gz archives (sources.warc, ISO 28500
    from scratch, one gzip member per record like real Common Crawl),
    read back (one read task per archive), and the html payload is
    re-extracted to text — byte-identical per url, proven against the
    SQL pages CTE that never touches WARC."""
    import pyarrow.compute as pc

    from ..kernels.textkit import extract_text_arrow
    from ..sources.pages import read_pages
    from ..sources.warc import read_warc, write_warc

    pages = read_pages(sf_dir)
    # read back from the sink's manifest so a retried sink task's
    # orphan shard can never duplicate rows
    d = _scratch_dir("warcq_", sf_dir)
    files = write_warc(pages, d)
    back = read_warc(files)

    def extract(b: pa.Table) -> pa.Table:
        return pa.table({
            "url": b.column("url"),
            "warc_ts": b.column("warc_ts"),
            "text": extract_text_arrow(b.column("html")),
        })

    return back.map_batches(extract, batch_format="pyarrow")


def sql_warc_roundtrip() -> str:
    from ..sources.pages import sql_pages_cte

    return f"""
WITH pages AS ({sql_pages_cte()})
SELECT url, warc_ts, coalesce(text, '') AS text FROM pages
"""


def q_jsonl_roundtrip(sf_dir: str):
    """JSONL archive round-trip: the page table is written as sharded
    ``.jsonl.gz`` (sources.jsonl — one file per block, distributed
    sink), read back (one Arrow NDJSON parse per file), and compared
    byte-identically per url against the SQL pages CTE that never
    touches JSONL.  Timestamps travel as epoch-us integers so the
    round-trip is exact (no locale formatting)."""
    import pyarrow.compute as pc

    from ..sources.jsonl import read_jsonl, write_jsonl
    from ..sources.pages import read_pages

    pages = read_pages(sf_dir)

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table({
            "url": pc.cast(b.column("url"), pa.string()),
            "ts_us": b.column("warc_ts").cast(pa.timestamp("us")).cast(pa.int64()),
            "text": pc.cast(b.column("text"), pa.string()),
            "lang": pc.cast(b.column("lang"), pa.string()),
        })

    d = _scratch_dir("jsonlq_", sf_dir)
    files = write_jsonl(pages.map_batches(narrow, batch_format="pyarrow"), d)
    back = read_jsonl(files)

    def out(b: pa.Table) -> pa.Table:
        return pa.table({
            "url": pc.cast(b.column("url"), pa.string()),
            "warc_ts": b.column("ts_us").cast(pa.timestamp("us")),
            "text": pc.cast(b.column("text"), pa.string()),
            "lang": pc.cast(b.column("lang"), pa.string()),
        })

    return back.map_batches(out, batch_format="pyarrow")


def sql_jsonl_roundtrip() -> str:
    from ..sources.pages import sql_pages_cte

    return f"""
WITH pages AS ({sql_pages_cte()})
SELECT url, warc_ts, text, lang FROM pages
"""


def q_funnel_sessions(sf_dir: str):
    """Session funnel (view -> click -> purchase in strict temporal
    order within a 30-min-gap session): per-user session and
    conversion counts (ops/temporal.session_funnel — one bucketed
    shuffle, masked reduceat chain per step)."""
    from ..ops.temporal import session_funnel

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type"])
    out = session_funnel(ds, key_col="user_id", ts_col="ts",
                         type_col="event_type",
                         steps=("view", "click", "purchase"), gap_s=1800)
    return out.map_batches(
        lambda b: pa.table({"user_id": b.column("user_id").cast(pa.int64()),
                            "n_sessions": b.column("n_sessions").cast(pa.int64()),
                            "n_converted": b.column("n_converted").cast(pa.int64())}),
        batch_format="pyarrow")


def sql_funnel_sessions() -> str:
    return """
WITH o AS (
  SELECT user_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts, event_type,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sess
  FROM o
),
t1 AS (SELECT user_id, sess, min(ts) AS t FROM s
       WHERE event_type = 'view' GROUP BY 1, 2),
t2 AS (SELECT s.user_id, s.sess, min(s.ts) AS t
       FROM s JOIN t1 ON s.user_id = t1.user_id AND s.sess = t1.sess
       WHERE s.event_type = 'click' AND s.ts > t1.t GROUP BY 1, 2),
t3 AS (SELECT s.user_id, s.sess, min(s.ts) AS t
       FROM s JOIN t2 ON s.user_id = t2.user_id AND s.sess = t2.sess
       WHERE s.event_type = 'purchase' AND s.ts > t2.t GROUP BY 1, 2),
per AS (
  SELECT user_id, count(DISTINCT sess) AS n_sessions FROM s GROUP BY 1
),
conv AS (SELECT user_id, cast(count(*) as bigint) AS n_converted
         FROM t3 GROUP BY 1)
SELECT p.user_id, cast(p.n_sessions as bigint) AS n_sessions,
       cast(coalesce(c.n_converted, 0) as bigint) AS n_converted
FROM per p LEFT JOIN conv c USING (user_id)
"""


WS_SCALE = 0.001  # weighted-sample scale (engine + oracle)


def q_weighted_sample(sf_dir: str):
    """Quality-weighted importance sampling (data mixing): keep doc
    with probability min(1, scale * n_chars) via the deterministic
    key-hash Bernoulli — repartition/resume-stable, no shuffle
    (ops/sample.weighted_sample)."""
    from ..ops.sample import weighted_sample

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "n_chars"])
    return weighted_sample(ds, "doc_id", "n_chars", scale=WS_SCALE, seed=3)


def sql_weighted_sample() -> str:
    from ..ops.sample import sql_hash_uniform

    u = sql_hash_uniform("doc_id", 3)
    return f"""
SELECT doc_id, n_chars FROM documents
WHERE {u} < least(1.0, {WS_SCALE} * n_chars)
"""


PACK_BUDGET = 2048  # token budget per packed bin (engine + oracle)


def q_pack_sequences(sf_dir: str):
    """Training-batch sequence packing: documents in doc_id order fill
    fixed token-budget bins, bin = floor(exclusive-prefix-tokens /
    budget) — deterministic start-offset packing.  The global running
    sum reuses the chunked running_aggregate machinery with a constant
    key (one key's chunks spread across hash buckets by design — the
    mega-key path IS the global-cumsum path)."""
    import pyarrow.compute as pc

    from ..ops import shuffle_partitions
    from ..ops.relational import hash_join

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def tok(b: pa.Table) -> pa.Table:
        lst = pc.split_pattern(
            pc.fill_null(b.column("text").cast(pa.string()), ""), " ")
        return pa.table({
            "doc_id": b.column("doc_id"),
            "k0": pa.array(np.zeros(len(b), dtype=np.int64)),
            "n_tokens": pc.list_value_length(lst).cast(pa.int64()),
        })

    t = ds.map_batches(tok, batch_format="pyarrow")
    r = temporal.running_aggregate(t, key_col="k0", ts_col="doc_id",
                                   tie_col="doc_id", value_col="n_tokens",
                                   time_chunk_us=4096)
    cum = r.map_batches(
        lambda b: pa.table({"doc_id": b.column("tie"),
                            "cum": b.column("running_sum")}),
        batch_format="pyarrow")
    j = hash_join(cum, t.select_columns(["doc_id", "n_tokens"]),
                  on="doc_id", num_partitions=shuffle_partitions())
    return j.map_batches(
        lambda b: pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": b.column("n_tokens"),
            "bin": pc.divide(pc.subtract(b.column("cum"),
                                         b.column("n_tokens")),
                             PACK_BUDGET).cast(pa.int64()),
        }), batch_format="pyarrow")


def sql_pack_sequences() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, cast(len(string_split(text, ' ')) as bigint) AS n_tokens
  FROM documents
),
r AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id) AS cum
  FROM t
)
SELECT doc_id, n_tokens,
       cast((cum - n_tokens) // {PACK_BUDGET} as bigint) AS bin
FROM r
"""


DECON_IDS = (3, 77, 123, 250, 444)  # probe source docs (engine + oracle)


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: probe snippets = substring(text, 5,
    24) of five fixed docs; every document containing any probe is
    flagged.  Probes broadcast once; one vectorized substring scan per
    probe per batch (ops/text.decontaminate) — documents never
    shuffle."""
    import pyarrow.parquet as pq

    from ..ops.text import decontaminate

    tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"],
                        filters=[("doc_id", "in", list(DECON_IDS))])
    probes = [t[4:28] for t in tbl.column("text").to_pylist()
              if t is not None and len(t) >= 28]
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return decontaminate(ds, probes).select_columns(["doc_id", "contaminated"])


def sql_decontaminate() -> str:
    ids = ", ".join(map(str, DECON_IDS))
    return f"""
WITH probes AS (
  SELECT substring(text, 5, 24) AS s FROM documents
  WHERE doc_id IN ({ids}) AND length(text) >= 28
)
SELECT d.doc_id,
       EXISTS (SELECT 1 FROM probes p WHERE contains(d.text, p.s))
         AS contaminated
FROM documents d
"""


SEG_PRUNE_FRAC = 0.5  # df threshold fraction shared by engine + oracle


def q_segment_prune(sf_dir: str):
    """Cross-document frequent-segment removal (CCNet/C4-style
    paragraph dedup; here at token granularity for this corpus): drop
    every segment occurring in >= ceil(0.5 * n_docs) distinct docs,
    preserving surviving-segment order.  Engine: hash-only DF partials
    -> bounded groupby -> broadcast-or-join gather (auto), docs never
    shuffle in broadcast mode (ops/text.remove_frequent_segments)."""
    from ..ops.text import remove_frequent_segments

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return remove_frequent_segments(ds, delimiter=" ", min_df=2,
                                    max_df_frac=SEG_PRUNE_FRAC)


def sql_segment_prune() -> str:
    return f"""
WITH segs AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS seg,
         cast(generate_subscripts(string_split(text, ' '), 1) as bigint) AS ord
  FROM documents
),
df AS (SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY seg),
freq AS (SELECT seg FROM df
         WHERE df >= greatest(2, cast(ceil({SEG_PRUNE_FRAC} *
                       (SELECT count(*) FROM documents)) as bigint))),
kept AS (SELECT s.doc_id, s.seg, s.ord
         FROM segs s ANTI JOIN freq f ON s.seg = f.seg),
agg AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY ord) AS text_clean,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id, count(*) AS n_segs FROM segs GROUP BY doc_id)
SELECT d.doc_id, coalesce(a.text_clean, '') AS text_clean,
       cast(t.n_segs - coalesce(a.n_kept, 0) as bigint) AS n_removed
FROM documents d LEFT JOIN agg a USING(doc_id) LEFT JOIN tot t USING(doc_id)
"""


def q_url_canonicalize(sf_dir: str):
    """REAL URL parsing vs a first-principles oracle: messy URLs
    (mixed-case scheme/host, default + explicit ports, tracking
    params, fragments, empty paths, multi-label ccTLD suffixes) are
    synthesized as a pure function of (doc_id, host_id) — then the
    engine string-PARSES them with kernels.urlkit (one RE2
    extract_regex per batch, offsets-math registered domain,
    selective per-row param sort) while the SQL oracle derives the
    expected components directly from the residues, never parsing.
    Any parser bug surfaces as a value mismatch."""
    from ..ops.text import url_parse_op
    from ..sources.pages import host_id_of

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def messy(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        host = host_id_of(ids)
        out = np.empty(len(ids), dtype=object)
        for i, d in enumerate(ids):
            d = int(d)
            scheme = ("HTTP", "https", "http")[d % 3]
            www = "WWW." if d % 5 == 0 else ""
            suffix = (".Example.COM", ".Sample.CO.UK", ".Data.NET")[int(host[i]) % 3]
            port = ""
            if d % 7 == 0:
                port = ":443" if d % 3 == 1 else ":80"
            elif d % 7 == 1:
                port = ":8080"
            path = "" if d % 11 == 0 else f"/articles/{d % 13}"
            query = ("", "?utm_source=feed&b=2&a=1", "?b=2&a=1",
                     "?a=1&utm_campaign=x")[d % 4]
            frag = f"#s{d % 3}" if d % 2 == 1 else ""
            out[i] = f"{scheme}://{www}Host{int(host[i])}{suffix}{port}{path}{query}{frag}"
        return pa.table({"doc_id": batch.column("doc_id"),
                         "url": pa.array(out.tolist(), pa.string())})

    parsed = url_parse_op(ds.map_batches(messy, batch_format="pyarrow"))

    def clean(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "scheme": b.column("scheme"),
            "host": b.column("host"),
            "port": b.column("port").cast(pa.float64()),
            "path": b.column("path"),
            "query_canon": b.column("query_canon"),
            "n_params": b.column("n_params").cast(pa.int64()),
            "reg_domain": b.column("reg_domain"),
            "url_canon": b.column("url_canon"),
        })

    return parsed.map_batches(clean, batch_format="pyarrow")


def sql_url_canonicalize() -> str:
    host_id = P.sql_host_id("doc_id")
    return f"""
WITH h AS (SELECT doc_id, {host_id} AS host_id FROM documents),
c AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 1 THEN 'https' ELSE 'http' END AS scheme,
    (CASE WHEN doc_id % 5 = 0 THEN 'www.' ELSE '' END)
      || 'host' || cast(host_id AS varchar)
      || (CASE host_id % 3 WHEN 0 THEN '.example.com'
          WHEN 1 THEN '.sample.co.uk' ELSE '.data.net' END) AS host,
    CASE WHEN doc_id % 7 = 1 THEN cast(8080 AS double) END AS port,
    CASE WHEN doc_id % 11 = 0 THEN '/'
         ELSE '/articles/' || cast(doc_id % 13 AS varchar) END AS path,
    CASE doc_id % 4 WHEN 0 THEN '' WHEN 3 THEN 'a=1' ELSE 'a=1&b=2' END AS query_canon,
    cast(CASE doc_id % 4 WHEN 0 THEN 0 WHEN 3 THEN 1 ELSE 2 END AS bigint) AS n_params,
    CASE host_id % 3 WHEN 0 THEN 'example.com'
         WHEN 1 THEN 'sample.co.uk' ELSE 'data.net' END AS reg_domain
  FROM h
)
SELECT *,
  scheme || '://' || host
    || coalesce(':' || cast(cast(port AS int) AS varchar), '')
    || path
    || (CASE WHEN query_canon <> '' THEN '?' || query_canon ELSE '' END) AS url_canon
FROM c
"""


def q_prefix_dup_editdist(sf_dir: str):
    """Prefix-candidate near-dup pairs verified by EXACT Levenshtein
    distance (ops.dedup.edit_distance_pairs): stage 1 shuffles only
    (prefix-hash, doc_id) rows into bounded buckets; stage 2 attaches
    texts (broadcast under the measured-pair-count cap, hash joins
    above it) and scores every pair in ONE vectorized DP across the
    batch (kernels.textkit.levenshtein_batch — prefix-min closed form
    for the insertion chain, so work is max|a| numpy row steps
    regardless of pair count)."""
    from ..ops.dedup import edit_distance_pairs

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])
    return edit_distance_pairs(docs, prefix_len=30)


def sql_prefix_dup_editdist() -> str:
    return """
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       levenshtein(a.text, b.text) AS edit_dist
FROM documents a JOIN documents b
  ON substr(a.text, 1, 30) = substr(b.text, 1, 30)
 AND a.doc_id < b.doc_id
"""


QUERIES = {
    "flagship_detect": q_flagship,
    "prefix_dup_editdist": q_prefix_dup_editdist,
    "url_canonicalize": q_url_canonicalize,
    "gopher_filter": q_gopher_filter,
    "segment_prune": q_segment_prune,
    "char_entropy": q_char_entropy,
    "dup_ngrams": q_dup_ngrams,
    "dup_span_removal": q_dup_span_removal,
    "pack_sequences": q_pack_sequences,
    "weighted_sample": q_weighted_sample,
    "funnel_sessions": q_funnel_sessions,
    "hopping_distinct_users": q_hopping_distinct,
    "decayed_user_value": q_decayed_value,
    "group_centroids": q_group_centroids,
    "centroid_distance": q_centroid_distance,
    "label_margin": q_label_margin,
    "ngram_top20": q_ngram_top20,
    "robust_scale": q_robust_scale,
    "extract_links": q_extract_links,
    "host_indegree": q_host_indegree,
    "warc_roundtrip": q_warc_roundtrip,
    "jsonl_roundtrip": q_jsonl_roundtrip,
    "cap_per_host": q_cap_per_host,
    "unigram_logprob": q_unigram_logprob,
    "pagerank_hosts": q_pagerank_hosts,
    "decontaminate": q_decontaminate,
    "full_outer_activity": q_full_outer_activity,
    "schema_evolution": q_schema_evolution,
    "dedup_incremental": q_dedup_incremental,
    "geocode_tiles": q_geocode,
    "bbox_query": q_bbox_query,
    "radius_join": q_radius_join,
    "nearest_site": q_nearest_site,
    "extract_invariant": q_extract,
    "quality_features": q_quality,
    "dedup_exact": q_dedup,
    "tile_counts": q_tile_counts,
    "climatology_host": q_climatology,
    "window_events": q_window_events,
    "asof_events": q_asof,
    "topk_orders": q_topk_orders,
    "join_revenue": q_join_revenue,
    "semi_lineitem": q_semi,
    "anti_lineitem": q_anti,
    "bloom_semi_lineitem": q_bloom_semi,
    "bloom_anti_lineitem": q_bloom_anti,
    "heavy_hitter_users": q_heavy_hitters,
    "user_value_quantiles": q_user_value_quantiles,
    "trimmed_mean_quantity": q_trimmed,
    "low_quantile_price": q_low_quantile,
    "pricing_summary": q_pricing,
    "embedding_topk": q_embed_topk,
    "salted_host_counts": q_salted_host_counts,
    "tile_rollup": q_tile_rollup,
    "resample_hosts": q_resample_hosts,
    "vector_stats": q_vector_stats,
    "hash_sample_split": q_hash_sample,
    "stratified_sample_lang": q_stratified,
    "vocab_top20": q_vocab,
    "tfidf_top_terms": q_tfidf,
    "graph_components": q_graph_components,
    "custdist_left_join": q_custdist,
    "rank_orders": q_rank_orders,
    "pivot_events": q_pivot_events,
    "running_totals": q_running_totals,
    "moving_avg_events": q_moving_avg,
    "range_window_sum": q_range_window,
    "lag_events": q_lag_events,
    "count_distinct_users": q_count_distinct,
    "corr_qty_discount": q_corr_qty_discount,
    "median_quantity_by_flag": q_median_quantity,
    "quantiles_quantity": q_quantiles_quantity,
    "first_last_value": q_first_last_value,
    "argmax_events": q_argmax_events,
    "rollup_revenue": q_rollup_revenue,
    "pushdown_high_value": q_pushdown_high_value,
    "revenue_share": q_revenue_share,
    "returned_revenue_top20": q_returned_revenue,
    "cube_revenue": q_cube_revenue,
    "grouping_sets_revenue": q_grouping_sets_revenue,
    "dedup_keep_newest": q_dedup_keep_newest,
    "intersect_users": q_intersect_users,
    "except_custkeys": q_except_custkeys,
    "line_repetition": q_line_repetition,
    "mode_event_type": q_mode_event_type,
    "salted_join_events": q_salted_join_events,
    "normalize_text": q_normalize_text,
    "scrub_pii": q_scrub_pii,
    "explode_embeddings": q_explode_embeddings,
    "user_journeys": q_user_journeys,
    "json_props": q_json_props,
    "curation_pipeline": q_curation_pipeline,
    "asof_forward": q_asof_forward,
    "sessionize_events": q_sessionize,
    "candidate_union": q_candidate_union,
    "top_anomalies": q_top_anomalies,
    "range_join_windows": q_range_join,
    "hopping_window_agg": q_hopping_agg,
    "window_user_value": q_window_user_value,
    "hex_tile_stats": q_hex_tile_stats,
    "hex_detect_coarse": q_hex_detect_coarse,
    "knn_hotspots_coarse": q_knn_hotspots_coarse,
    "hotspot_clusters": q_hotspot_clusters,
    # rows-only (non-SQL-expressible; covered by pytest goldens/oracles)
    "cells_hex_s2": q_cells,
    "pip_biome": q_pip_biome,
    "minhash_neardup_pairs": q_minhash,
    "neardup_verified": q_neardup_verified,
    "neardup_clusters": q_neardup_clusters,
    "neardup_filtered": q_neardup_filtered,
    "simhash_neardup_pairs": q_simhash,
    "knn_hotspots": q_knn_hotspots,
    "ann_lsh_topk": q_ann_lsh,
    "embedding_neardup_pairs": q_embedding_neardup,
    "ivf_topk": q_ivf_topk,
    "kmeans_clusters": q_kmeans_clusters,
    "bpe_tokenize": q_bpe_tokenize,
    "pq_topk": q_pq_topk,
    "compression_signal": q_compression_signal,
    "langid": q_langid,
    "estimator_score": q_score,
    "estimate_eval": q_estimate_eval,
    "estimate_posteriors": q_estimate_posteriors,
    "media_features": q_media_features,
    "media_decode_real": q_media_decode_real,
    "media_frames_real": q_media_frames_real,
    "media_frames": q_media_frames,
    "fingerprints": q_fingerprints,
    "estimate_summary": q_estimate,
    "hex_background": q_hex_background,
    "hex_detect": q_hex_detect,
}

ORACLES = {
    "flagship_detect": sql_flagship(),
    "geocode_tiles": sql_geocode(),
    "bbox_query": sql_bbox_query(),
    "radius_join": sql_radius_join(),
    "nearest_site": sql_nearest_site(),
    "extract_invariant": sql_extract(),
    "quality_features": sql_quality(),
    "dedup_exact": sql_dedup(),
    "prefix_dup_editdist": sql_prefix_dup_editdist(),
    "url_canonicalize": sql_url_canonicalize(),
    "gopher_filter": sql_gopher_filter(),
    "segment_prune": sql_segment_prune(),
    "char_entropy": sql_char_entropy(),
    "dup_ngrams": sql_dup_ngrams(),
    "dup_span_removal": sql_dup_span_removal(),
    "pack_sequences": sql_pack_sequences(),
    "weighted_sample": sql_weighted_sample(),
    "funnel_sessions": sql_funnel_sessions(),
    "hopping_distinct_users": sql_hopping_distinct(),
    "decayed_user_value": sql_decayed_value(),
    "group_centroids": sql_group_centroids(),
    "centroid_distance": sql_centroid_distance(),
    "label_margin": sql_label_margin(),
    "ngram_top20": sql_ngram_top20(),
    "robust_scale": sql_robust_scale(),
    "extract_links": sql_extract_links(),
    "host_indegree": sql_host_indegree(),
    "pagerank_hosts": sql_pagerank_hosts(),
    "warc_roundtrip": sql_warc_roundtrip(),
    "jsonl_roundtrip": sql_jsonl_roundtrip(),
    "cap_per_host": sql_cap_per_host(),
    "unigram_logprob": sql_unigram_logprob(),
    "decontaminate": sql_decontaminate(),
    "full_outer_activity": sql_full_outer_activity(),
    "schema_evolution": sql_schema_evolution(),
    "dedup_incremental": sql_dedup_incremental(),
    "tile_counts": sql_tile_counts(),
    "climatology_host": sql_climatology(),
    "window_events": sql_window_events(),
    "asof_events": sql_asof(),
    "topk_orders": sql_topk_orders(),
    "join_revenue": sql_join_revenue(),
    "semi_lineitem": sql_semi(),
    "anti_lineitem": sql_anti(),
    "bloom_semi_lineitem": sql_bloom_semi(),
    "bloom_anti_lineitem": sql_bloom_anti(),
    "heavy_hitter_users": sql_heavy_hitters(),
    "user_value_quantiles": sql_user_value_quantiles(),
    "trimmed_mean_quantity": sql_trimmed(),
    "low_quantile_price": sql_low_quantile(),
    "pricing_summary": sql_pricing(),
    "embedding_topk": sql_embed_topk(),
    "salted_host_counts": sql_salted_host_counts(),
    "tile_rollup": sql_tile_rollup(),
    "resample_hosts": sql_resample_hosts(),
    "vector_stats": sql_vector_stats(),
    "hash_sample_split": sql_hash_sample(),
    "stratified_sample_lang": sql_stratified(),
    "vocab_top20": sql_vocab(),
    "tfidf_top_terms": sql_tfidf(),
    "graph_components": sql_graph_components(),
    "custdist_left_join": sql_custdist(),
    "rank_orders": sql_rank_orders(),
    "pivot_events": sql_pivot_events(),
    "running_totals": sql_running_totals(),
    "moving_avg_events": sql_moving_avg(),
    "range_window_sum": sql_range_window(),
    "lag_events": sql_lag_events(),
    "count_distinct_users": sql_count_distinct(),
    "corr_qty_discount": sql_corr_qty_discount(),
    "median_quantity_by_flag": sql_median_quantity(),
    "quantiles_quantity": sql_quantiles_quantity(),
    "first_last_value": sql_first_last_value(),
    "argmax_events": sql_argmax_events(),
    "rollup_revenue": sql_rollup_revenue(),
    "pushdown_high_value": sql_pushdown_high_value(),
    "revenue_share": sql_revenue_share(),
    "returned_revenue_top20": sql_returned_revenue(),
    "cube_revenue": sql_cube_revenue(),
    "grouping_sets_revenue": sql_grouping_sets_revenue(),
    "dedup_keep_newest": sql_dedup_keep_newest(),
    "intersect_users": sql_intersect_users(),
    "except_custkeys": sql_except_custkeys(),
    "line_repetition": sql_line_repetition(),
    "mode_event_type": sql_mode_event_type(),
    "salted_join_events": sql_salted_join_events(),
    "normalize_text": sql_normalize_text(),
    "scrub_pii": sql_scrub_pii(),
    "explode_embeddings": sql_explode_embeddings(),
    "user_journeys": sql_user_journeys(),
    "json_props": sql_json_props(),
    "curation_pipeline": sql_curation_pipeline(),
    "asof_forward": sql_asof_forward(),
    "sessionize_events": sql_sessionize(),
    "candidate_union": sql_candidate_union(),
    "top_anomalies": sql_top_anomalies(),
    "range_join_windows": sql_range_join(),
    "hopping_window_agg": sql_hopping_agg(),
    "window_user_value": sql_window_user_value(),
    "hex_tile_stats": sql_hex_tile_stats(),
    "hex_detect_coarse": sql_hex_detect_coarse(),
    "knn_hotspots_coarse": sql_knn_hotspots_coarse(),
    "hotspot_clusters": sql_hotspot_clusters(),
    "estimator_score": sql_score(),
    "estimate_eval": sql_estimate_eval(),
    "langid": sql_langid(),
    "hex_background": sql_hex_background(),
    "hex_detect": sql_hex_detect(),
    "pip_biome": sql_pip_biome(),
    "cells_hex_s2": sql_cells(),
    "knn_hotspots": sql_knn_hotspots(),
    "media_frames": sql_media_frames(),
    "estimate_posteriors": sql_estimate_posteriors(),
    "estimate_summary": sql_estimate_summary(),
}
