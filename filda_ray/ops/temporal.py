"""Temporal operators: as-of join, tumbling windows, climatology.

Reference analogs:
- nearest-period static layer selection (8-day effective DOY,
  MCBEF_IO.py:210; default-year fallback FILDA.py:1605-1609) — an
  as-of join in time (SURVEY.md §2.9): implemented with per-key
  ``pd.merge_asof`` inside co-partitioned groups.
- overpass quantization to 6-minute intervals (MCBEF_IO.py:72-81) —
  ``time_bucket``.
- NTL climatology: 90-day stack -> per-cell mean/std/gamma
  (FILDA_NTL.py:152-277) — ``climatology``: partial moment vectors
  inside map_batches, then ONE small groupby over partials (the
  partial+final combinable-sums design the survey calls for in §3.3).
"""

from __future__ import annotations

import numpy as np

from filda_ray.ops import shuffle_partitions
import pandas as pd
import pyarrow as pa

from ..kernels.stats import moment_finalize


def _seg_bounds(*cols):
    """Segment structure of equal consecutive tuples over pre-sorted
    parallel arrays: (boundary mask, per-row segment id, segment start
    indices).  The vectorized spine of every bucketed window op."""
    n = len(cols[0])
    new = np.zeros(n, np.bool_)
    new[0] = True
    for a in cols:
        new[1:] |= a[1:] != a[:-1]
    seg_id = np.cumsum(new) - 1
    return new, seg_id, np.flatnonzero(new)


def _window_buckets(ds):
    """Bucket count for the bounded-bucket window shuffles.

    Oversample vs the partition count (16x) so no hash partition ends
    up empty: Ray's hash partitioner is ``hash(key_tuple) %
    num_partitions``, and an empty partition emits an empty-schema
    block that trips the executor's schema-divergence warning."""
    from . import derive_buckets

    return max(derive_buckets(ds), 16 * shuffle_partitions())


def _hash_mod(nb: int, *cols) -> np.ndarray:
    """splitmix64-combined bucket id over parallel int64 arrays."""
    from ..kernels.hashing import hash_combine, splitmix64

    h = splitmix64(cols[0].astype(np.uint64))
    for a in cols[1:]:
        h = hash_combine(h, a.astype(np.uint64))
    return (h % np.uint64(nb)).astype(np.int32)


def time_bucket(ts_us: np.ndarray, bucket_s: int) -> np.ndarray:
    """Floor-quantize microsecond timestamps to bucket starts (us).

    SQL mirror: ``to_timestamp(floor(epoch(ts)/B)*B)`` /
    ``time_bucket(INTERVAL, ts)``."""
    b = np.int64(bucket_s) * 1_000_000
    return (np.asarray(ts_us, dtype=np.int64) // b) * b


def bucket_op(ds, ts_col: str, bucket_s: int, out_col: str = "bucket_ts"):
    def f(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy()
        return batch.append_column(
            out_col, pa.array(time_bucket(ts, bucket_s), pa.timestamp("us"))
        )

    return ds.map_batches(f, batch_format="pyarrow")


def asof_join(left, right, *, on: str, by: str, num_buckets: int | None = None,
              right_cols: list[str] | None = None, direction: str = "backward",
              time_chunk_us: int | None = None):
    """As-of join: for each left row, latest right row with
    right.on <= left.on (within the same ``by`` key).

    Both sides are hash-bucketed on ``by`` (co-partitioning), unioned,
    and each group sorts once and runs ``pd.merge_asof`` — the
    portable partitioned as-of pattern.

    Scale: a bare key-hash bucketing materializes 1/num_buckets of
    BOTH sides per task — unbounded working set at 100-TB inputs.  Two
    levers, composable:

    - ``num_buckets``: defaults to bytes-proportional
      (``derive_buckets`` over both sides; results are bucket-count
      invariant, tested).
    - ``time_chunk_us``: co-partition by (key-hash, time chunk) so a
      group holds only one chunk's rows.  Boundary handling: the last
      right row of each (key, chunk) is CARRIED into every later chunk
      up to the next chunk where that key has rights (and to the final
      left chunk for the last one), so a left row early in a chunk
      still sees the latest right from earlier chunks.  Carry volume
      <= keys x chunks; only ``direction='backward'`` is supported in
      chunked mode.  Reference analog: nearest-period static-layer
      selection (MCBEF_IO.py:210) generalized.
    """
    if num_buckets is None:
        from . import derive_buckets

        num_buckets = max(derive_buckets(ds, default=16) for ds in (left, right))
    lcols = left.schema().names
    rkeep = [by, on] + [c for c in (right_cols or []) if c not in (by, on)]
    payload = [c for c in rkeep if c not in (by, on)]

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            return batch.append_column("__side", pa.array(np.full(len(batch), side, dtype=np.int8)))

        return f

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.append_column("__bucket", pa.array((k % num_buckets).astype(np.int32)))
        if time_chunk_us is not None:
            ts = batch.column(on).cast(pa.int64()).to_numpy()
            b = b.append_column("__chunk", pa.array(ts // time_chunk_us, type=pa.int64()))
        return b

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        drop = [c for c in ("__bucket", "__chunk") if c in g.columns]
        g = g.drop(columns=drop)
        l = g[g["__side"] == 0].sort_values(on, kind="mergesort")
        r = g[g["__side"] == 1].sort_values(on, kind="mergesort")
        # the union null-fills each side with the other's columns; keep
        # only the true left columns on l and (by, on, payload) on r
        l = l[[c for c in lcols if c in l.columns]]
        keep = [c for c in rkeep if c != by]
        r = r[[by] + keep]
        if len(r) == 0:
            out = l.copy()
            for c in payload:
                out[c] = pd.NA
            return out
        out = pd.merge_asof(
            l, r, on=on, by=by, direction=direction, suffixes=("", "_right")
        )
        return out

    rnarrow = right.select_columns(rkeep)
    if time_chunk_us is None:
        both = left.map_batches(tag(0), batch_format="pyarrow").union(
            rnarrow.map_batches(tag(1), batch_format="pyarrow")
        ).map_batches(add_bucket, batch_format="pyarrow")
        return both.groupby("__bucket", num_partitions=shuffle_partitions()).map_groups(merge, batch_format="pandas")

    assert direction == "backward", "chunked as-of supports backward only"
    # global max left chunk (one pruned pass over the narrow ts column)
    def _maxp(b: pa.Table) -> pa.Table:
        ts = b.column(on).cast(pa.int64()).to_numpy()
        m = int(ts.max()) if len(ts) else np.iinfo(np.int64).min
        return pa.table({"m": pa.array([m], pa.int64())})

    mx = left.select_columns([on]).map_batches(_maxp, batch_format="pyarrow").to_pandas()
    max_chunk = int(mx["m"].max()) // time_chunk_us if len(mx) else 0

    def rlast_partial(b: pa.Table) -> pa.Table:
        """Per-batch last row per (key, chunk) — shrinks the carry
        shuffle to <= (keys x chunks) rows."""
        if len(b) == 0:
            return b
        k = b.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = b.column(on).cast(pa.int64()).to_numpy()
        ch = ts // time_chunk_us
        order = np.lexsort((ts, ch, k))
        ko, co = k[order], ch[order]
        is_last = np.r_[(ko[1:] != ko[:-1]) | (co[1:] != co[:-1]), True]
        return b.take(pa.array(order[is_last]))

    def carry_emit(g: pd.DataFrame) -> pd.DataFrame:
        """Bucket group of last-per-(key,chunk) rows -> carry copies
        into (c_i, c_{i+1}] (and (c_last, max_chunk] for the last)."""
        k = g[by].to_numpy().astype(np.int64)
        if np.issubdtype(g[on].to_numpy().dtype, np.datetime64):
            ts = g[on].to_numpy().astype("datetime64[us]").astype(np.int64)
        else:
            ts = g[on].to_numpy().astype(np.int64)
        ch = ts // time_chunk_us
        order = np.lexsort((ts, ch, k))
        g = g.iloc[order].reset_index(drop=True)
        k, ch = k[order], ch[order]
        # true last per (key, chunk) after cross-batch merge
        is_last = np.r_[(k[1:] != k[:-1]) | (ch[1:] != ch[:-1]), True]
        g, k, ch = g[is_last].reset_index(drop=True), k[is_last], ch[is_last]
        same_key = np.r_[k[1:] == k[:-1], False]
        nxt = np.r_[ch[1:], 0]
        hi = np.where(same_key, nxt, max_chunk) + 1      # exclusive
        lo = ch + 1
        reps = np.maximum(hi - lo, 0).astype(np.int64)
        tot = int(reps.sum())
        if tot == 0:
            out = g.iloc[:0].copy()
            out["__chunk"] = pd.Series(dtype=np.int64)
            return out.drop(columns=["__bucket"])
        cc = np.arange(tot) - np.repeat(np.cumsum(reps) - reps, reps) + np.repeat(lo, reps)
        out = g.iloc[np.repeat(np.arange(len(g)), reps)].reset_index(drop=True)
        out = out.drop(columns=["__bucket"])
        out["__chunk"] = cc
        return out

    def rbucket(b: pa.Table) -> pa.Table:
        k = b.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column("__bucket", pa.array((k % num_buckets).astype(np.int32)))

    carries = (
        rnarrow.map_batches(rlast_partial, batch_format="pyarrow")
        .map_batches(rbucket, batch_format="pyarrow")
        .groupby("__bucket", num_partitions=shuffle_partitions())
        .map_groups(carry_emit, batch_format="pandas")
    )

    def carry_tag(b: pa.Table) -> pa.Table:
        b = b.append_column("__side", pa.array(np.full(len(b), 1, dtype=np.int8)))
        k = b.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column("__bucket", pa.array((k % num_buckets).astype(np.int32)))

    both = (
        left.map_batches(tag(0), batch_format="pyarrow")
        .union(rnarrow.map_batches(tag(1), batch_format="pyarrow"))
        .map_batches(add_bucket, batch_format="pyarrow")
        .union(carries.map_batches(carry_tag, batch_format="pyarrow"))
    )
    return both.groupby(["__bucket", "__chunk"], num_partitions=shuffle_partitions()).map_groups(merge, batch_format="pandas")


def climatology(ds, *, key_cols: list[str], value_col: str, ts_col: str | None = None,
                bucket_s: int | None = None):
    """Per-key (optionally per time bucket) mean/std/gamma climatology.

    Two-level aggregation: vectorized per-batch partials (sum, sumsq,
    count, sum_log, ...) -> groupby(key).sum over partials ->
    closed-form finalize.  The shuffle moves ONE row per (key, batch),
    not per input row — the survey's A6 scale design.
    """
    if ts_col is not None and bucket_s is not None:
        ds = bucket_op(ds, ts_col, bucket_s)
        key_cols = key_cols + ["bucket_ts"]

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(key_cols + [value_col]).to_pandas()
        v = df[value_col].to_numpy(dtype=np.float64)
        pos = np.where(v > 0, v, np.nan)
        df = df.assign(
            __n=(~np.isnan(v)).astype(np.int64),
            __s=np.nan_to_num(v),
            __ss=np.nan_to_num(v * v),
            __slog=np.nan_to_num(np.log(pos)),
            __npos=(~np.isnan(pos)).astype(np.int64),
        )
        agg = df.groupby(key_cols, as_index=False)[["__n", "__s", "__ss", "__slog", "__npos"]].sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    from .background import HIST_BATCH_ROWS

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=HIST_BATCH_ROWS)
    from ray.data.aggregate import Sum

    merged = partials.groupby(key_cols, num_partitions=shuffle_partitions()).aggregate(
        Sum("__n", alias_name="n"),
        Sum("__s", alias_name="s"),
        Sum("__ss", alias_name="ss"),
        Sum("__slog", alias_name="slog"),
        Sum("__npos", alias_name="npos"),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy().astype(np.float64)
        s = batch.column("s").to_numpy()
        ss = batch.column("ss").to_numpy()
        slog = batch.column("slog").to_numpy()
        npos = batch.column("npos").to_numpy().astype(np.float64)
        out = {k: batch.column(k) for k in key_cols}
        mean = np.where(n > 0, s / np.maximum(n, 1), np.nan)
        var = np.where(n > 1, (ss - n * mean * mean) / np.maximum(n - 1, 1), np.nan)
        std = np.sqrt(np.maximum(var, 0.0))
        # gamma log-moment (FILDA_NTL.py:252-267) on all-positive keys
        g = np.where((npos == n) & (n > 1) & (mean > 0), np.log(mean) - slog / np.maximum(npos, 1), np.nan)
        ok = g > 0
        alpha = np.where(ok, (3.0 - g + np.sqrt((g - 3.0) ** 2 + 24.0 * g)) / (12.0 * g), np.nan)
        beta = np.where(ok, mean / alpha, np.nan)
        out.update(
            {
                "n": pa.array(n.astype(np.int64)),
                "mean": pa.array(mean),
                "std": pa.array(std),
                "alpha": pa.array(alpha),
                "beta": pa.array(beta),
            }
        )
        return pa.table(out)

    return merged.map_batches(finalize, batch_format="pyarrow")


def range_join(events, windows: pa.Table, *, ts_col: str = "ts",
               start_col: str = "start_us", end_col: str = "end_us",
               bucket_s: int = 21600):
    """Interval join: event rows matched to every window with
    start <= ts < end (half-open).

    Scale pattern: windows (the small side) are exploded to every time
    bucket they overlap and broadcast as a per-bucket index; each event
    batch probes only its bucket's windows (vectorized interval test).
    No shuffle of events; window duplication = span / bucket_s.
    Reference analog: nearest/inside-period static-layer selection
    generalized from point (as-of) to interval semantics.
    """
    import ray

    from .workercache import worker_state

    b_us = bucket_s * 1_000_000
    starts = windows.column(start_col).to_numpy().astype(np.int64)
    ends = windows.column(end_col).to_numpy().astype(np.int64)
    wids = windows.column("window_id").to_numpy().astype(np.int64)
    # bucket -> arrays of (start, end, id) for windows overlapping it
    index: dict[int, list] = {}
    for s, e, w in zip(starts, ends, wids):
        for b in range(s // b_us, max(s // b_us, (e - 1) // b_us) + 1):
            index.setdefault(int(b), []).append((s, e, w))
    packed = {b: (np.array([x[0] for x in v], dtype=np.int64),
                  np.array([x[1] for x in v], dtype=np.int64),
                  np.array([x[2] for x in v], dtype=np.int64))
              for b, v in index.items()}
    ref = ray.put(packed)

    def probe(batch: pa.Table) -> pa.Table:
        idx = worker_state(ref, lambda: ray.get(ref))
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy()
        buckets = ts // b_us
        out_rows = []
        out_wid = []
        for b in np.unique(buckets):
            wv = idx.get(int(b))
            if wv is None:
                continue
            m = buckets == b
            rows = np.flatnonzero(m)
            tsb = ts[rows]
            ws, we, wi = wv
            # (events_in_bucket x windows_in_bucket) interval test
            hit = (tsb[:, None] >= ws[None, :]) & (tsb[:, None] < we[None, :])
            r, c = np.nonzero(hit)
            out_rows.append(rows[r])
            out_wid.append(wi[c])
        if not out_rows:
            t = batch.take(pa.array([], pa.int64()))
            return t.append_column("window_id", pa.array([], pa.int64()))
        rows = np.concatenate(out_rows)
        wid = np.concatenate(out_wid)
        order = np.argsort(rows, kind="mergesort")
        t = batch.take(pa.array(rows[order]))
        return t.append_column("window_id", pa.array(wid[order]))

    return events.map_batches(probe, batch_format="pyarrow")


def sessionize(ds, *, key_col: str, ts_col: str, gap_s: int,
               num_buckets: int | None = None):
    """Session-window aggregation per key (gap-based): a new session
    starts when the time since the previous event exceeds ``gap_s``.

    Streaming-shaped op per ray_guide: hash-bucket by key, sort within
    the group, vectorized diff/cumsum — no per-event Python.  Output:
    (key, n_sessions, n_events).  SQL mirror: lag() window + sum of
    new-session flags.  Scale: one group materializes 1/num_buckets of
    the events — ``num_buckets`` defaults to bytes-proportional
    (``derive_buckets``; results are bucket-count invariant, same
    contract as asof_join).
    """
    if num_buckets is None:
        from . import derive_buckets

        num_buckets = derive_buckets(ds, default=16)

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("__bucket", pa.array((k % num_buckets).astype(np.int32)))

    narrow = ds.select_columns([key_col, ts_col]).map_batches(add_bucket, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col], kind="mergesort")
        k = g[key_col].to_numpy()
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_key = np.r_[True, k[1:] != k[:-1]]
        gap = np.r_[0, ts[1:] - ts[:-1]]
        new_session = new_key | (gap > gap_s * 1_000_000)
        df = pd.DataFrame({key_col: k, "__ns": new_session.astype(np.int64)})
        out = df.groupby(key_col, as_index=False).agg(
            n_sessions=("__ns", "sum"), n_events=("__ns", "size")
        )
        return out

    return narrow.groupby("__bucket", num_partitions=shuffle_partitions()).map_groups(per_bucket, batch_format="pandas")


def window_aggregate(ds, *, key_col: str, ts_col: str, value_col: str, bucket_s: int):
    """Tumbling-window sum/count/mean per (key, window) — the engine's
    stream-shaped aggregate (ray_guide 'Streaming-shaped workloads');
    SQL mirror: GROUP BY key, floor(epoch(ts)/B)."""
    b = bucket_op(ds, ts_col, bucket_s)
    from ray.data.aggregate import Count, Mean, Sum

    return b.groupby([key_col, "bucket_ts"], num_partitions=shuffle_partitions()).aggregate(
        Sum(value_col, alias_name="sum_value"),
        Count(alias_name="n"),
        Mean(value_col, alias_name="mean_value"),
    )


def running_aggregate(ds, *, key_col: str, ts_col: str, tie_col: str,
                      value_col: str, time_chunk_us: int = 7 * 86400 * 10**6):
    """Per-key running sum/count ordered by (ts, tie) — SQL
    ``sum(v) OVER (PARTITION BY key ORDER BY ts, tie)`` with a unique
    (ts, tie) order (peers are single rows, so RANGE == ROWS).

    Scale design (same co-partitioning as the chunked as-of join): the
    unit of locality is a (key, time-chunk) — bounded even for a
    mega-key with years of history.  Per-(key, chunk) totals are a
    narrow partial aggregate; their per-key exclusive cumsum (one tiny
    groupby over keys x chunks rows) becomes OFFSET rows that ride the
    SAME main shuffle via a tagged union, so the event data moves
    exactly once.  The final shuffle groups by a BOUNDED hash bucket
    of (key, chunk) — not by (key, chunk) itself — and each bucket is
    ONE vectorized lexsort + segmented-cumsum pass (a per-(key, chunk)
    ``map_groups`` measured 29 cpu-s over ~8k tiny pandas groups at
    sf0.1; the bucketed pass removes the per-group Python overhead).
    Output: (key, tie, ts, running_sum, running_n).
    """
    import pyarrow.compute as pc

    from . import pd_table

    def narrow(b: pa.Table) -> pa.Table:
        ts = b.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({
            "k": b.column(key_col).cast(pa.int64()),
            "c": pc.divide(ts, time_chunk_us),
            "ts_us": ts,
            "tie": b.column(tie_col).cast(pa.int64()),
            "v": b.column(value_col).cast(pa.int64()),
        })

    base = ds.map_batches(narrow, batch_format="pyarrow")

    def tot_partial(b: pa.Table) -> pa.Table:
        g = b.select(["k", "c", "v"]).group_by(["k", "c"]).aggregate(
            [("v", "sum"), ("v", "count")])
        return g.rename_columns(["k", "c", "s", "n"])

    nb = _window_buckets(ds)

    def add_kbucket(b: pa.Table) -> pa.Table:
        k = b.column("k").to_numpy(zero_copy_only=False)
        return b.append_column("kb", pa.array(_hash_mod(nb, k)))

    def excl_cumsum_bucket(g: pd.DataFrame) -> pa.Table:
        """Merge per-batch (key, chunk) partials (reduceat — no
        separate hash-aggregate shuffle) and take each key's exclusive
        cumsum of chunk totals, one segmented pass per bucket."""
        k = g["k"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        s = g["s"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        order = np.lexsort((c, k))
        k, c, s, n = k[order], c[order], s[order], n[order]
        _, _, kc_start = _seg_bounds(k, c)
        k, c = k[kc_start], c[kc_start]
        s = np.add.reduceat(s, kc_start)
        n = np.add.reduceat(n, kc_start)
        _, seg_id, seg_start = _seg_bounds(k)
        cs, cn = np.cumsum(s), np.cumsum(n)
        base_s = np.where(seg_start > 0, cs[seg_start - 1], 0)
        base_n = np.where(seg_start > 0, cn[seg_start - 1], 0)
        z = np.zeros(len(k), dtype=np.int64)
        return pd_table(pd.DataFrame({
            "k": k, "c": c, "ts_us": z, "tie": z, "v": z,
            "off_s": cs - s - base_s[seg_id],
            "off_n": cn - n - base_n[seg_id],
            "is_off": np.full(len(k), 1, dtype=np.int8)}))

    partials = base.map_batches(tot_partial, batch_format="pyarrow",
                                batch_size=65536)
    offsets = partials.map_batches(add_kbucket, batch_format="pyarrow").groupby(
        "kb", num_partitions=shuffle_partitions(nb)).map_groups(
        excl_cumsum_bucket, batch_format="pandas")

    def widen(b: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(len(b), dtype=np.int64))
        return (b.append_column("off_s", z).append_column("off_n", z)
                 .append_column("is_off", pa.array(np.zeros(len(b), dtype=np.int8))))

    def add_bucket(b: pa.Table) -> pa.Table:
        k = b.column("k").to_numpy(zero_copy_only=False)
        c = b.column("c").to_numpy(zero_copy_only=False)
        return b.append_column("bk", pa.array(_hash_mod(nb, k, c)))

    tagged = (base.map_batches(widen, batch_format="pyarrow")
              .union(offsets)
              .map_batches(add_bucket, batch_format="pyarrow"))

    def emit_bucket(g: pd.DataFrame) -> pa.Table:
        d = g[g["is_off"] == 0]
        if not len(d):
            return pd_table(pd.DataFrame({
                "k": [], "tie": [], "ts_us": [],
                "running_sum": [], "running_n": []}).astype(np.int64))
        k = d["k"].to_numpy(np.int64)
        c = d["c"].to_numpy(np.int64)
        ts = d["ts_us"].to_numpy(np.int64)
        tie = d["tie"].to_numpy(np.int64)
        v = d["v"].to_numpy(np.int64)
        order = np.lexsort((tie, ts, c, k))
        k, c, ts, tie, v = k[order], c[order], ts[order], tie[order], v[order]
        _, seg_id, seg_start = _seg_bounds(k, c)
        cs = np.cumsum(v)
        base_ = np.where(seg_start > 0, cs[seg_start - 1], 0)
        run_sum = cs - base_[seg_id]
        run_n = np.arange(len(k), dtype=np.int64) - seg_start[seg_id] + 1
        off = g[g["is_off"] == 1]
        if len(off):
            # one offset row per (k, c) segment; tiny C-level merge
            oa = off.groupby(["k", "c"], as_index=False)[["off_s", "off_n"]].sum()
            seg = pd.DataFrame({"k": k[seg_start], "c": c[seg_start]}).merge(
                oa, on=["k", "c"], how="left")
            os_ = seg["off_s"].fillna(0).to_numpy(np.int64)
            on_ = seg["off_n"].fillna(0).to_numpy(np.int64)
            run_sum = run_sum + os_[seg_id]
            run_n = run_n + on_[seg_id]
        return pd_table(pd.DataFrame({
            "k": k, "tie": tie, "ts_us": ts,
            "running_sum": run_sum, "running_n": run_n}))

    return tagged.groupby("bk", num_partitions=shuffle_partitions(nb)).map_groups(
        emit_bucket, batch_format="pandas")


def moving_aggregate(ds, *, key_col: str, ts_col: str, tie_col: str,
                     value_col: str, window: int,
                     time_chunk_us: int = 7 * 86400 * 10**6):
    """SQL ROWS-frame moving sum/count: ``sum(v) OVER (PARTITION BY
    key ORDER BY ts, tie ROWS BETWEEN window-1 PRECEDING AND CURRENT
    ROW)`` with unique (ts, tie) order.  Output: (key, tie, ts_us, v,
    moving_sum, moving_n); partition-leading rows get the SQL partial
    window (fewer than ``window`` rows).

    Same (key, time-chunk) co-partitioning as ``lag_lead``; the carry
    into each chunk is the key's CUMULATIVE last ``window`` rows over
    all earlier chunks — equal to the last ``window`` per-chunk-tail
    rows preceding the chunk, because tail_W(tail_W(X)+Y) =
    tail_W(X+Y) for ordered concatenation — so the result is exact
    even when a chunk holds fewer than ``window`` rows.  Carry volume
    <= keys x chunks x window narrow rows; event data moves once.
    Every shuffle stage groups by a BOUNDED hash bucket, one
    vectorized lexsort + segmented pass per bucket (never a
    per-(key, chunk) Python call).
    """
    import pyarrow.compute as pc

    from . import pd_table

    W = int(window)
    assert W >= 1

    def narrow(b: pa.Table) -> pa.Table:
        ts = b.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({
            "k": b.column(key_col).cast(pa.int64()),
            "c": pc.divide(ts, time_chunk_us),
            "ts_us": ts,
            "tie": b.column(tie_col).cast(pa.int64()),
            "v": b.column(value_col).cast(pa.int64()),
        })

    base = ds.map_batches(narrow, batch_format="pyarrow")

    nb = _window_buckets(ds)

    def tail_partial(b: pa.Table) -> pa.Table:
        d = b.to_pandas().sort_values(["ts_us", "tie"], kind="mergesort")
        d = d.groupby(["k", "c"], sort=False).tail(W).reset_index(drop=True)
        d["bk"] = _hash_mod(nb, d["k"].to_numpy(np.int64),
                            d["c"].to_numpy(np.int64))
        return pd_table(d)

    def tail_reduce_bucket(g: pd.DataFrame) -> pa.Table:
        """Last W rows per (key, chunk), one lexsort per bucket; emits
        the per-key carry bucket ``kb`` for the next stage."""
        k = g["k"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        tie = g["tie"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        order = np.lexsort((tie, ts, c, k))
        k, c, ts, tie, v = k[order], c[order], ts[order], tie[order], v[order]
        _, seg_id, seg_start = _seg_bounds(k, c)
        n = len(k)
        seg_len = np.diff(np.r_[seg_start, n])
        pos = np.arange(n) - seg_start[seg_id]
        keep = pos >= (seg_len[seg_id] - W)
        k, c, ts, tie, v = k[keep], c[keep], ts[keep], tie[keep], v[keep]
        return pd_table(pd.DataFrame({
            "k": k, "c": c, "ts_us": ts, "tie": tie, "v": v,
            "kb": _hash_mod(nb, k)}))

    edges = base.map_batches(tail_partial, batch_format="pyarrow",
                             batch_size=65536).groupby(
        "bk", num_partitions=shuffle_partitions(nb)).map_groups(
        tail_reduce_bucket, batch_format="pandas")

    def carry_bucket(g: pd.DataFrame) -> pa.Table:
        """Route each chunk's carry — the last W tail rows preceding
        it within its key — into that chunk, fully vectorized."""
        k = g["k"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        tie = g["tie"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        order = np.lexsort((tie, ts, c, k))
        k, c, ts, tie, v = k[order], c[order], ts[order], tie[order], v[order]
        new_k, _, k_start = _seg_bounds(k)
        _, _, kc_start = _seg_bounds(k, c)
        key_id = np.cumsum(new_k) - 1
        tgt = kc_start[~new_k[kc_start]]  # chunk starts that are not key starts
        if not len(tgt):
            return pd_table(pd.DataFrame({
                "k": pd.Series([], dtype=np.int64),
                "c": pd.Series([], dtype=np.int64),
                "ts_us": pd.Series([], dtype=np.int64),
                "tie": pd.Series([], dtype=np.int64),
                "v": pd.Series([], dtype=np.int64),
                "is_carry": pd.Series([], dtype=np.int8),
                "bk": pd.Series([], dtype=np.int32)}))
        s = tgt - k_start[key_id[tgt]]  # tail rows before chunk, within key
        t = np.minimum(W, s)
        within = np.arange(t.sum()) - np.repeat(np.cumsum(t) - t, t)
        src = np.repeat(tgt - t, t) + within
        ck, cc = k[src], np.repeat(c[tgt], t)
        return pd_table(pd.DataFrame({
            "k": ck, "c": cc, "ts_us": ts[src], "tie": tie[src],
            "v": v[src],
            "is_carry": np.full(len(src), 1, dtype=np.int8),
            "bk": _hash_mod(nb, ck, cc)}))

    carries = edges.groupby("kb", num_partitions=shuffle_partitions(nb)).map_groups(
        carry_bucket, batch_format="pandas")

    def tag(b: pa.Table) -> pa.Table:
        k = b.column("k").to_numpy(zero_copy_only=False)
        c = b.column("c").to_numpy(zero_copy_only=False)
        return (b.append_column("is_carry",
                                pa.array(np.zeros(len(b), dtype=np.int8)))
                 .append_column("bk", pa.array(_hash_mod(nb, k, c))))

    tagged = base.map_batches(tag, batch_format="pyarrow").union(carries)

    def emit_bucket(g: pd.DataFrame) -> pa.Table:
        if not (g["is_carry"] == 0).any():
            return pd_table(pd.DataFrame({
                "k": [], "tie": [], "ts_us": [], "v": [],
                "moving_sum": [], "moving_n": []}).astype(np.int64))
        k = g["k"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        tie = g["tie"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        carry = g["is_carry"].to_numpy(np.int8)
        # carries come from earlier chunks, so their ts sorts before
        # every data row of the destination chunk
        order = np.lexsort((tie, ts, c, k))
        k, c, ts, tie, v, carry = (a[order] for a in (k, c, ts, tie, v, carry))
        _, seg_id, seg_start = _seg_bounds(k, c)
        n = len(k)
        cs = np.cumsum(v)
        base_ = np.where(seg_start > 0, cs[seg_start - 1], 0)
        pos = np.arange(n) - seg_start[seg_id]
        lo = np.arange(n) - W
        prev = np.where(pos >= W, cs[np.maximum(lo, 0)], base_[seg_id])
        msum = cs - prev
        mn = np.minimum(pos + 1, W)
        keep = carry == 0
        return pd_table(pd.DataFrame({
            "k": k[keep], "tie": tie[keep], "ts_us": ts[keep],
            "v": v[keep], "moving_sum": msum[keep], "moving_n": mn[keep]}))

    return tagged.groupby("bk", num_partitions=shuffle_partitions(nb)).map_groups(
        emit_bucket, batch_format="pandas")


def lag_lead(ds, *, key_col: str, ts_col: str, tie_col: str, value_col: str,
             shift: str = "lag", time_chunk_us: int = 7 * 86400 * 10**6):
    """SQL ``lag(v) / lead(v) OVER (PARTITION BY key ORDER BY ts,
    tie)`` with unique (ts, tie) order.  Output: (key, tie, ts_us,
    value, <lag_value|lead_value>; null at the partition edge).

    Same (key, time-chunk) co-partitioning as ``running_aggregate``;
    the cross-chunk boundary row (last row of the previous present
    chunk for lag, first of the next for lead) is computed by a
    narrow edge-row pass — <= keys x chunks rows — and rides the main
    shuffle as a tagged carry, so event data moves exactly once.
    Every shuffle stage groups by a BOUNDED hash bucket, one
    vectorized lexsort + segmented pass per bucket (never a
    per-(key, chunk) Python call).
    """
    import pyarrow.compute as pc

    from . import pd_table

    assert shift in ("lag", "lead")
    out_val = f"{shift}_value"
    sgn = 1 if shift == "lag" else -1

    def narrow(b: pa.Table) -> pa.Table:
        ts = b.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({
            "k": b.column(key_col).cast(pa.int64()),
            "c": pc.divide(ts, time_chunk_us),
            "ts_us": ts,
            "tie": b.column(tie_col).cast(pa.int64()),
            "v": b.column(value_col).cast(pa.int64()),
        })

    base = ds.map_batches(narrow, batch_format="pyarrow")

    nb = _window_buckets(ds)

    def edge_partial(b: pa.Table) -> pa.Table:
        """Per-batch edge row (last for lag / first for lead) per
        (key, chunk) — shrinks the carry shuffle."""
        d = b.to_pandas().sort_values(["ts_us", "tie"], kind="mergesort")
        g = d.groupby(["k", "c"], sort=False)
        e = (g.tail(1) if shift == "lag" else g.head(1)).reset_index(drop=True)
        e["bk"] = _hash_mod(nb, e["k"].to_numpy(np.int64),
                            e["c"].to_numpy(np.int64))
        return pd_table(e)

    def edge_reduce_bucket(g: pd.DataFrame) -> pa.Table:
        """One edge row per (key, chunk): one lexsort per bucket; emits
        the per-key carry bucket ``kb`` for the next stage."""
        k = g["k"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        tie = g["tie"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        order = np.lexsort((tie, ts, c, k))
        k, c, ts, tie, v = k[order], c[order], ts[order], tie[order], v[order]
        new, _, seg_start = _seg_bounds(k, c)
        if shift == "lag":
            pick = np.r_[seg_start[1:] - 1, len(k) - 1]  # segment ends
        else:
            pick = seg_start
        k, c, ts, tie, v = k[pick], c[pick], ts[pick], tie[pick], v[pick]
        return pd_table(pd.DataFrame({
            "k": k, "c": c, "ts_us": ts, "tie": tie, "v": v,
            "kb": _hash_mod(nb, k)}))

    edges = base.map_batches(edge_partial, batch_format="pyarrow",
                             batch_size=65536).groupby(
        "bk", num_partitions=shuffle_partitions(nb)).map_groups(
        edge_reduce_bucket, batch_format="pandas")

    def carry_bucket(g: pd.DataFrame) -> pa.Table:
        """Route each edge row to the NEXT (lag) / PREVIOUS (lead)
        present chunk of its key as a carry — vectorized shift over
        the bucket's (key, chunk)-sorted edge rows."""
        k = g["k"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        tie = g["tie"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        order = np.lexsort((c, k))  # one row per (k, c)
        k, c, ts, tie, v = k[order], c[order], ts[order], tie[order], v[order]
        same = k[1:] == k[:-1]
        if shift == "lag":
            src = np.flatnonzero(same)          # row i -> chunk of row i+1
            dst_c = c[src + 1]
        else:
            src = np.flatnonzero(same) + 1      # row i -> chunk of row i-1
            dst_c = c[src - 1]
        ck = k[src]
        return pd_table(pd.DataFrame({
            "k": ck, "c": dst_c, "ts_us": ts[src], "tie": tie[src],
            "v": v[src],
            "is_carry": np.full(len(src), 1, dtype=np.int8),
            "bk": _hash_mod(nb, ck, dst_c)}))

    carries = edges.groupby("kb", num_partitions=shuffle_partitions(nb)).map_groups(
        carry_bucket, batch_format="pandas")

    def tag(b: pa.Table) -> pa.Table:
        k = b.column("k").to_numpy(zero_copy_only=False)
        c = b.column("c").to_numpy(zero_copy_only=False)
        return (b.append_column("is_carry",
                                pa.array(np.zeros(len(b), dtype=np.int8)))
                 .append_column("bk", pa.array(_hash_mod(nb, k, c))))

    tagged = base.map_batches(tag, batch_format="pyarrow").union(carries)

    def emit_bucket(g: pd.DataFrame) -> pa.Table:
        if not (g["is_carry"] == 0).any():
            return pd_table(pd.DataFrame({
                "k": pd.Series([], dtype=np.int64),
                "tie": pd.Series([], dtype=np.int64),
                "ts_us": pd.Series([], dtype=np.int64),
                "v": pd.Series([], dtype=np.int64),
                out_val: pd.Series([], dtype="float64")}))
        k = g["k"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        tie = g["tie"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        carry = g["is_carry"].to_numpy(np.int8)
        # a lag carry is the previous chunk's last row (earlier ts ->
        # sorts first in the segment); a lead carry is the next
        # chunk's first row (later ts -> sorts last)
        order = np.lexsort((tie, ts, c, k))
        k, c, ts, tie, v, carry = (a[order] for a in (k, c, ts, tie, v, carry))
        same_prev = np.zeros(len(k), np.bool_)
        same_prev[1:] = (k[1:] == k[:-1]) & (c[1:] == c[:-1])
        vf = v.astype(np.float64)
        if shift == "lag":
            shifted = np.where(same_prev, np.r_[np.nan, vf[:-1]], np.nan)
        else:
            same_next = np.r_[same_prev[1:], False]
            shifted = np.where(same_next, np.r_[vf[1:], np.nan], np.nan)
        keep = carry == 0
        return pd_table(pd.DataFrame({
            "k": k[keep], "tie": tie[keep], "ts_us": ts[keep],
            "v": v[keep], out_val: shifted[keep]}))

    return tagged.groupby("bk", num_partitions=shuffle_partitions(nb)).map_groups(
        emit_bucket, batch_format="pandas")


def range_aggregate(ds, *, key_col: str, ts_col: str, tie_col: str,
                    value_col: str, interval_us: int,
                    time_chunk_us: int = 7 * 86400 * 10**6):
    """SQL RANGE-frame windowed sum/count: ``sum(v) OVER (PARTITION BY
    key ORDER BY ts RANGE BETWEEN interval PRECEDING AND CURRENT
    ROW)``.  Peers (equal ts) share one frame, per SQL RANGE
    semantics.  Output: (key, tie, ts_us, v, range_sum, range_n).

    Scale design: requires ``interval_us <= time_chunk_us``, so a row
    can only influence frames in its own and the NEXT time chunk.  The
    carry is therefore a row-LOCAL predicate (ts within ``interval``
    of the next chunk boundary) — no reduce stage at all: event data
    moves through ONE bounded-bucket shuffle, carries add at most
    interval/chunk of it.  Each bucket is one vectorized lexsort +
    twin searchsorted over boundary-shifted timestamps (frames never
    cross a (key, chunk) segment because the carried prefix rows ARE
    the cross-boundary frame content).
    """
    import pyarrow.compute as pc

    from . import pd_table

    iv = int(interval_us)
    ck = int(time_chunk_us)
    assert 0 < iv <= ck, "interval must be <= the co-partitioning time chunk"
    nb = _window_buckets(ds)

    def narrow(b: pa.Table) -> pa.Table:
        ts = b.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
        tsn = ts.to_numpy(zero_copy_only=False)
        return pa.table({
            "k": b.column(key_col).cast(pa.int64()),
            # FLOOR division (numpy //), not Arrow's truncate-toward-
            # zero: pre-epoch timestamps must keep rel = ts - c*ck in
            # [0, ck) or the per-segment shifted-timestamp bands
            # overlap and the frame searchsorted reads garbage
            "c": pa.array(tsn // ck, pa.int64()),
            "ts_us": ts,
            "tie": b.column(tie_col).cast(pa.int64()),
            "v": b.column(value_col).cast(pa.int64()),
        })

    def tag_and_carry(b: pa.Table) -> pa.Table:
        k = b.column("k").to_numpy(zero_copy_only=False)
        c = b.column("c").to_numpy(zero_copy_only=False)
        ts = b.column("ts_us").to_numpy(zero_copy_only=False)
        tie = b.column("tie").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False)
        m = ts >= (c + 1) * ck - iv  # close enough to seed the next chunk
        ck2 = np.concatenate([k, k[m]])
        cc2 = np.concatenate([c, c[m] + 1])
        return pa.table({
            "k": ck2, "c": cc2,
            "ts_us": np.concatenate([ts, ts[m]]),
            "tie": np.concatenate([tie, tie[m]]),
            "v": np.concatenate([v, v[m]]),
            "is_carry": np.concatenate([np.zeros(len(k), np.int8),
                                        np.ones(int(m.sum()), np.int8)]),
            "bk": _hash_mod(nb, ck2, cc2)})

    tagged = ds.map_batches(narrow, batch_format="pyarrow").map_batches(
        tag_and_carry, batch_format="pyarrow")

    def emit_bucket(g: pd.DataFrame) -> pa.Table:
        if not (g["is_carry"] == 0).any():
            return pd_table(pd.DataFrame({
                "k": [], "tie": [], "ts_us": [], "v": [],
                "range_sum": [], "range_n": []}).astype(np.int64))
        k = g["k"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        tie = g["tie"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        carry = g["is_carry"].to_numpy(np.int8)
        order = np.lexsort((tie, ts, c, k))
        k, c, ts, tie, v, carry = (a[order] for a in (k, c, ts, tie, v, carry))
        _, seg_id, seg_start = _seg_bounds(k, c)
        # shift each segment's (chunk-relative) timestamps onto a
        # private band so ONE global searchsorted resolves per-row
        # frame bounds; rel in [-iv, ck), band width ck + 2*iv + 2.
        # seg_id * band stays far below int64 even for multi-GB
        # buckets (derive_buckets caps a bucket at ~256 MiB).
        rel = ts - c * ck
        band = ck + 2 * iv + 2
        shifted = seg_id * band + rel + iv
        lo = np.searchsorted(shifted, shifted - iv, side="left")
        lo = np.maximum(lo, seg_start[seg_id])
        hi = np.searchsorted(shifted, shifted, side="right") - 1
        cs = np.cumsum(v)
        rsum = cs[hi] - np.where(lo > 0, cs[np.maximum(lo - 1, 0)], 0)
        rn = hi - lo + 1
        keep = carry == 0
        return pd_table(pd.DataFrame({
            "k": k[keep], "tie": tie[keep], "ts_us": ts[keep],
            "v": v[keep], "range_sum": rsum[keep], "range_n": rn[keep]}))

    return tagged.groupby("bk", num_partitions=shuffle_partitions(nb)).map_groups(
        emit_bucket, batch_format="pandas")


def session_funnel(ds, *, key_col: str, ts_col: str, type_col: str,
                   steps: tuple, gap_s: int, num_buckets: int | None = None):
    """Ordered-funnel conversion per session (streaming analytics op):
    a session CONVERTS when the step events occur in strict temporal
    order within it (t1 = min ts of step1, t2 = min ts of step2 after
    t1, ...).  Same hash-bucket-by-key shuffle as ``sessionize`` (a
    key's events co-locate, so per-user results are exact); per bucket
    one sort + vectorized session cumsum + one masked
    ``np.minimum.reduceat`` pass PER STEP over (key, session)
    segments — no per-session Python.  Output: (key, n_sessions,
    n_converted)."""
    if num_buckets is None:
        from . import derive_buckets

        num_buckets = derive_buckets(ds, default=16)

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "__bucket", pa.array((k % num_buckets).astype(np.int32)))

    narrow = ds.select_columns([key_col, ts_col, type_col]).map_batches(
        add_bucket, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        from . import pd_table as _pd_table

        g = g.sort_values([key_col, ts_col], kind="mergesort")
        k = g[key_col].to_numpy()
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        ty = g[type_col].to_numpy()
        new_key = np.r_[True, k[1:] != k[:-1]]
        gap = np.r_[0, ts[1:] - ts[:-1]]
        new_session = new_key | (gap > gap_s * 1_000_000)
        sess = np.cumsum(new_session)  # global session id within bucket
        seg_start = np.flatnonzero(new_session)
        seg_id = np.cumsum(new_session) - 1
        prev_t = np.full(len(seg_start), -np.inf)
        for step in steps:
            vals = np.where((ty == step) & (ts > prev_t[seg_id]),
                            ts.astype(np.float64), np.inf)
            prev_t = np.minimum.reduceat(vals, seg_start)
        conv = np.isfinite(prev_t)
        seg_key = k[seg_start]
        starts = np.flatnonzero(np.r_[True, seg_key[1:] != seg_key[:-1]])
        n_sess = np.diff(np.r_[starts, len(seg_key)])
        n_conv = np.add.reduceat(conv.astype(np.int64), starts)
        return _pd_table(pd.DataFrame({
            key_col: seg_key[starts],
            "n_sessions": n_sess.astype(np.int64),
            "n_converted": n_conv,
        }))

    return narrow.groupby("__bucket", num_partitions=shuffle_partitions()).map_groups(
        per_bucket, batch_format="pandas")
