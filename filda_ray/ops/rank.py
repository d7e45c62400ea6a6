"""Global order statistics without a global sort.

SQL window functions `rank() / dense_rank() / row_number() / ntile(k)
OVER (ORDER BY v)` need a TOTAL order; a naive implementation is a
full `ds.sort` plus a sequential scan.  This operator instead uses the
classic range-partitioned two-pass design:

1. sketch pass (narrow, shuffle-free): a mergeable KLL sketch of the
   value column yields ~`n_ranges` quantile boundaries;
2. rank pass (ONE bounded shuffle): rows hash to their value range
   (equal values always co-locate, so ties never straddle a range),
   each range is sorted locally and emits LOCAL ranks;
3. offset pass (tiny): per-range (row count, distinct count) partials
   — one row per block — cumsum on the driver (``n_ranges`` ints),
   broadcast back, and a final narrow map adds the offsets.

Every requested method shares the single local sort, so asking for
rank + dense_rank + row_number + ntile costs one shuffle total.
Ranges are bytes-proportional (``derive_buckets``) so a range fits a
worker heap; a mega-duplicate value is the one skew case (all ties
must share a range — inherent to rank semantics) and is documented on
the parameter.

Null ordering follows SQL (DuckDB) defaults: NULLS LAST for ascending,
all nulls tie with each other.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import pd_table, shuffle_partitions

_METHODS = ("rank", "dense_rank", "row_number", "ntile", "percent_rank",
            "cume_dist")


def _ntile_of(r: np.ndarray, n: int, k: int) -> np.ndarray:
    """SQL NTILE: first n%k buckets get n//k+1 rows, rest n//k."""
    base, rem = divmod(n, k)
    big = rem * (base + 1)
    r0 = r - 1
    return np.where(r0 < big,
                    r0 // max(base + 1, 1),
                    rem + np.where(base > 0, (r0 - big) // max(base, 1), 0)
                    ).astype(np.int64) + 1


def global_rank(ds, value_col: str, *, methods=("rank",), tie_cols=None,
                ascending: bool = True, k_tiles: int = 4,
                n_ranges: int | None = None, k_sketch: int = 256):
    """Append global ranking columns (named after each method) ordered
    by ``value_col``.

    ``row_number`` and ``ntile`` additionally order by ``tie_cols``
    for a deterministic total order (required — SQL leaves tie order
    unspecified, which a hash-checked engine cannot).  ``rank`` /
    ``dense_rank`` / ``percent_rank`` depend on the value only.
    """
    for m in methods:
        if m not in _METHODS:
            raise ValueError(f"unknown method {m!r}; one of {_METHODS}")
    if ("row_number" in methods or "ntile" in methods) and not tie_cols:
        raise ValueError("row_number/ntile need tie_cols for a deterministic order")
    tie_cols = list(tie_cols or [])

    import ray

    from . import derive_buckets
    from .sketch import approx_quantiles
    from .workercache import worker_state

    if n_ranges is None:
        n_ranges = max(derive_buckets(ds), shuffle_partitions())

    qs = [i / n_ranges for i in range(1, n_ranges)]
    bounds = np.unique(np.array(
        [v for v in approx_quantiles(ds, value_col, qs, k=k_sketch).values()
         if not np.isnan(v)], dtype=np.float64))
    sgn = 1.0 if ascending else -1.0
    bounds = np.sort(sgn * bounds)  # boundaries in the SORT direction

    def assign(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        rid = np.searchsorted(bounds, sgn * v, side="right")
        rid = np.where(np.isnan(v), len(bounds), rid)  # NULLS LAST
        return b.append_column("__rid", pa.array(rid.astype(np.int32)))

    need_rank = bool({"rank", "percent_rank"} & set(methods))
    need_dense = "dense_rank" in methods
    need_rn = bool({"row_number", "ntile"} & set(methods))
    need_cume = "cume_dist" in methods

    def local(g: pd.DataFrame) -> pa.Table:
        v = sgn * g[value_col].to_numpy(dtype=np.float64)
        keys = [v]
        for c in reversed(tie_cols):
            keys.insert(0, g[c].to_numpy())
        order = np.lexsort(keys)  # NaN sorts last in the primary key
        out = g.iloc[order].drop(columns="__rid").reset_index(drop=True)
        vs = v[order]
        both_nan = np.isnan(vs[1:]) & np.isnan(vs[:-1])
        new = np.r_[True, (vs[1:] != vs[:-1]) & ~both_nan]
        n = len(vs)
        if need_rank:
            first = np.flatnonzero(new)
            out["__lrank"] = np.repeat(first + 1, np.diff(np.r_[first, n]))
        if need_cume:
            starts = np.flatnonzero(new)
            ends = np.r_[starts[1:], n]
            out["__lcume"] = np.repeat(ends, np.diff(np.r_[starts, n]))
        if need_dense:
            out["__ldense"] = np.cumsum(new)
        if need_rn:
            out["__lrn"] = np.arange(1, n + 1)
        out["__rid"] = np.int32(g["__rid"].iloc[0])
        return pd_table(out)

    ranked = ds.map_batches(assign, batch_format="pyarrow").groupby(
        "__rid", num_partitions=shuffle_partitions()
    ).map_groups(local, batch_format="pandas").materialize()

    def totals(b: pa.Table) -> pa.Table:
        rid = b.column("__rid").to_numpy(zero_copy_only=False)
        u = np.unique(rid)
        n = np.array([(rid == r).sum() for r in u], dtype=np.int64)
        if need_dense:
            ld = b.column("__ldense").to_numpy(zero_copy_only=False)
            d = np.array([ld[rid == r].max() for r in u], dtype=np.int64)
        else:
            d = np.zeros(len(u), dtype=np.int64)
        return pa.table({"rid": pa.array(u.astype(np.int32)), "n": n, "d": d})

    parts = ranked.map_batches(totals, batch_format="pyarrow").take_all()
    nr = len(bounds) + 1
    cnt = np.zeros(nr, dtype=np.int64)
    dst = np.zeros(nr, dtype=np.int64)
    for r in parts:
        cnt[r["rid"]] += r["n"]
        dst[r["rid"]] = max(dst[r["rid"]], r["d"])
    off_n = np.r_[0, np.cumsum(cnt)][:-1]
    off_d = np.r_[0, np.cumsum(dst)][:-1]
    total = int(cnt.sum())
    ref = ray.put((off_n, off_d, total))

    def finish(b: pa.Table) -> pa.Table:
        on, od, tot = worker_state(ref, lambda: ray.get(ref))
        rid = b.column("__rid").to_numpy(zero_copy_only=False)
        cols = {c: b.column(c) for c in b.column_names
                if not c.startswith("__")}
        if need_rank:
            rk = b.column("__lrank").to_numpy(zero_copy_only=False) + on[rid]
            if "rank" in methods:
                cols["rank"] = pa.array(rk.astype(np.int64))
            if "percent_rank" in methods:
                cols["percent_rank"] = pa.array(
                    (rk - 1) / max(tot - 1, 1))
        if need_dense:
            cols["dense_rank"] = pa.array(
                (b.column("__ldense").to_numpy(zero_copy_only=False)
                 + od[rid]).astype(np.int64))
        if need_cume:
            lc = b.column("__lcume").to_numpy(zero_copy_only=False) + on[rid]
            cols["cume_dist"] = pa.array(lc / tot)
        if need_rn:
            rn = b.column("__lrn").to_numpy(zero_copy_only=False) + on[rid]
            if "row_number" in methods:
                cols["row_number"] = pa.array(rn.astype(np.int64))
            if "ntile" in methods:
                cols["ntile"] = pa.array(_ntile_of(rn, tot, k_tiles))
        return pa.table(cols)

    return ranked.map_batches(finish, batch_format="pyarrow")
