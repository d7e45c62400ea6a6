"""Generic relational operators: broadcast / hash joins, semi/anti,
grouped top-k/bottom-k.

Reference join taxonomy (SURVEY.md §2.4): every reference join is a
broadcast small-side lookup; the engine adds real hash joins (Ray
Data's hash-partitioned ``Dataset.join``) for large-large cases and
broadcast semi/anti filters for key sets.
"""

from __future__ import annotations

import numpy as np

from filda_ray.ops import shuffle_partitions
import pandas as pd
import pyarrow as pa


def broadcast_join(ds, small: pa.Table, *, on: str, cols: list[str] | None = None):
    """Left join a small side-table by gather (ray.put once, searchsorted
    per batch).  No shuffle; the big side streams."""
    import ray

    from .workercache import worker_state

    cols = cols or [c for c in small.column_names if c != on]
    ref = ray.put(small)

    def build():
        t = ray.get(ref)
        keys = t.column(on).to_numpy()
        order = np.argsort(keys)
        return keys[order], {c: t.column(c).take(pa.array(order)) for c in cols}

    def gather(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys, side = worker_state(ref, build)
        k = batch.column(on).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(keys, k)
        idx = np.clip(idx, 0, max(len(keys) - 1, 0))
        hit = pa.array((len(keys) > 0) & (keys[idx] == k))
        out = batch
        for c, arr in side.items():
            taken = arr.take(pa.array(idx))
            if isinstance(taken, pa.ChunkedArray):
                taken = taken.combine_chunks()
            # misses become proper NULLs (validity bitmap), never NaN
            out = out.append_column(c, pc.if_else(hit, taken, pa.scalar(None, taken.type)))
        return out

    return ds.map_batches(gather, batch_format="pyarrow")


def hash_join(left, right, *, on: str | tuple, how: str = "inner",
              num_partitions: int = 16, right_on=None):
    """Hash-partitioned join on Ray Data's native JoinOperator.

    All-to-all on both sides; prefer ``broadcast_join`` when one side
    fits comfortably in the object store (< ~1 GB rule of thumb).
    """
    on = (on,) if isinstance(on, str) else tuple(on)
    right_on = (right_on,) if isinstance(right_on, str) else right_on
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
    )


def salted_join(left, right, *, on: str, n_salts: int = 8,
                num_partitions: int | None = None, salt_src: str | None = None):
    """Inner hash join that survives a HOT join key (the join twin of
    ``rollup.salted_aggregate_count``; mega-cell salting per the north
    rule): left rows get a deterministic salt in [0, n_salts), the
    right side is replicated once per salt, and the join key becomes
    (key, salt) — one hot key spreads over ``n_salts`` partitions
    instead of landing on one joiner.

    Right-side replication costs n_salts × right bytes in the shuffle,
    so this is for a MID-SIZED right side (too big to broadcast, small
    next to the skewed left).  ``salt_src``: left column whose hash
    picks the salt (default: row position — cheapest; any column works
    since the salt only balances, never routes semantics).
    """
    from ..kernels.hashing import splitmix64

    if num_partitions is None:
        num_partitions = shuffle_partitions()

    def add_salt(b: pa.Table) -> pa.Table:
        if salt_src is not None:
            from ..kernels.hashing import col_hash64

            h = splitmix64(col_hash64(b.column(salt_src)))
        else:
            h = splitmix64(np.arange(len(b), dtype=np.uint64))
        return b.append_column("__salt", pa.array(
            (h % np.uint64(n_salts)).astype(np.int32)))

    def replicate(b: pa.Table) -> pa.Table:
        reps = [b.append_column("__salt", pa.array(
            np.full(len(b), s, dtype=np.int32))) for s in range(n_salts)]
        return pa.concat_tables(reps)

    l = left.map_batches(add_salt, batch_format="pyarrow")
    r = right.map_batches(replicate, batch_format="pyarrow")
    j = hash_join(l, r, on=(on, "__salt"), how="inner",
                  num_partitions=num_partitions)
    return j.drop_columns(["__salt"])


def semi_anti_filter(ds, keys: np.ndarray, *, on: str, anti: bool = False):
    """Semi/anti join by broadcast key set (reference anti-join analog:
    background sets excluding fire/cloud cells, FILDA.py:637-652)."""
    import ray

    from .workercache import worker_state

    ref = ray.put(np.sort(np.asarray(keys)))

    def f(batch: pa.Table) -> pa.Table:
        ks = worker_state(ref, lambda: ray.get(ref))
        k = batch.column(on).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(ks, k)
        idx = np.clip(idx, 0, max(len(ks) - 1, 0))
        hit = (len(ks) > 0) & (ks[idx] == k)
        return batch.filter(pa.array(~hit if anti else hit))

    return ds.map_batches(f, batch_format="pyarrow")


def distinct_rows(ds, key_cols: list[str], *, n_buckets: int | None = None):
    """Exact distinct over key columns (np.unique candidate-dedup
    analog, FILDA.py:395-398/491-497): bounded hash buckets + one
    vectorized drop_duplicates per bucket — never a per-key UDF.
    Bucket count defaults to bytes-proportional (``derive_buckets``)."""
    from ..kernels.hashing import col_hash64, splitmix64

    if n_buckets is None:
        from . import derive_buckets

        n_buckets = derive_buckets(ds)

    def bucket(b: pa.Table) -> pa.Table:
        h = np.zeros(len(b), dtype=np.uint64)
        for c in key_cols:
            h = splitmix64(h ^ col_hash64(b.column(c)))
        return b.append_column("__bk", pa.array((h % np.uint64(n_buckets)).astype(np.int32)))

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop(columns="__bk").drop_duplicates(key_cols).reset_index(drop=True)

    return ds.map_batches(bucket, batch_format="pyarrow").groupby("__bk", num_partitions=shuffle_partitions()).map_groups(
        uniq, batch_format="pandas"
    )


def explode_list(ds, list_col: str, *, value_col: str = "val",
                 index_col: str | None = "pos"):
    """Flatten a list column into one row per element (SQL unnest),
    carrying every other column along via offset-based repeats — no
    per-row Python.  ``index_col`` adds the 1-based position within
    the list (SQL WITH ORDINALITY); null/empty lists emit no rows.
    Purely row-local: no shuffle, output streams block by block.
    """
    def f(b: pa.Table) -> pa.Table:
        col = b.column(list_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        import pyarrow.compute as pc

        counts = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        reps = np.repeat(np.arange(len(b), dtype=np.int64), counts)
        out = {c: b.column(c).take(pa.array(reps))
               for c in b.column_names if c != list_col}
        if index_col is not None:
            pos = np.arange(len(reps), dtype=np.int64)
            starts = np.r_[0, np.cumsum(counts)[:-1]]
            out[index_col] = pa.array(pos - np.repeat(starts, counts) + 1)
        out[value_col] = col.flatten()
        return pa.table(out)

    return ds.map_batches(f, batch_format="pyarrow")


def _bucketed_groups(ds, group_col: str):
    """Shuffle by a 16x-oversampled hash bucket of ``group_col``
    instead of the key itself: map_groups then makes ONE call per
    bucket (vectorized / pandas-C inside), never a Python dispatch per
    distinct group — the dispatch alone measured tens of seconds on
    per-doc keys.  Oversampling keeps hash partitions non-empty.
    Group callables must drop the ``__gbk`` column themselves."""
    from ..kernels.hashing import col_hash64, splitmix64

    nb = shuffle_partitions()

    def add_bk(b: pa.Table) -> pa.Table:
        col = b.column(group_col)
        if pa.types.is_integer(col.type):
            u = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            u = col_hash64(col.combine_chunks().cast(pa.string())
                           if isinstance(col, pa.ChunkedArray)
                           else col.cast(pa.string()))
        return b.append_column(
            "__gbk", pa.array((splitmix64(u) % np.uint64(16 * nb)).astype(np.int64)))

    return (ds.map_batches(add_bk, batch_format="pyarrow")
            .groupby("__gbk", num_partitions=nb))


def collect_sorted(ds, *, group_col: str, value_col: str, order_col: str,
                   sep: str = ",", out_col: str = "seq"):
    """Per-group ordered concatenation (SQL string_agg(x, sep ORDER BY
    o)): the group's full value sequence must co-locate, so this is
    one bucketed shuffle of the three narrow columns + one vectorized
    sort and ONE Arrow binary_join per bucket (per-doc keys make
    per-group Python dispatch a scale killer)."""
    def agg(g: pd.DataFrame) -> pd.DataFrame:
        from . import pd_table

        g = g.sort_values([group_col, order_col, value_col], kind="mergesort")
        keys = g[group_col].to_numpy()
        counts = g.groupby(group_col, sort=False).size().to_numpy()
        offsets = np.r_[0, np.cumsum(counts)]
        lst = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.array(g[value_col].astype(str), pa.string()))
        seq = pa.compute.binary_join(lst, sep).to_pylist()
        return pd_table(pd.DataFrame({
            group_col: keys[offsets[:-1]],
            out_col: seq,
            "n": counts.astype(np.int64)}))

    narrow = ds.select_columns([group_col, value_col, order_col])
    return _bucketed_groups(narrow, group_col).map_groups(
        agg, batch_format="pandas")


def top_k_per_group(ds, *, group_col, value_col: str, k: int, ascending: bool = False,
                    tie_col: str | None = None):
    """Grouped top-k (bottom-k with ascending=True): the reference's
    sorted-head selections (lowest-25% FILDA.py:1366) generalized.
    Deterministic via the tie-break column.  One pandas-C sort + head
    per hash bucket (multi-group frames), no per-group dispatch."""
    by = [value_col] + ([tie_col] if tie_col else [])
    asc = [ascending] + ([True] if tie_col else [])

    def head(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__gbk")
        return (g.sort_values(by, ascending=asc, kind="mergesort")
                .groupby(group_col, as_index=False, sort=False).head(k))

    return _bucketed_groups(ds, group_col).map_groups(head, batch_format="pandas")


def trimmed_low_mean_per_group(ds, *, group_col: str, value_col: str, frac: float = 0.25,
                               out_col: str = "trimmed_mean"):
    """Per-group mean of the lowest ``frac`` of values
    (FILDA.py:1362-1368 trimmed FRP background, as a grouped op).
    k = max(1, floor(n*frac)) smallest by sort order.  Vectorized per
    hash bucket: one sort + cumulative-sum pass covers every group."""

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        all_keys = pd.unique(g[group_col])
        g2 = g.dropna(subset=[value_col]).sort_values(
            [group_col, value_col], kind="mergesort")
        keys = g2[group_col].to_numpy()
        v = g2[value_col].to_numpy(dtype=np.float64)
        if len(keys):
            starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
            n = np.diff(np.r_[starts, len(keys)])
            k = np.maximum(1, np.floor(n * frac)).astype(np.int64)
            # per-group sums via reduceat over the gathered low-k
            # slices: float64 error bounded by GROUP size, not by the
            # bucket-wide prefix magnitude a cumsum difference carries
            # (multi-million-row buckets exceed 9-dp oracle rounding)
            grp_off = np.cumsum(k) - k
            within = np.arange(int(k.sum()), dtype=np.int64) - np.repeat(grp_off, k)
            take = np.repeat(starts, k) + within
            sums = np.add.reduceat(v[take], grp_off)
            m = sums / k
            seen = dict(zip(keys[starts].tolist(), zip(m.tolist(), k.tolist())))
        else:
            seen = {}
        rows = [(key, *seen.get(key, (np.nan, 0))) for key in all_keys]
        out = pd.DataFrame(rows, columns=[group_col, out_col, "n_used"])
        out["n_used"] = out["n_used"].astype(np.int64)
        return out

    narrow = ds.select_columns([group_col, value_col])
    return _bucketed_groups(narrow, group_col).map_groups(agg, batch_format="pandas")
