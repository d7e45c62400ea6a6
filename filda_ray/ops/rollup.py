"""Skew-aware and hierarchical aggregation operators.

- ``salted_aggregate_count``: two-stage count with hot-key salting —
  the north_rule's 'explicit salting of skewed mega-cells'.  Stage 1
  groups by (key, salt) so a mega-key's rows spread over n_salts
  shuffle partitions; stage 2 merges the per-salt partials.  Results
  are identical to a plain groupby-count (tested), only the shuffle
  layout changes.  The pages table's zipf host skew (host 0 holds ~3%
  of all pages) is the live demonstration.
- ``parent_rollup``: child-cell -> parent-cell aggregation, the
  engine analog of the reference's 2x2 I->M block mean
  (FILDA_BT.py:62-66; index arithmetic FILDA.py:206-208).
- ``weighted_resample``: gather-join + weighted aggregate over a
  precomputed edge table (src, dst, weight) with weight
  renormalization over PRESENT sources — the DNB->M-band resampling
  semantics (FILDA_Resample.py:11-41; renorm :31-35) as a first-class
  op.  Small value side is broadcast; for large value sides swap the
  broadcast for a hash join on src (same contract).
"""

from __future__ import annotations

import numpy as np

from filda_ray.ops import shuffle_partitions
import pandas as pd
import pyarrow as pa

from ..kernels.hashing import splitmix64


def salted_aggregate_count(ds, key_col: str, *, n_salts: int = 8,
                           out_col: str = "n"):
    """Count per key via (key, salt) partials -> merge.  Identical to
    groupby(key).count(); hot keys shuffle as n_salts partitions."""

    def add_salt(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        # salt must split rows WITHIN one key: derive from a row hash
        row = np.arange(len(batch), dtype=np.uint64)
        salt = (splitmix64(k ^ splitmix64(row)) % np.uint64(n_salts)).astype(np.int32)
        return batch.append_column("__salt", pa.array(salt))

    from ray.data.aggregate import Count, Sum

    partial = (
        ds.select_columns([key_col])
        .map_batches(add_salt, batch_format="pyarrow")
        .groupby([key_col, "__salt"], num_partitions=shuffle_partitions())
        .aggregate(Count(alias_name="__pn"))
    )
    merged = partial.groupby(key_col, num_partitions=shuffle_partitions()).aggregate(Sum("__pn", alias_name=out_col))

    def clean(batch: pa.Table) -> pa.Table:
        return pa.table(
            {key_col: batch.column(key_col),
             out_col: batch.column(out_col).cast(pa.int64())}
        )

    return merged.map_batches(clean, batch_format="pyarrow")


def parent_rollup(ds, *, tile_col: str = "pc_tile", value_col: str,
                  factor: int = 2, tile_deg: float = 10.0):
    """Aggregate child Plate-Carrée tiles into (factor x factor)
    parents: count, sum, mean of ``value_col`` per parent tile.

    SQL mirror: parent = (row/factor)*(ncols/factor) + col/factor with
    integer division.
    """
    ncols = int(round(360.0 / tile_deg))
    pcols = ncols // factor

    def to_parent(batch: pa.Table) -> pa.Table:
        t = batch.column(tile_col).to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        parent = (t // ncols // factor) * pcols + (t % ncols) // factor
        return pa.table({"parent_tile": pa.array(parent.astype(np.int32)),
                         "v": pa.array(v)})

    from ray.data.aggregate import Count, Sum

    agg = (
        ds.select_columns([tile_col, value_col])
        .map_batches(to_parent, batch_format="pyarrow")
        .groupby("parent_tile", num_partitions=shuffle_partitions())
        .aggregate(Count(alias_name="n"), Sum("v", alias_name="sum_value"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy().astype(np.float64)
        s = batch.column("sum_value").to_numpy()
        return pa.table(
            {
                "parent_tile": batch.column("parent_tile"),
                "n": batch.column("n").cast(pa.int64()),
                "sum_value": pa.array(s),
                "mean_value": pa.array(s / n),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def weighted_resample(values_tbl: pa.Table, edges, *, value_col: str = "v",
                      key_col: str = "key"):
    """edges Dataset (src, dst, weight) x values table -> per-dst
    weighted mean with renormalization over present sources.

    Returns Dataset(dst=key_col, resampled, n_src).  The values side
    is broadcast (ray.put) and gathered per edge batch; missing
    sources drop out and the weight mass renormalizes over the rest
    (FILDA_Resample.py:31-35 semantics).
    """
    import ray

    keys = values_tbl.column(key_col).to_numpy()
    vals = values_tbl.column(value_col).to_numpy().astype(np.float64)
    order = np.argsort(keys)
    ref = ray.put((keys[order], vals[order]))

    from .workercache import worker_state

    def expand(batch: pa.Table) -> pa.Table:
        kk, vv = worker_state(ref, lambda: ray.get(ref))
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        w = batch.column("weight").to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.searchsorted(kk, src)
        idx = np.clip(idx, 0, max(len(kk) - 1, 0))
        hit = (len(kk) > 0) & (kk[idx] == src)
        wv = np.where(hit, w * vv[idx], 0.0)
        weff = np.where(hit, w, 0.0)
        return pa.table(
            {
                "dst": pa.array(dst),
                "wv": pa.array(wv),
                "w": pa.array(weff),
                "hit": pa.array(hit.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        edges.map_batches(expand, batch_format="pyarrow")
        .groupby("dst", num_partitions=shuffle_partitions())
        .aggregate(Sum("wv", alias_name="swv"), Sum("w", alias_name="sw"),
                   Sum("hit", alias_name="n_src"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        swv = batch.column("swv").to_numpy()
        sw = batch.column("sw").to_numpy()
        res = np.where(sw > 0, swv / np.where(sw > 0, sw, 1.0), np.nan)
        return pa.table(
            {
                key_col: batch.column("dst"),
                "resampled": pa.array(res),
                "n_src": batch.column("n_src").cast(pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def pivot_agg(ds, group_col: str, pivot_col: str, value_col: str,
              categories: list, *, prefix: str = ""):
    """Wide conditional aggregation (SQL PIVOT): one output row per
    group with ``<cat>_sum`` / ``<cat>_n`` columns per category.

    The category list is explicit (as in SQL PIVOT ... IN (...)) so
    the output schema is static.  Per-batch pandas pivot_table
    partials combine BEFORE the shuffle — the groupby moves one wide
    row per (block, group), never the event rows.  Use an integer
    value column (e.g. pre-converted cents) for bit-exact sums.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    from . import pd_table

    cats = list(categories)
    sum_cols = [f"{prefix}{c}_sum" for c in cats]
    n_cols = [f"{prefix}{c}_n" for c in cats]

    def partial(df: "pd.DataFrame") -> "pa.Table":
        pt = df.pivot_table(index=group_col, columns=pivot_col,
                            values=value_col, aggfunc=["sum", "count"],
                            fill_value=0)
        out = pd.DataFrame({group_col: pt.index.to_numpy()})
        zero = np.zeros(len(pt), dtype=np.int64)
        for c, sc, nc in zip(cats, sum_cols, n_cols):
            out[sc] = (pt[("sum", c)].to_numpy().astype(np.int64)
                       if ("sum", c) in pt.columns else zero)
            out[nc] = (pt[("count", c)].to_numpy().astype(np.int64)
                       if ("count", c) in pt.columns else zero)
        return pd_table(out)

    aggs = [Sum(c, alias_name=c) for c in sum_cols + n_cols]
    merged = ds.map_batches(partial, batch_format="pandas",
                            batch_size=65536).groupby(
        group_col, num_partitions=shuffle_partitions()).aggregate(*aggs)

    def clean(b: pa.Table) -> pa.Table:
        cols = {group_col: b.column(group_col)}
        for c in sum_cols + n_cols:
            cols[c] = b.column(c).cast(pa.int64())
        return pa.table(cols)

    return merged.map_batches(clean, batch_format="pyarrow")
