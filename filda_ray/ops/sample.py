"""Deterministic sampling / dataset-split operators (engine additions
for training-data pipelines).

Random sampling at 10^12 rows must be reproducible and resumable, so
the engine samples by KEY HASH, not RNG state: a row is in the sample
iff u(key) < fraction, where u is the same integer-arithmetic uniform
used by the pages synthesis — which also makes the operators exactly
SQL-mirrorable (no seed-state coupling between workers, stable under
repartitioning and resume).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MIX = 2654435761
_MOD = 4294967296  # 2^32


def hash_uniform(key: np.ndarray, seed: int = 0) -> np.ndarray:
    """u in [0,1) as a pure function of (key, seed); SQL mirror:
    (((key + seed) * 2654435761) % 4294967296) / 4294967296.0"""
    k = np.asarray(key, dtype=np.int64) + np.int64(seed)
    return ((k * _MIX) % _MOD) / float(_MOD)


def sql_hash_uniform(key: str, seed: int = 0) -> str:
    return f"((({key} + {seed}) * {_MIX}) % {_MOD}) / {float(_MOD)!r}"


def hash_sample(ds, key_col: str, fraction: float, *, seed: int = 0):
    """Bernoulli-by-hash sample: deterministic, repartition-stable."""

    def f(batch: pa.Table) -> pa.Table:
        u = hash_uniform(batch.column(key_col).to_numpy(zero_copy_only=False), seed)
        return batch.filter(pa.array(u < fraction))

    return ds.map_batches(f, batch_format="pyarrow")


SPLITS = (("train", 0.8), ("val", 0.1), ("test", 0.1))


def split_assign(ds, key_col: str, *, splits=SPLITS, seed: int = 1,
                 out_col: str = "split"):
    """Assign train/val/test by hash ranges (cumulative fractions)."""
    names = [n for n, _ in splits]
    bounds = np.cumsum([f for _, f in splits])

    def f(batch: pa.Table) -> pa.Table:
        u = hash_uniform(batch.column(key_col).to_numpy(zero_copy_only=False), seed)
        idx = np.searchsorted(bounds, u, side="right")
        idx = np.clip(idx, 0, len(names) - 1)
        lab = np.asarray(names, dtype=object)[idx]
        return batch.append_column(out_col, pa.array(lab, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def sql_split_assign(key: str, splits=SPLITS, seed: int = 1) -> str:
    """CASE expression mirroring ``split_assign`` exactly."""
    u = sql_hash_uniform(key, seed)
    cases = []
    acc = 0.0
    for name, frac in splits[:-1]:
        acc += frac
        cases.append(f"WHEN {u} < {acc!r} THEN '{name}'")
    return "CASE " + " ".join(cases) + f" ELSE '{splits[-1][0]}' END"


def stratified_sample(ds, strata_col: str, key_col: str, n: int, *, seed: int = 2):
    """Exactly min(n, |stratum|) rows per stratum — the balanced
    per-language/per-source sample a training-data pipeline draws.

    Selection = the n smallest ``hash_uniform(key)`` per stratum
    (ties by key), so the sample is deterministic, repartition- and
    resume-stable, and exactly SQL-mirrorable:
    ``row_number() OVER (PARTITION BY strata ORDER BY u, key) <= n``.

    Scale: a per-batch prune keeps at most n rows per stratum per
    block BEFORE the shuffle, so the grouped top-n moves
    <= n x strata rows per block, never the corpus.
    """
    import pandas as pd

    from . import pd_table
    from .relational import top_k_per_group

    def prune(df: "pd.DataFrame") -> pa.Table:
        df = df.copy()
        df["__u"] = hash_uniform(df[key_col].to_numpy(), seed)
        df = df.sort_values(["__u", key_col], kind="mergesort")
        df = df.groupby(strata_col, sort=False).head(n)
        return pd_table(df.reset_index(drop=True))

    pruned = ds.map_batches(prune, batch_format="pandas")
    out = top_k_per_group(pruned, group_col=strata_col, value_col="__u",
                          k=n, ascending=True, tie_col=key_col)

    def drop_u(b: pa.Table) -> pa.Table:
        return b.drop_columns(["__u"])

    return out.map_batches(drop_u, batch_format="pyarrow")


def weighted_sample(ds, key_col: str, weight_col: str, *, scale: float,
                    seed: int = 3):
    """Importance sampling for data mixing: keep a row with probability
    min(1, scale * weight) — deterministic Bernoulli by key hash, so
    the sample is repartition/resume-stable and exactly SQL-mirrorable
    (u < least(1.0, scale * w)).  The classic quality-upweighting
    draw (higher-quality documents kept at higher rate); expected kept
    fraction = mean(min(1, scale*w)).  No shuffle; one vectorized
    filter per batch."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        u = hash_uniform(batch.column(key_col).to_numpy(), seed)
        w = batch.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        p = np.minimum(1.0, scale * w)
        return batch.filter(pa.array(u < p))

    return ds.map_batches(f, batch_format="pyarrow")
