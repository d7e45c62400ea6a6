"""Local stand-in for the driver's correctness gate.

Runs every queries() entry at a given sf dir, runs the matching
oracle_sql() in DuckDB over the same parquet views, and compares
row count, column names/dtypes, and an order-insensitive value hash
(rows sorted by all columns, floats rounded to 9 significant-ish
decimals before hashing — the driver's exact hash is unknown, so we
hold ourselves to near-exact equality).
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> tuple[str, pd.DataFrame]:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None or (isinstance(v, float) and np.isnan(v)) else v)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    h = hashlib.md5()
    for c in df.columns:
        col = df[c]
        if np.issubdtype(col.dtype, np.floating):
            vals = np.round(col.to_numpy(dtype=np.float64), 9)
            h.update(np.nan_to_num(vals, nan=-1.2345e300).tobytes())
        elif np.issubdtype(col.dtype, np.number) or col.dtype == bool:
            h.update(col.to_numpy().astype(np.float64).tobytes())
        else:
            h.update("\x01".join("" if v is None else str(v) for v in col).encode())
    return h.hexdigest(), df


def main(sf_dir: str, only: list[str] | None = None):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    qs = E.queries()
    oracles = E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            rdf = to_df(fn(sf_dir))
        except Exception as e:
            print(f"[FAIL-run ] {name}: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(rdf)} rows {dt:.1f}s cols={sorted(rdf.columns)}")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL-sql ] {name}: {e}")
            failures.append(name)
            continue
        ok_rows = len(rdf) == len(odf)
        ok_cols = sorted(rdf.columns) == sorted(odf.columns)
        h1, c1 = canon(rdf)
        h2, c2 = canon(odf)
        ok_hash = h1 == h2
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "MISMATCH"
        print(f"[{status:9s}] {name}: rows {len(rdf)}/{len(odf)} cols={ok_cols} hash={ok_hash} {dt:.1f}s")
        if status != "OK":
            failures.append(name)
            if ok_cols and ok_rows:
                for c in c1.columns:
                    a, b = c1[c], c2[c]
                    if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
                        aa = a.to_numpy(dtype=np.float64)
                        bb = b.to_numpy(dtype=np.float64)
                        bad = ~np.isclose(aa, bb, rtol=1e-9, atol=1e-12, equal_nan=True)
                        if bad.any():
                            i = int(np.argmax(bad))
                            print(f"    col {c}: {bad.sum()} diffs, e.g. row {i}: {aa[i]} vs {bb[i]}")
                    else:
                        neq = (a.astype(str) != b.astype(str)).to_numpy()
                        if neq.any():
                            i = int(np.argmax(neq))
                            print(f"    col {c}: {neq.sum()} diffs, e.g. row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}")
            elif not ok_cols:
                print(f"    ray cols: {sorted(rdf.columns)}")
                print(f"    sql cols: {sorted(odf.columns)}")
    print("failures:", failures or "none")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sys.exit(1 if main(sf, only) else 0)
