"""Partitioned, resumable Parquet product writer.

north_rule requirement: 'resumable from checkpoint with per-partition
lineage + metrics'.  Reference analog: the reprocessing checkpoint
(day-level intermediate NetCDF + resume reader,
reprocessing_gen_daily_data.py:34-56 / MCBEF_IO.py:116-132) — made
first-class here:

layout::

    out_dir/
      _manifest.jsonl     # one line per completed partition:
                          #   {partition, rows, lineage, ts_version}
      part=<value>/       # parquet files of that partition

Protocol: write each partition's files under a temp dir, fsync-rename
the directory into place, then append the manifest line — a partition
is 'done' iff its manifest line exists.  ``resume_filter`` drops
already-done partitions from the input stream, so a killed run redoes
only unfinished partitions (FIXTURES.md invariant 3:
resume-from-checkpoint == fresh run).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST = "_manifest.jsonl"


def load_done(out_dir: str) -> dict[int, dict]:
    path = os.path.join(out_dir, MANIFEST)
    done: dict[int, dict] = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                if line.strip():
                    rec = json.loads(line)
                    done[rec["partition"]] = rec
    return done


def resume_filter(ds, out_dir: str, partition_col: str):
    """Drop rows of partitions already recorded in the manifest."""
    done = load_done(out_dir)
    if not done:
        return ds, done
    from ..ops.relational import semi_anti_filter

    keys = np.array(sorted(done), dtype=np.int64)
    return semi_anti_filter(ds, keys, on=partition_col, anti=True), done


def write_product(ds, out_dir: str, *, partition_col: str, lineage: dict | None = None,
                  sort_cols: list[str] | None = None,
                  field_metadata: dict[str, dict[str, str]] | None = None):
    """Write ``ds`` partitioned by ``partition_col`` with manifest.

    One groupby(partition).map_groups writes each partition
    atomically (temp dir + rename + manifest append) from inside the
    task — partitions stream independently, failures leave no manifest
    line, and a rerun with ``resume_filter`` skips finished ones.
    Returns the manifest dict after the run.
    """
    os.makedirs(out_dir, exist_ok=True)
    lineage = dict(lineage or {})
    from ..kernels.textkit import EXTRACTOR_VERSION

    lineage.setdefault("extractor_version", EXTRACTOR_VERSION)

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g[partition_col].iloc[0])
        if sort_cols:
            g = g.sort_values(sort_cols, kind="mergesort")
        final_dir = os.path.join(out_dir, f"part={part}")
        tmp_dir = final_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir, exist_ok=True)
        tbl = pa.Table.from_pandas(g, preserve_index=False)
        if field_metadata:
            # per-field units/long_name metadata (aux_infor_dict analog,
            # FILDA_IO.py:1337-1474): travels in the parquet schema
            fields = []
            for f in tbl.schema:
                meta = field_metadata.get(f.name)
                fields.append(f.with_metadata({k: str(v) for k, v in meta.items()}) if meta else f)
            tbl = tbl.cast(pa.schema(fields, metadata=tbl.schema.metadata))
        pq.write_table(tbl, os.path.join(tmp_dir, "data.parquet"))
        shutil.rmtree(final_dir, ignore_errors=True)
        os.rename(tmp_dir, final_dir)
        with open(os.path.join(out_dir, MANIFEST), "a") as f:
            f.write(json.dumps({"partition": part, "rows": int(len(g)),
                                "lineage": lineage}) + "\n")
        return pd.DataFrame({"partition": [part], "rows": [len(g)]})

    summary = ds.groupby(partition_col).map_groups(write_group, batch_format="pandas")
    # consume to drive execution; summary is tiny (one row per partition)
    summary.materialize()
    return load_done(out_dir)


def read_product(out_dir: str):
    """Read a product back as a Dataset (resume/consumer path)."""
    import ray.data as rd

    parts = [
        os.path.join(out_dir, d, "data.parquet")
        for d in sorted(os.listdir(out_dir))
        if d.startswith("part=")
    ]
    return rd.read_parquet(parts)
