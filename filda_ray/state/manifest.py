"""Partitioned, resumable Parquet product writer.

north_rule requirement: 'resumable from checkpoint with per-partition
lineage + metrics'.  Reference analog: the reprocessing checkpoint
(day-level intermediate NetCDF + resume reader,
reprocessing_gen_daily_data.py:34-56 / MCBEF_IO.py:116-132) — made
first-class here:

layout::

    out_dir/
      _manifest.jsonl     # driver-written consolidated view (for
                          # humans/tools; regenerated after each run)
      part=<value>/
        data.parquet
        _SUCCESS.json     # the partition's completion marker:
                          #   {partition, rows, lineage}

Protocol: write each partition's files (data + marker) under a
UNIQUELY-SUFFIXED temp dir, rename the directory into place — a
partition is 'done' iff its ``_SUCCESS.json`` exists.  The marker
travels inside the partition directory, so completion state is
per-partition files, never a shared append-only log: concurrent
writers and speculative retries on different nodes cannot corrupt it,
and a multi-node cluster without a shared scratch FS still works as
long as the OUTPUT dir is shared (inherent to file output).
``resume_filter`` drops already-done partitions from the input stream,
so a killed run redoes only unfinished partitions (FIXTURES.md
invariant 3: resume-from-checkpoint == fresh run).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..ops import shuffle_partitions

MANIFEST = "_manifest.jsonl"
SUCCESS = "_SUCCESS.json"


def load_done(out_dir: str) -> dict[int, dict]:
    done: dict[int, dict] = {}
    if not os.path.isdir(out_dir):
        return done
    for d in sorted(os.listdir(out_dir)):
        marker = os.path.join(out_dir, d, SUCCESS)
        # ".tmp-" dirs are in-flight attempts (marker already inside);
        # only a renamed-into-place partition counts as done
        if d.startswith("part=") and ".tmp-" not in d and os.path.exists(marker):
            with open(marker) as f:
                rec = json.load(f)
            done[rec["partition"]] = rec
    return done


def resume_filter(ds, out_dir: str, partition_col: str):
    """Drop rows of partitions already recorded in the manifest."""
    done = load_done(out_dir)
    if not done:
        return ds, done
    from ..ops.relational import semi_anti_filter

    ks = sorted(done)
    if all(isinstance(k, (int, np.integer)) for k in ks):
        keys = np.array(ks, dtype=np.int64)
    else:  # string partitions (e.g. split=train/val/test)
        keys = np.array([str(k) for k in ks])
    return semi_anti_filter(ds, keys, on=partition_col, anti=True), done


_SAFE_PART = re.compile(r"^[A-Za-z0-9_.-]+$")


def _check_int_partition(ds, partition_col: str, allow_string: bool = False):
    """The manifest protocol keys partitions by int (marker JSON,
    resume_filter's key set, part=<v> dir parsing) — fail fast on an
    unsupported partition column instead of erroring after data was
    already written.  ``write_product`` also accepts STRING partitions
    (e.g. split=train/val/test); the streaming writer stays int-only
    (its dir-rename protocol parses the value back with int())."""
    try:
        sch = ds.schema()
        t = dict(zip(sch.names, sch.types))[partition_col]
    except Exception:
        return
    ok = pa.types.is_integer(t) or (allow_string and pa.types.is_string(t))
    if not ok:
        kinds = "integer- or string-typed" if allow_string else "integer-typed"
        raise ValueError(
            f"partition_col {partition_col!r} must be {kinds} for the "
            f"manifest protocol (got {t})"
        )


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
    _check_int_partition(ds, partition_col, allow_string=True)
    lineage = dict(lineage or {})
    from ..kernels.textkit import EXTRACTOR_VERSION

    lineage.setdefault("extractor_version", EXTRACTOR_VERSION)

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        part = g[partition_col].iloc[0]
        if isinstance(part, str):
            if not _SAFE_PART.match(part):
                raise ValueError(
                    f"string partition value {part!r} is not filesystem-safe "
                    f"([A-Za-z0-9_.-]+ required)")
        else:
            part = int(part)
        if sort_cols:
            g = g.sort_values(sort_cols, kind="mergesort")
        final_dir = os.path.join(out_dir, f"part={part}")
        # unique temp dir per attempt: concurrent/speculative retries of
        # the same partition never rmtree each other's work-in-progress
        tmp_dir = final_dir + f".tmp-{uuid.uuid4().hex[:12]}"
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
        with open(os.path.join(tmp_dir, SUCCESS), "w") as f:
            json.dump({"partition": part, "rows": int(len(g)), "lineage": lineage}, f)
        shutil.rmtree(final_dir, ignore_errors=True)
        try:
            os.rename(tmp_dir, final_dir)
        except OSError:
            # another attempt won the rename race; its marker means the
            # partition is complete — discard this attempt's copy
            shutil.rmtree(tmp_dir, ignore_errors=True)
            if not os.path.exists(os.path.join(final_dir, SUCCESS)):
                raise
        return pd.DataFrame({"partition": [part], "rows": [len(g)]})

    summary = ds.groupby(partition_col, num_partitions=shuffle_partitions()).map_groups(write_group, batch_format="pandas")
    # consume to drive execution; summary is tiny (one row per partition)
    summary.materialize()
    done = load_done(out_dir)
    # consolidated driver-side view (regenerated, never worker-appended)
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        for part in sorted(done):
            f.write(json.dumps(done[part]) + "\n")
    return done


def write_product_streaming(ds, out_dir: str, *, partition_col: str,
                            lineage: dict | None = None):
    """Streaming variant of ``write_product`` for partitions larger
    than a worker's heap: Ray Data's native hive-partitioned
    ``write_parquet`` streams blocks to ``part=<v>/`` files (many
    files per partition, no per-partition materialization), then the
    DRIVER writes the success markers from a cheap per-partition
    count.

    Trade-off vs ``write_product`` (documented contract): commit
    granularity is the whole RUN, not the partition — a killed run
    leaves no markers and a resume redoes everything unfinished;
    use the per-partition writer when partitions fit a task and
    fine-grained resume matters.
    """
    os.makedirs(out_dir, exist_ok=True)
    # a crashed prior run leaves un-renamed __part= dirs (no markers);
    # rerunning would APPEND files into them and duplicate rows —
    # clean in-flight state first (completed part= dirs are untouched)
    for d in os.listdir(out_dir):
        if d.startswith("__part="):
            shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)
    lineage = dict(lineage or {})
    from ..kernels.textkit import EXTRACTOR_VERSION

    lineage.setdefault("extractor_version", EXTRACTOR_VERSION)
    lineage["writer"] = "streaming"
    # hive partitioning consumes the partition column; partition on a
    # COPY so the data files keep the original column for readers
    def addp(b: pa.Table) -> pa.Table:
        return b.append_column("__part", b.column(partition_col))

    _check_int_partition(ds, partition_col)
    ds.map_batches(addp, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["__part"]
    )  # ONE streaming pass: no materialization of the payload
    # per-partition row counts from the WRITTEN FILES' parquet footers
    # (metadata-only reads, no second pass over the data)
    for d in sorted(os.listdir(out_dir)):
        if not d.startswith("__part="):
            continue
        pdir = os.path.join(out_dir, d)
        part = int(d.split("=", 1)[1])
        files = [os.path.join(pdir, f) for f in sorted(os.listdir(pdir))
                 if f.endswith(".parquet")]
        n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        # normalize layout to the manifest convention (part=<v>/);
        # a rerun over an existing product replaces the partition
        # (same overwrite semantics as write_product)
        norm = os.path.join(out_dir, f"part={part}")
        shutil.rmtree(norm, ignore_errors=True)
        os.rename(pdir, norm)
        with open(os.path.join(norm, SUCCESS), "w") as f:
            json.dump({"partition": part, "rows": int(n), "lineage": lineage}, f)
    done = load_done(out_dir)
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        for part in sorted(done):
            f.write(json.dumps(done[part]) + "\n")
    return done


def read_product(out_dir: str):
    """Read a product back as a Dataset (resume/consumer path)."""
    from ..sources import read_parquet_clean

    parts = []
    for d in sorted(os.listdir(out_dir)):
        pdir = os.path.join(out_dir, d)
        if (d.startswith("part=") and ".tmp-" not in d
                and os.path.exists(os.path.join(pdir, SUCCESS))):
            parts += [os.path.join(pdir, f) for f in sorted(os.listdir(pdir))
                      if f.endswith(".parquet")]
    return read_parquet_clean(parts)


def read_product_partitions(out_dir: str, values):
    """Read ONLY the named partitions of a product — storage-level
    partition pruning (reference analog: mosaic only the tiles a
    granule bbox touches, FILDA.py:1570-1699).  Compose with
    ``kernels.cells.bbox_tiles`` for spatial bbox queries: the scan
    opens len(values)/len(all parts) of the bytes, like the IVF
    probed-partition read (ops/embed.py).  Missing or unfinished
    partitions are skipped (same contract as read_product)."""
    import ray.data as rd

    from ..sources import read_parquet_clean

    parts = []
    for v in values:
        pdir = os.path.join(out_dir, f"part={v}")
        if os.path.exists(os.path.join(pdir, SUCCESS)):
            parts += [os.path.join(pdir, f) for f in sorted(os.listdir(pdir))
                      if f.endswith(".parquet")]
    if not parts:
        return rd.from_items([])
    return read_parquet_clean(parts)
