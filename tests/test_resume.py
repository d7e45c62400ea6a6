"""Checkpoint/resume tests (FIXTURES.md invariant 3, north_rule
'resumable from checkpoint with per-partition lineage + metrics')."""

import json
import os
import shutil

import pandas as pd
import pytest


def _read_all(out_dir):
    from filda_ray.state.manifest import read_product

    return (
        read_product(out_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_write_resume_identical(ray_session, sf_dir, tmp_path):
    from filda_ray.pipelines.flagship import write_detections
    from filda_ray.state.manifest import MANIFEST, load_done

    out1 = str(tmp_path / "full")
    write_detections(sf_dir, out1)
    full = _read_all(out1)
    assert len(full) == 500
    done = load_done(out1)
    assert sum(r["rows"] for r in done.values()) == 500
    # field metadata travels in the parquet schema (aux_infor_dict analog)
    import pyarrow.parquet as pq

    first_part = os.path.join(out1, f"part={sorted(done)[0]}", "data.parquet")
    schema = pq.read_schema(first_part)
    assert schema.field("score").metadata[b"long_name"] == b"robust z anomaly score"
    assert b"legend" in schema.field("status").metadata
    # lineage recorded per partition
    rec = next(iter(done.values()))
    assert rec["lineage"]["pipeline"] == "detect_pipeline"
    assert "extractor_version" in rec["lineage"]

    # simulate a crash: drop half the partitions (dirs + manifest lines)
    out2 = str(tmp_path / "crashed")
    shutil.copytree(out1, out2)
    parts = sorted(done)
    keep = set(parts[: len(parts) // 2])
    for p in parts:
        if p not in keep:
            shutil.rmtree(os.path.join(out2, f"part={p}"))
    with open(os.path.join(out2, MANIFEST), "w") as f:
        for p in keep:
            f.write(json.dumps(done[p]) + "\n")

    # resume: must redo ONLY the missing partitions and converge
    write_detections(sf_dir, out2)
    resumed = _read_all(out2)
    pd.testing.assert_frame_equal(resumed, full)
    done2 = load_done(out2)
    assert set(done2) == set(done)


def test_resume_skips_done_partitions(ray_session, sf_dir, tmp_path):
    from filda_ray.pipelines.flagship import detect_pipeline
    from filda_ray.state.manifest import resume_filter, write_product

    out = str(tmp_path / "prod")
    det = detect_pipeline(sf_dir)
    write_product(det, out, partition_col="pc_tile", sort_cols=["doc_id"])
    det2, done = resume_filter(detect_pipeline(sf_dir), out, "pc_tile")
    # everything done -> nothing left to write
    assert det2.count() == 0
    assert len(done) > 0

def test_inflight_tmp_attempt_not_done_and_rewrite_safe(ray_session, sf_dir, tmp_path):
    """A crashed in-flight attempt leaves a part=N.tmp-* dir that
    already contains a _SUCCESS marker; it must NOT count as done, and
    a resumed run must redo the partition and converge."""
    from filda_ray.pipelines.flagship import write_detections
    from filda_ray.state.manifest import SUCCESS, load_done

    out = str(tmp_path / "prod")
    write_detections(sf_dir, out)
    done = load_done(out)
    full = _read_all(out)
    p = sorted(done)[0]
    shutil.rmtree(os.path.join(out, f"part={p}"))
    tmp = os.path.join(out, f"part={p}.tmp-deadbeef")
    os.makedirs(tmp)
    with open(os.path.join(tmp, SUCCESS), "w") as f:
        json.dump({"partition": p, "rows": 0, "lineage": {}}, f)
    assert p not in load_done(out)
    write_detections(sf_dir, out)
    pd.testing.assert_frame_equal(_read_all(out), full)

def test_streaming_writer_equals_partitioned(ray_session, sf_dir, tmp_path):
    """write_product_streaming (native hive-partitioned streaming
    write + driver-side markers) must produce the same rows, markers
    and read-back as the per-partition writer."""
    from filda_ray.pipelines.flagship import detect_pipeline
    from filda_ray.state.manifest import (load_done, write_product,
                                          write_product_streaming)

    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    done_a = write_product(detect_pipeline(sf_dir), a_dir,
                           partition_col="pc_tile", sort_cols=["doc_id"])
    done_b = write_product_streaming(detect_pipeline(sf_dir), b_dir,
                                     partition_col="pc_tile")
    assert set(done_a) == set(done_b)
    assert all(done_a[p]["rows"] == done_b[p]["rows"] for p in done_a)
    assert all(r["lineage"]["writer"] == "streaming" for r in load_done(b_dir).values())
    a = _read_all(a_dir)
    b = _read_all(b_dir)[list(a.columns)]
    pd.testing.assert_frame_equal(a, b)

def test_streaming_writer_crash_rerun_no_duplicates(ray_session, sf_dir, tmp_path):
    """A crashed streaming run leaves stale __part= dirs; a rerun (and
    a rerun over a completed product) must not duplicate rows."""
    from filda_ray.pipelines.flagship import detect_pipeline
    from filda_ray.state.manifest import write_product_streaming

    out = str(tmp_path / "s")
    os.makedirs(out)
    # simulate in-flight leftovers from a crashed attempt
    stale = os.path.join(out, "__part=999")
    os.makedirs(stale)
    with open(os.path.join(stale, "junk.parquet"), "w") as f:
        f.write("not parquet")
    write_product_streaming(detect_pipeline(sf_dir), out, partition_col="pc_tile")
    first = _read_all(out)
    assert len(first) == 500
    assert not os.path.exists(stale)
    # rerun over the completed product: replaced, not appended
    write_product_streaming(detect_pipeline(sf_dir), out, partition_col="pc_tile")
    again = _read_all(out)
    assert len(again) == 500

def test_write_partitioned_by_hex_prefix(ray_session, sf_dir, tmp_path):
    """north_rule 'partition by H3 prefix': the product writer accepts
    the hex partition key via config; markers, lineage and resume work
    identically."""
    from filda_ray.config import RunConfig
    from filda_ray.pipelines.flagship import write_detections
    from filda_ray.state.manifest import load_done

    cfg = RunConfig()
    cfg.partition_col = "hex_prefix"
    out = str(tmp_path / "hexprod")
    write_detections(sf_dir, out, config=cfg)
    done = load_done(out)
    assert len(done) > 1
    assert sum(r["rows"] for r in done.values()) == 500
    assert next(iter(done.values()))["lineage"]["config"]["partition_col"] == "hex_prefix"
    full = _read_all(out)
    assert len(full) == 500
    # resume: drop one partition, rerun, converge
    p = sorted(done)[0]
    shutil.rmtree(os.path.join(out, f"part={p}"))
    write_detections(sf_dir, out, config=cfg)
    assert len(_read_all(out)) == 500


def test_curation_output_partitioned_by_split(ray_session, tmp_path):
    """The curation chain writes a product partitioned by its STRING
    split column (train/val/test dirs), with per-partition manifest
    rows, and the product reads back equal to the direct result."""
    from filda_ray.pipelines.queries import q_curation_pipeline
    from filda_ray.state.manifest import load_done, read_product

    sf = "/root/testdata/sf0.001"
    direct = q_curation_pipeline(sf).to_pandas()
    out = str(tmp_path / "curated")
    from filda_ray.state.manifest import write_product

    write_product(q_curation_pipeline(sf), out, partition_col="split",
                  lineage={"pipeline": "curation"})
    done = load_done(out)
    assert set(done) == set(direct["split"].unique())
    assert sum(r["rows"] for r in done.values()) == len(direct)
    back = read_product(out).to_pandas()
    key = sorted(direct.columns)
    a = direct[key].sort_values(key).reset_index(drop=True)
    b = back[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # resume over string partitions: everything done -> nothing left
    from filda_ray.state.manifest import resume_filter

    rest, done2 = resume_filter(q_curation_pipeline(sf), out, "split")
    assert set(done2) == set(done)
    assert rest.count() == 0
    # one partition missing -> only its rows remain
    import shutil as _sh

    victim = sorted(done)[0]
    _sh.rmtree(os.path.join(out, f"part={victim}"))
    rest2, _ = resume_filter(q_curation_pipeline(sf), out, "split")
    rdf = rest2.to_pandas()
    assert set(rdf["split"].unique()) == {victim}
    assert len(rdf) == done[victim]["rows"]


def test_bbox_tiles_covers_and_wraps():
    """Every point inside a bbox maps to a tile in bbox_tiles' cover;
    antimeridian-crossing boxes wrap; dilation is a superset."""
    import numpy as np

    from filda_ray.kernels.cells import bbox_tiles, pc_tile

    rng = np.random.default_rng(3)
    for (la0, la1, lo0, lo1) in [(-12.0, 7.5, 30.0, 61.0),
                                 (40.0, 55.0, 170.0, -165.0),  # wraps 180
                                 (-90.0, -80.0, -180.0, 180.0)]:
        cover = set(bbox_tiles(la0, la1, lo0, lo1).tolist())
        lats = rng.uniform(la0, la1, 500)
        if lo0 <= lo1:
            lons = rng.uniform(lo0, lo1, 500)
        else:
            lons = rng.uniform(lo0, lo1 + 360.0, 500)
            lons = ((lons + 180.0) % 360.0) - 180.0
        got = set(pc_tile(lats, lons).tolist())
        assert got <= cover
        dil = set(bbox_tiles(la0, la1, lo0, lo1, dilate=1).tolist())
        assert cover <= dil and len(dil) > len(cover)


def test_bbox_partition_pruned_read(ray_session, tmp_path):
    """A bbox query via bbox_tiles + read_product_partitions returns
    exactly the rows of a full scan filtered to the box, while opening
    only the covered partitions."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from filda_ray.kernels.cells import bbox_tiles, pc_tile
    from filda_ray.state.manifest import (read_product,
                                          read_product_partitions,
                                          write_product)

    rng = np.random.default_rng(11)
    n = 4000
    lat = rng.uniform(-60, 60, n)
    lon = rng.uniform(-180, 180, n)
    df = pd.DataFrame({"doc_id": np.arange(n), "lat": lat, "lon": lon,
                       "pc_tile": pc_tile(lat, lon).astype(np.int64)})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)
                       .replace_schema_metadata(None)).repartition(5)
    out = str(tmp_path / "prod")
    write_product(ds, out, partition_col="pc_tile")

    la0, la1, lo0, lo1 = -5.0, 25.0, 10.0, 80.0
    cover = bbox_tiles(la0, la1, lo0, lo1)
    pruned = read_product_partitions(out, cover.tolist()).to_pandas()
    full = read_product(out).to_pandas()

    def in_box(d):
        m = ((d.lat >= la0) & (d.lat <= la1)
             & (d.lon >= lo0) & (d.lon <= lo1))
        return set(d.doc_id[m].tolist())

    assert in_box(pruned) == in_box(full)
    n_parts = df["pc_tile"].nunique()
    assert len(cover) < n_parts  # the scan really is pruned
    assert set(pruned["pc_tile"]) <= set(cover.tolist())


def test_pipeline_survives_worker_death(ray_session, tmp_path):
    """Kill one map worker mid-run (os._exit — a system failure, the
    lost-node analog): Ray retries the task and the pipeline completes
    with exactly-once output semantics.  A marker file makes only the
    FIRST execution die."""
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    marker = str(tmp_path / "died_once")

    def flaky(batch: pa.Table) -> pa.Table:
        ids = batch.column("k").to_numpy()
        if 7 in ids and not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("x")
            os._exit(1)  # simulate node/worker loss, not a user error
        return pa.table({"k": ids, "sq": pa.array(ids * ids)})

    t = pa.table({"k": pa.array(np.arange(64), pa.int64())})
    out = (rd.from_arrow(t).repartition(16)
           .map_batches(flaky, batch_format="pyarrow")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert os.path.exists(marker)  # the death actually happened
    assert out["k"].tolist() == list(range(64))
    assert (out["sq"].to_numpy() == np.arange(64) ** 2).all()


def test_actor_pool_survives_actor_death(ray_session, tmp_path):
    """Same worker-loss drill for a STATEFUL actor-pool stage (the
    flagship's geocode/scorer shape): the killed actor restarts, state
    rebuilds in __init__, output is exactly-once."""
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    marker = str(tmp_path / "actor_died_once")

    class Stage:
        def __init__(self):
            self.offset = 100  # per-actor state rebuilt on restart

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("k").to_numpy()
            if 5 in ids and not os.path.exists(marker):
                with open(marker, "w") as f:
                    f.write("x")
                os._exit(1)
            return pa.table({"k": ids,
                             "v": pa.array(ids + self.offset)})

    t = pa.table({"k": pa.array(np.arange(32), pa.int64())})
    out = (rd.from_arrow(t).repartition(8)
           .map_batches(Stage, batch_format="pyarrow", concurrency=(1, 2))
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert os.path.exists(marker)
    assert out["k"].tolist() == list(range(32))
    assert (out["v"].to_numpy() == np.arange(32) + 100).all()
