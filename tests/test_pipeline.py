"""End-to-end pipeline tests over sf0.001 (SURVEY.md §5 items 2-4)."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


@pytest.fixture(scope="module")
def flagship_df(ray_session, sf_dir):
    from filda_ray.pipelines.flagship import detect_pipeline

    return (
        detect_pipeline(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_flagship_shape_and_invariant(flagship_df):
    assert len(flagship_df) == 500
    # per-row invariant: byte-identical extracted text per url
    assert flagship_df["text_match"].all()
    # every row geocoded and admin-joined (gazetteer covers all hosts)
    assert (flagship_df["admin_id"] >= 0).all()
    assert flagship_df["status"].isin([0, 1, 2]).all()


def test_golden_tile_assignments(flagship_df):
    golden = pq.read_table(os.path.join(GOLDENS, "cells_sf0001.parquet")).to_pandas()
    got = flagship_df[["doc_id", "pc_tile", "hex_r7", "s2_l12", "hex_prefix"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, golden, check_dtype=False)


def test_golden_detections(flagship_df):
    golden = pq.read_table(os.path.join(GOLDENS, "detections_sf0001.parquet")).to_pandas()
    cols = list(golden.columns)
    got = flagship_df[cols].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, golden, check_dtype=False)


def test_repartition_invariance(ray_session, sf_dir):
    """FIXTURES.md invariant 2: results identical under repartition(k)."""
    from filda_ray.ops.background import background_stats
    from filda_ray.pipelines.flagship import narrow_pages

    base = narrow_pages(sf_dir).materialize()
    ref = None
    for k in (1, 4, 32):
        bg = (
            background_stats(base.repartition(k), "n_chars")
            .to_pandas()
            .sort_values("pc_tile")
            .reset_index(drop=True)
        )
        if ref is None:
            ref = bg
        else:
            pd.testing.assert_frame_equal(bg, ref)


def test_from_parquet_pages_equals_inline(ray_session, sf_dir, tmp_path):
    """The materialized-pages ingest path (production input_hint shape
    on disk) must produce identical detections to inline synthesis."""
    from filda_ray.pipelines.flagship import detect_pipeline
    from filda_ray.sources.pages import write_pages_parquet

    pdir = write_pages_parquet(sf_dir, str(tmp_path / "pages"))
    a = detect_pipeline(sf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = detect_pipeline(sf_dir, pages_dir=pdir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_background_hist_equals_shuffle_path(ray_session, sf_dir):
    """The exact-histogram background path must equal the general
    re-key + groupby shuffle path on occupied tiles."""
    from filda_ray.ops.background import background_stats, background_stats_shuffle
    from filda_ray.pipelines.flagship import narrow_pages

    narrow = narrow_pages(sf_dir).materialize()
    a = background_stats(narrow, "n_chars").to_pandas().sort_values("pc_tile").reset_index(drop=True)
    b = background_stats_shuffle(narrow, "n_chars").to_pandas()
    b = b[b.pc_tile.isin(a.pc_tile)].sort_values("pc_tile").reset_index(drop=True)[a.columns]
    assert len(a) == len(b)
    for c in a.columns:
        assert np.array_equal(a[c].to_numpy(), b[c].to_numpy()), c


def test_background_quantize_bounds_domain(ray_session, sf_dir):
    """quantize=q caps the histogram's value domain for continuous
    metrics; medians stay within one quantize step of exact and counts
    are unchanged."""
    from filda_ray.ops.background import background_stats
    from filda_ray.pipelines.flagship import narrow_pages

    narrow = narrow_pages(sf_dir).materialize()
    exact = background_stats(narrow, "n_chars").to_pandas().set_index("pc_tile")
    q = background_stats(narrow, "n_chars", quantize=64.0).to_pandas().set_index("pc_tile")
    assert (q.index == exact.index).all()
    assert (np.abs(exact["bg1_median"] - q["bg1_median"]) <= 64.0).all()
    assert (exact["bg1_n"] == q["bg1_n"]).all()


def test_background_float_domain_capped(ray_session):
    """A continuous float value column with quantize=q yields at most
    ceil(range/q)+1 distinct histogram values per tile — the bound that
    keeps shuffle volume and group size finite at web scale — and the
    distributed merge returns per-populated-tile stats."""
    import pyarrow as pa
    import ray.data as rd

    from filda_ray.ops.background import _hist_partial, background_stats

    rng = np.random.default_rng(7)
    n = 50_000
    vals = rng.uniform(0.0, 1000.0, n)  # ~all distinct as raw floats
    tiles = rng.integers(0, 4, n).astype(np.int32)
    tbl = pa.table({"pc_tile": tiles, "score": vals})
    part = _hist_partial(tbl, "score", "pc_tile", quantize=10.0)
    cap = 4 * (int(1000.0 / 10.0) + 1)
    assert len(part) <= cap  # stated cap: tiles x (range/q + 1)
    raw = _hist_partial(tbl, "score", "pc_tile", quantize=None)
    assert len(raw) == n  # without quantize every float is distinct
    bg = background_stats(rd.from_arrow(tbl), "score", quantize=10.0).to_pandas()
    assert set(bg["pc_tile"]) == set(np.unique(tiles))
    assert bg["bg1_n"].sum() > 0


def test_flagship_config_threads_quantize(ray_session):
    """RunConfig.quantize default (1.0) is a no-op for the integer
    value_col and parses from the namelist grammar, incl. 'None'."""
    from filda_ray.config import RunConfig

    assert RunConfig().quantize == 1.0
    assert RunConfig.from_text("Quantize : 2.5").quantize == 2.5
    assert RunConfig.from_text("Quantize : None").quantize is None


def test_background_ring_ladder(ray_session, sf_dir):
    """Configurable adaptive-window ladder rings=(1,2,4): the histogram
    and shuffle paths agree on every bg{k}_* column, and the detect
    stage escalates through the ladder (any non-final win_ring met the
    min-count threshold)."""
    from filda_ray.ops.background import background_stats, background_stats_shuffle
    from filda_ray.ops.detect import contextual_detect
    from filda_ray.pipelines.flagship import narrow_pages

    narrow = narrow_pages(sf_dir).materialize()
    rings = (1, 2, 4)
    bg = background_stats(narrow, "n_chars", rings=rings)
    a = bg.to_pandas().sort_values("pc_tile").reset_index(drop=True)
    b = background_stats_shuffle(narrow, "n_chars", rings=rings).to_pandas()
    b = b[b.pc_tile.isin(a.pc_tile)].sort_values("pc_tile").reset_index(drop=True)[a.columns]
    assert len(a) == len(b)
    for c in a.columns:
        assert np.array_equal(a[c].to_numpy(), b[c].to_numpy()), c
    det = contextual_detect(narrow, bg, "n_chars").to_pandas()
    assert set(det["win_ring"].unique()) <= set(rings)
    non_final = det[det["win_ring"] < 4]
    assert (non_final["bg_n"] >= 10).all()


def test_hex_background_vs_bruteforce(ray_session):
    """Hex-grid background median/MAD must equal an all-pairs brute
    force over hex k-ring neighborhoods."""
    import pyarrow as pa
    import ray.data as rd

    from filda_ray.kernels import cells
    from filda_ray.kernels.stats import median_mad
    from filda_ray.ops.background import background_stats_hex

    rng = np.random.RandomState(4)
    lat = 30.0 + rng.rand(300) * 0.3
    lon = -40.0 + rng.rand(300) * 0.3
    vals = rng.randint(50, 500, 300).astype(np.int64)
    cell = cells.hex_cell(lat, lon)
    ds = rd.from_arrow(pa.table({"hex_r7": pa.array(cell, pa.uint64()),
                                 "n_chars": pa.array(vals)}))
    bg = background_stats_hex(ds, "n_chars").to_pandas().set_index("cell")
    dist_ok = lambda c, k: cells.hex_distance(np.repeat(np.array([c], dtype=np.uint64), len(cell)), cell) <= k
    for c in list(bg.index)[:40]:
        for tag, k in (("bg1", 1), ("bg2", 2)):
            sel = vals[dist_ok(np.uint64(c), k)]
            med, mad = median_mad(sel.astype(np.float64))
            assert bg.loc[c, f"{tag}_n"] == len(sel)
            assert bg.loc[c, f"{tag}_median"] == med
            assert bg.loc[c, f"{tag}_mad"] == mad


def test_hex_detect_vs_bruteforce_and_join_mode(ray_session):
    """Hex-grid per-row classification: robust-z must match a brute
    force over the row's own-cell k-ring stats, and the hash-join mode
    must equal the broadcast mode row for row."""
    import pyarrow as pa
    import ray.data as rd

    from filda_ray.kernels import cells
    from filda_ray.kernels.stats import MAD_SCALE, median_mad
    from filda_ray.ops.background import background_stats_hex
    from filda_ray.ops.detect import contextual_detect_hex

    rng = np.random.RandomState(21)
    lat = 5.0 + rng.rand(300) * 0.3
    lon = 7.0 + rng.rand(300) * 0.3
    vals = rng.randint(50, 500, 300).astype(np.int64)
    cell = cells.hex_cell(lat, lon)
    tbl = pa.table({"doc_id": pa.array(np.arange(300, dtype=np.int64)),
                    "hex_r7": pa.array(cell, pa.uint64()),
                    "n_chars": pa.array(vals)})
    ds = rd.from_arrow(tbl)
    bg = background_stats_hex(ds, "n_chars").materialize()
    out = contextual_detect_hex(ds, bg, "n_chars").to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    # brute-force a sample of rows
    for i in range(0, 300, 23):
        c = np.uint64(cell[i])
        for tag, k in (("ring1", 1), ("ring2", 2)):
            sel = vals[cells.hex_distance(np.repeat(np.array([c]), len(cell)), cell) <= k]
            med, mad = median_mad(sel.astype(np.float64))
            if tag == "ring1" and len(sel) >= 10:
                break
        assert out.loc[i, "bg_median"] == med
        z = (vals[i] - med) / (MAD_SCALE * mad + 1e-9)
        assert abs(out.loc[i, "score"] - z) < 1e-12
    j = contextual_detect_hex(ds, bg, "n_chars", mode="join").to_pandas().sort_values(
        "doc_id").reset_index(drop=True)[out.columns]
    for c in out.columns:
        assert np.array_equal(out[c].to_numpy(), j[c].to_numpy()), c


def test_hex_background_repartition_invariance(ray_session):
    """The halo-exchange hex background must be exact across partition
    boundaries: identical output under different block layouts."""
    import pyarrow as pa
    import ray.data as rd

    from filda_ray.kernels import cells
    from filda_ray.ops.background import background_stats_hex

    rng = np.random.RandomState(11)
    lat = 10.0 + rng.rand(400) * 0.5
    lon = 20.0 + rng.rand(400) * 0.5
    cell = cells.hex_cell(lat, lon)
    tbl = pa.table({"hex_r7": pa.array(cell, pa.uint64()),
                    "n_chars": pa.array(rng.randint(10, 900, 400).astype(np.int64))})
    ref = None
    for parts in (2, 16):
        ds = rd.from_arrow(tbl).repartition(parts)
        out = background_stats_hex(ds, "n_chars").to_pandas().sort_values(
            "cell").reset_index(drop=True)
        if ref is None:
            ref = out
        else:
            assert ref.equals(out)


def test_op_repartition_invariance(ray_session, sf_dir):
    """More FIXTURES invariant-2 coverage: dedup pair sets, kNN
    counts, and hash-sample membership identical under repartition."""
    import ray.data as rd

    from filda_ray.ops.dedup import simhash_pairs
    from filda_ray.ops.hotspot import knn_hotspots
    from filda_ray.ops.sample import hash_sample
    from filda_ray.pipelines.flagship import narrow_pages

    narrow = narrow_pages(sf_dir).materialize()
    ref_knn = ref_sample = None
    for k in (2, 16):
        part = narrow.repartition(k)
        knn = knn_hotspots(part).to_pandas().sort_values("doc_id")["n_kring"].to_numpy()
        samp = hash_sample(part, "doc_id", 0.3).to_pandas()["doc_id"].sort_values().to_numpy()
        if ref_knn is None:
            ref_knn, ref_sample = knn, samp
        else:
            assert np.array_equal(knn, ref_knn)
            assert np.array_equal(samp, ref_sample)

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ref_pairs = None
    for k in (1, 8):
        pairs = simhash_pairs(docs.repartition(k)).to_pandas()
        s = set(zip(pairs.doc_a, pairs.doc_b))
        if ref_pairs is None:
            ref_pairs = s
        else:
            assert s == ref_pairs


def test_detections_only_filter(ray_session, sf_dir):
    from filda_ray.pipelines.flagship import detections_only

    df = detections_only(sf_dir).to_pandas()
    assert (df["status"] > 0).all()


def test_metrics_stage(ray_session, sf_dir):
    from filda_ray.pipelines.flagship import detect_pipeline
    from filda_ray.state.metrics import get_metrics_actor, snapshot

    actor = get_metrics_actor("test_metrics")
    import ray

    ray.get(actor.reset.remote())
    det = detect_pipeline(sf_dir, with_metrics=True)
    n = det.count()
    import time

    time.sleep(0.5)  # metric adds are fire-and-forget
    snap = snapshot(get_metrics_actor("filda_metrics"))
    assert snap.get("narrow_pages", 0) >= n
    assert snap.get("classified", 0) >= n


def test_flagship_handles_null_html(ray_session, tmp_path):
    """Common-Crawl-style robustness: pages with null html/text (and
    invalid-UTF-8 html) flow through the full flagship — extraction
    yields '' (n_chars 0), classification still completes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from filda_ray.pipelines.flagship import detect_pipeline

    n = 40
    urls = [f"https://host{i % 7:04d}.example.com/doc/{i}" for i in range(n)]
    htmls = []
    for i in range(n):
        if i % 10 == 0:
            htmls.append(None)
        elif i % 10 == 5:
            htmls.append(b"<body>bad \xff bytes</body>")
        else:
            htmls.append(f"<html><body>doc {i} content {'x' * (i * 13 % 211)}</body></html>".encode())
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array([1_704_067_200_000_000 + i for i in range(n)], pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array([None] * n, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
    })
    pdir = str(tmp_path / "pages")
    import os

    os.makedirs(pdir)
    pq.write_table(tbl, os.path.join(pdir, "part0.parquet"))
    out = detect_pipeline(None, pages_dir=pdir).to_pandas()
    assert len(out) == n
    nulls = out[out.doc_id % 10 == 0]
    assert (nulls.n_chars == 0).all()
    assert out.status.isin([0, 1, 2]).all()
    bad = out[out.doc_id % 10 == 5]
    assert (bad.n_chars > 0).all()  # invalid UTF-8 decoded with replacement


def test_extract_repairs_only_invalid_rows(monkeypatch):
    """A batch with 1% bad bytes must keep the 99% on the Arrow path:
    the scalar errors='replace' kernel sees ONLY the invalid rows, and
    the reassembled output equals the all-scalar reference."""
    import pyarrow as pa

    from filda_ray.kernels import textkit

    n = 500
    htmls = [f"<html><body>doc {i} body text</body></html>".encode()
             for i in range(n)]
    bad_rows = {37, 123, 409, 499, 0}
    for i in bad_rows:
        htmls[i] = b"<body>bad \xff\xfe bytes " + str(i).encode() + b"</body>"
    arr = pa.array(htmls, pa.binary())

    seen = []
    orig = textkit.extract_text

    def spy(vals):
        seen.extend(vals)
        return orig(vals)

    monkeypatch.setattr(textkit, "extract_text", spy)
    got = textkit.extract_text_arrow(arr).to_pylist()
    monkeypatch.undo()
    assert len(seen) == len(bad_rows)  # scalar path saw ONLY bad rows
    want = textkit.extract_text(htmls).tolist()
    assert got == want
