"""Bloom-filter join pre-filtering and Misra–Gries heavy hitters."""

import collections

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from filda_ray.ops import bloom as B
from filda_ray.ops import relational as rel
from filda_ray.ops.sketch import _mg_trim, approx_heavy_hitters


def _rd():
    import ray.data as rd

    return rd


def _mk_left(n=20000, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array(rng.integers(0, 5000, n).astype(np.int64)),
        "row": pa.array(np.arange(n, dtype=np.int64)),
    })


def _mk_right(seed=4):
    rng = np.random.default_rng(seed)
    keys = np.unique(rng.integers(0, 5000, 700).astype(np.int64))
    return pa.table({"rk": pa.array(keys)})


def test_bloom_membership_no_false_negatives(ray_session):
    rd = _rd()
    right = _mk_right()
    bl = B.bloom_build(rd.from_arrow(right).repartition(4), "rk")
    inserted = right.column("rk").to_numpy()
    h = B.key_hash_u64(pa.array(inserted))
    assert B.Bloom(bl.words, bl.num_bits, bl.num_hashes, bl.seed).contains(h).all()
    # false-positive rate over a disjoint domain stays near design fpp
    probe = np.arange(100000, 200000, dtype=np.int64)
    fp = bl.contains(B.key_hash_u64(pa.array(probe))).mean()
    assert fp < 0.01


@pytest.mark.parametrize("anti", [False, True])
@pytest.mark.parametrize("verify", ["broadcast", "join"])
def test_bloom_semi_anti_exact(ray_session, anti, verify):
    rd = _rd()
    left, right = _mk_left(), _mk_right()
    out = B.bloom_semi_anti_join(
        rd.from_arrow(left).repartition(4), rd.from_arrow(right).repartition(2),
        on="k", right_on="rk", anti=anti, verify=verify,
    ).to_pandas().sort_values("row").reset_index(drop=True)
    exp = rel.semi_anti_filter(
        rd.from_arrow(left), right.column("rk").to_numpy(), on="k", anti=anti
    ).to_pandas().sort_values("row").reset_index(drop=True)
    pd.testing.assert_frame_equal(out[["k", "row"]], exp[["k", "row"]])


def test_bloom_string_keys(ray_session):
    rd = _rd()
    left = pa.table({"s": pa.array([f"host{i % 50}.example" for i in range(2000)])})
    right = pa.table({"s": pa.array([f"host{i}.example" for i in range(0, 50, 2)])})
    out = B.bloom_semi_anti_join(rd.from_arrow(left), rd.from_arrow(right), on="s")
    got = out.to_pandas()["s"]
    assert len(got) == 2000 // 2  # even hosts only
    assert set(got.str.extract(r"host(\d+)")[0].astype(int) % 2) == {0}


def test_bloom_prefilter_definitely_not_is_exact(ray_session):
    rd = _rd()
    left, right = _mk_left(), _mk_right()
    bl = B.bloom_build(rd.from_arrow(right), "rk")
    neg = B.bloom_prefilter(rd.from_arrow(left), bl, on="k",
                            keep="definitely_not").to_pandas()
    # no false negatives: every kept row's key is truly absent
    assert not np.isin(neg["k"].to_numpy(), right.column("rk").to_numpy()).any()


def test_mg_trim_bound():
    keys = np.arange(10)
    counts = np.array([100, 90, 80, 5, 4, 3, 2, 2, 1, 1], dtype=np.int64)
    k, c, err = _mg_trim(keys, counts, 3)
    assert err == 5 and list(k) == [0, 1, 2]
    assert list(c) == [95, 85, 75]
    # untrimmed when capacity suffices
    k2, c2, err2 = _mg_trim(keys, counts, 10)
    assert err2 == 0 and len(k2) == 10


def test_heavy_hitters_exact_when_capacity_sufficient(ray_session):
    rd = _rd()
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 200, 30000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": pa.array(vals)})).repartition(8)
    hh = approx_heavy_hitters(ds, "k", capacity=4096, top_n=25)
    true = pd.Series(vals).value_counts()
    exp = (
        pd.DataFrame({"key": true.index.to_numpy(), "est_count": true.to_numpy()})
        .sort_values(["est_count", "key"], ascending=[False, True])
        .head(25).reset_index(drop=True)
    )
    assert (hh["err_upper"] == 0).all()
    assert list(hh["key"]) == list(exp["key"])
    assert list(hh["est_count"]) == list(exp["est_count"])


def test_heavy_hitters_mg_bounds_on_zipf(ray_session):
    rd = _rd()
    rng = np.random.default_rng(7)
    vals = (rng.zipf(1.3, 200000) % 3000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": pa.array(vals)})).repartition(16)
    hh = approx_heavy_hitters(ds, "k", capacity=64)
    true = collections.Counter(vals.tolist())
    total = len(vals)
    for _, row in hh.iterrows():
        t = true[int(row["key"])]
        assert row["est_count"] <= t <= row["est_count"] + row["err_upper"]
    # aggregate error bound: err_upper ≤ total / capacity per merge
    # level; two levels here
    assert int(hh["err_upper"].iloc[0]) <= 2 * total // 64
    # the true top key always survives
    assert true.most_common(1)[0][0] in set(hh["key"].astype(int))


def test_heavy_hitters_null_keys_excluded(ray_session):
    rd = _rd()
    t = pa.table({"k": pa.array(["a", "a", None, "b", None, "a"])})
    hh = approx_heavy_hitters(rd.from_arrow(t), "k", capacity=16)
    assert list(hh["key"]) == ["a", "b"]
    assert list(hh["est_count"]) == [3, 1]


def test_grouped_quantiles_exact_when_small(ray_session):
    rd = _rd()
    rng = np.random.default_rng(5)
    keys = np.repeat(np.arange(40), 60)
    vals = rng.normal(keys * 10.0, 3.0)
    order = rng.permutation(len(keys))
    t = pa.table({"g": pa.array(keys[order]), "v": pa.array(vals[order])})
    from filda_ray.ops.sketch import approx_quantiles_per_key

    out = approx_quantiles_per_key(
        rd.from_arrow(t).repartition(8), "g", "v", qs=(0.5,), k=256
    ).to_pandas().sort_values("g").reset_index(drop=True)
    # n=60 <= k=256: exact nearest-rank median per key
    for g in range(40):
        v = np.sort(vals[keys == g])
        assert out.loc[g, "q50"] == v[int(np.ceil(0.5 * 60)) - 1]


def test_grouped_quantiles_rank_error_when_large(ray_session):
    rd = _rd()
    rng = np.random.default_rng(9)
    keys = np.repeat(np.arange(4), 20000)
    vals = rng.uniform(0, 1, len(keys)) + keys  # key g uniform in [g, g+1]
    t = pa.table({"g": pa.array(keys), "v": pa.array(vals)})
    from filda_ray.ops.sketch import approx_quantiles_per_key

    out = approx_quantiles_per_key(
        rd.from_arrow(t).repartition(16), "g", "v", qs=(0.25, 0.9), k=256
    ).to_pandas().sort_values("g").reset_index(drop=True)
    # KLL rank error ~ O(1/k); allow 5% rank slack on uniform data
    for g in range(4):
        assert abs(out.loc[g, "q25"] - (g + 0.25)) < 0.05
        assert abs(out.loc[g, "q90"] - (g + 0.9)) < 0.05
