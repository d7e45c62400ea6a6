import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(rows: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(rows))


def test_normalize_columns(ray_session):
    from filda_ray.ops.ingest import normalize_op

    ds = _ds({"old_name": [1.0, -999.0, 3.0], "qa_bad": [False, False, True]})
    out = normalize_op(
        ds,
        rename={"old_name": "x"},
        fill_values={"x": -999.0},
        scale_offset={"x": (2.0, 1.0)},
        invalidate={"x": "qa_bad"},
    ).to_pandas()
    # -999 -> null BEFORE scaling; QA flag nulls the last row
    assert out["x"].tolist()[0] == 3.0
    assert pd.isna(out["x"]).tolist() == [False, True, True]


def test_salted_count_equals_plain(ray_session, sf_dir):
    from filda_ray.ops.rollup import salted_aggregate_count
    from filda_ray.pipelines.flagship import narrow_pages

    narrow = narrow_pages(sf_dir).materialize()
    salted = (
        salted_aggregate_count(narrow, "host_id", n_salts=16, out_col="n")
        .to_pandas()
        .sort_values("host_id")
        .reset_index(drop=True)
    )
    plain = (
        narrow.groupby("host_id").count().to_pandas().sort_values("host_id").reset_index(drop=True)
    )
    assert salted["host_id"].tolist() == plain["host_id"].tolist()
    assert salted["n"].tolist() == plain["count()"].tolist()
    # skew exists: the hottest host holds >1% of rows (zipf-ish head)
    assert salted["n"].max() > 0.01 * salted["n"].sum()


def test_weighted_resample_renormalizes_missing(ray_session):
    import ray.data as rd

    from filda_ray.ops.rollup import weighted_resample

    values = pa.table({"key": [1, 2], "v": [10.0, 20.0]})
    edges = rd.from_arrow(
        pa.table(
            {
                "dst": [100, 100, 100, 200],
                "src": [1, 2, 99, 99],  # 99 missing -> renormalize / all-miss
                "weight": [0.5, 0.25, 0.25, 1.0],
            }
        )
    )
    out = weighted_resample(values, edges, key_col="key").to_pandas().set_index("key")
    # dst 100: (0.5*10 + 0.25*20) / 0.75
    assert np.isclose(out.loc[100, "resampled"], (0.5 * 10 + 0.25 * 20) / 0.75)
    assert out.loc[100, "n_src"] == 2
    assert np.isnan(out.loc[200, "resampled"]) and out.loc[200, "n_src"] == 0


def test_parent_rollup_arithmetic(ray_session):
    from filda_ray.ops.rollup import parent_rollup

    # tiles: (row 0, col 0), (row 0, col 1) -> same parent (0); (row 2, col 0) -> parent 18
    ds = _ds({"pc_tile": [0, 1, 72], "n_chars": [10, 20, 30]})
    out = parent_rollup(ds, value_col="n_chars", factor=2).to_pandas().set_index("parent_tile")
    assert out.loc[0, "n"] == 2 and out.loc[0, "mean_value"] == 15.0
    assert out.loc[18, "n"] == 1 and out.loc[18, "sum_value"] == 30.0
