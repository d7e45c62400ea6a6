import numpy as np

from filda_ray.sources import polygons as PG


def _rand_points(n=2000, seed=9):
    rng = np.random.RandomState(seed)
    lat = -60 + 145 * rng.rand(n)
    lon = -180 + 360 * rng.rand(n)
    return lat, lon


def test_pip_vs_winding_oracle():
    polys = PG.biome_polygons(10)
    rng = np.random.RandomState(1)
    for _, _, verts in polys:
        x0, y0 = verts.min(axis=0) - 2
        x1, y1 = verts.max(axis=0) + 2
        px = x0 + (x1 - x0) * rng.rand(300)
        py = y0 + (y1 - y0) * rng.rand(300)
        got = PG.point_in_polygon(px, py, verts)
        want = np.array([PG.winding_number_inside(x, y, verts) for x, y in zip(px, py)])
        assert np.array_equal(got, want)


def test_pip_edge_rule():
    # unit box: bottom/left edges inside, top/right outside (floor semantics)
    box = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    px = np.array([0.5, 0.5, 0.0, 1.0, 0.5])
    py = np.array([0.0, 1.0, 0.5, 0.5, 0.5])
    got = PG.point_in_polygon(px, py, box)
    assert got.tolist() == [True, False, True, False, True]


def test_grid_index_admin_matches_analytic():
    lat, lon = _rand_points()
    idx = PG.GridIndex(PG.admin_polygons())
    got = idx.query(lon, lat)
    want = PG.admin_id_analytic(lat, lon)
    assert np.array_equal(got, want)


def test_grid_index_biome_matches_bruteforce():
    lat, lon = _rand_points(500)
    polys = PG.biome_polygons()
    idx = PG.GridIndex(polys)
    got = idx.query(lon, lat)
    # brute force first-match
    want = np.full(lat.shape, -1, dtype=np.int32)
    for pid, _, verts in polys:
        hit = PG.point_in_polygon(lon, lat, verts) & (want == -1)
        want[hit] = pid
    assert np.array_equal(got, want)


def test_admin_analytic_matches_sql():
    import duckdb
    import pyarrow as pa

    lat, lon = _rand_points(1000)
    con = duckdb.connect()
    con.register("p", pa.table({"lat": lat, "lon": lon}))
    want = con.sql(f"select {PG.sql_admin_id('lat','lon')} as a from p").fetchnumpy()["a"]
    assert np.array_equal(PG.admin_id_analytic(lat, lon).astype(want.dtype), want)
