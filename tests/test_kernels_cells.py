import duckdb
import numpy as np

from filda_ray.kernels import cells


def _rand_points(n=5000, seed=3):
    rng = np.random.RandomState(seed)
    lat = -60 + 145 * rng.rand(n)
    lon = -180 + 360 * rng.rand(n)
    return lat, lon


def test_pc_tile_matches_sql():
    lat, lon = _rand_points()
    got = cells.pc_tile(lat, lon)
    con = duckdb.connect()
    con.register("pts", __import__("pyarrow").table({"lat": lat, "lon": lon}))
    sql = (
        "SELECT least(cast(floor((lat+90)/10.0) as bigint), 17) * 36 + "
        "((cast(floor((lon+180)/10.0) as bigint) % 36) + 36) % 36 AS t FROM pts"
    )
    want = con.sql(sql).fetchnumpy()["t"]
    assert np.array_equal(got.astype(np.int64), want)


def test_pc_neighbors_wrap_and_clamp():
    # tile at col 0 wraps to col 35; tile at row 0 clamps (self-substitute)
    t = cells.pc_tile(np.array([-89.0]), np.array([-179.9]))  # row 0, col 0
    nb, keep = cells.pc_distinct_neighbors_mask(t, ring=1)
    ids = set(nb[0][keep[0]].tolist())
    assert int(t[0]) in ids
    assert 35 in ids  # wrapped col
    assert all(0 <= i < 648 for i in ids)
    # interior tile has 9 distinct neighbors
    t2 = cells.pc_tile(np.array([0.0]), np.array([0.0]))
    nb2, keep2 = cells.pc_distinct_neighbors_mask(t2, ring=1)
    assert keep2[0].sum() == 9


def test_hex_round_trip():
    lat, lon = _rand_points()
    cell = cells.hex_cell(lat, lon, res=7)
    res, q, r = cells.hex_unpack(cell)
    assert (res == 7).all()
    clat, clon = cells.hex_center(q, r, 7)
    cell2 = cells.hex_cell(clat, clon, res=7)
    assert np.array_equal(cell, cell2)
    # the containing hex center is within one circumradius
    size = cells.HEX_BASE_DEG / 3.0**7
    d = np.hypot(clat - lat, clon - lon)
    assert (d <= size * 1.0001).all()


def test_hex_ring_and_disk():
    assert cells.hex_ring_offsets(0).shape == (1, 2)
    for k in (1, 2, 3):
        ring = cells.hex_ring_offsets(k)
        assert ring.shape == (6 * k, 2)
        # every ring offset is at hex distance exactly k
        dq, dr = ring[:, 0], ring[:, 1]
        dist = (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2
        assert (dist == k).all()
        assert len({tuple(x) for x in ring.tolist()}) == 6 * k
    disk = cells.hex_disk_offsets(2)
    assert disk.shape == (1 + 3 * 2 * 3, 2)  # 19


def test_hex_disk_distance_consistency():
    lat, lon = _rand_points(50)
    cell = cells.hex_cell(lat, lon)
    disk = cells.hex_disk(cell, 2)
    for j in range(disk.shape[1]):
        d = cells.hex_distance(cell, disk[:, j])
        assert (d <= 2).all()


def test_hex_prefix_groups_neighbors():
    lat, lon = _rand_points(200)
    cell = cells.hex_cell(lat, lon)
    pfx = cells.hex_prefix(cell)
    assert pfx.dtype == np.uint32
    # prefix is a function of the cell
    pfx2 = cells.hex_prefix(cell)
    assert np.array_equal(pfx, pfx2)


def test_hex_parent_contains_child_center():
    lat, lon = _rand_points(500)
    child = cells.hex_cell(lat, lon, res=7)
    parent = cells.hex_parent(child, 5)
    res, q, r = cells.hex_unpack(child)
    clat, clon = cells.hex_center(q, r, 7)
    direct = cells.hex_cell(clat, clon, res=5)
    assert np.array_equal(parent, direct)
