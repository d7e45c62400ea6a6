import numpy as np

from filda_ray.kernels import s2


def _rand_points(n=5000, seed=5):
    rng = np.random.RandomState(seed)
    lat = -89.9 + 179.8 * rng.rand(n)
    lon = -180 + 360 * rng.rand(n)
    return lat, lon


def test_id_structure():
    lat, lon = _rand_points()
    cell = s2.s2_cell(lat, lon, level=12)
    assert cell.dtype == np.uint64
    assert (s2.s2_level(cell) == 12).all()
    face = s2.s2_face(cell)
    assert ((face >= 0) & (face <= 5)).all()
    # trailing bit pattern: lsb at 2*(30-12)=36
    lsb = cell & (~cell + np.uint64(1))
    assert (lsb == np.uint64(1) << np.uint64(36)).all()


def test_face_recovery():
    # points on cardinal directions map to the right faces
    lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    cell = s2.s2_cell(lat, lon, 12)
    assert s2.s2_face(cell).tolist() == [0, 1, 2, 3, 4, 5]


def test_round_trip_center():
    lat, lon = _rand_points()
    cell = s2.s2_cell(lat, lon, 12)
    clat, clon = s2.s2_cell_center(cell, 12)
    cell2 = s2.s2_cell(clat, clon, 12)
    assert np.array_equal(cell, cell2)
    # center within cell-scale distance of original point (level 12 ~ 3km)
    from filda_ray.kernels.geo import haversine_km

    d = haversine_km(lat, lon, clat, clon)
    assert d.max() < 10.0


def test_parent_is_prefix():
    lat, lon = _rand_points(1000)
    c12 = s2.s2_cell(lat, lon, 12)
    c8 = s2.s2_cell(lat, lon, 8)
    assert np.array_equal(s2.s2_parent(c12, 8), c8)
    assert (s2.s2_level(c8) == 8).all()


def test_hilbert_locality():
    # consecutive points along a small path mostly share parents —
    # weak locality check of the Hilbert ordering
    lat = np.full(100, 10.0)
    lon = 20.0 + np.arange(100) * 1e-4
    cell = s2.s2_cell(lat, lon, 12)
    # all within a tiny strip -> few distinct cells and they are close in id space
    uniq = np.unique(cell)
    assert uniq.size <= 3


def test_uv_st_inverse():
    u = np.linspace(-1, 1, 101)
    s = s2.uv_to_st(u)
    u2 = s2.st_to_uv(s)
    assert np.allclose(u, u2, atol=1e-12)
