"""PolygonIndex geometry semantics: covers, holes, ties, snap."""

import numpy as np

from spatial_aez_ray import wkb
from spatial_aez_ray.geo import GridSpec
from spatial_aez_ray.state.pipindex import PolygonIndex


def _index(feats):
    return PolygonIndex([(i, name, wkb.dumps(g)) for i, (name, g) in enumerate(feats)])


def test_covers_basic_square():
    idx = _index([("A", wkb.box(0, 0, 10, 10))])
    lon = np.array([5.0, 10.0, 10.0001, -0.0001, 0.0])
    lat = np.array([5.0, 5.0, 5.0, 5.0, 0.0])
    got = idx.covers_points(0, lon, lat)
    # boundary-inclusive: edge and corner count as covered
    assert got.tolist() == [True, True, False, False, True]


def test_hole_excluded_enclave_included():
    outer = wkb.box(0, 0, 10, 10)[0][0]
    hole = wkb.box(4, 4, 6, 6)[0][0][::-1].copy()
    idx = _index([("Holey", [[outer, hole]]),
                  ("Enclave", wkb.box(4.5, 4.5, 5.5, 5.5))])
    lon = np.array([5.0, 1.0])
    lat = np.array([5.0, 1.0])
    assert idx.covers_points(0, lon, lat).tolist() == [False, True]
    assert idx.covers_points(1, lon, lat).tolist() == [True, False]


def test_multipolygon():
    g = [wkb.box(0, 0, 2, 2)[0], wkb.box(10, 10, 12, 12)[0]]
    idx = _index([("M", g)])
    lon = np.array([1.0, 11.0, 5.0])
    lat = np.array([1.0, 11.0, 5.0])
    assert idx.covers_points(0, lon, lat).tolist() == [True, True, False]


def test_shared_border_double_claim():
    idx = _index([("L", wkb.box(0, 0, 5, 10)), ("R", wkb.box(5, 0, 10, 10))])
    lon = np.array([5.0])
    lat = np.array([3.0])
    assert idx.covers_points(0, lon, lat)[0]
    assert idx.covers_points(1, lon, lat)[0]


def test_assign_tile_interior_shortcut_matches_perpixel():
    grid = GridSpec("t", 720, 360, 64)
    big = wkb.box(-120.0, -50.0, 60.0, 60.0)
    idx = _index([("Big", big)])
    # interior tile (fully inside) and a boundary tile must both agree
    # with the direct per-pixel covers test
    for ty, tx in [(2, 3), (0, 2), (2, 1)]:
        x, y, nc, nr = grid.tile_window(ty, tx)
        lons = grid.lons(x, nc)
        lats = grid.lats(y, nr)
        glon = np.broadcast_to(lons[None, :], (nr, nc)).ravel()
        glat = np.broadcast_to(lats[:, None], (nr, nc)).ravel()
        want = idx.covers_points(0, glon, glat).reshape(nr, nc)
        claims = idx.assign_tile(grid, ty, tx)
        got = np.zeros((nr, nc), dtype=bool)
        for _, _, m in claims:
            got |= m
        assert (got == want).all(), (ty, tx)


def test_snap_nearest_and_tolerance():
    idx = _index([("A", wkb.box(0, 0, 10, 10)), ("B", wkb.box(20, 0, 30, 10))])
    lon = np.array([10.5, 19.5, 15.0, 10.4])
    lat = np.array([5.0, 5.0, 5.0, 50.0])
    pos = idx.snap(lon, lat, tol=1.0)
    assert pos.tolist() == [0, 1, -1, -1]


def test_snap_tie_lowest_position():
    idx = _index([("A", wkb.box(0, 0, 10, 10)), ("B", wkb.box(12, 0, 22, 10))])
    # exactly between the two boundaries (x=10 and x=12)
    pos = idx.snap(np.array([11.0]), np.array([5.0]), tol=2.0)
    assert pos[0] == 0
