"""WKB codec and Morton cell encoding units."""

import numpy as np

from spatial_aez_ray import wkb
from spatial_aez_ray import cells


def test_wkb_roundtrip_polygon():
    g = wkb.box(-10.0, -5.0, 20.0, 15.0)
    buf = wkb.dumps(g)
    g2 = wkb.loads(buf)
    assert len(g2) == 1 and len(g2[0]) == 1
    assert np.allclose(g2[0][0], g[0][0])
    assert wkb.bounds(g2) == (-10.0, -5.0, 20.0, 15.0)


def test_wkb_roundtrip_multipolygon_with_hole():
    outer = wkb.box(0, 0, 10, 10)[0][0]
    hole = wkb.box(2, 2, 4, 4)[0][0][::-1].copy()
    other = wkb.box(20, 20, 25, 25)[0][0]
    g = [[outer, hole], [other]]
    g2 = wkb.loads(wkb.dumps(g))
    assert len(g2) == 2
    assert len(g2[0]) == 2
    assert np.allclose(g2[0][1], hole)


def test_morton_roundtrip():
    rng = np.random.default_rng(7)
    ix = rng.integers(0, 2**20, 1000)
    iy = rng.integers(0, 2**20, 1000)
    c = cells.encode_xy(ix, iy, 20)
    rx, ry, lvl = cells.decode(c)
    assert (rx == ix).all() and (ry == iy).all() and (lvl == 20).all()


def test_morton_locality_prefix():
    # all four children of a parent share the parent's morton prefix
    c = cells.encode_xy(np.array([10]), np.array([20]), 8)
    for dx in (0, 1):
        for dy in (0, 1):
            ch = cells.encode_xy(np.array([20 + dx]), np.array([40 + dy]), 9)
            assert cells.parent(ch)[0] == c[0]


def test_encode_lonlat_range():
    lon = np.array([-179.9, 0.0, 179.9])
    lat = np.array([-89.9, 0.0, 89.9])
    c = cells.encode_lonlat(lon, lat, 10)
    ix, iy, lvl = cells.decode(c)
    assert (ix >= 0).all() and (ix < 1024).all()
    assert (iy >= 0).all() and (iy < 1024).all()


def test_prefix_token_groups_neighbors():
    lon = np.array([10.0, 10.01, -120.0])
    lat = np.array([45.0, 45.01, -30.0])
    c = cells.encode_lonlat(lon, lat, 16)
    p = cells.prefix_token(c, 6)
    assert p[0] == p[1]
    assert p[0] != p[2]


def test_grid3_parent_exact():
    r = np.array([0, 1, 2, 3, 5, 299])
    c = np.array([0, 2, 3, 4, 8, 2159])
    pr, pc = cells.grid3_parent(r, c)
    assert (pr == r // 3).all() and (pc == c // 3).all()
