"""Unit tests for grid geometry (reference: test_geoutil.py:9-30)."""

import math

import numpy as np

from spatial_aez_ray.geo import GridSpec, blklim, km2_block, km2_rows, upsample3

G1 = GridSpec("g1", 720, 360, 64)


def test_km2_equator_analytic():
    # one 0.5° pixel at the equator ≈ (111.32/2) * (110.57/2) km²
    # (reference asserts the 1 km analog within 1e-2 rel,
    # test_geoutil.py:9-17)
    rows = km2_rows(nrows=2, y_off=179, grid=G1)
    expected = (111.319 / 2) * (110.574 / 2)
    assert math.isclose(rows[0], expected, rel_tol=1e-2)
    assert math.isclose(rows[1], expected, rel_tol=1e-2)


def test_km2_decreases_toward_poles():
    rows = km2_rows(nrows=360, y_off=0, grid=G1)
    assert rows[180] > rows[10]
    assert rows[180] > rows[350]
    assert (rows > 0).all()


def test_km2_block_shape_and_row_constant():
    blk = km2_block(nrows=4, ncols=7, y_off=100, grid=G1)
    assert blk.shape == (4, 7)
    assert (blk == blk[:, :1]).all()


def test_total_earth_area():
    # sum over the whole grid ≈ earth surface area 510.1e6 km²
    rows = km2_rows(nrows=360, y_off=0, grid=G1)
    total = rows.sum() * 720
    assert math.isclose(total, 510.1e6, rel_tol=1e-3)


def test_blklim_edges():
    # geoutil.py:35-40 semantics
    assert blklim(0, 64, 720) == 64
    assert blklim(704, 64, 720) == 16
    assert blklim(320, 64, 360) == 40


def test_tile_window_covers_grid_exactly():
    seen = np.zeros((G1.height, G1.width), dtype=int)
    for ty in range(G1.tiles_y):
        for tx in range(G1.tiles_x):
            x, y, nc, nr = G1.tile_window(ty, tx)
            seen[y:y + nr, x:x + nc] += 1
    assert (seen == 1).all()


def test_upsample3_area_conservation():
    a = np.arange(12, dtype=np.float64).reshape(3, 4)
    u = upsample3(a)
    assert u.shape == (9, 12)
    assert np.isclose((u / 9.0).sum(), a.sum())
    assert (u[0:3, 0:3] == a[0, 0]).all()
