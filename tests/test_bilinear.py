"""Bilinear upsample — integer stencil semantics + decomposition
(see pipelines/warp.py upsample_bilinear)."""

import numpy as np

from spatial_aez_ray import fixtures, oracle
from spatial_aez_ray.pipelines import warp


def test_bilinear_bit_exact(tiny_world):
    for ds, k in (("kg", 3), ("wk", 2)):
        mine = warp.upsample_bilinear(tiny_world, ds, k)
        want = oracle.upsample_bilinear_oracle(fixtures.TINY, ds, k)
        assert mine.equals(want), (ds, k)


def test_bilinear_k1_identity(tiny_world):
    """k=1 degenerates to the identity resample: the histogram equals
    the raw value histogram of present pixels."""
    mine = warp.upsample_bilinear(tiny_world, "kg", 1)
    base = oracle.full_raster(fixtures.TINY, "kg")[0]
    nodata = fixtures.DATASET_NODATA["kg"]
    grid = fixtures.TINY.grid("g1")
    land_idx = fixtures.land_index(fixtures.TINY.seed)
    present = np.ones(base.shape, bool)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            if fixtures.tile_arrays(fixtures.TINY, "kg", ty, tx,
                                    land_idx) is None:
                x, y, nc, nr = grid.tile_window(ty, tx)
                present[y:y + nr, x:x + nc] = False
    vals = base[present].astype(np.int64)
    vals = np.where(vals == nodata, -1, vals)
    u, n = np.unique(vals, return_counts=True)
    got = dict(zip(mine["value"], mine["n_px"]))
    assert got == dict(zip(u.tolist(), n.tolist()))


def test_bilinear_mass_conservation(tiny_world):
    """Total output pixels = k² × present input pixels."""
    k = 2
    mine = warp.upsample_bilinear(tiny_world, "kg", k)
    base_hist = warp.upsample_bilinear(tiny_world, "kg", 1)
    assert int(mine["n_px"].sum()) == k * k * int(base_hist["n_px"].sum())
