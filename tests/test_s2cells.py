"""Structural contract of the S2-style cell ids (hierarchy, ranges)."""

import numpy as np

from spatial_aez_ray import s2cells


def _rand_lonlat(n, seed=11):
    rng = np.random.RandomState(seed)
    return (rng.uniform(-180, 180, n),
            np.degrees(np.arcsin(rng.uniform(-1, 1, n))))  # area-uniform


def test_level_roundtrip_and_sentinel():
    lon, lat = _rand_lonlat(500)
    for level in (0, 1, 5, 12, 30):
        ids = s2cells.cell_id(lon, lat, level)
        assert (s2cells.level_of(ids) == level).all()
        # trailing sentinel: id is odd iff level == MAX_LEVEL
        lsb = ids & (~ids + np.uint64(1))
        assert (lsb == np.uint64(1) << np.uint64(
            2 * (s2cells.MAX_LEVEL - level))).all()


def test_parent_contains_children():
    lon, lat = _rand_lonlat(1000)
    fine = s2cells.cell_id(lon, lat, 20)
    for coarse_level in (4, 10, 19):
        coarse = s2cells.cell_id(lon, lat, coarse_level)
        # same-point coarse cell == parent of the fine cell
        assert (s2cells.parent(fine, coarse_level) == coarse).all()
        lo, hi = s2cells.range_of(coarse)
        assert ((fine >= lo) & (fine <= hi)).all()


def test_all_faces_covered_and_distinct_cells():
    lon, lat = _rand_lonlat(5000)
    ids = s2cells.cell_id(lon, lat, 30)
    faces = (ids >> np.uint64(61)).astype(int)
    assert set(faces) == set(range(6))
    # area-uniform sample at level 30: collisions virtually impossible
    assert len(np.unique(ids)) == len(ids)


def test_hilbert_locality_beats_row_major():
    """Mean id distance between neighboring grid points should be FAR
    smaller than between random pairs (the locality property range
    partitioning relies on)."""
    lon = np.linspace(10, 11, 200)
    lat = np.full(200, 45.0)
    ids = s2cells.cell_id(lon, lat, 30).astype(np.float64)
    neighbor = np.abs(np.diff(ids)).mean()
    rng = np.random.RandomState(3)
    lon_r, lat_r = _rand_lonlat(200)
    rand_ids = s2cells.cell_id(lon_r, lat_r, 30).astype(np.float64)
    random_pairs = np.abs(np.diff(rand_ids)).mean()
    assert neighbor < random_pairs / 1e3


def test_tokens_sortable_and_stable():
    lon, lat = _rand_lonlat(50)
    ids = s2cells.cell_id(lon, lat, 16)
    toks = s2cells.token(ids)
    assert len(set(toks)) == len(set(ids.tolist()))
    # token order == id order (hex of left-aligned ids)
    order_ids = np.argsort(ids, kind="stable")
    order_tok = np.argsort(np.array(
        [t.ljust(16, "0") for t in toks]), kind="stable")
    assert (order_ids == order_tok).all()
