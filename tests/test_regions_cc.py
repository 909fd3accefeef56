"""Forced-distributed seam resolution == driver union-find, bit-exact.

``label_regions`` / ``region_adjacency`` / ``polygonize_regions``
resolve their seam-equivalence graphs with a driver union-find by
default; above ``regions.UF_DRIVER_MAX_PAIRS`` the same resolution
runs as distributed min-label connected components
(``datapipe.dedup.connected_components``) with a join-based remap.
Both compute root = min member id, so results must be IDENTICAL;
these tests force the components path (``regions.FORCE_CC``) and
assert frame equality — including ``sieve_summary``, whose inputs are
the two swapped kernels (round-5 verdict task 3).
"""

import pandas as pd
import pytest

from spatial_aez_ray.pipelines import regions


def _both(fn):
    regions.FORCE_CC = False
    drv = fn()
    regions.FORCE_CC = True
    try:
        dist = fn()
    finally:
        regions.FORCE_CC = None
    return drv, dist


@pytest.mark.parametrize("name,call", [
    ("label_regions", lambda w: regions.label_regions(w, "kg")),
    ("region_adjacency",
     lambda w: regions.region_adjacency(w, "kg")),
    ("sieve_summary",
     lambda w: regions.sieve_summary(w, "kg", threshold=8)),
    ("polygonize",
     lambda w: regions.polygonize_regions(w, "kg")
     .drop(columns=["wkb"])),
    ("region_area_km2",
     lambda w: regions.region_area_km2(w, "kg")),
    ("region_area_km2_lc",
     lambda w: regions.region_area_km2(w, "lc")),
])
def test_cc_equals_driver(tiny_world, name, call):
    drv, dist = _both(lambda: call(tiny_world))
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dist.reset_index(drop=True)), name


def test_polygonize_wkb_identical(tiny_world):
    drv, dist = _both(
        lambda: regions.polygonize_regions(tiny_world, "kg"))
    assert list(drv["wkb"]) == list(dist["wkb"])


@pytest.mark.parametrize("ds", ["kg", "lc"])
def test_region_geometry_cc_equals_driver(tiny_world, ds):
    drv, dist = _both(
        lambda: regions.region_geometry(tiny_world, ds))
    pd.testing.assert_frame_equal(drv, dist)
