"""Prepared-claims cache (the prepare_feature_masks.py analog)."""

import os
import shutil

import numpy as np

from spatial_aez_ray.pipelines import aez, extract
from spatial_aez_ray.state.claims_cache import (
    ClaimsStore, prepare_claims, tile_key,
)


def test_prepared_claims_bit_exact_and_served(tiny_world, tmp_path,
                                              ray_session):
    wp = str(tmp_path / "w")
    shutil.copytree(tiny_world, wp)
    base_zonal = extract.zonal_stats(wp, "kg")
    base_aez = aez.aez_stats(wp)

    g1 = extract.world_grid(wp, "g1")
    summary = prepare_claims(wp, g1)
    assert summary["tiles"].sum() == g1.tiles_y * g1.tiles_x
    assert summary["claims"].sum() > 0
    assert os.path.exists(os.path.join(wp, "claims", "grid=g1",
                                       "_CLAIMS.json"))

    # cache-served runs must be bit-identical to inline PIP
    cached_zonal = extract.zonal_stats(wp, "kg")
    assert (cached_zonal.values == base_zonal.values).all()
    cached_aez = aez.aez_stats(wp)
    assert (cached_aez.values == base_aez.values).all()

    # the store really holds assign_tile's exact output
    store = ClaimsStore(wp, "g1")
    assert store.available
    index = extract.build_zonal_index(wp)
    probe = [(ty, tx) for ty in range(g1.tiles_y)
             for tx in range(g1.tiles_x)][:5]
    fetched = store.fetch([tile_key(ty, tx) for ty, tx in probe])
    for ty, tx in probe:
        want = index.assign_tile(g1, ty, tx)
        got = fetched[tile_key(ty, tx)]
        assert len(got) == len(want)
        for (gf, ga, gm), (wf, wa, wm) in zip(
                sorted(got, key=lambda c: c[0]),
                sorted(want, key=lambda c: c[0])):
            assert gf == wf and ga == wa and (gm == wm).all()


def test_missing_cache_falls_back_inline(tiny_world, ray_session):
    store = ClaimsStore(tiny_world, "g1")
    # the shared tiny world carries no cache; kernels run inline PIP
    if store.available:  # pragma: no cover - another test polluted it
        return
    df = extract.zonal_stats(tiny_world, "kg")
    assert len(df) > 0


def test_reprepare_with_different_batching_leaves_no_stale_parts(
        tiny_world, tmp_path, ray_session):
    """Re-running prepare_claims with a different batch_size must swap
    the whole cache dir: part filenames depend on batch composition,
    so an in-place overwrite would leave stale parts with overlapping
    tile ranges and fetch() would silently double-count claims."""
    wp = str(tmp_path / "w")
    shutil.copytree(tiny_world, wp)
    g1 = extract.world_grid(wp, "g1")
    prepare_claims(wp, g1, batch_size=4)
    cdir = os.path.join(wp, "claims", "grid=g1")
    parts_a = sorted(f for f in os.listdir(cdir) if f.endswith(".parquet"))
    store_a = ClaimsStore(wp, "g1")
    probe = [tile_key(ty, tx) for ty in range(g1.tiles_y)
             for tx in range(g1.tiles_x)]
    counts_a = {k: len(v) for k, v in store_a.fetch(probe).items()}

    prepare_claims(wp, g1, batch_size=32)   # different part layout
    parts_b = sorted(f for f in os.listdir(cdir) if f.endswith(".parquet"))
    assert parts_b != parts_a                # layout really changed
    # no stale part survived the swap; every old name is gone unless
    # regenerated with identical first-tile tags
    store_b = ClaimsStore(wp, "g1")
    counts_b = {k: len(v) for k, v in store_b.fetch(probe).items()}
    assert counts_a == counts_b              # no duplicated claims
