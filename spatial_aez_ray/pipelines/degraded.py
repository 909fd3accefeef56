"""Degraded-land cross-classification (degraded_analysis.py analog).

Same co-keyed tile-group join as the AEZ pipeline, different
vocabularies: the degraded land-cover grouping (cropland merges
LCCS 10/20/30, grassland gains 100 — degraded_analysis.py:115-131),
LPD != 0 → degraded (:136-137), workability 1..4 →
good/marginal/poor/verypoor (:141-145); 56 cover:soil:degraded
columns summed per country (:147-152).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..constants import (
    DEGRADED_COLUMNS, DEGRADED_COVER_NAMES, DEGRADED_SOIL_NAMES,
    LC_TO_DEGRADED_COVER, WK_TO_DEGRADED_SOIL,
)
from ..geo import km2_block, upsample3
from ..sources.documents import MediaStore, read_documents
from ..stages.zonal import PARTIAL_SCHEMA, combine_partials_deterministic
from ..state.pipindex import PolygonIndex
from .aez import add_tile_key
from .extract import build_zonal_index, pivot_zonal, region_rollup, world_grid, write_csv

DEGRADED_DATASETS = ("lc", "lpd", "wk")


class DegradedTileKernel:
    """map_groups callable: one co-keyed tile group -> 56-way partials."""

    def __init__(self, world_path: str, index: PolygonIndex, g1):
        self.media = MediaStore(world_path)
        self.index = index
        self.g1 = g1

    def __call__(self, group: pa.Table) -> pa.Table:
        metas, refs_by_ds = {}, {}
        for row in group.to_pylist():
            ds_name = row["doc_id"].split("/", 1)[0]
            for s in sorted(row["spans"], key=lambda s: s["offset"]):
                if s["kind"] == "meta":
                    metas[ds_name] = json.loads(s["text"])
                elif s["kind"] == "media":
                    refs_by_ds.setdefault(ds_name, []).append(s["media_ref"])
        any_meta = next(iter(metas.values()))
        ty, tx = any_meta["tile_y"], any_meta["tile_x"]
        x1, y1, nc1, nr1 = self.g1.tile_window(ty, tx)
        claims = self.index.assign_tile(self.g1, ty, tx)
        if not claims:
            return PARTIAL_SCHEMA.empty_table()
        payloads = self.media.fetch([r for rs in refs_by_ds.values() for r in rs])

        def band(ds_name: str, nodata: int, g1_shape=True):
            refs = refs_by_ds.get(ds_name)
            shape = (nr1, nc1) if g1_shape else (nr1 * 3, nc1 * 3)
            if not refs:
                return np.full(shape, nodata, dtype=np.uint8)
            return np.frombuffer(payloads[refs[0]], dtype=np.uint8).reshape(shape)

        lc_blk = band("lc", 210, g1_shape=False)
        cov_idx = LC_TO_DEGRADED_COVER[lc_blk]
        lpd_blk = upsample3(band("lpd", 255))
        wk_blk = upsample3(band("wk", 0))
        soil_idx = WK_TO_DEGRADED_SOIL[wk_blk]
        degraded = lpd_blk != 0

        admins, clss, km2s, fidxs, tys, txs, seqs = [], [], [], [], [], [], []
        for fidx, admin, mask in claims:
            k = km2_block(nr1, nc1, y1, self.g1)
            k[np.logical_not(mask)] = 0.0
            km2_blk = upsample3(k) / 9.0
            seq = 0
            for ci, cover in enumerate(DEGRADED_COVER_NAMES):
                for deg_name, deg_mask in (("degraded", degraded),
                                           ("nondegraded", ~degraded)):
                    for si, soil in enumerate(DEGRADED_SOIL_NAMES):
                        sel = (cov_idx == ci) & deg_mask & (soil_idx == si)
                        admins.append(admin)
                        clss.append(f"{cover}:{soil}:{deg_name}")
                        km2s.append((sel * km2_blk).sum())
                        fidxs.append(fidx); tys.append(ty); txs.append(tx)
                        seqs.append(seq); seq += 1
        return pa.Table.from_arrays([
            pa.array(admins, pa.string()), pa.array(clss, pa.string()),
            pa.array(km2s, pa.float64()), pa.array(fidxs, pa.int32()),
            pa.array(tys, pa.int32()), pa.array(txs, pa.int32()),
            pa.array(seqs, pa.int32()),
        ], schema=PARTIAL_SCHEMA)


def degraded_stats(world_path: str, *, index: PolygonIndex | None = None,
                   concurrency: int | tuple = (1, 4)) -> pd.DataFrame:
    if index is None:
        index = build_zonal_index(world_path)
    g1 = world_grid(world_path, "g1")
    docs = read_documents(world_path, list(DEGRADED_DATASETS),
                          columns=["doc_id", "spans"])
    keyed = docs.map_batches(add_tile_key, batch_format="pyarrow")
    partials = keyed.groupby("tile_key").map_groups(
        DegradedTileKernel,
        fn_constructor_kwargs={"world_path": world_path, "index": index,
                               "g1": g1},
        batch_format="pyarrow", concurrency=concurrency)
    combined = partials.groupby("admin").map_groups(
        combine_partials_deterministic, batch_format="pandas")
    return pivot_zonal(combined.to_pandas(), DEGRADED_COLUMNS, world_path)


def produce_degraded_csvs(world_path: str, out_dir: str, *,
                          concurrency: int | tuple = (1, 4)) -> pd.DataFrame:
    """degraded-cover-by-country.csv + unsorted region rollup
    (degraded_analysis.py:154-166; note the region CSV is NOT
    re-sorted, it keeps the fixed region order)."""
    df = degraded_stats(world_path, concurrency=concurrency)
    write_csv(df, os.path.join(out_dir, "degraded-cover-by-country.csv"))
    region_rollup(df, world_path).to_csv(
        os.path.join(out_dir, "degraded-cover-by-region.csv"),
        float_format="%.2f")
    return df
