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

from .. import model
from ..constants import (
    DEGRADED_COLUMNS, DEGRADED_COVER_NAMES, DEGRADED_SOIL_NAMES,
    LC_TO_DEGRADED_COVER, WK_TO_DEGRADED_SOIL,
)
from ..geo import km2_block, upsample3
from ..sources.documents import MediaStore, read_documents
from ..stages.zonal import PARTIAL_SCHEMA, combine_partials_deterministic
from ..state.pipindex import PolygonIndex
from .aez import add_tile_key  # noqa: F401 (re-export)
from .extract import build_zonal_index, pivot_zonal, region_rollup, world_grid, write_csv

DEGRADED_DATASETS = ("lc", "lpd", "wk")


class DegradedTileKernel:
    """Batched map_batches callable over the driver dataset's ("lpd")
    tile documents; sibling lc/wk refs are derived from the tile key
    (same shuffle-free align-join as AezTileKernel) and fetched in one
    batched MediaStore call per map_batches batch."""

    def __init__(self, world_path: str, index: PolygonIndex, g1):
        self.media = MediaStore(world_path)
        self.index = index
        self.g1 = g1
        self.layout = model.world_layout(world_path)

    def _sibling_refs(self, ty: int, tx: int) -> dict[str, list[str]]:
        return model.sibling_refs(self.layout, DEGRADED_DATASETS, ty, tx)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tiles = []
        all_refs: list[str] = []
        for spans in batch.column("spans").to_pylist():
            meta = None
            for s in spans:
                if s["kind"] == "meta":
                    meta = json.loads(s["text"])
                    break
            claims = self.index.assign_tile(
                self.g1, meta["tile_y"], meta["tile_x"])
            if not claims:
                continue
            refs_by_ds = self._sibling_refs(meta["tile_y"], meta["tile_x"])
            tiles.append((meta, refs_by_ds, claims))
            for rs in refs_by_ds.values():
                all_refs.extend(rs)
        if not tiles:
            return PARTIAL_SCHEMA.empty_table()
        payloads = self.media.fetch(all_refs, strict=False)

        admins, clss, km2s, fidxs, tys, txs, seqs = [], [], [], [], [], [], []
        for meta, refs_by_ds, claims in tiles:
            ty, tx = meta["tile_y"], meta["tile_x"]
            x1, y1, nc1, nr1 = self.g1.tile_window(ty, tx)

            def band(ds_name: str, nodata: int, g1_shape=True):
                refs = refs_by_ds.get(ds_name)
                shape = (nr1, nc1) if g1_shape else (nr1 * 3, nc1 * 3)
                if not refs or refs[0] not in payloads:
                    return np.full(shape, nodata, dtype=np.uint8)
                return np.frombuffer(payloads[refs[0]],
                                     dtype=np.uint8).reshape(shape)

            lc_blk = band("lc", 210, g1_shape=False)
            cov_idx = LC_TO_DEGRADED_COVER[lc_blk]
            lpd_blk = upsample3(band("lpd", 255))
            wk_blk = upsample3(band("wk", 0))
            soil_idx = WK_TO_DEGRADED_SOIL[wk_blk]
            degraded = lpd_blk != 0

            # claim-independent selection masks, hoisted per tile; empty
            # combos are skipped per claim (bit-exact: a zero product
            # contributes +0.0 and the pivot seeds zero cells; seq keeps
            # its original value so combine order is unchanged)
            combos: list[tuple[str, np.ndarray | None]] = []
            for ci, cover in enumerate(DEGRADED_COVER_NAMES):
                cmask = cov_idx == ci
                if not cmask.any():
                    combos.extend(
                        (f"{cover}:{soil}:{deg_name}", None)
                        for deg_name in ("degraded", "nondegraded")
                        for soil in DEGRADED_SOIL_NAMES)
                    continue
                for deg_name, deg_mask in (("degraded", degraded),
                                           ("nondegraded", ~degraded)):
                    cd = cmask & deg_mask
                    cd_any = cd.any()
                    for si, soil in enumerate(DEGRADED_SOIL_NAMES):
                        sel = cd & (soil_idx == si) if cd_any else None
                        if sel is not None and not sel.any():
                            sel = None
                        combos.append((f"{cover}:{soil}:{deg_name}", sel))

            km2_tile = km2_block(nr1, nc1, y1, self.g1)
            for fidx, admin, mask in claims:
                k = km2_tile.copy()
                k[np.logical_not(mask)] = 0.0
                km2_blk = upsample3(k) / 9.0
                for seq, (label, sel) in enumerate(combos):
                    if sel is None:
                        continue
                    admins.append(admin)
                    clss.append(label)
                    km2s.append((sel * km2_blk).sum())
                    fidxs.append(fidx); tys.append(ty); txs.append(tx)
                    seqs.append(seq)
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
    from ..sources.documents import blocks_for
    docs = read_documents(world_path, ["lpd"], columns=["doc_id", "spans"],
                          override_num_blocks=blocks_for(concurrency))
    from ..datapipe.util import as_task_fn
    partials = docs.map_batches(
        as_task_fn(DegradedTileKernel, world_path=world_path, index=index,
                   g1=g1),
        batch_format="pyarrow", batch_size=8)
    from .extract import (DRIVER_COMBINE_MAX_TILES, combine_partials_table,
                          partials_coalesce_width)
    n_tiles = g1.tiles_x * g1.tiles_y
    if n_tiles <= DRIVER_COMBINE_MAX_TILES:
        # size-adaptive deterministic combine — see zonal_stats
        return pivot_zonal(combine_partials_table(partials.to_pandas()),
                           DEGRADED_COLUMNS, world_path)
    # tiny-partials coalesce, see zonal_stats ("auto" width from tiles)
    partials = partials.repartition(partials_coalesce_width(n_tiles))
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
