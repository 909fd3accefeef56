"""AEZ cross-classification pipeline (process_imagery.py produce_CSV).

Ray-Data-first expression of the reference's 4-raster align-join
(SURVEY.md §2.4 J4), SHUFFLE-FREE: the driver iterates the mask tile
lattice only; every sibling raster ref is DERIVED from the tile key
(``model.media_ref(ds, grid, ty, tx, band)``) and fetched in one
batched footer-pruned MediaStore read per map_batches call — no
``groupby(tile_key)`` exchange ever happens, tile payloads never
transit the object store twice. Each tile group is then classified by
a task-based kernel that reproduces the reference block loop exactly:

  mask → km² (zeroed off-mask) → 3×3 upsample ÷9 → TMR / slope /
  land-use / soil-health → 8 TMR × 29 AEZ weighted sums
  (process_imagery.py:240-279).

Partials then combine deterministically exactly like the zonal
pipelines, giving bit-exact CSVs against the sequential oracle.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .. import model
from ..constants import (
    AEZ_COLUMNS, KG_TO_TMR, LAND_USE_NAMES, LC_TO_LAND_USE, N_AEZ,
    SOIL_HEALTH_NAMES, TMR_NAMES, WK_TO_SOIL,
)
from ..geo import km2_block, upsample3
from ..sources.documents import MediaStore, read_documents
from ..stages.zonal import PARTIAL_SCHEMA, combine_partials_deterministic
from ..state.pipindex import PolygonIndex
from .extract import build_zonal_index, pivot_zonal, region_rollup, world_grid, write_csv

AEZ_DATASETS = ("kg", "slope", "wk", "lc")


def populate_tmr(kg_blk: np.ndarray) -> dict[str, np.ndarray]:
    """process_imagery.py:82-96 as a LUT remap (same membership sets)."""
    tmr_idx = KG_TO_TMR[kg_blk]
    return {name: tmr_idx == i for i, name in enumerate(TMR_NAMES)}


def populate_slope(sl_bands: list[np.ndarray]) -> dict[str, np.ndarray]:
    """process_imagery.py:99-104 (float sums of uint8 bands / 100)."""
    return {
        "minimal": (sl_bands[0].astype(float) + sl_bands[1] + sl_bands[2]
                    + sl_bands[3]) / 100.0,
        "moderate": (sl_bands[4].astype(float) + sl_bands[5]) / 100.0,
        "steep": (sl_bands[6].astype(float) + sl_bands[7]) / 100.0,
    }


def populate_land_use(lc_blk: np.ndarray) -> dict[str, np.ndarray]:
    u = LC_TO_LAND_USE[lc_blk]
    return {name: u == i for i, name in enumerate(LAND_USE_NAMES)}


def populate_soil_health(wk_blk: np.ndarray) -> dict[str, np.ndarray]:
    s = WK_TO_SOIL[wk_blk]
    return {name: s == i for i, name in enumerate(SOIL_HEALTH_NAMES)}


def yield_aezs(regime, tmr, slope, land_use, soil_health):
    """The 29-zone generator, literal algebra of
    process_imagery.py:137-198 incl. the (good+prime) moderate/steep
    rows and AEZ29 = bare ∨ barren (in-place zeroing ≡ boolean OR)."""
    r = regime[tmr]
    for fam in ("forest", "grassland", "cropland_irrigated", "cropland_rainfed"):
        u = land_use[fam]
        yield r * u * soil_health["prime"] * slope["minimal"]
        yield r * u * soil_health["good"] * slope["minimal"]
        yield r * u * (soil_health["good"] + soil_health["prime"]) * slope["moderate"]
        yield r * u * (soil_health["good"] + soil_health["prime"]) * slope["steep"]
        yield r * u * soil_health["marginal"] * slope["minimal"]
        yield r * u * soil_health["marginal"] * slope["moderate"]
        yield r * u * soil_health["marginal"] * slope["steep"]
    bare = (land_use["bare"].astype(float) + land_use["ice"] + land_use["urban"])
    barren = soil_health["barren"].astype(float).copy()
    barren[bare.astype(bool)] = 0.0
    yield r * (bare + barren)


def tile_aez_weights(regime, slope, land_use, soil_health) -> list:
    """All 232 (label, weight array) pairs for one tile, in the exact
    (TMR, AEZ1..29) emission order of ``yield_aezs``.

    Algebraically identical but ~2.5× cheaper: the 7 soil×slope combos
    are TMR- and family-independent and are built once, as is r·u per
    (TMR, family). Bit-exact vs the naive form because every factor
    except the slope fraction is a 0/1 indicator — multiplication by
    0/1 is exact under any association.
    """
    combos = [
        soil_health["prime"] * slope["minimal"],
        soil_health["good"] * slope["minimal"],
        (soil_health["good"] + soil_health["prime"]) * slope["moderate"],
        (soil_health["good"] + soil_health["prime"]) * slope["steep"],
        soil_health["marginal"] * slope["minimal"],
        soil_health["marginal"] * slope["moderate"],
        soil_health["marginal"] * slope["steep"],
    ]
    bare = (land_use["bare"].astype(float) + land_use["ice"]
            + land_use["urban"])
    barren = soil_health["barren"].astype(float).copy()
    barren[bare.astype(bool)] = 0.0
    bare_zone = bare + barren

    out = []
    for tmr in TMR_NAMES:
        r = regime[tmr]
        n = 1
        for fam in ("forest", "grassland", "cropland_irrigated",
                    "cropland_rainfed"):
            ru = r & land_use[fam]
            for c in combos:
                out.append((f"{tmr}|AEZ{n}", ru * c))
                n += 1
        out.append((f"{tmr}|AEZ{n}", r * bare_zone))
    return out


def add_tile_key(batch: pa.Table) -> pa.Table:
    """tile_key = "{ty:05d}/{tx:05d}" parsed from doc_id (vectorized)."""
    key = pc.utf8_slice_codeunits(batch["doc_id"], -11)
    return batch.append_column("tile_key", key)


class AezTileKernel:
    """Batched map_batches callable over the driver dataset's ("kg")
    tile documents. The 4-raster align-join (SURVEY.md §2.4 J4) needs
    NO shuffle: doc_id / media_ref embed the tile key, so the sibling
    datasets' payload refs are *derived* from the driver tile's
    coordinates (the co-partitioning contract of the cell-prefix
    addressing scheme — mirroring the reference's co-windowed reads,
    process_imagery.py:252-272) and fetched in one batched MediaStore
    call per map_batches batch. This replaced a
    groupby(tile_key).map_groups join: identical partials, one less
    all-to-all exchange, and media reads amortize over the batch."""

    def __init__(self, world_path: str, index: PolygonIndex, g1, g3,
                 use_claims_cache: bool = True):
        from ..state.claims_cache import ClaimsStore
        self.media = MediaStore(world_path)
        self.index = index
        self.g1 = g1
        self.g3 = g3
        self.layout = model.world_layout(world_path)
        store = ClaimsStore(world_path, g1.name) if use_claims_cache \
            else None
        self.claims_store = store if store is not None and \
            store.available else None

    def _claims_batch(self, tiles: list[tuple[int, int]]) -> dict:
        """(ty, tx) -> claims for the whole batch: ONE prepared-cache
        fetch when the world carries one, inline PIP otherwise."""
        if self.claims_store is not None:
            from ..state.claims_cache import tile_key
            uniq = list(dict.fromkeys(tiles))
            fetched = self.claims_store.fetch(
                [tile_key(ty, tx) for ty, tx in uniq])
            return {(ty, tx): fetched[tile_key(ty, tx)]
                    for ty, tx in uniq}
        return {(ty, tx): self.index.assign_tile(self.g1, ty, tx)
                for ty, tx in dict.fromkeys(tiles)}

    def _sibling_refs(self, ty: int, tx: int) -> dict[str, list[str]]:
        return model.sibling_refs(self.layout, AEZ_DATASETS, ty, tx)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # pass 1: parse driver metas, fetch/compute claims for the
        # whole batch at once, derive all refs
        metas = []
        for spans in batch.column("spans").to_pylist():
            meta = None
            for s in spans:
                if s["kind"] == "meta":
                    meta = json.loads(s["text"])
                    break
            metas.append(meta)
        claims_of = self._claims_batch(
            [(m["tile_y"], m["tile_x"]) for m in metas])
        tiles = []
        all_refs: list[str] = []
        for meta in metas:
            claims = claims_of[(meta["tile_y"], meta["tile_x"])]
            if not claims:
                continue
            refs_by_ds = self._sibling_refs(meta["tile_y"], meta["tile_x"])
            tiles.append((meta, refs_by_ds, claims))
            for rs in refs_by_ds.values():
                all_refs.extend(rs)
        if not tiles:
            return PARTIAL_SCHEMA.empty_table()
        # ONE batched, footer-pruned media fetch per map_batches call
        payloads = self.media.fetch(all_refs, strict=False)

        admins, clss, km2s, fidxs, tys, txs, seqs = [], [], [], [], [], [], []
        for meta, refs_by_ds, claims in tiles:
            ty, tx = meta["tile_y"], meta["tile_x"]
            x1, y1, nc1, nr1 = self.g1.tile_window(ty, tx)

            def band(ds_name: str, i: int, nodata: int, g1_shape=True):
                refs = refs_by_ds.get(ds_name)
                shape = (nr1, nc1) if g1_shape else (nr1 * 3, nc1 * 3)
                if not refs or refs[i] not in payloads:
                    return np.full(shape, nodata, dtype=np.uint8)
                return np.frombuffer(payloads[refs[i]],
                                     dtype=np.uint8).reshape(shape)

            kg_blk = upsample3(band("kg", 0, 0))
            regime = populate_tmr(kg_blk)
            sl_bands = [upsample3(band("slope", i, 127)) for i in range(8)]
            slope = populate_slope(sl_bands)
            lc_blk = band("lc", 0, 210, g1_shape=False)
            land_use = populate_land_use(lc_blk)
            wk_blk = upsample3(band("wk", 0, 0))
            soil = populate_soil_health(wk_blk)

            # factored algebra (bit-exact vs yield_aezs: every factor
            # except the slope fraction is a 0/1 indicator, so any
            # association gives identical floats — tested elementwise):
            # the 7 soil×slope combos + the bare∨barren zone depend only
            # on the tile; per claim they are fused with the masked km²
            # once (8 float mults), leaving ONE float mult + pairwise
            # sum per zone instead of three.
            combos = [
                soil["prime"] * slope["minimal"],
                soil["good"] * slope["minimal"],
                (soil["good"] + soil["prime"]) * slope["moderate"],
                (soil["good"] + soil["prime"]) * slope["steep"],
                soil["marginal"] * slope["minimal"],
                soil["marginal"] * slope["moderate"],
                soil["marginal"] * slope["steep"],
            ]
            bare = (land_use["bare"].astype(float) + land_use["ice"]
                    + land_use["urban"])
            barren = soil["barren"].astype(float).copy()
            barren[bare.astype(bool)] = 0.0
            bare_zone = bare + barren
            fams = [land_use[f] for f in
                    ("forest", "grassland", "cropland_irrigated",
                     "cropland_rainfed")]

            km2_tile = km2_block(nr1, nc1, y1, self.g1)
            for fidx, admin, mask in claims:
                k = km2_tile.copy()
                k[np.logical_not(mask)] = 0.0
                km2_blk = upsample3(k) / 9.0
                ck = [c * km2_blk for c in combos]
                bk = bare_zone * km2_blk
                # Empty-selection skips are bit-exact: a zero product
                # contributes +0.0 (exact identity) and the pivot seeds
                # zero cells, so dropping all-zero rows changes nothing
                # — but seq/n MUST advance so surviving rows keep their
                # combine order. Tiles usually span 1-2 of the 8
                # regimes, so this cuts ~4x of the 232 products.
                seq = 0
                for tmr in TMR_NAMES:
                    r = regime[tmr]
                    n = 1
                    if not r.any():
                        # keep seq in lockstep with the emitting loop
                        # below (len(fams) family passes + the bare row)
                        seq += len(fams) * len(ck) + 1
                        continue
                    for u in fams:
                        ru = r & u
                        if not ru.any():
                            seq += len(ck); n += len(ck)
                            continue
                        for c in ck:
                            admins.append(admin)
                            clss.append(f"{tmr}|AEZ{n}")
                            km2s.append((ru * c).sum())
                            fidxs.append(fidx); tys.append(ty)
                            txs.append(tx); seqs.append(seq)
                            seq += 1; n += 1
                    admins.append(admin)
                    clss.append(f"{tmr}|AEZ{n}")
                    km2s.append((r * bk).sum())
                    fidxs.append(fidx); tys.append(ty)
                    txs.append(tx); seqs.append(seq)
                    seq += 1
        return pa.Table.from_arrays([
            pa.array(admins, pa.string()), pa.array(clss, pa.string()),
            pa.array(km2s, pa.float64()), pa.array(fidxs, pa.int32()),
            pa.array(tys, pa.int32()), pa.array(txs, pa.int32()),
            pa.array(seqs, pa.int32()),
        ], schema=PARTIAL_SCHEMA)


def aez_partials_ds(world_path: str, *, index: PolygonIndex | None = None,
                    concurrency: int | tuple = (1, 4), batch_size: int = 8,
                    tiles=None):
    """``tiles`` (set of (ty, tx)) restricts the pass to a tile SET in
    one launch: the kg ANCHOR docs carry exact tile-key doc_ids, so the
    set pushes down as a bounding doc_id range + isin — the incremental
    AEZ delta path (changed sibling rasters recompute via their
    tile-key-aligned kg anchor)."""
    if index is None:
        index = build_zonal_index(world_path)
    g1 = world_grid(world_path, "g1")
    g3 = world_grid(world_path, "g3")
    from ..sources.documents import blocks_for
    doc_filter = None
    if tiles is not None:
        import pyarrow.compute as pc
        ids = sorted(f"kg/g1/{ty:05d}/{tx:05d}" for ty, tx in tiles)
        if not ids:
            raise ValueError("tiles must be non-empty")
        doc_filter = ((pc.field("doc_id") >= ids[0])
                      & (pc.field("doc_id") <= ids[-1])
                      & pc.field("doc_id").isin(ids))
    docs = read_documents(world_path, ["kg"], columns=["doc_id", "spans"],
                          override_num_blocks=blocks_for(concurrency),
                          doc_filter=doc_filter)
    from ..datapipe.util import as_task_fn
    return docs.map_batches(
        as_task_fn(AezTileKernel, world_path=world_path, index=index,
                   g1=g1, g3=g3),
        batch_format="pyarrow", batch_size=batch_size)


def aez_stats(world_path: str, *, index: PolygonIndex | None = None,
              concurrency: int | tuple = (1, 4),
              coalesce: int | str | None = "auto") -> pd.DataFrame:
    """Country × 232 (tmr|AEZn) km² table, bit-exact vs the oracle.
    ``coalesce``: see extract.zonal_stats (tiny-partials repartition;
    "auto" derives the width from the G1 tile count)."""
    from .extract import (DRIVER_COMBINE_MAX_TILES, combine_partials_table,
                          partials_coalesce_width, world_grid)
    partials = aez_partials_ds(world_path, index=index, concurrency=concurrency)
    g1 = world_grid(world_path, "g1")
    n_tiles = g1.tiles_x * g1.tiles_y
    if n_tiles <= DRIVER_COMBINE_MAX_TILES:
        # size-adaptive deterministic combine — see zonal_stats: below
        # the threshold the pre-reduced partial table is MBs, so the
        # driver combine (bit-identical ordering) skips the sort
        # shuffle's warm fixed floor entirely.
        return pivot_zonal(combine_partials_table(partials.to_pandas()),
                           AEZ_COLUMNS, world_path)
    if coalesce == "auto":
        coalesce = partials_coalesce_width(n_tiles)
    # barrier before the combine shuffle — see zonal_stats: the fused
    # streaming plan starves the map stage at low CPU counts (3.4x on
    # the scale-80 world at 8 CPUs); the partial table is bounded
    partials = partials.materialize()
    if coalesce:
        partials = partials.repartition(coalesce)
    combined = partials.groupby("admin").map_groups(
        combine_partials_deterministic, batch_format="pandas")
    return pivot_zonal(combined.to_pandas(), AEZ_COLUMNS, world_path)


def aez_stats_incremental(world_old: str, world_new: str, *,
                          old_partials: "pd.DataFrame | None" = None
                          ) -> tuple[pd.DataFrame, dict]:
    """Maintain the AEZ view across a world update without a full
    recompute — the 4-raster form of extract.zonal_stats_incremental.

    A G1 tile's AEZ partial depends on all four co-keyed rasters
    (kg/slope/wk on G1 + lc on the 3x G3 grid, whose tile lattice is
    index-aligned with G1's), so the changed set is the UNION of the
    four per-dataset diffs; those tiles recompute through their kg
    anchor docs in ONE pushed-down read. Bit-identical to
    ``aez_stats(world_new)`` because the combine orders by (feature,
    tile, seq) regardless of which run emitted each row."""
    import numpy as np
    import ray.data

    from ..stages.zonal import combine_partials_deterministic
    from .extract import partials_coalesce_width
    from .pyramid import diff_worlds

    if old_partials is None:
        old_partials = aez_partials_ds(world_old).to_pandas()
    changed: set[tuple[int, int]] = set()
    dropped: set[tuple[int, int]] = set()
    per_ds = {}
    for ds_name in ("kg", "slope", "wk", "lc"):
        diff = diff_worlds(world_old, world_new, ds_name)
        per_ds[ds_name] = len(diff)
        for r in diff.itertuples():
            key = (int(r.tile_y), int(r.tile_x))
            dropped.add(key)
            if not (ds_name == "kg" and r.status == "removed"):
                changed.add(key)

    key = (old_partials["tile_y"].to_numpy(dtype=np.int64) << 32)         | old_partials["tile_x"].to_numpy(dtype=np.int64)
    drop_keys = np.array([(ty << 32) | tx for ty, tx in dropped],
                         dtype=np.int64)
    keep = old_partials[~np.isin(key, drop_keys)]
    fresh = ([aez_partials_ds(world_new, tiles=changed).to_pandas()]
             if changed else [])
    merged = pd.concat([keep] + fresh, ignore_index=True)
    g1 = world_grid(world_new, "g1")
    from .extract import DRIVER_COMBINE_MAX_TILES, combine_partials_table
    # merged is already on the driver; below the size-adaptive
    # threshold re-shipping it through a sort shuffle is pure overhead
    if len(merged) <= DRIVER_COMBINE_MAX_TILES * 64:
        combined = combine_partials_table(merged)
    else:
        combined = (ray.data.from_pandas(merged)
                    .repartition(partials_coalesce_width(
                        g1.tiles_x * g1.tiles_y))
                    .groupby("admin")
                    .map_groups(combine_partials_deterministic,
                                batch_format="pandas")
                    .to_pandas())
    view = pivot_zonal(combined, AEZ_COLUMNS, world_new)
    return view, {"tiles_recomputed": len(changed),
                  "tiles_dropped": len(dropped - changed),
                  "partial_rows_kept": len(keep),
                  "diff_tiles_per_dataset": per_ds}


TMR_TITLE = ["Tropical-Humid", "Arid", "Tropical-Semiarid", "Temperate-Humid",
             "Temperate-Semiarid", "Boreal-Humid", "Boreal-Semiarid", "Arctic"]


def produce_aez_csvs(world_path: str, out_dir: str, *,
                     concurrency: int | tuple = (1, 4)) -> pd.DataFrame:
    """AEZ-by-country.csv + per-TMR regional CSVs
    (process_imagery.py:281-296): fixed region order, regex column
    split per TMR."""
    df = aez_stats(world_path, concurrency=concurrency)
    write_csv(df, os.path.join(out_dir, "AEZ-by-country.csv"))
    df_region = region_rollup(df, world_path)
    for tmr in TMR_TITLE:
        tmrfilename = tmr.translate(str.maketrans("/", "-"))
        sub = df_region.filter(regex=f"^{tmr.lower()}", axis=1)
        sub.to_csv(os.path.join(out_dir, f"AEZ-{tmrfilename}-by-region.csv"),
                   float_format="%.2f")
    return df


def aez_stats_checkpointed(world_path: str, out_dir: str, *,
                           num_shards: int = 8,
                           index: PolygonIndex | None = None,
                           concurrency: int | tuple = (1, 4),
                           batch_size: int = 8) -> pd.DataFrame:
    """Resumable AEZ run: same shard manifest machinery as the zonal
    pipelines (extract.run_checkpointed_partials) over the kg driver
    docs; result identical to ``aez_stats``."""
    from .extract import pivot_zonal, run_checkpointed_partials
    if index is None:
        index = build_zonal_index(world_path)
    g1 = world_grid(world_path, "g1")
    g3 = world_grid(world_path, "g3")
    combined = run_checkpointed_partials(
        world_path, "kg", AezTileKernel,
        {"world_path": world_path, "index": index, "g1": g1, "g3": g3},
        out_dir, "aez-partials",
        num_shards=num_shards, concurrency=concurrency,
        batch_size=batch_size)
    return pivot_zonal(combined, AEZ_COLUMNS, world_path)
