"""Straight-line NumPy oracle — reference semantics, sequential.

Golden-test generator for the Ray pipelines: reimplements the
reference's accumulation loops verbatim-shaped (feature loop × block
loop × masked per-class sums, /root/reference/extract_country_data.py
``process_map``/lookup classes, /root/reference/process_imagery.py
``produce_CSV``/``produce_GeoTIFF``, /root/reference/degraded_analysis.py)
over the synthetic fixture world. Masks come from boundary-inclusive
point-in-polygon of pixel centers (our analog of the rasterized
feature masks, prepare_feature_masks.py:9-63).

Deliberately NOT distributed and deliberately dumb: plain dict/DataFrame
accumulators in deterministic order. Only the geometry predicate is
shared with the engine (tested separately with known shapes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import fixtures
from .constants import (
    AEZ_LUT, DEGRADED_COLUMNS, DEGRADED_COVER_NAMES, DEGRADED_SOIL_NAMES,
    GEOMORPHO_SLOPE_CLASSES, KG_CLASSES, KG_TO_TMR, LAND_USE_NAMES,
    LC_TO_DEGRADED_COVER, LC_TO_LAND_USE, LCCS_CLASSES, N_AEZ, REGIONS,
    SOIL_HEALTH_NAMES, TMR_NAMES, WK_TO_DEGRADED_SOIL, WK_TO_SOIL,
    WORKABILITY_CLASSES, SOIL_RENDER_CODE, TMR_BASE_COLOR,
    AEZ_BLANK, SLOPE_BLANK, LAND_USE_BLANK, SOIL_BLANK, LAND_USE_NONE,
)
from .geo import GridSpec, km2_block, upsample3
from .state.pipindex import PolygonIndex


# ---------------------------------------------------------------------------
# Masks ("prepare_feature_masks" analog): full-grid boolean per feature.
# ---------------------------------------------------------------------------

def feature_masks(spec: fixtures.WorldSpec, grid: GridSpec
                  ) -> list[tuple[int, str, np.ndarray]]:
    """(feature_idx, admin, full-grid bool mask) per admin!=None feature,
    in feature order (the reference iterates shapefile order)."""
    idx = fixtures.zonal_index(spec.seed)
    lons = grid.lons(0, grid.width)
    lats = grid.lats(0, grid.height)
    glon = np.broadcast_to(lons[None, :], (grid.height, grid.width)).ravel()
    glat = np.broadcast_to(lats[:, None], (grid.height, grid.width)).ravel()
    out = []
    for pos, f in enumerate(idx.features):
        x0, y0, x1, y1 = f.bbox
        cand = (glon >= x0) & (glon <= x1) & (glat >= y0) & (glat <= y1)
        mask = np.zeros(glon.shape, dtype=bool)
        if cand.any():
            mask[cand] = idx.covers_points(pos, glon[cand], glat[cand])
        out.append((f.feature_idx, f.admin, mask.reshape(grid.height, grid.width)))
    return out


def full_raster(spec: fixtures.WorldSpec, dataset: str) -> list[np.ndarray]:
    """Whole-grid band arrays assembled from fixture tiles (absent tiles
    filled with the dataset nodata value)."""
    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    nbands = fixtures.DATASET_BANDS[dataset]
    land_idx = fixtures.land_index(spec.seed)
    bands = [np.full((grid.height, grid.width), nodata, dtype=np.uint8)
             for _ in range(nbands)]
    if dataset == "lc":
        for b in bands:
            b[:] = 210  # oceans are water in LC, see fixtures.tile_arrays
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            arrs = fixtures.tile_arrays(spec, dataset, ty, tx, land_idx)
            if arrs is None:
                continue
            x, y, nc, nr = grid.tile_window(ty, tx)
            for b, arr in enumerate(arrs):
                bands[b][y:y + nr, x:x + nc] = arr
    return bands


def cell_country(spec: fixtures.WorldSpec, grid: GridSpec,
                 snap_tol: float = 0.0) -> pd.DataFrame:
    """(cell_row, cell_col, feature_idx, admin) for every claimed pixel;
    with snap_tol > 0, unclaimed raster-land pixels snap to the nearest
    boundary within tol (ties -> lowest feature position)."""
    rows = []
    for fidx, admin, mask in feature_masks(spec, grid):
        r, c = np.nonzero(mask)
        rows.append(pd.DataFrame({"cell_row": r, "cell_col": c,
                                  "feature_idx": fidx, "admin": admin}))
    df = pd.concat(rows, ignore_index=True)
    if snap_tol > 0:
        idx = fixtures.zonal_index(spec.seed)
        land_idx = fixtures.land_index(spec.seed)
        claimed = np.zeros((grid.height, grid.width), dtype=bool)
        claimed[df["cell_row"], df["cell_col"]] = True
        # raster land = union of per-tile land masks (incl. dilation)
        land = np.zeros_like(claimed)
        for ty in range(grid.tiles_y):
            for tx in range(grid.tiles_x):
                x, y, nc, nr = grid.tile_window(ty, tx)
                land[y:y + nr, x:x + nc] = fixtures.land_mask_tile(
                    spec, grid, ty, tx, land_idx)
        # also exclude pixels covered only by admin=None features: they
        # are not snapped (they are inside a polygon, just a dropped one)
        for pos, f in enumerate(land_idx.features):
            admin = fixtures.ADMIN_OVERRIDES.get(f.admin, f.admin)
            if admin is not None:
                continue
            lons = grid.lons(0, grid.width)
            lats = grid.lats(0, grid.height)
            glon = np.broadcast_to(lons[None, :], land.shape).ravel()
            glat = np.broadcast_to(lats[:, None], land.shape).ravel()
            m = land_idx.covers_points(pos, glon, glat).reshape(land.shape)
            claimed |= m
        r, c = np.nonzero(land & ~claimed)
        lons = grid.lons(0, grid.width)[c]
        lats = grid.lats(0, grid.height)[r]
        pos = idx.snap(lons, lats, snap_tol)
        ok = pos >= 0
        rows.append(pd.DataFrame({
            "cell_row": r[ok], "cell_col": c[ok],
            "feature_idx": [idx.feature_idx_of(p) for p in pos[ok]],
            "admin": [idx.admin_of(p) for p in pos[ok]]}))
        df = pd.concat(rows, ignore_index=True)
    return df.sort_values(["feature_idx", "cell_row", "cell_col"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# process_map analogs (extract_country_data.py:213-251)
# ---------------------------------------------------------------------------

def _zonal_frame(columns) -> pd.DataFrame:
    df = pd.DataFrame(columns=[str(c) for c in columns], dtype="float")
    df.index.name = "Country"
    return df


def _iter_blocks(grid: GridSpec, tile_window=None):
    """Block iterator; ``tile_window=(ty0, ty1, tx0, tx1)`` restricts
    to that inclusive tile rectangle (the range-aggregation window).
    Skipping tiles preserves the (ty, tx) iteration order, so the
    deterministic-summation invariant is untouched."""
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            if tile_window is not None:
                ty0, ty1, tx0, tx1 = tile_window
                if not (ty0 <= ty <= ty1 and tx0 <= tx <= tx1):
                    continue
            yield grid.tile_window(ty, tx)


def zonal_csv(spec: fixtures.WorldSpec, dataset: str,
              tile_window=None) -> pd.DataFrame:
    """Per-country class-area table for one dataset — the process_map
    loop: per feature, per block, masked per-class km² sums.
    ``tile_window`` restricts to an inclusive tile rectangle."""
    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    bands = full_raster(spec, dataset)
    masks = feature_masks(spec, grid)

    if dataset == "kg":
        columns = KG_CLASSES
    elif dataset == "lc":
        columns = LCCS_CLASSES
    elif dataset == "slope":
        columns = GEOMORPHO_SLOPE_CLASSES
    elif dataset == "fao":
        from .constants import FAO_SLOPE_CLASSES
        columns = FAO_SLOPE_CLASSES
    elif dataset == "wk":
        columns = WORKABILITY_CLASSES
    elif dataset == "lpd":
        columns = ["degraded", "nondegraded"]
    else:
        raise ValueError(dataset)
    df = _zonal_frame(columns)

    for fidx, admin, mask in masks:
        if admin not in df.index:
            df.loc[admin] = [0.0] * len(df.columns)
        for x, y, ncols, nrows in _iter_blocks(grid, tile_window):
            mblk = mask[y:y + nrows, x:x + ncols]
            if not mblk.any():
                continue  # the sparse-mask skip (geoutil.py:28-32)
            km2 = km2_block(nrows, ncols, y, grid)
            if dataset == "slope":
                for b in range(8):
                    blk = bands[b][y:y + nrows, x:x + ncols].astype(float)
                    bad = np.logical_or(~mblk, blk == 127)
                    blk = np.where(bad, 0.0, blk)
                    df.loc[admin, GEOMORPHO_SLOPE_CLASSES[b]] += \
                        (km2 * (blk / 100.0))[~bad].sum()
                continue
            if dataset == "fao":
                # FaoSlopeLookup shape (extract_country_data.py:152-158):
                # masked-fill 0 then whole-array nansum — a DIFFERENT
                # summation order than the Geomorpho select-then-sum
                from .constants import FAO_SLOPE_CLASSES
                for b in range(8):
                    blk = bands[b][y:y + nrows, x:x + ncols].astype(float)
                    bad = np.logical_or(~mblk, blk == 255)
                    masked = np.where(bad, 0.0, blk)
                    df.loc[admin, FAO_SLOPE_CLASSES[b]] += \
                        np.nansum(km2 * (masked / 100.0))
                continue
            blk = bands[0][y:y + nrows, x:x + ncols]
            vals = blk[mblk]
            w = km2[mblk]
            for label in np.unique(vals):
                if dataset in ("kg", "lc", "wk") and label in (0, 255):
                    continue
                if dataset == "kg":
                    col = KG_CLASSES[label - 1]
                elif dataset == "lpd":
                    # any nonzero LPD class is degraded
                    # (degraded_analysis.py:136-137, extract:193-202)
                    col = "degraded" if label != 0 else "nondegraded"
                else:
                    col = str(label)
                df.loc[admin, str(col)] += w[vals == label].sum()
    return df.sort_index(axis="index")


# ---------------------------------------------------------------------------
# AEZ produce_CSV analog (process_imagery.py:201-296)
# ---------------------------------------------------------------------------

def aez_csv(spec: fixtures.WorldSpec) -> pd.DataFrame:
    g1 = spec.g1
    kg = full_raster(spec, "kg")[0]
    sl = full_raster(spec, "slope")
    lc = full_raster(spec, "lc")[0]
    wk = full_raster(spec, "wk")[0]
    masks = feature_masks(spec, g1)
    columns = [f"{tmr}|AEZ{n}" for tmr in TMR_NAMES for n in range(1, N_AEZ + 1)]
    df = _zonal_frame(columns)

    for fidx, admin, mask in masks:
        if admin not in df.index:
            df.loc[admin] = [0.0] * len(df.columns)
        for x, y, ncols, nrows in _iter_blocks(g1):
            mblk = mask[y:y + nrows, x:x + ncols]
            if not mblk.any():
                continue
            k = km2_block(nrows, ncols, y, g1)
            k[np.logical_not(mblk)] = 0.0
            km2_blk = upsample3(k) / 9.0

            kg_blk = upsample3(kg[y:y + nrows, x:x + ncols])
            regime = _populate_tmr(kg_blk)
            sl_blk = {b + 1: upsample3(sl[b][y:y + nrows, x:x + ncols])
                      for b in range(8)}
            slope = _populate_slope(sl_blk)
            lc_blk = lc[3 * y:3 * (y + nrows), 3 * x:3 * (x + ncols)]
            land_use = _populate_land_use(lc_blk)
            wk_blk = upsample3(wk[y:y + nrows, x:x + ncols])
            soil = _populate_soil_health(wk_blk)

            for tmr in TMR_NAMES:
                n = 1
                for aez in _yield_aezs(regime, tmr, slope, land_use, soil):
                    df.loc[admin, f"{tmr}|AEZ{n}"] += (aez * km2_blk).sum()
                    n += 1
    return df.sort_index(axis="index")


def _populate_tmr(kg_blk):
    regime = {}
    tmr_idx = KG_TO_TMR[kg_blk]
    for i, name in enumerate(TMR_NAMES):
        regime[name] = tmr_idx == i
    return regime


def _populate_slope(sl_blk):
    return {
        "minimal": (sl_blk[1].astype(float) + sl_blk[2] + sl_blk[3] + sl_blk[4]) / 100.0,
        "moderate": (sl_blk[5].astype(float) + sl_blk[6]) / 100.0,
        "steep": (sl_blk[7].astype(float) + sl_blk[8]) / 100.0,
    }


def _populate_land_use(lc_blk):
    u = LC_TO_LAND_USE[lc_blk]
    return {name: u == i for i, name in enumerate(LAND_USE_NAMES)}


def _populate_soil_health(wk_blk):
    s = WK_TO_SOIL[wk_blk]
    return {name: s == i for i, name in enumerate(SOIL_HEALTH_NAMES)}


def _yield_aezs(regime, tmr, slope, land_use, soil_health):
    """Literal transcription of the 29-zone generator semantics
    (process_imagery.py:137-198): per land-use family the 7-zone
    prime/good/(good+prime)/marginal × slope pattern, then AEZ29 =
    bare ∨ barren (the reference zeroes barren where bare is set to
    avoid double counting — identical to boolean OR)."""
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
    barren[bare.astype(bool)] = 0.0  # avoid double counting (:195-198)
    yield r * (bare + barren)


# ---------------------------------------------------------------------------
# degraded_analysis produce_CSV analog (degraded_analysis.py:35-166)
# ---------------------------------------------------------------------------

def degraded_csv(spec: fixtures.WorldSpec) -> pd.DataFrame:
    g1 = spec.g1
    lc = full_raster(spec, "lc")[0]
    lpd = full_raster(spec, "lpd")[0]
    wk = full_raster(spec, "wk")[0]
    masks = feature_masks(spec, g1)
    df = _zonal_frame(DEGRADED_COLUMNS)

    for fidx, admin, mask in masks:
        if admin not in df.index:
            df.loc[admin] = [0.0] * len(df.columns)
        for x, y, ncols, nrows in _iter_blocks(g1):
            mblk = mask[y:y + nrows, x:x + ncols]
            if not mblk.any():
                continue
            k = km2_block(nrows, ncols, y, g1)
            k[np.logical_not(mblk)] = 0.0
            km2_blk = upsample3(k) / 9.0
            lc_blk = lc[3 * y:3 * (y + nrows), 3 * x:3 * (x + ncols)]
            cov_idx = LC_TO_DEGRADED_COVER[lc_blk]
            lpd_blk = upsample3(lpd[y:y + nrows, x:x + ncols])
            wk_blk = upsample3(wk[y:y + nrows, x:x + ncols])
            soil_idx = WK_TO_DEGRADED_SOIL[wk_blk]
            degraded = lpd_blk != 0
            for ci, cover in enumerate(DEGRADED_COVER_NAMES):
                for deg_name, deg_mask in (("degraded", degraded),
                                           ("nondegraded", ~degraded)):
                    for si, soilname in enumerate(DEGRADED_SOIL_NAMES):
                        sel = (cov_idx == ci) & deg_mask & (soil_idx == si)
                        df.loc[admin, f"{cover}:{soilname}:{deg_name}"] += \
                            (sel * km2_blk).sum()
    return df.sort_index(axis="index")


# ---------------------------------------------------------------------------
# Region rollup (extract_country_data.py:254-263)
# ---------------------------------------------------------------------------

def region_rollup(df: pd.DataFrame, spec: fixtures.WorldSpec) -> pd.DataFrame:
    fixtures.build_countries(spec.seed)  # populate REGION_OF
    df_region = pd.DataFrame(0.0, index=REGIONS, columns=df.columns.copy())
    df_region.index.name = "Region"
    for country, row in df.iterrows():
        regions = fixtures.REGION_OF.get(country)
        if regions:
            df_region.loc[regions, :] += row
    return df_region


# ---------------------------------------------------------------------------
# produce_GeoTIFF analog (process_imagery.py:398-497): per-G3-tile
# classified output arrays (aez / slope / land use / soil health codes).
# ---------------------------------------------------------------------------

def render_tiles(spec: fixtures.WorldSpec) -> dict[tuple[int, int], dict[str, np.ndarray]]:
    g1, g3 = spec.g1, spec.g3
    kg = full_raster(spec, "kg")[0]
    sl = full_raster(spec, "slope")
    lc = full_raster(spec, "lc")[0]
    wk = full_raster(spec, "wk")[0]
    out: dict[tuple[int, int], dict[str, np.ndarray]] = {}
    for ty in range(g3.tiles_y):
        for tx in range(g3.tiles_x):
            x, y, ncols, nrows = g3.tile_window(ty, tx)
            x3, y3, nc3, nr3 = x // 3, y // 3, ncols // 3, nrows // 3
            kg_blk = upsample3(kg[y3:y3 + nr3, x3:x3 + nc3])
            regime = _populate_tmr(kg_blk)
            sl_blk = {b + 1: upsample3(sl[b][y3:y3 + nr3, x3:x3 + nc3])
                      for b in range(8)}
            slope = _populate_slope(sl_blk)
            plurality = {
                "steep": (slope["steep"] >= slope["moderate"]) &
                         (slope["steep"] >= slope["minimal"]),
                "moderate": (slope["moderate"] > slope["steep"]) &
                            (slope["moderate"] >= slope["minimal"]),
                "minimal": (slope["minimal"] > slope["steep"]) &
                           (slope["minimal"] >= slope["moderate"]),
            }
            slope_oh = plurality
            lc_blk = lc[y:y + nrows, x:x + ncols]
            land_use = _populate_land_use(lc_blk)
            wk_blk = upsample3(wk[y3:y3 + nr3, x3:x3 + nc3])
            soil = _populate_soil_health(wk_blk)

            aez_arr = np.full((nrows, ncols), AEZ_BLANK, dtype=np.int64)
            for tmr in TMR_NAMES:
                color = TMR_BASE_COLOR[tmr]
                for aez in _yield_aezs(regime, tmr, slope_oh, land_use, soil):
                    aez_arr[aez.astype(bool)] = color
                    color += 1

            slope_arr = np.full((nrows, ncols), SLOPE_BLANK, dtype=np.int64)
            slope_arr[slope_oh["minimal"].astype(bool)] = 0
            slope_arr[slope_oh["moderate"].astype(bool)] = 1
            slope_arr[slope_oh["steep"].astype(bool)] = 2

            lu_arr = np.full((nrows, ncols), LAND_USE_BLANK, dtype=np.int64)
            for i, name in enumerate(LAND_USE_NAMES):
                lu_arr[land_use[name]] = i

            sh_arr = np.full((nrows, ncols), SOIL_BLANK, dtype=np.int64)
            for name in SOIL_HEALTH_NAMES:
                sh_arr[soil[name]] = SOIL_RENDER_CODE[name]

            out[(ty, tx)] = {"aez": aez_arr.astype(np.uint8),
                             "slope": slope_arr.astype(np.uint8),
                             "land_use": lu_arr.astype(np.uint8),
                             "soil_health": sh_arr.astype(np.uint8)}
    return out

# ---------------------------------------------------------------------------
# derived-kernel oracles (moved here from the pipeline modules so that
# pipelines/ carries NO fixtures dependency: production kernels read
# layout via model.world_layout(world_path); these sequential oracles
# regenerate fixture tiles from the WorldSpec by construction)
# ---------------------------------------------------------------------------

def warp_oracle(spec, dataset: str, out_n: int) -> pd.DataFrame:
    """Sequential oracle: one whole-array gather through the SAME
    index function, summarized per output tile."""
    from . import model
    from .pipelines.pyramid import _md5_int
    from .pipelines.warp import mercator_src_index

    
    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    t = grid.tile
    base = full_raster(spec, dataset)[0]
    rr, cc = np.meshgrid(np.arange(out_n, dtype=np.float64),
                         np.arange(out_n, dtype=np.float64),
                         indexing="ij")
    src_r, src_c = mercator_src_index(grid, out_n, rr.ravel(), cc.ravel())
    out = base[src_r, src_c].reshape(out_n, out_n)
    psum, md5s = 0, []
    for ty in range(out_n // t):
        for tx in range(out_n // t):
            tile = out[ty * t:(ty + 1) * t, tx * t:(tx + 1) * t]
            psum += int(tile.astype(np.int64).sum())
            md5s.append(_md5_int(model.encode_tile(tile)))
    return pd.DataFrame([{
        "out_n": np.int64(out_n),
        "n_tiles": np.int64(len(md5s)),
        "payload_sum": np.int64(psum),
        "md5_sum": np.int64(np.array(md5s, dtype=np.int64)
                            .sum(dtype=np.int64))}])


def pyramid_oracle(spec, dataset: str) -> pd.DataFrame:
    """Sequential numpy reimplementation: pad the full base raster to
    the tile lattice, repeatedly pad-to-even-tiles + 2×2 plurality
    vote; summaries computed per tile in the same order-free form."""
    from . import model
    from .pipelines.pyramid import _md5_int, mode_reduce2

    
    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    t = grid.tile
    base = full_raster(spec, dataset)[0]
    ty, tx = grid.tiles_y, grid.tiles_x
    arr = np.full((ty * t, tx * t), nodata, dtype=np.uint8)
    arr[:grid.height, :grid.width] = base
    rows = []
    level = 0
    while ty > 1 or tx > 1:
        level += 1
        pty, ptx = (ty + 1) // 2, (tx + 1) // 2
        padded = np.full((pty * 2 * t, ptx * 2 * t), nodata, dtype=np.uint8)
        padded[:arr.shape[0], :arr.shape[1]] = arr
        arr = mode_reduce2(padded, nodata)
        ty, tx = pty, ptx
        # sparse semantics: all-nodata tiles are holes, never written
        psum, md5s = 0, []
        for yy in range(ty):
            for xx in range(tx):
                tile = arr[yy * t:(yy + 1) * t, xx * t:(xx + 1) * t]
                if (tile == nodata).all():
                    continue
                psum += int(tile.astype(np.int64).sum())
                md5s.append(_md5_int(model.encode_tile(tile)))
        rows.append((level, len(md5s), psum,
                     int(np.array(md5s, dtype=np.int64)
                         .sum(dtype=np.int64))))
    out = pd.DataFrame(rows, columns=["level", "n_tiles",
                                      "payload_sum", "md5_sum"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out




def focal_gradient_oracle(spec, dataset: str,
                          hole_value: int | None = None) -> pd.DataFrame:
    """Sequential oracle: zero-padded whole-array Sobel; per-tile
    summary restricted to tiles that exist in the world (holes carry
    no gradient rows in the distributed pass)."""
    from .pipelines.pyramid import sobel_mag_int

    
    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    t = grid.tile
    base = full_raster(spec, dataset)[0]
    nodata = fixtures.DATASET_NODATA[dataset]
    hole = nodata if hole_value is None else int(hole_value)
    pad = np.full((grid.height + 2, grid.width + 2), hole,
                  dtype=np.uint8)
    pad[1:-1, 1:-1] = base
    g = sobel_mag_int(pad)
    land_idx = fixtures.land_index(spec.seed)
    n, s, m = 0, 0, 0
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            if fixtures.tile_arrays(spec, dataset, ty, tx,
                                    land_idx) is None:
                continue
            x, y, nc, nr = grid.tile_window(ty, tx)
            sub = g[y:y + nr, x:x + nc]
            n += 1
            s += int(sub.sum())
            m = max(m, int(sub.max()))
    return pd.DataFrame([{"n_tiles": np.int64(n),
                          "grad_sum": np.int64(s),
                          "grad_max": np.int64(m)}])


def equalize_oracle(spec, dataset: str) -> pd.DataFrame:
    """Sequential reimplementation over the fixture tiles (absent
    tiles skipped exactly like the pipeline's doc scan)."""
    from . import model
    from .pipelines.downsample import equalize_lut
    from .pipelines.pyramid import _md5_int

        
    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    land_idx = fixtures.land_index(spec.seed)
    tiles = []
    hist = np.zeros(256, dtype=np.int64)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            arrs = fixtures.tile_arrays(spec, dataset, ty, tx, land_idx)
            if arrs is None:
                continue
            tiles.append(arrs[0])
            hist += np.bincount(arrs[0].ravel(), minlength=256)
    lut = equalize_lut(hist, nodata)
    psum, md5s = 0, []
    for t in tiles:
        eq = lut[t]
        psum += int(eq.astype(np.int64).sum())
        md5s.append(_md5_int(model.encode_tile(eq)))
    return pd.DataFrame([{
        "n_tiles": np.int64(len(tiles)),
        "payload_sum": np.int64(psum),
        "md5_sum": np.int64(np.array(md5s, dtype=np.int64)
                            .sum(dtype=np.int64))}])


def admin_adjacency_oracle(spec) -> "pd.DataFrame":
    """Sequential oracle: whole-grid admin raster resolved in the SAME
    first-claim order, then two vectorized shift comparisons."""
    
    grid = spec.grid("g1")
    full = np.full((grid.height, grid.width), -1, dtype=np.int16)
    admins = sorted({a for _, a, _ in
                     feature_masks(spec, grid) if a is not None})
    code_of = {a: i for i, a in enumerate(admins)}
    for fidx, admin, mask in sorted(feature_masks(spec, grid),
                                    key=lambda c: c[0]):
        if admin is None:
            continue
        put = mask & (full == -1)
        full[put] = code_of[admin]
    pairs: dict[tuple[str, str], int] = {}

    def count(a, b):
        ok = (a != -1) & (b != -1) & (a != b)
        lo = np.minimum(a[ok], b[ok])
        hi = np.maximum(a[ok], b[ok])
        for kk, cc in zip(*np.unique(lo.astype(np.int64) * len(admins)
                                     + hi, return_counts=True)):
            key = (admins[int(kk) // len(admins)],
                   admins[int(kk) % len(admins)])
            pairs[key] = pairs.get(key, 0) + int(cc)

    count(full[:, :-1], full[:, 1:])
    count(full[:-1, :], full[1:, :])
    out = pd.DataFrame(
        [(a, b, n) for (a, b), n in sorted(pairs.items())],
        columns=["admin_a", "admin_b", "shared_edges"])
    out["shared_edges"] = out["shared_edges"].astype(np.int64)
    return out


def regions_oracle(spec, dataset: str) -> pd.DataFrame:
    """Sequential whole-array connected-component labeling (region
    ids are canonical min-pixel indices, so this is comparable
    bit-for-bit with the distributed two-level labeling): absent
    tiles stay nodata = background, exactly the pixels the pipeline
    never sees."""
    from .pipelines.regions import label_components

    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    land_idx = fixtures.land_index(spec.seed)
    full = np.full((grid.height, grid.width), nodata, dtype=np.uint8)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            arrs = fixtures.tile_arrays(spec, dataset, ty, tx, land_idx)
            if arrs is None:
                continue
            x, y, nc, nr = grid.tile_window(ty, tx)
            full[y:y + nr, x:x + nc] = arrs[0]
    lab = label_components(full, int(nodata))
    fg = lab >= 0
    reps, inv, counts = np.unique(lab[fg], return_inverse=True,
                                  return_counts=True)
    same = np.zeros(full.shape, dtype=np.int64)
    m = fg[:, 1:] & fg[:, :-1] & (full[:, 1:] == full[:, :-1])
    same[:, 1:] += m
    same[:, :-1] += m
    m = fg[1:, :] & fg[:-1, :] & (full[1:, :] == full[:-1, :])
    same[1:, :] += m
    same[:-1, :] += m
    perim = np.zeros(len(reps), dtype=np.int64)
    np.add.at(perim, inv, (4 - same)[fg])
    return pd.DataFrame({
        "region_id": reps.astype(np.int64),
        "cls": full.ravel()[reps].astype(np.int64),
        "n_px": counts.astype(np.int64),
        "perim": perim,
    }).sort_values("region_id").reset_index(drop=True)


def proximity_oracle(spec, dataset: str = "lc", target: int = 210,
                     d_max: int = 16) -> pd.DataFrame:
    """Sequential whole-array capped distance transform + histogram
    over present-tile pixels (hole tiles contribute no rows, exactly
    like the distributed pass)."""
    from .pipelines.regions import proximity_distances

    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    land_idx = fixtures.land_index(spec.seed)
    full = np.full((grid.height, grid.width), nodata, dtype=np.uint8)
    present = np.zeros((grid.height, grid.width), dtype=bool)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            arrs = fixtures.tile_arrays(spec, dataset, ty, tx, land_idx)
            if arrs is None:
                continue
            x, y, nc, nr = grid.tile_window(ty, tx)
            full[y:y + nr, x:x + nc] = arrs[0]
            present[y:y + nr, x:x + nc] = True
    dist = proximity_distances(full, int(target), int(d_max))
    hist = np.bincount(dist[present].ravel(), minlength=d_max + 2)
    nz = np.flatnonzero(hist)
    return pd.DataFrame({"dist": nz.astype(np.int64),
                         "n_px": hist[nz].astype(np.int64)})


def idw_oracle(spec, step: int = 8) -> pd.DataFrame:
    """Sequential IDW with the identical integer arithmetic over the
    same admin-centroid samples (derived from cell_country, exactly
    the pipeline's source)."""
    from .pipelines.assign import IDW_SCALE

    grid = spec.grid("g1")
    cells = cell_country(spec, grid)
    g = cells.groupby("admin")
    n = g.size().to_numpy(dtype=np.int64)
    sr = (g["cell_row"].sum().to_numpy(dtype=np.int64) // n)
    sc = (g["cell_col"].sum().to_numpy(dtype=np.int64) // n)
    rows = []
    for ry in range(0, grid.height, step):
        for cx in range(0, grid.width, step):
            d2 = (ry - sr) ** 2 + (cx - sc) ** 2
            w = IDW_SCALE // (1 + d2)
            den = int(w.sum())
            val = int((w * n).sum()) // den if den > 0 else 0
            rows.append((ry, cx, val))
    return pd.DataFrame(rows, columns=["row", "col", "value"]).astype(
        np.int64)


def region_km2_oracle(spec, dataset: str) -> pd.DataFrame:
    """Sequential OBIA areas: whole-array labeling for region ids, then
    the SAME per-tile partial walk (same helper, same in-tile order,
    same sorted combine) as the distributed pass."""
    from .pipelines.regions import _tile_region_km2, label_components

    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    land_idx = fixtures.land_index(spec.seed)
    full = np.full((grid.height, grid.width), nodata, dtype=np.uint8)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            arrs = fixtures.tile_arrays(spec, dataset, ty, tx, land_idx)
            if arrs is None:
                continue
            x, y, nc, nr = grid.tile_window(ty, tx)
            full[y:y + nr, x:x + nc] = arrs[0]
    glab = label_components(full, int(nodata))
    rows = []
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            arrs = fixtures.tile_arrays(spec, dataset, ty, tx, land_idx)
            if arrs is None:
                continue
            x, y, nc, nr = grid.tile_window(ty, tx)
            sub = full[y:y + nr, x:x + nc]
            # per-tile LOCAL labeling, exactly the kernel's partials
            loc = label_components(sub, int(nodata))
            reps, km2 = _tile_region_km2(sub, loc, ty, grid)
            for rep, rk in zip(reps, km2):
                ly, lx = int(rep) // nc, int(rep) % nc
                gid = int(glab[y + ly, x + lx])
                rows.append((gid, int(sub.ravel()[rep]),
                             ty * grid.tiles_x + tx, float(rk)))
    df = pd.DataFrame(rows, columns=["region_id", "cls", "tile", "km2"])
    df = df.sort_values(["region_id", "cls", "tile"], kind="mergesort")
    out_rows = []
    for (rid, cls), g in df.groupby(["region_id", "cls"], sort=True):
        out_rows.append((int(rid), int(cls),
                         float(g["km2"].to_numpy(dtype=np.float64).sum())))
    out = pd.DataFrame(out_rows, columns=["region_id", "cls", "km2"])
    out["region_id"] = out["region_id"].astype(np.int64)
    out["cls"] = out["cls"].astype(np.int64)
    return out.sort_values("region_id").reset_index(drop=True)


def buffer_zone_oracle(spec, world_path: str, dataset: str = "lc",
                       target: int = 210, d_max: int = 8) -> pd.DataFrame:
    """Sequential buffer-zone areas: whole-array capped distance (the
    independent check of the halo algebra) + the SAME claims and
    per-(tile, claim) float summation order as the kernel."""
    from .geo import km2_block
    from .pipelines.extract import build_zonal_index
    from .pipelines.regions import proximity_distances

    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    land_idx = fixtures.land_index(spec.seed)
    full = np.full((grid.height, grid.width), nodata, dtype=np.uint8)
    present = np.zeros((grid.height, grid.width), dtype=bool)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            arrs = fixtures.tile_arrays(spec, dataset, ty, tx, land_idx)
            if arrs is None:
                continue
            x, y, nc, nr = grid.tile_window(ty, tx)
            full[y:y + nr, x:x + nc] = arrs[0]
            present[y:y + nr, x:x + nc] = True
    dist = proximity_distances(full, int(target), int(d_max))
    index = build_zonal_index(world_path)
    rows = []
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            x, y, nc, nr = grid.tile_window(ty, tx)
            if not present[y:y + nr, x:x + nc].any():
                continue
            me = full[y:y + nr, x:x + nc]
            band = ((dist[y:y + nr, x:x + nc] >= 1)
                    & (dist[y:y + nr, x:x + nc] <= d_max)
                    & (me != nodata))
            if not band.any():
                continue
            w = km2_block(nr, nc, ty * grid.tile, grid)
            for fidx, admin, mask in index.assign_tile(grid, ty, tx):
                sel = band & mask
                if not sel.any():
                    continue
                rows.append((admin, int(fidx), ty, tx,
                             float(w[sel].sum())))
    df = pd.DataFrame(rows, columns=["admin", "fidx", "ty", "tx",
                                     "km2"])
    df = df.sort_values(["admin", "fidx", "ty", "tx"],
                        kind="mergesort")
    out = []
    for admin, g in df.groupby("admin", sort=True):
        total = 0.0
        for v in g["km2"].to_numpy(dtype=np.float64):
            total += v
        out.append((admin, total))
    return pd.DataFrame(out, columns=["admin", "km2"])


def histogram_match_oracle(spec, src_dataset: str = "kg",
                           ref_dataset: str = "lc") -> pd.DataFrame:
    """Sequential histogram matching over the assembled whole arrays
    (present tiles only — the pipeline's doc scan sees exactly these
    pixels) with the same integer CDF-matching rule."""
    from .pipelines.downsample import match_histogram_lut

    def whole_hist(dataset):
        grid = spec.grid(fixtures.DATASET_GRID[dataset])
        land_idx = fixtures.land_index(spec.seed)
        h = np.zeros(256, dtype=np.int64)
        for ty in range(grid.tiles_y):
            for tx in range(grid.tiles_x):
                arrs = fixtures.tile_arrays(spec, dataset, ty, tx,
                                            land_idx)
                if arrs is None:
                    continue
                h += np.bincount(arrs[0].ravel(), minlength=256)
        return h

    nodata = fixtures.DATASET_NODATA[src_dataset]
    hs = whole_hist(src_dataset)
    hr = whole_hist(ref_dataset)
    lut = match_histogram_lut(hs, hr, int(nodata))
    hs2 = hs.copy()
    hs2[int(nodata)] = 0
    vals = np.flatnonzero(hs2)
    out = pd.DataFrame({
        "value": vals.astype(np.int64),
        "n_src": hs2[vals],
        "matched_value": lut[vals].astype(np.int64)})
    mass = (out.groupby("matched_value", as_index=False)["n_src"]
            .sum().rename(columns={"n_src": "n_matched"}))
    out = out.merge(mass, on="matched_value")
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("value").reset_index(drop=True)


def rasterize_oracle(spec, world_path: str,
                     grid_name: str = "g1") -> pd.DataFrame:
    """Sequential rasterize re-walk with the identical burn rule,
    counting per-admin pixels over the whole lattice."""
    from .pipelines.extract import build_zonal_index, world_grid

    index = build_zonal_index(world_path)
    grid = world_grid(world_path, grid_name)
    admins = sorted({f.admin for f in index.features
                     if f.admin is not None})
    code_of = {a: i + 1 for i, a in enumerate(admins)}
    counts = np.zeros(len(admins) + 1, dtype=np.int64)
    n_tiles = 0
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            _, _, ncols, nrows = grid.tile_window(ty, tx)
            arr = np.zeros((nrows, ncols), dtype=np.uint8)
            for fidx, admin, mask in sorted(
                    index.assign_tile(grid, ty, tx),
                    key=lambda c: -c[0]):
                arr[mask] = code_of[admin]
            if arr.any():
                n_tiles += 1
                counts += np.bincount(arr.ravel(),
                                      minlength=len(admins) + 1)
    rows = [(a, code_of[a], int(counts[code_of[a]]), n_tiles)
            for a in admins if counts[code_of[a]]]
    out = pd.DataFrame(rows, columns=["admin", "code", "n_px",
                                      "n_tiles"])
    for c in ("code", "n_px", "n_tiles"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("admin").reset_index(drop=True)


def region_adjacency_oracle(spec, dataset: str) -> pd.DataFrame:
    """Sequential region adjacency over the whole-array labels:
    horizontal + vertical neighbor pairs with distinct non-background
    labels, counted once each."""
    from .pipelines.regions import label_components

    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    land_idx = fixtures.land_index(spec.seed)
    full = np.full((grid.height, grid.width), nodata, dtype=np.uint8)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            arrs = fixtures.tile_arrays(spec, dataset, ty, tx, land_idx)
            if arrs is None:
                continue
            x, y, nc, nr = grid.tile_window(ty, tx)
            full[y:y + nr, x:x + nc] = arrs[0]
    lab = label_components(full, int(nodata))
    pairs = {}
    for ga, gb in ((lab[:, :-1], lab[:, 1:]),
                   (lab[:-1, :], lab[1:, :])):
        ok = (ga >= 0) & (gb >= 0) & (ga != gb)
        lo = np.minimum(ga[ok], gb[ok])
        hi = np.maximum(ga[ok], gb[ok])
        key = np.stack([lo, hi], axis=1)
        uk, cnt = np.unique(key, axis=0, return_counts=True)
        for (a, b), c in zip(uk, cnt):
            pairs[(int(a), int(b))] = pairs.get((int(a), int(b)), 0) \
                + int(c)
    rows = [(a, b, n) for (a, b), n in sorted(pairs.items())]
    out = pd.DataFrame(rows, columns=["region_a", "region_b",
                                      "shared_edges"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def crosstab_oracle(spec, dataset_a: str = "kg",
                    dataset_b: str = "lc") -> pd.DataFrame:
    """Sequential cross-tabulation over the assembled full arrays
    (full_raster fills kg holes with nodata and lc holes with 210 —
    the same fills the kernel applies per tile)."""
    from .geo import upsample3

    a = full_raster(spec, dataset_a)[0]
    b = full_raster(spec, dataset_b)[0]
    key = (upsample3(a).astype(np.int64) << 8) + b.astype(np.int64)
    hist = np.bincount(key.ravel(), minlength=1 << 16)
    nz = np.flatnonzero(hist)
    return pd.DataFrame({
        "cls_a": (nz >> 8).astype(np.int64),
        "cls_b": (nz & 255).astype(np.int64),
        "n_px": hist[nz].astype(np.int64)})


def aspect_oracle(spec, dataset: str = "kg",
                  hole_value: int | None = None) -> pd.DataFrame:
    """Sequential whole-array aspect histogram over present tiles,
    identical hole padding to focal_gradient_oracle."""
    from .pipelines.pyramid import aspect_codes, grad_window
    return _focal_hist_oracle(spec, dataset, hole_value,
                              grad_window(aspect_codes), 9,
                              "aspect_code")


def hillshade_oracle(spec, dataset: str = "kg",
                     hole_value: int | None = None) -> pd.DataFrame:
    """Sequential whole-array Horn hillshade histogram (gdaldem
    hillshade, az 315°/alt 45°), identical hole padding."""
    from .pipelines.pyramid import grad_window, shade_codes
    return _focal_hist_oracle(spec, dataset, hole_value,
                              grad_window(shade_codes), 256, "shade")


def tri_oracle(spec, dataset: str = "kg",
               hole_value: int | None = None) -> pd.DataFrame:
    from .pipelines.pyramid import tri_codes
    return _focal_hist_oracle(spec, dataset, hole_value,
                              tri_codes, 2041, "tri")


def tpi_oracle(spec, dataset: str = "kg",
               hole_value: int | None = None) -> pd.DataFrame:
    from .pipelines.pyramid import TPI_OFFSET, tpi_codes
    return _focal_hist_oracle(spec, dataset, hole_value,
                              tpi_codes, 2 * TPI_OFFSET + 1, "tpi")


def slope_deg_oracle(spec, dataset: str = "kg",
                     hole_value: int | None = None) -> pd.DataFrame:
    from .pipelines.pyramid import slope_deg_codes
    return _focal_hist_oracle(spec, dataset, hole_value,
                              slope_deg_codes, 91, "slope_deg")


def majority_oracle(spec, dataset: str = "kg",
                    hole_value: int | None = None) -> pd.DataFrame:
    from .pipelines.pyramid import majority_codes
    return _focal_hist_oracle(spec, dataset, hole_value,
                              majority_codes, 256, "majority")


def flowdir_oracle(spec, dataset: str = "kg",
                   hole_value: int | None = None) -> pd.DataFrame:
    from .pipelines.pyramid import flowdir_codes
    return _focal_hist_oracle(spec, dataset, hole_value,
                              flowdir_codes, 256, "flowdir")


def roughness_oracle(spec, dataset: str = "kg",
                     hole_value: int | None = None) -> pd.DataFrame:
    from .pipelines.pyramid import roughness_codes
    return _focal_hist_oracle(spec, dataset, hole_value,
                              roughness_codes, 256, "roughness")


def _focal_hist_oracle(spec, dataset: str, hole_value: int | None,
                       window_fn, nbins: int,
                       colname: str) -> pd.DataFrame:
    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    hole = nodata if hole_value is None else int(hole_value)
    base = full_raster(spec, dataset)[0]
    pad = np.full((grid.height + 2, grid.width + 2), hole,
                  dtype=np.uint8)
    pad[1:-1, 1:-1] = base
    # holes inside the lattice must pad with `hole`, like the kernel
    land_idx = fixtures.land_index(spec.seed)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            if fixtures.tile_arrays(spec, dataset, ty, tx,
                                    land_idx) is None:
                x, y, nc, nr = grid.tile_window(ty, tx)
                pad[1 + y:1 + y + nr, 1 + x:1 + x + nc] = hole
    code = window_fn(pad)
    hist = np.zeros(nbins, dtype=np.int64)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            if fixtures.tile_arrays(spec, dataset, ty, tx,
                                    land_idx) is None:
                continue
            x, y, nc, nr = grid.tile_window(ty, tx)
            hist += np.bincount(code[y:y + nr, x:x + nc].ravel(),
                                minlength=nbins)
    nz = np.flatnonzero(hist)
    return pd.DataFrame({colname: nz.astype(np.int64),
                         "n_px": hist[nz].astype(np.int64)})


def zonal_value_stats_oracle(spec, dataset: str = "kg") -> pd.DataFrame:
    """Sequential zonal value statistics: materialize each admin's
    pixel-value MULTISET (a deliberately different derivation from the
    kernel's count-vector arithmetic — direct sorted-array ranks vs
    cumsum/searchsorted) and read the stats off the sorted array."""
    from .stages.zonal import VALUE_FILTERS

    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    band = full_raster(spec, dataset)[0]
    flt = VALUE_FILTERS[dataset]
    per_admin: dict[str, list[np.ndarray]] = {}
    for _fidx, admin, mask in feature_masks(spec, grid):
        vals = band[mask]
        vals = vals[flt(vals)]
        if len(vals):
            per_admin.setdefault(admin, []).append(vals)
    rows = []
    for admin, parts in per_admin.items():
        v = np.sort(np.concatenate(parts).astype(np.int64))
        n = len(v)
        uniq, cnt = np.unique(v, return_counts=True)

        def rank(qnum: int, qden: int) -> int:
            return int(v[-(-qnum * n // qden) - 1])

        rows.append({
            "admin": admin, "n_px": n, "variety": len(uniq),
            "majority": int(uniq[np.lexsort((uniq, -cnt))[0]]),
            "minority": int(uniq[np.lexsort((uniq, cnt))[0]]),
            "p25": rank(1, 4), "median": rank(1, 2), "p75": rank(3, 4),
        })
    out = pd.DataFrame(rows).sort_values("admin").reset_index(drop=True)
    for c in out.columns:
        if c != "admin":
            out[c] = out[c].astype(np.int64)
    return out


def zonal_window_stats_oracle(spec, dataset: str = "kg",
                              metric: str = "tri",
                              hole_value: int | None = None
                              ) -> pd.DataFrame:
    """Sequential focal×zonal composition: whole-array window metric
    (identical hole padding to _focal_hist_oracle) intersected with
    each admin's full-grid mask, restricted to present tiles."""
    from .pipelines.pyramid import WINDOW_FNS

    window_fn, _ = WINDOW_FNS[metric]
    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    hole = nodata if hole_value is None else int(hole_value)
    base = full_raster(spec, dataset)[0]
    pad = np.full((grid.height + 2, grid.width + 2), hole,
                  dtype=np.uint8)
    pad[1:-1, 1:-1] = base
    land_idx = fixtures.land_index(spec.seed)
    present = np.zeros((grid.height, grid.width), dtype=bool)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            x, y, nc, nr = grid.tile_window(ty, tx)
            if fixtures.tile_arrays(spec, dataset, ty, tx,
                                    land_idx) is None:
                pad[1 + y:1 + y + nr, 1 + x:1 + x + nc] = hole
            else:
                present[y:y + nr, x:x + nc] = True
    codes = window_fn(pad)
    rows = []
    agg: dict[str, list] = {}
    for _fidx, admin, mask in feature_masks(spec, grid):
        vals = codes[mask & present]
        if not len(vals):
            continue
        cur = agg.get(admin)
        row = [len(vals), int(vals.sum()), int(vals.min()),
               int(vals.max())]
        if cur is None:
            agg[admin] = row
        else:
            cur[0] += row[0]
            cur[1] += row[1]
            cur[2] = min(cur[2], row[2])
            cur[3] = max(cur[3], row[3])
    for admin in sorted(agg):
        n, s, mn, mx = agg[admin]
        rows.append({"admin": admin, "n_px": n, "sum": s,
                     "min": mn, "max": mx})
    out = pd.DataFrame(rows)
    for c in out.columns:
        if c != "admin":
            out[c] = out[c].astype(np.int64)
    return out.reset_index(drop=True)

def flow_accum_hist(pad: np.ndarray, present: np.ndarray) -> pd.DataFrame:
    """Sequential whole-array D8 flow accumulation histogram over a
    (+1)-padded elevation array and a present-pixel mask — the global
    descending-elevation scatter, a deliberately different derivation
    from the kernel's per-tile seam fixpoint (shared with the
    crafted-world pytest so imported rasters verify the same way)."""
    from .pipelines.hydro import _DX, _DY
    from .pipelines.pyramid import flowdir_codes

    code = flowdir_codes(pad)
    elev = pad[1:-1, 1:-1].astype(np.int64)
    h, w = elev.shape
    dy = _DY[code]
    dx = _DX[code]
    yy = np.broadcast_to(np.arange(h)[:, None], (h, w))
    xx = np.broadcast_to(np.arange(w)[None, :], (h, w))
    ty = yy + dy
    tx = xx + dx
    flows = present & (code != 0)
    inframe = flows & (ty >= 0) & (ty < h) & (tx >= 0) & (tx < w)
    valid = np.zeros_like(flows)
    valid[inframe] = present[ty[inframe], tx[inframe]]
    acc = np.zeros((h, w), dtype=np.int64)
    for lvl in np.unique(elev[present])[::-1]:
        m = valid & (elev == lvl)
        if m.any():
            np.add.at(acc, (ty[m], tx[m]), acc[m] + 1)
    u, cnt = np.unique(acc[present], return_counts=True)
    return pd.DataFrame({"acc": u.astype(np.int64),
                         "n_px": cnt.astype(np.int64)})


def flow_accum_oracle(spec, dataset: str = "kg",
                      hole_value: int | None = None) -> pd.DataFrame:
    """Sequential D8 flow-accumulation histogram over the assembled
    full array; identical hole padding to the focal-family oracles
    (hole tiles pad the halo with `hole` and contribute no pixels, and
    flux INTO a hole tile is dropped on both sides)."""
    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    hole = nodata if hole_value is None else int(hole_value)
    base = full_raster(spec, dataset)[0]
    pad = np.full((grid.height + 2, grid.width + 2), hole, dtype=np.uint8)
    pad[1:-1, 1:-1] = base
    present = np.ones((grid.height, grid.width), dtype=bool)
    land_idx = fixtures.land_index(spec.seed)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            if fixtures.tile_arrays(spec, dataset, ty, tx,
                                    land_idx) is None:
                x, y, nc, nr = grid.tile_window(ty, tx)
                pad[1 + y:1 + y + nr, 1 + x:1 + x + nc] = hole
                present[y:y + nr, x:x + nc] = False
    return flow_accum_hist(pad, present)


def watershed_hist(pad: np.ndarray, present: np.ndarray) -> pd.DataFrame:
    """Sequential whole-array D8 watershed summary over a (+1)-padded
    elevation array and a present-pixel mask: global pointer doubling
    to each pixel's terminal (pit or external drainage), then the
    basin-size histogram — a deliberately different derivation from
    the kernel's per-tile doubling + seam-graph chase."""
    from .pipelines.hydro import _DX, _DY
    from .pipelines.pyramid import flowdir_codes

    code = flowdir_codes(pad)
    h, w = code.shape
    dy = _DY[code]
    dx = _DX[code]
    yy = np.broadcast_to(np.arange(h)[:, None], (h, w))
    xx = np.broadcast_to(np.arange(w)[None, :], (h, w))
    ty = yy + dy
    tx = xx + dx
    flows = present & (code != 0)
    inframe = flows & (ty >= 0) & (ty < h) & (tx >= 0) & (tx < w)
    valid = np.zeros_like(flows)
    valid[inframe] = present[ty[inframe], tx[inframe]]

    parent = np.arange(h * w, dtype=np.int64)
    vm = valid.ravel()
    parent[vm] = (ty * w + tx).ravel()[vm]
    for _ in range(int(np.ceil(np.log2(max(h * w, 2)))) + 1):
        parent = parent[parent]

    pit = present & (code == 0)
    pr = present.ravel()
    roots = parent[pr]
    is_pit_root = pit.ravel()[roots]
    basin_roots = roots[is_pit_root]
    _, sizes = np.unique(basin_roots, return_counts=True)
    external = int((~is_pit_root).sum())

    u, k = np.unique(sizes.astype(np.int64), return_counts=True)
    out = pd.DataFrame({"kind": ["basin"] * len(u),
                        "size": u.astype(np.int64),
                        "n": k.astype(np.int64)})
    if external:
        out = pd.concat(
            [out, pd.DataFrame({"kind": ["external"],
                                "size": [np.int64(external)],
                                "n": [np.int64(1)]})],
            ignore_index=True)
    return out


def watershed_oracle(spec, dataset: str = "kg",
                     hole_value: int | None = None) -> pd.DataFrame:
    """Sequential watershed summary over the assembled full array;
    identical hole padding to ``flow_accum_oracle``."""
    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    hole = nodata if hole_value is None else int(hole_value)
    base = full_raster(spec, dataset)[0]
    pad = np.full((grid.height + 2, grid.width + 2), hole, dtype=np.uint8)
    pad[1:-1, 1:-1] = base
    present = np.ones((grid.height, grid.width), dtype=bool)
    land_idx = fixtures.land_index(spec.seed)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            if fixtures.tile_arrays(spec, dataset, ty, tx,
                                    land_idx) is None:
                x, y, nc, nr = grid.tile_window(ty, tx)
                pad[1 + y:1 + y + nr, 1 + x:1 + x + nc] = hole
                present[y:y + nr, x:x + nc] = False
    return watershed_hist(pad, present)


def strahler_hist(pad: np.ndarray, present: np.ndarray,
                  threshold: int = 1) -> pd.DataFrame:
    """Sequential whole-array Strahler stream-order histogram over a
    (+1)-padded elevation array and a present-pixel mask: global flow
    accumulation (descending-elevation scatter), stream mask at
    ``acc >= threshold``, then a global descending sweep finalizing
    each stream pixel's order from its (max, count-at-max) child
    summary — no tiling, no seams."""
    from .pipelines.hydro import _DX, _DY, _merge_level_contrib
    from .pipelines.pyramid import flowdir_codes

    code = flowdir_codes(pad)
    elev = pad[1:-1, 1:-1].astype(np.int64)
    h, w = elev.shape
    dy = _DY[code]
    dx = _DX[code]
    yy = np.broadcast_to(np.arange(h)[:, None], (h, w))
    xx = np.broadcast_to(np.arange(w)[None, :], (h, w))
    ty = yy + dy
    tx = xx + dx
    flows = present & (code != 0)
    inframe = flows & (ty >= 0) & (ty < h) & (tx >= 0) & (tx < w)
    valid = np.zeros_like(flows)
    valid[inframe] = present[ty[inframe], tx[inframe]]

    acc = np.zeros((h, w), dtype=np.int64)
    for lvl in np.unique(elev[present])[::-1]:
        m = valid & (elev == lvl)
        if m.any():
            np.add.at(acc, (ty[m], tx[m]), acc[m] + 1)
    stream = present & (acc >= int(threshold))

    fe = elev.ravel()
    fs = stream.ravel()
    fv = valid.ravel()
    ftgt = (ty * w + tx).ravel()
    mx = np.zeros(h * w, dtype=np.int64)
    ct = np.zeros(h * w, dtype=np.int64)
    order = np.zeros(h * w, dtype=np.int64)
    for lvl in np.unique(fe[fs])[::-1]:
        si = np.flatnonzero(fs & (fe == lvl))
        order[si] = np.where(mx[si] == 0, 1, mx[si] + (ct[si] >= 2))
        pi = si[fv[si]]
        pi = pi[fs[ftgt[pi]]]
        if len(pi):
            _merge_level_contrib(mx, ct, ftgt[pi], order[pi])
    u, cnt = np.unique(order[fs], return_counts=True)
    return pd.DataFrame({"strahler": u.astype(np.int64),
                         "n_px": cnt.astype(np.int64)})


def strahler_oracle(spec, dataset: str = "kg", threshold: int = 1,
                    hole_value: int | None = None) -> pd.DataFrame:
    """Sequential Strahler summary over the assembled full array;
    identical hole padding to ``flow_accum_oracle``."""
    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    hole = nodata if hole_value is None else int(hole_value)
    base = full_raster(spec, dataset)[0]
    pad = np.full((grid.height + 2, grid.width + 2), hole, dtype=np.uint8)
    pad[1:-1, 1:-1] = base
    present = np.ones((grid.height, grid.width), dtype=bool)
    land_idx = fixtures.land_index(spec.seed)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            if fixtures.tile_arrays(spec, dataset, ty, tx,
                                    land_idx) is None:
                x, y, nc, nr = grid.tile_window(ty, tx)
                pad[1 + y:1 + y + nr, 1 + x:1 + x + nc] = hole
                present[y:y + nr, x:x + nc] = False
    return strahler_hist(pad, present, threshold)


def cost_dist_field(pad: np.ndarray, target: int,
                    hole: int) -> tuple[np.ndarray, np.ndarray, np.int64]:
    """Sequential least-cost distance FIELD over a hole-padded array
    (the unique integer min-plus fixpoint; see cost_distance_hist).
    Returns (dist, passable, unreach sentinel)."""
    unreach = np.int64(1) << 62
    cost = pad.astype(np.int64)
    passable = pad != hole
    dist = np.full(pad.shape, unreach, dtype=np.int64)
    dist[passable & (pad == target)] = 0
    moves = ((-1, 0, 2), (1, 0, 2), (0, -1, 2), (0, 1, 2),
             (-1, -1, 3), (-1, 1, 3), (1, -1, 3), (1, 1, 3))
    h, w = pad.shape
    for _ in range(h * w + 2):
        before = dist.copy()
        for dy, dx, wt in moves:
            src = (slice(max(0, -dy), h - max(0, dy)),
                   slice(max(0, -dx), w - max(0, dx)))
            dst = (slice(max(0, dy), h - max(0, -dy)),
                   slice(max(0, dx), w - max(0, -dx)))
            cand = dist[src] + (cost[src] + cost[dst]) * wt
            np.copyto(cand, unreach, where=~(passable[src] & passable[dst]))
            np.minimum(dist[dst], cand, out=dist[dst])
        if np.array_equal(before, dist):
            break
    else:
        raise AssertionError("cost-distance oracle did not converge")
    return dist, passable, unreach


def cost_distance_hist(pad: np.ndarray, target: int,
                       hole: int) -> pd.DataFrame:
    """Sequential least-cost-distance histogram over a hole-padded
    array: 8-connected min-plus with doubled-integer weights — step
    u -> v costs (c[u]+c[v])*W, W = 2 orthogonal / 3 diagonal (the
    metric of ``pipelines/hydro.cost_distance``; integer min-plus has
    a unique least fixpoint, so Jacobi sweeps to a no-op ARE the
    answer). Hole pixels are impassable; unreachable passable pixels
    report dist = -1."""
    dist, passable, unreach = cost_dist_field(pad, target, hole)
    d = dist[passable]
    d = np.where(d >= unreach, np.int64(-1), d)
    u, cnt = np.unique(d, return_counts=True)
    return pd.DataFrame({"dist": u.astype(np.int64),
                         "n_px": cnt.astype(np.int64)})


def cost_distance_oracle(spec, dataset: str = "kg", target: int = 14,
                         hole_value: int | None = None) -> pd.DataFrame:
    """Whole-array cost distance with the same hole padding as
    ``flow_accum_oracle`` (absent tiles are impassable holes)."""
    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    hole = nodata if hole_value is None else int(hole_value)
    base = full_raster(spec, dataset)[0]
    pad = np.full((grid.height + 2, grid.width + 2), hole, dtype=np.uint8)
    pad[1:-1, 1:-1] = base
    land_idx = fixtures.land_index(spec.seed)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            if fixtures.tile_arrays(spec, dataset, ty, tx,
                                    land_idx) is None:
                x, y, nc, nr = grid.tile_window(ty, tx)
                pad[1 + y:1 + y + nr, 1 + x:1 + x + nc] = hole
    return cost_distance_hist(pad, int(target), hole)


def cost_allocation_hist(pad: np.ndarray, target: int,
                         hole: int) -> pd.DataFrame:
    """Sequential least-cost allocation summary (weighted Voronoi):
    min-plus over PACKED keys dist * 2^31 + source-pixel-id — the
    lexicographic (dist, src) least fixpoint of
    ``pipelines/hydro.cost_allocation`` — then the region-size
    histogram (kind, size, n) with an unreachable row."""
    unreach = np.int64(1) << 62
    scale = np.int64(1) << 31
    cost = pad.astype(np.int64)
    passable = pad != hole
    dist = np.full(pad.shape, unreach, dtype=np.int64)
    h, w = pad.shape
    sy, sx = np.nonzero(passable & (pad == target))
    # source key = its own global pixel id on the UNPADDED lattice
    dist[sy, sx] = (sy - 1) * np.int64(w - 2) + (sx - 1)
    moves = ((-1, 0, 2), (1, 0, 2), (0, -1, 2), (0, 1, 2),
             (-1, -1, 3), (-1, 1, 3), (1, -1, 3), (1, 1, 3))
    for _ in range(h * w + 2):
        before = dist.copy()
        for dy, dx, wt in moves:
            src = (slice(max(0, -dy), h - max(0, dy)),
                   slice(max(0, -dx), w - max(0, dx)))
            dst = (slice(max(0, dy), h - max(0, -dy)),
                   slice(max(0, dx), w - max(0, -dx)))
            cand = dist[src] + (cost[src] + cost[dst]) * (wt * scale)
            np.copyto(cand, unreach, where=~(passable[src] & passable[dst]))
            np.minimum(dist[dst], cand, out=dist[dst])
        if np.array_equal(before, dist):
            break
    else:
        raise AssertionError("cost-allocation oracle did not converge")
    d = dist[passable]
    n_unreach = int((d >= unreach).sum())
    src_ids = d[d < unreach] % scale
    _, sizes = np.unique(src_ids, return_counts=True)
    u, cnt = np.unique(sizes, return_counts=True)
    out = pd.DataFrame({"kind": ["alloc"] * len(u),
                        "size": u.astype(np.int64),
                        "n": cnt.astype(np.int64)})
    if n_unreach:
        out = pd.concat(
            [out, pd.DataFrame({"kind": ["unreachable"],
                                "size": [np.int64(n_unreach)],
                                "n": [np.int64(1)]})],
            ignore_index=True)
    return out


def cost_allocation_oracle(spec, dataset: str = "kg", target: int = 14,
                           hole_value: int | None = None) -> pd.DataFrame:
    """Whole-array cost allocation with the same hole padding as
    ``flow_accum_oracle``."""
    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    hole = nodata if hole_value is None else int(hole_value)
    base = full_raster(spec, dataset)[0]
    pad = np.full((grid.height + 2, grid.width + 2), hole, dtype=np.uint8)
    pad[1:-1, 1:-1] = base
    land_idx = fixtures.land_index(spec.seed)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            if fixtures.tile_arrays(spec, dataset, ty, tx,
                                    land_idx) is None:
                x, y, nc, nr = grid.tile_window(ty, tx)
                pad[1 + y:1 + y + nr, 1 + x:1 + x + nc] = hole
    return cost_allocation_hist(pad, int(target), hole)


def viewshed_oracle(spec, dataset: str = "kg", radius: int = 4,
                    hole_value: int | None = None) -> pd.DataFrame:
    """Sequential total-viewshed histogram: the whole raster assembled
    with the usual hole padding, one ``visible_counts`` call over an
    R-margin pad (the per-pixel LOS rule is a deterministic pure
    function — what the distributed gate proves is the R-halo tile
    decomposition, so sharing the core is sound)."""
    from .pipelines.viewshed import visible_counts

    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    hole = nodata if hole_value is None else int(hole_value)
    h = int(radius)
    base = full_raster(spec, dataset)[0]
    pad = np.full((grid.height + 2 * h, grid.width + 2 * h), hole,
                  dtype=np.uint8)
    pad[h:-h, h:-h] = base
    land_idx = fixtures.land_index(spec.seed)
    present = np.ones((grid.height, grid.width), dtype=bool)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            if fixtures.tile_arrays(spec, dataset, ty, tx,
                                    land_idx) is None:
                x, y, nc, nr = grid.tile_window(ty, tx)
                pad[h + y:h + y + nr, h + x:h + x + nc] = hole
                present[y:y + nr, x:x + nc] = False
    cnt = visible_counts(pad, h, hole)
    passable = present & (base != hole)
    u, n = np.unique(cnt[passable], return_counts=True)
    return pd.DataFrame({"n_vis": u.astype(np.int64),
                         "n_px": n.astype(np.int64)})


def zonal_cost_stats_oracle(spec, dataset: str = "kg", target: int = 14,
                            hole_value: int | None = None) -> pd.DataFrame:
    """Sequential cost-distance × zonal composition: the whole-array
    least-cost field (unique min-plus fixpoint) intersected with each
    admin's full-grid claim mask, restricted to present passable
    pixels — per-admin accessibility statistics."""
    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    hole = nodata if hole_value is None else int(hole_value)
    base = full_raster(spec, dataset)[0]
    pad = np.full((grid.height + 2, grid.width + 2), hole, dtype=np.uint8)
    pad[1:-1, 1:-1] = base
    land_idx = fixtures.land_index(spec.seed)
    present = np.zeros((grid.height, grid.width), dtype=bool)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            x, y, nc, nr = grid.tile_window(ty, tx)
            if fixtures.tile_arrays(spec, dataset, ty, tx,
                                    land_idx) is None:
                pad[1 + y:1 + y + nr, 1 + x:1 + x + nc] = hole
            else:
                present[y:y + nr, x:x + nc] = True
    dist, passable, unreach = cost_dist_field(pad, int(target), hole)
    din = dist[1:-1, 1:-1]
    pin = passable[1:-1, 1:-1] & present
    agg: dict[str, list] = {}
    for _fidx, admin, mask in feature_masks(spec, grid):
        vals = din[mask & pin]
        if not len(vals):
            continue
        reach = vals[vals < unreach]
        row = [len(reach),
               int(reach.sum()) if len(reach) else 0,
               int(reach.min()) if len(reach) else -1,
               int(reach.max()) if len(reach) else -1,
               int(len(vals) - len(reach))]
        cur = agg.get(admin)
        if cur is None:
            agg[admin] = row
        else:
            cur[0] += row[0]
            cur[1] += row[1]
            cur[2] = (row[2] if cur[2] < 0
                      else cur[2] if row[2] < 0 else min(cur[2], row[2]))
            cur[3] = max(cur[3], row[3])
            cur[4] += row[4]
    admins = sorted(agg)
    cols = (np.array([agg[a] for a in admins], dtype=np.int64)
            if admins else np.zeros((0, 5), dtype=np.int64))
    out = pd.DataFrame({
        "admin": admins,
        "n_reach": cols[:, 0], "sum_dist": cols[:, 1],
        "min_dist": cols[:, 2], "max_dist": cols[:, 3],
        "n_unreach": cols[:, 4]})
    for c in out.columns:
        if c != "admin":
            out[c] = out[c].astype(np.int64)
    return out


def upsample_bilinear_oracle(spec, dataset: str = "kg", k: int = 3,
                             hole_value: int | None = None
                             ) -> pd.DataFrame:
    """Sequential whole-array bilinear k×-upsample histogram: the
    integer stencil of ``warp.upsample_bilinear`` over the hole-padded
    full raster with edge replication at the world frame; nodata
    propagates through any nonzero-weight stencil touch (value -1).
    Output pixels of absent tiles are excluded on both sides."""
    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    hole = nodata if hole_value is None else int(hole_value)
    base = full_raster(spec, dataset)[0].copy()
    land_idx = fixtures.land_index(spec.seed)
    present = np.ones((grid.height, grid.width), dtype=bool)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            if fixtures.tile_arrays(spec, dataset, ty, tx,
                                    land_idx) is None:
                x, y, nc, nr = grid.tile_window(ty, tx)
                base[y:y + nr, x:x + nc] = hole
                present[y:y + nr, x:x + nc] = False
    pad = np.pad(base, 1, mode="edge")
    V = pad.astype(np.int64)
    P = pad != hole
    kk = int(k)
    H, W = grid.height, grid.width
    yo = np.arange(H * kk, dtype=np.int64)
    xo = np.arange(W * kk, dtype=np.int64)
    ny = 2 * yo + 1 - kk
    nx = 2 * xo + 1 - kk
    fy = ny // (2 * kk)
    fx = nx // (2 * kk)
    ry = (ny - fy * 2 * kk)[:, None]
    rx = (nx - fx * 2 * kk)[None, :]
    ly, lx = fy + 1, fx + 1
    wy = 2 * kk - ry
    wx = 2 * kk - rx
    A = np.ix_(ly, lx)
    Bx = np.ix_(ly, lx + 1)
    Cy = np.ix_(ly + 1, lx)
    D = np.ix_(ly + 1, lx + 1)
    num = (V[A] * (wy * wx) + V[Bx] * (wy * rx)
           + V[Cy] * (ry * wx) + V[D] * (ry * rx))
    out = num // (4 * kk * kk)
    ok = ((P[A] | (wy * wx == 0)) & (P[Bx] | (wy * rx == 0))
          & (P[Cy] | (ry * wx == 0)) & (P[D] | (ry * rx == 0)))
    vals = np.where(ok, out, np.int64(-1))
    keep = np.repeat(np.repeat(present, kk, axis=0), kk, axis=1)
    u, n = np.unique(vals[keep], return_counts=True)
    return pd.DataFrame({"value": u.astype(np.int64),
                         "n_px": n.astype(np.int64)})


def flowlen_hist(pad: np.ndarray, present: np.ndarray) -> pd.DataFrame:
    """Sequential whole-array D8 flow-path-length histogram: weighted
    global pointer doubling (steps = edges to current parent; pits
    terminate free, external drains cost their final move) — a
    deliberately different derivation from the kernel's per-tile
    doubling + seam chase."""
    from .pipelines.hydro import _DX, _DY
    from .pipelines.pyramid import flowdir_codes

    code = flowdir_codes(pad)
    h, w = code.shape
    dy = _DY[code]
    dx = _DX[code]
    yy = np.broadcast_to(np.arange(h)[:, None], (h, w))
    xx = np.broadcast_to(np.arange(w)[None, :], (h, w))
    ty = yy + dy
    tx = xx + dx
    flows = present & (code != 0)
    inframe = flows & (ty >= 0) & (ty < h) & (tx >= 0) & (tx < w)
    valid = np.zeros_like(flows)
    valid[inframe] = present[ty[inframe], tx[inframe]]

    parent = np.arange(h * w, dtype=np.int64)
    vm = valid.ravel()
    parent[vm] = (ty * w + tx).ravel()[vm]
    steps = vm.astype(np.int64)
    for _ in range(int(np.ceil(np.log2(max(h * w, 2)))) + 1):
        steps = steps + steps[parent]
        parent = parent[parent]
    # terminal cost: flowing root (external drain) pays its last move
    term = (flows.ravel() & ~vm).astype(np.int64)
    lens = steps + term[parent]
    pr = present.ravel()
    u, n = np.unique(lens[pr], return_counts=True)
    return pd.DataFrame({"path_len": u.astype(np.int64),
                         "n_px": n.astype(np.int64)})


def flowlen_oracle(spec, dataset: str = "kg",
                   hole_value: int | None = None) -> pd.DataFrame:
    """Whole-array flow path length with the same hole padding as
    ``flow_accum_oracle``."""
    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    hole = nodata if hole_value is None else int(hole_value)
    base = full_raster(spec, dataset)[0]
    pad = np.full((grid.height + 2, grid.width + 2), hole, dtype=np.uint8)
    pad[1:-1, 1:-1] = base
    present = np.ones((grid.height, grid.width), dtype=bool)
    land_idx = fixtures.land_index(spec.seed)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            if fixtures.tile_arrays(spec, dataset, ty, tx,
                                    land_idx) is None:
                x, y, nc, nr = grid.tile_window(ty, tx)
                pad[1 + y:1 + y + nr, 1 + x:1 + x + nc] = hole
                present[y:y + nr, x:x + nc] = False
    return flowlen_hist(pad, present)


def contour_oracle(spec, dataset: str = "kg", interval: int = 16,
                   hole_value: int | None = None) -> pd.DataFrame:
    """Sequential whole-array contour-crossing histogram (same edge
    ownership and difference-array expansion as
    ``viewshed.contour_crossings``, over the hole-padded raster)."""
    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    hole = nodata if hole_value is None else int(hole_value)
    base = full_raster(spec, dataset)[0].copy()
    land_idx = fixtures.land_index(spec.seed)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            if fixtures.tile_arrays(spec, dataset, ty, tx,
                                    land_idx) is None:
                x, y, nc, nr = grid.tile_window(ty, tx)
                base[y:y + nr, x:x + nc] = hole
    V = base.astype(np.int64) // int(interval)
    P = base != hole
    diff = np.zeros(258, dtype=np.int64)
    for (sa, sb) in (((slice(None), slice(None, -1)),
                      (slice(None), slice(1, None))),
                     ((slice(None, -1), slice(None)),
                      (slice(1, None), slice(None)))):
        ok = P[sa] & P[sb]
        a = V[sa][ok]
        bb = V[sb][ok]
        cross = a != bb
        lo = np.minimum(a[cross], bb[cross]) + 1
        hi = np.maximum(a[cross], bb[cross])
        np.add.at(diff, lo, 1)
        np.add.at(diff, hi + 1, -1)
    lvl = np.cumsum(diff[:-1])
    nz = np.flatnonzero(lvl)
    return pd.DataFrame({"level": nz.astype(np.int64),
                         "n_edges": lvl[nz].astype(np.int64)})


def zonal_viewshed_oracle(spec, dataset: str = "kg", radius: int = 4,
                          hole_value: int | None = None) -> pd.DataFrame:
    """Sequential viewshed × zonal composition: the whole-array
    visibility counts intersected with each admin's claim mask,
    restricted to present passable pixels."""
    from .pipelines.viewshed import visible_counts

    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    hole = nodata if hole_value is None else int(hole_value)
    h = int(radius)
    base = full_raster(spec, dataset)[0]
    pad = np.full((grid.height + 2 * h, grid.width + 2 * h), hole,
                  dtype=np.uint8)
    pad[h:-h, h:-h] = base
    land_idx = fixtures.land_index(spec.seed)
    present = np.ones((grid.height, grid.width), dtype=bool)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            if fixtures.tile_arrays(spec, dataset, ty, tx,
                                    land_idx) is None:
                x, y, nc, nr = grid.tile_window(ty, tx)
                pad[h + y:h + y + nr, h + x:h + x + nc] = hole
                present[y:y + nr, x:x + nc] = False
    cnt = visible_counts(pad, h, hole)
    pin = present & (base != hole)
    agg: dict[str, list] = {}
    for _fidx, admin, mask in feature_masks(spec, grid):
        vals = cnt[mask & pin]
        if not len(vals):
            continue
        row = [len(vals), int(vals.sum()), int(vals.min()),
               int(vals.max())]
        cur = agg.get(admin)
        if cur is None:
            agg[admin] = row
        else:
            cur[0] += row[0]
            cur[1] += row[1]
            cur[2] = min(cur[2], row[2])
            cur[3] = max(cur[3], row[3])
    admins = sorted(agg)
    cols = (np.array([agg[a] for a in admins], dtype=np.int64)
            if admins else np.zeros((0, 4), dtype=np.int64))
    out = pd.DataFrame({"admin": admins, "n_px": cols[:, 0],
                        "sum": cols[:, 1], "min": cols[:, 2],
                        "max": cols[:, 3]})
    for c in out.columns:
        if c != "admin":
            out[c] = out[c].astype(np.int64)
    return out


def raster_calc_oracle(spec, expr: str,
                       variables: dict[str, str]) -> pd.DataFrame:
    """Sequential whole-array map-algebra histogram mirroring
    ``viewshed.raster_calc``: tiles missing ANY input are wholly
    nodata; elsewhere a pixel is excluded (value −1) when any input
    pixel is nodata."""
    import re as _re
    assert _re.match(r"^[A-Z0-9+\-*/%()<>=&|~ ]+$", expr)
    names = sorted(variables)
    grid = spec.grid(fixtures.DATASET_GRID[variables[names[0]]])
    land_idx = fixtures.land_index(spec.seed)
    full = {n: full_raster(spec, variables[n])[0].astype(np.int64)
            for n in names}
    nodata = {n: fixtures.DATASET_NODATA[variables[n]] for n in names}
    pres = {n: np.zeros((grid.tiles_y, grid.tiles_x), dtype=bool)
            for n in names}
    for n in names:
        for ty in range(grid.tiles_y):
            for tx in range(grid.tiles_x):
                pres[n][ty, tx] = fixtures.tile_arrays(
                    spec, variables[n], ty, tx, land_idx) is not None
    code = compile(expr, "<raster_calc_oracle>", "eval")
    hist: dict[int, int] = {}
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            have = [pres[n][ty, tx] for n in names]
            if not any(have):
                continue
            x, y, nc, nr = grid.tile_window(ty, tx)
            if not all(have):
                hist[-1] = hist.get(-1, 0) + nr * nc
                continue
            arrs = {n: full[n][y:y + nr, x:x + nc] for n in names}
            ok = np.ones((nr, nc), dtype=bool)
            for n in names:
                ok &= arrs[n] != nodata[n]
            val = np.asarray(eval(code, {"__builtins__": {}}, arrs)
                             ).astype(np.int64)
            out = np.where(ok, val, np.int64(-1))
            u, k = np.unique(out, return_counts=True)
            for v, c in zip(u.tolist(), k.tolist()):
                hist[v] = hist.get(v, 0) + c
    keys = sorted(hist)
    return pd.DataFrame({"value": np.asarray(keys, np.int64),
                         "n_px": np.asarray([hist[k] for k in keys],
                                            np.int64)})


def cost_distance_cross_oracle(spec, cost_dataset: str = "kg",
                               source_dataset: str = "wk",
                               target: int = 5,
                               hole_value: int | None = None
                               ) -> pd.DataFrame:
    """Whole-array cross-layer cost distance: sources from a
    different same-grid layer (its own nodata respected), traversal
    and histogram on the cost layer — mirrors
    ``hydro.cost_distance_cross``."""
    grid = spec.grid(fixtures.DATASET_GRID[cost_dataset])
    nodata = fixtures.DATASET_NODATA[cost_dataset]
    hole = nodata if hole_value is None else int(hole_value)
    src_nodata = fixtures.DATASET_NODATA[source_dataset]
    base = full_raster(spec, cost_dataset)[0]
    src = full_raster(spec, source_dataset)[0]
    pad = np.full((grid.height + 2, grid.width + 2), hole, dtype=np.uint8)
    pad[1:-1, 1:-1] = base
    land_idx = fixtures.land_index(spec.seed)
    src_present = np.ones((grid.height, grid.width), dtype=bool)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            x, y, nc, nr = grid.tile_window(ty, tx)
            if fixtures.tile_arrays(spec, cost_dataset, ty, tx,
                                    land_idx) is None:
                pad[1 + y:1 + y + nr, 1 + x:1 + x + nc] = hole
            if fixtures.tile_arrays(spec, source_dataset, ty, tx,
                                    land_idx) is None:
                src_present[y:y + nr, x:x + nc] = False
    unreach = np.int64(1) << 62
    cost = pad.astype(np.int64)
    passable = pad != hole
    dist = np.full(pad.shape, unreach, dtype=np.int64)
    src_mask = (passable[1:-1, 1:-1] & src_present
                & (src != src_nodata) & (src == int(target)))
    dist[1:-1, 1:-1][src_mask] = 0
    moves = ((-1, 0, 2), (1, 0, 2), (0, -1, 2), (0, 1, 2),
             (-1, -1, 3), (-1, 1, 3), (1, -1, 3), (1, 1, 3))
    h, w = pad.shape
    for _ in range(h * w + 2):
        before = dist.copy()
        for dy, dx, wt in moves:
            s_ = (slice(max(0, -dy), h - max(0, dy)),
                  slice(max(0, -dx), w - max(0, dx)))
            d_ = (slice(max(0, dy), h - max(0, -dy)),
                  slice(max(0, dx), w - max(0, -dx)))
            cand = dist[s_] + (cost[s_] + cost[d_]) * wt
            np.copyto(cand, unreach, where=~(passable[s_] & passable[d_]))
            np.minimum(dist[d_], cand, out=dist[d_])
        if np.array_equal(before, dist):
            break
    else:
        raise AssertionError("cross cost-distance oracle did not converge")
    d = dist[passable]
    d = np.where(d >= unreach, np.int64(-1), d)
    u, cnt = np.unique(d, return_counts=True)
    return pd.DataFrame({"dist": u.astype(np.int64),
                         "n_px": cnt.astype(np.int64)})


def fill_sinks_hist(pad: np.ndarray, hole: int) -> pd.DataFrame:
    """Sequential PRIORITY-FLOOD depression filling (Barnes, Lehman &
    Mulla 2014, the classic one-pass heap algorithm) over a
    hole-padded raster: seeds are passable pixels 8-adjacent to a
    drain (hole pixel or the pad frame) at priority E; popping in
    ascending W order finalises W = max(E, W_parent). The filled
    values are the greatest fixpoint of W = max(E, min nbr W) with
    drains at 0, so this independently cross-checks the distributed
    block-Jacobi kernel in ``pipelines/hydro.fill_sinks``. Returns
    the (depth = W - E, n_px) histogram over passable pixels."""
    wfill = fill_values(pad, hole)
    passable = pad != hole
    u, cnt = np.unique(wfill[passable] - pad.astype(np.int64)[passable],
                       return_counts=True)
    return pd.DataFrame({"depth": u.astype(np.int64),
                         "n_px": cnt.astype(np.int64)})


def fill_values(pad: np.ndarray, hole: int) -> np.ndarray:
    """Priority-flood filled surface W per pixel (-1 on impassable);
    the array form behind ``fill_sinks_hist``, also used to condition
    a DEM before sequential flow routing."""
    import heapq

    e = pad.astype(np.int64)
    passable = pad != hole
    h, w = pad.shape
    # seed mask: passable with at least one impassable 8-neighbor
    # (the pad frame is hole, so frame-adjacency is included)
    near_drain = np.zeros((h, w), dtype=bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            s_ = (slice(max(0, -dy), h - max(0, dy)),
                  slice(max(0, -dx), w - max(0, dx)))
            d_ = (slice(max(0, dy), h - max(0, -dy)),
                  slice(max(0, dx), w - max(0, -dx)))
            near_drain[d_] |= ~passable[s_]
    wfill = np.full((h, w), -1, dtype=np.int64)
    done = ~passable
    heap: list[tuple[int, int, int]] = []
    sy, sx = np.nonzero(passable & near_drain)
    for y, x in zip(sy.tolist(), sx.tolist()):
        heapq.heappush(heap, (int(e[y, x]), y, x))
        done[y, x] = True
    moves = ((-1, 0), (1, 0), (0, -1), (0, 1),
             (-1, -1), (-1, 1), (1, -1), (1, 1))
    while heap:
        wv, y, x = heapq.heappop(heap)
        wfill[y, x] = wv
        for dy, dx in moves:
            ny, nx = y + dy, x + dx
            if 0 <= ny < h and 0 <= nx < w and not done[ny, nx]:
                done[ny, nx] = True
                heapq.heappush(heap, (max(int(e[ny, nx]), wv), ny, nx))
    if passable.any() and (wfill[passable] < 0).any():
        raise AssertionError("priority flood left unvisited pixels")
    return wfill


def fill_sinks_oracle(spec, dataset: str = "kg",
                      hole_value: int | None = None) -> pd.DataFrame:
    """Whole-array depression fill with the same hole padding as
    ``cost_distance_oracle`` (absent tiles drain freely)."""
    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    hole = nodata if hole_value is None else int(hole_value)
    base = full_raster(spec, dataset)[0]
    pad = np.full((grid.height + 2, grid.width + 2), hole, dtype=np.uint8)
    pad[1:-1, 1:-1] = base
    land_idx = fixtures.land_index(spec.seed)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            if fixtures.tile_arrays(spec, dataset, ty, tx,
                                    land_idx) is None:
                x, y, nc, nr = grid.tile_window(ty, tx)
                pad[1 + y:1 + y + nr, 1 + x:1 + x + nc] = hole
    return fill_sinks_hist(pad, hole)


def sieve_oracle(spec, dataset: str = "kg",
                 threshold: int = 8) -> pd.DataFrame:
    """Sequential sieve census: whole-array labeling + whole-array
    adjacency extraction, then a plain rescan contraction loop (no
    heap) applying the identical raster-sieve rules — smallest
    (n_px, region_id) below threshold merges into its largest
    neighbor (ties to the smaller id), newly same-class neighbors
    union in, isolated small regions survive. The distributed pass
    derives its inputs from per-tile labeling + seam union instead;
    equality checks both the inputs and the deterministic rules."""
    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    land_idx = fixtures.land_index(spec.seed)
    full = np.full((grid.height, grid.width), nodata, dtype=np.uint8)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            arrs = fixtures.tile_arrays(spec, dataset, ty, tx, land_idx)
            if arrs is None:
                continue
            x, y, nc, nr = grid.tile_window(ty, tx)
            full[y:y + nr, x:x + nc] = arrs[0]
    return sieve_census(full, int(nodata), int(threshold))


def sieve_census(full: np.ndarray, nodata: int,
                 threshold: int) -> pd.DataFrame:
    from .pipelines.regions import label_components

    glab = label_components(full, nodata)
    flat = glab.ravel()
    fg = flat >= 0
    reps, counts = np.unique(flat[fg], return_counts=True)
    size = {int(r): int(s) for r, s in zip(reps, counts)}
    cls = {int(r): int(c) for r, c in
           zip(reps, full.ravel()[reps.astype(np.int64)])}
    nbrs: dict[int, set] = {int(r): set() for r in reps}

    def add_edges(a: np.ndarray, b: np.ndarray) -> None:
        ok = (a >= 0) & (b >= 0) & (a != b)
        if not ok.any():
            return
        pr = np.unique(np.stack([np.minimum(a[ok], b[ok]),
                                 np.maximum(a[ok], b[ok])], axis=1),
                       axis=0)
        for x, y in pr.tolist():
            nbrs[int(x)].add(int(y))
            nbrs[int(y)].add(int(x))

    add_edges(glab[:, :-1].ravel(), glab[:, 1:].ravel())
    add_edges(glab[:-1, :].ravel(), glab[1:, :].ravel())

    # (size, id)-ordered merges via a lazy-deletion heap: equivalent
    # to rescanning for the minimum each round (stale entries are
    # skipped; isolated regions are popped once and never re-pushed,
    # and can never become actionable since their surroundings are
    # background forever)
    import heapq

    heap = [(s, r) for r, s in size.items() if s < threshold]
    heapq.heapify(heap)
    while heap:
        s, r = heapq.heappop(heap)
        if size.get(r) != s or s >= threshold:
            continue
        cand = nbrs[r]
        if not cand:
            continue
        tgt = max(cand, key=lambda c: (size[c], -c))
        members = {r, tgt} | {c for c in cand if cls[c] == cls[tgt]}
        new_id = min(members)
        new_nb = set().union(*(nbrs[m] for m in members)) - members
        new_size = sum(size[m] for m in members)
        new_cls = cls[tgt]
        for m in members:
            del size[m], cls[m]
            nbrs.pop(m)
        size[new_id] = new_size
        cls[new_id] = new_cls
        nbrs[new_id] = new_nb
        for o in new_nb:
            nbrs[o] -= members
            nbrs[o].add(new_id)
        if new_size < threshold:
            heapq.heappush(heap, (new_size, new_id))

    rows: dict[int, list] = {}
    for r, s in size.items():
        cur = rows.setdefault(cls[r], [0, 0])
        cur[0] += 1
        cur[1] += s
    out = pd.DataFrame(
        [(c, n, px) for c, (n, px) in sorted(rows.items())],
        columns=["cls", "n_regions", "n_px"])
    return out.astype(np.int64)


def focal_mean_radius_oracle(spec, dataset: str = "kg", k: int = 3,
                             hole_value: int | None = None) -> pd.DataFrame:
    """Whole-array radius-k focal mean histogram: one global integral
    image over the hole-padded mosaic — independently checks the
    per-tile k-halo assembly AND the clipped-window algebra."""
    from .pipelines.pyramid import _window_sums

    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    hole = nodata if hole_value is None else int(hole_value)
    land_idx = fixtures.land_index(spec.seed)
    full = np.full((grid.height, grid.width), hole, dtype=np.uint8)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            arrs = fixtures.tile_arrays(spec, dataset, ty, tx, land_idx)
            if arrs is None:
                continue
            x, y, nc, nr = grid.tile_window(ty, tx)
            full[y:y + nr, x:x + nc] = arrs[0]
    pad = np.full((grid.height + 2 * k, grid.width + 2 * k), hole,
                  dtype=np.uint8)
    pad[k:-k, k:-k] = full
    valid = pad != hole
    vsum, vcnt = _window_sums(pad, valid, k)
    ctr = valid[k:-k, k:-k]
    mean_floor = vsum[ctr] // vcnt[ctr]
    u, cnt = np.unique(mean_floor, return_counts=True)
    return pd.DataFrame({"mean_floor": u.astype(np.int64),
                         "n_px": cnt.astype(np.int64)})


def geomorphon_oracle(spec, dataset: str = "kg", k: int = 4,
                      hole_value: int | None = None) -> pd.DataFrame:
    """Whole-array geomorphon pattern census: one global k-pad and the
    shared exact ternary classifier — independently checks the
    per-tile k-halo assembly (the classifier is a pure per-pixel
    function, so decomposition is the only thing that can differ)."""
    from .pipelines.pyramid import geomorphon_codes

    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    hole = nodata if hole_value is None else int(hole_value)
    land_idx = fixtures.land_index(spec.seed)
    full = np.full((grid.height, grid.width), hole, dtype=np.uint8)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            arrs = fixtures.tile_arrays(spec, dataset, ty, tx, land_idx)
            if arrs is None:
                continue
            x, y, nc, nr = grid.tile_window(ty, tx)
            full[y:y + nr, x:x + nc] = arrs[0]
    return geomorphon_hist(full, hole, k)


def geomorphon_hist(full: np.ndarray, hole: int, k: int) -> pd.DataFrame:
    """Sequential geomorphon pattern census over one whole array
    (shared by the synthetic oracle and the real-mask direct walk)."""
    from .pipelines.pyramid import geomorphon_codes

    h, w = full.shape
    pad = np.full((h + 2 * k, w + 2 * k), hole, dtype=np.uint8)
    pad[k:-k, k:-k] = full
    valid = pad != hole
    n_minus, n_plus = geomorphon_codes(pad, valid, k, h, w)
    ctr = valid[k:-k, k:-k]
    key = n_minus[ctr] * 9 + n_plus[ctr]
    u, cnt = np.unique(key, return_counts=True)
    return pd.DataFrame({
        "n_minus": (u // 9).astype(np.int64),
        "n_plus": (u % 9).astype(np.int64),
        "n_px": cnt.astype(np.int64)})


def class_morphology_oracle(spec, dataset: str = "lc",
                            target: int = 210, k: int = 2,
                            hole_value: int | None = None) -> pd.DataFrame:
    """Whole-array morphology census (source/dilate/erode/open/close)
    with one global 2k pad; rows counted over PRESENT-tile pixels
    only, exactly the distributed census domain."""
    from .pipelines.pyramid import _window_sums

    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    hole = nodata if hole_value is None else int(hole_value)
    land_idx = fixtures.land_index(spec.seed)
    full = np.full((grid.height, grid.width), hole, dtype=np.uint8)
    present = np.zeros((grid.height, grid.width), dtype=bool)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            arrs = fixtures.tile_arrays(spec, dataset, ty, tx, land_idx)
            if arrs is None:
                continue
            x, y, nc, nr = grid.tile_window(ty, tx)
            full[y:y + nr, x:x + nc] = arrs[0]
            present[y:y + nr, x:x + nc] = True
    return morphology_census(full, present, hole, int(target), k)


def morphology_census(full: np.ndarray, present: np.ndarray,
                      hole: int, target: int, k: int) -> pd.DataFrame:
    """Sequential morphology census over one whole array with an
    explicit present-pixel census domain (shared by the synthetic
    oracle and the real-mask direct walk)."""
    from .pipelines.pyramid import _window_sums

    h, w = full.shape
    pad = np.full((h + 4 * k, w + 4 * k), hole, dtype=np.uint8)
    pad[2 * k:-2 * k, 2 * k:-2 * k] = full
    w2 = (2 * k + 1) ** 2
    x = pad == int(target)
    _, cnt1 = _window_sums(pad, x, k)
    dil = cnt1 > 0
    ero = cnt1 == w2
    _, cnt_d = _window_sums(pad[k:-k, k:-k], dil, k)
    _, cnt_e = _window_sums(pad[k:-k, k:-k], ero, k)
    vals = [int(x[2 * k:-2 * k, 2 * k:-2 * k][present].sum()),
            int(dil[k:-k, k:-k][present].sum()),
            int(ero[k:-k, k:-k][present].sum()),
            int((cnt_e > 0)[present].sum()),
            int((cnt_d == w2)[present].sum())]
    return pd.DataFrame({
        "op": ["source", "dilate", "erode", "open", "close"],
        "n_px": np.asarray(vals, dtype=np.int64)})


def fill_route_oracle(spec, dataset: str = "kg",
                      hole_value: int | None = None) -> pd.DataFrame:
    """Sequential conditioned-DEM chain: priority-flood fill, then D8
    flow accumulation on the FILLED surface — the standard hydrology
    preprocessing composition (fill -> flowdir -> accumulation)."""
    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    hole = nodata if hole_value is None else int(hole_value)
    base = full_raster(spec, dataset)[0]
    pad = np.full((grid.height + 2, grid.width + 2), hole, dtype=np.uint8)
    pad[1:-1, 1:-1] = base
    present = np.ones((grid.height, grid.width), dtype=bool)
    land_idx = fixtures.land_index(spec.seed)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            if fixtures.tile_arrays(spec, dataset, ty, tx,
                                    land_idx) is None:
                x, y, nc, nr = grid.tile_window(ty, tx)
                pad[1 + y:1 + y + nr, 1 + x:1 + x + nc] = hole
                present[y:y + nr, x:x + nc] = False
    wf = fill_values(pad, hole)
    filled = np.where(pad != hole, wf, np.int64(hole)).astype(np.uint8)
    return flow_accum_hist(filled, present)


def region_geometry_oracle(spec, dataset: str = "kg") -> pd.DataFrame:
    """Sequential region geometry: whole-array labeling, then bbox /
    centroid sums / exact hull per region from the global row-extreme
    candidates (shared pure helpers; the decomposition under test is
    the per-tile labeling + seam union + candidate composition)."""
    from .pipelines.regions import (_row_extremes, convex_hull_int,
                                    label_components)

    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    land_idx = fixtures.land_index(spec.seed)
    full = np.full((grid.height, grid.width), nodata, dtype=np.uint8)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            arrs = fixtures.tile_arrays(spec, dataset, ty, tx, land_idx)
            if arrs is None:
                continue
            x, y, nc, nr = grid.tile_window(ty, tx)
            full[y:y + nr, x:x + nc] = arrs[0]
    glab = label_components(full, int(nodata))
    ys, xs = np.nonzero(glab >= 0)
    gg = glab[ys, xs]
    order = np.argsort(gg, kind="stable")
    gs, gys, gxs = gg[order], ys[order].astype(np.int64), \
        xs[order].astype(np.int64)
    cls_flat = full[ys, xs][order]
    cut = np.r_[0, np.flatnonzero(gs[1:] != gs[:-1]) + 1, len(gs)]
    hg, hx, hy = _row_extremes(glab)
    rows = []
    for i in range(len(cut) - 1):
        s, e = cut[i], cut[i + 1]
        sel = hg == gs[s]
        n, a2 = convex_hull_int(np.stack([hx[sel], hy[sel]], axis=1))
        rows.append((int(gs[s]), int(cls_flat[s]),
                     int(gys[s:e].min()), int(gxs[s:e].min()),
                     int(gys[s:e].max()), int(gxs[s:e].max()),
                     int(gys[s:e].sum()), int(gxs[s:e].sum()),
                     n, a2))
    out = pd.DataFrame(rows, columns=[
        "region_id", "cls", "min_y", "min_x", "max_y", "max_x",
        "sum_y", "sum_x", "hull_pts", "hull_area2"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("region_id").reset_index(drop=True)


def cost_corridor_oracle(spec, dataset: str = "kg", target_a: int = 14,
                         target_b: int = 7,
                         hole_value: int | None = None) -> pd.DataFrame:
    """Sequential corridor histogram: two whole-array min-plus fields
    (the cost_distance oracle sweep), pixelwise sum over pixels both
    reach, -1 elsewhere."""
    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    hole = nodata if hole_value is None else int(hole_value)
    base = full_raster(spec, dataset)[0]
    pad = np.full((grid.height + 2, grid.width + 2), hole, dtype=np.uint8)
    pad[1:-1, 1:-1] = base
    land_idx = fixtures.land_index(spec.seed)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            if fixtures.tile_arrays(spec, dataset, ty, tx,
                                    land_idx) is None:
                x, y, nc, nr = grid.tile_window(ty, tx)
                pad[1 + y:1 + y + nr, 1 + x:1 + x + nc] = hole
    unreach = np.int64(1) << 62
    cost = pad.astype(np.int64)
    passable = pad != hole
    h, w = pad.shape
    moves = ((-1, 0, 2), (1, 0, 2), (0, -1, 2), (0, 1, 2),
             (-1, -1, 3), (-1, 1, 3), (1, -1, 3), (1, 1, 3))

    def field(target: int) -> np.ndarray:
        dist = np.full(pad.shape, unreach, dtype=np.int64)
        dist[passable & (pad == target)] = 0
        for _ in range(h * w + 2):
            before = dist.copy()
            for dy, dx, wt in moves:
                s_ = (slice(max(0, -dy), h - max(0, dy)),
                      slice(max(0, -dx), w - max(0, dx)))
                d_ = (slice(max(0, dy), h - max(0, -dy)),
                      slice(max(0, dx), w - max(0, -dx)))
                cand = dist[s_] + (cost[s_] + cost[d_]) * wt
                np.copyto(cand, unreach,
                          where=~(passable[s_] & passable[d_]))
                np.minimum(dist[d_], cand, out=dist[d_])
            if np.array_equal(before, dist):
                break
        else:
            raise AssertionError("corridor oracle did not converge")
        return dist

    fa = field(int(target_a))
    fb = field(int(target_b))
    both = passable & (fa < unreach) & (fb < unreach)
    s = np.where(both, fa + fb, np.int64(-1))[passable]
    u, cnt = np.unique(s, return_counts=True)
    return pd.DataFrame({"total": u.astype(np.int64),
                         "n_px": cnt.astype(np.int64)})


def zonal_fill_stats_oracle(spec, dataset: str = "kg",
                            hole_value: int | None = None) -> pd.DataFrame:
    """Sequential fill × zonal composition: priority-flood depths
    intersected with each admin's claim mask over present passable
    pixels."""
    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    hole = nodata if hole_value is None else int(hole_value)
    base = full_raster(spec, dataset)[0]
    pad = np.full((grid.height + 2, grid.width + 2), hole, dtype=np.uint8)
    pad[1:-1, 1:-1] = base
    land_idx = fixtures.land_index(spec.seed)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            if fixtures.tile_arrays(spec, dataset, ty, tx,
                                    land_idx) is None:
                x, y, nc, nr = grid.tile_window(ty, tx)
                pad[1 + y:1 + y + nr, 1 + x:1 + x + nc] = hole
    wf = fill_values(pad, hole)
    depth = (wf - pad.astype(np.int64))[1:-1, 1:-1]
    pin = (pad != hole)[1:-1, 1:-1]
    agg: dict[str, list] = {}
    for _fidx, admin, mask in feature_masks(spec, grid):
        d = depth[mask & pin]
        if not len(d):
            continue
        row = [len(d), int(d.sum()), int(d.max()), int((d > 0).sum())]
        cur = agg.get(admin)
        if cur is None:
            agg[admin] = row
        else:
            cur[0] += row[0]
            cur[1] += row[1]
            cur[2] = max(cur[2], row[2])
            cur[3] += row[3]
    admins = sorted(agg)
    cols = (np.array([agg[a] for a in admins], dtype=np.int64)
            if admins else np.zeros((0, 4), dtype=np.int64))
    out = pd.DataFrame({
        "admin": admins, "n_px": cols[:, 0], "sum_depth": cols[:, 1],
        "max_depth": cols[:, 2], "n_filled": cols[:, 3]})
    for c in out.columns:
        if c != "admin":
            out[c] = out[c].astype(np.int64)
    return out.sort_values("admin").reset_index(drop=True)


def fill_strahler_oracle(spec, dataset: str = "kg", threshold: int = 1,
                         hole_value: int | None = None) -> pd.DataFrame:
    """Sequential conditioned-DEM stream network: priority-flood
    fill, then Strahler orders on the FILLED surface (the fill ->
    flowdir -> network chain)."""
    grid = spec.grid(fixtures.DATASET_GRID[dataset])
    nodata = fixtures.DATASET_NODATA[dataset]
    hole = nodata if hole_value is None else int(hole_value)
    base = full_raster(spec, dataset)[0]
    pad = np.full((grid.height + 2, grid.width + 2), hole, dtype=np.uint8)
    pad[1:-1, 1:-1] = base
    present = np.ones((grid.height, grid.width), dtype=bool)
    land_idx = fixtures.land_index(spec.seed)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            if fixtures.tile_arrays(spec, dataset, ty, tx,
                                    land_idx) is None:
                x, y, nc, nr = grid.tile_window(ty, tx)
                pad[1 + y:1 + y + nr, 1 + x:1 + x + nc] = hole
                present[y:y + nr, x:x + nc] = False
    wf = fill_values(pad, hole)
    filled = np.where(pad != hole, wf, np.int64(hole)).astype(np.uint8)
    return strahler_hist(filled, present, int(threshold))
