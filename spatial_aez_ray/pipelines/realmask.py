"""Real-reference-data parity leg: per-country area over the REAL masks.

The reference ships 255 real GDAL-written 1 km feature masks
(``masks/{SOV_A3}_{feature_idx}_1km_mask._tif``, written by
``prepare_feature_masks.py:73-76`` with COMPRESS=ZSTD TILED=YES NBITS=1
SPARSE_OK=TRUE on the global 43200x21600 grid).  Its own independent
correctness oracle is the CIA World Factbook area table with tolerance
bands (``test_extract_country_data.py:15-50`` + the table at 304-562).

This pipeline reproduces that check against OUR from-scratch stack:
filename -> Natural Earth .dbf ADMIN (sources.shapefile, UTF-8) ->
admin_normalize -> ZSTD tile decode (sources.geotiff codec chain) ->
M1 per-row km2 kernel (geo.km2_rows) -> per-country sum -> CIA band.
It is the only correctness axis that involves no synthetic data and no
DuckDB: real rasters, an independent published oracle.

Ray Data shape (scale notes):
- one input row per mask file; a task-pool ``map_batches`` expands each
  file to its non-sparse tiles with zero data I/O (offset-table scan);
- a task-based ``map_batches`` decodes tiles and reduces each to ONE
  partial (admin, ty, tx, km2) row -- the shuffled volume is ~16 B/tile
  regardless of raster size, the same partials-before-shuffle design as
  stages/zonal.py;
- the tiny partial set is combined deterministically in sorted
  (admin, ty, tx) order (numpy pairwise sums), so results are bit-stable
  across runs and executor schedules.
"""
from __future__ import annotations

import glob
import os
import re

import numpy as np
import pandas as pd
import ray.data

from .. import model
from ..admin_normalize import normalize
from ..cia_areas import EXPECTED_AREA_KM2
from ..geo import GridSpec, km2_rows
from ..sources.geotiff import GeoTiffReader
from ..sources.shapefile import read_dbf
from ..datapipe.util import as_task_fn

REFERENCE_MASKS_DIR = "/root/reference/masks"
REFERENCE_DBF = ("/root/reference/data/ne_10m_admin_0_countries/"
                 "ne_10m_admin_0_countries.dbf")

# the masks' global grid (verified identical across all 255 files)
MASK_GRID = GridSpec("mask1km", 43200, 21600, 256)


def mask_inventory(masks_dir: str = REFERENCE_MASKS_DIR,
                   dbf_path: str = REFERENCE_DBF,
                   resolution: str = "1km") -> list[dict]:
    """One item per mask file: path + normalized country name.

    Names follow prepare_feature_masks.py:75: ``{SOV_A3}_{idx}_{res}``
    where idx is the feature's position in the Natural Earth layer; the
    country is that feature's ADMIN attribute run through the reference's
    admin translation (None-mapped admins are dropped, exactly like
    extract_country_data.py:223-225 drops them from the CSVs)."""
    recs = read_dbf(dbf_path, encoding="utf-8")
    pat = re.compile(r"(.+)_(\d+)_" + re.escape(resolution) + r"_mask\._tif$")
    items = []
    for path in sorted(glob.glob(os.path.join(
            masks_dir, f"*_{resolution}_mask._tif"))):
        m = pat.match(os.path.basename(path))
        if not m:
            continue
        idx = int(m.group(2))
        admin = normalize(recs[idx]["ADMIN"])
        if admin is None:
            continue
        items.append({"path": path, "feature_idx": idx, "admin": admin})
    return items


class _IndexTiles:
    """File row -> one row per non-sparse tile (offset-table scan only)."""

    def __call__(self, batch: dict) -> dict:
        paths, admins, tys, txs = [], [], [], []
        for path, admin in zip(batch["path"], batch["admin"]):
            path = str(path)
            r = GeoTiffReader(path)
            try:
                if (r.width, r.height) != (MASK_GRID.width, MASK_GRID.height):
                    raise ValueError(
                        f"{path}: unexpected grid {r.width}x{r.height}")
                tiles = r.nonsparse_tiles()
            finally:
                r.close()
            n = len(tiles)
            paths.extend([path] * n)
            admins.extend([str(admin)] * n)
            tys.extend(tiles[:, 0].tolist())
            txs.extend(tiles[:, 1].tolist())
        return {"path": np.array(paths, dtype=object),
                "admin": np.array(admins, dtype=object),
                "ty": np.array(tys, dtype=np.int32),
                "tx": np.array(txs, dtype=np.int32)}


class _TileArea:
    """Decode each tile and reduce it to one (admin, ty, tx, km2) partial.

    Stateful actor: an open-reader cache (files are revisited across
    batches) and a per-row-band km2 vector cache (tiles in the same tile
    row share it).  Decode runs through the geotiff ZSTD codec chain."""

    _MAX_OPEN = 16

    def __init__(self):
        self._readers: dict[str, GeoTiffReader] = {}
        self._km2: dict[tuple[int, int], np.ndarray] = {}

    def _reader(self, path: str) -> GeoTiffReader:
        r = self._readers.get(path)
        if r is None:
            if len(self._readers) >= self._MAX_OPEN:
                _, old = self._readers.popitem()
                old.close()
            r = GeoTiffReader(path)
            self._readers[path] = r
        return r

    def _km2_rows(self, y_off: int, nrows: int) -> np.ndarray:
        key = (y_off, nrows)
        v = self._km2.get(key)
        if v is None:
            v = km2_rows(nrows, y_off, MASK_GRID)
            self._km2[key] = v
        return v

    def __call__(self, batch: dict) -> dict:
        paths = batch["path"]
        tys = batch["ty"]
        txs = batch["tx"]
        out = np.empty(len(paths), dtype=np.float64)
        for i in range(len(paths)):
            r = self._reader(str(paths[i]))
            ty = int(tys[i])
            arr = r.read_tile(ty, int(txs[i]))
            counts = arr.sum(axis=1, dtype=np.int64).astype(np.float64)
            out[i] = float(counts @ self._km2_rows(ty * MASK_GRID.tile,
                                                   arr.shape[0]))
        return {"admin": batch["admin"], "ty": tys, "tx": txs, "km2": out}


def real_mask_areas(masks_dir: str = REFERENCE_MASKS_DIR,
                    dbf_path: str = REFERENCE_DBF,
                    resolution: str = "1km") -> pd.DataFrame:
    """Per-country km2 over the real masks, with the CIA band verdicts.

    Columns: country, area_km2, expected_km2 (CIA; -1 when the table has
    no entry), ratio, checked (band applies), in_band."""
    items = mask_inventory(masks_dir, dbf_path, resolution)
    if not items:
        raise FileNotFoundError(f"no {resolution} masks under {masks_dir}")
    ds = (ray.data.from_items(items)
          .map_batches(_IndexTiles, batch_size=8, concurrency=(1, 8))
          .map_batches(_TileArea, concurrency=(1, 8), batch_size=256,
                       batch_format="numpy"))
    part = ds.to_pandas()  # ~1 partial row per stored tile: tiny
    # deterministic combine: numpy pairwise sums in sorted partial order
    part = part.sort_values(["admin", "ty", "tx"], kind="mergesort")
    rows = []
    for admin, grp in part.groupby("admin", sort=True):
        area = float(np.sum(grp["km2"].to_numpy()))
        exp = EXPECTED_AREA_KM2.get(admin.upper())
        checked = admin != "Antarctica" and exp is not None \
            and not (exp < 5000 and area < 5000)
        if exp is None:
            ratio, in_band = float("nan"), False
        else:
            ratio = area / exp
            if exp < 35000 and area < 35000:
                in_band = exp * 0.45 < area < exp * 1.20
            else:
                in_band = exp * 0.76 < area < exp * 1.07
        rows.append({"country": admin, "area_km2": area,
                     "expected_km2": float(exp if exp is not None else -1),
                     "ratio": float(ratio), "checked": bool(checked),
                     "in_band": bool(in_band)})
    return pd.DataFrame(rows)


def mask_file_area(path: str) -> float:
    """Direct (sequential) Σ km² over one mask file — the per-tile
    partials in (ty, tx) order, exactly the distributed kernel's
    arithmetic, so the two paths are comparable bit-for-bit."""
    r = GeoTiffReader(path)
    try:
        partials = []
        for ty, tx in r.nonsparse_tiles():
            arr = r.read_tile(int(ty), int(tx))
            counts = arr.sum(axis=1, dtype=np.int64).astype(np.float64)
            partials.append(float(counts @ km2_rows(
                arr.shape[0], int(ty) * MASK_GRID.tile, MASK_GRID)))
    finally:
        r.close()
    return float(np.sum(np.array(partials, dtype=np.float64)))


class _WorldTileArea:
    """Per-doc area partials over an IMPORTED world: one batched
    footer-pruned MediaStore fetch per map_batches call."""

    def __init__(self, world_path: str):
        from ..sources.documents import MediaStore
        self._media = MediaStore(world_path)
        self._km2: dict[tuple[int, int], np.ndarray] = {}

    def __call__(self, batch: dict) -> dict:
        from .. import model
        spans_col = batch["spans"]
        metas = [model.parse_meta(s) for s in spans_col]
        refs = [model.media_refs(s)[0] for s in spans_col]
        payloads = self._media.fetch(refs)
        tys = np.empty(len(refs), np.int32)
        txs = np.empty(len(refs), np.int32)
        out = np.empty(len(refs), np.float64)
        for i, (meta, ref) in enumerate(zip(metas, refs)):
            tile = model.decode_tile(payloads[ref], meta["nrows"],
                                     meta["ncols"])
            counts = tile.sum(axis=1, dtype=np.int64).astype(np.float64)
            y_off = int(meta["y_off"])
            key = (y_off, tile.shape[0])
            km2 = self._km2.get(key)
            if km2 is None:
                km2 = km2_rows(tile.shape[0], y_off, MASK_GRID)
                self._km2[key] = km2
            tys[i] = y_off // MASK_GRID.tile
            txs[i] = int(meta["x_off"]) // MASK_GRID.tile
            out[i] = float(counts @ km2)
        return {"ty": tys, "tx": txs, "km2": out}


def import_real_mask(tiff_path: str, world_path: str,
                     dataset: str = "realmask") -> dict:
    """S1 ingestion of a REAL reference mask: windowed streaming read
    over the sparse ZSTD source into the engine's interleaved
    tile-document world layout (sparse tiles pruned at import)."""
    from ..sources.geotiff import import_geotiff
    return import_geotiff(tiff_path, world_path, dataset,
                          MASK_GRID.name, MASK_GRID.tile,
                          skip_empty_tiles=True)


def imported_mask_area(world_path: str, dataset: str = "realmask") -> float:
    """Σ km² over an imported mask world — the distributed twin of
    ``mask_file_area``: per-tile partials via batched MediaStore
    fetches, combined in sorted (ty, tx) order, bit-identical to the
    direct file walk."""
    from ..sources.documents import read_documents
    part = (read_documents(world_path, [dataset],
                           columns=["doc_id", "spans"])
            .map_batches(as_task_fn(_WorldTileArea,
                                     world_path=world_path),
                         batch_size=64)
            .to_pandas())
    part = part.sort_values(["ty", "tx"], kind="mergesort")
    return float(np.sum(part["km2"].to_numpy()))


REFERENCE_RESULTS_DIR = "/root/reference/results"

#: published thumbnail -> our render product whose palette it must use
#: (process_imagery.py:500-508 converts each classified GeoTIFF with
#: ``gdal_translate -of png -expand rgb -outsize 1% 0`` — nearest
#: resampling of a paletted raster, so EVERY pixel is an exact color
#: from the product's GDAL color table).
REAL_PNG_PRODUCTS = {
    "AEZ_small.png": "render_aez",
    "Slope_small.png": "render_slope",
    "LandUse_small.png": "render_landuse",
    "SoilHealth_small.png": "render_soilhealth",
}


def _png_palette_row(name: str, product: str, results_dir: str) -> dict:
    from ..functions.png import decode_png
    from .render import render_color_table
    with open(os.path.join(results_dir, name), "rb") as f:
        arr, _ = decode_png(f.read())
    if arr.ndim != 3:
        raise ValueError(f"{name}: expected truecolor RGB, got {arr.shape}")
    cols = np.unique(arr.reshape(-1, 3), axis=0)
    pal = {tuple(int(v) for v in c) for c in render_color_table(product)}
    in_pal = sum(1 for c in cols if tuple(int(v) for v in c) in pal)
    return {"png": name, "product": product,
            "width": int(arr.shape[1]), "height": int(arr.shape[0]),
            "distinct_colors": int(len(cols)),
            "colors_in_palette": int(in_pal)}


def real_png_palette(results_dir: str = REFERENCE_RESULTS_DIR
                     ) -> pd.DataFrame:
    """Decode the reference's PUBLISHED result thumbnails with our
    from-scratch PNG codec and check every pixel color against our
    mirror of its GDAL color table (M15 parity on real output data).

    This is the check that caught render_color_table's round-vs-
    truncate ramp bug: GDAL CreateColorRamp interpolates with
    truncating integer division, and only that form covers all 222
    colors in the published AEZ thumbnail."""
    items = [{"png": k, "product": v} for k, v in
             sorted(REAL_PNG_PRODUCTS.items())]

    def one(batch: dict) -> pd.DataFrame:
        rows = [_png_palette_row(str(n), str(p), results_dir)
                for n, p in zip(batch["png"], batch["product"])]
        return pd.DataFrame(rows)

    df = (ray.data.from_items(items)
          .map_batches(one, batch_size=1, batch_format="numpy")
          .to_pandas())
    return df.sort_values("png", kind="mergesort").reset_index(drop=True)


def check_real_png_palette(df: pd.DataFrame) -> pd.DataFrame:
    """Every published thumbnail: all colors in OUR palette, the
    reference's 1%-of-129600x64800 frame, and a non-trivial legend."""
    if len(df) != len(REAL_PNG_PRODUCTS):
        raise AssertionError(f"expected {len(REAL_PNG_PRODUCTS)} PNGs:\n"
                             + df.to_string(index=False))
    bad = df[(df["distinct_colors"] != df["colors_in_palette"])
             | (df["width"] != 1296) | (df["height"] != 648)
             | (df["distinct_colors"] < 3)]
    if len(bad):
        raise AssertionError("published PNGs off-palette or off-frame:\n"
                             + bad.to_string(index=False))
    return df


def check_real_mask_areas(df: pd.DataFrame) -> pd.DataFrame:
    """Assert the reference's tolerance rule over every checked country
    (test_extract_country_data.py:15-50); returns df unchanged."""
    checked = df[df["checked"]]
    if len(checked) < 100:
        raise AssertionError(
            f"only {len(checked)} countries under the CIA band check")
    bad = checked[~checked["in_band"]]
    if len(bad):
        raise AssertionError(
            "real-mask areas outside the CIA tolerance bands:\n"
            + bad.to_string(index=False))
    missing = df[df["expected_km2"] < 0]
    if len(missing):
        raise AssertionError(
            "countries with no CIA table entry:\n" + missing.to_string())
    return df


def mask_overlap_px(world_path: str, dataset_a: str,
                    dataset_b: str) -> int:
    """Overlap pixels between two imported binary masks — the
    reference's DOUBLE-CLAIM border semantics measured directly
    (prepare_feature_masks rasterizes each country independently, so
    neighbors both claim their shared border pixels; J1 parity).

    Shuffle-free: tile keys from the union lattice, BOTH refs derived
    per key, one batched fetch, vectorized AND-count; absent tiles are
    empty masks. One int per block crosses the wire."""
    import ray

    from ..datapipe.util import as_task_fn
    from ..pipelines.extract import world_grid
    from ..sources.documents import MediaStore

    grid = world_grid(world_path, MASK_GRID.name)

    class Overlap:
        def __init__(self):
            self.media = MediaStore(world_path)

        def __call__(self, b):
            import pyarrow as _pa
            ids = b["id"].to_numpy(zero_copy_only=False)
            refs = {}
            for pid in ids:
                ty, tx = int(pid) // grid.tiles_x, int(pid) % grid.tiles_x
                refs[(ty, tx)] = (
                    model.media_ref(dataset_a, grid.name, ty, tx, 1),
                    model.media_ref(dataset_b, grid.name, ty, tx, 1))
            flat = [r for pair in refs.values() for r in pair]
            payloads = self.media.fetch(flat, strict=False)
            n = 0
            for (ty, tx), (ra, rb) in refs.items():
                pa_, pb_ = payloads.get(ra), payloads.get(rb)
                if pa_ is None or pb_ is None:
                    continue
                a = np.frombuffer(pa_, np.uint8)
                bb = np.frombuffer(pb_, np.uint8)
                n += int((a & bb).sum())
            return _pa.table({"n": _pa.array([n])})

    out = (ray.data.range(grid.tiles_y * grid.tiles_x)
           .map_batches(as_task_fn(Overlap), batch_format="pyarrow",
                        batch_size=64)
           .to_pandas())
    return int(out["n"].sum())


def mask_file_overlap_px(path_a: str, path_b: str) -> int:
    """Direct two-file walk of the same overlap count (the
    independent oracle: intersect the nonsparse tile sets, AND the
    decoded tiles)."""
    ra, rb = GeoTiffReader(path_a), GeoTiffReader(path_b)
    try:
        tiles_a = {(int(ty), int(tx)) for ty, tx in ra.nonsparse_tiles()}
        tiles_b = {(int(ty), int(tx)) for ty, tx in rb.nonsparse_tiles()}
        n = 0
        for ty, tx in sorted(tiles_a & tiles_b):
            n += int((ra.read_tile(ty, tx) & rb.read_tile(ty, tx)).sum())
    finally:
        ra.close()
        rb.close()
    return n


def mask_file_pad_present(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Bbox-bounded (+1-padded array, present mask) assembly of one
    REAL mask file's non-sparse tiles — the shared input of the
    sequential hydrology oracles.  Pixels outside present tiles are
    holes (mask nodata 0, matching the imported world), and the bbox
    cut is exact: the distributed kernels drop flow into absent tiles
    and off the global frame, which the sub-array oracle reproduces
    as off-sub-frame / non-present targets."""
    t = MASK_GRID.tile
    r = GeoTiffReader(path)
    try:
        present_t = sorted((int(a), int(b)) for a, b in r.nonsparse_tiles())
        tys = [p[0] for p in present_t]
        txs = [p[1] for p in present_t]
        ty0, ty1 = min(tys), max(tys)
        tx0, tx1 = min(txs), max(txs)
        hgt = (ty1 - ty0 + 1) * t
        wid = (tx1 - tx0 + 1) * t
        pad = np.zeros((hgt + 2, wid + 2), np.uint8)
        present = np.zeros((hgt, wid), dtype=bool)
        for ty, tx in present_t:
            arr = r.read_tile(ty, tx)
            y, x = (ty - ty0) * t, (tx - tx0) * t
            pad[1 + y:1 + y + arr.shape[0],
                1 + x:1 + x + arr.shape[1]] = arr
            present[y:y + arr.shape[0], x:x + arr.shape[1]] = True
    finally:
        r.close()
    return pad, present


def mask_file_flow_accum(path: str) -> "pd.DataFrame":
    """Direct sequential D8 flow-accumulation histogram over one REAL
    mask file (see ``mask_file_pad_present``)."""
    from ..oracle import flow_accum_hist
    return flow_accum_hist(*mask_file_pad_present(path))


def mask_file_watershed(path: str) -> "pd.DataFrame":
    """Direct sequential D8 watershed summary over one REAL mask file
    (see ``mask_file_pad_present``)."""
    from ..oracle import watershed_hist
    return watershed_hist(*mask_file_pad_present(path))


def mask_file_window_hist(path: str, metric: str) -> "pd.DataFrame":
    """Direct sequential (code, n_px) histogram of a 3×3 window metric
    over one REAL mask file: decode the nonsparse tiles into a
    bbox-bounded array (everything else is the mask nodata 0, matching
    the imported world's hole value), run the metric once, count only
    present-tile pixels — the whole-array oracle for the focal kernels
    on real raster layout (edge-clamped tiles, sparse holes)."""
    import pandas as pd

    from .pyramid import WINDOW_FNS
    window_fn, nbins = WINDOW_FNS[metric]
    t = MASK_GRID.tile
    r = GeoTiffReader(path)
    try:
        present = sorted((int(a), int(b)) for a, b in r.nonsparse_tiles())
        tys = [p[0] for p in present]
        txs = [p[1] for p in present]
        ty0, ty1 = min(tys), max(tys)
        tx0, tx1 = min(txs), max(txs)
        sub = np.zeros(((ty1 - ty0 + 1) * t + 2,
                        (tx1 - tx0 + 1) * t + 2), np.uint8)
        dims = {}
        for ty, tx in present:
            arr = r.read_tile(ty, tx)
            y, x = (ty - ty0) * t + 1, (tx - tx0) * t + 1
            sub[y:y + arr.shape[0], x:x + arr.shape[1]] = arr
            dims[(ty, tx)] = arr.shape
    finally:
        r.close()
    codes = window_fn(sub)   # aligned to sub minus the 1-px border
    hist = np.zeros(nbins, dtype=np.int64)
    for (ty, tx), (nr, nc) in dims.items():
        y, x = (ty - ty0) * t, (tx - tx0) * t
        hist += np.bincount(codes[y:y + nr, x:x + nc].ravel(),
                            minlength=nbins)
    nz = np.flatnonzero(hist)
    colname = {"tri": "tri", "tpi": "tpi",
               "roughness": "roughness"}[metric]
    return pd.DataFrame({colname: nz.astype(np.int64),
                         "n_px": hist[nz].astype(np.int64)})


def mask_file_visibility(path: str, radius: int = 4) -> "pd.DataFrame":
    """Direct sequential (n_vis, n_px) visibility-index histogram over
    one REAL mask file: decode the nonsparse tiles into a bbox-bounded
    array with an R-px zero border (mask nodata 0 = impassable, so
    everything outside the bbox is correctly invisible terrain), run
    ``viewshed.visible_counts`` once, count only present-tile passable
    pixels — the whole-array oracle for the LOS kernel on real raster
    layout (archipelago sparse holes, edge-clamped tiles)."""
    import pandas as pd

    from .viewshed import visible_counts

    h = int(radius)
    t = MASK_GRID.tile
    r = GeoTiffReader(path)
    try:
        present = sorted((int(a), int(b)) for a, b in r.nonsparse_tiles())
        tys = [p[0] for p in present]
        txs = [p[1] for p in present]
        ty0, ty1 = min(tys), max(tys)
        tx0, tx1 = min(txs), max(txs)
        sub = np.zeros(((ty1 - ty0 + 1) * t + 2 * h,
                        (tx1 - tx0 + 1) * t + 2 * h), np.uint8)
        dims = {}
        for ty, tx in present:
            arr = r.read_tile(ty, tx)
            y, x = (ty - ty0) * t + h, (tx - tx0) * t + h
            sub[y:y + arr.shape[0], x:x + arr.shape[1]] = arr
            dims[(ty, tx)] = arr.shape
    finally:
        r.close()
    cnt = visible_counts(sub, h, 0)
    mask = sub[h:-h, h:-h] if h else sub
    hist: dict[int, int] = {}
    for (ty, tx), (nr, nc) in dims.items():
        y, x = (ty - ty0) * t, (tx - tx0) * t
        c = cnt[y:y + nr, x:x + nc]
        m = mask[y:y + nr, x:x + nc] != 0
        u, n = np.unique(c[m], return_counts=True)
        for v, k in zip(u.tolist(), n.tolist()):
            hist[v] = hist.get(v, 0) + k
    keys = sorted(hist)
    return pd.DataFrame({"n_vis": np.asarray(keys, np.int64),
                         "n_px": np.asarray([hist[k] for k in keys],
                                            np.int64)})


def mask_file_bilinear(path: str, k: int = 2) -> "pd.DataFrame":
    """Direct sequential bilinear k×-upsample histogram over one REAL
    mask file: nonsparse tiles decoded into a bbox-bounded array with
    a 1-px zero border (mask nodata 0 — the world frame is far from
    any mask bbox, so no edge clamp applies), the integer stencil of
    ``warp.upsample_bilinear`` run once, and only present-tile output
    pixels counted. On a 0/1 mask the result is the interior-vs-
    boundary-band decomposition: value 1 inside, −1 where any stencil
    touches the outside — the seam-correctness signal."""
    import pandas as pd

    t = MASK_GRID.tile
    kk = int(k)
    r = GeoTiffReader(path)
    try:
        present = sorted((int(a), int(b)) for a, b in r.nonsparse_tiles())
        tys = [p[0] for p in present]
        txs = [p[1] for p in present]
        ty0, ty1 = min(tys), max(tys)
        tx0, tx1 = min(txs), max(txs)
        sub = np.zeros(((ty1 - ty0 + 1) * t + 2,
                        (tx1 - tx0 + 1) * t + 2), np.uint8)
        dims = {}
        for ty, tx in present:
            arr = r.read_tile(ty, tx)
            y, x = (ty - ty0) * t + 1, (tx - tx0) * t + 1
            sub[y:y + arr.shape[0], x:x + arr.shape[1]] = arr
            dims[(ty, tx)] = arr.shape
    finally:
        r.close()
    V = sub.astype(np.int64)
    P = sub != 0
    H = sub.shape[0] - 2
    W = sub.shape[1] - 2
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
    hist: dict[int, int] = {}
    for (ty, tx), (nr, nc) in dims.items():
        y, x = (ty - ty0) * t, (tx - tx0) * t
        v = vals[y * kk:(y + nr) * kk, x * kk:(x + nc) * kk]
        u, n = np.unique(v, return_counts=True)
        for vv, nn in zip(u.tolist(), n.tolist()):
            hist[vv] = hist.get(vv, 0) + nn
    keys = sorted(hist)
    return pd.DataFrame({"value": np.asarray(keys, np.int64),
                         "n_px": np.asarray([hist[kx] for kx in keys],
                                            np.int64)})


def mask_file_morphology(path: str, k: int = 2) -> "pd.DataFrame":
    """Direct sequential morphology census (target class 1) over one
    REAL mask file (see ``mask_file_pad_present``)."""
    from ..oracle import morphology_census
    pad, present = mask_file_pad_present(path)
    return morphology_census(pad[1:-1, 1:-1], present, 0, 1, k)


