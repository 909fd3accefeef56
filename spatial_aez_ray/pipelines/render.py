"""Classified raster output tiles (process_imagery.py produce_GeoTIFF).

Whole-globe pass on the 300 m-analog grid: the same co-keyed tile
group join as the AEZ CSV pipeline, but with no masks/countries
(process_imagery.py:398-404) — each G3 tile group renders four palette
rasters (AEZ codes = TMR base + zone index, slope plurality one-hot,
land-use codes, soil-health codes; :461-492) and emits them as NEW
interleaved tile documents (dataset ``render_aez`` etc.) plus their
media payloads — the tile-assignment shuffle expressed as
group-by-tile + per-group assembly (SURVEY.md S6).

Output layout mirrors a world directory, so rendered tiles are
readable by ``sources.documents`` again (raster↔vector round trip).
Each map task writes its own part files atomically (tmp + rename) —
the resumable per-partition layout.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .. import model
from ..constants import (
    AEZ_BLANK, LAND_USE_BLANK, LAND_USE_NAMES, SLOPE_BLANK, SOIL_BLANK,
    SOIL_HEALTH_NAMES, SOIL_RENDER_CODE, TMR_BASE_COLOR, TMR_NAMES,
)
from ..geo import upsample3
from ..sources.documents import MediaStore, read_documents
from .aez import (
    AEZ_DATASETS, populate_land_use, populate_slope,
    populate_soil_health, populate_tmr, yield_aezs,
)
from .extract import world_grid

RENDER_PRODUCTS = ("render_aez", "render_slope", "render_landuse",
                   "render_soilhealth")

COMBINED_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(model.SPAN_TYPE)),
    ("media_ref", pa.string()),
    ("payload", pa.binary()),
])


def render_arrays(kg_blk, sl_bands, lc_blk, wk_blk) -> dict[str, np.ndarray]:
    """One G3 block -> the four palette arrays (process_imagery.py:426-492).
    Inputs are already upsampled to the G3 window."""
    regime = populate_tmr(kg_blk)
    slope = populate_slope(sl_bands)
    plurality = {
        "steep": (slope["steep"] >= slope["moderate"]) &
                 (slope["steep"] >= slope["minimal"]),
        "moderate": (slope["moderate"] > slope["steep"]) &
                    (slope["moderate"] >= slope["minimal"]),
        "minimal": (slope["minimal"] > slope["steep"]) &
                   (slope["minimal"] >= slope["moderate"]),
    }
    land_use = populate_land_use(lc_blk)
    soil = populate_soil_health(wk_blk)
    shape = lc_blk.shape

    aez_arr = np.full(shape, AEZ_BLANK, dtype=np.int64)
    for tmr in TMR_NAMES:
        color = TMR_BASE_COLOR[tmr]
        if not regime[tmr].any():
            continue  # all 29 products are zero -> assignments no-op
        for aez in yield_aezs(regime, tmr, plurality, land_use, soil):
            aez_arr[aez.astype(bool)] = color
            color += 1

    slope_arr = np.full(shape, SLOPE_BLANK, dtype=np.int64)
    slope_arr[plurality["minimal"].astype(bool)] = 0
    slope_arr[plurality["moderate"].astype(bool)] = 1
    slope_arr[plurality["steep"].astype(bool)] = 2

    lu_arr = np.full(shape, LAND_USE_BLANK, dtype=np.int64)
    for i, name in enumerate(LAND_USE_NAMES):
        lu_arr[land_use[name]] = i

    sh_arr = np.full(shape, SOIL_BLANK, dtype=np.int64)
    for name in SOIL_HEALTH_NAMES:
        sh_arr[soil[name]] = SOIL_RENDER_CODE[name]

    return {"render_aez": aez_arr.astype(np.uint8),
            "render_slope": slope_arr.astype(np.uint8),
            "render_landuse": lu_arr.astype(np.uint8),
            "render_soilhealth": sh_arr.astype(np.uint8)}


class RenderTileKernel:
    """Batched map_batches callable: driver ("kg") tile docs -> 4
    rendered tile documents per tile; sibling refs derived from the
    tile key, one batched MediaStore fetch per map_batches batch."""

    def __init__(self, world_path: str, g1, g3):
        self.media = MediaStore(world_path)
        self.g1 = g1
        self.g3 = g3
        self.layout = model.world_layout(world_path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = []
        refs_by_tile = []
        all_refs: list[str] = []
        for spans in batch.column("spans").to_pylist():
            meta = None
            for s in spans:
                if s["kind"] == "meta":
                    meta = json.loads(s["text"])
                    break
            refs_by_ds = model.sibling_refs(
                self.layout, AEZ_DATASETS, meta["tile_y"], meta["tile_x"])
            metas.append(meta)
            refs_by_tile.append(refs_by_ds)
            for rs in refs_by_ds.values():
                all_refs.extend(rs)
        payloads = self.media.fetch(all_refs, strict=False)

        rows = []
        for meta, refs_by_ds in zip(metas, refs_by_tile):
            ty, tx = meta["tile_y"], meta["tile_x"]
            x1, y1, nc1, nr1 = self.g1.tile_window(ty, tx)
            x3, y3, nc3, nr3 = self.g3.tile_window(ty, tx)

            def band(ds_name, i, nodata, g1_shape=True):
                refs = refs_by_ds.get(ds_name)
                shape = (nr1, nc1) if g1_shape else (nr3, nc3)
                if not refs or refs[i] not in payloads:
                    return np.full(shape, nodata, dtype=np.uint8)
                return np.frombuffer(payloads[refs[i]],
                                     dtype=np.uint8).reshape(shape)

            kg_blk = upsample3(band("kg", 0, 0))
            sl_bands = [upsample3(band("slope", i, 127)) for i in range(8)]
            lc_blk = band("lc", 0, 210, g1_shape=False)
            wk_blk = upsample3(band("wk", 0, 0))
            arrays = render_arrays(kg_blk, sl_bands, lc_blk, wk_blk)

            for product, arr in arrays.items():
                doc = model.make_document(product, "g3", ty, tx, x3, y3,
                                          nc3, nr3, bands=1, nodata=255)
                ref = model.media_ref(product, "g3", ty, tx, 1)
                rows.append({"doc_id": doc["doc_id"], "spans": doc["spans"],
                             "media_ref": ref,
                             "payload": model.encode_tile(arr)})
        return pa.Table.from_pylist(rows, schema=COMBINED_SCHEMA)


def render_tiles_ds(world_path: str, *, concurrency: int | tuple = (1, 4)):
    g1 = world_grid(world_path, "g1")
    g3 = world_grid(world_path, "g3")
    from ..sources.documents import blocks_for
    docs = read_documents(world_path, ["kg"], columns=["doc_id", "spans"],
                          override_num_blocks=blocks_for(concurrency))
    from ..datapipe.util import as_task_fn
    return docs.map_batches(
        as_task_fn(RenderTileKernel, world_path=world_path, g1=g1, g3=g3),
        batch_format="pyarrow", batch_size=8)


class _RenderWriter:
    """Per-batch atomic writer: documents/ + media/ part files keyed by
    the batch's tile range (resumable output layout)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"part": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        by_ds: dict[str, list[int]] = {}
        ids = batch.column("doc_id").to_pylist()
        for i, d in enumerate(ids):
            by_ds.setdefault(d.split("/", 1)[0], []).append(i)
        parts = []
        for ds_name, idxs in by_ds.items():
            sub = batch.take(pa.array(idxs))
            tag = sub.column("doc_id")[0].as_py().replace("/", "_")
            for kind, cols in (("documents", ["doc_id", "spans"]),
                               ("media", ["media_ref", "payload"])):
                d = os.path.join(self.out_dir, kind, f"dataset={ds_name}")
                os.makedirs(d, exist_ok=True)
                final = os.path.join(d, f"part-{tag}.parquet")
                tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
                pq.write_table(sub.select(cols), tmp)
                os.replace(tmp, final)
            parts.append(f"{ds_name}:{tag}")
        return pa.table({"part": pa.array(parts, pa.string()),
                         "rows": pa.array([len(ids)] * len(parts), pa.int64())})


def render_color_table(product: str) -> np.ndarray:
    """(256, 3) uint8 palette for a render product, mirroring the
    reference's GDAL color tables (process_imagery.py:300-395): AEZ
    gets a 30-entry linear ramp per TMR base code, the other products
    fixed entries; every blank code is black.

    Ramp interpolation is GDAL ``ColorTable.CreateColorRamp``'s
    TRUNCATING integer form ``lo + (i * (hi - lo)) // span`` — NOT
    round(): every one of the 222 distinct colors in the published
    results/AEZ_small.png is exactly this table (the rounded form
    mismatches 107 of them)."""
    cm = np.zeros((256, 3), dtype=np.uint8)
    if product == "render_aez":
        ramps = {  # base code -> (start RGB, end RGB), :311-321
            "tropical-humid": ((0, 192, 0), (0, 255, 0)),
            "arid": ((128, 128, 0), (255, 255, 0)),
            "tropical-semiarid": ((0, 0, 128), (0, 0, 255)),
            "temperate-humid": ((128, 0, 0), (255, 0, 0)),
            "temperate-semiarid": ((128, 0, 128), (255, 0, 255)),
            "boreal-humid": ((0, 64, 0), (0, 128, 0)),
            "boreal-semiarid": ((0, 128, 128), (0, 255, 255)),
            "arctic": ((64, 64, 64), (192, 192, 192)),
        }
        for tmr, (lo, hi) in ramps.items():
            base = TMR_BASE_COLOR[tmr]
            for i in range(30):
                cm[base + i] = [a + (i * (b - a)) // 29
                                for a, b in zip(lo, hi)]
    elif product == "render_slope":
        cm[0], cm[1], cm[2] = (32, 64, 32), (32, 64, 96), (32, 64, 240)
    elif product == "render_landuse":
        for i, rgb in enumerate([(49, 113, 35), (245, 237, 7),
                                 (227, 175, 18), (99, 222, 123),
                                 (80, 80, 80), (198, 198, 218),
                                 (128, 128, 240), (240, 240, 248)]):
            cm[i] = rgb
    elif product == "render_soilhealth":
        for code, rgb in [(0, (49, 113, 35)), (1, (212, 145, 0)),
                          (2, (173, 13, 2)), (4, (80, 80, 80)),
                          (5, (128, 128, 240))]:
            cm[code] = rgb
    else:
        raise ValueError(f"unknown render product {product!r}")
    return cm


#: reference GDAL creation options per product
#: (process_imagery.py:306,332,353,379: COMPRESS=DEFLATE TILED=YES,
#: plus NBITS=2 slope / 4 land-use / 3 soil-health; AEZ full byte).
#: Fill for uncovered pixels = the product's blank code.
RENDER_EXPORT_OPTS = {
    "render_aez": {"nbits": 8, "fill": AEZ_BLANK},
    "render_slope": {"nbits": 2, "fill": SLOPE_BLANK},
    "render_landuse": {"nbits": 4, "fill": LAND_USE_BLANK},
    "render_soilhealth": {"nbits": 3, "fill": SOIL_BLANK},
}


def export_render_geotiff(render_world: str, product: str, tiff_path: str,
                          grid, *, compress: str | None = "deflate",
                          tiled: bool = True, tile_size: int = 256) -> dict:
    """Assemble one render product's tiles into a palette GeoTIFF with
    the reference's color table + geotransform + creation options (the
    S6 classified-raster sink, process_imagery.py:300-395: DEFLATE
    compression, TILED layout, sub-byte NBITS for the small-vocabulary
    products).

    Streaming sink: tile docs are reduced to (y_off, x_off, ref) rows,
    sorted row-major, and consumed band by band — the writer holds one
    tile_size-row band buffer plus the offset tables, so driver memory
    is independent of world height (a planet-scale mosaic streams; the
    old form materialized the full array). A single-file GeoTIFF is
    inherently a one-writer sink; sharded alternatives are the COG /
    S2-partitioned exports."""
    from ..sources.geotiff import GeoTiffStreamWriter

    opts = RENDER_EXPORT_OPTS[product]

    def _locate(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for spans in batch["spans"]:
            meta = model.parse_meta(spans)
            rows.append((meta["y_off"], meta["x_off"], meta["nrows"],
                         meta["ncols"], model.media_refs(spans)[0]))
        return pd.DataFrame(rows, columns=["y_off", "x_off", "nrows",
                                           "ncols", "ref"])

    ds = (read_documents(render_world, [product])
          .map_batches(_locate, batch_format="pandas")
          .sort(["y_off", "x_off"]))

    media = MediaStore(render_world)
    writer = GeoTiffStreamWriter(
        tiff_path, grid.width, grid.height,
        tile_size=tile_size if tiled else 256, nbits=opts["nbits"],
        compress=compress, fill=opts["fill"],
        color_map=render_color_table(product),
        pixel_scale=(grid.x_size, -grid.y_size, 0.0),
        tiepoint=(0, 0, 0, grid.x_min, grid.y_min, 0.0))
    ts = writer.tile_size
    # band buffers keyed by TIFF tile row; rows arrive y_off-sorted, so a
    # band is complete (and flushed) once y_off passes its last row
    bands: dict[int, np.ndarray] = {}
    ntiles = 0

    def _flush_below(y: int) -> None:
        for ty in sorted(bands):
            if ty * ts + ts <= y:
                writer.write_band(ty, bands.pop(ty))

    for batch in ds.iter_batches(batch_size=1024, batch_format="pandas"):
        refs = batch["ref"].tolist()
        payloads = media.fetch(refs)
        for y0, x0, nr, nc, ref in zip(batch["y_off"], batch["x_off"],
                                       batch["nrows"], batch["ncols"], refs):
            y0, x0, nr, nc = int(y0), int(x0), int(nr), int(nc)
            _flush_below(y0)
            tile = model.decode_tile(payloads[ref], nr, nc)
            ntiles += 1
            for ty in range(y0 // ts, (y0 + nr - 1) // ts + 1):
                band = bands.get(ty)
                if band is None:
                    h = min(ts, grid.height - ty * ts)
                    band = np.full((h, grid.width), opts["fill"], np.uint8)
                    bands[ty] = band
                b0 = ty * ts
                s = slice(max(y0, b0) - b0, min(y0 + nr, b0 + band.shape[0]) - b0)
                t = slice(max(y0, b0) - y0, min(y0 + nr, b0 + band.shape[0]) - y0)
                band[s, x0:x0 + nc] = tile[t]
    _flush_below(grid.height)
    writer.close()
    return {"shape": (grid.height, grid.width), "tiles": ntiles,
            "path": tiff_path}


def produce_render_tiles(world_path: str, out_dir: str, *,
                         concurrency: int | tuple = (1, 4)) -> pd.DataFrame:
    """Run the render pass and persist a world-shaped output directory."""
    ds = render_tiles_ds(world_path, concurrency=concurrency)
    from ..datapipe.util import as_task_fn
    res = ds.map_batches(as_task_fn(_RenderWriter, out_dir=out_dir),
                         batch_format="pyarrow").to_pandas()
    with open(os.path.join(out_dir, "_WORLD.json"), "w") as f:
        import json as _json
        with open(os.path.join(world_path, "_WORLD.json")) as src:
            meta = _json.load(src)
        meta["datasets"] = list(RENDER_PRODUCTS)
        _json.dump(meta, f)
    return res
