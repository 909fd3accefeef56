"""Cell→country assignment pipeline (the join-output-rows surface).

Produces the engine's analog of the reference's rasterized feature
masks (prepare_feature_masks.py:9-63) as a table:
(cell_id, cell_row, cell_col, feature_idx, admin) — one row per
(pixel, claiming feature), overlap double-claims included (J1), plus
optional kNN snap (ST5/J5): raster-land pixels (value != nodata)
covered by no feature snap to the nearest polygon boundary within a
tolerance; pixels inside dropped (admin=None) features are NOT
snapped — they are excluded land, not coastline.

``cell_id`` is the Morton cell id of the pixel center (cells.py), the
partition-friendly spatial key; (cell_row, cell_col) is the exact
integer grid id used for alignment (two id systems, one source of
truth — SURVEY.md §7.4).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from .. import cells, model
from ..geo import GridSpec
from ..sources.documents import MediaStore, read_documents
from ..state.pipindex import PolygonIndex
from .extract import load_countries, world_grid

ASSIGN_SCHEMA = pa.schema([
    ("cell_id", pa.int64()),
    ("cell_row", pa.int32()),
    ("cell_col", pa.int32()),
    ("feature_idx", pa.int32()),
    ("admin", pa.string()),
])


def build_dropped_index(world_path: str) -> PolygonIndex | None:
    """Index over admin=None features (exclusion side for snapping)."""
    df = load_countries(world_path)
    feats = [(int(r.feature_idx), r.admin_raw, r.geometry)
             for r in df.itertuples() if r.admin is None]
    return PolygonIndex(feats) if feats else None


class CellAssign:
    """map_batches actor: tile documents -> assignment rows."""

    def __init__(self, world_path: str, index: PolygonIndex,
                 dropped: PolygonIndex | None, grid_spec: GridSpec,
                 snap_tol: float, nodata: int, cell_level: int = 16):
        self.media = MediaStore(world_path)
        self.index = index
        self.dropped = dropped
        self.grid = grid_spec
        self.snap_tol = snap_tol
        self.nodata = nodata
        self.cell_level = cell_level

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_rows, out_cols, out_fidx, out_admin = [], [], [], []
        for spans in batch.column("spans").to_pylist():
            meta, refs = None, []
            for s in spans:
                if s["kind"] == "meta":
                    meta = json.loads(s["text"])
                elif s["kind"] == "media":
                    refs.append(s["media_ref"])
            ty, tx = meta["tile_y"], meta["tile_x"]
            x_off, y_off = meta["x_off"], meta["y_off"]
            nrows, ncols = meta["nrows"], meta["ncols"]
            claims = self.index.assign_tile(self.grid, ty, tx)
            claimed = np.zeros((nrows, ncols), dtype=bool)
            for fidx, admin, mask in claims:
                r, c = np.nonzero(mask)
                out_rows.append(r + y_off); out_cols.append(c + x_off)
                out_fidx.append(np.full(len(r), fidx, dtype=np.int64))
                out_admin.extend([admin] * len(r))
                claimed |= mask
            if self.snap_tol > 0:
                payload = self.media.fetch(refs[:1])[refs[0]]
                vals = np.frombuffer(payload, dtype=np.uint8).reshape(nrows, ncols)
                land = vals != self.nodata
                todo = land & ~claimed
                if todo.any():
                    r, c = np.nonzero(todo)
                    lons = self.grid.lons(x_off, ncols)[c]
                    lats = self.grid.lats(y_off, nrows)[r]
                    keep = np.ones(len(r), dtype=bool)
                    if self.dropped is not None:
                        for pos in range(len(self.dropped.features)):
                            if not keep.any():
                                break
                            keep &= ~self.dropped.covers_points(pos, lons, lats)
                    if keep.any():
                        pos = self.index.snap(lons[keep], lats[keep], self.snap_tol)
                        ok = pos >= 0
                        rr, cc = r[keep][ok], c[keep][ok]
                        out_rows.append(rr + y_off); out_cols.append(cc + x_off)
                        out_fidx.append(np.array(
                            [self.index.feature_idx_of(p) for p in pos[ok]],
                            dtype=np.int64))
                        out_admin.extend(self.index.admin_of(p) for p in pos[ok])
        if not out_rows:
            return ASSIGN_SCHEMA.empty_table()
        rows = np.concatenate(out_rows)
        cols = np.concatenate(out_cols)
        fidx = np.concatenate(out_fidx)
        lons = self.grid.x_min + (cols + 0.5) * self.grid.x_size
        lats = self.grid.y_min + (rows + 0.5) * self.grid.y_size
        cid = cells.encode_lonlat(lons, lats, self.cell_level)
        return pa.Table.from_arrays([
            pa.array(cid, pa.int64()),
            pa.array(rows.astype(np.int32)), pa.array(cols.astype(np.int32)),
            pa.array(fidx.astype(np.int32)), pa.array(out_admin, pa.string()),
        ], schema=ASSIGN_SCHEMA)


def cell_country(world_path: str, *, dataset: str = "kg", snap_tol: float = 0.0,
                 index: PolygonIndex | None = None,
                 concurrency: int | tuple = (1, 4), batch_size: int = 16):
    """Lazy Dataset of assignment rows over one dataset's tiles."""
    from .extract import build_zonal_index
    from .. import model as _model

    layout = _model.world_layout(world_path)
    if index is None:
        index = build_zonal_index(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    from ..sources.documents import blocks_for
    docs = read_documents(world_path, [dataset], columns=["doc_id", "spans"],
                          override_num_blocks=blocks_for(concurrency))
    from ..datapipe.util import as_task_fn
    return docs.map_batches(
        as_task_fn(CellAssign, world_path=world_path, index=index,
                   dropped=build_dropped_index(world_path),
                   grid_spec=grid, snap_tol=snap_tol,
                   nodata=layout[dataset]["nodata"]),
        batch_format="pyarrow", batch_size=batch_size)


def write_cells_s2_partitioned(world_path: str, out_dir: str, *,
                               level: int = 4,
                               dataset: str = "kg") -> "pd.DataFrame":
    """Write the cell→country assignment table as parquet partitioned
    by the cell's level-``level`` S2 prefix token — the explicit
    cell-prefix range partitioning of the north rule in S2 terms: one
    directory per coarse cell, so (a) a spatial range query touches
    only the prefixes intersecting its region, and (b) a failed run
    resumes by skipping complete prefix directories (same atomic-dir
    contract as ``docops``/render part files).

    Returns the per-prefix manifest (s2_prefix, n_cells) read back
    from the written files.
    """
    import pandas as pd
    import pyarrow as pa

    from .. import s2cells
    from .extract import world_grid

    grid = world_grid(world_path, "g1")

    def add_prefix(b: pa.Table) -> pa.Table:
        rows = np.asarray(b["cell_row"].to_numpy(zero_copy_only=False))
        cols = np.asarray(b["cell_col"].to_numpy(zero_copy_only=False))
        lons = grid.x_min + (cols + 0.5) * grid.x_size
        lats = grid.y_min + (rows + 0.5) * grid.y_size
        coarse = s2cells.cell_id(lons, lats, level)
        return b.append_column(
            "s2_prefix", pa.array(s2cells.token(coarse), pa.string()))

    ds = (cell_country(world_path, dataset=dataset)
          .map_batches(add_prefix, batch_format="pyarrow"))
    ds.write_parquet(out_dir, partition_cols=["s2_prefix"])

    import ray.data as rd
    back = rd.read_parquet(out_dir).to_pandas()
    man = (back.groupby("s2_prefix", as_index=False)
               .size().rename(columns={"size": "n_cells"}))
    man["n_cells"] = man["n_cells"].astype(np.int64)
    return man.sort_values("s2_prefix").reset_index(drop=True)


# ---------------------------------------------------------------------------
# spatial radius query over the S2-prefix-partitioned cell sink
# ---------------------------------------------------------------------------

def _covering_tokens(lon: float, lat: float, radius_km: float,
                     level: int) -> list[str]:
    """Coarse-cell covering of the query disc: sample the lat/lon
    bbox at 0.5° spacing (far below any level<=6 cell edge, so no
    intersecting cell can be missed) and collect the distinct tokens.
    A few extra tokens only cost a directory listing each — the
    covering must err large, never small."""
    from .. import s2cells
    from ..geo import EARTH_RADIUS_KM

    dlat = np.degrees(radius_km / EARTH_RADIUS_KM) + 0.5
    coslat = max(np.cos(np.radians(lat)), 1e-3)
    dlon = min(np.degrees(radius_km / EARTH_RADIUS_KM) / coslat + 0.5,
               180.0)
    lats = np.clip(np.arange(lat - dlat, lat + dlat + 0.5, 0.5),
                   -89.999, 89.999)
    lons = (np.arange(lon - dlon, lon + dlon + 0.5, 0.5)
            + 180.0) % 360.0 - 180.0
    gl, gt = np.meshgrid(lons, lats)
    ids = s2cells.cell_id(gl.ravel(), gt.ravel(), level)
    return sorted(set(s2cells.token(np.unique(ids))))


def radius_query(cells_dir: str, grid: GridSpec, lon: float, lat: float,
                 radius_km: float, *, level: int = 4) -> "pa.Table":
    """All assigned cells within ``radius_km`` of (lon, lat), served
    from the S2-prefix-partitioned sink: ONLY the prefix directories
    whose coarse cell can intersect the disc are read (the partition
    prune the sink exists for), then one vectorized haversine filter
    per batch. Returns (admin, cell_row, cell_col, dist_m) with the
    distance as exact-int metres-from-identical-floats.

    At 100 TB the read cost is O(disc area / world area) of the table;
    the full-scan fallback is only the verification oracle.
    """
    import os

    import ray.data

    from ..geo import haversine_km

    tokens = _covering_tokens(lon, lat, radius_km, level)
    dirs = [os.path.join(cells_dir, f"s2_prefix={t}") for t in tokens]
    files = [os.path.join(d, f) for d in dirs if os.path.isdir(d)
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not files:
        return pa.table({"admin": pa.array([], pa.string()),
                         "cell_row": pa.array([], pa.int32()),
                         "cell_col": pa.array([], pa.int32()),
                         "dist_m": pa.array([], pa.int64())})
    ds = ray.data.read_parquet(files)

    def filt(b: pa.Table) -> pa.Table:
        rows = np.asarray(b["cell_row"].to_numpy(zero_copy_only=False))
        cols = np.asarray(b["cell_col"].to_numpy(zero_copy_only=False))
        lons = grid.x_min + (cols + 0.5) * grid.x_size
        lats = grid.y_min + (rows + 0.5) * grid.y_size
        d = haversine_km(lon, lat, lons, lats)
        keep = d <= radius_km
        return pa.table({
            "admin": b["admin"].filter(pa.array(keep)),
            "cell_row": b["cell_row"].filter(pa.array(keep)),
            "cell_col": b["cell_col"].filter(pa.array(keep)),
            "dist_m": pa.array(
                np.round(d[keep] * 1000.0).astype(np.int64))})

    out = ds.map_batches(filt, batch_format="pyarrow")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


# ---------------------------------------------------------------------------
# S2 multi-resolution rollup — the spatial cube
# ---------------------------------------------------------------------------

S2_ROLLUP_LEVELS = (8, 6, 4)


def s2_rollup(world_path: str, *, levels=S2_ROLLUP_LEVELS,
              return_cells: bool = False):
    """Assigned-cell counts per admin at every S2 level in ``levels``:
    (admin, level, n_cells, n_assigned) — the multi-resolution spatial
    aggregate a tile server or coverage dashboard reads.

    ONE shuffle carries all levels: each batch derives every level's
    cell id per row and pre-reduces to (admin, level, cell, n) partial
    rows, so the combine is a single groupby regardless of how many
    levels roll up. The aggregated table is bounded by the S2
    hierarchy (<= 6·4^L cells per level), never by the data. The
    coarser levels are ALSO derivable from the finest via
    ``s2cells.parent`` — callers can cross-check derived == direct
    (the gate does), which catches any hierarchy bug in the index.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from .. import s2cells
    from .extract import world_grid

    grid = world_grid(world_path, "g1")

    def partial(b: pa.Table) -> pa.Table:
        rows = np.asarray(b["cell_row"].to_numpy(zero_copy_only=False))
        cols = np.asarray(b["cell_col"].to_numpy(zero_copy_only=False))
        lons = grid.x_min + (cols + 0.5) * grid.x_size
        lats = grid.y_min + (rows + 0.5) * grid.y_size
        fine = s2cells.cell_id(lons, lats, max(levels))
        admin = b["admin"].to_pylist()
        frames = []
        for lv in levels:
            cid = (fine if lv == max(levels)
                   else s2cells.parent(fine, lv))
            frames.append(pd.DataFrame({
                "admin": admin, "level": np.int64(lv),
                "cell": cid.astype(np.int64),
                "n": np.ones(len(cid), dtype=np.int64)}))
        df = pd.concat(frames, ignore_index=True)
        g = df.groupby(["admin", "level", "cell"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = (cell_country(world_path)
             .map_batches(partial, batch_format="pyarrow")
             .groupby(["admin", "level", "cell"])
             .aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    out = (cells.groupby(["admin", "level"], as_index=False)
           .agg(n_cells=("cell", "size"), n_assigned=("n", "sum")))
    for c in ("level", "n_cells", "n_assigned"):
        out[c] = out[c].astype(np.int64)
    out = out.sort_values(["admin", "level"]).reset_index(drop=True)
    return (out, cells) if return_cells else out


def admin_spatial_summary(world_path: str) -> "pd.DataFrame":
    """Per-admin spatial summary from the assignment table: bounding
    box and integer centroid sums — (admin, n, row_min, row_max,
    col_min, col_max, row_sum, col_sum). All order-free int64
    aggregates pre-reduced per batch (one row per admin per block), so
    the result is exact under any partitioning; the float centroid is
    derivable driver-side as row_sum/n without ever moving cells."""
    import pandas as pd
    from ray.data.aggregate import Max, Min, Sum

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "admin": b["admin"].to_pylist(),
            "r": np.asarray(b["cell_row"].to_numpy(zero_copy_only=False),
                            dtype=np.int64),
            "c": np.asarray(b["cell_col"].to_numpy(zero_copy_only=False),
                            dtype=np.int64)})
        g = df.groupby("admin", as_index=False).agg(
            n=("r", "size"), row_min=("r", "min"), row_max=("r", "max"),
            col_min=("c", "min"), col_max=("c", "max"),
            row_sum=("r", "sum"), col_sum=("c", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (cell_country(world_path)
           .map_batches(partial, batch_format="pyarrow")
           .groupby("admin")
           .aggregate(Sum("n", alias_name="n"),
                      Min("row_min", alias_name="row_min"),
                      Max("row_max", alias_name="row_max"),
                      Min("col_min", alias_name="col_min"),
                      Max("col_max", alias_name="col_max"),
                      Sum("row_sum", alias_name="row_sum"),
                      Sum("col_sum", alias_name="col_sum"))
           .to_pandas())
    for c in out.columns:
        if c != "admin":
            out[c] = out[c].astype(np.int64)
    return out.sort_values("admin").reset_index(drop=True)


# ---------------------------------------------------------------------------
# admin adjacency — border extraction (who borders whom, and how much)
# ---------------------------------------------------------------------------

def _tile_admin_codes(index: PolygonIndex, grid: GridSpec, ty: int,
                      tx: int, code_of: dict) -> np.ndarray:
    """(nrows, ncols) int16 admin-code raster for one tile: claims
    resolve LOWEST-feature_idx-first (explicit, order-independent of
    how the index enumerates candidates; double-claimed pixels take
    the lowest feature), -1 = unclaimed."""
    x_off, y_off, ncols, nrows = grid.tile_window(ty, tx)
    out = np.full((nrows, ncols), -1, dtype=np.int16)
    for fidx, admin, mask in sorted(index.assign_tile(grid, ty, tx),
                                    key=lambda c: c[0]):
        if admin is None:
            continue
        put = mask & (out == -1)
        out[put] = code_of[admin]
    return out


def admin_adjacency(world_path: str, *,
                    concurrency: int | tuple = (1, 4)) -> "pd.DataFrame":
    """Border adjacency matrix: (admin_a, admin_b, shared_edges) for
    admin_a < admin_b, where shared_edges counts 4-neighbor pixel
    pairs with different admins — the who-borders-whom product GIS
    derives from rasterized boundaries.

    Shuffle-free: each tile scores its interior edges plus ONLY its
    right/bottom cross-tile seams (the left/top belong to the
    neighbor), so every edge counts exactly once; the neighbor strip
    comes from the same PolygonIndex (computable anywhere — no fetch,
    same per-actor claims LRU as zonal). Partials are pair-count rows
    (at most admins² per block) into a tiny grouped sum.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from .extract import build_zonal_index

    index = build_zonal_index(world_path)
    grid = world_grid(world_path, "g1")
    admins = sorted({f.admin for f in index.features
                     if f.admin is not None})
    code_of = {a: i for i, a in enumerate(admins)}

    class Borders:
        def __call__(self, b: pa.Table) -> pa.Table:
            pairs: dict[tuple[int, int], int] = {}

            def count(a: np.ndarray, bb: np.ndarray) -> None:
                ok = (a != -1) & (bb != -1) & (a != bb)
                if not ok.any():
                    return
                lo = np.minimum(a[ok], bb[ok])
                hi = np.maximum(a[ok], bb[ok])
                key = lo.astype(np.int64) * len(admins) + hi
                for kk, cc in zip(*np.unique(key, return_counts=True)):
                    pairs[int(kk)] = pairs.get(int(kk), 0) + int(cc)

            for pid in b["id"].to_numpy(zero_copy_only=False):
                ty, tx = int(pid) // grid.tiles_x, int(pid) % grid.tiles_x
                arr = _tile_admin_codes(index, grid, ty, tx, code_of)
                count(arr[:, :-1], arr[:, 1:])     # horizontal interior
                count(arr[:-1, :], arr[1:, :])     # vertical interior
                if tx + 1 < grid.tiles_x:          # right seam
                    nb = _tile_admin_codes(index, grid, ty, tx + 1,
                                           code_of)
                    n = min(arr.shape[0], nb.shape[0])
                    count(arr[:n, -1], nb[:n, 0])
                if ty + 1 < grid.tiles_y:          # bottom seam
                    nb = _tile_admin_codes(index, grid, ty + 1, tx,
                                           code_of)
                    n = min(arr.shape[1], nb.shape[1])
                    count(arr[-1, :n], nb[0, :n])
            keys = np.array(sorted(pairs), dtype=np.int64)
            return pa.table({
                "pair": pa.array(keys),
                "n": pa.array([pairs[int(k)] for k in keys], pa.int64())})

        # one index instance per actor would be ideal; the closure
        # keeps this simple — ray serializes the prebuilt index once
        # per worker (same cost as the zonal kernels' constructor).

    import ray.data
    agg = (ray.data.range(grid.tiles_y * grid.tiles_x)
           .map_batches(Borders, batch_format="pyarrow", batch_size=8,
                        concurrency=concurrency)
           .groupby("pair")
           .aggregate(Sum("n", alias_name="shared_edges"))
           .to_pandas())
    out = pd.DataFrame({
        "admin_a": [admins[int(p) // len(admins)] for p in agg["pair"]],
        "admin_b": [admins[int(p) % len(admins)] for p in agg["pair"]],
        "shared_edges": agg["shared_edges"].astype(np.int64)})
    return (out.sort_values(["admin_a", "admin_b"])
            .reset_index(drop=True))




# ---------------------------------------------------------------------------
# IDW interpolation (gdal_grid analog): scattered samples -> raster
# ---------------------------------------------------------------------------

IDW_SCALE = 10 ** 9   # integer weight scale: w = SCALE // (1 + d²).
#: int64 bound: w <= 1e9, sample values are pixel counts (<= grid
#: cells), so Σ w·v stays far below 2^63 for any admin count a
#: broadcast sample table would hold.


def idw_raster(world_path: str, step: int = 8) -> "pd.DataFrame":
    """Inverse-distance-weighted surface on a coarse output lattice
    (every ``step``-th G1 pixel): samples are the admin centroids
    (value = admin pixel count) from ``admin_spatial_summary``;
    out(r, c) = (Σ w_i·v_i) // (Σ w_i) with w_i = SCALE // (1 + d²_i)
    — every step integer, so the distributed pass and the sequential
    oracle agree bit-for-bit. Returns (row, col, value) ordered.

    Shape: the sample table is admin-sized and broadcasts once via
    ``ray.put``; output cells stream through ``map_batches`` with one
    vectorized (cells × samples) distance block per batch — the
    gdal_grid discipline. A sample table too big to broadcast swaps
    in the IVF/KD bucketing the ANN family already provides (weights
    of far samples underflow to 0 at SCALE, the natural cutoff)."""
    import pandas as pd
    import ray

    from .extract import world_grid

    summ = admin_spatial_summary(world_path)
    sr = (summ["row_sum"].to_numpy(dtype=np.int64)
          // summ["n"].to_numpy(dtype=np.int64))
    sc = (summ["col_sum"].to_numpy(dtype=np.int64)
          // summ["n"].to_numpy(dtype=np.int64))
    sv = summ["n"].to_numpy(dtype=np.int64)
    bc = ray.put((sr, sc, sv))

    grid = world_grid(world_path, "g1")
    rows = np.arange(0, grid.height, step, dtype=np.int64)
    cols = np.arange(0, grid.width, step, dtype=np.int64)
    n_cols = len(cols)

    def cell(b: pa.Table) -> pa.Table:
        rr, cc, vv = ray.get(bc)
        ids = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ry = rows[ids // n_cols]
        cx = cols[ids % n_cols]
        d2 = ((ry[:, None] - rr[None, :]) ** 2
              + (cx[:, None] - cc[None, :]) ** 2)
        w = IDW_SCALE // (1 + d2)
        num = (w * vv[None, :]).sum(axis=1)
        den = w.sum(axis=1)
        val = np.where(den > 0, num // np.maximum(den, 1), 0)
        return pa.table({"row": pa.array(ry), "col": pa.array(cx),
                         "value": pa.array(val.astype(np.int64))})

    out = (ray.data.range(len(rows) * n_cols)
           .map_batches(cell, batch_format="pyarrow")
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["row", "col"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# rasterize — vector polygons -> raster dataset (gdal_rasterize, the
# polygonize inverse; the reference's own mask-preparation stage as a
# first-class raster product)
# ---------------------------------------------------------------------------

def rasterize_admins(world_path: str, out_dir: str,
                     grid_name: str = "g1") -> "pd.DataFrame":
    """Burn the admin polygon layer into a raster dataset
    (``admin_raster`` in the world layout under ``out_dir``): pixel
    value = 1 + sorted-admin index of the claiming feature, lowest
    feature_idx winning where claims overlap (a DETERMINISTIC burn
    order — gdal_rasterize's last-burned-wins made reproducible);
    0 = unclaimed. All-unclaimed tiles are skipped (sparse ocean).
    Returns (admin, code, n_px) per admin plus the written tile count
    — the table the gate compares against a sequential re-walk.

    Shuffle-free: one pass over the tile lattice, claims from the
    broadcast PolygonIndex, atomic part writes (_RenderWriter);
    per-admin counts are pre-reduced per batch."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    from ..datapipe.util import as_task_fn
    from .extract import build_zonal_index, world_grid
    from .render import _RenderWriter

    index = build_zonal_index(world_path)
    grid = world_grid(world_path, grid_name)
    admins = sorted({f.admin for f in index.features
                     if f.admin is not None})
    code_of = {a: i + 1 for i, a in enumerate(admins)}

    class Burn:
        def __init__(self):
            self.index = index
            self.writer = _RenderWriter(out_dir)

        def __call__(self, b: pa.Table) -> pa.Table:
            rows = []
            counts = np.zeros(len(admins) + 1, dtype=np.int64)
            n_tiles = 0
            for pid in b["id"].to_numpy(zero_copy_only=False):
                ty, tx = int(pid) // grid.tiles_x, int(pid) % grid.tiles_x
                x_off, y_off, ncols, nrows = grid.tile_window(ty, tx)
                arr = np.zeros((nrows, ncols), dtype=np.uint8)
                claims = self.index.assign_tile(grid, ty, tx)
                # lowest feature wins: burn in DESCENDING order so
                # later (lower) burns overwrite
                for fidx, admin, mask in sorted(
                        claims, key=lambda c: -c[0]):
                    arr[mask] = code_of[admin]
                if not arr.any():
                    continue
                n_tiles += 1
                counts += np.bincount(arr.ravel(),
                                      minlength=len(admins) + 1)
                doc = model.make_document(
                    "admin_raster", grid.name, ty, tx, x_off, y_off,
                    ncols, nrows, bands=1, nodata=0)
                rows.append({"doc_id": doc["doc_id"],
                             "spans": doc["spans"],
                             "media_ref": model.media_ref(
                                 "admin_raster", grid.name, ty, tx, 1),
                             "payload": arr.tobytes()})
            if rows:
                self.writer(pa.Table.from_pylist(rows))
            nz = np.flatnonzero(counts[1:]) + 1
            return pa.table({
                "code": pa.array(np.r_[nz, [0]].astype(np.int64)),
                "n_px": pa.array(np.r_[counts[nz],
                                       [n_tiles]].astype(np.int64))})

    agg = (ray.data.range(grid.tiles_y * grid.tiles_x)
           .map_batches(as_task_fn(Burn), batch_format="pyarrow",
                        batch_size=16)
           .groupby("code").aggregate(Sum("n_px", alias_name="n_px"))
           .to_pandas())
    n_tiles = int(agg.loc[agg["code"] == 0, "n_px"].sum())
    agg = agg[agg["code"] != 0].copy()
    agg["admin"] = agg["code"].map(
        {v: k for k, v in code_of.items()})
    agg["n_tiles"] = np.int64(n_tiles)
    for c in ("code", "n_px", "n_tiles"):
        agg[c] = agg[c].astype(np.int64)
    return (agg[["admin", "code", "n_px", "n_tiles"]]
            .sort_values("admin").reset_index(drop=True))


# ---------------------------------------------------------------------------
# sampled spatial join — cf. PAPERS.md "Random Sampling Over Spatial
# Range Joins" (ICDE 2025): a reproducible uniform sample of the
# cell↔admin join OUTPUT, decided below the join by a content-
# addressed cell hash — the full join never materializes anywhere
# ---------------------------------------------------------------------------

def cell_sample_mask(rows: np.ndarray, cols: np.ndarray,
                     pct: int) -> np.ndarray:
    """Deterministic per-cell inclusion mask: an integer mix of
    (row, col) — a pure function of cell identity, so the sample is
    identical under ANY partitioning, snapshot or cluster size (the
    dataset-versioning property, same rationale as sample_documents),
    and both engine and oracle evaluate the same arithmetic."""
    r = rows.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    c = cols.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
    h = (r ^ c) * np.uint64(0xFF51AFD7ED558CCD)
    return ((h >> np.uint64(33)) % np.uint64(100)) < np.uint64(pct)


def cell_country_sample(world_path: str, pct: int = 10, **kw):
    """Lazy sampled assignment Dataset: the hash filter runs in the
    same streaming chain as the PIP kernel, so only ~pct% of join
    rows ever exist as blocks — sampling pushed below the join, per
    the ICDE 2025 shape."""
    import pyarrow as pa

    ds = cell_country(world_path, **kw)

    def flt(b: "pa.Table") -> "pa.Table":
        m = cell_sample_mask(
            np.asarray(b["cell_row"].to_numpy(zero_copy_only=False),
                       dtype=np.int64),
            np.asarray(b["cell_col"].to_numpy(zero_copy_only=False),
                       dtype=np.int64), pct)
        return b.filter(pa.array(m))

    return ds.map_batches(flt, batch_format="pyarrow")
