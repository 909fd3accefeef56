"""Tile-pyramid (overview) builder — the GDAL ``BuildOverviews``
analog (the reference creates its rasters with ``COPY_SRC_OVERVIEWS``
-ready layouts, process_imagery.py:302-306; real deployments serve the
rendered products through overview levels).

Level ``L`` halves level ``L-1`` in both axes: each parent tile is the
2×2-window plurality vote (ties → smallest class, nodata excluded
unless the whole window is nodata — the same vote semantics as the
render plurality, O3) over a mosaic of its four child tiles.

Scale design:
* Each level is ONE shuffle-free ``map_batches`` pass: the four child
  refs are DERIVED from the parent tile key (`model.media_ref`) and
  fetched in one batched, footer-pruned ``MediaStore`` read per batch —
  the same align-join contract as the AEZ kernel (CLAUDE.md invariant);
  absent children (ocean tiles) fill with nodata via ``strict=False``.
* Levels write through the render pipeline's atomic part writer
  (documents/ + media/ per dataset), so every level is itself a valid
  media world — level L+1 reads level L exactly like level 1 reads the
  base world. Re-runs are content-idempotent: payloads are
  deterministic and parts swap in atomically, so a re-run (or a resume
  that re-derives a level) never corrupts concurrent readers —
  duplicate coverage across differently-split parts is benign because
  MediaStore point-lookups key by ref.
* The whole pyramid is a geometric series: level L touches 4^-L of the
  base tiles, so total work is < 4/3 of one base pass regardless of
  depth. Parent keys come from ``ray.data.range`` (no driver-side key
  materialization beyond the integer count).
* The per-level summary never moves payloads: each batch reduces to
  one (n_tiles, payload_sum, md5-int sum) partial row; the md5-int sum
  is an ORDER-FREE checksum (int64 wrap-sum of each tile's first-8-byte
  md5), so the gate compares bit-exactly against the sequential oracle
  without imposing an ordering on the streamed tiles.
"""

from __future__ import annotations

import functools
import hashlib
import os
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .. import model
from ..sources.documents import MediaStore
from .extract import world_grid
from .render import _RenderWriter
from ..datapipe.util import as_task_fn


def _md5_int(payload: bytes) -> int:
    return struct.unpack(
        "<q", hashlib.md5(payload).digest()[:8])[0]


def mode_reduce2(mosaic: np.ndarray, nodata: int) -> np.ndarray:
    """(2H, 2W) uint8 -> (H, W): per-2×2-window plurality vote.
    Ties break to the smallest class value (argmax keeps the first
    maximum); nodata never wins unless the window is all-nodata."""
    h2, w2 = mosaic.shape
    h, w = h2 // 2, w2 // 2
    vals = np.stack([mosaic[0::2, 0::2], mosaic[0::2, 1::2],
                     mosaic[1::2, 0::2], mosaic[1::2, 1::2]])
    win = np.arange(h * w, dtype=np.int64)
    ids = (win[None, :] * 256 +
           vals.reshape(4, h * w).astype(np.int64)).ravel()
    cnt = np.bincount(ids, minlength=h * w * 256).reshape(h * w, 256)
    nod = cnt[:, nodata].copy()
    cnt[:, nodata] = 0
    best = cnt.argmax(axis=1).astype(np.uint8)
    best[nod == 4] = nodata
    return best.reshape(h, w)


class PyramidKernel:
    """Kernel stage for one pyramid level (task-based, one instance
    per worker process): per parent tile, fetch
    the (up to) four derived child refs in one batched read, mosaic
    with nodata fill, 2×2 plurality-reduce, emit the parent doc+media
    rows."""

    def __init__(self, src_root: str, src_dataset: str, out_dataset: str,
                 grid_name: str, tile: int, src_ty: int, src_tx: int,
                 src_width: int, src_height: int, par_tx: int,
                 nodata: int):
        self.media = MediaStore(src_root)
        self.src_dataset = src_dataset
        self.out_dataset = out_dataset
        self.grid_name = grid_name
        self.tile = tile
        self.src_ty = src_ty
        self.src_tx = src_tx
        self.src_width = src_width
        self.src_height = src_height
        self.par_tx = par_tx
        self.nodata = nodata

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.tile
        ids = batch["id"].to_numpy(zero_copy_only=False)
        want: list[str] = []
        parents = []
        for pid in ids:
            ty, tx = int(pid) // self.par_tx, int(pid) % self.par_tx
            kids = []
            for dy in (0, 1):
                for dx in (0, 1):
                    cy, cx = 2 * ty + dy, 2 * tx + dx
                    if cy < self.src_ty and cx < self.src_tx:
                        r = model.media_ref(self.src_dataset,
                                            self.grid_name, cy, cx, 1)
                        kids.append((dy, dx, r))
                        want.append(r)
            parents.append((ty, tx, kids))
        payloads = self.media.fetch(want, strict=False)
        rows = []
        for ty, tx, kids in parents:
            if not any(payloads.get(r) is not None for _, _, r in kids):
                # sparse skip (S4): no child exists -> the parent is
                # all-nodata; never compute or write it. Deeper levels
                # read the hole back as nodata via strict=False, so
                # skipping is output-transparent — and at planet scale
                # most tiles are ocean holes.
                continue
            mosaic = np.full((2 * t, 2 * t), self.nodata, dtype=np.uint8)
            for dy, dx, ref in kids:
                p = payloads.get(ref)
                if p is None:
                    continue
                # edge-clamped child dims derive EXACTLY from the
                # source lattice's pixel size (same rule as
                # GridSpec.tile_window) — never inferred from length
                cy, cx = 2 * ty + dy, 2 * tx + dx
                nrows = min(t, self.src_height - cy * t)
                ncols = min(t, self.src_width - cx * t)
                arr = np.frombuffer(
                    p, np.uint8, count=nrows * ncols).reshape(nrows, ncols)
                mosaic[dy * t:dy * t + nrows,
                       dx * t:dx * t + ncols] = arr
            parent = mode_reduce2(mosaic, self.nodata)
            if (parent == self.nodata).all():
                continue  # children were present but carried no data
            doc = model.make_document(
                self.out_dataset, self.grid_name, ty, tx,
                tx * t, ty * t, t, t, bands=1, nodata=self.nodata)
            rows.append({"doc_id": doc["doc_id"], "spans": doc["spans"],
                         "media_ref": model.media_ref(
                             self.out_dataset, self.grid_name, ty, tx, 1),
                         "payload": model.encode_tile(parent)})
        return pa.Table.from_pylist(rows, schema=pa.schema([
            ("doc_id", pa.string()), ("spans", pa.list_(model.SPAN_TYPE)),
            ("media_ref", pa.string()), ("payload", pa.binary())]))


def _summary_partial(batch: pa.Table) -> pa.Table:
    payloads = batch["payload"].to_pylist()
    return pa.table({
        "n_tiles": pa.array([len(payloads)], pa.int64()),
        "payload_sum": pa.array([int(sum(
            int(np.frombuffer(p, np.uint8).astype(np.int64).sum())
            for p in payloads))], pa.int64()),
        "md5_sum": pa.array([int(np.array(
            [_md5_int(p) for p in payloads],
            dtype=np.int64).sum(dtype=np.int64))], pa.int64())})


def build_pyramid(world_path: str, dataset: str, out_dir: str, *,
                  concurrency: int | tuple = (1, 4)) -> pd.DataFrame:
    """Build all overview levels of ``dataset`` band 1 down to a single
    tile; returns the per-level summary (level, n_tiles, payload_sum,
    md5_sum). Levels land under ``out_dir`` in the world layout."""
    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    nodata = int(layout[dataset]["nodata"])
    t = grid.tile
    levels = []
    src_root, src_dataset = world_path, dataset
    src_ty, src_tx = grid.tiles_y, grid.tiles_x
    src_width, src_height = grid.width, grid.height
    level = 0
    while src_ty > 1 or src_tx > 1:
        level += 1
        par_ty = (src_ty + 1) // 2
        par_tx = (src_tx + 1) // 2
        out_dataset = f"{dataset}_ov{level}"
        keys = ray.data.range(par_ty * par_tx)
        tiles = keys.map_batches(
            as_task_fn(
                PyramidKernel,
                src_root=src_root, src_dataset=src_dataset,
                out_dataset=out_dataset, grid_name=grid.name,
                tile=t, src_ty=src_ty, src_tx=src_tx,
                src_width=src_width, src_height=src_height,
                par_tx=par_tx, nodata=nodata),
            batch_format="pyarrow", batch_size=8)
        summary = (tiles.map_batches(
            functools.partial(_write_and_summarize, out_dir=out_dir),
            batch_format="pyarrow").to_pandas())
        agg = summary.sum()
        levels.append((level, int(agg["n_tiles"]), int(agg["payload_sum"]),
                       int(np.int64(agg["md5_sum"]))))
        # the freshly-written level is the next level's source; drop
        # the footer-index cache entry so the new parts are visible
        MediaStore._FILE_INDEX.pop(
            os.path.join(out_dir, "media", f"dataset={out_dataset}"), None)
        src_root, src_dataset = out_dir, out_dataset
        src_ty, src_tx = par_ty, par_tx
        # every written tile is full t×t, so the lattice is t-aligned
        src_width, src_height = par_tx * t, par_ty * t
    out = pd.DataFrame(levels, columns=["level", "n_tiles",
                                        "payload_sum", "md5_sum"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def _write_and_summarize(batch: pa.Table, out_dir: str) -> pa.Table:
    """Write the level rows atomically, return ONE summary partial —
    payloads never leave the worker."""
    _RenderWriter(out_dir)(batch)
    return _summary_partial(batch)


def read_window(src_root: str, dataset: str, grid_name: str,
                tile: int, lattice_ty: int, lattice_tx: int,
                window: tuple[int, int, int, int], nodata: int,
                src_width: int | None = None,
                src_height: int | None = None) -> np.ndarray:
    """Serve a tile window (ty0, ty1, tx0, tx1 inclusive) of one
    pyramid level (or the base world): refs are DERIVED from the tile
    keys and fetched in ONE footer-pruned batched read; holes (sparse
    skipped / ocean tiles) fill with nodata. This is the zoom-serving
    read — cost is O(window), never O(level)."""
    ty0, ty1, tx0, tx1 = window
    refs = {}
    for ty in range(ty0, min(ty1 + 1, lattice_ty)):
        for tx in range(tx0, min(tx1 + 1, lattice_tx)):
            refs[(ty, tx)] = model.media_ref(dataset, grid_name, ty, tx, 1)
    payloads = MediaStore(src_root).fetch(list(refs.values()),
                                          strict=False)
    h = (ty1 - ty0 + 1) * tile
    w = (tx1 - tx0 + 1) * tile
    out = np.full((h, w), nodata, dtype=np.uint8)
    w_px = src_width if src_width is not None else lattice_tx * tile
    h_px = src_height if src_height is not None else lattice_ty * tile
    for (ty, tx), ref in refs.items():
        p = payloads.get(ref)
        if p is None:
            continue
        # edge-clamped dims derive from the lattice pixel size (base
        # worlds have partial edge tiles; pyramid levels are full t×t)
        nr = min(tile, h_px - ty * tile)
        nc = min(tile, w_px - tx * tile)
        arr = np.frombuffer(p, np.uint8, count=nr * nc).reshape(nr, nc)
        out[(ty - ty0) * tile:(ty - ty0) * tile + nr,
            (tx - tx0) * tile:(tx - tx0) * tile + nc] = arr
    return out


# ---------------------------------------------------------------------------
# raster change detection — per-tile diff of two world versions
# ---------------------------------------------------------------------------

def diff_worlds(world_a: str, world_b: str, dataset: str,
                *, concurrency: int | tuple = (1, 4)) -> pd.DataFrame:
    """Change detection between two versions of a raster dataset:
    (tile_y, tile_x, status, n_changed) per differing tile, status in
    {added, removed, changed} — the remote-sensing temporal diff.

    Shuffle-free: tile keys enumerate from the (tiny) lattice via
    ``ray.data.range``; each batch fetches BOTH versions' payloads by
    derived ref in one batched read per side and compares vectorized.
    Unchanged tiles emit nothing, so the result is change-sized — at
    100 TB a quarterly delta is a few thousand rows, not a world scan
    of output.
    """
    from .. import model
    from .extract import world_grid

    layout = model.world_layout(world_a)
    grid = world_grid(world_a, layout[dataset]["grid"])
    tiles_y, tiles_x = grid.tiles_y, grid.tiles_x

    class DiffKernel:
        def __init__(self):
            self.ma = MediaStore(world_a)
            self.mb = MediaStore(world_b)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["id"].to_numpy(zero_copy_only=False)
            refs = {}
            for pid in ids:
                ty, tx = int(pid) // tiles_x, int(pid) % tiles_x
                refs[(ty, tx)] = model.media_ref(
                    dataset, grid.name, ty, tx, 1)
            pa_ = self.ma.fetch(list(refs.values()), strict=False)
            pb_ = self.mb.fetch(list(refs.values()), strict=False)
            ty_o, tx_o, st_o, n_o = [], [], [], []
            for (ty, tx), ref in refs.items():
                a, b = pa_.get(ref), pb_.get(ref)
                if a is None and b is None:
                    continue
                if a is None or b is None:
                    st = "added" if a is None else "removed"
                    n = len(b if a is None else a)
                elif a == b:
                    continue
                else:
                    st = "changed"
                    n = int((np.frombuffer(a, np.uint8)
                             != np.frombuffer(b, np.uint8)).sum())
                ty_o.append(ty); tx_o.append(tx)
                st_o.append(st); n_o.append(n)
            return pa.table({
                "tile_y": pa.array(ty_o, pa.int32()),
                "tile_x": pa.array(tx_o, pa.int32()),
                "status": pa.array(st_o, pa.string()),
                "n_changed": pa.array(n_o, pa.int64())})

    out = (ray.data.range(tiles_y * tiles_x)
           .map_batches(DiffKernel, batch_format="pyarrow",
                        batch_size=16, concurrency=concurrency)
           .to_pandas())
    if out.empty:  # all-empty batches lose their schema through ray
        return pd.DataFrame({"tile_y": pd.Series([], dtype=np.int32),
                             "tile_x": pd.Series([], dtype=np.int32),
                             "status": pd.Series([], dtype=object),
                             "n_changed": pd.Series([], dtype=np.int64)})
    out["n_changed"] = out["n_changed"].astype(np.int64)
    return (out.sort_values(["tile_y", "tile_x"])
            .reset_index(drop=True))


def export_cog(world_path: str, dataset: str, pyramid_dir: str,
               tiff_path: str, *, compress: str = "deflate",
               tile_size: int = 64) -> dict:
    """Export a dataset + its (already-built) overview pyramid as ONE
    Cloud-Optimized-GeoTIFF-style file: the full raster as page 0 and
    each pyramid level as a chained reduced-resolution IFD — the
    COPY_SRC_OVERVIEWS product layout the reference ships
    (process_imagery.py creation options), written entirely by the
    from-scratch codec.

    The page arrays assemble via ``read_window`` (derived refs, one
    batched footer-pruned fetch per level); the write itself is
    inherently a single-file mosaic — the per-level TILED layout keeps
    later windowed reads O(window).
    """
    from ..sources.geotiff import write_cog

    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    nodata = int(layout[dataset]["nodata"])
    t = grid.tile
    base = read_window(world_path, dataset, grid.name, t,
                       grid.tiles_y, grid.tiles_x,
                       (0, grid.tiles_y - 1, 0, grid.tiles_x - 1),
                       nodata, src_width=grid.width,
                       src_height=grid.height)[:grid.height, :grid.width]
    overviews = []
    ty, tx = grid.tiles_y, grid.tiles_x
    level = 0
    while ty > 1 or tx > 1:
        level += 1
        ty, tx = (ty + 1) // 2, (tx + 1) // 2
        overviews.append(read_window(
            pyramid_dir, f"{dataset}_ov{level}", grid.name, t, ty, tx,
            (0, ty - 1, 0, tx - 1), nodata))
    write_cog(tiff_path, base, overviews, compress=compress,
              tiled=True, tile_size=tile_size)
    return {"pages": 1 + len(overviews),
            "base_shape": list(base.shape),
            "bytes": os.path.getsize(tiff_path)}


# ---------------------------------------------------------------------------
# focal gradient — the neighborhood (3×3) raster operator family
# ---------------------------------------------------------------------------

def sobel_mag_int(padded: np.ndarray) -> np.ndarray:
    """|gx| + |gy| of the integer Sobel operator over a (+1)-padded
    array: all-int64 arithmetic, so the distributed tile pass and the
    sequential whole-array oracle agree exactly. Input (H+2, W+2) ->
    output (H, W)."""
    a = padded.astype(np.int64)
    gx = (a[:-2, 2:] + 2 * a[1:-1, 2:] + a[2:, 2:]
          - a[:-2, :-2] - 2 * a[1:-1, :-2] - a[2:, :-2])
    gy = (a[2:, :-2] + 2 * a[2:, 1:-1] + a[2:, 2:]
          - a[:-2, :-2] - 2 * a[:-2, 1:-1] - a[:-2, 2:])
    return np.abs(gx) + np.abs(gy)


def focal_gradient(world_path: str, dataset: str, *,
                   hole_value: int | None = None,
                   concurrency: int | tuple = (1, 4)) -> pd.DataFrame:
    """Focal (3×3 neighborhood) Sobel gradient over a dataset's band 1
    — the raster-algebra family zonal/local/global ops don't cover:
    every output pixel needs its 8 neighbors, so tiles carry a 1-pixel
    HALO. The halo rows/cols come from the (up to) 8 neighbor tiles by
    DERIVED ref — one batched footer-pruned fetch per batch, no
    shuffle; absent neighbors (ocean holes / world edge) pad with the
    dataset's hole value (default: its nodata code — what
    ``full_raster`` gives holes; LC worlds pass ``hole_value=210``,
    their ocean-water convention), so the whole-array oracle
    convolution sees identical inputs.

    Returns the per-dataset summary (n_tiles, grad_sum, grad_max) —
    all integer, bit-equal to the sequential oracle.
    """
    from ray.data.aggregate import Max, Sum

    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    nodata = int(layout[dataset]["nodata"])
    hole = nodata if hole_value is None else int(hole_value)
    t = grid.tile
    tiles_y, tiles_x = grid.tiles_y, grid.tiles_x
    width, height = grid.width, grid.height

    class Focal:
        def __init__(self):
            self.media = MediaStore(world_path)

        def _dims(self, ty: int, tx: int) -> tuple[int, int]:
            return (min(t, height - ty * t), min(t, width - tx * t))

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b["id"].to_numpy(zero_copy_only=False)
            plans = []
            want = set()
            for pid in ids:
                ty, tx = int(pid) // tiles_x, int(pid) % tiles_x
                nbrs = {}
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        ny, nx = ty + dy, tx + dx
                        if 0 <= ny < tiles_y and 0 <= nx < tiles_x:
                            r = model.media_ref(dataset, grid.name,
                                                ny, nx, 1)
                            nbrs[(dy, dx)] = (ny, nx, r)
                            want.add(r)
                plans.append((ty, tx, nbrs))
            payloads = self.media.fetch(sorted(want), strict=False)
            n_out, s_out, m_out = 0, 0, 0
            for ty, tx, nbrs in plans:
                me = payloads.get(nbrs[(0, 0)][2])
                if me is None:
                    continue   # hole tiles have no gradient rows
                nr, nc = self._dims(ty, tx)
                pad = np.full((nr + 2, nc + 2), hole, dtype=np.uint8)
                for (dy, dx), (ny, nx, r) in nbrs.items():
                    p = payloads.get(r)
                    if p is None:
                        continue
                    hh, ww = self._dims(ny, nx)
                    arr = np.frombuffer(p, np.uint8,
                                        count=hh * ww).reshape(hh, ww)
                    # the strip of the neighbor facing us
                    if dy == 0 and dx == 0:
                        pad[1:1 + nr, 1:1 + nc] = arr
                    else:
                        rs = (slice(hh - 1, hh) if dy < 0
                              else slice(0, 1) if dy > 0
                              else slice(0, hh))
                        cs = (slice(ww - 1, ww) if dx < 0
                              else slice(0, 1) if dx > 0
                              else slice(0, ww))
                        sub = arr[rs, cs]
                        pr = (slice(0, 1) if dy < 0
                              else slice(nr + 1, nr + 2) if dy > 0
                              else slice(1, 1 + sub.shape[0]))
                        pc_ = (slice(0, 1) if dx < 0
                               else slice(nc + 1, nc + 2) if dx > 0
                               else slice(1, 1 + sub.shape[1]))
                        pad[pr, pc_] = sub
                g = sobel_mag_int(pad)
                n_out += 1
                s_out += int(g.sum())
                m_out = max(m_out, int(g.max()))
            return pa.table({"n_tiles": pa.array([n_out], pa.int64()),
                             "grad_sum": pa.array([s_out], pa.int64()),
                             "grad_max": pa.array([m_out], pa.int64())})

    parts = (ray.data.range(tiles_y * tiles_x)
             .map_batches(Focal, batch_format="pyarrow", batch_size=8,
                          concurrency=concurrency)
             .to_pandas())
    return pd.DataFrame([{
        "n_tiles": np.int64(parts["n_tiles"].sum()),
        "grad_sum": np.int64(parts["grad_sum"].sum()),
        "grad_max": np.int64(parts["grad_max"].max())}])




# ---------------------------------------------------------------------------
# web tile export — the gdal2tiles product: a z/x/y PNG tile tree
# over the overview pyramid
# ---------------------------------------------------------------------------

def export_web_tiles(world_path: str, dataset: str, pyramid_root: str,
                     out_dir: str) -> pd.DataFrame:
    """Write the slippy-map tile tree ``out_dir/z/x/y.png`` for a
    dataset: z = max at the base grid, decreasing through the
    overview levels built by ``build_pyramid`` (which must have run
    into ``pyramid_root``; the base level reads the world itself).
    Returns (z, n_tiles, n_bytes) per zoom, deepest first.

    Distributed shape: one shuffle-free ``map_batches`` per level over
    its tile lattice — payloads by derived ref, PNG encode in-worker
    (from-scratch RFC 2083 codec), atomic tmp+rename per tile, so a
    killed export resumes by overwrite with identical bytes. Every
    tile is decode-verified against its source payload in-worker
    before the rename (the transcode_media discipline)."""
    import uuid

    import ray

    from ..functions.png import decode_png, encode_png
    from ..sources.documents import MediaStore

    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    t = grid.tile

    # level plan mirrors build_pyramid's loop
    plan = []   # (z, root, ds_name, tiles_y, tiles_x, width, height)
    ty, tx, w, h = grid.tiles_y, grid.tiles_x, grid.width, grid.height
    level = 0
    while True:
        plan.append((level, world_path if level == 0 else pyramid_root,
                     dataset if level == 0 else f"{dataset}_ov{level}",
                     ty, tx, w, h))
        if ty <= 1 and tx <= 1:
            break
        level += 1
        ty, tx = (ty + 1) // 2, (tx + 1) // 2
        w, h = (w + 1) // 2, (h + 1) // 2
    zmax = len(plan) - 1

    rows = []
    for level, root, ds_name, tiles_y, tiles_x, width, height in plan:
        z = zmax - level

        class TileWriter:
            def __init__(self, root=root, ds_name=ds_name,
                         tiles_x=tiles_x, width=width, height=height,
                         z=z):
                self.media = MediaStore(root)
                self.ds_name, self.tiles_x = ds_name, tiles_x
                self.width, self.height, self.z = width, height, z

            def __call__(self, b: pa.Table) -> pa.Table:
                ids = b["id"].to_numpy(zero_copy_only=False)
                refs = {}
                for pid in ids:
                    yy, xx = (int(pid) // self.tiles_x,
                              int(pid) % self.tiles_x)
                    refs[(yy, xx)] = model.media_ref(
                        self.ds_name, grid.name, yy, xx, 1)
                payloads = self.media.fetch(list(refs.values()),
                                            strict=False)
                n, nb = 0, 0
                for (yy, xx), ref in refs.items():
                    p = payloads.get(ref)
                    if p is None:
                        continue   # ocean hole: no tile file
                    nr = min(t, self.height - yy * t)
                    nc = min(t, self.width - xx * t)
                    arr = np.frombuffer(p, np.uint8,
                                        count=nr * nc).reshape(nr, nc)
                    png = encode_png(arr)
                    back, _ = decode_png(png)
                    if not (back == arr).all():
                        raise AssertionError("tile decode != source")
                    d = os.path.join(out_dir, str(self.z), str(xx))
                    os.makedirs(d, exist_ok=True)
                    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
                    with open(tmp, "wb") as f:
                        f.write(png)
                    os.replace(tmp, os.path.join(d, f"{yy}.png"))
                    n += 1
                    nb += len(png)
                return pa.table({"n": pa.array([n], pa.int64()),
                                 "nb": pa.array([nb], pa.int64())})

        rep = (ray.data.range(tiles_y * tiles_x)
               .map_batches(TileWriter, batch_format="pyarrow",
                            batch_size=64, concurrency=(1, 4))
               .to_pandas())
        rows.append((z, int(rep["n"].sum()), int(rep["nb"].sum())))
    out = pd.DataFrame(rows, columns=["z", "n_tiles", "n_bytes"])
    return (out.sort_values("z", ascending=False)
            .reset_index(drop=True))


# ---------------------------------------------------------------------------
# focal aspect — gdaldem-family terrain direction: principal gradient
# direction per pixel, all-integer octant classification
# ---------------------------------------------------------------------------

def sobel_xy_int(padded: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Signed integer Sobel (gx, gy) over a (+1)-padded array."""
    a = padded.astype(np.int64)
    gx = (a[:-2, 2:] + 2 * a[1:-1, 2:] + a[2:, 2:]
          - a[:-2, :-2] - 2 * a[1:-1, :-2] - a[2:, :-2])
    gy = (a[2:, :-2] + 2 * a[2:, 1:-1] + a[2:, 2:]
          - a[:-2, :-2] - 2 * a[:-2, 1:-1] - a[:-2, 2:])
    return gx, gy


def aspect_codes(gx: np.ndarray, gy: np.ndarray) -> np.ndarray:
    """Principal-direction code per pixel, exact integer comparisons
    (boundaries at 45°, diagonals exactly on |gx| == |gy| != 0):
    0 flat, 1 E, 2 SE, 3 S, 4 SW, 5 W, 6 NW, 7 N, 8 NE (y down)."""
    ax, ay = np.abs(gx), np.abs(gy)
    code = np.zeros(gx.shape, dtype=np.int64)
    horiz = ax > ay
    code[horiz & (gx > 0)] = 1
    code[horiz & (gx < 0)] = 5
    vert = ay > ax
    code[vert & (gy > 0)] = 3
    code[vert & (gy < 0)] = 7
    diag = (ax == ay) & (ax > 0)
    code[diag & (gx > 0) & (gy > 0)] = 2
    code[diag & (gx < 0) & (gy > 0)] = 4
    code[diag & (gx < 0) & (gy < 0)] = 6
    code[diag & (gx > 0) & (gy < 0)] = 8
    return code


def shade_codes(gx: np.ndarray, gy: np.ndarray, *,
                azimuth: float = 315.0,
                altitude: float = 45.0) -> np.ndarray:
    """Horn hillshade value (0–255) per pixel from the integer Sobel
    gradients (Horn 1981; the published ESRI/gdaldem formula):

        dz/dx = gx / 8, dz/dy = gy / 8 (cellsize 1, y down = south)
        slope  = atan(sqrt(dzdx² + dzdy²))
        aspect = atan2(dzdy, -dzdx), wrapped to [0, 2π)
        zenith = 90° − altitude;  az_math = (360° − azimuth + 90°)
        shade  = 255·(cos zen·cos slope + sin zen·sin slope·
                      cos(az_math − aspect)),  clipped at 0, rounded

    Every operation is an independent per-pixel float64 ufunc chain,
    so the distributed result is bit-identical to the sequential
    oracle regardless of tiling (no reduction crosses pixels)."""
    dzdx = gx / 8.0
    dzdy = gy / 8.0
    slope = np.arctan(np.hypot(dzdx, dzdy))
    aspect = np.arctan2(dzdy, -dzdx)
    aspect = np.where(aspect < 0, aspect + 2.0 * np.pi, aspect)
    zen = np.deg2rad(90.0 - altitude)
    az_math = np.deg2rad((360.0 - azimuth + 90.0) % 360.0)
    shade = 255.0 * (np.cos(zen) * np.cos(slope)
                     + np.sin(zen) * np.sin(slope)
                     * np.cos(az_math - aspect))
    return np.rint(np.clip(shade, 0.0, 255.0)).astype(np.int64)


def grad_window(code_fn):
    """Adapt a gradient classifier ``code_fn(gx, gy)`` to the raw
    window signature ``fn(padded) -> codes`` the focal engine runs."""
    return lambda pad: code_fn(*sobel_xy_int(pad))


def tri_codes(pad: np.ndarray) -> np.ndarray:
    """Terrain Ruggedness Index, integer L1 form (Riley et al. 1999
    family; gdaldem TRI): Σ|neighbor − center| over the 8-neighborhood
    — 0..2040 for uint8 input, all-integer so bit-exactness is free."""
    a = pad.astype(np.int64)
    c = a[1:-1, 1:-1]
    out = np.zeros_like(c)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            if dy == 1 and dx == 1:
                continue
            out += np.abs(a[dy:dy + c.shape[0], dx:dx + c.shape[1]] - c)
    return out


TPI_OFFSET = 8 * 255   # shift 8·(center − mean(8)) into [0, 2·offset]


def tpi_codes(pad: np.ndarray) -> np.ndarray:
    """Topographic Position Index ×8 (gdaldem TPI, integer-scaled):
    8·center − Σ(8 neighbors), offset by +2040 to a non-negative
    histogram code; exact integers, no float mean."""
    a = pad.astype(np.int64)
    c = a[1:-1, 1:-1]
    s = np.zeros_like(c)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            if dy == 1 and dx == 1:
                continue
            s += a[dy:dy + c.shape[0], dx:dx + c.shape[1]]
    return 8 * c - s + TPI_OFFSET


def flowdir_codes(pad: np.ndarray) -> np.ndarray:
    """D8 flow direction (ESRI convention: E=1, SE=2, S=4, SW=8, W=16,
    NW=32, N=64, NE=128; 0 = no downhill neighbor). Steepest descent
    with EXACT slope comparison: cardinal slope = drop, diagonal slope
    = drop/√2, compared as 2·drop_d² vs ... integer-exactly via
    cross-multiplied squares (slope_a > slope_b ⇔ dropₐ²·wᵦ > dropᵦ²·wₐ
    for positive drops, w = 1 cardinal / 2 diagonal). Ties resolve to
    the SMALLEST code (first in E, SE, S, SW, W, NW, N, NE order) —
    deterministic and partition-independent."""
    a = pad.astype(np.int64)
    c = a[1:-1, 1:-1]
    best_drop = np.zeros_like(c)          # drop of current best
    best_w = np.ones_like(c)              # 1 cardinal, 2 diagonal
    best_code = np.zeros_like(c)
    order = [((1, 2), 1, 1), ((2, 2), 2, 2), ((2, 1), 4, 1),
             ((2, 0), 8, 2), ((1, 0), 16, 1), ((0, 0), 32, 2),
             ((0, 1), 64, 1), ((0, 2), 128, 2)]
    for (dy, dx), code, w in order:
        drop = c - a[dy:dy + c.shape[0], dx:dx + c.shape[1]]
        # strictly steeper than current best: drop²·w_best > best²·w
        better = (drop > 0) & (
            drop * drop * best_w > best_drop * best_drop * w)
        best_drop = np.where(better, drop, best_drop)
        best_w = np.where(better, w, best_w)
        best_code = np.where(better, code, best_code)
    return best_code


def slope_deg_codes(pad: np.ndarray) -> np.ndarray:
    """gdaldem slope (Horn), whole degrees 0–90: slope =
    atan(sqrt((gx/8)² + (gy/8)²)) with cellsize 1, rounded to the
    nearest degree — per-pixel float64, bit-exact distributed by the
    same argument as shade_codes."""
    gx, gy = sobel_xy_int(pad)
    return np.rint(np.degrees(
        np.arctan(np.hypot(gx / 8.0, gy / 8.0)))).astype(np.int64)


def majority_codes(pad: np.ndarray) -> np.ndarray:
    """3×3 majority (modal) filter — the GDAL sieve/majority-filter
    smoothing product: per pixel, the most frequent value of the full
    9-cell window, ties → smallest value. Vectorized as one shifted
    equality-sum per DISTINCT value present (≤ 256, ~30 for KG), all
    integer."""
    a = pad.astype(np.int64)
    c = a[1:-1, 1:-1]
    best_cnt = best_val = None
    for v in np.unique(pad):
        cnt = np.zeros_like(c)
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                cnt += (a[dy:dy + c.shape[0], dx:dx + c.shape[1]] == v)
        if best_cnt is None:
            best_cnt, best_val = cnt, np.full_like(c, v)
        else:
            # ascending values: strict > keeps the SMALLEST on ties
            win = cnt > best_cnt
            best_cnt = np.where(win, cnt, best_cnt)
            best_val = np.where(win, v, best_val)
    return best_val


def roughness_codes(pad: np.ndarray) -> np.ndarray:
    """gdaldem roughness: max − min over the full 3×3 window (center
    included) — 0..255 for uint8 input."""
    a = pad.astype(np.int64)
    c = a[1:-1, 1:-1]
    mx, mn = c.copy(), c.copy()
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            if dy == 1 and dx == 1:
                continue
            w = a[dy:dy + c.shape[0], dx:dx + c.shape[1]]
            np.maximum(mx, w, out=mx)
            np.minimum(mn, w, out=mn)
    return mx - mn


def _focal_class_hist(world_path: str, dataset: str, *,
                      hole_value: int | None, window_fn, nbins: int,
                      colname: str, batch_size: int = 64) -> pd.DataFrame:
    """Shared engine for gdaldem-family focal classifiers: per-tile
    3×3-halo assembly (absent neighbors pad with the hole value, hole
    tiles emit no rows), ``window_fn(padded)`` per pixel, an
    ``nbins``-bin histogram partial per batch and a tiny final sum —
    the focal_gradient discipline generalized over the window map."""
    import ray

    from ..datapipe.util import as_task_fn

    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    nodata = int(layout[dataset]["nodata"])
    hole = nodata if hole_value is None else int(hole_value)
    t, tiles_y, tiles_x = grid.tile, grid.tiles_y, grid.tiles_x
    width, height = grid.width, grid.height

    class FocalHist:
        def __init__(self):
            self.media = MediaStore(world_path)

        def _dims(self, ty, tx):
            return (min(t, height - ty * t), min(t, width - tx * t))

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b["id"].to_numpy(zero_copy_only=False)
            plans, want = [], set()
            for pid in ids:
                ty, tx = int(pid) // tiles_x, int(pid) % tiles_x
                nbrs = {}
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        ny, nx = ty + dy, tx + dx
                        if 0 <= ny < tiles_y and 0 <= nx < tiles_x:
                            r = model.media_ref(dataset, grid.name,
                                                ny, nx, 1)
                            nbrs[(dy, dx)] = (ny, nx, r)
                            want.add(r)
                plans.append((ty, tx, nbrs))
            payloads = self.media.fetch(sorted(want), strict=False)
            hist = np.zeros(nbins, dtype=np.int64)
            for ty, tx, nbrs in plans:
                me = payloads.get(nbrs[(0, 0)][2])
                if me is None:
                    continue
                nr, nc = self._dims(ty, tx)
                pad = np.full((nr + 2, nc + 2), hole, dtype=np.uint8)
                for (dy, dx), (ny, nx, r) in nbrs.items():
                    p = payloads.get(r)
                    if p is None:
                        continue
                    hh, ww = self._dims(ny, nx)
                    arr = np.frombuffer(p, np.uint8,
                                        count=hh * ww).reshape(hh, ww)
                    if dy == 0 and dx == 0:
                        pad[1:1 + nr, 1:1 + nc] = arr
                        continue
                    rs = (slice(hh - 1, hh) if dy < 0
                          else slice(0, 1) if dy > 0 else slice(0, hh))
                    cs = (slice(ww - 1, ww) if dx < 0
                          else slice(0, 1) if dx > 0 else slice(0, ww))
                    sub = arr[rs, cs]
                    pr = (slice(0, 1) if dy < 0
                          else slice(nr + 1, nr + 2) if dy > 0
                          else slice(1, 1 + sub.shape[0]))
                    pc_ = (slice(0, 1) if dx < 0
                           else slice(nc + 1, nc + 2) if dx > 0
                           else slice(1, 1 + sub.shape[1]))
                    pad[pr, pc_] = sub
                hist += np.bincount(window_fn(pad).ravel(),
                                    minlength=nbins)
            nz = np.flatnonzero(hist)
            return pa.table({colname: pa.array(nz.astype(np.int64)),
                             "n_px": pa.array(hist[nz])})

    from ray.data.aggregate import Sum
    out = (ray.data.range(tiles_y * tiles_x)
           .map_batches(as_task_fn(FocalHist), batch_format="pyarrow",
                        batch_size=batch_size)
           .groupby(colname)
           .aggregate(Sum("n_px", alias_name="n_px"))
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(colname).reset_index(drop=True)


def focal_aspect(world_path: str, dataset: str = "kg", *,
                 hole_value: int | None = None) -> pd.DataFrame:
    """(aspect_code, n_px) histogram of the dataset's principal
    gradient directions — the gdaldem aspect product reduced to its
    verifiable summary; same 1-px halo discipline as focal_gradient,
    bit-exact vs the whole-array oracle."""
    return _focal_class_hist(world_path, dataset,
                             hole_value=hole_value,
                             window_fn=grad_window(aspect_codes),
                             nbins=9, colname="aspect_code")


def hillshade(world_path: str, dataset: str = "kg", *,
              hole_value: int | None = None) -> pd.DataFrame:
    """(shade, n_px) histogram of the Horn hillshade (gdaldem
    hillshade product, az 315° / alt 45°) over the dataset treated as
    a DEM — same halo discipline as focal_aspect; bit-exact vs the
    whole-array oracle because shade_codes is per-pixel-independent
    float64 (no cross-pixel reduction to reorder)."""
    return _focal_class_hist(world_path, dataset,
                             hole_value=hole_value,
                             window_fn=grad_window(shade_codes),
                             nbins=256, colname="shade")


def focal_tri(world_path: str, dataset: str = "kg", *,
              hole_value: int | None = None) -> pd.DataFrame:
    """(tri, n_px) histogram of the integer Terrain Ruggedness Index
    (gdaldem TRI family) — all-integer, bit-exact vs the oracle."""
    return _focal_class_hist(world_path, dataset,
                             hole_value=hole_value,
                             window_fn=tri_codes, nbins=2041,
                             colname="tri")


def focal_tpi(world_path: str, dataset: str = "kg", *,
              hole_value: int | None = None) -> pd.DataFrame:
    """(tpi, n_px) histogram of the ×8-integer-scaled Topographic
    Position Index, offset by +2040 (gdaldem TPI family)."""
    return _focal_class_hist(world_path, dataset,
                             hole_value=hole_value,
                             window_fn=tpi_codes,
                             nbins=2 * TPI_OFFSET + 1, colname="tpi")


def focal_slope_deg(world_path: str, dataset: str = "kg", *,
                    hole_value: int | None = None) -> pd.DataFrame:
    """(slope_deg, n_px) histogram of the Horn slope in whole degrees
    (gdaldem slope)."""
    return _focal_class_hist(world_path, dataset,
                             hole_value=hole_value,
                             window_fn=slope_deg_codes, nbins=91,
                             colname="slope_deg")


def focal_majority(world_path: str, dataset: str = "kg", *,
                   hole_value: int | None = None) -> pd.DataFrame:
    """(majority, n_px) histogram of the 3×3 modal filter output (the
    GDAL majority-filter smoothing product)."""
    return _focal_class_hist(world_path, dataset,
                             hole_value=hole_value,
                             window_fn=majority_codes, nbins=256,
                             colname="majority")


def focal_flowdir(world_path: str, dataset: str = "kg", *,
                  hole_value: int | None = None) -> pd.DataFrame:
    """(flowdir, n_px) histogram of D8 flow-direction codes (ESRI
    convention, exact cross-multiplied slope comparison — see
    flowdir_codes)."""
    return _focal_class_hist(world_path, dataset,
                             hole_value=hole_value,
                             window_fn=flowdir_codes, nbins=256,
                             colname="flowdir")


def focal_roughness(world_path: str, dataset: str = "kg", *,
                    hole_value: int | None = None) -> pd.DataFrame:
    """(roughness, n_px) histogram of max−min over each 3×3 window
    (gdaldem roughness)."""
    return _focal_class_hist(world_path, dataset,
                             hole_value=hole_value,
                             window_fn=roughness_codes, nbins=256,
                             colname="roughness")


# ---------------------------------------------------------------------------
# zonal terrain — the focal × zonal COMPOSITION: per-admin statistics
# of a 3×3 window metric, computed in ONE shuffle-free kernel (halo
# fetch by derived ref + PIP claims per tile; only per-admin integer
# partial rows leave the workers)
# ---------------------------------------------------------------------------

WINDOW_FNS = {
    "tri": (tri_codes, 2041),
    "tpi": (tpi_codes, 2 * TPI_OFFSET + 1),
    "roughness": (roughness_codes, 256),
    "hillshade": (grad_window(shade_codes), 256),
}


def zonal_window_stats(world_path: str, dataset: str = "kg",
                       metric: str = "tri", *,
                       hole_value: int | None = None) -> pd.DataFrame:
    """Per-admin (n_px, sum, min, max) of a focal window metric — the
    'mean ruggedness per country' family of products. Composes the
    two verified kernel disciplines without a shuffle: each tile
    assembles its 3×3 halo from neighbor tiles by DERIVED ref (the
    focal discipline) and intersects the metric field with the tile's
    polygon claims (the zonal discipline, double-claim parity
    included). Partials are order-free int64 per-admin rows, so the
    result is exact under any partitioning. mean = sum/n_px is left
    to the caller — no float leaves the pipeline."""
    import ray

    from ..datapipe.util import as_task_fn
    from .extract import build_zonal_index, world_grid as _wg

    window_fn, _ = WINDOW_FNS[metric]
    layout = model.world_layout(world_path)
    grid = _wg(world_path, layout[dataset]["grid"])
    nodata = int(layout[dataset]["nodata"])
    hole = nodata if hole_value is None else int(hole_value)
    index = build_zonal_index(world_path)
    t, tiles_y, tiles_x = grid.tile, grid.tiles_y, grid.tiles_x
    width, height = grid.width, grid.height

    class ZonalWindow:
        def __init__(self):
            self.media = MediaStore(world_path)
            self.index = index

        def _dims(self, ty, tx):
            return (min(t, height - ty * t), min(t, width - tx * t))

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b["id"].to_numpy(zero_copy_only=False)
            plans, want = [], set()
            for pid in ids:
                ty, tx = int(pid) // tiles_x, int(pid) % tiles_x
                nbrs = {}
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        ny, nx = ty + dy, tx + dx
                        if 0 <= ny < tiles_y and 0 <= nx < tiles_x:
                            r = model.media_ref(dataset, grid.name,
                                                ny, nx, 1)
                            nbrs[(dy, dx)] = (ny, nx, r)
                            want.add(r)
                plans.append((ty, tx, nbrs))
            payloads = self.media.fetch(sorted(want), strict=False)
            acc: dict[str, list] = {}
            for ty, tx, nbrs in plans:
                me = payloads.get(nbrs[(0, 0)][2])
                if me is None:
                    continue
                nr, nc = self._dims(ty, tx)
                pad = np.full((nr + 2, nc + 2), hole, dtype=np.uint8)
                for (dy, dx), (ny, nx, r) in nbrs.items():
                    p = payloads.get(r)
                    if p is None:
                        continue
                    hh, ww = self._dims(ny, nx)
                    arr = np.frombuffer(p, np.uint8,
                                        count=hh * ww).reshape(hh, ww)
                    if dy == 0 and dx == 0:
                        pad[1:1 + nr, 1:1 + nc] = arr
                        continue
                    rs = (slice(hh - 1, hh) if dy < 0
                          else slice(0, 1) if dy > 0 else slice(0, hh))
                    cs = (slice(ww - 1, ww) if dx < 0
                          else slice(0, 1) if dx > 0 else slice(0, ww))
                    sub = arr[rs, cs]
                    pr = (slice(0, 1) if dy < 0
                          else slice(nr + 1, nr + 2) if dy > 0
                          else slice(1, 1 + sub.shape[0]))
                    pc_ = (slice(0, 1) if dx < 0
                           else slice(nc + 1, nc + 2) if dx > 0
                           else slice(1, 1 + sub.shape[1]))
                    pad[pr, pc_] = sub
                codes = window_fn(pad)
                for _fidx, admin, mask in self.index.assign_tile(
                        grid, ty, tx):
                    vals = codes[mask]
                    if not len(vals):
                        continue
                    cur = acc.get(admin)
                    row = [len(vals), int(vals.sum()),
                           int(vals.min()), int(vals.max())]
                    if cur is None:
                        acc[admin] = row
                    else:
                        cur[0] += row[0]
                        cur[1] += row[1]
                        cur[2] = min(cur[2], row[2])
                        cur[3] = max(cur[3], row[3])
            admins = sorted(acc)
            cols = np.array([acc[a] for a in admins], dtype=np.int64) \
                if admins else np.zeros((0, 4), dtype=np.int64)
            return pa.table({
                "admin": pa.array(admins, pa.string()),
                "n_px": pa.array(cols[:, 0]),
                "sum": pa.array(cols[:, 1]),
                "min": pa.array(cols[:, 2]),
                "max": pa.array(cols[:, 3]),
            })

    from ray.data.aggregate import Max, Min, Sum
    out = (ray.data.range(tiles_y * tiles_x)
           .map_batches(as_task_fn(ZonalWindow), batch_format="pyarrow",
                        batch_size=64)
           .groupby("admin")
           .aggregate(Sum("n_px", alias_name="n_px"),
                      Sum("sum", alias_name="sum"),
                      Min("min", alias_name="min"),
                      Max("max", alias_name="max"))
           .to_pandas())
    for c in out.columns:
        if c != "admin":
            out[c] = out[c].astype(np.int64)
    return out.sort_values("admin").reset_index(drop=True)


def change_matrix(world_a: str, world_b: str, dataset: str,
                  *, batch_size: int = 16) -> pd.DataFrame:
    """Class transition matrix between two versions of a raster —
    the land-cover change-analysis product on top of ``diff_worlds``:
    (from_class, to_class, n_px) over every pixel present in BOTH
    versions, plus ("added"/"removed" are tile-level events
    ``diff_worlds`` already reports and are excluded here). Diagonal
    rows are the unchanged area; off-diagonal rows are the change
    signal. Shuffle-free: both versions fetched by derived ref per
    batch, one 16-bit bincount (256·a + b) per tile, ≤256² partial
    rows per block — the raster_crosstab discipline applied across
    TIME instead of across layers."""
    from .. import model
    from ..datapipe.util import as_task_fn
    from .extract import world_grid

    layout = model.world_layout(world_a)
    grid = world_grid(world_a, layout[dataset]["grid"])
    tiles_y, tiles_x = grid.tiles_y, grid.tiles_x

    class ChangeKernel:
        def __init__(self):
            self.ma = MediaStore(world_a)
            self.mb = MediaStore(world_b)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["id"].to_numpy(zero_copy_only=False)
            refs = {}
            for pid in ids:
                ty, tx = int(pid) // tiles_x, int(pid) % tiles_x
                refs[(ty, tx)] = model.media_ref(
                    dataset, grid.name, ty, tx, 1)
            pa_ = self.ma.fetch(list(refs.values()), strict=False)
            pb_ = self.mb.fetch(list(refs.values()), strict=False)
            hist = np.zeros(65536, dtype=np.int64)
            for (_ty, _tx), ref in refs.items():
                a, b = pa_.get(ref), pb_.get(ref)
                if a is None or b is None:
                    continue
                av = np.frombuffer(a, np.uint8).astype(np.int64)
                bv = np.frombuffer(b, np.uint8).astype(np.int64)
                hist += np.bincount(av * 256 + bv, minlength=65536)
            nz = np.flatnonzero(hist)
            return pa.table({
                "from_class": pa.array((nz // 256).astype(np.int64)),
                "to_class": pa.array((nz % 256).astype(np.int64)),
                "n_px": pa.array(hist[nz])})

    from ray.data.aggregate import Sum
    out = (ray.data.range(tiles_y * tiles_x)
           .map_batches(as_task_fn(ChangeKernel),
                        batch_format="pyarrow", batch_size=batch_size)
           .groupby(["from_class", "to_class"])
           .aggregate(Sum("n_px", alias_name="n_px"))
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["from_class", "to_class"])
            .reset_index(drop=True))


# ---------------------------------------------------------------------------
# radius-k focal mean — GRASS r.neighbors / ESRI Focal Statistics with
# a window wider than the 3×3 the gdaldem family uses
# ---------------------------------------------------------------------------

def _khalo_pad(payloads: dict, nbrs: dict, nr: int, nc: int,
               dims, hole: int, k: int) -> np.ndarray:
    """(nr+2k, nc+2k) k-pixel halo pad for one tile: the facing
    k-strips / k×k corners of the 8 neighbor tiles from the batch's
    fetched payloads; absent neighbors and off-grid cells stay at
    ``hole``. Tail tiles shorter than k are safe: beyond them lies
    only the world frame."""
    pad = np.full((nr + 2 * k, nc + 2 * k), hole, dtype=np.uint8)
    for (dy, dx), (ny, nx, r) in nbrs.items():
        p = payloads.get(r)
        if p is None:
            continue
        hh, ww = dims(ny, nx)
        arr = np.frombuffer(p, np.uint8, count=hh * ww).reshape(hh, ww)
        rs = (slice(max(0, hh - k), hh) if dy < 0
              else slice(0, min(k, hh)) if dy > 0
              else slice(0, hh))
        cs = (slice(max(0, ww - k), ww) if dx < 0
              else slice(0, min(k, ww)) if dx > 0
              else slice(0, ww))
        sub = arr[rs, cs]
        pr = (slice(k - sub.shape[0], k) if dy < 0
              else slice(k + nr, k + nr + sub.shape[0]) if dy > 0
              else slice(k, k + sub.shape[0]))
        pc_ = (slice(k - sub.shape[1], k) if dx < 0
               else slice(k + nc, k + nc + sub.shape[1]) if dx > 0
               else slice(k, k + sub.shape[1]))
        pad[pr, pc_] = sub
    return pad


class _FocalMeanTiles:
    """Per-tile radius-``k`` focal mean kernel: assembles a k-pixel
    HALO pad from the 8 neighbor tiles (the facing k-strips /
    k×k corners by derived ref, one batched fetch — the 1-px focal
    discipline generalized to arbitrary radius ≤ tile), then computes
    per-pixel windowed sums with an integral image (summed-area
    table): exact int64, no convolution float path. Valid pixels are
    non-nodata pixels of present tiles; the mean is the FLOOR of
    window-sum / window-valid-count over the clipped window, emitted
    as (mean_floor, n_px) histogram partials."""

    def __init__(self, world_path: str, dataset: str, k: int,
                 hole: int):
        self.media = MediaStore(world_path)
        layout = model.world_layout(world_path)
        self.grid = world_grid(world_path, layout[dataset]["grid"])
        self.dataset = dataset
        self.k = int(k)
        self.hole = hole
        if self.k < 1 or self.k > self.grid.tile:
            raise ValueError("radius must be in [1, tile]")

    def _dims(self, ty: int, tx: int) -> tuple[int, int]:
        g = self.grid
        return (min(g.tile, g.height - ty * g.tile),
                min(g.tile, g.width - tx * g.tile))

    def __call__(self, b: pa.Table) -> pa.Table:
        g, k = self.grid, self.k
        ids = b["id"].to_numpy(zero_copy_only=False)
        plans, want = [], set()
        for pid in ids:
            ty, tx = int(pid) // g.tiles_x, int(pid) % g.tiles_x
            nbrs = {}
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ny, nx = ty + dy, tx + dx
                    if 0 <= ny < g.tiles_y and 0 <= nx < g.tiles_x:
                        r = model.media_ref(self.dataset, g.name,
                                            ny, nx, 1)
                        nbrs[(dy, dx)] = (ny, nx, r)
                        want.add(r)
            plans.append((ty, tx, nbrs))
        payloads = self.media.fetch(sorted(want), strict=False)
        hist: dict[int, int] = {}
        for ty, tx, nbrs in plans:
            if payloads.get(nbrs[(0, 0)][2]) is None:
                continue
            nr, nc = self._dims(ty, tx)
            pad = _khalo_pad(payloads, nbrs, nr, nc, self._dims,
                             self.hole, k)
            valid = pad != self.hole
            vsum, vcnt = _window_sums(pad, valid, k)
            ctr_valid = valid[k:k + nr, k:k + nc]
            if not ctr_valid.any():
                continue
            mean_floor = (vsum[ctr_valid] // vcnt[ctr_valid])
            u, cnt = np.unique(mean_floor, return_counts=True)
            for v, n in zip(u.tolist(), cnt.tolist()):
                hist[v] = hist.get(v, 0) + n
        keys = sorted(hist)
        return pa.table({
            "mean_floor": pa.array(keys, pa.int64()),
            "n_px": pa.array([hist[kk] for kk in keys], pa.int64())})


def _window_sums(pad: np.ndarray, valid: np.ndarray,
                 k: int) -> tuple[np.ndarray, np.ndarray]:
    """(window value sum, window valid count) for every interior
    pixel of a k-halo pad via integral images — exact int64."""
    v = (pad.astype(np.int64) * valid)
    c = valid.astype(np.int64)
    iv = np.zeros((v.shape[0] + 1, v.shape[1] + 1), dtype=np.int64)
    ic = np.zeros_like(iv)
    np.cumsum(np.cumsum(v, axis=0), axis=1, out=iv[1:, 1:])
    np.cumsum(np.cumsum(c, axis=0), axis=1, out=ic[1:, 1:])
    nr, nc = v.shape[0] - 2 * k, v.shape[1] - 2 * k
    w = 2 * k + 1

    def box(ii):
        return (ii[w:w + nr, w:w + nc] + ii[0:nr, 0:nc]
                - ii[0:nr, w:w + nc] - ii[w:w + nr, 0:nc])

    return box(iv), box(ic)


def focal_mean_radius(world_path: str, dataset: str = "kg",
                      k: int = 3, *, hole_value: int | None = None,
                      batch_size: int = 8) -> pd.DataFrame:
    """(mean_floor, n_px) histogram of the radius-``k`` focal mean
    (floor of windowed sum / valid count, window (2k+1)², clipped at
    the grid frame; nodata pixels and absent tiles contribute neither
    value nor count and emit no center rows) — GRASS ``r.neighbors``
    method=average at integer precision. Shuffle-free: halo strips
    are derived refs, partials are tiny histograms."""
    from ray.data.aggregate import Sum

    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    nodata = int(layout[dataset]["nodata"])
    hole = nodata if hole_value is None else int(hole_value)
    fn = as_task_fn(_FocalMeanTiles, world_path=world_path,
                    dataset=dataset, k=int(k), hole=hole)
    out = (ray.data.range(grid.tiles_y * grid.tiles_x)
           .map_batches(fn, batch_format="pyarrow",
                        batch_size=batch_size)
           .groupby("mean_floor")
           .aggregate(Sum("n_px", alias_name="n_px"))
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("mean_floor").reset_index(drop=True)


# ---------------------------------------------------------------------------
# geomorphon pattern census — the r.geomorphon (Jasiewicz & Stepinski
# 2013) ternary openness pattern at bounded lookup distance, with all
# angle comparisons done as exact integer cross-multiplications
# ---------------------------------------------------------------------------

_GEO_DIRS = ((-1, 0), (-1, 1), (0, 1), (1, 1),
             (1, 0), (1, -1), (0, -1), (-1, -1))


def geomorphon_codes(pad: np.ndarray, valid: np.ndarray, k: int,
                     nr: int, nc: int) -> tuple[np.ndarray, np.ndarray]:
    """(n_minus, n_plus) ternary-pattern counts per interior pixel of
    a k-halo pad. Per direction the best uphill and downhill
    elevation/distance fractions max_i (E_i - E0)/i and
    max_i (E0 - E_i)/i are found by an exact integer tournament
    (compare a/b vs c/d as a*d vs c*b; the sqrt(2) diagonal factor
    cancels inside one direction, and flatness threshold 0 needs no
    angle units at all). Direction code: +1 if uphill beats downhill,
    -1 if downhill beats uphill, 0 on exact tie or when both are
    non-positive (level) or no sample is valid. Centers must be
    valid; invalid samples never enter the tournament."""
    e = pad.astype(np.int64)
    e0 = e[k:k + nr, k:k + nc]
    n_plus = np.zeros((nr, nc), dtype=np.int64)
    n_minus = np.zeros((nr, nc), dtype=np.int64)
    for dy, dx in _GEO_DIRS:
        un = np.zeros((nr, nc), dtype=np.int64)   # best uphill num
        ud = np.zeros((nr, nc), dtype=np.int64)   # best uphill den
        dn = np.zeros((nr, nc), dtype=np.int64)
        dd = np.zeros((nr, nc), dtype=np.int64)
        has = np.zeros((nr, nc), dtype=bool)
        for i in range(1, k + 1):
            ei = e[k + i * dy:k + i * dy + nr, k + i * dx:k + i * dx + nc]
            vi = valid[k + i * dy:k + i * dy + nr,
                       k + i * dx:k + i * dx + nc]
            cu = ei - e0
            up_better = vi & (~has | (cu * ud > un * i))
            un[up_better] = cu[up_better]
            ud[up_better] = i
            dn_better = vi & (~has | (-cu * dd > dn * i))
            dn[dn_better] = -cu[dn_better]
            dd[dn_better] = i
            has |= vi
        # compare uphill vs downhill fractions (dens > 0 where has)
        lhs = un * dd
        rhs = dn * ud
        level = (un <= 0) & (dn <= 0)
        plus = has & ~level & (lhs > rhs)
        minus = has & ~level & (rhs > lhs)
        n_plus += plus
        n_minus += minus
    return n_minus, n_plus


class _GeomorphonTiles:
    """Per-tile geomorphon pattern kernel: k-halo pad by derived ref,
    exact ternary classification, (n_minus, n_plus) pair histogram
    partials (<= 81 rows per batch)."""

    def __init__(self, world_path: str, dataset: str, k: int,
                 hole: int):
        self.media = MediaStore(world_path)
        layout = model.world_layout(world_path)
        self.grid = world_grid(world_path, layout[dataset]["grid"])
        self.dataset = dataset
        self.k = int(k)
        self.hole = hole
        if self.k < 1 or self.k > self.grid.tile:
            raise ValueError("lookup distance must be in [1, tile]")

    def _dims(self, ty: int, tx: int) -> tuple[int, int]:
        g = self.grid
        return (min(g.tile, g.height - ty * g.tile),
                min(g.tile, g.width - tx * g.tile))

    def __call__(self, b: pa.Table) -> pa.Table:
        g, k = self.grid, self.k
        ids = b["id"].to_numpy(zero_copy_only=False)
        plans, want = [], set()
        for pid in ids:
            ty, tx = int(pid) // g.tiles_x, int(pid) % g.tiles_x
            nbrs = {}
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ny, nx = ty + dy, tx + dx
                    if 0 <= ny < g.tiles_y and 0 <= nx < g.tiles_x:
                        r = model.media_ref(self.dataset, g.name,
                                            ny, nx, 1)
                        nbrs[(dy, dx)] = (ny, nx, r)
                        want.add(r)
            plans.append((ty, tx, nbrs))
        payloads = self.media.fetch(sorted(want), strict=False)
        hist: dict[int, int] = {}
        for ty, tx, nbrs in plans:
            if payloads.get(nbrs[(0, 0)][2]) is None:
                continue
            nr, nc = self._dims(ty, tx)
            pad = _khalo_pad(payloads, nbrs, nr, nc, self._dims,
                             self.hole, k)
            valid = pad != self.hole
            n_minus, n_plus = geomorphon_codes(pad, valid, k, nr, nc)
            ctr = valid[k:k + nr, k:k + nc]
            if not ctr.any():
                continue
            key = n_minus[ctr] * 9 + n_plus[ctr]
            u, cnt = np.unique(key, return_counts=True)
            for v, n in zip(u.tolist(), cnt.tolist()):
                hist[v] = hist.get(v, 0) + n
        keys = sorted(hist)
        return pa.table({
            "pattern": pa.array(keys, pa.int64()),
            "n_px": pa.array([hist[kk] for kk in keys], pa.int64())})


def geomorphon_census(world_path: str, dataset: str = "kg",
                      k: int = 4, *, hole_value: int | None = None,
                      batch_size: int = 8) -> pd.DataFrame:
    """(n_minus, n_plus, n_px) census of geomorphon ternary patterns
    at lookup distance ``k`` — the raw form of the r.geomorphon
    landform classification (the published 10-form table is a pure
    per-row lookup on these pairs). Shuffle-free, <= 81-row
    partials."""
    from ray.data.aggregate import Sum

    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    nodata = int(layout[dataset]["nodata"])
    hole = nodata if hole_value is None else int(hole_value)
    fn = as_task_fn(_GeomorphonTiles, world_path=world_path,
                    dataset=dataset, k=int(k), hole=hole)
    out = (ray.data.range(grid.tiles_y * grid.tiles_x)
           .map_batches(fn, batch_format="pyarrow",
                        batch_size=batch_size)
           .groupby("pattern")
           .aggregate(Sum("n_px", alias_name="n_px"))
           .to_pandas())
    out["n_minus"] = (out["pattern"] // 9).astype(np.int64)
    out["n_plus"] = (out["pattern"] % 9).astype(np.int64)
    out["n_px"] = out["n_px"].astype(np.int64)
    out = out[["n_minus", "n_plus", "n_px"]]
    return (out.sort_values(["n_minus", "n_plus"])
            .reset_index(drop=True))


# ---------------------------------------------------------------------------
# class morphology — GRASS r.grow / ESRI Expand-Shrink, plus opening
# and closing, all in ONE pass from a 2k-pixel halo
# ---------------------------------------------------------------------------

class _MorphTiles:
    """Per-tile binary morphology census for one target class with a
    square (2k+1)² structuring element. The trick making open/close
    single-pass: the intermediate mask (dilated resp. eroded) is
    computed on the interior PLUS a k-ring from a 2k source halo, so
    the second operator needs no exchange of computed masks — the
    derived-ref discipline extended to composed focal ops. Erosion
    requires the FULL window inside the target class (off-grid,
    nodata and absent tiles are non-target), dilation fires on any
    window hit. Census rows are over present-tile pixels."""

    def __init__(self, world_path: str, dataset: str, target: int,
                 k: int, hole: int):
        self.media = MediaStore(world_path)
        layout = model.world_layout(world_path)
        self.grid = world_grid(world_path, layout[dataset]["grid"])
        self.dataset = dataset
        self.target = int(target)
        self.k = int(k)
        self.hole = hole
        if self.k < 1 or 2 * self.k > self.grid.tile:
            raise ValueError("radius must satisfy 2k <= tile")

    def _dims(self, ty: int, tx: int) -> tuple[int, int]:
        g = self.grid
        return (min(g.tile, g.height - ty * g.tile),
                min(g.tile, g.width - tx * g.tile))

    def __call__(self, b: pa.Table) -> pa.Table:
        g, k = self.grid, self.k
        ids = b["id"].to_numpy(zero_copy_only=False)
        plans, want = [], set()
        for pid in ids:
            ty, tx = int(pid) // g.tiles_x, int(pid) % g.tiles_x
            nbrs = {}
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ny, nx = ty + dy, tx + dx
                    if 0 <= ny < g.tiles_y and 0 <= nx < g.tiles_x:
                        r = model.media_ref(self.dataset, g.name,
                                            ny, nx, 1)
                        nbrs[(dy, dx)] = (ny, nx, r)
                        want.add(r)
            plans.append((ty, tx, nbrs))
        payloads = self.media.fetch(sorted(want), strict=False)
        acc = np.zeros(5, dtype=np.int64)   # src, dil, ero, open, close
        w2 = (2 * k + 1) ** 2
        for ty, tx, nbrs in plans:
            if payloads.get(nbrs[(0, 0)][2]) is None:
                continue
            nr, nc = self._dims(ty, tx)
            pad = _khalo_pad(payloads, nbrs, nr, nc, self._dims,
                             self.hole, 2 * k)
            x = pad == self.target
            _, cnt1 = _window_sums(pad, x, k)   # interior + k ring
            dil = cnt1 > 0
            ero = cnt1 == w2
            _, cnt_d = _window_sums(pad[k:-k, k:-k], dil, k)
            _, cnt_e = _window_sums(pad[k:-k, k:-k], ero, k)
            acc[0] += int(x[2 * k:2 * k + nr, 2 * k:2 * k + nc].sum())
            acc[1] += int(dil[k:k + nr, k:k + nc].sum())
            acc[2] += int(ero[k:k + nr, k:k + nc].sum())
            acc[3] += int((cnt_e > 0).sum())        # open = dilate(erode)
            acc[4] += int((cnt_d == w2).sum())      # close = erode(dilate)
        ops = ["source", "dilate", "erode", "open", "close"]
        return pa.table({"op": pa.array(ops, pa.string()),
                         "n_px": pa.array(acc, pa.int64())})


def class_morphology(world_path: str, dataset: str = "lc",
                     target: int = 210, k: int = 2, *,
                     hole_value: int | None = None,
                     batch_size: int = 8) -> pd.DataFrame:
    """(op, n_px) census of {source, dilate, erode, open, close} for
    one class under a (2k+1)² square element — the r.grow / Expand /
    Shrink family plus the two compositions, shuffle-free with a
    single 2k-halo fetch per tile."""
    from ray.data.aggregate import Sum

    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    nodata = int(layout[dataset]["nodata"])
    hole = nodata if hole_value is None else int(hole_value)
    fn = as_task_fn(_MorphTiles, world_path=world_path,
                    dataset=dataset, target=int(target), k=int(k),
                    hole=hole)
    out = (ray.data.range(grid.tiles_y * grid.tiles_x)
           .map_batches(fn, batch_format="pyarrow",
                        batch_size=batch_size)
           .groupby("op")
           .aggregate(Sum("n_px", alias_name="n_px"))
           .to_pandas())
    out["n_px"] = out["n_px"].astype(np.int64)
    order = {"source": 0, "dilate": 1, "erode": 2, "open": 3,
             "close": 4}
    out["_o"] = out["op"].map(order)
    out = (out.sort_values("_o").drop(columns="_o")
           .reset_index(drop=True))
    return out
