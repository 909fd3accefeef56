"""Raster reprojection (warp) — equirectangular → Web Mercator,
nearest-neighbor (the ``gdalwarp -t_srs EPSG:3857 -r near`` analog; the
reference's rendered products are served reprojected by every web map
stack).

Distributed shape: one shuffle-free pass over the OUTPUT tile lattice
(`ray.data.range`) — each output tile computes its source pixel indices
(vectorized, via the SAME ``mercator_src_index`` function the
sequential oracle calls, so the gather is bit-identical), derives the
set of source tiles its index bbox touches, fetches them in ONE
batched footer-pruned MediaStore read, and gathers. Source tiles are
re-fetched by at most the handful of output tiles whose bboxes overlap
them — O(1) amplification, no shuffle, no driver materialization.

The Mercator Y axis uses the standard Gudermannian inverse
(lat = atan(sinh(π(1 − 2·y/N)))) over the Web-Mercator latitude range
±85.0511° (the square world of every slippy-map tile scheme).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .. import model
from ..sources.documents import MediaStore
from .extract import world_grid
from .pyramid import _md5_int
from .render import _RenderWriter
from ..datapipe.util import as_task_fn


def mercator_src_index(grid, out_n: int, rows: np.ndarray,
                       cols: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Source (row, col) for output pixels of an ``out_n``×``out_n``
    Web-Mercator square. Shared verbatim by the distributed kernel and
    the sequential oracle — identical IEEE float math on both sides."""
    lon = -180.0 + (cols + 0.5) * (360.0 / out_n)
    merc_y = np.pi * (1.0 - 2.0 * (rows + 0.5) / out_n)
    lat = np.degrees(np.arctan(np.sinh(merc_y)))
    src_c = np.floor((lon - grid.x_min) / grid.x_size).astype(np.int64)
    src_r = np.floor((lat - grid.y_min) / grid.y_size).astype(np.int64)
    np.clip(src_c, 0, grid.width - 1, out=src_c)
    np.clip(src_r, 0, grid.height - 1, out=src_r)
    return src_r, src_c


class _WarpKernel:
    """One output tile per work item: vectorized index computation,
    one batched fetch of the touched source tiles, numpy gather."""

    def __init__(self, world_path: str, dataset: str, grid, out_n: int,
                 tile: int, out_dataset: str, nodata: int):
        self.media = MediaStore(world_path)
        self.dataset = dataset
        self.grid = grid
        self.out_n = out_n
        self.tile = tile
        self.out_dataset = out_dataset
        self.nodata = nodata

    def __call__(self, batch: pa.Table) -> pa.Table:
        g, t = self.grid, self.tile
        per_tile = self.out_n // t
        rows_out = []
        # pass 1: indices + the union of touched source tiles
        plans = []
        want: set[str] = set()
        for pid in batch["id"].to_numpy(zero_copy_only=False):
            oty, otx = int(pid) // per_tile, int(pid) % per_tile
            rr = np.arange(oty * t, (oty + 1) * t, dtype=np.float64)
            cc = np.arange(otx * t, (otx + 1) * t, dtype=np.float64)
            rgrid, cgrid = np.meshgrid(rr, cc, indexing="ij")
            src_r, src_c = mercator_src_index(
                g, self.out_n, rgrid.ravel(), cgrid.ravel())
            sty = np.unique(src_r // t)
            stx = np.unique(src_c // t)
            refs = {}
            for a in sty:
                for b in stx:
                    refs[(int(a), int(b))] = model.media_ref(
                        self.dataset, g.name, int(a), int(b), 1)
            want.update(refs.values())
            plans.append((oty, otx, src_r, src_c, refs))
        payloads = self.media.fetch(sorted(want), strict=False)
        for oty, otx, src_r, src_c, refs in plans:
            out = np.full(len(src_r), self.nodata, dtype=np.uint8)
            for (a, b), ref in refs.items():
                p = payloads.get(ref)
                if p is None:
                    continue
                nr = min(t, g.height - a * t)
                nc = min(t, g.width - b * t)
                arr = np.frombuffer(p, np.uint8,
                                    count=nr * nc).reshape(nr, nc)
                sel = ((src_r // t == a) & (src_c // t == b))
                rr = src_r[sel] - a * t
                cc = src_c[sel] - b * t
                ok = (rr < nr) & (cc < nc)
                idx = np.flatnonzero(sel)[ok]
                out[idx] = arr[rr[ok], cc[ok]]
            tile_arr = out.reshape(t, t)
            doc = model.make_document(
                self.out_dataset, "merc", oty, otx, otx * t, oty * t,
                t, t, bands=1, nodata=self.nodata)
            rows_out.append({
                "doc_id": doc["doc_id"], "spans": doc["spans"],
                "media_ref": model.media_ref(self.out_dataset, "merc",
                                             oty, otx, 1),
                "payload": model.encode_tile(tile_arr)})
        return pa.Table.from_pylist(rows_out, schema=pa.schema([
            ("doc_id", pa.string()), ("spans", pa.list_(model.SPAN_TYPE)),
            ("media_ref", pa.string()), ("payload", pa.binary())]))


def warp_to_mercator(world_path: str, dataset: str, out_dir: str, *,
                     out_n: int | None = None,
                     concurrency: int | tuple = (1, 4)) -> pd.DataFrame:
    """Warp a dataset to an ``out_n``×``out_n`` Web-Mercator square
    written in the world layout under ``out_dir``; returns (out_n,
    n_tiles, payload_sum, md5_sum). Default ``out_n`` = the source
    height (a natural square for an equirect world)."""
    import functools

    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    nodata = int(layout[dataset]["nodata"])
    t = grid.tile
    if out_n is None:
        out_n = (grid.height // t) * t  # t-aligned square
    if out_n % t:
        raise ValueError("out_n must be a multiple of the tile edge")
    per_tile = out_n // t

    def write_sum(batch: pa.Table, out_dir: str) -> pa.Table:
        _RenderWriter(out_dir)(batch)
        payloads = batch["payload"].to_pylist()
        return pa.table({
            "n_tiles": pa.array([len(payloads)], pa.int64()),
            "payload_sum": pa.array([int(sum(
                int(np.frombuffer(p, np.uint8).astype(np.int64).sum())
                for p in payloads))], pa.int64()),
            "md5_sum": pa.array([int(np.array(
                [_md5_int(p) for p in payloads], dtype=np.int64)
                .sum(dtype=np.int64))], pa.int64())})

    # the warped output is a first-class, self-describing world:
    # declare its own grid + layout so pyramid/read_window/diff work
    # on it unchanged (the imported-world marker contract)
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_WORLD.json")
    meta = {"name": os.path.basename(out_dir.rstrip("/")), "scale": 0,
            "seed": 0, "datasets": [], "layout": {}, "grids": {}}
    if os.path.exists(marker):
        with open(marker) as f:
            meta.update(json.load(f))
    out_ds = f"{dataset}_merc"
    if out_ds not in meta.setdefault("datasets", []):
        meta["datasets"].append(out_ds)
    meta.setdefault("layout", {})[out_ds] = {
        "grid": "merc", "bands": 1, "nodata": nodata}
    meta.setdefault("grids", {})["merc"] = {
        "width": out_n, "height": out_n, "tile": t}
    with open(marker, "w") as f:
        json.dump(meta, f)

    parts = (ray.data.range(per_tile * per_tile)
             .map_batches(as_task_fn(
                 _WarpKernel, world_path=world_path, dataset=dataset,
                 grid=grid, out_n=out_n, tile=t,
                 out_dataset=f"{dataset}_merc", nodata=nodata),
                 batch_format="pyarrow", batch_size=8)
             .map_batches(functools.partial(write_sum, out_dir=out_dir),
                          batch_format="pyarrow")
             .to_pandas())
    return pd.DataFrame([{
        "out_n": np.int64(out_n),
        "n_tiles": np.int64(parts["n_tiles"].sum()),
        "payload_sum": np.int64(parts["payload_sum"].sum()),
        "md5_sum": np.int64(parts["md5_sum"].to_numpy()
                            .sum(dtype=np.int64))}])




# ------------------------------------------------------ bilinear upsample

def upsample_bilinear(world_path: str, dataset: str = "kg",
                      k: int = 3, *, hole_value: int | None = None,
                      batch_size: int = 32) -> pd.DataFrame:
    """(value, n_px) histogram of the k×-finer BILINEAR resample — the
    interpolating member of the GDAL resampler family the engine now
    covers end-to-end (near = warp, majority = pyramid overviews,
    box/area = downsample, bilinear here). All-integer: output pixel
    (yo, xo) maps to source position ((2·yo+1−k)/(2k), ·); the four
    stencil weights are the integer products (2k−ry)(2k−rx) etc. with
    denominator (2k)², and the output value is the FLOOR division of
    the weighted sum (GDAL's round differs by at most the usual ±½;
    floor keeps the arithmetic exact and oracle-stable). World-frame
    coordinates clamp (edge replication, as gdalwarp does); a stencil
    touching a nodata source pixel WITH NONZERO WEIGHT emits nodata
    (reported under value −1). Absent (sparse) tiles are nodata.

    Distributed shape: output pixels partition by the source tile
    that owns their stencil anchor, so this is the focal discipline —
    one shuffle-free pass over present source tiles with a 1-px
    derived-ref halo; each batch emits a ≤257-row histogram partial.
    The bit-exactness vs ``oracle.upsample_bilinear_oracle`` is
    structural: a pure per-output-pixel integer function of the
    halo."""
    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    nodata = int(layout[dataset]["nodata"])
    hole = nodata if hole_value is None else int(hole_value)
    if k < 1:
        raise ValueError("k must be >= 1")
    from .hydro import _present_tiles
    present = _present_tiles(world_path, dataset, grid)
    kk = int(k)

    from ..datapipe.util import as_task_fn

    class _Bilinear:
        def __init__(self):
            self.media = MediaStore(world_path)
            self.grid = world_grid(world_path, layout[dataset]["grid"])

        def _dims(self, ty, tx):
            g = self.grid
            return (min(g.tile, g.height - ty * g.tile),
                    min(g.tile, g.width - tx * g.tile))

        def __call__(self, b: pa.Table) -> pa.Table:
            from .hydro import _assemble_pad
            g = self.grid
            t = g.tile
            ids = b["id"].to_numpy(zero_copy_only=False)
            plans, want = [], set()
            for pid in ids:
                ty, tx = int(pid) // g.tiles_x, int(pid) % g.tiles_x
                nbrs = {}
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        ny, nx = ty + dy, tx + dx
                        if 0 <= ny < g.tiles_y and 0 <= nx < g.tiles_x:
                            r = model.media_ref(dataset, g.name,
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
                pad = _assemble_pad(payloads, nbrs, nr, nc, self._dims,
                                    hole)
                # world-frame clamp: replicate the tile's own edge
                if ty == 0:
                    pad[0, 1:-1] = pad[1, 1:-1]
                if ty * t + nr == g.height:
                    pad[-1, 1:-1] = pad[-2, 1:-1]
                if tx == 0:
                    pad[1:-1, 0] = pad[1:-1, 1]
                if tx * t + nc == g.width:
                    pad[1:-1, -1] = pad[1:-1, -2]
                for (cy, cx), (sy, sx) in (((0, 0), (1, 1)),
                                           ((0, -1), (1, -2)),
                                           ((-1, 0), (-2, 1)),
                                           ((-1, -1), (-2, -2))):
                    if pad[cy, cx] == hole:
                        oy = (ty == 0) if cy == 0 else \
                            (ty * t + nr == g.height)
                        ox = (tx == 0) if cx == 0 else \
                            (tx * t + nc == g.width)
                        if oy and ox:
                            pad[cy, cx] = pad[sy, sx]
                        elif oy:
                            pad[cy, cx] = pad[sy, cx]
                        elif ox:
                            pad[cy, cx] = pad[cy, sx]
                V = pad.astype(np.int64)
                P = pad != hole
                yo = np.arange(nr * kk, dtype=np.int64) + ty * t * kk
                xo = np.arange(nc * kk, dtype=np.int64) + tx * t * kk
                ny_ = 2 * yo + 1 - kk
                nx_ = 2 * xo + 1 - kk
                fy = ny_ // (2 * kk)
                fx = nx_ // (2 * kk)
                ry = ny_ - fy * 2 * kk
                rx = nx_ - fx * 2 * kk
                ly = fy - ty * t + 1
                lx = fx - tx * t + 1
                iy = np.ix_(ly, lx)
                iy1 = np.ix_(ly + 1, lx)
                ix1 = np.ix_(ly, lx + 1)
                iy1x1 = np.ix_(ly + 1, lx + 1)
                wy = (2 * kk - ry)[:, None]
                wx = (2 * kk - rx)[None, :]
                ry2 = ry[:, None]
                rx2 = rx[None, :]
                num = (V[iy] * (wy * wx) + V[ix1] * (wy * rx2)
                       + V[iy1] * (ry2 * wx) + V[iy1x1] * (ry2 * rx2))
                out = num // (4 * kk * kk)
                ok = (((P[iy]) | (wy * wx == 0))
                      & ((P[ix1]) | (wy * rx2 == 0))
                      & ((P[iy1]) | (ry2 * wx == 0))
                      & ((P[iy1x1]) | (ry2 * rx2 == 0)))
                vals = np.where(ok, out, np.int64(-1))
                u, n = np.unique(vals, return_counts=True)
                for v, cnt in zip(u.tolist(), n.tolist()):
                    hist[v] = hist.get(v, 0) + cnt
            keys = sorted(hist)
            return pa.table({
                "value": pa.array(keys, pa.int64()),
                "n_px": pa.array([hist[kx] for kx in keys],
                                 pa.int64())})

    from ray.data.aggregate import Sum
    fn = as_task_fn(_Bilinear)
    out = (ray.data.from_items([{"id": int(i)} for i in present])
           .map_batches(fn, batch_format="pyarrow",
                        batch_size=batch_size)
           .groupby("value")
           .aggregate(Sum("n_px", alias_name="n_px"))
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("value").reset_index(drop=True)
