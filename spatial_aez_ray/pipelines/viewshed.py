"""Total viewshed / visibility index — the line-of-sight member of
the gdaldem family (GRASS ``r.viewshed`` / GDAL ``gdal_viewshed``,
aggregated over every observer: "how many cells within radius R can
each cell see?", the archaeology/siting "total viewshed" product).

Semantics (exact, all-integer). Observer p and target t are lattice
cells within Chebyshev radius R, both passable (value != nodata,
tile present). Along the segment p -> t with m = max(|dy|, |dx|),
the sample at parameter i/m (i = 1..m-1) has one integer coordinate
(the dominant axis) and one rational coordinate with denominator m;
its elevation interpolates the two straddling cells with weights
(m-r, r). t is VISIBLE from p iff every sample lies at or below the sight
line (grazing rays see through — flat terrain is fully visible):

    E_i - m*e(p)  <=  i * (e(t) - e(p))     for all i in 1..m-1

where E_i is the m-scaled interpolated sample elevation. The ray's
Euclidean length cancels from both sides, so the comparison is exact
integer arithmetic — no trigonometry, no floats, and the relation is
SYMMETRIC (substituting j = m-i gives the identical inequality), so
the global visible-pair multiset has even total count: a free parity
invariant the gate asserts. Samples touching an impassable cell
block the ray.

Scale design: visibility is a pure per-pixel function of an R-wide
halo, so this is ONE shuffle-free ``map_batches`` pass over present
tiles — the ``proximity_histogram`` discipline (wide halo assembled
from the 8 derived-ref neighbors, one batched footer-pruned fetch);
each batch emits a <=(2R+1)^2-row histogram partial and the combine
is bins-sized. Work is O(R^3) vectorized array ops per tile.

Reference parity anchor: the reference's raster taxonomy
(process_imagery.py block loops) covers local/focal/zonal/global
algebra; viewshed extends the focal family to ray-dependent
neighborhoods, expressed Ray-Data-first.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .. import model
from ..datapipe.util import as_task_fn
from ..sources.documents import MediaStore
from .extract import world_grid
from .hydro import _present_tiles


def visible_counts(pad: np.ndarray, h: int, nodata: int) -> np.ndarray:
    """Per-pixel count of visible passable cells within Chebyshev
    radius ``h`` for the interior of an ``h``-padded uint8 elevation
    array (see module docstring for the exact LOS rule). Returns an
    (nr, nc) int64 array; impassable interior pixels count 0."""
    P = pad != nodata
    E = pad.astype(np.int64)
    nr, nc = pad.shape[0] - 2 * h, pad.shape[1] - 2 * h

    def sh(dy: int, dx: int) -> tuple[slice, slice]:
        return (slice(h + dy, h + dy + nr), slice(h + dx, h + dx + nc))

    e0 = E[sh(0, 0)]
    p0 = P[sh(0, 0)]
    cnt = np.zeros((nr, nc), dtype=np.int64)
    for dy in range(-h, h + 1):
        for dx in range(-h, h + 1):
            if dy == 0 and dx == 0:
                continue
            m = max(abs(dy), abs(dx))
            tgt = sh(dy, dx)
            vis = p0 & P[tgt]
            dz = E[tgt] - e0
            for i in range(1, m):
                ny, ry = divmod(dy * i, m)
                nx, rx = divmod(dx * i, m)
                if ry == 0 and rx == 0:
                    ei_m = E[sh(ny, nx)] * m
                    ok = P[sh(ny, nx)]
                elif ry != 0:  # dominant axis x: interpolate along y
                    a, b = sh(ny, nx), sh(ny + 1, nx)
                    ei_m = E[a] * (m - ry) + E[b] * ry
                    ok = P[a] & P[b]
                else:          # dominant axis y: interpolate along x
                    a, b = sh(ny, nx), sh(ny, nx + 1)
                    ei_m = E[a] * (m - rx) + E[b] * rx
                    ok = P[a] & P[b]
                vis &= ok & (ei_m - m * e0 <= i * dz)
            cnt += vis
    cnt[~p0] = 0
    return cnt


class _ViewKernel:
    """Tile-batch LOS kernel: assembles each tile's R-wide halo from
    the 8 derived-ref neighbors (one batched footer-pruned fetch per
    batch), runs ``visible_counts``, and emits histogram partials —
    global (n_vis, n_px) rows, or per-tile rows with ``per_tile``."""

    def __init__(self, world_path: str, dataset: str, layout: dict,
                 hole: int, h: int, per_tile: bool = False):
        self.media = MediaStore(world_path)
        self.grid = world_grid(world_path, layout[dataset]["grid"])
        self.dataset = dataset
        self.hole = hole
        self.h = h
        self.per_tile = per_tile

    def _arr(self, ty, tx, payloads):
        g = self.grid
        if not (0 <= ty < g.tiles_y and 0 <= tx < g.tiles_x):
            return None
        p = payloads.get(model.media_ref(self.dataset, g.name, ty, tx, 1))
        if p is None:
            return None
        _, _, nc, nr = g.tile_window(ty, tx)
        return np.frombuffer(p, np.uint8, count=nr * nc).reshape(nr, nc)

    def __call__(self, batch: pa.Table) -> pa.Table:
        g = self.grid
        h = self.h
        ids = batch["id"].to_numpy(zero_copy_only=False)
        tiles = [(int(p) // g.tiles_x, int(p) % g.tiles_x)
                 for p in ids]
        want = set()
        for ty, tx in tiles:
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ny, nx = ty + dy, tx + dx
                    if 0 <= ny < g.tiles_y and 0 <= nx < g.tiles_x:
                        want.add(model.media_ref(
                            self.dataset, g.name, ny, nx, 1))
        payloads = self.media.fetch(sorted(want), strict=False)
        o_tile: list[int] = []
        o_vis: list[int] = []
        o_n: list[int] = []
        hist: dict[int, int] = {}
        for ty, tx in tiles:
            me = self._arr(ty, tx, payloads)
            if me is None:
                continue
            nr, nc = me.shape
            pad = np.full((nr + 2 * h, nc + 2 * h), self.hole,
                          dtype=np.uint8)
            pad[h:h + nr, h:h + nc] = me
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dy == 0 and dx == 0:
                        continue
                    nb = self._arr(ty + dy, tx + dx, payloads)
                    if nb is None:
                        continue
                    hh, ww = nb.shape
                    rs = (slice(max(0, hh - h), hh) if dy < 0
                          else slice(0, min(h, hh)) if dy > 0
                          else slice(0, hh))
                    cs = (slice(max(0, ww - h), ww) if dx < 0
                          else slice(0, min(h, ww)) if dx > 0
                          else slice(0, ww))
                    sub = nb[rs, cs]
                    pr = (slice(h - sub.shape[0], h) if dy < 0
                          else slice(h + nr, h + nr + sub.shape[0])
                          if dy > 0 else slice(h, h + sub.shape[0]))
                    pc_ = (slice(h - sub.shape[1], h) if dx < 0
                           else slice(h + nc, h + nc + sub.shape[1])
                           if dx > 0 else slice(h, h + sub.shape[1]))
                    pad[pr, pc_] = sub
            cnt = visible_counts(pad, h, self.hole)
            passable = me != self.hole
            u, n = np.unique(cnt[passable], return_counts=True)
            if self.per_tile:
                tid = ty * g.tiles_x + tx
                o_tile.extend([tid] * len(u))
                o_vis.extend(u.tolist())
                o_n.extend(n.tolist())
            else:
                for v, k in zip(u.tolist(), n.tolist()):
                    hist[v] = hist.get(v, 0) + k
        if self.per_tile:
            return pa.table({
                "tile_id": pa.array(o_tile, pa.int64()),
                "n_vis": pa.array(o_vis, pa.int64()),
                "n_px": pa.array(o_n, pa.int64())})
        keys = sorted(hist)
        return pa.table({
            "n_vis": pa.array(keys, pa.int64()),
            "n_px": pa.array([hist[k] for k in keys], pa.int64())})


def visibility_histogram(world_path: str, dataset: str = "kg",
                         radius: int = 4, *,
                         hole_value: int | None = None,
                         batch_size: int = 16) -> pd.DataFrame:
    """(n_visible, n_px) histogram of the per-pixel visibility index
    over every passable present-tile pixel — bit-exact vs the
    whole-array ``oracle.viewshed_oracle`` (the per-pixel function is
    deterministic; the gate proves the R-halo tile decomposition,
    including short edge tiles and hole neighbors, matches the global
    computation)."""
    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    nodata = int(layout[dataset]["nodata"])
    hole = nodata if hole_value is None else int(hole_value)
    if radius > grid.tile:
        raise ValueError(f"radius {radius} exceeds tile size "
                         f"{grid.tile}; widen the halo assembly first")
    present = _present_tiles(world_path, dataset, grid)
    h = int(radius)

    from ray.data.aggregate import Sum
    fn = as_task_fn(_ViewKernel, world_path=world_path, dataset=dataset,
                    layout=layout, hole=hole, h=h, per_tile=False)
    out = (ray.data.from_items([{"id": int(i)} for i in present])
           .map_batches(fn, batch_format="pyarrow",
                        batch_size=batch_size)
           .groupby("n_vis")
           .aggregate(Sum("n_px", alias_name="n_px"))
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("n_vis").reset_index(drop=True)


def visibility_tile_partials(world_path: str, dataset: str = "kg",
                             radius: int = 4, *,
                             tile_ids: list[int] | None = None,
                             hole_value: int | None = None,
                             batch_size: int = 16) -> pd.DataFrame:
    """Per-tile (tile_id, n_vis, n_px) histogram partial rows — the
    cacheable form of ``visibility_histogram`` (visibility is a pure
    function of a tile's R-halo, so a tile's partial is invalidated
    ONLY by changes within Chebyshev distance 1 of it — the basis of
    ``visibility_incremental``). ``tile_ids`` restricts the pass."""
    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    nodata = int(layout[dataset]["nodata"])
    hole = nodata if hole_value is None else int(hole_value)
    if radius > grid.tile:
        raise ValueError("radius exceeds tile size")
    present = _present_tiles(world_path, dataset, grid)
    if tile_ids is not None:
        want = set(int(i) for i in tile_ids)
        present = [i for i in present if i in want]
    if not present:
        return pd.DataFrame({"tile_id": pd.Series([], dtype=np.int64),
                             "n_vis": pd.Series([], dtype=np.int64),
                             "n_px": pd.Series([], dtype=np.int64)})
    h = int(radius)
    fn = as_task_fn(_ViewKernel, world_path=world_path, dataset=dataset,
                    layout=layout, hole=hole, h=h, per_tile=True)
    out = (ray.data.from_items([{"id": int(i)} for i in present])
           .map_batches(fn, batch_format="pyarrow",
                        batch_size=batch_size)
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["tile_id", "n_vis"])
            .reset_index(drop=True))


def visibility_incremental(world_a: str, world_b: str,
                           dataset: str = "kg", radius: int = 4, *,
                           partials_a: pd.DataFrame | None = None,
                           hole_value: int | None = None):
    """Maintain the visibility histogram across a world edit without
    a full re-scan: visibility is R-halo-local, so a changed /
    added / removed tile invalidates ONLY itself and its 8 neighbors.
    Diff the two versions (derived-ref compare, shuffle-free),
    recompute partials for the affected present tiles of ``world_b``,
    splice them over the cached per-tile partials of ``world_a``, and
    re-fold the bins-sized histogram. Returns (histogram, report);
    bit-equal to the full recompute because per-tile partials are
    order-free integer rows. At 100 TB the splice is an anti-join on
    tile_id over the partials Dataset; the recompute pass is already
    restricted to the affected tiles."""
    from .pyramid import diff_worlds

    layout = model.world_layout(world_b)
    grid = world_grid(world_b, layout[dataset]["grid"])
    if partials_a is None:
        partials_a = visibility_tile_partials(world_a, dataset, radius,
                                              hole_value=hole_value)
    diff = diff_worlds(world_a, world_b, dataset)
    changed = set()
    for ty, tx in zip(diff["tile_y"], diff["tile_x"]):
        changed.add(int(ty) * grid.tiles_x + int(tx))
    affected = set()
    for tid in changed:
        ty, tx = tid // grid.tiles_x, tid % grid.tiles_x
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ny, nx = ty + dy, tx + dx
                if 0 <= ny < grid.tiles_y and 0 <= nx < grid.tiles_x:
                    affected.add(ny * grid.tiles_x + nx)
    present_b = set(_present_tiles(world_b, dataset, grid))
    recompute = sorted(affected & present_b)
    fresh = visibility_tile_partials(world_b, dataset, radius,
                                     tile_ids=recompute,
                                     hole_value=hole_value)
    kept = partials_a[~partials_a["tile_id"].isin(affected)]
    spliced = pd.concat([kept, fresh], ignore_index=True)
    hist = (spliced.groupby("n_vis", as_index=False)["n_px"].sum()
            .astype(np.int64)
            .sort_values("n_vis").reset_index(drop=True))
    report = {"tiles_changed": len(changed),
              "tiles_recomputed": len(recompute)}
    return hist, report


# ------------------------------------------------------ contour crossings

def contour_crossings(world_path: str, dataset: str = "kg",
                      interval: int = 16, *,
                      hole_value: int | None = None,
                      batch_size: int = 32) -> pd.DataFrame:
    """(level, n_edges) histogram of contour crossings — the
    ``gdal_contour`` product reduced to its verifiable summary: for
    every 4-adjacent passable pixel pair, each contour level L (in
    units of ``interval``) strictly between the two bucket values is
    crossed once, so n_edges(L) is the lattice length of the L-th
    isoline. Edges are owned by their left/top pixel (each counted
    exactly once globally — the adjacency discipline); per tile the
    level expansion is a difference array + cumsum, O(edges + 256).
    One shuffle-free pass with a 1-px derived-ref halo; bit-exact vs
    ``oracle.contour_oracle``."""
    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    nodata = int(layout[dataset]["nodata"])
    hole = nodata if hole_value is None else int(hole_value)
    present = _present_tiles(world_path, dataset, grid)
    ival = int(interval)

    class _Contour:
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
            diff = np.zeros(258, dtype=np.int64)
            for ty, tx, nbrs in plans:
                if payloads.get(nbrs[(0, 0)][2]) is None:
                    continue
                nr, nc = self._dims(ty, tx)
                pad = _assemble_pad(payloads, nbrs, nr, nc,
                                    self._dims, hole)
                V = (pad.astype(np.int64)) // ival
                P = pad != hole
                for (sa, sb) in (
                        ((slice(1, 1 + nr), slice(1, 1 + nc)),
                         (slice(1, 1 + nr), slice(2, 2 + nc))),
                        ((slice(1, 1 + nr), slice(1, 1 + nc)),
                         (slice(2, 2 + nr), slice(1, 1 + nc)))):
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
            return pa.table({
                "level": pa.array(nz.astype(np.int64)),
                "n_edges": pa.array(lvl[nz].astype(np.int64))})

    from ray.data.aggregate import Sum
    from ..datapipe.util import as_task_fn
    fn = as_task_fn(_Contour)
    out = (ray.data.from_items([{"id": int(i)} for i in present])
           .map_batches(fn, batch_format="pyarrow",
                        batch_size=batch_size)
           .groupby("level")
           .aggregate(Sum("n_edges", alias_name="n_edges"))
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("level").reset_index(drop=True)


def zonal_visibility_stats(world_path: str, dataset: str = "kg",
                           radius: int = 4, *,
                           hole_value: int | None = None,
                           batch_size: int = 16) -> pd.DataFrame:
    """Per-admin (n_px, sum, min, max) of the visibility index — the
    'visual exposure per country' product (siting / landscape-impact
    assessments), composing the LOS kernel with the zonal PIP claims
    exactly like ``zonal_window_stats`` does for focal metrics:
    order-free int64 per-admin partials, double-claim parity, one
    shuffle-free pass. mean = sum/n_px left to the caller."""
    from .extract import build_zonal_index

    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    nodata = int(layout[dataset]["nodata"])
    hole = nodata if hole_value is None else int(hole_value)
    if radius > grid.tile:
        raise ValueError("radius exceeds tile size")
    present = _present_tiles(world_path, dataset, grid)
    h = int(radius)
    index = build_zonal_index(world_path)

    class _ZonalView(_ViewKernel):
        def __init__(self):
            super().__init__(world_path, dataset, layout, hole, h)
            self.index = index

        def __call__(self, batch: pa.Table) -> pa.Table:
            g = self.grid
            ids = batch["id"].to_numpy(zero_copy_only=False)
            tiles = [(int(p) // g.tiles_x, int(p) % g.tiles_x)
                     for p in ids]
            want = set()
            for ty, tx in tiles:
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        ny, nx = ty + dy, tx + dx
                        if 0 <= ny < g.tiles_y and 0 <= nx < g.tiles_x:
                            want.add(model.media_ref(
                                self.dataset, g.name, ny, nx, 1))
            payloads = self.media.fetch(sorted(want), strict=False)
            acc: dict[str, list] = {}
            for ty, tx in tiles:
                me = self._arr(ty, tx, payloads)
                if me is None:
                    continue
                nr, nc = me.shape
                pad = np.full((nr + 2 * h, nc + 2 * h), self.hole,
                              dtype=np.uint8)
                pad[h:h + nr, h:h + nc] = me
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        if dy == 0 and dx == 0:
                            continue
                        nb = self._arr(ty + dy, tx + dx, payloads)
                        if nb is None:
                            continue
                        hh, ww = nb.shape
                        rs = (slice(max(0, hh - h), hh) if dy < 0
                              else slice(0, min(h, hh)) if dy > 0
                              else slice(0, hh))
                        cs = (slice(max(0, ww - h), ww) if dx < 0
                              else slice(0, min(h, ww)) if dx > 0
                              else slice(0, ww))
                        sub = nb[rs, cs]
                        pr = (slice(h - sub.shape[0], h) if dy < 0
                              else slice(h + nr, h + nr + sub.shape[0])
                              if dy > 0 else slice(h, h + sub.shape[0]))
                        pc_ = (slice(h - sub.shape[1], h) if dx < 0
                               else slice(h + nc,
                                          h + nc + sub.shape[1])
                               if dx > 0 else slice(h, h + sub.shape[1]))
                        pad[pr, pc_] = sub
                cnt = visible_counts(pad, h, self.hole)
                passable = me != self.hole
                for _fidx, admin, mask in self.index.assign_tile(
                        g, ty, tx):
                    vals = cnt[mask & passable]
                    if not len(vals):
                        continue
                    row = [len(vals), int(vals.sum()),
                           int(vals.min()), int(vals.max())]
                    cur = acc.get(admin)
                    if cur is None:
                        acc[admin] = row
                    else:
                        cur[0] += row[0]
                        cur[1] += row[1]
                        cur[2] = min(cur[2], row[2])
                        cur[3] = max(cur[3], row[3])
            admins = sorted(acc)
            cols = (np.array([acc[a] for a in admins], dtype=np.int64)
                    if admins else np.zeros((0, 4), dtype=np.int64))
            return pa.table({
                "admin": pa.array(admins, pa.string()),
                "n_px": pa.array(cols[:, 0]),
                "sum": pa.array(cols[:, 1]),
                "min": pa.array(cols[:, 2]),
                "max": pa.array(cols[:, 3])})

    from ray.data.aggregate import Max, Min, Sum
    fn = as_task_fn(_ZonalView)
    out = (ray.data.from_items([{"id": int(i)} for i in present])
           .map_batches(fn, batch_format="pyarrow",
                        batch_size=batch_size)
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


def raster_profile(world_path: str, dataset: str,
                   p0: tuple[int, int], p1: tuple[int, int], *,
                   hole_value: int | None = None) -> pd.DataFrame:
    """Values along the transect p0 -> p1 (the gdallocationinfo /
    elevation-profile product): lattice samples on the segment at
    every dominant-axis step (the viewshed interpolation geometry —
    the non-dominant coordinate ROUNDS to the nearest cell, ties
    toward the smaller index). Returns (step, gy, gx, value) with
    value −1 for nodata / absent-tile samples.

    Scale shape: the sample coordinates are derived on the driver
    (O(profile length) tiny rows), grouped by owning tile, and each
    touched tile is fetched ONCE by derived ref — a point-lookup
    gather, never a scan."""
    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    nodata = int(layout[dataset]["nodata"])
    hole = nodata if hole_value is None else int(hole_value)
    y0, x0 = int(p0[0]), int(p0[1])
    y1, x1 = int(p1[0]), int(p1[1])
    for (y, x) in ((y0, x0), (y1, x1)):
        if not (0 <= y < grid.height and 0 <= x < grid.width):
            raise ValueError("profile endpoint outside the world")
    dy, dx = y1 - y0, x1 - x0
    m = max(abs(dy), abs(dx))
    i = np.arange(m + 1, dtype=np.int64)
    if m == 0:
        gy = np.array([y0], dtype=np.int64)
        gx = np.array([x0], dtype=np.int64)
    else:
        # nearest-cell rounding of the rational coordinate (ties to
        # the smaller index): floor((2*num + m) / (2*m))
        gy = (2 * (y0 * m + dy * i) + m) // (2 * m)
        gx = (2 * (x0 * m + dx * i) + m) // (2 * m)
    t = grid.tile
    ty = gy // t
    tx = gx // t
    media = MediaStore(world_path)
    refs = sorted({model.media_ref(dataset, grid.name, int(a), int(b), 1)
                   for a, b in zip(ty, tx)})
    payloads = media.fetch(refs, strict=False)
    vals = np.full(len(gy), np.int64(-1))
    for r in refs:
        p = payloads.get(r)
        if p is None:
            continue
        parts = r.split("/")
        rty, rtx = int(parts[-3]), int(parts[-2])
        nr = min(t, grid.height - rty * t)
        nc = min(t, grid.width - rtx * t)
        arr = np.frombuffer(p, np.uint8, count=nr * nc).reshape(nr, nc)
        sel = (ty == rty) & (tx == rtx)
        v = arr[gy[sel] - rty * t, gx[sel] - rtx * t].astype(np.int64)
        vals[sel] = np.where(v == hole, np.int64(-1), v)
    return pd.DataFrame({"step": i, "gy": gy, "gx": gx,
                         "value": vals})


# -------------------------------------------------------- raster calc

#: raster_calc expression whitelist: variable names, ints, arithmetic,
#: comparisons, bitwise combinators and parens — the gdal_calc surface
_CALC_TOKEN = re.compile(r"^[A-Z0-9+\-*/%()<>=&|~ ]+$")


def raster_calc(world_path: str, expr: str,
                variables: dict[str, str], *,
                hole_value: int | None = None,
                batch_size: int = 32) -> pd.DataFrame:
    """(value, n_px) histogram of an arbitrary LOCAL map-algebra
    expression over aligned datasets — the ``gdal_calc.py`` product
    (band math). ``variables`` maps expression names (A, B, ...) to
    dataset names; all datasets must share a grid (the J4 align-join
    precondition), and sibling payloads are DERIVED from the tile key
    — one batched fetch per batch, no shuffle. Expressions evaluate
    vectorized over int64 arrays (comparisons yield 0/1), e.g.
    ``"(A >= 14) * B"``; a pixel where ANY input is nodata (or any
    tile absent) is excluded and reported under value −1. The
    expression grammar is the whitelisted arithmetic/comparison/
    bitwise subset — validated before evaluation."""
    if not _CALC_TOKEN.match(expr):
        raise ValueError("raster_calc expression uses disallowed "
                         f"characters: {expr!r}")
    for name in variables:
        if not re.match(r"^[A-Z]$", name):
            raise ValueError(f"variable names are single capitals: {name}")
    layout = model.world_layout(world_path)
    grids = {layout[d]["grid"] for d in variables.values()}
    if len(grids) != 1:
        raise ValueError(f"raster_calc inputs must share a grid: {grids}")
    grid = world_grid(world_path, next(iter(grids)))
    nodatas = {n: int(layout[d]["nodata"])
               for n, d in variables.items()}
    if hole_value is not None:
        nodatas = {n: int(hole_value) for n in nodatas}
    code = compile(expr, "<raster_calc>", "eval")
    # present tiles: a pixel needs EVERY input, so iterate the union
    # and let missing payloads mark the whole tile nodata
    present: set[int] = set()
    for d in set(variables.values()):
        present.update(_present_tiles(world_path, d, grid))
    names = sorted(variables)

    class _Calc:
        def __init__(self):
            self.media = MediaStore(world_path)
            self.grid = world_grid(world_path, next(iter(grids)))

        def __call__(self, b: pa.Table) -> pa.Table:
            g = self.grid
            ids = b["id"].to_numpy(zero_copy_only=False)
            tiles = [(int(p) // g.tiles_x, int(p) % g.tiles_x)
                     for p in ids]
            want = set()
            for ty, tx in tiles:
                for d in set(variables.values()):
                    want.add(model.media_ref(d, g.name, ty, tx, 1))
            payloads = self.media.fetch(sorted(want), strict=False)
            hist: dict[int, int] = {}
            for ty, tx in tiles:
                nr = min(g.tile, g.height - ty * g.tile)
                nc = min(g.tile, g.width - tx * g.tile)
                arrs, ok = {}, np.ones((nr, nc), dtype=bool)
                missing = False
                for n in names:
                    d = variables[n]
                    p = payloads.get(model.media_ref(d, g.name,
                                                     ty, tx, 1))
                    if p is None:
                        missing = True
                        break
                    a = np.frombuffer(p, np.uint8,
                                      count=nr * nc).reshape(nr, nc)
                    ok &= a != nodatas[n]
                    arrs[n] = a.astype(np.int64)
                if missing:
                    hist[-1] = hist.get(-1, 0) + nr * nc
                    continue
                val = eval(code, {"__builtins__": {}}, arrs)  # noqa: S307
                val = np.asarray(val).astype(np.int64)
                out = np.where(ok, val, np.int64(-1))
                u, n_ = np.unique(out, return_counts=True)
                for v, k in zip(u.tolist(), n_.tolist()):
                    hist[v] = hist.get(v, 0) + k
            keys = sorted(hist)
            return pa.table({
                "value": pa.array(keys, pa.int64()),
                "n_px": pa.array([hist[k] for k in keys], pa.int64())})

    from ray.data.aggregate import Sum
    fn = as_task_fn(_Calc)
    out = (ray.data.from_items([{"id": int(i)} for i in
                                sorted(present)])
           .map_batches(fn, batch_format="pyarrow",
                        batch_size=batch_size)
           .groupby("value")
           .aggregate(Sum("n_px", alias_name="n_px"))
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("value").reset_index(drop=True)
