"""D8 flow accumulation — the hydrology half of the gdaldem family
(focal_flowdir -> flow accumulation; the ESRI/TauDEM Flow Accumulation
product). The reference's raster taxonomy covers local, focal, zonal
and regional algebra (process_imagery.py block loops, our focal/zonal
kernels); flow accumulation is the remaining GLOBAL-dependency member:
a pixel's value depends on an unbounded upstream region, so no fixed
halo width can serve it.

Semantics (exact, all-integer):
* flow direction per pixel = ``pyramid.flowdir_codes`` over the same
  1-px-halo pad the focal family uses (absent neighbor tiles pad with
  the hole value, hole tiles emit nothing);
* ``acc[p]`` = number of pixels whose D8 path reaches ``p`` (not
  counting ``p``); flux into a hole tile, off the world frame, or
  stopped at a code-0 pit is dropped;
* D8 steps are strictly downhill (drop > 0), so over uint8 elevations
  every path has <= 255 edges — the seam fixpoint below terminates in
  <= 255 rounds (typically 2-4: classification-style rasters pit
  almost immediately).

Scale design — seam-flux delta iteration (block-Jacobi over tiles):
* Each round is ONE shuffle-free ``map_batches`` pass over exactly the
  tiles whose INFLOW changed (round 0: all tiles). Per tile the kernel
  assembles the focal halo pad (derived sibling refs, one batched
  footer-pruned fetch), computes flow directions, and runs an
  elevation-level-DESCENDING vectorized scatter: pixels at one level
  only feed strictly lower levels, so <= 256 ``np.add.at`` steps are
  the exact in-tile fixpoint given the current boundary inflow.
* Only SEAM FLUX rows ever leave a tile — ``(src_tile, dst_tile,
  dst_px, flux)`` for border pixels whose D8 target lies in a present
  neighbor tile, O(tile edge) rows per tile. The driver folds them
  into per-tile inflow tables and re-queues exactly the tiles whose
  inflow changed. At 100 TB the fold becomes a ``groupby(dst_tile)``
  aggregate and the inflow a co-partitioned join instead of this
  driver dict + ``ray.put`` broadcast (the label_regions seam-graph
  precedent); the round structure is unchanged.
* The final pass re-runs every present tile once with the converged
  inflow and emits (acc, n_px) histogram partials — pixel arrays never
  leave the workers.

Reference parity anchor: the reference's rasters are the DEM-derived
slope products (prepare_slope_tiles.py); flow accumulation is the
standard next derivative of the same inputs, expressed Ray-Data-first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .. import model
from ..datapipe.util import as_task_fn
from ..sources.documents import MediaStore
from . import seamdist
from .extract import world_grid
from .pyramid import flowdir_codes

# ESRI D8 code -> (dy, dx), y down; code 0 (pit) stays put.
_D8 = {1: (0, 1), 2: (1, 1), 4: (1, 0), 8: (1, -1),
       16: (0, -1), 32: (-1, -1), 64: (-1, 0), 128: (-1, 1)}
_DY = np.zeros(256, dtype=np.int64)
_DX = np.zeros(256, dtype=np.int64)
for _c, (_dy, _dx) in _D8.items():
    _DY[_c] = _dy
    _DX[_c] = _dx

#: a strictly-downhill path over uint8 elevations has <= 255 edges, so
#: flux can cross at most 255 seams; +2 slack for the all-tiles round
#: and the empty fixpoint round.
MAX_ROUNDS = 257


def _pack_inflow_arrays(inflow: dict) -> dict:
    """{tile: {px: v}} (or {px: (v1, v2)}) -> {tile: tuple of int64
    arrays}: the per-round broadcast then ships numpy buffers instead
    of ~1e5 boxed Python ints — ray.put + per-worker ray.get of the
    nested dict measured ~0.5 s per big round on the bench world's
    cost fixpoint; the array form is near-free. Scatter targets are
    unique per tile, so consumption order is irrelevant and results
    are bit-identical."""
    out = {}
    for t, d in inflow.items():
        if not d:
            continue
        if isinstance(d, tuple):
            out[t] = d
            continue
        idx = np.fromiter(d.keys(), np.int64, len(d))
        first = next(iter(d.values()))
        if isinstance(first, tuple):
            out[t] = (idx,
                      np.fromiter((v[0] for v in d.values()),
                                  np.int64, len(d)),
                      np.fromiter((v[1] for v in d.values()),
                                  np.int64, len(d)))
        else:
            out[t] = (idx, np.fromiter(d.values(), np.int64, len(d)))
    return out


def _inflow_arrays(inf):
    """(idx, val) int64 arrays from either the packed broadcast form
    or a plain {px: v} dict (the seamdist work-column delivery);
    None when empty."""
    if not inf:
        return None
    if isinstance(inf, tuple):
        return inf if len(inf[0]) else None
    return (np.fromiter(inf.keys(), np.int64, len(inf)),
            np.fromiter(inf.values(), np.int64, len(inf)))


def _inflow_arrays3(inf):
    """(idx, v1, v2) for the strahler (max-order, count) inflow."""
    if not inf:
        return None
    if isinstance(inf, tuple):
        return inf if len(inf[0]) else None
    return (np.fromiter(inf.keys(), np.int64, len(inf)),
            np.fromiter((v[0] for v in inf.values()), np.int64,
                        len(inf)),
            np.fromiter((v[1] for v in inf.values()), np.int64,
                        len(inf)))


def _assemble_pad(payloads: dict, nbrs: dict, nr: int, nc: int,
                  dims, hole: int) -> np.ndarray:
    """(nr+2, nc+2) focal halo pad for one tile from the batch's
    fetched neighbor payloads; absent neighbors stay at the hole
    value (shared by the accumulation and watershed kernels)."""
    pad = np.full((nr + 2, nc + 2), hole, dtype=np.uint8)
    for (dy, dx), (ny, nx, r) in nbrs.items():
        p = payloads.get(r)
        if p is None:
            continue
        hh, ww = dims(ny, nx)
        arr = np.frombuffer(p, np.uint8, count=hh * ww).reshape(hh, ww)
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
    return pad


class _FlowTiles:
    """Seam-flux / histogram kernel over tile-id batches (see module
    docstring). ``inflow_ref`` is a plasma ref of
    ``{tile_id: {px_flat: flux}}``; ``final`` switches the output from
    seam-flux rows to (acc, n_px) histogram partials."""

    def __init__(self, world_path: str, dataset: str, hole: int,
                 inflow_ref, final: bool):
        self.media = MediaStore(world_path)
        layout = model.world_layout(world_path)
        self.grid = world_grid(world_path, layout[dataset]["grid"])
        self.dataset = dataset
        self.hole = hole
        self.final = final
        self.inflow = ray.get(inflow_ref) if inflow_ref is not None else {}

    def _dims(self, ty: int, tx: int) -> tuple[int, int]:
        g = self.grid
        return (min(g.tile, g.height - ty * g.tile),
                min(g.tile, g.width - tx * g.tile))

    def __call__(self, b: pa.Table) -> pa.Table:
        g = self.grid
        t = g.tile
        ids = b["id"].to_numpy(zero_copy_only=False)
        # distributed mode: inflow arrives as list columns in the work
        # batch (seamdist co-partitioned delivery), not the broadcast
        batch_inflow = seamdist.unpack_inflow(b, "in")
        inflow = self.inflow if batch_inflow is None else batch_inflow
        plans, want = [], set()
        for pid in ids:
            ty, tx = int(pid) // g.tiles_x, int(pid) % g.tiles_x
            nbrs = {}
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ny, nx = ty + dy, tx + dx
                    if 0 <= ny < g.tiles_y and 0 <= nx < g.tiles_x:
                        r = model.media_ref(self.dataset, g.name, ny, nx, 1)
                        nbrs[(dy, dx)] = (ny, nx, r)
                        want.add(r)
            plans.append((ty, tx, nbrs))
        payloads = self.media.fetch(sorted(want), strict=False)

        out_src: list[np.ndarray] = []
        out_dst: list[np.ndarray] = []
        out_px: list[np.ndarray] = []
        out_flux: list[np.ndarray] = []
        hist: dict[int, int] = {}
        for ty, tx, nbrs in plans:
            me = payloads.get(nbrs[(0, 0)][2])
            if me is None:
                continue
            nr, nc = self._dims(ty, tx)
            pad = _assemble_pad(payloads, nbrs, nr, nc, self._dims,
                                self.hole)
            code = flowdir_codes(pad).ravel()
            elev = pad[1:-1, 1:-1].astype(np.int64).ravel()
            rr = np.repeat(np.arange(nr, dtype=np.int64), nc)
            cc = np.tile(np.arange(nc, dtype=np.int64), nr)
            tr = rr + _DY[code]
            tc = cc + _DX[code]
            flows = code != 0
            intile = (flows & (tr >= 0) & (tr < nr)
                      & (tc >= 0) & (tc < nc))
            tgt_flat = tr * nc + tc  # meaningful only where intile

            # cross-seam targets: at most 1 px away, so the dst tile is
            # one of the 8 fetched neighbors — presence from payloads.
            pres33 = np.zeros((3, 3), dtype=bool)
            for (dy, dx), (_ny, _nx, r) in nbrs.items():
                pres33[dy + 1, dx + 1] = payloads.get(r) is not None
            gy = ty * t + tr
            gx = tx * t + tc
            sel = np.flatnonzero(flows & ~intile
                                 & (gy >= 0) & (gy < g.height)
                                 & (gx >= 0) & (gx < g.width))
            if len(sel):
                nty = gy[sel] // t
                ntx_ = gx[sel] // t
                sel = sel[pres33[nty - ty + 1, ntx_ - tx + 1]]
            if len(sel):
                nty = gy[sel] // t
                ntx_ = gx[sel] // t
                dst_w = np.minimum(t, g.width - ntx_ * t)
                dst_tile = nty * g.tiles_x + ntx_
                dst_px = (gy[sel] - nty * t) * dst_w + (gx[sel] - ntx_ * t)
            else:
                dst_tile = dst_px = np.zeros(0, dtype=np.int64)
            out_pos = np.full(len(code), -1, dtype=np.int64)
            out_pos[sel] = np.arange(len(sel))
            outmask = out_pos >= 0

            acc = np.zeros(nr * nc, dtype=np.int64)
            inf = _inflow_arrays(inflow.get(ty * g.tiles_x + tx))
            if inf is not None:
                idx, val = inf
                acc[idx] += val
            flux_out = np.zeros(len(sel), dtype=np.int64)
            # descending elevation levels: a level only feeds strictly
            # lower levels, so one sweep is the exact in-tile fixpoint
            for lvl in np.unique(elev)[::-1]:
                lv = elev == lvl
                m_in = lv & intile
                if m_in.any():
                    np.add.at(acc, tgt_flat[m_in], acc[m_in] + 1)
                m_out = lv & outmask
                if m_out.any():
                    flux_out[out_pos[m_out]] += acc[m_out] + 1

            if self.final:
                u, cnt = np.unique(acc, return_counts=True)
                for v, n in zip(u.tolist(), cnt.tolist()):
                    hist[v] = hist.get(v, 0) + n
            else:
                nz = flux_out > 0
                k = int(nz.sum())
                if k:
                    out_src.append(np.full(k, ty * g.tiles_x + tx,
                                           dtype=np.int64))
                    out_dst.append(dst_tile[nz])
                    out_px.append(dst_px[nz])
                    out_flux.append(flux_out[nz])

        if self.final:
            keys = sorted(hist)
            return pa.table({
                "acc": pa.array(keys, pa.int64()),
                "n_px": pa.array([hist[k] for k in keys], pa.int64())})
        cat = (lambda xs: np.concatenate(xs) if xs
               else np.zeros(0, dtype=np.int64))
        return pa.table({"src": pa.array(cat(out_src)),
                         "dst": pa.array(cat(out_dst)),
                         "px": pa.array(cat(out_px)),
                         "flux": pa.array(cat(out_flux))})


def _present_tiles(world_path: str, dataset: str, grid) -> list[int]:
    """Present-tile inventory: absent (sparse/ocean) tiles emit nothing
    and can never RECEIVE flow either (the seam passes filter targets
    by fetched-neighbor presence), so every round — including round 0
    and the final histogram pass — iterates only tiles that exist.
    On the global 1 km mask grid this is ~40 tiles instead of 14,365.
    The id list is tiny (one int per present tile); at 100 TB it
    stays a Dataset and rounds become a join against it."""
    from ..sources.documents import read_documents
    doc_ids = (read_documents(world_path, [dataset], columns=["doc_id"])
               .to_pandas()["doc_id"])
    parts = doc_ids.str.split("/", expand=True)
    return sorted((parts[2].astype(int) * grid.tiles_x
                   + parts[3].astype(int)).tolist())


_PX_MASK = np.int64((1 << 31) - 1)


def _segment_inflow(keys: np.ndarray, vals: np.ndarray) -> dict:
    """Aggregated (sorted packed dst<<31|px keys, values) -> the
    kernels' packed broadcast form {tile: (px_array, val_array)};
    the arrays are views into the aggregated table (no copies)."""
    if not len(keys):
        return {}
    dst = keys >> 31
    px = keys & _PX_MASK
    starts = np.flatnonzero(np.r_[True, dst[1:] != dst[:-1]])
    bounds = np.r_[starts, len(keys)]
    return {int(dst[bounds[i]]): (px[bounds[i]:bounds[i + 1]],
                                  vals[bounds[i]:bounds[i + 1]])
            for i in range(len(starts))}


def _segment_inflow3(keys: np.ndarray, v1: np.ndarray,
                     v2: np.ndarray) -> dict:
    """Three-array variant of ``_segment_inflow`` for the strahler
    (max order, count-at-max) inflow: {tile: (px, mo, k)}."""
    if not len(keys):
        return {}
    dst = keys >> 31
    px = keys & _PX_MASK
    starts = np.flatnonzero(np.r_[True, dst[1:] != dst[:-1]])
    bounds = np.r_[starts, len(keys)]
    return {int(dst[bounds[i]]): (px[bounds[i]:bounds[i + 1]],
                                  v1[bounds[i]:bounds[i + 1]],
                                  v2[bounds[i]:bounds[i + 1]])
            for i in range(len(starts))}


def _changed_dst_tiles(nk, nv, ok, ov, nv2=None, ov2=None) -> list[int]:
    """EXACT per-(key, value) symmetric diff of two aggregated seam
    tables (each sorted with unique keys): dst tiles where any key
    appeared, vanished, or changed value — the same predicate the
    dict fold's ``new_inflow.get(t) != inflow.get(t)`` evaluated.
    Pass the second value pair for two-component inflow (strahler's
    (max order, count-at-max))."""
    k = np.concatenate([nk, ok])
    v = np.concatenate([nv, ov])
    if not len(k):
        return []
    v2 = (np.concatenate([nv2, ov2]) if nv2 is not None
          else np.zeros(len(k), np.int64))
    order = np.argsort(k, kind="stable")
    k, v, v2 = k[order], v[order], v2[order]
    starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    counts = np.diff(np.r_[starts, len(k)])
    changed = counts == 1            # appeared or vanished
    two = counts == 2
    if two.any():
        i2 = starts[two]
        changed[two] = (v[i2] != v[i2 + 1]) | (v2[i2] != v2[i2 + 1])
    return sorted(int(x) for x in
                  np.unique(k[starts[changed]] >> 31))


def _driver_seam_fold(run, present_tiles, what, max_rounds, val_col,
                      reducer):
    """Vectorized driver-side seam fold shared by the SUM (flow
    accumulation) and MIN (cost/fill) fixpoints: per round the offer
    table reduces per (src, dst, px) and aggregates per (dst, px)
    entirely in numpy (lexsort + reduceat) — the former itertuples
    dict fold boxed every seam pixel as a Python int and cost
    ~0.2-0.4 s per big round at bench scale. The inflow handed back
    to ``run`` is {tile: (px_array, val_array)} (the kernels' packed
    broadcast form); change detection is the exact per-(key, value)
    diff, so pending sets — and therefore results — are identical to
    the dict fold by construction."""
    out_k: dict[int, np.ndarray] = {}
    out_v: dict[int, np.ndarray] = {}
    agg_k = np.zeros(0, np.int64)
    agg_v = np.zeros(0, np.int64)
    inflow: dict = {}
    pending = list(present_tiles)
    rounds = 0
    while pending:
        rounds += 1
        if rounds > max_rounds:
            raise AssertionError(
                f"{what} seam fixpoint did not converge "
                f"within {max_rounds} rounds")
        offers = run(pending, inflow, final=False)
        if not isinstance(offers, pd.DataFrame):
            offers = offers.to_pandas()
        if offers.empty:  # all-empty blocks lose the schema entirely
            src = key = val = np.zeros(0, np.int64)
        else:
            src = offers["src"].to_numpy(np.int64)
            key = ((offers["dst"].to_numpy(np.int64) << 31)
                   | offers["px"].to_numpy(np.int64))
            val = offers[val_col].to_numpy(np.int64)
        order = np.lexsort((key, src))
        src, key, val = src[order], key[order], val[order]
        for tid in pending:
            out_k.pop(tid, None)
            out_v.pop(tid, None)
        if len(src):
            # reduce duplicate (src, dst, px) offers (e.g. W and NW
            # flows converging on one dst pixel), then slice per src
            pairs = np.flatnonzero(
                np.r_[True, (src[1:] != src[:-1])
                      | (key[1:] != key[:-1])])
            k2, s2 = key[pairs], src[pairs]
            v2 = reducer.reduceat(val, pairs)
            sbound = np.r_[np.flatnonzero(
                np.r_[True, s2[1:] != s2[:-1]]), len(s2)]
            for i in range(len(sbound) - 1):
                a, b = int(sbound[i]), int(sbound[i + 1])
                out_k[int(s2[a])] = k2[a:b]
                out_v[int(s2[a])] = v2[a:b]
        if out_k:
            ak = np.concatenate(list(out_k.values()))
            av = np.concatenate(list(out_v.values()))
            order = np.argsort(ak, kind="stable")
            ak, av = ak[order], av[order]
            ks = np.flatnonzero(np.r_[True, ak[1:] != ak[:-1]])
            nk, nv = ak[ks], reducer.reduceat(av, ks)
        else:
            nk = np.zeros(0, np.int64)
            nv = np.zeros(0, np.int64)
        pending = _changed_dst_tiles(nk, nv, agg_k, agg_v)
        agg_k, agg_v = nk, nv
        inflow = _segment_inflow(nk, nv)
    return inflow, rounds


def _accum_fixpoint(run, present_tiles: list[int],
                    what: str = "flow-accumulation", *, grid=None):
    """Seam-flux delta iteration to convergence; ``run(tile_ids,
    inflow, final=False)`` must yield (src, dst, px, flux) rows.
    Returns (converged inflow, rounds). Above
    ``seamdist.SEAM_DRIVER_MAX_ROWS`` estimated seam rows (pass
    ``grid``) the identical round structure runs distributed — fold,
    inflow state and change detection all as Datasets, driver memory
    O(#tiles) — and returns a ``seamdist.DistInflow`` the launchers
    recognize (bit-equal by construction; forced in tests)."""
    if grid is not None and seamdist.use_distributed(present_tiles,
                                                     grid):
        return seamdist.fixpoint(run, present_tiles, kind="sum",
                                 what=what, max_rounds=MAX_ROUNDS)
    return _driver_seam_fold(run, present_tiles, what, MAX_ROUNDS,
                             "flux", np.add)


def flow_accumulation(world_path: str, dataset: str = "kg", *,
                      hole_value: int | None = None,
                      batch_size: int = 64,
                      with_rounds: bool = False):
    """(acc, n_px) histogram of D8 flow accumulation over the dataset
    treated as a DEM — bit-exact vs the sequential whole-array oracle
    (``oracle.flow_accum_oracle``). ``with_rounds=True`` additionally
    returns the number of seam-fixpoint rounds (tests use it to prove
    the multi-tile-crossing path is exercised)."""
    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    nodata = int(layout[dataset]["nodata"])
    hole = nodata if hole_value is None else int(hole_value)
    present_tiles = _present_tiles(world_path, dataset, grid)

    def run(tile_ids, inflow, final):
        if isinstance(inflow, seamdist.DistInflow):
            fn = as_task_fn(_FlowTiles, world_path=world_path,
                            dataset=dataset, hole=hole,
                            inflow_ref=None, final=final)
            return inflow.work_ds(tile_ids).map_batches(
                fn, batch_format="pyarrow", batch_size=batch_size)
        ref = (ray.put(_pack_inflow_arrays(inflow))
               if inflow else None)
        fn = as_task_fn(_FlowTiles, world_path=world_path, dataset=dataset,
                        hole=hole, inflow_ref=ref, final=final)
        items = [{"id": int(i)} for i in tile_ids]
        return (ray.data.from_items(items)
                .map_batches(fn, batch_format="pyarrow",
                             batch_size=batch_size))

    inflow, rounds = _accum_fixpoint(run, present_tiles, grid=grid)

    from ray.data.aggregate import Sum
    out = (run(present_tiles, inflow, final=True)
           .groupby("acc")
           .aggregate(Sum("n_px", alias_name="n_px"))
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    out = out.sort_values("acc").reset_index(drop=True)
    if with_rounds:
        return out, rounds
    return out


# ------------------------------------------------------------- watershed

#: resolution classes carried through the seam graph
_PIT, _EXT, _CROSS = 0, 1, 2


class _BasinTiles:
    """Per-tile basin resolution for ``watershed_basins`` — ONE pass,
    no fixpoint: within a tile every pixel's D8 path is resolved to a
    local root by vectorized pointer doubling (<= 17 doublings for a
    256x256 tile), and only two kinds of tiny rows leave the tile:

    * ring rows — for each pixel on the tile's 1-px border ring (the
      only pixels a neighbor can flow into), where it ultimately
      drains within this tile: a pit (global pixel index), external
      drainage (off-frame / into a hole), or a cross-seam exit
      (neighbor tile, pixel) — O(tile edge) rows;
    * count rows — pixel counts per distinct local root.

    Node/exit keys are ``tile_id * tile^2 + flat_px`` with the DST
    tile's clamped width, matching on both sides of every seam."""

    def __init__(self, world_path: str, dataset: str, hole: int):
        self.media = MediaStore(world_path)
        layout = model.world_layout(world_path)
        self.grid = world_grid(world_path, layout[dataset]["grid"])
        self.dataset = dataset
        self.hole = hole

    def _dims(self, ty: int, tx: int) -> tuple[int, int]:
        g = self.grid
        return (min(g.tile, g.height - ty * g.tile),
                min(g.tile, g.width - tx * g.tile))

    def __call__(self, b: pa.Table) -> pa.Table:
        g = self.grid
        t = g.tile
        tcap = t * t
        ids = b["id"].to_numpy(zero_copy_only=False)
        plans, want = [], set()
        for pid in ids:
            ty, tx = int(pid) // g.tiles_x, int(pid) % g.tiles_x
            nbrs = {}
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ny, nx = ty + dy, tx + dx
                    if 0 <= ny < g.tiles_y and 0 <= nx < g.tiles_x:
                        r = model.media_ref(self.dataset, g.name, ny, nx, 1)
                        nbrs[(dy, dx)] = (ny, nx, r)
                        want.add(r)
            plans.append((ty, tx, nbrs))
        payloads = self.media.fetch(sorted(want), strict=False)

        o_node: list[np.ndarray] = []
        o_cls: list[np.ndarray] = []
        o_aux: list[np.ndarray] = []
        o_n: list[np.ndarray] = []
        for ty, tx, nbrs in plans:
            if payloads.get(nbrs[(0, 0)][2]) is None:
                continue
            nr, nc = self._dims(ty, tx)
            pad = _assemble_pad(payloads, nbrs, nr, nc, self._dims,
                                self.hole)
            code = flowdir_codes(pad).ravel()
            npx = nr * nc
            rr = np.repeat(np.arange(nr, dtype=np.int64), nc)
            cc = np.tile(np.arange(nc, dtype=np.int64), nr)
            tr = rr + _DY[code]
            tc = cc + _DX[code]
            flows = code != 0
            intile = (flows & (tr >= 0) & (tr < nr)
                      & (tc >= 0) & (tc < nc))

            gidx = (ty * t + rr) * g.width + (tx * t + cc)
            cls = np.full(npx, _PIT, dtype=np.int64)
            aux = gidx.copy()
            cls[flows] = _EXT
            aux[flows] = -1

            # cross-seam exits: target in a PRESENT neighbor tile
            pres33 = np.zeros((3, 3), dtype=bool)
            for (dy, dx), (_ny, _nx, r) in nbrs.items():
                pres33[dy + 1, dx + 1] = payloads.get(r) is not None
            gy = ty * t + tr
            gx = tx * t + tc
            sel = np.flatnonzero(flows & ~intile
                                 & (gy >= 0) & (gy < g.height)
                                 & (gx >= 0) & (gx < g.width))
            if len(sel):
                nty = gy[sel] // t
                ntx_ = gx[sel] // t
                sel = sel[pres33[nty - ty + 1, ntx_ - tx + 1]]
            if len(sel):
                nty = gy[sel] // t
                ntx_ = gx[sel] // t
                dst_w = np.minimum(t, g.width - ntx_ * t)
                cls[sel] = _CROSS
                aux[sel] = ((nty * g.tiles_x + ntx_) * tcap
                            + (gy[sel] - nty * t) * dst_w
                            + (gx[sel] - ntx_ * t))

            parent = np.arange(npx, dtype=np.int64)
            parent[intile] = (tr * nc + tc)[intile]
            for _ in range(int(np.ceil(np.log2(max(npx, 2)))) + 1):
                parent = parent[parent]
            rcls = cls[parent]
            raux = aux[parent]

            ring = np.flatnonzero((rr == 0) | (rr == nr - 1)
                                  | (cc == 0) | (cc == nc - 1))
            tile_id = ty * g.tiles_x + tx
            o_node.append(tile_id * tcap + ring)
            o_cls.append(rcls[ring])
            o_aux.append(raux[ring])
            o_n.append(np.zeros(len(ring), dtype=np.int64))

            roots, cnts = np.unique(parent, return_counts=True)
            o_node.append(np.full(len(roots), -1, dtype=np.int64))
            o_cls.append(cls[roots])
            o_aux.append(aux[roots])
            o_n.append(cnts.astype(np.int64))

        cat = (lambda xs: np.concatenate(xs) if xs
               else np.zeros(0, dtype=np.int64))
        return pa.table({"node": pa.array(cat(o_node)),
                         "cls": pa.array(cat(o_cls)),
                         "aux": pa.array(cat(o_aux)),
                         "n": pa.array(cat(o_n))})


def watershed_basins(world_path: str, dataset: str = "kg", *,
                     hole_value: int | None = None,
                     batch_size: int = 64) -> pd.DataFrame:
    """D8 watershed delineation summary over the dataset treated as a
    DEM: every present pixel drains to a terminal — an in-frame pit
    (its basin) or external drainage (off the world frame / into a
    hole) — and the result is the exact basin-size histogram

        (kind, size, n):  ("basin", s, k)  — k basins of exactly s px
                          ("external", e, 1) — e externally-draining px

    bit-exact vs the sequential whole-array oracle
    (``oracle.watershed_oracle``).

    Scale design: ONE shuffle-free ``map_batches`` pass (in-tile
    pointer doubling, O(tile-edge) seam rows out), then a driver-side
    memoized chase over the seam graph — O(world perimeter) rows, the
    ``label_regions`` seam-graph precedent. At 100 TB the ring rows
    stay a Dataset and the chase becomes distributed pointer jumping
    (log-depth self-joins); the per-tile pass is unchanged."""
    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    nodata = int(layout[dataset]["nodata"])
    hole = nodata if hole_value is None else int(hole_value)
    present_tiles = _present_tiles(world_path, dataset, grid)

    fn = as_task_fn(_BasinTiles, world_path=world_path, dataset=dataset,
                    hole=hole)
    rows_ds = (ray.data.from_items([{"id": int(i)}
                                    for i in present_tiles])
               .map_batches(fn, batch_format="pyarrow",
                            batch_size=batch_size))
    if seamdist.use_distributed(present_tiles, grid):
        return _watershed_distributed(rows_ds)
    rows = rows_ds.to_pandas()

    ring = rows[rows["node"] >= 0]
    res: dict[int, tuple[int, int]] = {
        int(nd): (int(c), int(a))
        for nd, c, a in zip(ring["node"], ring["cls"], ring["aux"])}
    memo: dict[int, tuple[int, int]] = {}

    def resolve(cls: int, aux: int) -> tuple[int, int]:
        path = []
        while cls == _CROSS:
            if aux in memo:
                cls, aux = memo[aux]
                break
            path.append(aux)
            if len(path) > MAX_ROUNDS:
                raise AssertionError("watershed seam chase too deep "
                                     "(cyclic flow?)")
            cls, aux = res[aux]
        for k in path:
            memo[k] = (cls, aux)
        return cls, aux

    basins: dict[int, int] = {}
    external = 0
    cnt = rows[rows["node"] < 0]
    for c, a, n in zip(cnt["cls"], cnt["aux"], cnt["n"]):
        c2, a2 = resolve(int(c), int(a))
        if c2 == _PIT:
            basins[a2] = basins.get(a2, 0) + int(n)
        else:
            external += int(n)

    sizes, kcnt = np.unique(np.fromiter(basins.values(), np.int64,
                                        len(basins)),
                            return_counts=True)
    out = pd.DataFrame({"kind": ["basin"] * len(sizes),
                        "size": sizes.astype(np.int64),
                        "n": kcnt.astype(np.int64)})
    if external:
        out = pd.concat(
            [out, pd.DataFrame({"kind": ["external"],
                                "size": [np.int64(external)],
                                "n": [np.int64(1)]})],
            ignore_index=True)
    return out


def _watershed_distributed(rows_ds) -> pd.DataFrame:
    """Distributed twin of the watershed driver chase: pointer
    doubling over the ring Dataset (``seamdist.chase_resolve``), then
    count rows resolve with ONE join and fold into per-basin sums and
    the size histogram as grouped aggregates — only the histogram
    reaches the driver. Resolution is function application, so the
    result is bit-identical to the memoized sequential chase."""
    from ray.data.aggregate import Count, Sum

    rows_ds = rows_ds.materialize()

    def ring_proj(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"],
                         "s": pa.array(np.zeros(len(b), np.int64)),
                         "cls": b["cls"].cast(pa.int64()),
                         "aux": b["aux"]})

    resolved = seamdist.chase_resolve(
        rows_ds.filter(expr="node >= 0")
        .map_batches(ring_proj, batch_format="pyarrow"),
        cross=_CROSS)

    counts = rows_ds.filter(expr="node < 0")
    term = counts.filter(expr=f"cls != {_CROSS}")
    crossed = counts.filter(expr=f"cls == {_CROSS}")

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"node2": b["node"], "cls2": b["cls"],
                         "aux2": b["aux"]})

    from ..datapipe.util import shuffle_width
    joined = crossed.join(
        resolved.map_batches(rename, batch_format="pyarrow")
        .materialize(),
        join_type="inner",
        num_partitions=shuffle_width(blocks=resolved.num_blocks()),
        on=("aux",), right_on=("node2",))

    def term_rows(b: pa.Table) -> pa.Table:
        return pa.table({"tcls": b["cls"].cast(pa.int64()),
                         "root": b["aux"], "n": b["n"]})

    def joined_rows(b: pa.Table) -> pa.Table:
        return pa.table({"tcls": b["cls2"].cast(pa.int64()),
                         "root": b["aux2"], "n": b["n"]})

    outcomes = (term.map_batches(term_rows, batch_format="pyarrow")
                .union(joined.map_batches(joined_rows,
                                          batch_format="pyarrow"))
                .materialize())
    ext = outcomes.filter(expr=f"tcls == {_EXT}").sum("n") or 0
    basin_sizes = (outcomes.filter(expr=f"tcls == {_PIT}")
                   .groupby("root")
                   .aggregate(Sum("n", alias_name="size")))
    hist = (basin_sizes.groupby("size")
            .aggregate(Count(alias_name="n"))
            .to_pandas())
    hist = hist.sort_values("size").reset_index(drop=True)
    out = pd.DataFrame({"kind": ["basin"] * len(hist),
                        "size": hist["size"].astype(np.int64),
                        "n": hist["n"].astype(np.int64)})
    if ext:
        out = pd.concat(
            [out, pd.DataFrame({"kind": ["external"],
                                "size": [np.int64(ext)],
                                "n": [np.int64(1)]})],
            ignore_index=True)
    return out


# ------------------------------------------------------- stream order

#: Strahler order is < log2(stream pixels); 64 is unreachable, so
#: (target, order) packs into one int64 key for grouped merging.
_ORD_CAP = 64


def _merge_level_contrib(m: np.ndarray, c: np.ndarray,
                         tgt: np.ndarray, orders: np.ndarray) -> None:
    """Merge one batch of child-order contributions into the running
    per-pixel (max-order ``m``, count-at-max ``c``) summaries, grouped:
    per target only the group-local max order and its multiplicity
    matter, then the standard commutative-monoid merge — so grouping
    by elevation level (kernel) or seam round (driver) cannot change
    the result."""
    key = tgt * _ORD_CAP + orders
    uk, cnt = np.unique(key, return_counts=True)
    ut = uk // _ORD_CAP
    uo = uk % _ORD_CAP
    last = np.r_[ut[1:] != ut[:-1], True]   # max order per target
    lt, lo, lc = ut[last], uo[last], cnt[last]
    up = lo > m[lt]
    eq = lo == m[lt]
    m[lt[up]] = lo[up]
    c[lt[up]] = lc[up]
    c[lt[eq]] += lc[eq]


class _StrahlerTiles:
    """Per-tile Strahler kernel (see ``strahler_orders``): recomputes
    exact in-tile flow accumulation from the CONVERGED accumulation
    inflow (``acc_ref``), thresholds it into the stream mask, then
    sweeps elevation levels DESCENDING finalizing each stream pixel's
    order from its (max, count-at-max) child summary — in-tile
    children merged during the sweep, cross-seam children from
    ``inflow_ref``. Emits (src, dst, px, ord, k) seam rows, or
    (order, n_px) histogram partials when ``final``."""

    def __init__(self, world_path: str, dataset: str, hole: int,
                 threshold: int, acc_ref, inflow_ref, final: bool):
        self.media = MediaStore(world_path)
        layout = model.world_layout(world_path)
        self.grid = world_grid(world_path, layout[dataset]["grid"])
        self.dataset = dataset
        self.hole = hole
        self.threshold = threshold
        self.final = final
        self.acc_inflow = ray.get(acc_ref) if acc_ref is not None else {}
        self.inflow = ray.get(inflow_ref) if inflow_ref is not None else {}

    def _dims(self, ty: int, tx: int) -> tuple[int, int]:
        g = self.grid
        return (min(g.tile, g.height - ty * g.tile),
                min(g.tile, g.width - tx * g.tile))

    def __call__(self, b: pa.Table) -> pa.Table:
        g = self.grid
        t = g.tile
        ids = b["id"].to_numpy(zero_copy_only=False)
        batch_inflow = seamdist.unpack_inflow(b, "in", two_vals=True)
        inflow = self.inflow if batch_inflow is None else batch_inflow
        batch_acc = seamdist.unpack_inflow(b, "acc")
        acc_inflow = (self.acc_inflow if batch_acc is None
                      else batch_acc)
        plans, want = [], set()
        for pid in ids:
            ty, tx = int(pid) // g.tiles_x, int(pid) % g.tiles_x
            nbrs = {}
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ny, nx = ty + dy, tx + dx
                    if 0 <= ny < g.tiles_y and 0 <= nx < g.tiles_x:
                        r = model.media_ref(self.dataset, g.name, ny, nx, 1)
                        nbrs[(dy, dx)] = (ny, nx, r)
                        want.add(r)
            plans.append((ty, tx, nbrs))
        payloads = self.media.fetch(sorted(want), strict=False)

        o_src: list[np.ndarray] = []
        o_dst: list[np.ndarray] = []
        o_px: list[np.ndarray] = []
        o_ord: list[np.ndarray] = []
        o_k: list[np.ndarray] = []
        hist: dict[int, int] = {}
        for ty, tx, nbrs in plans:
            if payloads.get(nbrs[(0, 0)][2]) is None:
                continue
            nr, nc = self._dims(ty, tx)
            pad = _assemble_pad(payloads, nbrs, nr, nc, self._dims,
                                self.hole)
            code = flowdir_codes(pad).ravel()
            elev = pad[1:-1, 1:-1].astype(np.int64).ravel()
            npx = nr * nc
            rr = np.repeat(np.arange(nr, dtype=np.int64), nc)
            cc = np.tile(np.arange(nc, dtype=np.int64), nr)
            tr = rr + _DY[code]
            tc = cc + _DX[code]
            flows = code != 0
            intile = (flows & (tr >= 0) & (tr < nr)
                      & (tc >= 0) & (tc < nc))
            tgt_flat = tr * nc + tc  # meaningful only where intile

            pres33 = np.zeros((3, 3), dtype=bool)
            for (dy, dx), (_ny, _nx, r) in nbrs.items():
                pres33[dy + 1, dx + 1] = payloads.get(r) is not None
            gy = ty * t + tr
            gx = tx * t + tc
            sel = np.flatnonzero(flows & ~intile
                                 & (gy >= 0) & (gy < g.height)
                                 & (gx >= 0) & (gx < g.width))
            if len(sel):
                nty = gy[sel] // t
                ntx_ = gx[sel] // t
                sel = sel[pres33[nty - ty + 1, ntx_ - tx + 1]]
            dstt = np.full(npx, -1, dtype=np.int64)
            dstp = np.full(npx, -1, dtype=np.int64)
            if len(sel):
                nty = gy[sel] // t
                ntx_ = gx[sel] // t
                dst_w = np.minimum(t, g.width - ntx_ * t)
                dstt[sel] = nty * g.tiles_x + ntx_
                dstp[sel] = ((gy[sel] - nty * t) * dst_w
                             + (gx[sel] - ntx_ * t))

            tile_id = ty * g.tiles_x + tx

            # exact in-tile flow accumulation given converged inflow
            acc = np.zeros(npx, dtype=np.int64)
            ainf = _inflow_arrays(acc_inflow.get(tile_id))
            if ainf is not None:
                idx, val = ainf
                acc[idx] += val
            for lvl in np.unique(elev)[::-1]:
                m_in = (elev == lvl) & intile
                if m_in.any():
                    np.add.at(acc, tgt_flat[m_in], acc[m_in] + 1)
            stream = acc >= self.threshold

            m = np.zeros(npx, dtype=np.int64)
            c = np.zeros(npx, dtype=np.int64)
            oinf = _inflow_arrays3(inflow.get(tile_id))
            if oinf is not None:
                oidx, omo, okk = oinf
                s_ = stream[oidx]
                m[oidx[s_]] = omo[s_]
                c[oidx[s_]] = okk[s_]
            order_arr = np.zeros(npx, dtype=np.int64)
            for lvl in np.unique(elev[stream])[::-1]:
                si = np.flatnonzero(stream & (elev == lvl))
                order_arr[si] = np.where(
                    m[si] == 0, 1, m[si] + (c[si] >= 2))
                # in-tile pushes: children at this level whose target
                # is an in-tile stream pixel (strictly lower level)
                pi = si[intile[si]]
                pi = pi[stream[tgt_flat[pi]]]
                if len(pi):
                    _merge_level_contrib(m, c, tgt_flat[pi],
                                         order_arr[pi])
                # cross-seam pushes (target streamness is decided on
                # the RECEIVING side, which knows its own acc)
                ci = si[dstt[si] >= 0]
                if len(ci) and not self.final:
                    o_src.append(np.full(len(ci), tile_id,
                                         dtype=np.int64))
                    o_dst.append(dstt[ci])
                    o_px.append(dstp[ci])
                    o_ord.append(order_arr[ci])
                    o_k.append(np.ones(len(ci), dtype=np.int64))

            if self.final:
                so = order_arr[stream]
                u, cnt = np.unique(so, return_counts=True)
                for v, n in zip(u.tolist(), cnt.tolist()):
                    hist[v] = hist.get(v, 0) + n

        if self.final:
            keys = sorted(hist)
            return pa.table({
                "strahler": pa.array(keys, pa.int64()),
                "n_px": pa.array([hist[k] for k in keys], pa.int64())})
        cat = (lambda xs: np.concatenate(xs) if xs
               else np.zeros(0, dtype=np.int64))
        return pa.table({"src": pa.array(cat(o_src)),
                         "dst": pa.array(cat(o_dst)),
                         "px": pa.array(cat(o_px)),
                         "ord": pa.array(cat(o_ord)),
                         "k": pa.array(cat(o_k))})


def strahler_orders(world_path: str, dataset: str = "kg", *,
                    threshold: int = 1,
                    hole_value: int | None = None,
                    batch_size: int = 64,
                    with_rounds: bool = False):
    """(strahler, n_px) histogram of Strahler stream order over the
    dataset treated as a DEM — the stream-network member of the
    hydrology family (gdaldem -> flow accumulation -> stream order).
    Stream pixels are those with flow accumulation >= ``threshold``;
    a stream pixel with no stream children has order 1, otherwise
    order = max child order, +1 when that max occurs at least twice.

    Two chained seam fixpoints, both shuffle-free per round: first the
    flow-accumulation flux iteration (reused converged inflow), then
    an order iteration whose seam rows carry (max, count-at-max)
    child-order summaries — a commutative monoid, so per-level,
    per-tile and per-round grouping cannot change the result.
    Bit-exact vs ``oracle.strahler_oracle``."""
    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    nodata = int(layout[dataset]["nodata"])
    hole = nodata if hole_value is None else int(hole_value)
    present_tiles = _present_tiles(world_path, dataset, grid)

    def run_acc(tile_ids, inflow, final):
        if isinstance(inflow, seamdist.DistInflow):
            fn = as_task_fn(_FlowTiles, world_path=world_path,
                            dataset=dataset, hole=hole,
                            inflow_ref=None, final=final)
            return inflow.work_ds(tile_ids).map_batches(
                fn, batch_format="pyarrow", batch_size=batch_size)
        ref = (ray.put(_pack_inflow_arrays(inflow))
               if inflow else None)
        fn = as_task_fn(_FlowTiles, world_path=world_path, dataset=dataset,
                        hole=hole, inflow_ref=ref, final=final)
        return (ray.data.from_items([{"id": int(i)} for i in tile_ids])
                .map_batches(fn, batch_format="pyarrow",
                             batch_size=batch_size))

    acc_inflow, acc_rounds = _accum_fixpoint(run_acc, present_tiles,
                                             grid=grid)
    dist_mode = isinstance(acc_inflow, seamdist.DistInflow)
    acc_ref = (None if dist_mode
               else (ray.put(_pack_inflow_arrays(acc_inflow))
                     if acc_inflow else None))

    def run(tile_ids, inflow, final):
        if isinstance(inflow, seamdist.DistInflow):
            fn = as_task_fn(_StrahlerTiles, world_path=world_path,
                            dataset=dataset, hole=hole,
                            threshold=int(threshold), acc_ref=None,
                            inflow_ref=None, final=final)
            work = inflow.work_ds(tile_ids,
                                  extra=[("acc", acc_inflow)])
            return work.map_batches(fn, batch_format="pyarrow",
                                    batch_size=batch_size)
        ref = (ray.put(_pack_inflow_arrays(inflow))
               if inflow else None)
        fn = as_task_fn(_StrahlerTiles, world_path=world_path,
                        dataset=dataset, hole=hole,
                        threshold=int(threshold), acc_ref=acc_ref,
                        inflow_ref=ref, final=final)
        return (ray.data.from_items([{"id": int(i)} for i in tile_ids])
                .map_batches(fn, batch_format="pyarrow",
                             batch_size=batch_size))

    if dist_mode:
        inflow, rounds = seamdist.fixpoint(
            run, present_tiles, kind="strahler", what="strahler",
            max_rounds=MAX_ROUNDS)
        return _strahler_finish(run, present_tiles, inflow,
                                (acc_rounds, rounds), with_rounds)
    # vectorized (max order, count-at-max) monoid fold — the strahler
    # twin of _driver_seam_fold: per-src partials keep only their own
    # max per key (sub-max ords contribute 0 to any larger global max,
    # so pre-reduction is lossless), merged by the same monoid
    out_k: dict[int, np.ndarray] = {}
    out_o: dict[int, np.ndarray] = {}
    out_c: dict[int, np.ndarray] = {}
    agg_k = np.zeros(0, np.int64)
    agg_o = np.zeros(0, np.int64)
    agg_c = np.zeros(0, np.int64)
    inflow: dict = {}
    pending = list(present_tiles)
    rounds = 0
    while pending:
        rounds += 1
        if rounds > MAX_ROUNDS:
            raise AssertionError(
                "strahler seam fixpoint did not converge "
                f"within {MAX_ROUNDS} rounds (cyclic flow?)")
        rows = run(pending, inflow, final=False).to_pandas()
        for tid in pending:
            out_k.pop(tid, None)
            out_o.pop(tid, None)
            out_c.pop(tid, None)
        if not rows.empty:
            src = rows["src"].to_numpy(np.int64)
            key = ((rows["dst"].to_numpy(np.int64) << 31)
                   | rows["px"].to_numpy(np.int64))
            ordv = rows["ord"].to_numpy(np.int64)
            kk = rows["k"].to_numpy(np.int64)
            order = np.lexsort((key, src))
            src, key, ordv, kk = (src[order], key[order], ordv[order],
                                  kk[order])
            sbound = np.r_[np.flatnonzero(
                np.r_[True, src[1:] != src[:-1]]), len(src)]
            for i in range(len(sbound) - 1):
                a, b = int(sbound[i]), int(sbound[i + 1])
                uk, mo, ks = seamdist._strahler_partial(
                    key[a:b], ordv[a:b], kk[a:b])
                s0 = int(src[a])
                out_k[s0], out_o[s0], out_c[s0] = uk, mo, ks
        if out_k:
            nk, no_, nc_ = seamdist._strahler_partial(
                np.concatenate(list(out_k.values())),
                np.concatenate(list(out_o.values())),
                np.concatenate(list(out_c.values())))
        else:
            nk = no_ = nc_ = np.zeros(0, np.int64)
        pending = _changed_dst_tiles(nk, no_, agg_k, agg_o,
                                     nv2=nc_, ov2=agg_c)
        agg_k, agg_o, agg_c = nk, no_, nc_
        inflow = _segment_inflow3(nk, no_, nc_)

    return _strahler_finish(run, present_tiles, inflow,
                            (acc_rounds, rounds), with_rounds)


def _strahler_finish(run, present_tiles, inflow, rounds, with_rounds):
    from ray.data.aggregate import Sum
    out = (run(present_tiles, inflow, final=True)
           .groupby("strahler")
           .aggregate(Sum("n_px", alias_name="n_px"))
           .to_pandas())
    if out.empty:   # no channel reaches threshold (e.g. a DEM whose
        out = pd.DataFrame({  # fill flattened every gradient)
            "strahler": pd.Series([], dtype=np.int64),
            "n_px": pd.Series([], dtype=np.int64)})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    out = out.sort_values("strahler").reset_index(drop=True)
    if with_rounds:
        return out, rounds
    return out


# ------------------------------------------------------- cost distance

#: unreachable sentinel: far above any real path cost (a path visits
#: each pixel once, so cost < n_px * 255 * 2 * 3 << 2^62) yet small
#: enough that sentinel + one move weight cannot overflow int64.
_UNREACH = np.int64(1) << 62

#: 8-connected moves with doubled-integer weights: stepping u -> v
#: costs (c[u] + c[v]) * W, W = 2 orthogonal / 3 diagonal — the
#: all-integer form of GRASS r.cost's (c1+c2)/2 per orthogonal step
#: with the sqrt(2) diagonal factor rounded to 3/2. Integer min-plus
#: has a UNIQUE least fixpoint, so the distributed block-Jacobi
#: result equals the sequential whole-array result exactly, with no
#: summation-order caveats.
_COST_MOVES = (
    (-1, 0, 2), (1, 0, 2), (0, -1, 2), (0, 1, 2),
    (-1, -1, 3), (-1, 1, 3), (1, -1, 3), (1, 1, 3),
)

#: every seam round strictly lowers at least one border pixel's
#: integer distance; real worlds converge in ~(tile-graph diameter)
#: rounds. Generous cap to catch bugs, not workloads.
_COST_MAX_ROUNDS = 4096


#: cost-allocation keys pack (dist, source pixel id) into one int64:
#: key = dist * 2^31 + gid. Lexicographic (dist, gid) min IS integer
#: min on the packed key, and min-plus relaxation adds w * 2^31, so
#: the allocation fixpoint is the SAME unique least fixpoint, tie
#: broken toward the smallest source pixel id. Budget: gid < 2^31
#: covers the planet 1 km lattice (43200*21600 ~ 2^29.8); dist < 2^31
#: is asserted at emit time.
_ALLOC_SCALE = np.int64(1) << 31


def _cost_relax_pad(dist_pad: np.ndarray, cost_pad: np.ndarray,
                    passable_pad: np.ndarray, nr: int, nc: int,
                    scale: np.int64 = np.int64(1)) -> None:
    """One Gauss-Seidel min-plus sweep: relax every 8-neighbor move
    whose SOURCE is an interior pixel, writing into the full pad
    (interior and halo). Interior-to-interior edges drive the in-tile
    fixpoint; interior-to-halo edges become the seam offers.
    ``scale`` shifts move weights into the dist part of packed
    allocation keys (1 for plain distances)."""
    for dy, dx, w in _COST_MOVES:
        src_d = dist_pad[1:1 + nr, 1:1 + nc]
        src_c = cost_pad[1:1 + nr, 1:1 + nc]
        src_p = passable_pad[1:1 + nr, 1:1 + nc]
        dst = (slice(1 + dy, 1 + dy + nr), slice(1 + dx, 1 + dx + nc))
        cand = src_d + (src_c + cost_pad[dst]) * (w * scale)
        np.copyto(cand, _UNREACH, where=~(src_p & passable_pad[dst]))
        np.minimum(dist_pad[dst], cand, out=dist_pad[dst])


class _CostTiles:
    """Per-tile least-cost-distance kernel for ``cost_distance``:
    given the current best boundary candidates (``inflow_ref``:
    {tile_id: {px_flat: dist}}), run the in-tile min-plus fixpoint
    (vectorized Gauss-Seidel sweeps), then either emit seam offers —
    (src_tile, dst_tile, dst_px, dist) rows for the 1-px halo ring,
    O(tile edge) per tile — or, with ``final=True``, the (dist, n_px)
    histogram partials over passable pixels (unreachable -> -1)."""

    def __init__(self, world_path: str, dataset: str, target: int,
                 hole: int, inflow_ref, final: bool,
                 alloc: bool = False, index=None,
                 source_dataset: str | None = None,
                 source_hole: int | None = None):
        self.media = MediaStore(world_path)
        layout = model.world_layout(world_path)
        self.grid = world_grid(world_path, layout[dataset]["grid"])
        self.dataset = dataset
        self.target = target
        self.hole = hole
        self.final = final
        self.alloc = alloc
        self.index = index  # zonal PIP index -> per-admin final rows
        # cross-layer form (the real r.cost shape): sources come from
        # a DIFFERENT same-grid dataset; its tile payload is one more
        # derived ref in the same batched fetch (J4 discipline)
        self.source_dataset = source_dataset
        self.source_hole = source_hole
        if source_dataset is not None:
            if layout[source_dataset]["grid"] != layout[dataset]["grid"]:
                raise ValueError("source dataset must share the grid")
            if source_hole is None:
                self.source_hole = int(layout[source_dataset]["nodata"])
        self.inflow = ray.get(inflow_ref) if inflow_ref is not None else {}

    def _dims(self, ty: int, tx: int) -> tuple[int, int]:
        g = self.grid
        return (min(g.tile, g.height - ty * g.tile),
                min(g.tile, g.width - tx * g.tile))

    def __call__(self, b: pa.Table) -> pa.Table:
        g = self.grid
        t = g.tile
        ids = b["id"].to_numpy(zero_copy_only=False)
        batch_inflow = seamdist.unpack_inflow(b, "in")
        inflow = self.inflow if batch_inflow is None else batch_inflow
        plans, want = [], set()
        for pid in ids:
            ty, tx = int(pid) // g.tiles_x, int(pid) % g.tiles_x
            nbrs = {}
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ny, nx = ty + dy, tx + dx
                    if 0 <= ny < g.tiles_y and 0 <= nx < g.tiles_x:
                        r = model.media_ref(self.dataset, g.name, ny, nx, 1)
                        nbrs[(dy, dx)] = (ny, nx, r)
                        want.add(r)
            plans.append((ty, tx, nbrs))
        if self.source_dataset is not None:
            for pid in ids:
                ty, tx = int(pid) // g.tiles_x, int(pid) % g.tiles_x
                want.add(model.media_ref(self.source_dataset, g.name,
                                         ty, tx, 1))
        payloads = self.media.fetch(sorted(want), strict=False)

        o_src: list[np.ndarray] = []
        o_dst: list[np.ndarray] = []
        o_px: list[np.ndarray] = []
        o_dist: list[np.ndarray] = []
        hist: dict[int, int] = {}
        zacc: dict[str, list] = {}
        for ty, tx, nbrs in plans:
            if payloads.get(nbrs[(0, 0)][2]) is None:
                continue
            nr, nc = self._dims(ty, tx)
            pad = _assemble_pad(payloads, nbrs, nr, nc, self._dims,
                                self.hole)
            cost_pad = pad.astype(np.int64)
            passable_pad = pad != self.hole
            dist_pad = np.full((nr + 2, nc + 2), _UNREACH, dtype=np.int64)
            interior = dist_pad[1:1 + nr, 1:1 + nc]
            if self.source_dataset is not None:
                sp = payloads.get(model.media_ref(
                    self.source_dataset, g.name, ty, tx, 1))
                if sp is None:
                    src_mask = np.zeros((nr, nc), dtype=bool)
                else:
                    sarr = np.frombuffer(sp, np.uint8,
                                         count=nr * nc).reshape(nr, nc)
                    src_mask = (passable_pad[1:1 + nr, 1:1 + nc]
                                & (sarr != self.source_hole)
                                & (sarr == self.target))
            else:
                src_mask = passable_pad[1:1 + nr, 1:1 + nc] & (
                    pad[1:1 + nr, 1:1 + nc] == self.target)
            if self.alloc:
                # source key = its own global pixel id at dist 0
                sy, sx = np.nonzero(src_mask)
                interior[sy, sx] = ((ty * t + sy) * g.width
                                    + tx * t + sx)
            else:
                interior[src_mask] = 0
            inf = _inflow_arrays(inflow.get(ty * g.tiles_x + tx))
            if inf is not None:
                idx, val = inf
                # interior is a non-contiguous view: scatter via 2D
                # indices (reshape(-1) would silently copy)
                np.minimum.at(interior, (idx // nc, idx % nc), val)

            scale = _ALLOC_SCALE if self.alloc else np.int64(1)
            # in-tile fixpoint: each sweep only lowers values; the
            # min-plus least fixpoint is reached when a sweep is a
            # no-op. A shortest in-tile path has < nr*nc hops.
            for _ in range(nr * nc + 2):
                before = dist_pad.copy()
                _cost_relax_pad(dist_pad, cost_pad, passable_pad, nr, nc,
                                scale)
                if np.array_equal(before, dist_pad):
                    break
            else:
                raise AssertionError("in-tile cost fixpoint overran")

            if self.final and self.index is not None:
                pin = passable_pad[1:1 + nr, 1:1 + nc]
                for _fidx, admin, mask in self.index.assign_tile(
                        self.grid, ty, tx):
                    vals = interior[mask & pin]
                    if not len(vals):
                        continue
                    reach = vals[vals < _UNREACH]
                    row = [len(reach),
                           int(reach.sum()) if len(reach) else 0,
                           int(reach.min()) if len(reach) else int(_UNREACH),
                           int(reach.max()) if len(reach) else -1,
                           int(len(vals) - len(reach))]
                    cur = zacc.get(admin)
                    if cur is None:
                        zacc[admin] = row
                    else:
                        cur[0] += row[0]
                        cur[1] += row[1]
                        cur[2] = min(cur[2], row[2])
                        cur[3] = max(cur[3], row[3])
                        cur[4] += row[4]
                continue

            if self.final:
                d = interior[passable_pad[1:1 + nr, 1:1 + nc]]
                if self.alloc:
                    # reachable keys: (dist, src) -> count per src;
                    # unreachable pixels under src = -1
                    src = np.where(d >= _UNREACH, np.int64(-1),
                                   d % _ALLOC_SCALE)
                    u, cnt = np.unique(src, return_counts=True)
                else:
                    d = np.where(d >= _UNREACH, np.int64(-1), d)
                    u, cnt = np.unique(d, return_counts=True)
                for v, n in zip(u.tolist(), cnt.tolist()):
                    hist[v] = hist.get(v, 0) + n
                continue

            # seam offers: halo cells of dist_pad already hold the min
            # one-hop offer from this tile (written by the same sweeps)
            pres33 = np.zeros((3, 3), dtype=bool)
            for (dy, dx), (_ny, _nx, r) in nbrs.items():
                pres33[dy + 1, dx + 1] = payloads.get(r) is not None
            halo = np.ones((nr + 2, nc + 2), dtype=bool)
            halo[1:-1, 1:-1] = False
            pr, pc = np.nonzero(halo & (dist_pad < _UNREACH))
            if not len(pr):
                continue
            gy = ty * t + pr - 1
            gx = tx * t + pc - 1
            keep = (gy >= 0) & (gy < g.height) & (gx >= 0) & (gx < g.width)
            pr, pc, gy, gx = pr[keep], pc[keep], gy[keep], gx[keep]
            if not len(pr):
                continue
            nty = gy // t
            ntx_ = gx // t
            keep = pres33[nty - ty + 1, ntx_ - tx + 1]
            pr, pc, gy, gx = pr[keep], pc[keep], gy[keep], gx[keep]
            if not len(pr):
                continue
            nty = gy // t
            ntx_ = gx // t
            dst_w = np.minimum(t, g.width - ntx_ * t)
            o_src.append(np.full(len(pr), ty * g.tiles_x + tx,
                                 dtype=np.int64))
            o_dst.append(nty * g.tiles_x + ntx_)
            o_px.append((gy - nty * t) * dst_w + (gx - ntx_ * t))
            o_dist.append(dist_pad[pr, pc])

        if self.final and self.index is not None:
            admins = sorted(zacc)
            cols = (np.array([zacc[a] for a in admins], dtype=np.int64)
                    if admins else np.zeros((0, 5), dtype=np.int64))
            return pa.table({
                "admin": pa.array(admins, pa.string()),
                "n_reach": pa.array(cols[:, 0]),
                "sum_dist": pa.array(cols[:, 1]),
                "min_dist": pa.array(cols[:, 2]),
                "max_dist": pa.array(cols[:, 3]),
                "n_unreach": pa.array(cols[:, 4])})
        if self.final:
            keys = sorted(hist)
            return pa.table({
                "dist": pa.array(keys, pa.int64()),
                "n_px": pa.array([hist[k] for k in keys], pa.int64())})
        cat = (lambda xs: np.concatenate(xs) if xs
               else np.zeros(0, dtype=np.int64))
        return pa.table({"src": pa.array(cat(o_src)),
                         "dst": pa.array(cat(o_dst)),
                         "px": pa.array(cat(o_px)),
                         "dist": pa.array(cat(o_dist))})


def cost_distance(world_path: str, dataset: str = "kg",
                  target: int = 14, *, hole_value: int | None = None,
                  batch_size: int = 64, with_rounds: bool = False):
    """(dist, n_px) histogram of least-cost distance from every
    passable pixel to the nearest ``target``-class pixel, over the
    dataset treated as a per-pixel traversal-cost surface (the GRASS
    ``r.cost`` / ESRI Cost Distance product; the reference's raster
    family stops at the Euclidean ``gdal_proximity`` analog —
    ``regions.proximity_histogram`` — this is its weighted,
    globally-dependent sibling). Metric: see ``_COST_MOVES``; nodata
    pixels and absent (sparse/ocean) tiles are impassable; unreachable
    passable pixels report dist = -1.

    Scale design — block-Jacobi min-plus with seam min-exchange:
    every round is ONE shuffle-free ``map_batches`` pass over exactly
    the tiles whose boundary candidates improved (round 0: all
    present tiles, which also seeds the sources); per tile the kernel
    assembles the focal halo pad, runs the in-tile vectorized
    Gauss-Seidel fixpoint, and emits O(tile edge) seam-offer rows.
    The driver folds offers per destination pixel with MIN and
    re-queues only improved tiles — distances decrease monotonically,
    so the integer fixpoint terminates, and its uniqueness makes the
    result independent of tile shape, batch size and round order
    (bit-exact vs the sequential ``oracle.cost_distance_oracle``).
    At 100 TB the fold becomes ``groupby(dst, px).min()`` and the
    inflow a co-partitioned join, the flow-accumulation precedent."""
    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    nodata = int(layout[dataset]["nodata"])
    hole = nodata if hole_value is None else int(hole_value)
    present_tiles = _present_tiles(world_path, dataset, grid)

    run = _make_cost_run(world_path, dataset, int(target), hole,
                         batch_size)

    inflow, rounds = _min_seam_fixpoint(run, present_tiles,
                                        "cost-distance", grid=grid)

    from ray.data.aggregate import Sum
    out = (run(present_tiles, inflow, final=True)
           .groupby("dist")
           .aggregate(Sum("n_px", alias_name="n_px"))
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    out = out.sort_values("dist").reset_index(drop=True)
    if with_rounds:
        return out, rounds
    return out


#: rounds touching at most this many tiles skip the ray.data launch
#: (~0.4-0.5 s fixed per round) and run as plain tasks in 32-tile
#: chunks. Raised 96 -> 1024 in round 5: on the bench world EVERY
#: round of the cost/fill fixpoints fits (496 tiles), and the paired
#: A/B measured cost_distance 6.8-7.4 -> 5.0-5.2 s, fill_sinks
#: 3.7-3.9 -> 2.4 s. Above the cap (planetary rounds, 100k+ tiles)
#: the streaming ray.data path with its backpressure still takes over.
_SMALL_ROUND_MAX = 1024


def _make_cost_run(world_path: str, dataset: str, target: int,
                   hole: int, batch_size: int, *, alloc: bool = False,
                   index=None, source_dataset: str | None = None):
    """The shared launcher for the cost-family seam fixpoints: big
    rounds go through ray.data (streaming, batched); small delta
    rounds go through plain Ray tasks over the same kernel — same
    rows either way (the kernel is deterministic per tile id)."""

    def run(tile_ids, inflow, final):
        if isinstance(inflow, seamdist.DistInflow):
            fn = as_task_fn(_CostTiles, world_path=world_path,
                            dataset=dataset, target=int(target),
                            hole=hole, inflow_ref=None, final=final,
                            alloc=alloc,
                            index=index if final else None,
                            source_dataset=source_dataset)
            return inflow.work_ds(tile_ids).map_batches(
                fn, batch_format="pyarrow", batch_size=batch_size)
        ref = (ray.put(_pack_inflow_arrays(inflow))
               if inflow else None)
        if not final and len(tile_ids) <= _SMALL_ROUND_MAX:
            @ray.remote(num_cpus=1)
            def _chunk(ids):
                k = _CostTiles(world_path, dataset, int(target), hole,
                               ref, False, alloc=alloc, index=None,
                               source_dataset=source_dataset)
                return k(pa.table({"id": pa.array(ids, pa.int64())}))
            chunks = [tile_ids[i:i + 32]
                      for i in range(0, len(tile_ids), 32)]
            tables = ray.get([_chunk.remote(list(c)) for c in chunks])
            return pa.concat_tables(tables).to_pandas()
        fn = as_task_fn(_CostTiles, world_path=world_path,
                        dataset=dataset, target=int(target), hole=hole,
                        inflow_ref=ref, final=final, alloc=alloc,
                        index=index if final else None,
                        source_dataset=source_dataset)
        items = [{"id": int(i)} for i in tile_ids]
        return (ray.data.from_items(items)
                .map_batches(fn, batch_format="pyarrow",
                             batch_size=batch_size))

    return run


def _min_seam_fixpoint(run, present_tiles: list[int], what: str, *,
                       grid=None):
    """Seam MIN-exchange delta iteration to convergence: ``run(ids,
    inflow, final=False)`` yields (src, dst, px, dist) offer rows;
    the fold keeps the per-destination-pixel minimum and re-queues
    exactly the tiles whose boundary candidates improved. Distances
    decrease monotonically over bounded integers, so this terminates.
    Returns (converged inflow, rounds). Pass ``grid`` to enable the
    ``seamdist`` distributed fold above the seam-row threshold (see
    ``_accum_fixpoint``); callers whose FINAL consumer needs driver-
    side random tile access (``cost_path``'s path walk) omit it and
    keep the driver fold — the walk is path-length-sized anyway."""
    if grid is not None and seamdist.use_distributed(present_tiles,
                                                     grid):
        return seamdist.fixpoint(run, present_tiles, kind="min",
                                 what=what,
                                 max_rounds=_COST_MAX_ROUNDS)
    return _driver_seam_fold(run, present_tiles, what,
                             _COST_MAX_ROUNDS, "dist", np.minimum)


def cost_allocation(world_path: str, dataset: str = "kg",
                    target: int = 14, *, hole_value: int | None = None,
                    batch_size: int = 64, with_rounds: bool = False):
    """(kind, size, n) summary of least-cost ALLOCATION (the ESRI
    Cost Allocation / weighted-Voronoi product, GDAL's proximity
    allocation generalized to a cost surface): every passable pixel
    is assigned to the ``target``-class source pixel that serves its
    least-cost distance, ties broken toward the smallest source
    global pixel id. Rows: ("alloc", s, k) — k allocation regions of
    exactly s pixels (source pixels count toward their own region);
    ("unreachable", e, 1) — e passable pixels no source reaches.

    Same seam machinery as ``cost_distance`` over PACKED keys
    dist * 2^31 + src_gid (see ``_ALLOC_SCALE``): lexicographic
    (dist, src) min is integer min on the packed key, so the unique-
    least-fixpoint argument — and hence bit-exactness vs the
    sequential ``oracle.cost_allocation_oracle`` — carries over
    unchanged. The final pass emits (src, n_px) partials; region
    sizes and the size histogram are two tiny grouped sums."""
    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    nodata = int(layout[dataset]["nodata"])
    hole = nodata if hole_value is None else int(hole_value)
    present_tiles = _present_tiles(world_path, dataset, grid)

    run = _make_cost_run(world_path, dataset, int(target), hole,
                         batch_size, alloc=True)

    inflow, rounds = _min_seam_fixpoint(run, present_tiles,
                                        "cost-allocation", grid=grid)

    from ray.data.aggregate import Sum
    # final partials: column "dist" holds the source pixel id
    # (-1 = unreachable); region size = Σ n_px per source
    sizes = (run(present_tiles, inflow, final=True)
             .groupby("dist")
             .aggregate(Sum("n_px", alias_name="n_px"))
             .to_pandas())
    unreach = int(sizes.loc[sizes["dist"] == -1, "n_px"].sum())
    reg = sizes[sizes["dist"] >= 0]
    u, cnt = np.unique(reg["n_px"].to_numpy(np.int64),
                       return_counts=True)
    out = pd.DataFrame({"kind": ["alloc"] * len(u),
                        "size": u.astype(np.int64),
                        "n": cnt.astype(np.int64)})
    if unreach:
        out = pd.concat(
            [out, pd.DataFrame({"kind": ["unreachable"],
                                "size": [np.int64(unreach)],
                                "n": [np.int64(1)]})],
            ignore_index=True)
    if with_rounds:
        return out, rounds
    return out


def zonal_cost_stats(world_path: str, dataset: str = "kg",
                     target: int = 14, *,
                     hole_value: int | None = None,
                     batch_size: int = 64) -> pd.DataFrame:
    """Per-admin accessibility statistics over the least-cost field:
    (n_reach, sum_dist, min_dist, max_dist, n_unreach) per admin —
    the 'mean cost-to-nearest-water per country' product, composing
    the cost_distance fixpoint with the zonal PIP claims (the
    zonal_window_stats discipline: double-claim parity included; the
    per-admin partials are order-free int64 rows, exact under any
    partitioning; mean = sum/n is left to the caller). Admins with no
    reachable pixel report min_dist = max_dist = -1."""
    from .extract import build_zonal_index

    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    nodata = int(layout[dataset]["nodata"])
    hole = nodata if hole_value is None else int(hole_value)
    present_tiles = _present_tiles(world_path, dataset, grid)
    index = build_zonal_index(world_path)

    run = _make_cost_run(world_path, dataset, int(target), hole,
                         batch_size, index=index)

    inflow, _rounds = _min_seam_fixpoint(run, present_tiles,
                                         "zonal-cost-stats",
                                         grid=grid)

    from ray.data.aggregate import Max, Min, Sum
    out = (run(present_tiles, inflow, final=True)
           .groupby("admin")
           .aggregate(Sum("n_reach", alias_name="n_reach"),
                      Sum("sum_dist", alias_name="sum_dist"),
                      Min("min_dist", alias_name="min_dist"),
                      Max("max_dist", alias_name="max_dist"),
                      Sum("n_unreach", alias_name="n_unreach"))
           .to_pandas())
    for c in out.columns:
        if c != "admin":
            out[c] = out[c].astype(np.int64)
    out.loc[out["min_dist"] >= int(_UNREACH), "min_dist"] = -1
    return (out[["admin", "n_reach", "sum_dist", "min_dist",
                 "max_dist", "n_unreach"]]
            .sort_values("admin").reset_index(drop=True))


# ---------------------------------------------------- flow path length

class _FlowLenTiles:
    """Per-tile D8 flow-path-length kernel for ``flow_path_length``:
    weighted pointer doubling — ``steps[x]`` is always the edge count
    x -> parent[x], terminals are self-parented with their own cost
    carried separately (pit 0, external drain 1, cross-seam resolved
    by the driver chase) — so one pass emits, per tile:

    * ring rows (node, cls, aux, steps): each border pixel's in-tile
      steps to its local root plus that root's class/aux — what a
      neighbor's chase needs;
    * count rows (-1, cls, aux, steps, n): pixels grouped by (local
      root, in-tile steps) — final length = steps + resolve(root).
    """

    def __init__(self, world_path: str, dataset: str, hole: int):
        self.media = MediaStore(world_path)
        layout = model.world_layout(world_path)
        self.grid = world_grid(world_path, layout[dataset]["grid"])
        self.dataset = dataset
        self.hole = hole

    def _dims(self, ty: int, tx: int) -> tuple[int, int]:
        g = self.grid
        return (min(g.tile, g.height - ty * g.tile),
                min(g.tile, g.width - tx * g.tile))

    def __call__(self, b: pa.Table) -> pa.Table:
        g = self.grid
        t = g.tile
        tcap = t * t
        ids = b["id"].to_numpy(zero_copy_only=False)
        plans, want = [], set()
        for pid in ids:
            ty, tx = int(pid) // g.tiles_x, int(pid) % g.tiles_x
            nbrs = {}
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ny, nx = ty + dy, tx + dx
                    if 0 <= ny < g.tiles_y and 0 <= nx < g.tiles_x:
                        r = model.media_ref(self.dataset, g.name, ny, nx, 1)
                        nbrs[(dy, dx)] = (ny, nx, r)
                        want.add(r)
            plans.append((ty, tx, nbrs))
        payloads = self.media.fetch(sorted(want), strict=False)

        o_node: list[np.ndarray] = []
        o_cls: list[np.ndarray] = []
        o_aux: list[np.ndarray] = []
        o_steps: list[np.ndarray] = []
        o_n: list[np.ndarray] = []
        for ty, tx, nbrs in plans:
            if payloads.get(nbrs[(0, 0)][2]) is None:
                continue
            nr, nc = self._dims(ty, tx)
            pad = _assemble_pad(payloads, nbrs, nr, nc, self._dims,
                                self.hole)
            code = flowdir_codes(pad).ravel()
            npx = nr * nc
            rr = np.repeat(np.arange(nr, dtype=np.int64), nc)
            cc = np.tile(np.arange(nc, dtype=np.int64), nr)
            tr = rr + _DY[code]
            tc = cc + _DX[code]
            flows = code != 0
            intile = (flows & (tr >= 0) & (tr < nr)
                      & (tc >= 0) & (tc < nc))

            gidx = (ty * t + rr) * g.width + (tx * t + cc)
            cls = np.full(npx, _PIT, dtype=np.int64)
            aux = gidx.copy()
            cls[flows] = _EXT
            aux[flows] = -1

            pres33 = np.zeros((3, 3), dtype=bool)
            for (dy, dx), (_ny, _nx, r) in nbrs.items():
                pres33[dy + 1, dx + 1] = payloads.get(r) is not None
            gy = ty * t + tr
            gx = tx * t + tc
            sel = np.flatnonzero(flows & ~intile
                                 & (gy >= 0) & (gy < g.height)
                                 & (gx >= 0) & (gx < g.width))
            if len(sel):
                nty = gy[sel] // t
                ntx_ = gx[sel] // t
                sel = sel[pres33[nty - ty + 1, ntx_ - tx + 1]]
            if len(sel):
                nty = gy[sel] // t
                ntx_ = gx[sel] // t
                dst_w = np.minimum(t, g.width - ntx_ * t)
                cls[sel] = _CROSS
                aux[sel] = ((nty * g.tiles_x + ntx_) * tcap
                            + (gy[sel] - nty * t) * dst_w
                            + (gx[sel] - ntx_ * t))

            parent = np.arange(npx, dtype=np.int64)
            parent[intile] = (tr * nc + tc)[intile]
            steps = intile.astype(np.int64)
            for _ in range(int(np.ceil(np.log2(max(npx, 2)))) + 1):
                steps = steps + steps[parent]
                parent = parent[parent]
            rcls = cls[parent]
            raux = aux[parent]

            ring = np.flatnonzero((rr == 0) | (rr == nr - 1)
                                  | (cc == 0) | (cc == nc - 1))
            tile_id = ty * g.tiles_x + tx
            o_node.append(tile_id * tcap + ring)
            o_cls.append(rcls[ring])
            o_aux.append(raux[ring])
            o_steps.append(steps[ring])
            o_n.append(np.zeros(len(ring), dtype=np.int64))

            key = (parent * np.int64(1 << 20)) + steps  # steps <= 255
            uk, cnt = np.unique(key, return_counts=True)
            ur = (uk >> 20).astype(np.int64)
            us = (uk & ((1 << 20) - 1)).astype(np.int64)
            o_node.append(np.full(len(uk), -1, dtype=np.int64))
            o_cls.append(cls[ur])
            o_aux.append(aux[ur])
            o_steps.append(us)
            o_n.append(cnt.astype(np.int64))

        cat = (lambda xs: np.concatenate(xs) if xs
               else np.zeros(0, dtype=np.int64))
        return pa.table({"node": pa.array(cat(o_node)),
                         "cls": pa.array(cat(o_cls)),
                         "aux": pa.array(cat(o_aux)),
                         "steps": pa.array(cat(o_steps)),
                         "n": pa.array(cat(o_n))})


def flow_path_length(world_path: str, dataset: str = "kg", *,
                     hole_value: int | None = None,
                     batch_size: int = 64) -> pd.DataFrame:
    """(path_len, n_px) histogram of D8 flow-path length — the ArcGIS
    Flow Length (downstream) product: edges traversed from each
    present pixel until its flow terminates at a pit (cost 0 past the
    last edge) or drains externally off-frame / into a hole (the
    final move counts). Completes the hydrology family (accumulation,
    watershed, Strahler, cost distance).

    Scale design: ONE shuffle-free pass — weighted in-tile pointer
    doubling (steps ride along with the parent jumps, terminals are
    self-parented so the guard invariant 'steps = edges to parent'
    holds throughout), O(tile edge) ring rows + O(distinct (root,
    steps)) count rows out; the driver chase resolves cross-seam
    offsets with memoization (the watershed seam-graph precedent).
    Strictly-downhill D8 over uint8 bounds every path at 255 edges,
    so the chase depth is bounded too. Bit-exact vs
    ``oracle.flowlen_oracle``."""
    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    nodata = int(layout[dataset]["nodata"])
    hole = nodata if hole_value is None else int(hole_value)
    present_tiles = _present_tiles(world_path, dataset, grid)

    fn = as_task_fn(_FlowLenTiles, world_path=world_path,
                    dataset=dataset, hole=hole)
    rows_ds = (ray.data.from_items([{"id": int(i)}
                                    for i in present_tiles])
               .map_batches(fn, batch_format="pyarrow",
                            batch_size=batch_size))
    if seamdist.use_distributed(present_tiles, grid):
        return _flowlen_distributed(rows_ds)
    rows = rows_ds.to_pandas()

    ring = rows[rows["node"] >= 0]
    res: dict[int, tuple[int, int, int]] = {
        int(nd): (int(c), int(a), int(s))
        for nd, c, a, s in zip(ring["node"], ring["cls"],
                               ring["aux"], ring["steps"])}
    memo: dict[tuple[int, int], int] = {}

    def resolve(cls: int, aux: int) -> int:
        """Offset past the local root: 0 for a pit, 1 for external
        drainage, 1 + dst steps + resolve(dst root) across a seam."""
        path: list[tuple[int, int]] = []
        total = 0
        while cls == _CROSS:
            if (cls, aux) in memo:
                total += memo[(cls, aux)]
                break
            path.append((cls, aux))
            if len(path) > MAX_ROUNDS:
                raise AssertionError("flow-length chase too deep")
            c2, a2, s2 = res[aux]
            total += 1 + s2
            cls, aux = c2, a2
        else:
            total += 0 if cls == _PIT else 1
        # memoize suffix offsets along the chased path
        acc = total
        for (c0, a0) in path:
            memo[(c0, a0)] = acc
            c2, a2, s2 = res[a0]
            acc -= 1 + s2
        return total

    cnt = rows[rows["node"] < 0]
    hist: dict[int, int] = {}
    for c, a, s, n in zip(cnt["cls"], cnt["aux"], cnt["steps"],
                          cnt["n"]):
        ln = int(s) + resolve(int(c), int(a))
        hist[ln] = hist.get(ln, 0) + int(n)
    keys = sorted(hist)
    return pd.DataFrame({"path_len": np.asarray(keys, np.int64),
                         "n_px": np.asarray([hist[k] for k in keys],
                                            np.int64)})


def _flowlen_distributed(rows_ds) -> pd.DataFrame:
    """Distributed twin of the flow-length driver chase: weighted
    pointer doubling over the ring Dataset (``seamdist.chase_resolve``
    accumulates the 1 + dst-steps offsets per seam crossing), count
    rows resolve with ONE join, and the (path_len, n_px) histogram is
    a grouped sum — only the histogram reaches the driver. Bit-equal
    to the memoized sequential chase (pure function application)."""
    from ray.data.aggregate import Sum

    rows_ds = rows_ds.materialize()

    def ring_proj(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "s": b["steps"],
                         "cls": b["cls"].cast(pa.int64()),
                         "aux": b["aux"]})

    resolved = seamdist.chase_resolve(
        rows_ds.filter(expr="node >= 0")
        .map_batches(ring_proj, batch_format="pyarrow"),
        cross=_CROSS)

    counts = rows_ds.filter(expr="node < 0")
    term = counts.filter(expr=f"cls != {_CROSS}")
    crossed = counts.filter(expr=f"cls == {_CROSS}")

    def term_rows(b: pa.Table) -> pa.Table:
        # pit terminal adds 0 past the local root, external adds 1
        cls = b["cls"].to_numpy(zero_copy_only=False)
        ln = (b["steps"].to_numpy(zero_copy_only=False)
              + (cls != _PIT).astype(np.int64))
        return pa.table({"path_len": pa.array(ln), "n_px": b["n"]})

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"node2": b["node"], "s2": b["s"],
                         "cls2": b["cls"], "acc2": b["acc"]})

    from ..datapipe.util import shuffle_width
    joined = crossed.join(
        resolved.map_batches(rename, batch_format="pyarrow")
        .materialize(),
        join_type="inner",
        num_partitions=shuffle_width(blocks=resolved.num_blocks()),
        on=("aux",), right_on=("node2",))

    def joined_rows(b: pa.Table) -> pa.Table:
        cls2 = b["cls2"].to_numpy(zero_copy_only=False)
        ln = (b["steps"].to_numpy(zero_copy_only=False) + 1
              + b["s2"].to_numpy(zero_copy_only=False)
              + b["acc2"].to_numpy(zero_copy_only=False)
              + (cls2 != _PIT).astype(np.int64))
        return pa.table({"path_len": pa.array(ln), "n_px": b["n"]})

    hist = (term.map_batches(term_rows, batch_format="pyarrow")
            .union(joined.map_batches(joined_rows,
                                      batch_format="pyarrow"))
            .groupby("path_len")
            .aggregate(Sum("n_px", alias_name="n_px"))
            .to_pandas())
    for c in hist.columns:
        hist[c] = hist[c].astype(np.int64)
    return hist.sort_values("path_len").reset_index(drop=True)


# ------------------------------------------------------ least-cost path

def _tile_dist_field(media: MediaStore, grid, dataset: str, target: int,
                     hole: int, inflow: dict, ty: int, tx: int,
                     alloc: bool = False) -> np.ndarray | None:
    """Recompute ONE tile's converged interior distance field from the
    seam fixpoint's inflow table (exactly the kernel's computation for
    a single plan entry — deterministic, so any re-evaluation agrees
    with the distributed pass bit-for-bit). Returns (nr, nc) int64 or
    None for an absent tile."""
    t = grid.tile
    nbrs, want = {}, set()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ny, nx = ty + dy, tx + dx
            if 0 <= ny < grid.tiles_y and 0 <= nx < grid.tiles_x:
                r = model.media_ref(dataset, grid.name, ny, nx, 1)
                nbrs[(dy, dx)] = (ny, nx, r)
                want.add(r)
    payloads = media.fetch(sorted(want), strict=False)
    if payloads.get(nbrs[(0, 0)][2]) is None:
        return None
    nr = min(t, grid.height - ty * t)
    nc = min(t, grid.width - tx * t)

    def dims(ny, nx):
        return (min(t, grid.height - ny * t),
                min(t, grid.width - nx * t))

    pad = _assemble_pad(payloads, nbrs, nr, nc, dims, hole)
    cost_pad = pad.astype(np.int64)
    passable_pad = pad != hole
    dist_pad = np.full((nr + 2, nc + 2), _UNREACH, dtype=np.int64)
    interior = dist_pad[1:1 + nr, 1:1 + nc]
    src_mask = passable_pad[1:1 + nr, 1:1 + nc] & (
        pad[1:1 + nr, 1:1 + nc] == target)
    interior[src_mask] = 0
    inf = _inflow_arrays(inflow.get(ty * grid.tiles_x + tx))
    if inf is not None:
        idx, val = inf
        np.minimum.at(interior, (idx // nc, idx % nc), val)
    for _ in range(nr * nc + 2):
        before = dist_pad.copy()
        _cost_relax_pad(dist_pad, cost_pad, passable_pad, nr, nc)
        if np.array_equal(before, dist_pad):
            break
    else:
        raise AssertionError("in-tile cost fixpoint overran")
    return interior.copy()


def cost_path(world_path: str, dataset: str = "kg", target: int = 14,
              *, hole_value: int | None = None,
              batch_size: int = 64) -> pd.DataFrame:
    """Least-cost PATH extraction (GRASS ``r.drain`` / ESRI Cost Path):
    from the farthest reachable pixel (max finite distance, smallest
    gid on ties), walk downhill along the converged min-plus field to
    the nearest ``target`` source: at every step the chosen neighbor u
    satisfies dist(p) == dist(u) + w(u, p) exactly (ties toward the
    smallest (dist, gid)), so the emitted per-step costs TELESCOPE to
    the starting distance — the result self-verifies against
    ``cost_distance`` with no extra oracle. Returns (step, gy, gx,
    dist) rows, source last.

    Scale shape: the fixpoint is the shared distributed pass; the
    walk itself is O(path length) with one memoized single-tile field
    re-evaluation per visited tile (point lookups over the converged
    inflow — never a full-world materialization)."""
    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    nodata = int(layout[dataset]["nodata"])
    hole = nodata if hole_value is None else int(hole_value)
    present_tiles = _present_tiles(world_path, dataset, grid)

    run = _make_cost_run(world_path, dataset, int(target), hole,
                         batch_size)

    inflow, _ = _min_seam_fixpoint(run, present_tiles, "cost-path")

    media = MediaStore(world_path)
    t = grid.tile
    fields: dict[int, np.ndarray | None] = {}
    arrs: dict[int, np.ndarray | None] = {}

    def field(ty: int, tx: int) -> np.ndarray | None:
        tid = ty * grid.tiles_x + tx
        if tid not in fields:
            fields[tid] = _tile_dist_field(media, grid, dataset,
                                           int(target), hole, inflow,
                                           ty, tx)
        return fields[tid]

    def tile_arr(ty: int, tx: int) -> np.ndarray | None:
        tid = ty * grid.tiles_x + tx
        if tid not in arrs:
            pay = media.fetch(
                [model.media_ref(dataset, grid.name, ty, tx, 1)],
                strict=False)
            p = next(iter(pay.values()), None)
            arrs[tid] = (None if p is None else np.frombuffer(
                p, np.uint8).reshape(min(t, grid.height - ty * t),
                                     min(t, grid.width - tx * t)))
        return arrs[tid]

    # destination: max finite distance, smallest gid on ties
    best = (-1, None)
    for tid in present_tiles:
        ty, tx = tid // grid.tiles_x, tid % grid.tiles_x
        f = field(ty, tx)
        if f is None:
            continue
        finite = f[f < _UNREACH]
        if not len(finite):
            continue
        mx = int(finite.max())
        ys, xs = np.nonzero(f == mx)
        gid = int((ty * t + ys[0]) * grid.width + (tx * t + xs[0]))
        if mx > best[0] or (mx == best[0] and (best[1] is None
                                               or gid < best[1])):
            best = (mx, gid)
    if best[1] is None:
        return pd.DataFrame({"step": pd.Series([], dtype=np.int64),
                             "gy": pd.Series([], dtype=np.int64),
                             "gx": pd.Series([], dtype=np.int64),
                             "dist": pd.Series([], dtype=np.int64)})

    gy, gx = best[1] // grid.width, best[1] % grid.width
    rows = []
    cur = int(best[0])
    guard = 0
    while True:
        rows.append((len(rows), gy, gx, cur))
        if cur == 0:
            break
        guard += 1
        if guard > grid.height * grid.width:
            raise AssertionError("cost path walk did not terminate")
        # evaluate the 8 neighbors: exact predecessor has
        # dist(u) + (c(u)+c(p)) * w == dist(p)
        ty, tx = gy // t, gx // t
        arr = tile_arr(ty, tx)
        cp = int(arr[gy - ty * t, gx - tx * t])
        cands = []
        for dy, dx, w in _COST_MOVES:
            ny, nx = gy + dy, gx + dx
            if not (0 <= ny < grid.height and 0 <= nx < grid.width):
                continue
            nty, ntx_ = ny // t, nx // t
            fn_ = field(nty, ntx_)
            if fn_ is None:
                continue
            du = int(fn_[ny - nty * t, nx - ntx_ * t])
            if du >= _UNREACH:
                continue
            arrn = tile_arr(nty, ntx_)
            cu = int(arrn[ny - nty * t, nx - ntx_ * t])
            if du + (cu + cp) * w == cur:
                cands.append((du, ny * grid.width + nx, ny, nx))
        if not cands:
            raise AssertionError("no exact predecessor on cost path "
                                 f"at ({gy}, {gx}) dist {cur}")
        cands.sort()
        cur, _gid, gy, gx = cands[0]
    out = pd.DataFrame(rows, columns=["step", "gy", "gx", "dist"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def cost_distance_cross(world_path: str, cost_dataset: str = "kg",
                        source_dataset: str = "wk", target: int = 5,
                        *, hole_value: int | None = None,
                        batch_size: int = 64,
                        with_rounds: bool = False):
    """Cross-layer least-cost distance — the REAL ``r.cost`` shape:
    the traversal-cost surface and the source layer are DIFFERENT
    (same-grid) datasets, e.g. 'cost over terrain (kg) to the nearest
    workability-class-5 cell (wk)'. Sources are pixels where the
    source layer equals ``target`` (and is not ITS nodata) at
    positions passable on the COST layer; everything else —
    passability, the metric, the seam fixpoint, the unique-least-
    fixpoint bit-exactness — is ``cost_distance`` unchanged. The
    source tile payload is one more derived ref in the same batched
    fetch (the J4 align-join discipline)."""
    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[cost_dataset]["grid"])
    nodata = int(layout[cost_dataset]["nodata"])
    hole = nodata if hole_value is None else int(hole_value)
    present_tiles = _present_tiles(world_path, cost_dataset, grid)
    run = _make_cost_run(world_path, cost_dataset, int(target), hole,
                         batch_size, source_dataset=source_dataset)
    inflow, rounds = _min_seam_fixpoint(run, present_tiles,
                                        "cost-distance-cross",
                                        grid=grid)
    from ray.data.aggregate import Sum
    out = (run(present_tiles, inflow, final=True)
           .groupby("dist")
           .aggregate(Sum("n_px", alias_name="n_px"))
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    out = out.sort_values("dist").reset_index(drop=True)
    if with_rounds:
        return out, rounds
    return out


# ---------------------------------------------------------------------------
# depression filling — GRASS r.fill.dir / Planchon-Darboux /
# priority-flood family (Barnes, Lehman & Mulla 2014)
# ---------------------------------------------------------------------------
#
# Semantics (exact, all-integer): treat the dataset band as an integer
# DEM E. The filled surface W is the GREATEST fixpoint of
#
#     W_p = max(E_p, min over 8-neighbors q of W_q)
#
# with drains contributing W = 0: nodata pixels, absent (sparse/ocean)
# tiles and off-grid cells all drain freely (the usual nodata-as-
# outlet convention). Equivalently W_p = min over paths p -> drain of
# the path's running max elevation — the bottleneck (minimax) path
# problem, the (max, min) dual of the cost family's min-plus.
#
# Bit-exactness is STRUCTURAL, like the cost family: iterating the
# monotone operator down from +inf converges to the unique greatest
# fixpoint regardless of update order (chaotic iteration), so the
# distributed block-Jacobi result equals the sequential priority-flood
# result exactly — no summation-order discipline needed. Values only
# DECREASE over bounded integers, so the seam fixpoint terminates.


class _FillTiles:
    """Per-tile depression-fill kernel: given the current best
    boundary candidates (``inflow_ref``: {tile_id: {px_flat: W}}),
    run the in-tile max-min fixpoint (vectorized Gauss-Seidel
    sweeps), then either emit seam offers — (src_tile, dst_tile,
    dst_px, W-candidate) rows for passable halo pixels, O(tile edge)
    per tile — or, with ``final=True``, the (depth = W - E, n_px)
    histogram partials over passable pixels (and, with ``write_to``,
    the filled tiles themselves as a derived world dataset)."""

    def __init__(self, world_path: str, dataset: str, hole: int,
                 inflow_ref, final: bool, write_to: str | None = None,
                 out_dataset: str | None = None, index=None):
        self.media = MediaStore(world_path)
        layout = model.world_layout(world_path)
        self.grid_name = layout[dataset]["grid"]
        self.grid = world_grid(world_path, self.grid_name)
        self.dataset = dataset
        self.hole = hole
        self.final = final
        self.write_to = write_to
        self.out_dataset = out_dataset
        self.index = index   # zonal PIP index -> per-admin final rows
        self.inflow = ray.get(inflow_ref) if inflow_ref is not None else {}

    def _tile_row(self, ty: int, tx: int, nr: int, nc: int,
                  filled: np.ndarray) -> dict:
        """One filled tile as a (document, media) row in the world
        layout (the transcode_media sink discipline); rows batch up
        per map_batches call and write as one atomic part."""
        g = self.grid
        doc = model.make_document(
            self.out_dataset, self.grid_name, ty, tx,
            tx * g.tile, ty * g.tile, nc, nr, bands=1,
            nodata=int(self.hole))
        return {"doc_id": doc["doc_id"], "spans": doc["spans"],
                "media_ref": model.media_ref(
                    self.out_dataset, self.grid_name, ty, tx, 1),
                "payload": filled.tobytes()}

    def _dims(self, ty: int, tx: int) -> tuple[int, int]:
        g = self.grid
        return (min(g.tile, g.height - ty * g.tile),
                min(g.tile, g.width - tx * g.tile))

    def __call__(self, b: pa.Table) -> pa.Table:
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
                        r = model.media_ref(self.dataset, g.name, ny, nx, 1)
                        nbrs[(dy, dx)] = (ny, nx, r)
                        want.add(r)
            plans.append((ty, tx, nbrs))
        payloads = self.media.fetch(sorted(want), strict=False)
        batch_inflow = seamdist.unpack_inflow(b, "in")
        inflow = self.inflow if batch_inflow is None else batch_inflow

        o_src: list[np.ndarray] = []
        o_dst: list[np.ndarray] = []
        o_px: list[np.ndarray] = []
        o_val: list[np.ndarray] = []
        hist: dict[int, int] = {}
        out_rows: list[dict] = []
        zacc: dict[str, list] = {}
        for ty, tx, nbrs in plans:
            if payloads.get(nbrs[(0, 0)][2]) is None:
                continue
            nr, nc = self._dims(ty, tx)
            pad = _assemble_pad(payloads, nbrs, nr, nc, self._dims,
                                self.hole)
            e_pad = pad.astype(np.int64)
            passable_pad = pad != self.hole
            # drains (nodata / absent / off-grid) sit at W = 0 and
            # are never raised; passable cells start at +inf
            w_pad = np.where(passable_pad, _UNREACH, np.int64(0))
            interior = w_pad[1:1 + nr, 1:1 + nc]
            e_int = e_pad[1:1 + nr, 1:1 + nc]
            inf = _inflow_arrays(inflow.get(ty * g.tiles_x + tx))
            if inf is not None:
                idx, val = inf
                np.minimum.at(interior, (idx // nc, idx % nc), val)
            # in-tile fixpoint: each sweep only lowers values (every
            # candidate is >= the greatest fixpoint), so a no-op
            # sweep IS the fixpoint given the current boundary
            for _ in range(nr * nc + 2):
                before = interior.copy()
                for dy, dx, _w in _COST_MOVES:
                    src = w_pad[1 + dy:1 + dy + nr, 1 + dx:1 + dx + nc]
                    np.minimum(interior, np.maximum(e_int, src),
                               out=interior)
                if np.array_equal(before, interior):
                    break
            else:
                raise AssertionError("in-tile fill fixpoint overran")

            if self.final and self.index is not None:
                pin = passable_pad[1:1 + nr, 1:1 + nc]
                depth = interior - e_int
                for _fidx, admin, mask in self.index.assign_tile(
                        self.grid, ty, tx):
                    d = depth[mask & pin]
                    if not len(d):
                        continue
                    if (d >= _UNREACH).any():
                        raise AssertionError("unreached passable pixel")
                    row = [len(d), int(d.sum()), int(d.max()),
                           int((d > 0).sum())]
                    cur = zacc.get(admin)
                    if cur is None:
                        zacc[admin] = row
                    else:
                        cur[0] += row[0]
                        cur[1] += row[1]
                        cur[2] = max(cur[2], row[2])
                        cur[3] += row[3]
                continue

            if self.final:
                pin = passable_pad[1:1 + nr, 1:1 + nc]
                w = interior[pin]
                if (w >= _UNREACH).any():
                    raise AssertionError(
                        "fill fixpoint left unreached passable pixels")
                if self.write_to is not None:
                    filled = np.where(pin, interior,
                                      np.int64(self.hole))
                    if pin.any() and int(filled[pin].max()) > 255:
                        raise AssertionError("filled surface > uint8")
                    out_rows.append(self._tile_row(
                        ty, tx, nr, nc, filled.astype(np.uint8)))
                u, cnt = np.unique(w - e_int[pin], return_counts=True)
                for v, n in zip(u.tolist(), cnt.tolist()):
                    hist[v] = hist.get(v, 0) + n
                continue

            # outward pass: offer max(E_halo, W_interior-neighbor) to
            # every passable halo pixel of a PRESENT neighbor tile
            off_pad = np.full((nr + 2, nc + 2), _UNREACH, dtype=np.int64)
            for dy, dx, _w in _COST_MOVES:
                dst = (slice(1 + dy, 1 + dy + nr),
                       slice(1 + dx, 1 + dx + nc))
                np.minimum(off_pad[dst],
                           np.maximum(e_pad[dst], interior),
                           out=off_pad[dst])
            pres33 = np.zeros((3, 3), dtype=bool)
            for (dy, dx), (_ny, _nx, r) in nbrs.items():
                pres33[dy + 1, dx + 1] = payloads.get(r) is not None
            halo = np.ones((nr + 2, nc + 2), dtype=bool)
            halo[1:-1, 1:-1] = False
            pr, pc = np.nonzero(halo & passable_pad
                                & (off_pad < _UNREACH))
            if not len(pr):
                continue
            gy = ty * t + pr - 1
            gx = tx * t + pc - 1
            keep = (gy >= 0) & (gy < g.height) & (gx >= 0) & (gx < g.width)
            pr, pc, gy, gx = pr[keep], pc[keep], gy[keep], gx[keep]
            if not len(pr):
                continue
            nty = gy // t
            ntx_ = gx // t
            keep = pres33[nty - ty + 1, ntx_ - tx + 1]
            pr, pc, gy, gx = pr[keep], pc[keep], gy[keep], gx[keep]
            if not len(pr):
                continue
            nty = gy // t
            ntx_ = gx // t
            dst_w = np.minimum(t, g.width - ntx_ * t)
            o_src.append(np.full(len(pr), ty * g.tiles_x + tx,
                                 dtype=np.int64))
            o_dst.append(nty * g.tiles_x + ntx_)
            o_px.append((gy - nty * t) * dst_w + (gx - ntx_ * t))
            o_val.append(off_pad[pr, pc])

        if self.final and self.index is not None:
            admins = sorted(zacc)
            cols = (np.array([zacc[a] for a in admins], dtype=np.int64)
                    if admins else np.zeros((0, 4), dtype=np.int64))
            return pa.table({
                "admin": pa.array(admins, pa.string()),
                "n_px": pa.array(cols[:, 0]),
                "sum_depth": pa.array(cols[:, 1]),
                "max_depth": pa.array(cols[:, 2]),
                "n_filled": pa.array(cols[:, 3])})
        if self.final:
            if self.write_to is not None and out_rows:
                from .render import _RenderWriter
                _RenderWriter(self.write_to)(pa.Table.from_pylist(
                    out_rows, schema=pa.schema([
                        ("doc_id", pa.string()),
                        ("spans", pa.list_(model.SPAN_TYPE)),
                        ("media_ref", pa.string()),
                        ("payload", pa.binary())])))
            keys = sorted(hist)
            return pa.table({
                "depth": pa.array(keys, pa.int64()),
                "n_px": pa.array([hist[k] for k in keys], pa.int64())})
        cat = (lambda xs: np.concatenate(xs) if xs
               else np.zeros(0, dtype=np.int64))
        return pa.table({"src": pa.array(cat(o_src)),
                         "dst": pa.array(cat(o_dst)),
                         "px": pa.array(cat(o_px)),
                         "dist": pa.array(cat(o_val))})


def _make_fill_run(world_path: str, dataset: str, hole: int,
                   batch_size: int, *, index=None,
                   write_to: str | None = None,
                   out_dataset: str | None = None):
    """Launcher for the fill seam fixpoint: big rounds via ray.data,
    small delta rounds via plain tasks (the ``_make_cost_run``
    fast-path discipline; rows identical either way). ``index`` /
    ``write_to`` / ``out_dataset`` apply to the FINAL pass only (the
    zonal-stats and write-the-filled-surface consumers), so those
    callers go through ``run(..., final=True)`` and inherit the
    distributed-inflow branch for free."""

    def run(tile_ids, inflow, final):
        if isinstance(inflow, seamdist.DistInflow):
            fn = as_task_fn(_FillTiles, world_path=world_path,
                            dataset=dataset, hole=hole,
                            inflow_ref=None, final=final,
                            index=index if final else None,
                            write_to=write_to if final else None,
                            out_dataset=out_dataset if final else None)
            return inflow.work_ds(tile_ids).map_batches(
                fn, batch_format="pyarrow", batch_size=batch_size)
        ref = (ray.put(_pack_inflow_arrays(inflow))
               if inflow else None)
        if not final and len(tile_ids) <= _SMALL_ROUND_MAX:
            @ray.remote(num_cpus=1)
            def _chunk(ids):
                k = _FillTiles(world_path, dataset, hole, ref, False)
                return k(pa.table({"id": pa.array(ids, pa.int64())}))
            chunks = [tile_ids[i:i + 32]
                      for i in range(0, len(tile_ids), 32)]
            tables = ray.get([_chunk.remote(list(c)) for c in chunks])
            return pa.concat_tables(tables).to_pandas()
        fn = as_task_fn(_FillTiles, world_path=world_path,
                        dataset=dataset, hole=hole, inflow_ref=ref,
                        final=final, index=index if final else None,
                        write_to=write_to if final else None,
                        out_dataset=out_dataset if final else None)
        items = [{"id": int(i)} for i in tile_ids]
        return (ray.data.from_items(items)
                .map_batches(fn, batch_format="pyarrow",
                             batch_size=batch_size))

    return run


def fill_sinks(world_path: str, dataset: str = "kg", *,
               hole_value: int | None = None, batch_size: int = 64,
               with_rounds: bool = False):
    """(depth, n_px) histogram of depression-fill depth W - E over
    passable pixels, where W is the filled surface (the GRASS
    ``r.fill.dir`` / Planchon-Darboux 2002 / priority-flood product;
    depth 0 rows are the pixels no fill touches). Nodata pixels,
    absent tiles and the grid frame all drain freely.

    Scale design — block-Jacobi max-min with seam min-exchange:
    identical round structure to ``cost_distance`` (one shuffle-free
    pass per round over exactly the tiles whose boundary candidates
    improved; O(tile edge) offer rows; driver min-fold) in the dual
    (max, min) bottleneck-path semiring. The greatest-fixpoint-from-
    above argument makes the result independent of tile shape, batch
    size and round order — bit-exact vs the sequential priority-flood
    ``oracle.fill_sinks_oracle``, an INDEPENDENT algorithm."""
    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    nodata = int(layout[dataset]["nodata"])
    hole = nodata if hole_value is None else int(hole_value)
    present_tiles = _present_tiles(world_path, dataset, grid)

    run = _make_fill_run(world_path, dataset, hole, batch_size)
    inflow, rounds = _min_seam_fixpoint(run, present_tiles,
                                        "fill-sinks", grid=grid)

    from ray.data.aggregate import Sum
    out = (run(present_tiles, inflow, final=True)
           .groupby("depth")
           .aggregate(Sum("n_px", alias_name="n_px"))
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    out = out.sort_values("depth").reset_index(drop=True)
    if with_rounds:
        return out, rounds
    return out


def fill_sinks_to_dataset(world_path: str, dataset: str,
                          out_dir: str, *,
                          hole_value: int | None = None,
                          batch_size: int = 64) -> pd.DataFrame:
    """DEM conditioning with a materialized product: run the
    ``fill_sinks`` fixpoint, then WRITE the filled surface as dataset
    ``{dataset}_filled`` in a self-describing derived world under
    ``out_dir`` (the warp_to_mercator marker contract) — so the
    standard hydrology chain fill → flow direction → accumulation
    runs on it unchanged, each stage a first-class dataset. Nodata
    pixels and absent tiles keep the hole value. Returns the
    (depth, n_px) histogram computed by the SAME final pass that
    writes the tiles (one pass, not two)."""
    import json

    from ray.data.aggregate import Sum

    layout = model.world_layout(world_path)
    grid_name = layout[dataset]["grid"]
    grid = world_grid(world_path, grid_name)
    nodata = int(layout[dataset]["nodata"])
    hole = nodata if hole_value is None else int(hole_value)
    present_tiles = _present_tiles(world_path, dataset, grid)

    out_ds = f"{dataset}_filled"
    run = _make_fill_run(world_path, dataset, hole, batch_size,
                         write_to=out_dir, out_dataset=out_ds)
    inflow, _rounds = _min_seam_fixpoint(run, present_tiles,
                                         "fill-sinks", grid=grid)

    import os
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_WORLD.json")
    meta = {"name": os.path.basename(out_dir.rstrip("/")), "scale": 0,
            "seed": 0, "datasets": [], "layout": {}, "grids": {}}
    if os.path.exists(marker):
        with open(marker) as f:
            meta.update(json.load(f))
    if out_ds not in meta.setdefault("datasets", []):
        meta["datasets"].append(out_ds)
    meta.setdefault("layout", {})[out_ds] = {
        "grid": grid_name, "bands": 1, "nodata": hole}
    meta.setdefault("grids", {})[grid_name] = {
        "width": grid.width, "height": grid.height, "tile": grid.tile}
    with open(marker, "w") as f:
        json.dump(meta, f)

    out = (run(present_tiles, inflow, final=True)
           .groupby("depth")
           .aggregate(Sum("n_px", alias_name="n_px"))
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("depth").reset_index(drop=True)


class _CorridorTiles:
    """Per-tile corridor kernel: re-evaluate BOTH converged distance
    fields from their seam-fixpoint inflow tables (deterministic, the
    cost_path re-evaluation discipline) and histogram the pixelwise
    sum over pixels both sources reach; pixels only one (or neither)
    source reaches count under key -1."""

    def __init__(self, world_path: str, dataset: str, target_a: int,
                 target_b: int, hole: int, inflow_a_ref, inflow_b_ref):
        self.media = MediaStore(world_path)
        layout = model.world_layout(world_path)
        self.grid = world_grid(world_path, layout[dataset]["grid"])
        self.dataset = dataset
        self.ta = int(target_a)
        self.tb = int(target_b)
        self.hole = hole
        self.inf_a = ray.get(inflow_a_ref) if inflow_a_ref else {}
        self.inf_b = ray.get(inflow_b_ref) if inflow_b_ref else {}

    def __call__(self, b: pa.Table) -> pa.Table:
        g = self.grid
        ba = seamdist.unpack_inflow(b, "a")
        bb = seamdist.unpack_inflow(b, "b")
        inf_a = self.inf_a if ba is None else ba
        inf_b = self.inf_b if bb is None else bb
        hist: dict[int, int] = {}
        for pid in b["id"].to_numpy(zero_copy_only=False):
            ty, tx = int(pid) // g.tiles_x, int(pid) % g.tiles_x
            fa = _tile_dist_field(self.media, g, self.dataset, self.ta,
                                  self.hole, inf_a, ty, tx)
            if fa is None:
                continue
            fb = _tile_dist_field(self.media, g, self.dataset, self.tb,
                                  self.hole, inf_b, ty, tx)
            nr, nc = fa.shape
            ref = model.media_ref(self.dataset, g.name, ty, tx, 1)
            arr = np.frombuffer(self.media.fetch([ref])[ref], np.uint8,
                                count=nr * nc).reshape(nr, nc)
            pin = arr != self.hole
            both = pin & (fa < _UNREACH) & (fb < _UNREACH)
            s = np.where(both, fa + fb, np.int64(-1))[pin]
            u, cnt = np.unique(s, return_counts=True)
            for v, n in zip(u.tolist(), cnt.tolist()):
                hist[v] = hist.get(v, 0) + n
        keys = sorted(hist)
        return pa.table({
            "total": pa.array(keys, pa.int64()),
            "n_px": pa.array([hist[k] for k in keys], pa.int64())})


def cost_corridor(world_path: str, dataset: str = "kg",
                  target_a: int = 14, target_b: int = 7, *,
                  hole_value: int | None = None,
                  batch_size: int = 64) -> pd.DataFrame:
    """(total, n_px) histogram of the corridor surface cost_to_A +
    cost_to_B (the GRASS ``r.cost`` corridor / ESRI Corridor product:
    cells below a threshold form the best connecting swath between
    two source classes; the exact histogram answers EVERY threshold
    at once). Pixels not reached by both sources report total = -1.

    Scale shape: two independent seam fixpoints (each exactly
    ``cost_distance``'s), then ONE shuffle-free final pass that
    re-evaluates both converged in-tile fields per tile and sums —
    the deterministic re-evaluation discipline that also backs
    ``cost_path``. The corridor's global minimum equals the A↔B
    least-cost distance, asserted in the gate."""
    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    nodata = int(layout[dataset]["nodata"])
    hole = nodata if hole_value is None else int(hole_value)
    present_tiles = _present_tiles(world_path, dataset, grid)

    run_a = _make_cost_run(world_path, dataset, int(target_a), hole,
                           batch_size)
    run_b = _make_cost_run(world_path, dataset, int(target_b), hole,
                           batch_size)
    inflow_a, _ = _min_seam_fixpoint(run_a, present_tiles,
                                     "corridor-a", grid=grid)
    inflow_b, _ = _min_seam_fixpoint(run_b, present_tiles,
                                     "corridor-b", grid=grid)

    from ray.data.aggregate import Sum

    if isinstance(inflow_a, seamdist.DistInflow):
        fn = as_task_fn(_CorridorTiles, world_path=world_path,
                        dataset=dataset, target_a=int(target_a),
                        target_b=int(target_b), hole=hole,
                        inflow_a_ref=None, inflow_b_ref=None)
        final_in = seamdist.pack_work(
            present_tiles, [("a", inflow_a.ds, False),
                            ("b", inflow_b.ds, False)])
    else:
        fn = as_task_fn(
            _CorridorTiles, world_path=world_path,
            dataset=dataset, target_a=int(target_a),
            target_b=int(target_b), hole=hole,
            inflow_a_ref=(ray.put(_pack_inflow_arrays(inflow_a))
                          if inflow_a else None),
            inflow_b_ref=(ray.put(_pack_inflow_arrays(inflow_b))
                          if inflow_b else None))
        final_in = ray.data.from_items(
            [{"id": int(i)} for i in present_tiles])
    out = (final_in
           .map_batches(fn, batch_format="pyarrow",
                        batch_size=batch_size)
           .groupby("total")
           .aggregate(Sum("n_px", alias_name="n_px"))
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("total").reset_index(drop=True)


def zonal_fill_stats(world_path: str, dataset: str = "kg", *,
                     hole_value: int | None = None,
                     batch_size: int = 64) -> pd.DataFrame:
    """Per-admin depression statistics over the filled surface:
    (n_px, sum_depth, max_depth, n_filled) per admin — 'how much
    water does each country's terrain impound' — composing the
    fill_sinks fixpoint with the zonal PIP claims (the
    zonal_cost_stats discipline: order-free int64 partials, exact
    under any partitioning; mean depth = sum/n left to the caller)."""
    from .extract import build_zonal_index

    layout = model.world_layout(world_path)
    grid = world_grid(world_path, layout[dataset]["grid"])
    nodata = int(layout[dataset]["nodata"])
    hole = nodata if hole_value is None else int(hole_value)
    present_tiles = _present_tiles(world_path, dataset, grid)
    index = build_zonal_index(world_path)

    run = _make_fill_run(world_path, dataset, hole, batch_size,
                         index=index)
    inflow, _rounds = _min_seam_fixpoint(run, present_tiles,
                                         "zonal-fill-stats",
                                         grid=grid)

    from ray.data.aggregate import Max, Sum

    out = (run(present_tiles, inflow, final=True)
           .groupby("admin")
           .aggregate(Sum("n_px", alias_name="n_px"),
                      Sum("sum_depth", alias_name="sum_depth"),
                      Max("max_depth", alias_name="max_depth"),
                      Sum("n_filled", alias_name="n_filled"))
           .to_pandas())
    for c in out.columns:
        if c != "admin":
            out[c] = out[c].astype(np.int64)
    return (out[["admin", "n_px", "sum_depth", "max_depth",
                 "n_filled"]]
            .sort_values("admin").reset_index(drop=True))
