"""Prepared tile-claims cache — the reference's mask-preparation stage.

The reference precomputes one NBITS=1 mask raster per (feature,
resolution) offline (/root/reference/prepare_feature_masks.py:44-91,
766 masks with SPARSE_OK+ZSTD) and every extract run reads masks
instead of re-running point-in-polygon. This module is that stage,
Ray-Data-native: ``prepare_claims`` runs the broadcast PolygonIndex
over every tile of a grid ONCE (distributed map_batches over the tile
list) and persists the claims — (feature_idx, admin, packed bit
mask) rows keyed by zero-padded tile_key — as sorted parquet parts
under ``{world}/claims/grid={name}/``. ``ClaimsStore`` is the per-
actor read side (same footer min/max interval pruning as MediaStore;
fetches MUST be batched per map_batches call). Kernels fall back to
inline PIP when no cache exists, and results are bit-identical either
way (the cache stores exactly ``PolygonIndex.assign_tile`` output).
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CLAIMS_SCHEMA = pa.schema([
    ("tile_key", pa.string()),
    ("feature_idx", pa.int32()),
    ("admin", pa.string()),
    ("nrows", pa.int32()),
    ("ncols", pa.int32()),
    ("mask", pa.binary()),   # np.packbits of the bool mask
])


def tile_key(ty: int, tx: int) -> str:
    return f"{ty:05d}/{tx:05d}"


def claims_dir(world_path: str, grid_name: str) -> str:
    return os.path.join(world_path, "claims", f"grid={grid_name}")


class _ClaimsComputer:
    """Kernel stage (task-based): PolygonIndex held once per worker
    process; each
    batch of (ty, tx) tiles computes claims and writes ONE atomic
    parquet part covering a contiguous tile range."""

    def __init__(self, index, grid, out_dir: str):
        self.index = index
        self.grid = grid
        self.out_dir = out_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        tys = batch["ty"].to_pylist()
        txs = batch["tx"].to_pylist()
        keys, fidxs, admins, nr, nc, masks = [], [], [], [], [], []
        n_claims = 0
        for ty, tx in zip(tys, txs):
            for fidx, admin, mask in self.index.assign_tile(
                    self.grid, ty, tx):
                keys.append(tile_key(ty, tx))
                fidxs.append(fidx)
                admins.append(admin)
                nr.append(mask.shape[0])
                nc.append(mask.shape[1])
                masks.append(np.packbits(mask).tobytes())
                n_claims += 1
        t = pa.table({
            "tile_key": pa.array(keys, pa.string()),
            "feature_idx": pa.array(fidxs, pa.int32()),
            "admin": pa.array(admins, pa.string()),
            "nrows": pa.array(nr, pa.int32()),
            "ncols": pa.array(nc, pa.int32()),
            "mask": pa.array(masks, pa.binary()),
        }, schema=CLAIMS_SCHEMA)
        tag = tile_key(tys[0], txs[0]).replace("/", "_")
        final = os.path.join(self.out_dir, f"part-{tag}.parquet")
        tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
        pq.write_table(t, tmp, row_group_size=512)
        os.replace(tmp, final)
        return pa.table({"part": pa.array([os.path.basename(final)]),
                         "tiles": pa.array([len(tys)], pa.int64()),
                         "claims": pa.array([n_claims], pa.int64())})


def prepare_claims(world_path: str, grid, *, index=None,
                   concurrency: int | tuple = (1, 4),
                   batch_size: int = 32):
    """Compute + persist the full claims cache for one grid. Returns a
    per-part summary frame. Idempotent: parts are written into a FRESH
    temp dir and the whole dir is swapped in at the end — part
    filenames depend on batch composition (first tile per batch), so
    overwriting in place with a different batch_size/concurrency would
    leave stale parts with overlapping tile ranges and ``fetch`` would
    silently double-count claims. The in-process ``_FILE_INDEX`` entry
    is invalidated on swap."""
    import shutil

    import ray.data as rd

    from ..pipelines.extract import build_zonal_index

    if index is None:
        index = build_zonal_index(world_path)
    final_dir = claims_dir(world_path, grid.name)
    tmp_dir = final_dir + f".tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp_dir)
    tiles = [{"ty": ty, "tx": tx}
             for ty in range(grid.tiles_y) for tx in range(grid.tiles_x)]
    from ..datapipe.util import as_task_fn
    summary = (rd.from_items(tiles)
               .map_batches(as_task_fn(_ClaimsComputer, index=index,
                                       grid=grid, out_dir=tmp_dir),
                            batch_format="pyarrow", batch_size=batch_size)
               .to_pandas())
    with open(os.path.join(tmp_dir, "_CLAIMS.json"), "w") as f:
        json.dump({"grid": grid.name, "tiles": len(tiles),
                   "tiles_y": grid.tiles_y, "tiles_x": grid.tiles_x,
                   "parts": len(summary)}, f)
    shutil.rmtree(final_dir, ignore_errors=True)
    os.rename(tmp_dir, final_dir)
    ClaimsStore._FILE_INDEX.pop(final_dir, None)
    return summary.sort_values("part").reset_index(drop=True)


class ClaimsStore:
    """Per-worker batched claims reader with a footer interval index
    (tile_key is zero-padded, so part min/max stats form tight
    ranges). A world without a cache yields ``available == False`` and
    kernels run inline PIP."""

    _FILE_INDEX: dict[str, list[tuple[str, str, str]]] = {}

    def __init__(self, world_path: str, grid_name: str):
        self._dir = claims_dir(world_path, grid_name)
        self.available = os.path.exists(
            os.path.join(self._dir, "_CLAIMS.json"))

    def _index(self) -> list[tuple[str, str, str]]:
        idx = ClaimsStore._FILE_INDEX.get(self._dir)
        if idx is None:
            idx = []
            for fname in sorted(os.listdir(self._dir)):
                if not fname.endswith(".parquet"):
                    continue
                path = os.path.join(self._dir, fname)
                md = pq.read_metadata(path)
                ki = md.schema.to_arrow_schema().get_field_index("tile_key")
                lo, hi = None, None
                rgs: list = []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ki).statistics
                    if st is None:
                        lo, hi = "", "\U0010ffff"
                        rgs = [(rg, "", "\U0010ffff")
                               for rg in range(md.num_row_groups)]
                        break
                    rgs.append((rg, st.min, st.max))
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                idx.append((path, lo or "", hi or "\U0010ffff", rgs))
            ClaimsStore._FILE_INDEX[self._dir] = idx
        return idx

    def fetch(self, keys: list[str]) -> dict[str, list]:
        """Batched fetch: key -> [(feature_idx, admin, bool mask)].
        Keys absent from the cache (tiles with no claims) map to []."""
        import pyarrow as pa
        import pyarrow.compute as pc
        out: dict[str, list] = {k: [] for k in keys}
        want = set(keys)
        by_file: dict[str, tuple[list[str], list]] = {}
        for path, lo, hi, rgs in self._index():
            sel = [k for k in want if lo <= k <= hi]
            if sel:
                hit = [rg for rg, rlo, rhi in rgs
                       if any(rlo <= k <= rhi for k in sel)]
                if hit:
                    by_file[path] = (sel, hit)
        for path, (sel, hit) in by_file.items():
            # row-group-targeted point lookup — same rationale as
            # MediaStore.fetch (the filters= dataset path is ~6x
            # slower per call on point lookups)
            t = pq.ParquetFile(path).read_row_groups(hit)
            t = t.filter(pc.is_in(t["tile_key"], value_set=pa.array(sel)))
            for k, fi, admin, nr, nc, buf in zip(
                    t["tile_key"].to_pylist(),
                    t["feature_idx"].to_pylist(),
                    t["admin"].to_pylist(),
                    t["nrows"].to_pylist(), t["ncols"].to_pylist(),
                    t["mask"].to_pylist()):
                mask = np.unpackbits(
                    np.frombuffer(buf, np.uint8),
                    count=nr * nc).astype(bool).reshape(nr, nc)
                out[k].append((fi, admin, mask))
        return out
