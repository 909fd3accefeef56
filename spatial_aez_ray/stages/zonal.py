"""Zonal-statistics stage: decode tile docs → PIP join → partial sums.

The heart of the engine (SURVEY.md §2.5 A1): a task-based
``map_batches`` stage that, per interleaved document (one raster tile),

1. parses the meta span and fetches the media payload(s) (MediaStore,
   opened once per worker process),
2. assigns pixels to country features via the broadcast PolygonIndex
   (built once per worker process; per-tile claims LRU-cached so the 5-dataset
   runs over the same grid reuse the geometry work),
3. computes per-(feature, class) partial km² sums with the classifier
   kernel — pixels never leave the task; only tiny partial rows hit
   the shuffle (partial-aggregate-before-shuffle, SURVEY.md §4).

The combine sorts partials by (feature_idx, tile_y, tile_x, seq) and
accumulates sequentially in that order — exactly the reference's
feature×block loop order, so results are bit-identical to the oracle
regardless of executor schedule. It is size-adaptive (see
``extract.zonal_stats``): below ``DRIVER_COMBINE_MAX_TILES`` the tiny
pre-reduced table is pulled and combined on the driver
(``combine_partials_table``); above, ``groupby(admin).map_groups``
runs the same rule distributed. The two paths share the ordering and
accumulation, asserted equal by the both-paths golden test.
"""

from __future__ import annotations

import json
from collections import OrderedDict

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo import km2_block
from ..sources.documents import MediaStore
from ..state.pipindex import PolygonIndex

PARTIAL_SCHEMA = pa.schema([
    ("admin", pa.string()),
    ("cls", pa.string()),
    ("km2", pa.float64()),
    ("feature_idx", pa.int32()),
    ("tile_y", pa.int32()),
    ("tile_x", pa.int32()),
    ("seq", pa.int32()),
])


class ZonalPartials:
    """Callable class for ``map_batches(..., concurrency=N)`` — one
    MediaStore + one PolygonIndex + one claims cache per worker
    process (dispatched as tasks via ``as_task_fn``)."""

    def __init__(self, world_path: str, classifier, index: PolygonIndex,
                 grid_spec, cache_tiles: int = 256,
                 use_claims_cache: bool = True):
        from ..state.claims_cache import ClaimsStore
        self.media = MediaStore(world_path)
        self.classifier = classifier
        self.index = index
        self.grid = grid_spec
        self._claims: OrderedDict = OrderedDict()
        self._cache_tiles = cache_tiles
        store = ClaimsStore(world_path, grid_spec.name) \
            if use_claims_cache else None
        # prepared claims (the reference's precomputed-masks stage):
        # used automatically when the world carries a cache for this
        # grid; results are bit-identical to inline PIP
        self.claims_store = store if store is not None and \
            store.available else None

    def ensure_claims(self, tiles: list[tuple[int, int]]) -> None:
        """Batched prefetch of prepared claims for a map_batches batch
        (ONE store fetch per call — the media-fetch batching rule)."""
        if self.claims_store is None:
            return
        from ..state.claims_cache import tile_key
        missing = [t for t in dict.fromkeys(tiles) if t not in self._claims]
        if not missing:
            return
        fetched = self.claims_store.fetch(
            [tile_key(ty, tx) for ty, tx in missing])
        for ty, tx in missing:
            self._claims[(ty, tx)] = fetched[tile_key(ty, tx)]
            if len(self._claims) > self._cache_tiles:
                self._claims.popitem(last=False)

    def claims_for(self, ty: int, tx: int):
        key = (ty, tx)
        hit = self._claims.get(key)
        if hit is not None:
            self._claims.move_to_end(key)
            return hit
        claims = self.index.assign_tile(self.grid, ty, tx)
        self._claims[key] = claims
        if len(self._claims) > self._cache_tiles:
            self._claims.popitem(last=False)
        return claims

    def __call__(self, batch: pa.Table) -> pa.Table:
        admins, clss, km2s = [], [], []
        fidxs, tys, txs, seqs = [], [], [], []
        spans_col = batch.column("spans").to_pylist()
        # pass 1: parse metas, prefetch prepared claims for the whole
        # batch (one store fetch), then gather every needed ref
        metas = []
        for spans in spans_col:
            meta = None
            refs = []
            for s in spans:
                if s["kind"] == "meta":
                    meta = json.loads(s["text"])
                elif s["kind"] == "media":
                    refs.append(s["media_ref"])
            metas.append((meta, refs))
        self.ensure_claims([(m["tile_y"], m["tile_x"]) for m, _ in metas])
        parsed = []
        all_refs: list[str] = []
        for meta, refs in metas:
            claims = self.claims_for(meta["tile_y"], meta["tile_x"])
            if not claims:
                continue
            parsed.append((meta, refs, claims))
            all_refs.extend(refs)
        if not parsed:
            return pa.Table.from_arrays(
                [pa.array([], t.type) for t in PARTIAL_SCHEMA],
                schema=PARTIAL_SCHEMA)
        # ONE batched media fetch per map_batches call (footer-pruned)
        payloads = self.media.fetch(all_refs)
        for meta, refs, claims in parsed:
            ty, tx = meta["tile_y"], meta["tile_x"]
            nrows, ncols = meta["nrows"], meta["ncols"]
            bands = [np.frombuffer(payloads[r], dtype=np.uint8)
                     .reshape(nrows, ncols) for r in refs]
            km2 = km2_block(nrows, ncols, meta["y_off"], self.grid)
            for fidx, admin, mask in claims:
                seq = 0
                for col, val in self.classifier.class_sums(bands, mask, km2):
                    admins.append(admin); clss.append(col); km2s.append(val)
                    fidxs.append(fidx); tys.append(ty); txs.append(tx)
                    seqs.append(seq); seq += 1
        return pa.Table.from_arrays([
            pa.array(admins, pa.string()), pa.array(clss, pa.string()),
            pa.array(km2s, pa.float64()), pa.array(fidxs, pa.int32()),
            pa.array(tys, pa.int32()), pa.array(txs, pa.int32()),
            pa.array(seqs, pa.int32()),
        ], schema=PARTIAL_SCHEMA)


def combine_partials_deterministic(g: pd.DataFrame) -> pd.DataFrame:
    """Per-admin sequential reduce in reference order: sort partials by
    (feature, tile row-major, emission seq) and add in that order so
    float accumulation matches the sequential loops bit-for-bit."""
    g = g.sort_values(["feature_idx", "tile_y", "tile_x", "seq"],
                      kind="stable")
    sums: dict[str, float] = {}
    cols = g["cls"].to_numpy()
    vals = g["km2"].to_numpy()
    for c, v in zip(cols, vals):
        sums[c] = sums.get(c, 0.0) + v
    return pd.DataFrame({"admin": g["admin"].iloc[0],
                         "cls": list(sums.keys()),
                         "km2": list(sums.values())})


# ---------------------------------------------------------------------------
# zonal VALUE statistics — the ArcGIS Zonal Statistics suite (MAJORITY /
# MINORITY / MEDIAN / VARIETY) from integer pixel-count partials
# ---------------------------------------------------------------------------

VALUE_COUNT_SCHEMA = pa.schema([
    ("admin", pa.string()),
    ("val", pa.int32()),
    ("n_px", pa.int64()),
    ("tile_y", pa.int32()),
    ("tile_x", pa.int32()),
])

#: which raw band values participate, per single-band class dataset —
#: the same skip rules the km² classifiers apply
VALUE_FILTERS = {
    "kg": lambda v: (v >= 1) & (v <= 30),
    "lc": lambda v: (v != 0) & (v != 255),
    "wk": lambda v: (v >= 1) & (v <= 7),
}


class ZonalValueCounts(ZonalPartials):
    """Per-(admin, raw value) integer pixel counts — order-free int64
    partials, so the aggregate is exact under ANY partitioning (no
    deterministic-combine ordering needed, unlike the float km² path).
    Same fetch/claims discipline as ZonalPartials: one batched
    footer-pruned media fetch per map_batches call, per-worker claims
    LRU, empty-claim short-circuit."""

    def __init__(self, *args, value_filter=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.value_filter = (VALUE_FILTERS[self.classifier.dataset]
                             if value_filter is None else value_filter)

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans_col = batch.column("spans").to_pylist()
        metas = []
        for spans in spans_col:
            meta, refs = None, []
            for s in spans:
                if s["kind"] == "meta":
                    meta = json.loads(s["text"])
                elif s["kind"] == "media":
                    refs.append(s["media_ref"])
            metas.append((meta, refs))
        self.ensure_claims([(m["tile_y"], m["tile_x"]) for m, _ in metas])
        parsed, all_refs = [], []
        for meta, refs in metas:
            claims = self.claims_for(meta["tile_y"], meta["tile_x"])
            if not claims:
                continue
            parsed.append((meta, refs, claims))
            all_refs.extend(refs)
        # per-(tile, admin) rows — a few dozen ints per tile — so the
        # partial table splices per tile for incremental maintenance
        counts: dict[tuple, np.ndarray] = {}
        if parsed:
            payloads = self.media.fetch(all_refs)
            for meta, refs, claims in parsed:
                band = np.frombuffer(payloads[refs[0]], dtype=np.uint8) \
                    .reshape(meta["nrows"], meta["ncols"])
                ty, tx = meta["tile_y"], meta["tile_x"]
                for _fidx, admin, mask in claims:
                    vals = band[mask]
                    vals = vals[self.value_filter(vals)]
                    if not len(vals):
                        continue
                    c = np.bincount(vals, minlength=256).astype(np.int64)
                    key = (admin, ty, tx)
                    prev = counts.get(key)
                    counts[key] = c if prev is None else prev + c
        admins, valv, npx, tys, txs = [], [], [], [], []
        for (admin, ty, tx), c in counts.items():
            nz = np.flatnonzero(c)
            admins.extend([admin] * len(nz))
            valv.extend(nz.astype(np.int32))
            npx.extend(c[nz])
            tys.extend([ty] * len(nz))
            txs.extend([tx] * len(nz))
        return pa.Table.from_arrays(
            [pa.array(admins, pa.string()),
             pa.array(np.asarray(valv, np.int32)),
             pa.array(np.asarray(npx, np.int64)),
             pa.array(np.asarray(tys, np.int32)),
             pa.array(np.asarray(txs, np.int32))],
            schema=VALUE_COUNT_SCHEMA)


def derive_value_stats(counts: pd.DataFrame) -> pd.DataFrame:
    """(admin, val, n_px) counts → the zonal-statistics row per admin:
    n_px, variety, majority (mode, tie → smallest value), minority
    (rarest, tie → smallest), median / p25 / p75 over the pixel value
    distribution using the ceil rank form sorted[ceil(q·n) − 1] (the
    quantile_disc convention every quantile op in this repo uses).
    Pure integer arithmetic on the count vector — no pixel ever
    reaches the driver."""
    rows = []
    for admin, g in counts.groupby("admin"):
        g = g.sort_values("val")
        vals = g["val"].to_numpy(dtype=np.int64)
        n = g["n_px"].to_numpy(dtype=np.int64)
        tot = int(n.sum())
        cum = np.cumsum(n)

        def q_at(qnum: int, qden: int) -> int:
            rank = -(-qnum * tot // qden)   # ceil(q*n), 1-based
            return int(vals[np.searchsorted(cum, rank)])

        rows.append({
            "admin": admin,
            "n_px": tot,
            "variety": int(len(vals)),
            "majority": int(vals[np.lexsort((vals, -n))[0]]),
            "minority": int(vals[np.lexsort((vals, n))[0]]),
            "p25": q_at(1, 4),
            "median": q_at(1, 2),
            "p75": q_at(3, 4),
        })
    out = pd.DataFrame(rows).sort_values("admin").reset_index(drop=True)
    for c in out.columns:
        if c != "admin":
            out[c] = out[c].astype(np.int64)
    return out
