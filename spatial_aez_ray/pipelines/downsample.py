"""Windowed histogram downsample + thumbnail pipelines.

* ``downsample_histogram`` — the S9/A5 operator
  (/root/reference/data/geomorpho90m/classify_slope.py:36-98, the
  offline importer that converts fine tiles into a coarse multi-band
  class-count raster): each fine (G3) tile is reduced to its parent
  coarse (G1) tile where band ``b`` holds the count of the 3×3 child
  window's pixels falling in class-bin ``b``, plus a final band =
  ``floor(mean)`` of the window (classify_slope.py:82). The G3 tile
  edge is exactly 3× the G1 edge, so the reduction is tile-local —
  a stateless ``map_batches``, no shuffle at all.
* ``thumbnail_tiles`` — the S8 PNG-thumbnail analog
  (/root/reference/process_imagery.py:500-508, 1% nearest-neighbour
  downsample): stride-subsampled small tile documents of any dataset.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import model
from ..sources.documents import MediaStore, read_documents
from .extract import world_grid

#: class-value bin edges (inclusive lo, exclusive hi) mirroring the
#: reference's GAEZ slope bins shape; over LCCS codes we bin by the
#: code ranges of the land-use families.
DEFAULT_BINS: list[tuple[int, int]] = [
    (0, 10), (10, 40), (40, 100), (100, 130),
    (130, 160), (160, 200), (200, 210), (210, 256),
]


def window_histogram(child: np.ndarray, factor: int,
                     bins: list[tuple[int, int]]) -> np.ndarray:
    """(H, W) uint8 -> (len(bins)+1, H/f, W/f): per-window bin counts +
    floor(mean) band, vectorized over all windows at once (the
    reference loops windows python-side, classify_slope.py:65-84; we
    reshape to (h, f, w, f) and reduce)."""
    h, w = child.shape
    oh, ow = h // factor, w // factor
    win = child[:oh * factor, :ow * factor].reshape(oh, factor, ow, factor)
    out = np.empty((len(bins) + 1, oh, ow), dtype=np.uint8)
    for b, (lo, hi) in enumerate(bins):
        out[b] = np.logical_and(win >= lo, win < hi).sum(axis=(1, 3))
    out[-1] = np.floor(win.astype(np.float64).mean(axis=(1, 3))).astype(np.uint8)
    return out


class HistogramDownsampler:
    """Stateless-per-batch, stateful-per-actor (MediaStore handle) tile
    reducer: G3 doc -> parent G1 multiband histogram doc."""

    def __init__(self, world_path: str, dataset: str, factor: int = 3,
                 bins: list[tuple[int, int]] | None = None):
        self.media = MediaStore(world_path)
        self.dataset = dataset
        self.factor = factor
        self.bins = bins or DEFAULT_BINS

    def __call__(self, batch: pa.Table) -> pa.Table:
        # pass 1: collect every row's ref, ONE batched MediaStore fetch
        # per map_batches call (per-row fetches measured 13x slower —
        # CLAUDE.md invariant, same two-pass shape as ZonalPartials)
        rows_meta = []
        all_refs = []
        for row in batch.to_pylist():
            meta = model.parse_meta(row["spans"])
            ref0 = model.media_refs(row["spans"])[0]
            rows_meta.append((meta, ref0))
            all_refs.append(ref0)
        payloads = self.media.fetch(all_refs)
        rows = []
        for meta, ref0 in rows_meta:
            child = model.decode_tile(payloads[ref0],
                                      meta["nrows"], meta["ncols"])
            hist = window_histogram(child, self.factor, self.bins)
            ty, tx = meta["tile_y"], meta["tile_x"]
            nbands = hist.shape[0]
            doc = model.make_document(
                f"{self.dataset}_hist", "g1", ty, tx,
                meta["x_off"] // self.factor, meta["y_off"] // self.factor,
                hist.shape[2], hist.shape[1], bands=nbands, nodata=255)
            for b in range(nbands):
                rows.append({"doc_id": doc["doc_id"], "spans": doc["spans"],
                             "media_ref": model.media_ref(
                                 f"{self.dataset}_hist", "g1", ty, tx, b + 1),
                             "payload": model.encode_tile(hist[b])})
        return pa.Table.from_pylist(rows, schema=pa.schema([
            ("doc_id", pa.string()), ("spans", pa.list_(model.SPAN_TYPE)),
            ("media_ref", pa.string()), ("payload", pa.binary())]))


def downsample_histogram(world_path: str, dataset: str = "lc", *,
                         factor: int = 3,
                         bins: list[tuple[int, int]] | None = None,
                         concurrency: int | tuple = (1, 4)):
    """Lazy Dataset of parent-tile histogram documents (one row per
    output band, sibling media rows inline)."""
    docs = read_documents(world_path, [dataset], columns=["doc_id", "spans"])
    from ..datapipe.util import as_task_fn
    return docs.map_batches(
        as_task_fn(HistogramDownsampler, world_path=world_path,
                   dataset=dataset, factor=factor, bins=bins),
        batch_format="pyarrow", batch_size=8)


def _summary_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial: (band, payload_sum, n_tiles) rows — payload
    bytes are reduced INSIDE the worker; only tiny partials shuffle."""
    refs = batch["media_ref"].to_pylist()
    band = np.fromiter((int(r.rsplit("b", 1)[-1]) for r in refs),
                       dtype=np.int64, count=len(refs))
    psum = np.fromiter(
        (int(np.frombuffer(p, np.uint8).astype(np.int64).sum())
         for p in batch["payload"].to_pylist()),
        dtype=np.int64, count=len(refs))
    df = (pd.DataFrame({"band": band, "payload_sum": psum,
                        "n_tiles": np.ones(len(refs), dtype=np.int64)})
          .groupby("band", as_index=False).sum())
    return pa.Table.from_pandas(df, preserve_index=False)


def downsample_summary(world_path: str, dataset: str = "lc", *,
                       factor: int = 3) -> pd.DataFrame:
    """Deterministic summary of the downsample output (for driver-gate
    and golden tests): per output band, number of tiles + payload sum.
    Payload-bearing rows never cross the driver boundary — each batch
    reduces to <=bands partial rows before the (tiny) final groupby."""
    ds = downsample_histogram(world_path, dataset, factor=factor)
    partials = ds.map_batches(_summary_partial, batch_format="pyarrow")
    out = (partials.to_pandas()
           .groupby("band", as_index=False).sum())
    out["payload_sum"] = out["payload_sum"].astype(np.int64)
    out["n_tiles"] = out["n_tiles"].astype(np.int64)
    return out.sort_values("band").reset_index(drop=True)


# ---------------------------------------------------------------------------
# thumbnails (S8)
# ---------------------------------------------------------------------------

class Thumbnailer:
    """Stride-subsample each tile by ``stride`` (nearest-neighbour, the
    gdal_translate -outsize 1% analog) into a thumbnail document.
    ``encode="png"`` emits real PNG payloads (functions.png, the
    process_imagery.py:500-508 output format); ``"raw"`` keeps the
    uint8 tile bytes."""

    def __init__(self, world_path: str, stride: int = 8,
                 encode: str = "raw",
                 palette: "np.ndarray | None" = None):
        self.media = MediaStore(world_path)
        self.stride = stride
        self.encode = encode
        self.palette = palette

    def __call__(self, batch: pa.Table) -> pa.Table:
        # one batched fetch per call (CLAUDE.md media-fetch invariant)
        rows_meta = []
        for row in batch.to_pylist():
            meta = model.parse_meta(row["spans"])
            ref0 = model.media_refs(row["spans"])[0]
            rows_meta.append((row["doc_id"], meta, ref0))
        payloads = self.media.fetch([r for _, _, r in rows_meta])
        ids, refs_out, payloads_out, ws, hs = [], [], [], [], []
        for doc_id, meta, ref0 in rows_meta:
            tile = model.decode_tile(payloads[ref0],
                                     meta["nrows"], meta["ncols"])
            thumb = np.ascontiguousarray(
                tile[:: self.stride, :: self.stride])
            ids.append(doc_id + "/thumb")
            refs_out.append(ref0 + "/thumb")
            if self.encode == "png":
                from ..functions.png import encode_png
                payloads_out.append(encode_png(thumb, self.palette))
            else:
                payloads_out.append(thumb.tobytes())
            hs.append(thumb.shape[0])
            ws.append(thumb.shape[1])
        return pa.table({"doc_id": pa.array(ids, pa.string()),
                         "media_ref": pa.array(refs_out, pa.string()),
                         "payload": pa.array(payloads_out, pa.binary()),
                         "nrows": pa.array(hs, pa.int32()),
                         "ncols": pa.array(ws, pa.int32())})


def thumbnail_tiles(world_path: str, dataset: str, *, stride: int = 8,
                    encode: str = "raw", palette=None,
                    concurrency: int | tuple = (1, 4)):
    docs = read_documents(world_path, [dataset], columns=["doc_id", "spans"])
    from ..datapipe.util import as_task_fn
    return docs.map_batches(
        as_task_fn(Thumbnailer, world_path=world_path, stride=stride,
                   encode=encode, palette=palette),
        batch_format="pyarrow", batch_size=8)


# ---------------------------------------------------------------------------
# histogram equalization — the contrast-stretch raster transform
# ---------------------------------------------------------------------------

def equalize_lut(hist: np.ndarray, nodata: int) -> np.ndarray:
    """256-entry equalization LUT from a global value histogram
    (nodata excluded). All-integer arithmetic: lut[v] =
    round_half_up((cdf[v] − cdf_min) · 255 / (n − cdf_min)), so the
    pipeline and the sequential oracle agree bit-for-bit. nodata maps
    to itself (a real class may collide with the nodata code after
    stretching — inherent to equalization, documented not hidden)."""
    h = hist.astype(np.int64).copy()
    h[nodata] = 0
    cdf = np.cumsum(h)
    n = int(cdf[-1])
    nz = np.flatnonzero(h)
    lut = np.zeros(256, dtype=np.uint8)
    if len(nz):
        cdf_min = int(cdf[nz[0]])
        den = max(n - cdf_min, 1)
        lut[:] = ((np.maximum(cdf - cdf_min, 0) * 255 * 2 + den)
                  // (2 * den)).astype(np.uint8)
    lut[nodata] = nodata
    return lut


def equalize_tiles(world_path: str, dataset: str, out_dir: str, *,
                   concurrency: int | tuple = (1, 4)) -> pd.DataFrame:
    """Histogram-equalize a raster dataset into ``out_dir`` (world
    layout) and return (n_tiles, payload_sum, md5_sum) — the classic
    two-pass raster transform: pass 1 reduces every block to ONE
    256-int histogram row (the global statistic), the driver derives
    the integer LUT, pass 2 is a stateless vectorized remap + atomic
    part write with order-free checksum partials (pyramid's summary
    discipline). Neither pass shuffles; payloads never reach the
    driver."""
    import functools

    from ..sources.documents import MediaStore
    from .pyramid import _md5_int
    from .render import _RenderWriter

    layout = model.world_layout(world_path)
    nodata = int(layout[dataset]["nodata"])

    class Hist:
        def __init__(self):
            self.media = MediaStore(world_path)

        def __call__(self, b: pa.Table) -> pa.Table:
            refs = [model.media_refs(s)[0]
                    for s in b["spans"].to_pylist()]
            payloads = self.media.fetch(refs)
            h = np.zeros(256, dtype=np.int64)
            for r in refs:
                h += np.bincount(np.frombuffer(payloads[r], np.uint8),
                                 minlength=256)
            return pa.table({"bin": pa.array(np.arange(256, dtype=np.int64)),
                             "cnt": pa.array(h)})

    docs = read_documents(world_path, [dataset], columns=["doc_id", "spans"])
    hist_df = (docs.map_batches(Hist, batch_format="pyarrow",
                                concurrency=concurrency)
               .to_pandas().groupby("bin", as_index=False)["cnt"].sum())
    hist = np.zeros(256, dtype=np.int64)
    hist[hist_df["bin"].to_numpy()] = hist_df["cnt"].to_numpy()
    lut = equalize_lut(hist, nodata)

    class Remap:
        def __init__(self):
            self.media = MediaStore(world_path)

        def __call__(self, b: pa.Table) -> pa.Table:
            import json as _json
            rows = []
            metas = []
            refs = []
            for s in b["spans"].to_pylist():
                metas.append(model.parse_meta(s))
                refs.append(model.media_refs(s)[0])
            payloads = self.media.fetch(refs)
            for meta, ref in zip(metas, refs):
                arr = np.frombuffer(payloads[ref], np.uint8)
                eq = lut[arr].reshape(meta["nrows"], meta["ncols"])
                ty, tx = meta["tile_y"], meta["tile_x"]
                doc = model.make_document(
                    f"{dataset}_eq", meta["grid"], ty, tx,
                    meta["x_off"], meta["y_off"], meta["ncols"],
                    meta["nrows"], bands=1, nodata=nodata)
                rows.append({
                    "doc_id": doc["doc_id"], "spans": doc["spans"],
                    "media_ref": model.media_ref(
                        f"{dataset}_eq", meta["grid"], ty, tx, 1),
                    "payload": model.encode_tile(eq)})
            return pa.Table.from_pylist(rows, schema=pa.schema([
                ("doc_id", pa.string()),
                ("spans", pa.list_(model.SPAN_TYPE)),
                ("media_ref", pa.string()), ("payload", pa.binary())]))

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

    parts = (docs.map_batches(Remap, batch_format="pyarrow",
                              concurrency=concurrency)
             .map_batches(functools.partial(write_sum, out_dir=out_dir),
                          batch_format="pyarrow")
             .to_pandas())
    out = pd.DataFrame([{
        "n_tiles": np.int64(parts["n_tiles"].sum()),
        "payload_sum": np.int64(parts["payload_sum"].sum()),
        "md5_sum": np.int64(parts["md5_sum"].to_numpy()
                            .sum(dtype=np.int64))}])
    return out




# ---------------------------------------------------------------------------
# histogram matching (histogram specification): map one raster's value
# distribution onto another's — the multi-sensor radiometric
# normalization step (match scene B to reference scene A before
# mosaicking / change detection)
# ---------------------------------------------------------------------------

def match_histogram_lut(hist_src: np.ndarray, hist_ref: np.ndarray,
                        nodata: int) -> np.ndarray:
    """256-entry histogram-specification LUT: src value v maps to the
    smallest ref value r with cdf_ref(r)·n_src >= cdf_src(v)·n_ref —
    the CDF-matching rule in exact cross-multiplied integers (no
    float quantile anywhere). nodata maps to itself and is excluded
    from both CDFs."""
    hs = hist_src.astype(np.int64).copy()
    hr = hist_ref.astype(np.int64).copy()
    hs[nodata] = 0
    hr[nodata] = 0
    cs = np.cumsum(hs)
    cr = np.cumsum(hr)
    n_s, n_r = int(cs[-1]), int(cr[-1])
    lut = np.zeros(256, dtype=np.uint8)
    if n_s and n_r:
        # for each src value: first ref bin whose scaled CDF reaches it
        targets = cs * n_r                     # (256,) int64
        scaled_ref = cr * n_s
        lut[:] = np.searchsorted(scaled_ref, targets,
                                 side="left").clip(0, 255)
    lut[nodata] = nodata
    return lut


def dataset_histogram(world_path: str, dataset: str) -> np.ndarray:
    """Global 256-bin value histogram of a dataset's band 1 — one
    histogram partial per block, summed on the driver (256 ints)."""
    from .. import model
    from ..sources.documents import MediaStore, read_documents

    class Hist:
        def __init__(self):
            self.media = MediaStore(world_path)

        def __call__(self, b: pa.Table) -> pa.Table:
            refs = [model.media_refs(s)[0]
                    for s in b["spans"].to_pylist()]
            payloads = self.media.fetch(refs)
            h = np.zeros(256, dtype=np.int64)
            for r in refs:
                h += np.bincount(np.frombuffer(payloads[r], np.uint8),
                                 minlength=256)
            return pa.table({"bin": pa.array(np.arange(256,
                                                       dtype=np.int64)),
                             "cnt": pa.array(h)})

    docs = read_documents(world_path, [dataset],
                          columns=["doc_id", "spans"])
    df = (docs.map_batches(Hist, batch_format="pyarrow",
                           concurrency=(1, 4))
          .to_pandas().groupby("bin", as_index=False)["cnt"].sum())
    hist = np.zeros(256, dtype=np.int64)
    hist[df["bin"].to_numpy()] = df["cnt"].to_numpy()
    return hist


def histogram_match_report(world_path: str, src_dataset: str = "kg",
                           ref_dataset: str = "lc") -> pd.DataFrame:
    """Match ``src_dataset``'s value distribution onto
    ``ref_dataset``'s: returns the non-empty LUT rows (value, n_src,
    matched_value, n_matched) where n_matched is the src mass landing
    on each matched value — the verifiable core of the normalization
    (the remap pass itself is ``equalize_tiles``'s stateless LUT
    apply with this LUT swapped in)."""
    from .. import model

    layout = model.world_layout(world_path)
    nodata = int(layout[src_dataset]["nodata"])
    hs = dataset_histogram(world_path, src_dataset)
    hr = dataset_histogram(world_path, ref_dataset)
    lut = match_histogram_lut(hs, hr, nodata)
    hs2 = hs.copy()
    hs2[nodata] = 0
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
