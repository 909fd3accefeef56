"""The interleaved-document data model (authoritative input shape).

Per BASELINE.json ``input_hint``, the engine's input is a table of
interleaved text + media documents:

    doc_id: string
    spans:  list<struct<kind: string, text: string,
                        media_ref: string, offset: int32>>

One document per (dataset, tile). ``doc_id`` =
``"{dataset}/{grid}/{tile_y:05d}/{tile_x:05d}"`` so lexicographic
ranges of doc_id are spatial ranges (cell-prefix partitioning). Spans:

* kind="meta"   — text = tile metadata JSON {dataset, grid, x_off,
                  y_off, ncols, nrows, band(s), nodata, tile_y, tile_x}
* kind="media"  — media_ref = "mem://{dataset}/{grid}/{ty:05d}/{tx:05d}/b{band}"
                  pointing at uint8 row-major tile bytes in the sibling
                  media table (media_ref: string, payload: binary)
* kind="caption"— inert human text

The per-row invariant every pipeline must preserve is span-sequence
equality on (kind, text, media_ref, order) — checked by
``span_signature`` / ``assert_spans_equal``.

The physical format here is Parquet; ``sources/documents.py`` upgrades
to Lance transparently when the ``lance`` package is importable (it is
not baked into this sandbox).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

SPAN_TYPE = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
])

DOCUMENTS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(SPAN_TYPE)),
])

MEDIA_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("payload", pa.binary()),
])

#: Default per-dataset physical layout of a world (which grid the tiles
#: live on, band count, nodata sentinel) — the reference's raster
#: vocabulary (extract_country_data.py:55-137: KG/slope/workability on
#: the 1 km-analog grid, ESA-CCI land cover on the 300 m-analog grid
#: with 8 slope-percentage bands and the reference nodata codes).
#: A world's ``_WORLD.json`` may override/extend this under "layout";
#: ``world_layout`` merges marker entries over these defaults so
#: imported (non-synthetic) worlds declare their own shape.
DEFAULT_DATASET_LAYOUT: dict[str, dict] = {
    "kg":    {"grid": "g1", "bands": 1, "nodata": 0},
    "lc":    {"grid": "g3", "bands": 1, "nodata": 0},
    "slope": {"grid": "g1", "bands": 8, "nodata": 127},
    "fao":   {"grid": "g1", "bands": 8, "nodata": 255},
    "wk":    {"grid": "g1", "bands": 1, "nodata": 0},
    "lpd":   {"grid": "g1", "bands": 1, "nodata": 255},
}


def world_layout(world_path: str | None) -> dict[str, dict]:
    """Per-dataset layout for a world: the ``_WORLD.json`` marker's
    "layout" entries merged over ``DEFAULT_DATASET_LAYOUT``. Cheap
    enough to call in actor ``__init__`` (one small JSON read)."""
    import os

    layout = {k: dict(v) for k, v in DEFAULT_DATASET_LAYOUT.items()}
    if world_path:
        marker = os.path.join(world_path, "_WORLD.json")
        if os.path.exists(marker):
            with open(marker) as f:
                meta = json.load(f)
            for ds, ent in (meta.get("layout") or {}).items():
                layout[ds] = {**layout.get(ds, {}), **ent}
    return layout


def sibling_refs(layout: dict[str, dict], datasets, ty: int,
                 tx: int) -> dict[str, list[str]]:
    """Derive the co-keyed media refs of ``datasets`` at one tile from
    the layout registry — the shuffle-free align-join contract (refs
    are computed, never joined)."""
    return {ds: [media_ref(ds, layout[ds]["grid"], ty, tx, b)
                 for b in range(1, layout[ds]["bands"] + 1)]
            for ds in datasets}


def doc_id(dataset: str, grid: str, ty: int, tx: int) -> str:
    return f"{dataset}/{grid}/{ty:05d}/{tx:05d}"


def media_ref(dataset: str, grid: str, ty: int, tx: int, band: int = 1) -> str:
    """Zero-padded like doc_id so media_refs sort in tile (cell-prefix)
    order: part-file min/max(media_ref) statistics then form tight,
    disjoint intervals and MediaStore point-lookups touch exactly one
    file (unpadded refs made every file a candidate — measured 200+
    file reads per fetch)."""
    return f"mem://{dataset}/{grid}/{ty:05d}/{tx:05d}/b{band}"


def make_document(dataset: str, grid: str, ty: int, tx: int,
                  x_off: int, y_off: int, ncols: int, nrows: int,
                  bands: int, nodata: int, caption: str = "") -> dict:
    """One interleaved document row (python dict for arrow conversion)."""
    meta = {
        "dataset": dataset, "grid": grid, "x_off": x_off, "y_off": y_off,
        "ncols": ncols, "nrows": nrows, "bands": bands, "nodata": nodata,
        "tile_y": ty, "tile_x": tx,
    }
    spans = [{"kind": "meta", "text": json.dumps(meta, sort_keys=True),
              "media_ref": "", "offset": 0}]
    for b in range(1, bands + 1):
        spans.append({"kind": "media", "text": "",
                      "media_ref": media_ref(dataset, grid, ty, tx, b),
                      "offset": len(spans)})
    if caption:
        spans.append({"kind": "caption", "text": caption,
                      "media_ref": "", "offset": len(spans)})
    return {"doc_id": doc_id(dataset, grid, ty, tx), "spans": spans}


def parse_meta(spans: list[dict]) -> dict:
    for s in spans:
        if s["kind"] == "meta":
            return json.loads(s["text"])
    raise ValueError("document has no meta span")


def media_refs(spans: list[dict]) -> list[str]:
    return [s["media_ref"] for s in spans if s["kind"] == "media"]


# ---------------------------------------------------------------------------
# Span-sequence invariant (BASELINE.json: "span-sequence equality
# (kind, text, media_ref, order)" on every output row vs its input row).
# ---------------------------------------------------------------------------

def span_signature(table: pa.Table) -> dict[str, tuple]:
    """doc_id -> tuple of (kind, text, media_ref) in span order."""
    out: dict[str, tuple] = {}
    for batch in table.to_batches():
        ids = batch.column("doc_id").to_pylist()
        spans = batch.column("spans").to_pylist()
        for i, d in enumerate(ids):
            seq = tuple((s["kind"], s["text"], s["media_ref"])
                        for s in sorted(spans[i], key=lambda s: s["offset"]))
            out[d] = seq
    return out


def assert_spans_equal(inp: pa.Table, out: pa.Table) -> None:
    """Every output doc's span sequence must equal its input's, exactly."""
    sig_in = span_signature(inp)
    sig_out = span_signature(out)
    for d, seq in sig_out.items():
        if d not in sig_in:
            raise AssertionError(f"output doc {d!r} not present in input")
        if sig_in[d] != seq:
            raise AssertionError(f"span sequence changed for doc {d!r}")


def decode_tile(payload: bytes, nrows: int, ncols: int) -> np.ndarray:
    """uint8 row-major tile bytes -> (nrows, ncols) array (zero-copy view)."""
    a = np.frombuffer(payload, dtype=np.uint8, count=nrows * ncols)
    return a.reshape(nrows, ncols)


def encode_tile(arr: np.ndarray) -> bytes:
    if arr.dtype != np.uint8:
        raise ValueError("tile payloads are uint8")
    return np.ascontiguousarray(arr).tobytes()
