"""Per-dataset zonal CSV pipelines (extract_country_data.py analog).

``zonal_stats`` is the generic pipeline builder
(SURVEY.md §2.9): read the dataset's interleaved documents →
task-based ZonalPartials (decode + broadcast PIP join + partial sums)
→ deterministic grouped combine → driver-side pivot into the
Country × class table → CSV with the reference's exact output shape
(sorted countries, ``%.2f``, extract_country_data.py:249-250).

The input side table (countries.parquet) is read once on the driver,
normalized (admin=None features dropped,
extract_country_data.py:223-225), built into a PolygonIndex and
held once per worker process via as_task_fn — never shuffled.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq

from ..constants import REGIONS
from ..sources.documents import read_documents
from ..stages.classify import CLASSIFIERS
from ..stages.zonal import ZonalPartials, combine_partials_deterministic
from ..state.pipindex import PolygonIndex
from ..geo import GridSpec


def load_countries(world_path: str) -> pd.DataFrame:
    return pq.read_table(os.path.join(world_path, "countries.parquet")).to_pandas()


def load_regions(world_path: str) -> dict[str, list[str]]:
    t = pq.read_table(os.path.join(world_path, "regions.parquet")).to_pandas()
    return dict(zip(t["admin"], t["regions"]))


def build_zonal_index(world_path: str) -> PolygonIndex:
    """Polygon index over normalized features (admin != None)."""
    df = load_countries(world_path)
    feats = [(int(r.feature_idx), r.admin, r.geometry)
             for r in df.itertuples() if r.admin is not None]
    return PolygonIndex(feats)


def world_grid(world_path: str, grid_name: str) -> GridSpec:
    """Reconstruct the GridSpec from the world marker: explicit
    "grids" dims when the marker declares them (imported worlds carry
    the raster's own dimensions), else the synthetic-world scale."""
    import json
    with open(os.path.join(world_path, "_WORLD.json")) as f:
        meta = json.load(f)
    g = (meta.get("grids") or {}).get(grid_name)
    if g is not None:
        return GridSpec(grid_name, g["width"], g["height"], g["tile"])
    scale = meta["scale"]
    if grid_name == "g1":
        return GridSpec("g1", 720 * scale, 360 * scale, 64)
    return GridSpec("g3", 2160 * scale, 1080 * scale, 192)


def _tile_window_filter(tile_window):
    """Exact per-batch tile-window predicate: ty/tx parsed from the
    doc_id tail with one vectorized RE2 pass. The read-side doc_id
    range prune (cell-prefix order) already dropped every tile row
    outside [ty0, ty1]; this drops the out-of-[tx0, tx1] tiles of the
    interior rows and is the sole correctness guard on sources whose
    reader ignores the pushdown hint."""
    import pyarrow as pa
    import pyarrow.compute as pc
    ty0, ty1, tx0, tx1 = tile_window

    def flt(b: "pa.Table") -> "pa.Table":
        m = pc.extract_regex(b["doc_id"], r"/(?P<ty>\d{5})/(?P<tx>\d{5})$")
        ty = pc.cast(pc.struct_field(m, "ty"), pa.int32())
        tx = pc.cast(pc.struct_field(m, "tx"), pa.int32())
        keep = pc.and_(
            pc.and_(pc.greater_equal(ty, ty0), pc.less_equal(ty, ty1)),
            pc.and_(pc.greater_equal(tx, tx0), pc.less_equal(tx, tx1)))
        return b.filter(keep)

    return flt


def zonal_partials_ds(world_path: str, dataset: str, *,
                      index: PolygonIndex | None = None,
                      grid: GridSpec | None = None,
                      concurrency: int | tuple = (1, 4), batch_size: int = 16,
                      tile_window=None, tiles=None):
    """Lazy Dataset of (admin, cls, km2, ...) partial rows for a dataset.

    ``grid`` overrides the world-marker GridSpec — the path for worlds
    assembled by ``sources.geotiff.import_geotiff``, whose dimensions
    come from the raster rather than a synthetic-world scale.
    ``tile_window=(ty0, ty1, tx0, tx1)`` restricts the aggregation to
    an inclusive tile rectangle — the spatial range-aggregation form:
    the window becomes a lexicographic doc_id range filter pushed into
    the read (row groups outside the window never leave storage), plus
    one exact vectorized predicate before the kernel.
    ``tiles`` (a set of (ty, tx)) restricts to an arbitrary tile SET in
    ONE dataset launch: doc_ids are exact tile keys, so the set becomes
    a bounding doc_id range (row-group stats pruning) AND an ``isin``
    on the exact ids, both pushed into the read — the incremental-delta
    path, where changed tiles are scattered, never a rectangle."""
    classifier = CLASSIFIERS[dataset]()
    if grid is None:
        grid = world_grid(world_path, classifier.grid)
    if index is None:
        index = build_zonal_index(world_path)
    from ..sources.documents import blocks_for
    doc_filter = None
    if tile_window is not None and tiles is not None:
        raise ValueError("pass tile_window or tiles, not both")
    if tile_window is not None:
        import pyarrow.compute as pc
        ty0, ty1, tx0, tx1 = tile_window
        lo = f"{dataset}/{classifier.grid}/{ty0:05d}/{tx0:05d}"
        hi = f"{dataset}/{classifier.grid}/{ty1:05d}/{tx1:05d}"
        doc_filter = (pc.field("doc_id") >= lo) & (pc.field("doc_id") <= hi)
    elif tiles is not None:
        import pyarrow.compute as pc
        ids = sorted(f"{dataset}/{classifier.grid}/{ty:05d}/{tx:05d}"
                     for ty, tx in tiles)
        if not ids:
            raise ValueError("tiles must be non-empty")
        doc_filter = ((pc.field("doc_id") >= ids[0])
                      & (pc.field("doc_id") <= ids[-1])
                      & pc.field("doc_id").isin(ids))
    docs = read_documents(world_path, [dataset], columns=["doc_id", "spans"],
                          override_num_blocks=blocks_for(concurrency),
                          doc_filter=doc_filter)
    if tile_window is not None:
        docs = docs.map_batches(_tile_window_filter(tile_window),
                                batch_format="pyarrow")
    from ..datapipe.util import as_task_fn
    return docs.map_batches(
        as_task_fn(ZonalPartials, world_path=world_path,
                   classifier=classifier, index=index, grid_spec=grid),
        batch_format="pyarrow", batch_size=batch_size,
    )


#: below this tile count the deterministic combine runs on the driver
#: over the pulled partial table (~50 B x a few dozen rows per tile ->
#: low tens of MB at the threshold) instead of the sort-shuffled
#: map_groups, whose warm fixed floor is ~2.3 s regardless of width.
#: Above it — e.g. the scale-40 world's 101k tiles, or any planetary
#: grid — the distributed path runs unchanged.
DRIVER_COMBINE_MAX_TILES = 20_000


def partials_coalesce_width(n_tiles: int) -> int:
    """Partition count for the tiny pre-reduced partials before the
    combine groupby: 16 at test scale (halves the sort's fixed
    per-block cost, measured 6.4s -> 2.5s), growing ~1 partition per
    256 tiles, capped at 4 x cluster CPUs — the same clamp shape as
    datapipe.util.shuffle_width.

    The width MUST stay CPU-aware, not volume-based. A volume-only
    width (1 partition per 25k tiles, i.e. 16 at the 101k-tile world)
    measured faster in a warm, single-pipeline A/B (12.3 vs 14.5 s)
    but regressed the cold CONCURRENT zonal+aez leg at 32 CPUs from
    74 to 122 s: when another pipeline is competing for the pool, a
    16-way combine serializes the sort behind it, while a 4xCPU-wide
    combine overlaps. The concurrent regime is the realistic one (a
    multi-job cluster), so that is the one this function is sized
    for."""
    import ray as _ray
    try:
        cpus = int(_ray.cluster_resources().get("CPU", 8))
    except Exception:  # pragma: no cover - no ray session
        cpus = 8
    return int(min(max(16, n_tiles // 256), max(16, 4 * cpus)))


def zonal_stats(world_path: str, dataset: str, *,
                index: PolygonIndex | None = None,
                grid: GridSpec | None = None,
                concurrency: int | tuple = (1, 4), batch_size: int = 16,
                deterministic: bool = True,
                coalesce: int | str | None = "auto",
                tile_window=None) -> pd.DataFrame:
    """Country × class km² table for one dataset (process_map analog).

    ``coalesce``: partials are pre-reduced (a few dozen rows per tile),
    so the many tiny map-stage blocks are repartitioned down before the
    groupby shuffle. "auto" (default) derives the width from the grid's
    tile count via ``partials_coalesce_width`` — identical results at
    any width (the deterministic combine orders within groups), only
    the shuffle fixed cost changes. Pass an int to pin it or None to
    keep the map-stage layout.
    """
    classifier_grid = grid
    partials = zonal_partials_ds(world_path, dataset, index=index, grid=grid,
                                 concurrency=concurrency,
                                 batch_size=batch_size,
                                 tile_window=tile_window)
    if classifier_grid is None:
        classifier_grid = world_grid(world_path,
                                     CLASSIFIERS[dataset]().grid)
    n_tiles = classifier_grid.tiles_x * classifier_grid.tiles_y
    if coalesce == "auto":
        coalesce = partials_coalesce_width(n_tiles)
    if deterministic and n_tiles <= DRIVER_COMBINE_MAX_TILES:
        # size-adaptive combine (same design as dedup's survivor
        # resolution): the pre-reduced partial table is a few dozen
        # ~50 B rows per tile, so below the threshold it is MBs —
        # pull it once and run the driver-side deterministic combine,
        # skipping the sort shuffle's ~2.3 s warm fixed floor. The
        # two combines are bit-identical (same per-admin order, same
        # sequential accumulation; asserted by the checkpointed-vs-
        # regular golden tests), so results do not depend on the path.
        pdf = combine_partials_table(partials.to_pandas())
    elif deterministic:
        # materialize the (tiny, pre-reduced) partials before the
        # shuffle: one streaming plan map->repartition->sort reserves
        # executor resources for the all-to-all and STARVES the heavy
        # map stage at low CPU counts — measured 299 s vs 87 s for the
        # scale-80 AEZ pass at 8 CPUs (32-CPU leg barely affected).
        # The barrier costs one bounded partial-table spill and buys
        # each phase the full slot budget.
        partials = partials.materialize()
        if coalesce:
            partials = partials.repartition(coalesce)
        combined = partials.groupby("admin").map_groups(
            combine_partials_deterministic, batch_format="pandas")
        pdf = combined.to_pandas()
    else:
        if coalesce:
            partials = partials.repartition(coalesce)
        from ray.data.aggregate import Sum
        pdf = (partials.groupby(["admin", "cls"])
               .aggregate(Sum("km2", alias_name="km2")).to_pandas())
    classifier = CLASSIFIERS[dataset]()
    return pivot_zonal(pdf, classifier.columns(), world_path)


def pivot_zonal(pdf: pd.DataFrame, columns: list[str],
                world_path: str) -> pd.DataFrame:
    """Long (admin, cls, km2) -> Country × class frame with every
    normalized admin present (the reference seeds a zero row per
    processed feature, extract_country_data.py:227-228) and the fixed
    class-column order."""
    admins = sorted(set(load_countries(world_path)["admin"].dropna()))
    df = pd.DataFrame(0.0, index=admins, columns=[str(c) for c in columns])
    df.index.name = "Country"
    for admin, cls, km2 in zip(pdf["admin"], pdf["cls"], pdf["km2"]):
        df.loc[admin, str(cls)] = km2
    return df.sort_index(axis="index")


def region_rollup_mapping(df: pd.DataFrame,
                          region_of: dict) -> pd.DataFrame:
    """Country rows -> fixed-order region rows under an explicit
    country->regions mapping; a country may roll into several regions
    (list values, admin_names.py:81-408; accumulation per
    extract_country_data.py:254-263). Shared kernel for the synthetic
    worlds (mapping from _WORLD.json) and the REAL published-CSV
    parity gate (mapping from region_mapping.REGION_MAPPING)."""
    df_region = pd.DataFrame(0.0, index=REGIONS, columns=df.columns.copy())
    df_region.index.name = "Region"
    for country, row in df.iterrows():
        regions = region_of.get(country)
        if regions is not None and len(regions):
            df_region.loc[list(regions), :] += row
    return df_region


def region_rollup(df: pd.DataFrame, world_path: str) -> pd.DataFrame:
    """Country rows -> region rows using the world's own mapping."""
    return region_rollup_mapping(df, load_regions(world_path))


def write_csv(df: pd.DataFrame, path: str) -> None:
    """Reference byte format: sorted index, %.2f floats
    (extract_country_data.py:249-250)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    df.sort_index(axis="index").to_csv(path, float_format="%.2f")


def write_region_csv(df_region: pd.DataFrame, path: str) -> None:
    """Region CSVs keep the literal 9-region order, NOT sorted
    (extract_country_data.py:255-263, SURVEY §2.6 O2)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    df_region.to_csv(path, float_format="%.2f")


def combine_partials_table(pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-side deterministic combine of a full partials table
    (same ordering rule as stages.zonal.combine_partials_deterministic)."""
    pdf = pdf.sort_values(["admin", "feature_idx", "tile_y", "tile_x", "seq"],
                          kind="stable")
    sums: dict[tuple[str, str], float] = {}
    for admin, cls, km2 in zip(pdf["admin"], pdf["cls"], pdf["km2"]):
        k = (admin, cls)
        sums[k] = sums.get(k, 0.0) + km2
    return pd.DataFrame({"admin": [k[0] for k in sums],
                         "cls": [k[1] for k in sums],
                         "km2": list(sums.values())})


def run_checkpointed_partials(world_path: str, driver_dataset: str,
                              kernel_cls, kernel_kwargs: dict,
                              out_dir: str, op_key: str, *,
                              num_shards: int = 8,
                              concurrency: int | tuple = (1, 4),
                              batch_size: int = 16) -> pd.DataFrame:
    """Generic resumable partials runner: split the driver dataset's
    doc_id space into contiguous cell-prefix range shards PLANNED FROM
    PARQUET FOOTER STATS (the id column is never materialized — at
    100 TB reading every doc_id to plan shards is itself a full scan),
    run the partials kernel per shard with a few shards in flight
    concurrently, persist one atomic part file + manifest line
    (lineage + metrics) each; resume skips completed shards.
    Returns the concatenated partials combined deterministically."""
    import pyarrow.compute as pc
    import pyarrow.parquet as papq
    import ray
    import ray.data as rd
    import threading
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    from ..state.checkpoint import (
        CheckpointManifest, ShardResult, doc_id_range_shards_from_stats,
        op_hash,
    )
    from ..sources.documents import document_paths

    paths = document_paths(world_path, [driver_dataset])
    shards = doc_id_range_shards_from_stats(paths, num_shards)
    # v2: stats-based shard bounds differ from the v1 full-id-read plan;
    # the op version keys the manifest so stale v1 parts never satisfy
    # a v2 resume. The PLAN itself (shard count + bounds) is also part
    # of the key: resuming with a different num_shards would otherwise
    # reuse completed shard ids whose doc_id ranges differ from the new
    # plan, silently dropping or duplicating rows.
    plan_key = ";".join(f"{sid}:{lo}..{hi}" for sid, lo, hi in shards)
    man = CheckpointManifest(
        out_dir, op_hash(op_key, driver_dataset, "v2", plan_key))
    pending = set(man.pending([s[0] for s in shards]))
    manifest_lock = threading.Lock()
    plan_lock = threading.Lock()

    def run_shard(shard):
        sid, lo, hi = shard
        t0 = _time.time()
        # Dataset construction (path/filesystem resolution) is not
        # thread-safe in Ray Data (concurrent first-import race in its
        # fsspec sniffing); serialize the cheap plan step, run the
        # actual streaming execution concurrently.
        with plan_lock:
            ds = rd.read_parquet(
                paths, columns=["doc_id", "spans"],
                filter=(pc.field("doc_id") >= lo)
                       & (pc.field("doc_id") <= hi))
        from ..datapipe.util import as_task_fn
        partials = ds.map_batches(
            as_task_fn(kernel_cls, **kernel_kwargs),
            batch_format="pyarrow", batch_size=batch_size)
        table = pa_concat(partials.to_arrow_refs())
        with manifest_lock:
            man.write_part(
                sid, table,
                lineage={"dataset": driver_dataset, "doc_id_lo": lo,
                         "doc_id_hi": hi, "world": world_path, "op": op_key},
                result=ShardResult(shard_id=sid, rows=table.num_rows,
                                   cells=int(table.num_rows),
                                   seconds=_time.time() - t0))

    todo = [s for s in shards if s[0] in pending]
    if todo:
        # overlap shard executions (each is an independent streaming
        # Dataset run); cap in-flight shards so the per-shard actor
        # pools can't reserve every CPU and starve the read stages
        cpus = int(ray.cluster_resources().get("CPU", 4))
        workers = max(1, min(4, cpus // 2, len(todo)))
        with ThreadPoolExecutor(max_workers=workers) as ex:
            list(ex.map(run_shard, todo))

    all_parts = [man.part_path(s[0]) for s in shards]
    pdf = papq.ParquetDataset(all_parts).read().to_pandas()
    return combine_partials_table(pdf)


def zonal_stats_checkpointed(world_path: str, dataset: str, out_dir: str, *,
                             num_shards: int = 8,
                             index: PolygonIndex | None = None,
                             concurrency: int | tuple = (1, 4),
                             batch_size: int = 16) -> pd.DataFrame:
    """Resumable zonal stats: doc_id-range shards, one atomic partials
    part file + manifest line each (state.checkpoint); resume skips
    completed shards; final result identical to ``zonal_stats``.
    """
    classifier = CLASSIFIERS[dataset]()
    grid = world_grid(world_path, classifier.grid)
    if index is None:
        index = build_zonal_index(world_path)
    combined = run_checkpointed_partials(
        world_path, dataset, ZonalPartials,
        {"world_path": world_path, "classifier": classifier,
         "index": index, "grid_spec": grid},
        out_dir, "zonal-partials",
        num_shards=num_shards, concurrency=concurrency,
        batch_size=batch_size)
    return pivot_zonal(combined, classifier.columns(), world_path)


def pa_concat(refs):
    import pyarrow as pa
    import ray
    tables = [t for t in ray.get(refs)]
    tables = [t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
              for t in tables]
    return pa.concat_tables(tables) if tables else None


def extract_all(world_path: str, out_dir: str, *,
                datasets=("kg", "lc", "slope", "fao", "wk", "lpd"),
                concurrency: int | tuple = (1, 4)) -> dict[str, pd.DataFrame]:
    """The --all CLI path (extract_country_data.py:270-341): one zonal
    CSV + one region CSV per dataset, sharing one broadcast index.
    CSV names mirror the reference's (FAO-Slope == the FaoSlopeLookup
    output, extract_country_data.py:327)."""
    index = build_zonal_index(world_path)
    names = {"kg": "Koppen-Geiger", "lc": "Land-Cover", "slope": "Slope",
             "fao": "FAO-Slope", "wk": "Workability", "lpd": "Degraded"}
    out = {}
    for ds_name in datasets:
        df = zonal_stats(world_path, ds_name, index=index,
                         concurrency=concurrency)
        write_csv(df, os.path.join(out_dir, f"{names[ds_name]}-by-country.csv"))
        write_region_csv(region_rollup(df, world_path),
                         os.path.join(out_dir, f"{names[ds_name]}-by-region.csv"))
        out[ds_name] = df
    return out


# ---------------------------------------------------------------------------
# incremental zonal stats — change detection feeding partial recompute
# ---------------------------------------------------------------------------

def zonal_stats_incremental(world_old: str, world_new: str, dataset: str,
                            *, old_partials: "pd.DataFrame | None" = None
                            ) -> tuple[pd.DataFrame, dict]:
    """Maintain the zonal view across a world update WITHOUT a full
    recompute: diff the two worlds (shuffle-free per-tile compare),
    recompute partial rows ONLY for changed/added tiles (each a
    pushed-down single-tile read), splice them over the stored partial
    table, and re-run the deterministic combine — bit-identical to
    ``zonal_stats(world_new)`` because the combine orders by (feature,
    tile, seq) regardless of which run emitted each row.

    Returns (view, report) where report counts the tiles actually
    recomputed — the 100 TB claim: a quarterly delta touches the delta,
    never the archive. ``old_partials`` lets a caller keep the partial
    table as its stored view state; by default it is computed from
    ``world_old`` (the "previous run")."""
    import ray.data

    from ..stages.zonal import combine_partials_deterministic
    from .pyramid import diff_worlds

    if old_partials is None:
        old_partials = zonal_partials_ds(world_old, dataset).to_pandas()
    diff = diff_worlds(world_old, world_new, dataset)
    changed = {(int(r.tile_y), int(r.tile_x))
               for r in diff.itertuples() if r.status != "removed"}
    dropped = {(int(r.tile_y), int(r.tile_x)) for r in diff.itertuples()}

    # vectorized membership: encode (ty, tx) as one int64 key — the
    # partials table is tiles-sized, a row-wise apply would crawl
    import numpy as np

    key = (old_partials["tile_y"].to_numpy(dtype=np.int64) << 32) \
        | old_partials["tile_x"].to_numpy(dtype=np.int64)
    drop_keys = np.array([(ty << 32) | tx for ty, tx in dropped],
                         dtype=np.int64)
    keep = old_partials[~np.isin(key, drop_keys)]
    if changed:
        # ONE pushed-down dataset launch covering every changed tile —
        # a 10k-tile quarterly delta pays one read + one kernel-stage
        # spin-up, not 10k serial ones
        fresh = [zonal_partials_ds(world_new, dataset,
                                   tiles=changed).to_pandas()]
    else:
        fresh = []
    merged = pd.concat([keep] + fresh, ignore_index=True)

    # merged is already on the driver; below the size-adaptive
    # threshold re-shipping it through a sort shuffle is pure overhead
    if len(merged) <= DRIVER_COMBINE_MAX_TILES * 64:
        combined = combine_partials_table(merged)
    else:
        combined = (ray.data.from_pandas(merged)
                    .groupby("admin")
                    .map_groups(combine_partials_deterministic,
                                batch_format="pandas")
                    .to_pandas())
    classifier = CLASSIFIERS[dataset]()
    view = pivot_zonal(combined, classifier.columns(), world_new)
    return view, {"tiles_recomputed": len(changed),
                  "tiles_dropped": len(dropped - changed),
                  "partial_rows_kept": len(keep)}


# ---------------------------------------------------------------------------
# zonal VALUE statistics — MAJORITY / MINORITY / MEDIAN / VARIETY per
# admin (the ArcGIS Zonal Statistics suite the reference's km² tables
# do not cover), from order-free integer pixel-count partials
# ---------------------------------------------------------------------------

def zonal_value_counts_ds(world_path: str, dataset: str = "kg", *,
                          concurrency: int | tuple = (1, 4),
                          batch_size: int = 16, tiles=None):
    """Lazy Dataset of (admin, val, n_px, tile_y, tile_x) integer
    pixel-count partials. ``tiles`` (a set of (ty, tx)) restricts to
    an arbitrary tile set in ONE launch via the same doc_id
    range+isin pushdown as ``zonal_partials_ds`` — the incremental
    delta path."""
    from ..datapipe.util import as_task_fn
    from ..sources.documents import blocks_for
    from ..stages.zonal import ZonalValueCounts

    classifier = CLASSIFIERS[dataset]()
    grid = world_grid(world_path, classifier.grid)
    index = build_zonal_index(world_path)
    doc_filter = None
    if tiles is not None:
        import pyarrow.compute as pc
        ids = sorted(f"{dataset}/{classifier.grid}/{ty:05d}/{tx:05d}"
                     for ty, tx in tiles)
        if not ids:
            raise ValueError("tiles must be non-empty")
        doc_filter = ((pc.field("doc_id") >= ids[0])
                      & (pc.field("doc_id") <= ids[-1])
                      & pc.field("doc_id").isin(ids))
    docs = read_documents(world_path, [dataset],
                          columns=["doc_id", "spans"],
                          override_num_blocks=blocks_for(concurrency),
                          doc_filter=doc_filter)
    return docs.map_batches(
        as_task_fn(ZonalValueCounts, world_path=world_path,
                   classifier=classifier, index=index, grid_spec=grid),
        batch_format="pyarrow", batch_size=batch_size)


def zonal_value_stats(world_path: str, dataset: str = "kg", *,
                      concurrency: int | tuple = (1, 4),
                      batch_size: int = 16) -> "pd.DataFrame":
    """Per-admin value statistics over a single-band class raster:
    (admin, n_px, variety, majority, minority, p25, median, p75).

    Same kernel discipline as ``zonal_stats`` (one batched
    footer-pruned fetch, claims LRU, empty-claim short-circuit), but
    the partials are integer (admin, val, n_px) counts — order-free
    int64 sums, so no deterministic-combine ordering is needed and
    the result is exact under ANY partitioning. The final table is at
    most admins × 256 rows: at cluster scale it is a tiny grouped
    sum; here it finishes on the driver (the pricing_summary
    size-gate rationale). Stats derive from the count vector alone —
    pixels never leave the workers."""
    from ..stages.zonal import derive_value_stats

    counts = zonal_value_counts_ds(world_path, dataset,
                                   concurrency=concurrency,
                                   batch_size=batch_size)
    df = (counts.to_pandas()
          .groupby(["admin", "val"], as_index=False)["n_px"].sum())
    return derive_value_stats(df)


def zonal_value_stats_incremental(world_old: str, world_new: str,
                                  dataset: str = "kg", *,
                                  old_counts: "pd.DataFrame | None" = None
                                  ) -> tuple:
    """Maintain the zonal value-statistics view across a world update:
    diff the worlds, drop the changed/removed tiles' count rows,
    recompute ONLY the changed tiles (one pushed-down launch), concat,
    re-derive. EXACTLY equal to the full recompute for free — the
    counts are order-free integers, so splicing needs no ordering
    discipline at all (contrast the float km² path's deterministic
    combine). Returns (view, report)."""
    import numpy as np

    from ..stages.zonal import derive_value_stats
    from .pyramid import diff_worlds

    if old_counts is None:
        old_counts = zonal_value_counts_ds(world_old, dataset).to_pandas()
    diff = diff_worlds(world_old, world_new, dataset)
    changed = {(int(r.tile_y), int(r.tile_x))
               for r in diff.itertuples() if r.status != "removed"}
    dropped = {(int(r.tile_y), int(r.tile_x)) for r in diff.itertuples()}
    key = (old_counts["tile_y"].to_numpy(dtype=np.int64) << 32) \
        | old_counts["tile_x"].to_numpy(dtype=np.int64)
    drop_keys = np.array([(ty << 32) | tx for ty, tx in dropped],
                         dtype=np.int64)
    keep = old_counts[~np.isin(key, drop_keys)]
    parts = [keep]
    if changed:
        parts.append(zonal_value_counts_ds(world_new, dataset,
                                           tiles=changed).to_pandas())
    import pandas as pd
    merged = pd.concat(parts, ignore_index=True)
    df = merged.groupby(["admin", "val"], as_index=False)["n_px"].sum()
    return derive_value_stats(df), {"tiles_recomputed": len(changed),
                                    "tiles_dropped": len(dropped - changed)}


# ---------------------------------------------------------------------------
# zonal block cache — GeoBlocks-style precomputed block aggregates
# (EDBT 2021, PAPERS.md): pay the raster scan ONCE, answer any window
# aggregation from the tiny cached partials with footer pruning
# ---------------------------------------------------------------------------

def prepare_zonal_blocks(world_path: str, dataset: str,
                         out_dir: str) -> dict:
    """Persist the pre-reduced per-tile zonal partials (a few dozen
    ~50 B rows per tile) as parquet. Blocks stream out in read order
    (row-major doc_id), so each part file covers a contiguous tile
    range and its (tile_y, tile_x) footer stats form tight intervals —
    a window query prunes to the intersecting files without any sort.
    The raster itself is scanned exactly once, here."""
    parts = zonal_partials_ds(world_path, dataset)
    parts.write_parquet(out_dir)
    import glob
    files = glob.glob(os.path.join(out_dir, "*.parquet"))
    return {"files": len(files)}


def zonal_stats_from_blocks(world_path: str, dataset: str,
                            blocks_dir: str,
                            tile_window=None) -> "pd.DataFrame":
    """Window (or full) zonal aggregation served ENTIRELY from the
    block cache — no raster I/O, no PIP work: read the cached partial
    rows (tile-range filter pushed into the parquet read), run the
    SAME deterministic combine as ``zonal_stats``. Bit-identical to
    the direct computation because the combine orders by (feature,
    tile row-major, seq) — cache layout cannot matter."""
    import pyarrow.compute as pc
    import ray.data

    flt = None
    if tile_window is not None:
        ty0, ty1, tx0, tx1 = tile_window
        flt = ((pc.field("tile_y") >= ty0) & (pc.field("tile_y") <= ty1)
               & (pc.field("tile_x") >= tx0) & (pc.field("tile_x") <= tx1))
    ds = ray.data.read_parquet(blocks_dir, filter=flt) if flt is not None \
        else ray.data.read_parquet(blocks_dir)
    pdf = combine_partials_table(ds.to_pandas())
    classifier = CLASSIFIERS[dataset]()
    return pivot_zonal(pdf, classifier.columns(), world_path)
