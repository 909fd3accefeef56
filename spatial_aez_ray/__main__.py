"""CLI: the reference's script surface, Ray-Data-native.

Mirrors what a spatial-aez user runs today (cited per subcommand):

* ``extract``   — per-dataset zonal CSVs + region rollups
                  (extract_country_data.py ``--lc/--kg/--sl/--wk/--dg/
                  --all``, :270-341)
* ``aez``       — AEZ-by-country CSV + 8 per-TMR region CSVs
                  (process_imagery.py produce_CSV, :253-296)
* ``degraded``  — cover × soil × degraded CSV (degraded_analysis.py)
* ``render``    — classified raster tiles + palette GeoTIFF mosaics
                  (process_imagery.py produce_GeoTIFF, :398-492)
* ``import-geotiff`` — real raster -> interleaved tile documents
                  (the GDAL read side, extract_country_data.py:55-60)
* ``import-shapefile`` — .shp/.dbf -> countries.parquet side table
                  (OGR read side, extract_country_data.py:218-226)
* ``checkpointed-extract`` — the resumable sharded zonal run
* ``pyramid``   — overview tile levels down to one tile (the GDAL
                  BuildOverviews analog; sparse ocean holes skipped)
* ``export-cog`` — pyramid + multi-page COG-style GeoTIFF (chained
                  reduced-resolution IFDs, COPY_SRC_OVERVIEWS layout)
* ``warp``      — reproject a dataset to the Web-Mercator square
                  (gdalwarp -r near analog, bit-exact distributed gather)
* ``regions``   — connected-component region table + class summary
                  (gdal sieve/polygonize family, FRAGSTATS metrics)
* ``proximity`` — capped distance-to-class histogram (gdal_proximity)
* ``web-tiles`` — slippy z/x/y PNG tile tree (gdal2tiles analog)

The CLI owns the Ray session (library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import os
import sys


def _init_ray(num_cpus: int | None) -> None:
    import ray
    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(address="local", **kwargs)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="spatial_aez_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    def add(name, **kw):
        s = sub.add_parser(name, **kw)
        s.add_argument("--world", required=True)
        s.add_argument("--out", required=True)
        return s

    s = add("extract")
    s.add_argument("--datasets", default="kg,lc,slope,wk,lpd",
                   help="comma list; default = --all")
    add("aez")
    add("degraded")
    add("render")
    s = add("checkpointed-extract")
    s.add_argument("--dataset", default="kg")
    s.add_argument("--num-shards", type=int, default=8)
    s = add("pyramid")
    s.add_argument("--dataset", default="kg")
    s = add("export-cog")
    s.add_argument("--dataset", default="kg")
    s.add_argument("--tiff", required=True)
    s = add("warp")
    s.add_argument("--dataset", default="kg")
    s = add("regions")
    s.add_argument("--dataset", default="kg")
    s = add("proximity")
    s.add_argument("--dataset", default="lc")
    s.add_argument("--target", type=int, default=210)
    s = add("web-tiles")
    s.add_argument("--dataset", default="kg")
    s = add("terrain")
    s.add_argument("--dataset", default="kg")
    s.add_argument("--metric", default="tri",
                   choices=["tri", "tpi", "roughness", "hillshade",
                            "aspect", "flowdir", "slope", "majority"])
    s.add_argument("--zonal", action="store_true",
                   help="per-admin stats instead of the histogram "
                        "(tri/tpi/roughness/hillshade)")

    s = sub.add_parser(
        "prepare-claims",
        help="precompute tile claims (prepare_feature_masks.py analog)")
    s.add_argument("--world", required=True)
    s.add_argument("--grid", default="g1", choices=["g1", "g3"])

    s = sub.add_parser("import-geotiff")
    s.add_argument("--tiff", required=True)
    s.add_argument("--world", required=True)
    s.add_argument("--dataset", required=True)
    s.add_argument("--grid", default="g1")
    s.add_argument("--tile-edge", type=int, default=64)
    s.add_argument("--kg-palette", action="store_true",
                   help="decode a palette raster to KG legend indices")

    s = sub.add_parser("import-shapefile")
    s.add_argument("--shp", required=True)
    s.add_argument("--world", required=True)

    a = p.parse_args(argv)

    if a.cmd == "import-shapefile":  # no Ray needed
        from .sources.shapefile import shapefile_to_countries
        n = shapefile_to_countries(
            a.shp, os.path.join(a.world, "countries.parquet"))
        print(f"imported {n} features -> {a.world}/countries.parquet")
        return 0
    if a.cmd == "import-geotiff":
        from .sources.geotiff import import_geotiff
        rep = import_geotiff(a.tiff, a.world, a.dataset, a.grid,
                             tile_edge=a.tile_edge,
                             decode_kg_palette=a.kg_palette)
        print(f"imported {rep['tiles']} tiles {rep['shape']} "
              f"-> {a.world}/documents/dataset={a.dataset}")
        return 0

    _init_ray(a.num_cpus)
    import ray
    try:
        if a.cmd == "extract":
            from .pipelines.extract import extract_all
            dfs = extract_all(a.world, a.out,
                              datasets=tuple(a.datasets.split(",")))
            print(f"wrote {2 * len(dfs)} CSVs -> {a.out}")
        elif a.cmd == "aez":
            from .pipelines.aez import produce_aez_csvs
            produce_aez_csvs(a.world, a.out)
            print(f"wrote AEZ CSVs -> {a.out}")
        elif a.cmd == "degraded":
            from .pipelines.degraded import degraded_stats
            from .pipelines.extract import write_csv
            df = degraded_stats(a.world)
            write_csv(df, os.path.join(a.out, "Degraded-Land.csv"))
            print(f"wrote {a.out}/Degraded-Land.csv")
        elif a.cmd == "render":
            from .pipelines.extract import world_grid
            from .pipelines.render import (
                RENDER_PRODUCTS, export_render_geotiff, produce_render_tiles,
            )
            out_world = os.path.join(a.out, "rendered")
            produce_render_tiles(a.world, out_world)
            g3 = world_grid(a.world, "g3")
            for product in RENDER_PRODUCTS:
                export_render_geotiff(
                    out_world, product,
                    os.path.join(a.out, f"{product}.tif"), g3)
            print(f"wrote rendered tiles + {len(RENDER_PRODUCTS)} "
                  f"GeoTIFFs -> {a.out}")
        elif a.cmd == "prepare-claims":
            from .pipelines.extract import world_grid
            from .state.claims_cache import prepare_claims
            summary = prepare_claims(a.world, world_grid(a.world, a.grid))
            print(f"prepared {summary['claims'].sum()} claims over "
                  f"{summary['tiles'].sum()} tiles "
                  f"-> {a.world}/claims/grid={a.grid}")
        elif a.cmd == "pyramid":
            from .pipelines.pyramid import build_pyramid
            df = build_pyramid(a.world, a.dataset, a.out)
            print(f"built {len(df)} overview levels "
                  f"({int(df['n_tiles'].sum())} tiles) -> {a.out}")
        elif a.cmd == "warp":
            from .pipelines.warp import warp_to_mercator
            rep = warp_to_mercator(a.world, a.dataset, a.out)
            print(f"warped to {int(rep['out_n'][0])}² Web Mercator "
                  f"({int(rep['n_tiles'][0])} tiles) -> {a.out}")
        elif a.cmd == "export-cog":
            from .pipelines.pyramid import build_pyramid, export_cog
            build_pyramid(a.world, a.dataset, a.out)
            rep = export_cog(a.world, a.dataset, a.out, a.tiff)
            print(f"wrote {rep['pages']}-page COG "
                  f"({rep['bytes']} bytes) -> {a.tiff}")
        elif a.cmd == "regions":
            from .pipelines.regions import label_regions, region_summary
            df = label_regions(a.world, a.dataset)
            os.makedirs(a.out, exist_ok=True)
            df.to_parquet(os.path.join(a.out, "regions.parquet"),
                          index=False)
            summ = region_summary(df)
            summ.to_csv(os.path.join(a.out, "region-summary.csv"),
                        index=False)
            print(f"labeled {len(df)} regions ({len(summ)} classes) "
                  f"-> {a.out}")
        elif a.cmd == "proximity":
            from .pipelines.regions import proximity_histogram
            df = proximity_histogram(a.world, a.dataset, a.target)
            os.makedirs(a.out, exist_ok=True)
            df.to_csv(os.path.join(a.out, "proximity-histogram.csv"),
                      index=False)
            print(f"proximity[{a.dataset}->{a.target}]: "
                  f"{int(df['n_px'].sum())} px binned -> {a.out}")
        elif a.cmd == "web-tiles":
            from .pipelines.pyramid import build_pyramid, export_web_tiles
            proot = os.path.join(a.out, "_pyramid")
            build_pyramid(a.world, a.dataset, proot)
            rep = export_web_tiles(a.world, a.dataset, proot, a.out)
            print(f"wrote {int(rep['n_tiles'].sum())} tiles over "
                  f"{len(rep)} zooms -> {a.out}")
        elif a.cmd == "terrain":
            from .pipelines import pyramid as pyr
            if a.zonal:
                df = pyr.zonal_window_stats(a.world, a.dataset, a.metric)
            else:
                fn = {"tri": pyr.focal_tri, "tpi": pyr.focal_tpi,
                      "roughness": pyr.focal_roughness,
                      "hillshade": pyr.hillshade,
                      "aspect": pyr.focal_aspect,
                      "flowdir": pyr.focal_flowdir,
                      "slope": pyr.focal_slope_deg,
                      "majority": pyr.focal_majority}[a.metric]
                df = fn(a.world, a.dataset)
            os.makedirs(a.out, exist_ok=True)
            dest = os.path.join(
                a.out, f"terrain-{a.metric}"
                       f"{'-zonal' if a.zonal else ''}.csv")
            df.to_csv(dest, index=False)
            print(f"terrain[{a.metric}]: {len(df)} rows -> {dest}")
        elif a.cmd == "checkpointed-extract":
            from .pipelines.extract import zonal_stats_checkpointed
            df = zonal_stats_checkpointed(a.world, a.dataset, a.out,
                                          num_shards=a.num_shards)
            print(f"checkpointed zonal[{a.dataset}]: {len(df)} countries "
                  f"-> {a.out}")
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
