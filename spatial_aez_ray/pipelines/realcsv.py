"""Region-rollup parity against the reference's PUBLISHED result CSVs.

The reference publishes real per-country tables (``results/
AEZ-by-country.csv`` from process_imagery.py:281, ``Land-Cover-
by-country.csv`` from extract_country_data.py:249) alongside region
rollups computed from the SAME in-memory frame before the %.2f write
(process_imagery.py:283-296, extract_country_data.py:254-263).

This gate re-rolls the published (rounded) by-country values through
OUR J3/A4 kernel (``extract.region_rollup_mapping`` with the mirrored
Drawdown region table) and compares every cell of all nine published
by-region files. Because the reference rolled up unrounded values,
exact equality is not expected; the admissible slack is the strict
rounding bound ``0.005 * (n_countries_in_region + 1)`` (each published
country cell carries <= 0.005 rounding error, plus one more for the
published region cell itself). Any mapping, ordering, or accumulation
error shows up as whole-km2 differences -- four to six orders of
magnitude above the bound -- so the check is sharp: measured max
deviation is 0.05 km2 on the AEZ family and 0.00 on Land-Cover.

Ray Data shape: one row per published by-region file; a task-pool
``map_batches`` loads + compares each file independently. The tables
are ~200 x 232 -- trivially small -- but the comparison reuses the
exact kernel the distributed pipelines call after their partials
combine, so a green gate certifies the production rollup path.
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray.data

from ..constants import REGIONS
from ..region_mapping import REGION_MAPPING

REFERENCE_RESULTS_DIR = "/root/reference/results"

#: published by-region file -> (by-country source, column prefix or None)
#: AEZ per-TMR files filter the 232-column frame by TMR prefix
#: (process_imagery.py:292-296); Land-Cover keeps every column.
REAL_ROLLUP_FILES = {
    f"AEZ-{tmr}-by-region.csv": ("AEZ-by-country.csv", tmr.lower())
    for tmr in ("Tropical-Humid", "Arid", "Tropical-Semiarid",
                "Temperate-Humid", "Temperate-Semiarid", "Boreal-Humid",
                "Boreal-Semiarid", "Arctic")
}
REAL_ROLLUP_FILES["Land-Cover-by-region.csv"] = (
    "Land-Cover-by-country.csv", None)


def _rollup_published(by_country_path: str) -> tuple[pd.DataFrame, dict]:
    """Published by-country CSV -> (our region rollup, countries/region).

    Raises on a country absent from the mirrored mapping: silence there
    would let mapping drift pass as a zero row."""
    from .extract import region_rollup_mapping
    bc = pd.read_csv(by_country_path, index_col=0)
    missing = [c for c in bc.index if c not in REGION_MAPPING]
    if missing:
        raise AssertionError(
            f"countries absent from REGION_MAPPING: {missing}")
    reg = region_rollup_mapping(bc, REGION_MAPPING)
    nper = {r: 0 for r in REGIONS}
    for c in bc.index:
        for r in REGION_MAPPING[c] or ():
            nper[r] += 1
    return reg, nper


def _compare_one(region_csv: str, by_country_csv: str,
                 prefix: str | None, results_dir: str) -> list[dict]:
    ours, nper = _rollup_published(os.path.join(results_dir,
                                                by_country_csv))
    if prefix is not None:
        ours = ours[[c for c in ours.columns if c.startswith(prefix)]]
    pub = pd.read_csv(os.path.join(results_dir, region_csv), index_col=0)
    if list(pub.index) != list(ours.index):
        raise AssertionError(f"{region_csv}: region order "
                             f"{list(pub.index)} != {REGIONS}")
    if list(pub.columns) != list(ours.columns):
        raise AssertionError(f"{region_csv}: column order differs: "
                             f"{list(pub.columns)[:4]}... vs "
                             f"{list(ours.columns)[:4]}...")
    diff = (ours.round(2) - pub).abs()
    return [{"file": region_csv, "region": r,
             "n_cols": int(diff.shape[1]),
             "n_countries": int(nper[r]),
             "max_abs_diff": float(diff.loc[r].max()),
             "bound": 0.005 * (nper[r] + 1),
             "region_total": float(pub.loc[r].sum())}
            for r in REGIONS]


def real_region_rollup(results_dir: str = REFERENCE_RESULTS_DIR
                       ) -> pd.DataFrame:
    """One row per (published by-region file, region): our rollup of
    the published by-country table vs the published region cell, with
    the rounding bound it must stay inside."""
    items = [{"region_csv": k, "by_country": v[0],
              "prefix": "" if v[1] is None else v[1]}
             for k, v in sorted(REAL_ROLLUP_FILES.items())]

    def one(batch: dict) -> pd.DataFrame:
        rows = []
        for rc, bc, pre in zip(batch["region_csv"], batch["by_country"],
                               batch["prefix"]):
            rows += _compare_one(str(rc), str(bc),
                                 str(pre) or None, results_dir)
        return pd.DataFrame(rows)

    df = (ray.data.from_items(items)
          .map_batches(one, batch_size=1, batch_format="numpy")
          .to_pandas())
    return df.sort_values(["file", "region"],
                          kind="mergesort").reset_index(drop=True)


#: countries exempt from the large-country band in FAO-Slope (the FAO
#: data predates the 2010 Norway/Russia Arctic boundary resolution and
#: under-covers the high north; test_extract_country_data.py:44-46)
_FAO_SLOPE_SKIPS = frozenset({
    "Canada", "Finland", "Greenland", "Iceland", "Norway",
    "Russian Federation", "Sweden"})


def _csv_area_rows(name: str, results_dir: str) -> list[dict]:
    """One published by-country CSV -> per-country CIA band verdicts,
    the reference's own rule incl. its product-specific exemptions
    (test_extract_country_data.py:15-50)."""
    from ..cia_areas import EXPECTED_AREA_KM2
    low = name.lower()
    df = pd.read_csv(os.path.join(results_dir, name), index_col=0)
    rows = []
    for country, row in df.iterrows():
        area = float(row.sum())
        exp = EXPECTED_AREA_KM2.get(country.upper())
        checked, in_band = True, True
        if country == "Antarctica" or exp is None:
            checked = False
        elif exp < 5000 and area < 5000:
            checked = False
        elif exp < 35000 and area < 35000:
            if "workability" in low:
                checked = False  # FAO omits/overestimates small states
            else:
                in_band = exp * 0.45 < area < exp * 1.20
        else:
            if ("workability" in low and country == "Norway") or \
                    ("fao-slope" in low and country in _FAO_SLOPE_SKIPS):
                checked = False
            else:
                in_band = exp * 0.76 < area < exp * 1.07
        rows.append({"file": name, "country": str(country),
                     "area_km2": area,
                     "expected_km2": float(-1 if exp is None else exp),
                     "checked": bool(checked),
                     "in_band": bool(in_band if checked else False),
                     "no_table_entry": bool(exp is None
                                            and country != "Antarctica")})
    return rows


def real_csv_areas(results_dir: str = REFERENCE_RESULTS_DIR
                   ) -> pd.DataFrame:
    """The reference's `test_country_areas_reasonable` reproduced over
    its PUBLISHED outputs with OUR CIA table and band kernel: every
    country row-sum of every published ``*-by-country.csv`` inside the
    tolerance band (product-specific exemptions mirrored)."""
    import glob as _glob
    names = sorted(os.path.basename(p) for p in
                   _glob.glob(os.path.join(results_dir,
                                           "*-by-country.csv")))
    if not names:
        raise FileNotFoundError(f"no by-country CSVs in {results_dir}")

    def one(batch: dict) -> pd.DataFrame:
        rows = []
        for n in batch["name"]:
            rows += _csv_area_rows(str(n), results_dir)
        return pd.DataFrame(rows)

    df = (ray.data.from_items([{"name": n} for n in names])
          .map_batches(one, batch_size=1, batch_format="numpy")
          .to_pandas())
    return df.sort_values(["file", "country"],
                          kind="mergesort").reset_index(drop=True)


def check_real_csv_areas(df: pd.DataFrame) -> pd.DataFrame:
    """>=7 published files, >=100 banded countries each (Workability's
    extra exemptions allow fewer), no country missing from our CIA
    table, zero band violations."""
    files = df["file"].unique()
    if len(files) < 7:
        raise AssertionError(f"only {len(files)} published by-country "
                             f"CSVs: {list(files)}")
    checked = df[df["checked"]]
    per_file = checked.groupby("file").size()
    if (per_file < 100).any():
        raise AssertionError("too few banded countries:\n"
                             + per_file.to_string())
    if df["no_table_entry"].any():
        raise AssertionError("countries missing from the CIA table:\n"
                             + df[df["no_table_entry"]].to_string())
    bad = checked[~checked["in_band"]]
    if len(bad):
        raise AssertionError("published CSV areas out of CIA band:\n"
                             + bad.to_string(index=False))
    return df


def check_real_region_rollup(df: pd.DataFrame) -> pd.DataFrame:
    """Every cell of every published by-region file within the
    rounding bound, all nine regions present per file, and the tables
    non-trivial (a region with real land has a nonzero total)."""
    want = len(REAL_ROLLUP_FILES) * len(REGIONS)
    if len(df) != want:
        raise AssertionError(f"expected {want} (file, region) rows:\n"
                             + df.to_string(index=False))
    bad = df[df["max_abs_diff"] > df["bound"]]
    if len(bad):
        raise AssertionError("published region rollups out of bound:\n"
                             + bad.to_string(index=False))
    if not (df.groupby("file")["region_total"].sum() > 0).all():
        raise AssertionError("a published by-region table sums to zero")
    return df
