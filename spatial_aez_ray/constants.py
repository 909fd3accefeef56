"""Class vocabularies and classification lookup tables.

Semantics re-derived from the reference implementation (see file:line
citations on each table): ProjectDrawdown/spatial-aez classifies
Köppen-Geiger (KG), ESA-CCI land cover (LCCS), GAEZ slope fractions,
FAO workability and land-productivity-dynamics (LPD) rasters into
thermal-moisture regimes, land-use families, soil-health classes and
29 agro-ecological zones per regime.

Everything here is a plain module-level constant (the reference holds
the same vocabularies in per-lookup-class code,
``extract_country_data.py:39-51,111-114,135-137,160-162,182-183,204-205``);
no actor state is needed for LUT remaps.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Köppen-Geiger classes. The reference's 1 km KG raster stores palette
# indices whose legend order is the standard Beck et al. ordering; the
# color table maps index -> RGB -> class string
# (extract_country_data.py:39-51). Our synthetic KG raster stores the
# legend index directly (1..30, 0 = nodata), so class = KG_CLASSES[v-1].
# ---------------------------------------------------------------------------
KG_CLASSES: list[str] = [
    "Af", "Am", "Aw",
    "BWh", "BWk", "BSh", "BSk",
    "Csa", "Csb", "Csc",
    "Cwa", "Cwb", "Cwc",
    "Cfa", "Cfb", "Cfc",
    "Dsa", "Dsb", "Dsc", "Dsd",
    "Dwa", "Dwb", "Dwc", "Dwd",
    "Dfa", "Dfb", "Dfc", "Dfd",
    "ET", "EF",
]

# RGB color -> KG class, the published Beck et al. legend colors
# (legend.txt from the gloh2o.org/koppen archive; carried verbatim by
# the reference as KGlookup.kg_colors, extract_country_data.py:38-50).
# Used by sources.geotiff.kg_palette_lut to decode palette rasters
# (index -> RGB -> class); white/black entries are blank/masked.
KG_COLORS: dict[tuple[int, int, int], str] = {
    (0, 0, 255): "Af", (0, 120, 255): "Am", (70, 170, 250): "Aw",
    (255, 0, 0): "BWh", (255, 150, 150): "BWk", (245, 165, 0): "BSh",
    (255, 220, 100): "BSk",
    (255, 255, 0): "Csa", (200, 200, 0): "Csb", (150, 150, 0): "Csc",
    (150, 255, 150): "Cwa", (100, 200, 100): "Cwb", (50, 150, 50): "Cwc",
    (200, 255, 80): "Cfa", (100, 255, 80): "Cfb", (50, 200, 0): "Cfc",
    (255, 0, 255): "Dsa", (200, 0, 200): "Dsb", (150, 50, 150): "Dsc",
    (150, 100, 150): "Dsd", (170, 175, 255): "Dwa", (90, 120, 220): "Dwb",
    (75, 80, 180): "Dwc", (50, 0, 135): "Dwd", (0, 255, 255): "Dfa",
    (55, 200, 255): "Dfb", (0, 125, 125): "Dfc", (0, 70, 95): "Dfd",
    (178, 178, 178): "ET", (102, 102, 102): "EF",
}

# Thermal-moisture regimes; membership sets are exactly the
# ``populate_tmr`` masks in process_imagery.py:82-96 (KG value sets).
TMR_NAMES: list[str] = [
    "tropical-humid", "arid", "tropical-semiarid", "temperate-humid",
    "temperate-semiarid", "boreal-humid", "boreal-semiarid", "arctic",
]

_TMR_MEMBERS: dict[str, tuple[int, ...]] = {
    "tropical-humid": (1, 2, 3),
    "arid": (4, 5),
    "tropical-semiarid": (6, 7),
    "temperate-semiarid": (8, 9, 10),
    "temperate-humid": (11, 12, 13, 14, 15, 16),
    "boreal-semiarid": (17, 18, 19, 20, 21, 22, 23, 24),
    "boreal-humid": (25, 26, 27, 28),
    "arctic": (29, 30),
}

# KG value (0..255) -> TMR index in TMR_NAMES order; 255 entries so a
# uint8 np.take never goes out of bounds. -1 (stored as 255) = invalid.
TMR_INVALID = 255


def _build_kg_to_tmr() -> np.ndarray:
    lut = np.full(256, TMR_INVALID, dtype=np.uint8)
    for name, members in _TMR_MEMBERS.items():
        idx = TMR_NAMES.index(name)
        for v in members:
            lut[v] = idx
    return lut


KG_TO_TMR: np.ndarray = _build_kg_to_tmr()

# ---------------------------------------------------------------------------
# ESA-CCI LCCS land-cover classes (value == class id,
# extract_country_data.py:111-114). 0 and 255 are nodata.
# ---------------------------------------------------------------------------
LCCS_CLASSES: list[int] = [
    10, 11, 12, 20, 30, 40, 50, 60, 61, 62, 70, 71, 72, 80, 81, 82, 90,
    100, 110, 120, 121, 122, 130, 140, 150, 151, 152, 153, 160, 170, 180,
    190, 200, 201, 202, 210, 220,
]

# Land-use families, membership per populate_land_use
# (process_imagery.py:107-124).
LAND_USE_NAMES: list[str] = [
    "forest", "cropland_rainfed", "cropland_irrigated", "grassland",
    "bare", "urban", "water", "ice",
]

_LAND_USE_MEMBERS: dict[str, tuple[int, ...]] = {
    "forest": (12, 50, 60, 61, 62, 70, 71, 72, 80, 81, 82, 90, 100, 160, 170),
    "cropland_rainfed": (10, 30),
    "cropland_irrigated": (20,),
    "grassland": (11, 40, 110, 120, 121, 122, 130, 150, 151, 152, 153, 180),
    "bare": (140, 200, 201, 202),
    "urban": (190,),
    "water": (210,),
    "ice": (220,),
}

# Degraded-analysis variant: cropland merges 10/20/30, grassland gains
# 100, forest loses 100 (degraded_analysis.py:115-131).
DEGRADED_COVER_NAMES: list[str] = [
    "forest", "cropland", "grassland", "bare", "urban", "water", "ice",
]

_DEGRADED_COVER_MEMBERS: dict[str, tuple[int, ...]] = {
    "forest": (12, 50, 60, 61, 62, 70, 71, 72, 80, 81, 82, 90, 160, 170),
    "cropland": (10, 30, 20),
    "grassland": (11, 40, 100, 110, 120, 121, 122, 130, 150, 151, 152, 153, 180),
    "bare": (140, 200, 201, 202),
    "urban": (190,),
    "water": (210,),
    "ice": (220,),
}

LAND_USE_NONE = 255


def _members_to_lut(members: dict[str, tuple[int, ...]], order: list[str]) -> np.ndarray:
    lut = np.full(256, LAND_USE_NONE, dtype=np.uint8)
    for name, vals in members.items():
        idx = order.index(name)
        for v in vals:
            lut[v] = idx
    return lut


LC_TO_LAND_USE: np.ndarray = _members_to_lut(_LAND_USE_MEMBERS, LAND_USE_NAMES)
LC_TO_DEGRADED_COVER: np.ndarray = _members_to_lut(
    _DEGRADED_COVER_MEMBERS, DEGRADED_COVER_NAMES)

# ---------------------------------------------------------------------------
# Slope. The consolidated slope raster has 8 bands, each the percentage
# of the pixel in one GAEZ slope class (data/README.txt:15-25). The
# 3-class reduction is populate_slope (process_imagery.py:99-104):
#   minimal  = (b1+b2+b3+b4)/100, moderate = (b5+b6)/100,
#   steep    = (b7+b8)/100.
# ---------------------------------------------------------------------------
GEOMORPHO_SLOPE_CLASSES: list[str] = [
    "0-0.5%", "0.5-2%", "2-5%", "5-10%", "10-15%", "15-30%", "30-45%", ">45%",
]
FAO_SLOPE_CLASSES: list[str] = [
    "0-0.5%", "0.5-2%", "2-5%", "5-8%", "8-15%", "15-30%", "30-45%", ">45%",
]
SLOPE_NAMES: list[str] = ["minimal", "moderate", "steep"]
GEOMORPHO_SLOPE_NODATA = 127
FAO_SLOPE_NODATA = 255

# ---------------------------------------------------------------------------
# Workability -> soil health (populate_soil_health,
# process_imagery.py:127-134). Degraded-analysis variant uses
# good/marginal/poor/verypoor = 1/2/3/4 (degraded_analysis.py:141-145).
# ---------------------------------------------------------------------------
SOIL_HEALTH_NAMES: list[str] = ["prime", "good", "marginal", "barren", "water"]
SOIL_NONE = 255

_SOIL_MEMBERS: dict[str, tuple[int, ...]] = {
    "prime": (1,),
    "good": (2,),
    "marginal": (3, 4, 6),
    "barren": (5,),
    "water": (7,),
}

WK_TO_SOIL: np.ndarray = _members_to_lut(_SOIL_MEMBERS, SOIL_HEALTH_NAMES)

DEGRADED_SOIL_NAMES: list[str] = ["good", "marginal", "poor", "verypoor"]
_DEGRADED_SOIL_MEMBERS: dict[str, tuple[int, ...]] = {
    "good": (1,), "marginal": (2,), "poor": (3,), "verypoor": (4,),
}
WK_TO_DEGRADED_SOIL: np.ndarray = _members_to_lut(
    _DEGRADED_SOIL_MEMBERS, DEGRADED_SOIL_NAMES)

WORKABILITY_CLASSES: list[int] = [1, 2, 3, 4, 5, 6, 7]

# ---------------------------------------------------------------------------
# AEZ cross-classification (yield_AEZs, process_imagery.py:137-198).
#
# AEZ1..28 follow the pattern: for each land-use family in
# (forest, grassland, cropland_irrigated, cropland_rainfed) — 7 zones:
#   prime/minimal, good/minimal, (good|prime)/moderate,
#   (good|prime)/steep, marginal/minimal, marginal/moderate,
#   marginal/steep.
# AEZ29 = bare ∨ barren, where bare = land_use in {bare, ice, urban} and
# barren = soil_health==barren; the reference zeroes barren where bare is
# already set (process_imagery.py:195-198) which is exactly boolean OR.
#
# AEZ_LUT[slope_class, land_use_idx, soil_idx] -> aez number 1..28, or 0
# for "no zone". slope_class in (0=minimal, 1=moderate, 2=steep).
# ---------------------------------------------------------------------------
_AEZ_FAMILY_ORDER = ["forest", "grassland", "cropland_irrigated", "cropland_rainfed"]


def _build_aez_lut() -> np.ndarray:
    lut = np.zeros((3, len(LAND_USE_NAMES) + 1, len(SOIL_HEALTH_NAMES) + 1),
                   dtype=np.uint8)
    s_prime = SOIL_HEALTH_NAMES.index("prime")
    s_good = SOIL_HEALTH_NAMES.index("good")
    s_marg = SOIL_HEALTH_NAMES.index("marginal")
    k_min, k_mod, k_steep = 0, 1, 2
    for fam_i, fam in enumerate(_AEZ_FAMILY_ORDER):
        base = fam_i * 7  # AEZ base-1 offset for this family
        u = LAND_USE_NAMES.index(fam)
        lut[k_min, u, s_prime] = base + 1
        lut[k_min, u, s_good] = base + 2
        lut[k_mod, u, s_good] = base + 3
        lut[k_mod, u, s_prime] = base + 3   # (good + prime) on moderate
        lut[k_steep, u, s_good] = base + 4
        lut[k_steep, u, s_prime] = base + 4  # (good + prime) on steep
        lut[k_min, u, s_marg] = base + 5
        lut[k_mod, u, s_marg] = base + 6
        lut[k_steep, u, s_marg] = base + 7
    return lut


AEZ_LUT: np.ndarray = _build_aez_lut()
N_AEZ = 29

AEZ_COLUMNS: list[str] = [
    f"{tmr}|AEZ{n}" for tmr in TMR_NAMES for n in range(1, N_AEZ + 1)
]

# Fixed region list and row order (process_imagery.py:283-285,
# extract_country_data.py:255-257).
REGIONS: list[str] = [
    "OECD90", "Eastern Europe", "Asia (Sans Japan)", "Middle East and Africa",
    "Latin America", "China", "India", "EU", "USA",
]

# Render palette codes for output rasters (process_imagery.py:33-74):
# AEZ code = TMR base + (aez-1); blanks per create_*_GeoTIFF.
TMR_BASE_COLOR: dict[str, int] = {
    "tropical-humid": 0, "arid": 30, "tropical-semiarid": 60,
    "temperate-humid": 90, "temperate-semiarid": 120, "boreal-humid": 150,
    "boreal-semiarid": 180, "arctic": 210,
}
AEZ_BLANK = 255
SLOPE_BLANK = 3       # C_SLP_BLNK
LAND_USE_BLANK = 8    # C_LUS_BLNK
SOIL_BLANK = 6        # C_SLH_BLNK

# Soil-health render shifts labels down one palette slot
# (process_imagery.py:487-491): prime->0 (C_SLH_GOOD), good->1
# (C_SLH_MRGN), marginal->2 (C_SLH_POOR), barren->4, water->5.
SOIL_RENDER_CODE: dict[str, int] = {
    "prime": 0, "good": 1, "marginal": 2, "barren": 4, "water": 5,
}

DEGRADED_COLUMNS: list[str] = [
    f"{cover}:{soil}:{deg}"
    for cover in DEGRADED_COVER_NAMES
    for deg in ("degraded", "nondegraded")
    for soil in DEGRADED_SOIL_NAMES
]
