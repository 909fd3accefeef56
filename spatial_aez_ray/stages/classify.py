"""Per-tile class-area kernels (the reference's lookup-object protocol).

Each classifier mirrors one lookup class of
/root/reference/extract_country_data.py (KGlookup:30-74,
ESA_LC_lookup:77-114, GeomorphoLookup:117-137, WorkabilityLookup:165-183,
DegradedLandLookup:186-205): given a tile's band arrays, a feature mask
and the per-pixel km² weights, emit (column, area) partial sums.

The float-op sequence is kept IDENTICAL to the reference shape
(select-by-mask, then ``w[vals == label].sum()`` per unique label) so
per-tile partials are bit-exact against the sequential oracle; the
distributed combine then only has to fix its order (see zonal.py) for
end-to-end bit-exact CSVs.

This is also the engine's user-extension surface (SURVEY.md §2.9): any
object with ``dataset``, ``grid``, ``columns()`` and ``class_sums()``
plugs into ``pipelines.extract.zonal_stats``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np

from ..constants import (
    FAO_SLOPE_CLASSES, FAO_SLOPE_NODATA, GEOMORPHO_SLOPE_CLASSES,
    KG_CLASSES, LCCS_CLASSES, WORKABILITY_CLASSES,
)

ClassSums = Iterator[tuple[str, float]]


class KGClassifier:
    """Köppen-Geiger classes; fixture KG stores the legend index
    directly so class = KG_CLASSES[v-1] (the reference resolves palette
    index -> RGB -> class, extract_country_data.py:53-70)."""

    dataset = "kg"
    grid = "g1"

    def columns(self) -> list[str]:
        return list(KG_CLASSES)

    def class_sums(self, bands, mask, km2) -> ClassSums:
        vals = bands[0][mask]
        w = km2[mask]
        for label in np.unique(vals):
            if label == 0 or label > 30:
                continue
            yield KG_CLASSES[label - 1], w[vals == label].sum()


class LCClassifier:
    """ESA-CCI LCCS: value == class, skip 0/255
    (extract_country_data.py:96-114)."""

    dataset = "lc"
    grid = "g3"

    def columns(self) -> list[str]:
        return [str(c) for c in LCCS_CLASSES]

    def class_sums(self, bands, mask, km2) -> ClassSums:
        vals = bands[0][mask]
        w = km2[mask]
        for label in np.unique(vals):
            if label == 0 or label == 255:
                continue
            yield str(label), w[vals == label].sum()


class SlopeClassifier:
    """8-band fractional slope percentages; per band
    Σ km² · pct/100 over in-mask, non-nodata pixels
    (GeomorphoLookup, extract_country_data.py:117-133)."""

    dataset = "slope"
    grid = "g1"
    nodata = 127

    def columns(self) -> list[str]:
        return list(GEOMORPHO_SLOPE_CLASSES)

    def class_sums(self, bands, mask, km2) -> ClassSums:
        for b in range(8):
            blk = bands[b].astype(float)
            bad = np.logical_or(~mask, blk == self.nodata)
            blk = np.where(bad, 0.0, blk)
            yield GEOMORPHO_SLOPE_CLASSES[b], (km2 * (blk / 100.0))[~bad].sum()


class FaoSlopeClassifier:
    """FAO GAEZ 3.0 slope variant (FaoSlopeLookup,
    extract_country_data.py:140-162): 8 fractional-percentage bands
    like Geomorpho but with the FAO class vocabulary ("5-8%"/"8-15%"
    bins), nodata 255, and the reference's masked-fill + whole-array
    ``np.nansum`` summation shape (NOT the Geomorpho select-then-sum
    — the float-op sequence is mirrored for bit-exactness against the
    sequential oracle)."""

    dataset = "fao"
    grid = "g1"
    nodata = FAO_SLOPE_NODATA

    def columns(self) -> list[str]:
        return list(FAO_SLOPE_CLASSES)

    def class_sums(self, bands, mask, km2) -> ClassSums:
        for b in range(8):
            blk = bands[b].astype(float)
            bad = np.logical_or(~mask, blk == self.nodata)
            masked = np.where(bad, 0.0, blk)
            yield FAO_SLOPE_CLASSES[b], np.nansum(km2 * (masked / 100.0))


class WorkabilityClassifier:
    """Workability classes 1..7, skip 0/255
    (extract_country_data.py:165-183)."""

    dataset = "wk"
    grid = "g1"

    def columns(self) -> list[str]:
        return [str(c) for c in WORKABILITY_CLASSES]

    def class_sums(self, bands, mask, km2) -> ClassSums:
        vals = bands[0][mask]
        w = km2[mask]
        for label in np.unique(vals):
            if label == 0 or label == 255:
                continue
            yield str(label), w[vals == label].sum()


class DegradedClassifier:
    """LPD != 0 -> degraded else nondegraded
    (extract_country_data.py:186-205)."""

    dataset = "lpd"
    grid = "g1"

    def columns(self) -> list[str]:
        return ["degraded", "nondegraded"]

    def class_sums(self, bands, mask, km2) -> ClassSums:
        vals = bands[0][mask]
        w = km2[mask]
        for label in np.unique(vals):
            col = "degraded" if label != 0 else "nondegraded"
            yield col, w[vals == label].sum()


CLASSIFIERS = {
    "kg": KGClassifier,
    "lc": LCClassifier,
    "slope": SlopeClassifier,
    "fao": FaoSlopeClassifier,
    "wk": WorkabilityClassifier,
    "lpd": DegradedClassifier,
}
