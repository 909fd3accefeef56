"""Grid geometry: geotransforms, per-pixel geodesic area, block clamps.

The area formula reproduces ``geoutil.km2_block``
(/root/reference/geoutil.py:10-25) exactly, constants included
(WGS84 a=6378.137 km, e^2=0.00669437999014 and the degree-of-latitude
series 111.132954 - 0.559822 cos 2y + 0.001175 cos 4y), because zonal
outputs must match the reference bit-for-bit on fixtures.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class GridSpec:
    """A global WGS84 equirectangular pixel grid + its tiling.

    Mirrors a GDAL geotransform with no rotation:
    lon = x_min + col * x_size ; lat = y_min + row * y_size
    (y_size negative, rows go north->south), like the reference rasters.
    """

    name: str
    width: int          # pixels (columns)
    height: int         # pixels (rows)
    tile: int           # tile edge in pixels (square tiles, edge-clamped)
    x_min: float = -180.0
    y_min: float = 90.0

    @property
    def x_size(self) -> float:
        return 360.0 / self.width

    @property
    def y_size(self) -> float:
        return -180.0 / self.height

    @property
    def tiles_x(self) -> int:
        return (self.width + self.tile - 1) // self.tile

    @property
    def tiles_y(self) -> int:
        return (self.height + self.tile - 1) // self.tile

    def tile_window(self, ty: int, tx: int) -> tuple[int, int, int, int]:
        """(x_off, y_off, ncols, nrows) of tile (ty, tx), edge-clamped
        like ``geoutil.blklim`` (/root/reference/geoutil.py:35-40)."""
        x = tx * self.tile
        y = ty * self.tile
        return x, y, blklim(x, self.tile, self.width), blklim(y, self.tile, self.height)

    def lats(self, y_off: int, nrows: int) -> np.ndarray:
        """Pixel-center latitudes for rows [y_off, y_off+nrows)."""
        rows = np.arange(y_off, y_off + nrows, dtype=np.float64)
        return self.y_min + (rows + 0.5) * self.y_size

    def lons(self, x_off: int, ncols: int) -> np.ndarray:
        """Pixel-center longitudes for cols [x_off, x_off+ncols)."""
        cols = np.arange(x_off, x_off + ncols, dtype=np.float64)
        return self.x_min + (cols + 0.5) * self.x_size


def blklim(coord: int, blksiz: int, totsiz: int) -> int:
    """Block dimension clamped at the raster edge (geoutil.py:35-40)."""
    if coord + blksiz < totsiz:
        return blksiz
    return totsiz - coord


def km2_rows(nrows: int, y_off: int, grid: GridSpec) -> np.ndarray:
    """Per-row pixel area in km² (one value per row; constant along a row).

    Bit-exact reimplementation of geoutil.km2_block
    (/root/reference/geoutil.py:10-25): the reference walks row by row
    starting at y = radians(y_min + y_off*y_size) - yrad/2 and decrements
    by yrad per row; we reproduce the identical sequence of float ops for
    the scalar per-row latitude so results match to the last ulp.
    """
    y_sizdeg = grid.y_size
    yrad = math.radians(abs(y_sizdeg))
    out = np.empty(nrows, dtype=np.float64)
    y = math.radians(grid.y_min + (y_off * y_sizdeg)) - (yrad / 2)
    x_sizdeg = grid.x_size
    for i in range(nrows):
        xlen = abs(x_sizdeg) * (math.cos(y) * math.pi * 6378.137 /
                (180 * math.sqrt(1 - 0.00669437999014 * (math.sin(y) ** 2))))
        ylen = abs(y_sizdeg) * (111.132954 - (0.559822 * math.cos(2 * y)) +
                (0.001175 * math.cos(4 * y)))
        out[i] = xlen * ylen
        y -= yrad
    return out


def km2_block(nrows: int, ncols: int, y_off: int, grid: GridSpec) -> np.ndarray:
    """(nrows, ncols) per-pixel area array, same as geoutil.km2_block."""
    return np.repeat(km2_rows(nrows, y_off, grid)[:, None], ncols, axis=1)


def upsample3(a: np.ndarray) -> np.ndarray:
    """3×3 nearest-neighbour upsample, the reference's alignment of 1 km
    rasters onto the 300 m grid (process_imagery.py:253-271)."""
    return np.repeat(np.repeat(a, 3, axis=1), 3, axis=0)


#: mean Earth radius (km) — the public IUGG mean radius; spherical
#: haversine is the documented distance model for radius queries (the
#: reference's area math stays on the WGS84 constants above).
EARTH_RADIUS_KM = 6371.0088


def haversine_km(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Vectorized spherical great-circle distance in km. BOTH the
    distributed radius query and its sequential oracle call this one
    function, so the float math is bit-identical on both sides."""
    rl1, rl2 = np.radians(lat1), np.radians(lat2)
    dlat = rl2 - rl1
    dlon = np.radians(lon2) - np.radians(lon1)
    a = (np.sin(dlat / 2.0) ** 2
         + np.cos(rl1) * np.cos(rl2) * np.sin(dlon / 2.0) ** 2)
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))
