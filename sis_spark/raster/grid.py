"""Grid geometry semantics: GridExtent + affine gridToCRS, SIS conventions.

* GridExtent bounds are **inclusive** low/high per dimension
  (F/coverage/grid/GridExtent.java:105,340) — preserved here.
* gridToCRS maps CELL_CORNER by default; CELL_CENTER adds the +0.5 shift
  (F/coverage/grid/PixelInCell.java, PixelTranslation.java) via
  transforms.grid_to_crs.
* Tile index = floorDiv(cell, tile_size) (S/tiling/TiledGridCoverage.java:326).
* GridDerivation-style pruning (request ∩ data, rounded to tiles,
  F/coverage/grid/GridDerivation.java:332-401) is `derive_read_extent`.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..functions import transforms as tr


@dataclass(frozen=True)
class GridGeometry:
    """extent: (x0, y0, x1, y1) INCLUSIVE cell bounds; affine: 6-tuple
    grid(corner)->CRS; crs: identifier string."""

    extent: tuple[int, int, int, int]
    affine: tuple
    crs: str = "EPSG:4326"

    @property
    def width(self) -> int:
        return self.extent[2] - self.extent[0] + 1

    @property
    def height(self) -> int:
        return self.extent[3] - self.extent[1] + 1

    def cell_center_to_crs(self, gx, gy):
        return tr.affine_apply(tr.grid_to_crs(self.affine, cell_center=True), gx, gy)

    def crs_to_cell(self, x, y):
        """CRS coords -> containing cell indices (floor; inclusive-low rule)."""
        inv = tr.affine_invert(self.affine)
        fx, fy = tr.affine_apply(inv, x, y)
        return np.floor(fx).astype(np.int64), np.floor(fy).astype(np.int64)

    def envelope(self):
        """CRS envelope of the extent (corner-registered affine over the
        inclusive extent spans +1 cell on each axis)."""
        x0, y0, x1, y1 = self.extent
        cx = np.array([x0, x1 + 1], dtype=np.float64)
        cy = np.array([y0, y1 + 1], dtype=np.float64)
        ex, ey = tr.affine_apply(self.affine, cx[[0, 1, 0, 1]], cy[[0, 0, 1, 1]])
        return float(ex.min()), float(ey.min()), float(ex.max()), float(ey.max())


def tile_index(cell: np.ndarray, tile_size: int) -> np.ndarray:
    """floorDiv — negative-safe, matching java Math.floorDiv used by
    TiledGridCoverage (S/tiling/TiledGridCoverage.java:326)."""
    return np.floor_divide(np.asarray(cell, dtype=np.int64), tile_size)


def derive_read_extent(
    gg: GridGeometry, request: tuple[int, int, int, int], tile_size: int
) -> tuple[int, int, int, int] | None:
    """Request ∩ data extent, expanded to tile boundaries (GridDerivation
    pruning).  Returns None when disjoint."""
    x0 = max(gg.extent[0], request[0])
    y0 = max(gg.extent[1], request[1])
    x1 = min(gg.extent[2], request[2])
    y1 = min(gg.extent[3], request[3])
    if x0 > x1 or y0 > y1:
        return None
    return (
        int(tile_index(np.array([x0]), tile_size)[0] * tile_size),
        int(tile_index(np.array([y0]), tile_size)[0] * tile_size),
        int((tile_index(np.array([x1]), tile_size)[0] + 1) * tile_size - 1),
        int((tile_index(np.array([y1]), tile_size)[0] + 1) * tile_size - 1),
    )


def subsample(gg: GridGeometry, sx: int, sy: int) -> GridGeometry:
    """Integer-stride subsampling: new affine = affine ∘ scale(sx, sy)
    (TiledGridCoverage.java:460 'subsampling via integer stride')."""
    a = tr.affine_concat(gg.affine, (float(sx), 0.0, 0.0, 0.0, float(sy), 0.0))
    return GridGeometry(
        (
            gg.extent[0] // sx,
            gg.extent[1] // sy,
            gg.extent[2] // sx,
            gg.extent[3] // sy,
        ),
        a,
        gg.crs,
    )
