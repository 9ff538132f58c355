"""Terrain derivatives over tiled rasters: gradient, slope, hillshade.

DEM analysis operators in the distributed tile model (the neighborhood-
operator counterpart of the marching-squares halo in raster/isolines.py —
the reference's image-processing neighborhood contract,
F/image/ImageProcessor.java pipeline style):

1. **Halo gather**: a central-difference pixel needs its 4-neighborhood, so
   each destination tile gathers a 1-pixel ring from up to 8 neighbor tiles
   — a 9-way explode + groupBy, the same shuffle shape as isolines (no
   broadcast, no dense mosaic).
2. **Gradient** follows ``numpy.gradient`` semantics exactly: central
   differences (f(x+1) - f(x-1)) / 2 in the interior, one-sided differences
   at the raster's global edges — deterministic from pixel COORDINATES (not
   from NaN sniffing), so the SQL oracle can replay every pixel.
3. **Slope / hillshade** are transcendental reductions of the gradient
   (Horn/ESRI hillshade formula); they are pytest-differential (a SQL oracle
   cannot replay libm), while the gradient itself is oracle-gated through
   integer checksums (gate `gradient`).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import transforms as _tr
from .grid import GridGeometry

GRAD_SCHEMA = "tx long, ty long, dzdx binary, dzdy binary"


def _halo_groups(src: DataFrame) -> DataFrame:
    """Each tile contributes to its own group and its 8 neighbors' groups."""
    return (
        src.select(
            F.explode(
                F.array(*[
                    F.struct(
                        (F.col("tx") + dx).alias("gtx"),
                        (F.col("ty") + dy).alias("gty"),
                    )
                    for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                ])
            ).alias("g"),
            "tx", "ty", "data",
        )
        .select("g.gtx", "g.gty", "tx", "ty", "data")
        .filter((F.col("gtx") >= 0) & (F.col("gty") >= 0))
    )


def gradient_tiles(
    tiles_df: DataFrame,
    gg: GridGeometry,
    band: int = 0,
    tile_size: int = 64,
    dtype=np.uint8,
) -> DataFrame:
    """Per-tile dz/dx and dz/dy planes (float64 bytes, numpy.gradient
    semantics in PIXEL units — callers divide by the affine cell size for
    CRS units).  Tiles are emitted only for the raster's real extent;
    padding pixels beyond (width, height) never contribute."""
    h, w = gg.height, gg.width
    bdt = np.dtype(dtype)
    ntx = (w + tile_size - 1) // tile_size
    nty = (h + tile_size - 1) // tile_size
    contrib = _halo_groups(tiles_df.filter(F.col("band") == band)).filter(
        (F.col("gtx") < ntx) & (F.col("gty") < nty)
    )

    def fn(key, pdf):
        gtx, gty = int(key[0]), int(key[1])
        ts = tile_size
        halo = np.full((ts + 2, ts + 2), np.nan)
        for data, tx, ty in zip(pdf["data"], pdf["tx"], pdf["ty"]):
            block = (
                np.frombuffer(data, dtype=bdt)
                .reshape(ts, ts)
                .astype(np.float64)
            )
            oy = (int(ty) - gty) * ts + 1
            ox = (int(tx) - gtx) * ts + 1
            y0, x0 = max(oy, 0), max(ox, 0)
            y1, x1 = min(oy + ts, ts + 2), min(ox + ts, ts + 2)
            if y1 <= y0 or x1 <= x0:
                continue
            halo[y0:y1, x0:x1] = block[y0 - oy:y1 - oy, x0 - ox:x1 - ox]
        # global pixel coordinates of the halo's interior window
        px = gtx * ts + np.arange(ts)
        py = gty * ts + np.arange(ts)
        vw = int(np.count_nonzero(px < w))
        vh = int(np.count_nonzero(py < h))
        if vw == 0 or vh == 0:
            return pd.DataFrame({"tx": [], "ty": [], "dzdx": [], "dzdy": []})
        c = halo[1:1 + ts, 1:1 + ts]
        lf, rt = halo[1:1 + ts, 0:ts], halo[1:1 + ts, 2:2 + ts]
        up, dn = halo[0:ts, 1:1 + ts], halo[2:2 + ts, 1:1 + ts]
        gxm = px[None, :] == 0          # left raster edge: forward diff
        gxp = px[None, :] == w - 1      # right raster edge: backward diff
        gym = py[:, None] == 0
        gyp = py[:, None] == h - 1
        dzdx = np.where(gxm, rt - c, np.where(gxp, c - lf, (rt - lf) * 0.5))
        dzdy = np.where(gym, dn - c, np.where(gyp, c - up, (dn - up) * 0.5))
        dzdx[:, vw:] = 0.0
        dzdx[vh:, :] = 0.0
        dzdy[:, vw:] = 0.0
        dzdy[vh:, :] = 0.0
        return pd.DataFrame([
            {"tx": gtx, "ty": gty,
             "dzdx": dzdx.tobytes(), "dzdy": dzdy.tobytes()}
        ])

    return contrib.groupBy("gtx", "gty").applyInPandas(fn, schema=GRAD_SCHEMA)


def hillshade_tiles(
    tiles_df: DataFrame,
    gg: GridGeometry,
    band: int = 0,
    tile_size: int = 64,
    dtype=np.uint8,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    z_factor: float = 1.0,
) -> DataFrame:
    """Standard hillshade (ESRI/Horn formula) from the distributed gradient:
    255 * (cos(zen)*cos(slope) + sin(zen)*sin(slope)*cos(az - aspect)),
    clamped at 0 — emitted as uint8 tiles (tx, ty, band=0, data).  Gradient
    is converted to CRS units through the affine cell size."""
    sx = abs(gg.affine[0])
    sy = abs(gg.affine[4])
    zen = math.radians(90.0 - altitude_deg)
    az = math.radians(360.0 - azimuth_deg + 90.0)

    grads = gradient_tiles(tiles_df, gg, band, tile_size, dtype)

    def fn(batches):
        for pdf in batches:
            rows = []
            for tx, ty, bx, by in zip(pdf["tx"], pdf["ty"], pdf["dzdx"], pdf["dzdy"]):
                dzdx = np.frombuffer(bx, np.float64).reshape(tile_size, tile_size)
                dzdy = np.frombuffer(by, np.float64).reshape(tile_size, tile_size)
                gx = dzdx * (z_factor / sx)
                gy = dzdy * (z_factor / sy)
                slope = np.arctan(np.hypot(gx, gy))
                aspect = np.arctan2(gy, -gx)
                shade = 255.0 * (
                    np.cos(zen) * np.cos(slope)
                    + np.sin(zen) * np.sin(slope) * np.cos(az - aspect)
                )
                data = np.clip(np.rint(shade), 0, 255).astype(np.uint8)
                rows.append({"tx": int(tx), "ty": int(ty), "band": 0,
                             "data": data.tobytes()})
            if rows:
                yield pd.DataFrame(rows)

    from .tiles import TILE_SCHEMA

    return grads.mapInPandas(fn, schema=TILE_SCHEMA)


def gradient_dense(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Reference single-node gradient (numpy.gradient order: dy first)."""
    dzdy, dzdx = np.gradient(arr.astype(np.float64))
    return dzdx, dzdy


CONV_SCHEMA = "tx long, ty long, data binary"


def convolve_tiles(
    tiles_df: DataFrame,
    gg: GridGeometry,
    kernel,
    band: int = 0,
    tile_size: int = 64,
    dtype=np.uint8,
) -> DataFrame:
    """Generic focal convolution (integer kernel, cross-correlation
    orientation): out[y, x] = sum_{dy,dx} K[dy+r, dx+r] * in[y+dy, x+dx],
    with pixels outside the raster extent contributing 0 (zero padding).
    Integer kernel x integer raster -> exact int64 planes, so the output is
    SQL-replicable pixel for pixel.

    Same 9-way halo-gather shuffle as gradient_tiles (radius must fit one
    tile ring: r <= tile_size); the kernel loop is (2r+1)^2 whole-array
    shifted adds per tile — vectorized, no per-pixel Python."""
    K = np.asarray(kernel, dtype=np.int64)
    if K.ndim != 2 or K.shape[0] != K.shape[1] or K.shape[0] % 2 == 0:
        raise ValueError("kernel must be square with odd size")
    r = K.shape[0] // 2
    if r > tile_size:
        raise ValueError("kernel radius exceeds one tile ring")
    h, w = gg.height, gg.width
    bdt = np.dtype(dtype)
    ts = tile_size
    ntx = (w + ts - 1) // ts
    nty = (h + ts - 1) // ts
    contrib = _halo_groups(tiles_df.filter(F.col("band") == band)).filter(
        (F.col("gtx") < ntx) & (F.col("gty") < nty)
    )

    def fn(key, pdf):
        gtx, gty = int(key[0]), int(key[1])
        halo = np.zeros((ts + 2 * r, ts + 2 * r), dtype=np.int64)
        for data, tx, ty in zip(pdf["data"], pdf["tx"], pdf["ty"]):
            block = np.frombuffer(data, dtype=bdt).reshape(ts, ts).astype(np.int64)
            oy = (int(ty) - gty) * ts + r
            ox = (int(tx) - gtx) * ts + r
            y0, x0 = max(oy, 0), max(ox, 0)
            y1, x1 = min(oy + ts, ts + 2 * r), min(ox + ts, ts + 2 * r)
            if y1 <= y0 or x1 <= x0:
                continue
            halo[y0:y1, x0:x1] = block[y0 - oy:y1 - oy, x0 - ox:x1 - ox]
        out = np.zeros((ts, ts), dtype=np.int64)
        for ky in range(2 * r + 1):
            for kx in range(2 * r + 1):
                if K[ky, kx]:
                    out += K[ky, kx] * halo[ky:ky + ts, kx:kx + ts]
        # zero out columns/rows beyond the raster's real extent
        px = gtx * ts + np.arange(ts)
        py = gty * ts + np.arange(ts)
        out[:, px >= w] = 0
        out[py >= h, :] = 0
        return pd.DataFrame([{"tx": gtx, "ty": gty, "data": out.tobytes()}])

    return contrib.groupBy("gtx", "gty").applyInPandas(fn, schema=CONV_SCHEMA)


def convolve_dense(arr: np.ndarray, kernel) -> np.ndarray:
    """Single-node reference: same zero-padded cross-correlation."""
    K = np.asarray(kernel, dtype=np.int64)
    r = K.shape[0] // 2
    a = np.zeros((arr.shape[0] + 2 * r, arr.shape[1] + 2 * r), dtype=np.int64)
    a[r:r + arr.shape[0], r:r + arr.shape[1]] = arr.astype(np.int64)
    out = np.zeros(arr.shape, dtype=np.int64)
    for ky in range(K.shape[0]):
        for kx in range(K.shape[1]):
            if K[ky, kx]:
                out += K[ky, kx] * a[ky:ky + arr.shape[0], kx:kx + arr.shape[1]]
    return out
