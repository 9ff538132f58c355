"""Raster operator tests added in round 2 (dimensionality reduction)."""

import numpy as np


def test_reduce_bands(spark):
    """Dimensionality reduction: pixel-wise collapse of the band axis equals
    the dense numpy reduce for every op."""
    from sis_spark.raster.grid import GridGeometry
    from sis_spark.raster.tiles import raster_to_tiles, reduce_bands, tiles_to_raster

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 255, (96, 128, 4), dtype=np.uint8)
    gg = GridGeometry((0, 0, 127, 95), (0.1, 0.0, 10.0, 0.0, -0.1, 60.0))
    tiles = raster_to_tiles(spark, arr, gg)
    for op, ref in [
        ("mean", np.trunc(arr.astype(np.float64).sum(axis=2) / 4)),
        ("sum", np.clip(arr.astype(np.float64).sum(axis=2), 0, 255)),
        ("min", arr.min(axis=2)),
        ("max", arr.max(axis=2)),
    ]:
        got = tiles_to_raster(reduce_bands(tiles, op), gg)[:, :, 0]
        assert np.array_equal(got.astype(np.float64), ref.astype(np.float64)), op
    # subset of bands
    got = tiles_to_raster(reduce_bands(tiles, "max", bands=[0, 2]), gg)[:, :, 0]
    assert np.array_equal(got, arr[:, :, [0, 2]].max(axis=2))
