"""Raster/image layer: codecs, grid geometry, tiled coverage DataFrames."""
