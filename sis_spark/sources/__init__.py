"""Sources: synthetic deterministic image+caption table, raster tile tables."""
