

# ---------------------------------------- multi-sub-grid hierarchy (r5)

def test_multigrid_roundtrip_bitexact():
    """Parent+child hierarchy survives the multi-sub-grid .gsb bytes
    bit-for-bit (dyadic node values are float32-exact)."""
    import numpy as np

    from sis_spark.functions.datums import ShiftGridGroup
    from sis_spark.sources.ntv2 import format_ntv2_group, read_ntv2_group

    grp = ShiftGridGroup.synthetic()
    back = read_ntv2_group(format_ntv2_group(grp))
    assert len(back.grids) == 2
    assert back.names == ["PARENT", "CHILD"]
    assert back.parents == ["NONE", "PARENT"]
    for a, b in zip(grp.grids, back.grids):
        assert (a.lon0, a.lat0, a.dlon, a.dlat) == (b.lon0, b.lat0, b.dlon, b.dlat)
        assert np.array_equal(a.slon, b.slon)
        assert np.array_equal(a.slat, b.slat)


def test_multigrid_selection_rule():
    """Inside the child extent the DENSEST grid interpolates; outside it
    the parent does; the boundary is inclusive (child wins on its edge)."""
    import numpy as np

    from sis_spark.functions.datums import ShiftGridGroup

    grp = ShiftGridGroup.synthetic()
    parent, child = grp.grids
    # strictly inside child
    lon = np.array([-1.0, 0.3, 1.9])
    lat = np.array([53.0, 54.7, 55.9])
    gx, gy = grp.interpolate(lon, lat)
    cx, cy = child.interpolate(lon, lat)
    assert np.array_equal(gx, cx) and np.array_equal(gy, cy)
    # outside child, inside parent
    lon = np.array([-6.0, 5.0, 0.0])
    lat = np.array([50.0, 58.0, 49.0])
    gx, gy = grp.interpolate(lon, lat)
    px, py = parent.interpolate(lon, lat)
    assert np.array_equal(gx, px) and np.array_equal(gy, py)
    # child edge: inclusive
    lon = np.array([-4.0, 2.0])
    lat = np.array([52.0, 56.0])
    gx, gy = grp.interpolate(lon, lat)
    cx, cy = child.interpolate(lon, lat)
    assert np.array_equal(gx, cx) and np.array_equal(gy, cy)


def test_multigrid_inverse_fixed_point():
    import numpy as np

    from sis_spark.functions.datums import ShiftGridGroup

    grp = ShiftGridGroup.synthetic()
    rng = np.random.default_rng(9)
    lon = rng.uniform(-7.5, 7.5, 2000)
    lat = rng.uniform(48.5, 59.5, 2000)
    wlon, wlat = grp.to_wgs84(lon, lat)
    blon, blat = grp.from_wgs84(wlon, wlat)
    assert np.max(np.abs(blon - lon)) < 1e-9
    assert np.max(np.abs(blat - lat)) < 1e-9


def test_read_ntv2_single_still_first_subgrid():
    import numpy as np

    from sis_spark.functions.datums import ShiftGrid, ShiftGridGroup
    from sis_spark.sources.ntv2 import (format_ntv2, format_ntv2_group,
                                        read_ntv2)

    g = ShiftGrid.synthetic()
    back = read_ntv2(format_ntv2(g))
    assert np.array_equal(back.slon, g.slon)
    grp = ShiftGridGroup.synthetic()
    first = read_ntv2(format_ntv2_group(grp))
    assert np.array_equal(first.slon, grp.grids[0].slon)
