import os

import numpy as np


def test_las_roundtrip(spark, tmp_path):
    from sis_spark.sources.las import (
        encode_las, make_formula_las, parse_las_header, read_las,
    )

    path = str(tmp_path / "a.las")
    make_formula_las(path, 1000)
    with open(path, "rb") as f:
        hdr = parse_las_header(f.read(227))
    assert hdr["n"] == 1000 and hdr["scale"][0] == 1e-7

    df, h2 = read_las(spark, path, chunk=128)
    rows = df.orderBy("idx").collect()
    assert len(rows) == 1000
    i = np.arange(1000, dtype=np.int64)
    xi = (i * 7919) % 360000000 - 180000000
    assert [r["xi"] for r in rows[:5]] == list(xi[:5])
    # scaled doubles agree with raw * scale
    r7 = rows[7]
    assert r7["x"] == r7["xi"] * 1e-7
    assert r7["classification"] == 7 % 8

    # header min/max are the true extremes
    with open(path, "rb") as f:
        buf = f.read()
    import struct
    maxx, minx = struct.unpack_from("<2d", buf, 179)
    assert abs(maxx - xi.max() * 1e-7) < 1e-9
    assert abs(minx - xi.min() * 1e-7) < 1e-9
