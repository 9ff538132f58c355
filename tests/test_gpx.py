"""GPX store: parse/write round-trip and the distributed multi-file read
(reference: storage/gpx tags wpt/rte/rtept/trk/trkseg/trkpt)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sis_spark.sources import gpx

SAMPLE = """<?xml version="1.0"?>
<gpx xmlns="http://www.topografix.com/GPX/1/1" version="1.1">
  <wpt lon="2.3522" lat="48.8566"><ele>35.0</ele><name>paris</name></wpt>
  <wpt lon="-0.1276" lat="51.5074"><time>2026-01-01T10:00:00Z</time></wpt>
  <rte>
    <rtept lon="0.0" lat="0.0"></rtept>
    <rtept lon="1.0" lat="1.0"></rtept>
  </rte>
  <trk>
    <trkseg>
      <trkpt lon="10.0" lat="50.0"><ele>100.0</ele></trkpt>
      <trkpt lon="10.1" lat="50.1"><ele>110.0</ele></trkpt>
    </trkseg>
    <trkseg>
      <trkpt lon="10.2" lat="50.2"><ele>120.0</ele></trkpt>
    </trkseg>
  </trk>
</gpx>
"""


def test_parse_shapes():
    df = gpx.parse_gpx(SAMPLE)
    assert list(df[df.kind == "wpt"].name) == ["paris", None]
    assert len(df[df.kind == "rte"]) == 2
    trk = df[df.kind == "trk"]
    assert len(trk) == 3
    assert sorted(trk.segment_id.unique()) == [0, 1]
    assert trk[trk.segment_id == 0].seq.tolist() == [0, 1]
    assert df[df.kind == "wpt"].iloc[1]["time"] == "2026-01-01T10:00:00Z"


def test_write_roundtrip():
    df = gpx.parse_gpx(SAMPLE)
    text = gpx.write_gpx(df)
    df2 = gpx.parse_gpx(text)
    a = df.fillna(-1).reset_index(drop=True)
    b = df2.fillna(-1).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_distributed_read(spark, tmp_path):
    paths = []
    for i in range(5):
        p = tmp_path / f"t{i}.gpx"
        df = gpx.parse_gpx(SAMPLE)
        df["lon"] = df["lon"] + i  # distinguishable per file
        p.write_text(gpx.write_gpx(df))
        paths.append(str(p))
    out = gpx.gpx_table(spark, paths).collect()
    assert len(out) == 5 * 7
    by_path = {}
    for r in out:
        by_path.setdefault(r["path"], []).append(r)
    assert len(by_path) == 5
    # per-file shift preserved
    f0 = sorted(p for p in by_path)[0]
    lons = sorted(r["lon"] for r in by_path[f0] if r["kind"] == "rte")
    assert lons == [0.0, 1.0]
