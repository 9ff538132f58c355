"""Moving Features CSV store: parser vs the reference's own test fixture
(S/csv/StoreTest.java), merge semantics (MovingFeatureBuilder), writer
round-trip, and the trajectory operators."""

import os

import pandas as pd
import pytest

from sis_spark.sources.mf_csv import (
    format_mf_csv, mf_merge, mf_table, parse_mf_csv, parse_mf_header,
)

# The OGC 14-084r2-derived example from the reference test suite
# (StoreTest.java testData()).
FIXTURE = (
    "@stboundedby, urn:ogc:def:crs:CRS:1.3:84, 2D,  50.23 9.23,  50.31 9.27,"
    "  2012-01-17T12:33:41Z, 2012-01-17T12:37:00Z, sec\n"
    '@columns, mfidref, trajectory, state,xsd:string, """type"" code",xsd:integer\n'
    "@foliation,Time\n"
    "a,  10, 150, 11.0 2.0 12.0 3.0, walking, 1\n"
    "b,  10, 190, 10.0 2.0 11.0 3.0, walking, 2\n"
    "a, 150, 190, 12.0 3.0 10.0 3.0\n"
    "c,  10, 190, 12.0 1.0 10.0 2.0 11.0 3.0, vehicle, 1\n"
)


def test_header():
    h = parse_mf_header(FIXTURE)
    assert h["crs"] == "urn:ogc:def:crs:CRS:1.3:84"
    assert h["lower"] == (50.23, 9.23) and h["upper"] == (50.31, 9.27)
    assert h["unit_seconds"] == 1.0
    assert h["columns"] == [("state", "string"), ('"type" code', "bigint")]
    assert h["foliation"] == "Time"


def test_fragmented_matches_reference_test():
    # expectations from StoreTest.testStaticFeatures (values + inherited row)
    df = parse_mf_csv(FIXTURE)
    t = lambda s: pd.Timestamp(f"2012-01-17T{s}").value // 1000
    rows = df[["mfidref", "start_us", "end_us", "trajectory", "state", '"type" code']].values.tolist()
    assert rows == [
        ["a", t("12:33:51"), t("12:36:11"), [11, 2, 12, 3], "walking", 1],
        ["b", t("12:33:51"), t("12:36:51"), [10, 2, 11, 3], "walking", 2],
        ["a", t("12:36:11"), t("12:36:51"), [12, 3, 10, 3], "walking", 2],
        ["c", t("12:33:51"), t("12:36:51"), [12, 1, 10, 2, 11, 3], "vehicle", 1],
    ]


@pytest.fixture(scope="module")
def fixture_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("mf")
    p = os.path.join(d, "mf_0.csv")
    with open(p, "w") as f:
        f.write(FIXTURE)
    return p


def test_merged_matches_reference_test(spark, fixture_path):
    # expectations from StoreTest.testMovingFeatures
    df = mf_table(spark, [fixture_path])
    m = mf_merge(df.withColumnRenamed('"type" code', "code"), ["state", "code"])
    rows = {r["mfidref"]: r for r in m.collect()}
    assert rows["a"]["trajectory"] == [11, 2, 12, 3, 10, 3]  # joint vertex deduped
    assert rows["b"]["trajectory"] == [10, 2, 11, 3]
    assert rows["c"]["trajectory"] == [12, 1, 10, 2, 11, 3]
    # states: contiguous equal -> ONE period; codes: 1 then 2 -> TWO periods
    assert [p["v"] for p in rows["a"]["state_periods"]] == ["walking"]
    assert [p["v"] for p in rows["a"]["code_periods"]] == [1, 2]
    assert str(rows["a"]["start_time"]) == "2012-01-17 12:33:51"
    assert str(rows["a"]["end_time"]) == "2012-01-17 12:36:51"
    assert str(rows["a"]["code_periods"][1]["t0"]) == "2012-01-17 12:36:11"


def test_roundtrip():
    h = parse_mf_header(FIXTURE)
    df = parse_mf_csv(FIXTURE)
    text = format_mf_csv(df, h)
    again = parse_mf_csv(text, parse_mf_header(text))
    pd.testing.assert_frame_equal(df, again)


def test_position_and_metrics(spark, tmp_path):
    # one feature, two contiguous segments, dyadic coords/times
    text = (
        "@stboundedby, urn:ogc:def:crs:CRS:1.3:84, 2D, 0 0, 10 10,"
        " 2024-01-01T00:00:00Z, 2024-01-01T01:00:00Z, sec\n"
        "@columns, mfidref, trajectory\n"
        "@foliation,Time\n"
        "m, 0, 64, 0.0 0.0 1.0 0.0 1.0 2.0\n"   # 3 pts, vertex times 0,32,64
        "m, 64, 128, 1.0 2.0 5.0 2.0\n"
    )
    p = tmp_path / "mf.csv"
    p.write_text(text)
    df = mf_table(spark, [str(p)])

    from sis_spark.operators.trajectory import position_at, segment_metrics

    # t=16s: first segment, u=0.5 -> between v0 and v1 at lf 0.5
    r = position_at(df, pd.Timestamp("2024-01-01T00:00:16")).collect()[0]
    assert (r["x"], r["y"]) == (0.5, 0.0)
    # t=48s: u=1.5 -> between v1 (1,0) and v2 (1,2)
    r = position_at(df, pd.Timestamp("2024-01-01T00:00:48")).collect()[0]
    assert (r["x"], r["y"]) == (1.0, 1.0)
    # t=64s boundary: covered by BOTH segments; latest start wins (seg 2, u=0)
    r = position_at(df, pd.Timestamp("2024-01-01T00:01:04")).collect()[0]
    assert (r["x"], r["y"]) == (1.0, 2.0)
    # t=96s: second segment midpoint
    r = position_at(df, pd.Timestamp("2024-01-01T00:01:36")).collect()[0]
    assert (r["x"], r["y"]) == (3.0, 2.0)

    m = {r["line_id"]: r for r in segment_metrics(df).collect()}
    assert m[0]["len_q"] == 3_000_000_000  # 1 + 2
    assert m[1]["len_q"] == 4_000_000_000
    assert m[0]["speed"] == 3.0 / 64.0
    assert m[1]["speed"] == 4.0 / 64.0
