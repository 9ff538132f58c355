"""KML store: writer/parser round-trip, namespace handling, folders."""

import pandas as pd


def _sample_df():
    rows = [
        {"placemark_id": 0, "name": "a&b", "kind": "point", "seq": 0,
         "lon": 1.5, "lat": -2.25, "alt": None, "ext": {"k": "v<1>"}},
        {"placemark_id": 1, "name": None, "kind": "line", "seq": 0,
         "lon": 0.0, "lat": 0.0, "alt": 10.0, "ext": None},
        {"placemark_id": 1, "name": None, "kind": "line", "seq": 1,
         "lon": 0.125, "lat": 0.5, "alt": 11.0, "ext": None},
    ]
    return pd.DataFrame(rows)


def test_kml_roundtrip():
    from sis_spark.sources.kml import parse_kml, write_kml

    df = _sample_df()
    back = parse_kml(write_kml(df))
    assert len(back) == 3
    assert back.iloc[0]["name"] == "a&b"
    assert back.iloc[0]["ext"] == {"k": "v<1>"}
    assert list(back[back["kind"] == "line"]["alt"]) == [10.0, 11.0]
    assert list(back["lon"]) == [1.5, 0.0, 0.125]


def test_kml_parses_nested_folders_and_bare_tags():
    from sis_spark.sources.kml import parse_kml

    text = """<?xml version="1.0"?>
<kml xmlns="http://www.opengis.net/kml/2.2"><Document><Folder>
  <Placemark><name>x</name>
    <Point><coordinates>10,20,30</coordinates></Point></Placemark>
  <Placemark>
    <LineString><coordinates>0,0 1,1 2,4</coordinates></LineString>
  </Placemark>
</Folder></Document></kml>"""
    df = parse_kml(text)
    assert list(df["kind"]) == ["point", "line", "line", "line"]
    assert df.iloc[0]["alt"] == 30.0
    assert list(df[df["kind"] == "line"]["seq"]) == [0, 1, 2]


def test_kml_table_distributed(spark, tmp_path):
    from sis_spark.sources.kml import kml_table, write_kml

    paths = []
    for i in range(3):
        p = str(tmp_path / f"t{i}.kml")
        with open(p, "w") as f:
            f.write(write_kml(_sample_df()))
        paths.append(p)
    df = kml_table(spark, paths)
    assert df.count() == 9
    assert df.filter("kind = 'point'").count() == 3
    r = df.filter("kind = 'point'").select("ext").first()
    assert r.ext["k"] == "v<1>"
