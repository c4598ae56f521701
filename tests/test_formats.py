"""GIS output formatter tests — the reference's FormatterFactory
surface (Examples/.../BasicGeoTemporalProcessing.java:162-194 drives
GeoJSON/KML/CSV/WKT/Shapefile writers) re-expressed as column
transforms + a distributed Shapefile shard writer (formats.py)."""

import json
import math
import os
import struct
import xml.etree.ElementTree as ET

import pytest

from xponents_spark.formats import (kml_document, read_shapefile_points,
                                    with_geojson, with_kml_placemark,
                                    with_wkt, write_shapefile_points)

ROWS = [
    (42.5, -71.25, "Boston <area>", "place"),
    (-33.875, 151.2, 'Sydney "harbour" & city', "place"),
    (0.0, 0.0, "null island", "coord"),
]


@pytest.fixture(scope="module")
def geo_df(spark):
    return spark.createDataFrame(ROWS, "lat double, lon double, "
                                       "matchtext string, label string")


def test_geojson_column(geo_df):
    out = {r["matchtext"]: json.loads(r["geojson"])
           for r in with_geojson(geo_df).collect()}
    assert len(out) == 3
    for lat, lon, name, label in ROWS:
        f = out[name]
        assert f["type"] == "Feature"
        assert f["geometry"] == {"type": "Point",
                                 "coordinates": [lon, lat]}
        assert f["properties"] == {"matchtext": name, "label": label}


def test_kml_placemark_column_escapes_xml(geo_df):
    rows = with_kml_placemark(geo_df).collect()
    seen = {}
    for r in rows:
        el = ET.fromstring(r["kml_placemark"])  # parse = well-formed
        name = el.findtext("name")
        lon_s, lat_s = el.findtext("Point/coordinates").split(",")
        seen[name] = (float(lat_s), float(lon_s))
    for lat, lon, name, _label in ROWS:
        assert seen[name] == (lat, lon)
    doc = kml_document([r["kml_placemark"] for r in rows], name="t")
    root = ET.fromstring(doc)
    ns = "{http://www.opengis.net/kml/2.2}"
    assert len(root.findall(f"{ns}Document/{ns}Placemark")) == 3


def test_wkt_column(geo_df):
    for r in with_wkt(geo_df).collect():
        x, y = r["wkt"][len("POINT ("):-1].split(" ")
        assert (float(y), float(x)) == (r["lat"], r["lon"])


def test_shapefile_shards_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        ROWS + [(None, None, "skipped null", "x"),
                (float("nan"), 1.0, "skipped nan", "x")],
        "lat double, lon double, matchtext string, label string",
    ).repartition(3)
    out = str(tmp_path / "shp")
    manifest = write_shapefile_points(df, out)
    shards = manifest.collect()
    assert sum(r["n_rows"] for r in shards) == 3
    got = []
    for r in shards:
        got += read_shapefile_points(r["path"])
    assert sorted(got) == sorted(
        (lon, lat, name[:64]) for lat, lon, name, _ in ROWS)
    # spec constants on disk: file code 9994 BE, version 1000 LE,
    # shape type 1, declared word length == byte length / 2
    with open(shards[0]["path"] + ".shp", "rb") as fh:
        shp = fh.read()
    assert struct.unpack(">i", shp[:4])[0] == 9994
    assert struct.unpack_from("<ii", shp, 28) == (1000, 1)
    assert struct.unpack_from(">i", shp, 24)[0] * 2 == len(shp)
    with open(shards[0]["path"] + ".shx", "rb") as fh:
        shx = fh.read()
    assert struct.unpack_from(">i", shx, 24)[0] * 2 == len(shx)


def test_shapefile_reader_rejects_malformed(tmp_path):
    base = str(tmp_path / "bad")
    with open(base + ".shp", "wb") as fh:
        fh.write(b"\x00" * 100)
    with pytest.raises(ValueError, match="9994"):
        read_shapefile_points(base)
    os.remove(base + ".shp")
    with open(base + ".shp", "wb") as fh:
        fh.write(struct.pack(">i", 9994) + b"\x00" * 20
                 + struct.pack(">i", 50)
                 + struct.pack("<ii", 1000, 5)      # polygon type
                 + b"\x00" * 64)
    with pytest.raises(ValueError, match="type=5"):
        read_shapefile_points(base)


def test_formatters_are_jvm_side(geo_df):
    """No Python stage in the column formatters: the plan has no
    (Arrow)Eval / MapInPandas / BatchEvalPython node."""
    df = with_wkt(with_kml_placemark(with_geojson(geo_df)))
    plan = df._jdf.queryExecution().executedPlan().toString()
    for bad in ("Python", "MapInPandas", "ArrowEval"):
        assert bad not in plan, plan
    assert math.isfinite(1.0)  # keep math import honest
