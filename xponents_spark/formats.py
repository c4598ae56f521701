"""GIS output formatters — the reference's FormatterFactory surface
(``Examples/.../BasicGeoTemporalProcessing.java:162-194`` drives
GeoJSON / KML / CSV / WKT / Shapefile writers from XText results)
re-expressed Spark-first.

Design: a *formatter* here is a COLUMN TRANSFORM — ``geojson`` /
``kml_placemark`` / ``wkt`` columns built from pure JVM expressions
(``to_json(struct(...))``, ``format_string``) so formatting rides the
same whole-stage-codegen projection as the rest of the plan and the
output stays a distributed table (write it with any Spark sink).  The
one inherently file-oriented format, Esri Shapefile, writes ONE SHARD
PER PARTITION (shp+shx+dbf triplet, pure stdlib ``struct``) — the
distributed answer to a single-file format; a merge to one file is a
driver-side concat of fixed-layout records if a consumer insists.

Verification: GeoJSON parses back with the stdlib ``json`` module and
``from_json`` (field-exact roundtrip); KML parses with
``xml.etree``; Shapefile roundtrips through :func:`read_shapefile_points`
and its byte layout is asserted against the public ESRI spec values
(file code 9994, version 1000, shape type 1, word-count lengths).
"""

from __future__ import annotations

import math
import os
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "with_geojson", "with_kml_placemark", "with_wkt",
    "write_shapefile_points", "read_shapefile_points", "kml_document",
]


def with_geojson(df: DataFrame, lat_col: str = "lat", lon_col: str = "lon",
                 props: tuple[str, ...] = ("matchtext", "label"),
                 out_col: str = "geojson") -> DataFrame:
    """Append a GeoJSON Feature string per row (RFC 7946 Point —
    coordinates are [lon, lat]).  Pure JVM: to_json(struct(...))."""
    feature = F.struct(
        F.lit("Feature").alias("type"),
        F.struct(
            F.lit("Point").alias("type"),
            F.array(F.col(lon_col).cast("double"),
                    F.col(lat_col).cast("double")).alias("coordinates"),
        ).alias("geometry"),
        F.struct(*[F.col(p).alias(p) for p in props]).alias("properties"),
    )
    return df.withColumn(out_col, F.to_json(feature))


_XML_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"),
                ('"', "&quot;")]


def _xml_escape(col):
    for raw, esc in _XML_ESCAPES:
        col = F.replace(col, F.lit(raw), F.lit(esc))
    return col


def with_kml_placemark(df: DataFrame, lat_col: str = "lat",
                       lon_col: str = "lon", name_col: str = "matchtext",
                       out_col: str = "kml_placemark") -> DataFrame:
    """Append a KML <Placemark> string per row (OGC KML 2.2 Point;
    coordinates are lon,lat).  Pure JVM format_string + XML escaping."""
    return df.withColumn(out_col, F.format_string(
        "<Placemark><name>%s</name><Point><coordinates>%s,%s"
        "</coordinates></Point></Placemark>",
        _xml_escape(F.col(name_col).cast("string")),
        F.col(lon_col).cast("string"), F.col(lat_col).cast("string")))


def with_wkt(df: DataFrame, lat_col: str = "lat", lon_col: str = "lon",
             out_col: str = "wkt") -> DataFrame:
    """Append an ISO 19125 WKT POINT string per row (x=lon, y=lat)."""
    return df.withColumn(out_col, F.format_string(
        "POINT (%s %s)", F.col(lon_col).cast("string"),
        F.col(lat_col).cast("string")))


def kml_document(placemarks: list[str], name: str = "xponents") -> str:
    """Driver-side KML document wrapper for a BOUNDED set of collected
    placemark strings (presentation export, not the scale path — the
    distributed output is the placemark column itself)."""
    body = "".join(placemarks)
    return ('<?xml version="1.0" encoding="UTF-8"?>'
            '<kml xmlns="http://www.opengis.net/kml/2.2">'
            f'<Document><name>{name}</name>{body}</Document></kml>')


# --- Esri Shapefile (point type), pure stdlib ----------------------------

_SHP_POINT = 1
_DBF_FIELD_LEN = 64


def _shp_header(shape_type: int, n_content_words: int,
                bbox: tuple[float, float, float, float]) -> bytes:
    total_words = 50 + n_content_words          # 100-byte header = 50 words
    return (struct.pack(">i", 9994) + b"\x00" * 20
            + struct.pack(">i", total_words)
            + struct.pack("<ii", 1000, shape_type)
            + struct.pack("<4d", *bbox)
            + struct.pack("<4d", 0, 0, 0, 0))


def _write_shard(rows: list[tuple[float, float, str]], base: str) -> None:
    """One shp+shx+dbf triplet for (lon, lat, label) rows."""
    if rows:
        xs = [r[0] for r in rows]
        ys = [r[1] for r in rows]
        bbox = (min(xs), min(ys), max(xs), max(ys))
    else:
        bbox = (0.0, 0.0, 0.0, 0.0)
    # SHP: record = 8-byte header + 20-byte point content (10 words)
    shp = bytearray(_shp_header(_SHP_POINT, len(rows) * 14, bbox))
    shx = bytearray(_shp_header(_SHP_POINT, 0, bbox))
    shx[24:28] = struct.pack(">i", 50 + 4 * len(rows))
    off_words = 50
    for i, (lon, lat, _label) in enumerate(rows):
        shx += struct.pack(">ii", off_words, 10)
        shp += struct.pack(">ii", i + 1, 10)
        shp += struct.pack("<idd", _SHP_POINT, lon, lat)
        off_words += 14                          # 8 + 20 bytes = 14 words
    with open(base + ".shp", "wb") as fh:
        fh.write(shp)
    with open(base + ".shx", "wb") as fh:
        fh.write(shx)
    # DBF (dBASE III): one character field LABEL
    n = len(rows)
    hdr_size = 32 + 32 + 1
    rec_size = 1 + _DBF_FIELD_LEN
    dbf = bytearray(struct.pack("<B3BI HH", 0x03, 26, 1, 1, n,
                                hdr_size, rec_size)) + b"\x00" * 20
    field = bytearray(32)
    field[0:5] = b"LABEL"
    field[11] = ord("C")
    field[16] = _DBF_FIELD_LEN
    dbf += field + b"\x0d"
    for _lon, _lat, label in rows:
        enc = label.encode("utf-8", "replace")[:_DBF_FIELD_LEN]
        dbf += b" " + enc.ljust(_DBF_FIELD_LEN, b" ")
    dbf += b"\x1a"
    with open(base + ".dbf", "wb") as fh:
        fh.write(dbf)


def write_shapefile_points(df: DataFrame, out_dir: str,
                           lat_col: str = "lat", lon_col: str = "lon",
                           label_col: str = "matchtext") -> DataFrame:
    """Distributed point-Shapefile export: each partition writes one
    ``part-NNNNN.{shp,shx,dbf}`` triplet into ``out_dir`` (cluster runs
    point this at shared storage, same contract as any Spark sink).
    Returns the shard manifest (partition, shard path, row count) —
    an ACTION: the write runs eagerly via the manifest collection."""
    import pandas as pd
    from pyspark.sql import types as T

    os.makedirs(out_dir, exist_ok=True)
    src = df.select(F.col(lon_col).cast("double").alias("lon"),
                    F.col(lat_col).cast("double").alias("lat"),
                    F.col(label_col).cast("string").alias("label"))
    schema = T.StructType([T.StructField("partition", T.IntegerType()),
                           T.StructField("path", T.StringType()),
                           T.StructField("n_rows", T.LongType())])

    def shard(it):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        rows: list[tuple[float, float, str]] = []
        for pdf in it:
            for lon, lat, label in zip(pdf["lon"], pdf["lat"], pdf["label"]):
                if lon is None or lat is None or \
                        math.isnan(lon) or math.isnan(lat):
                    continue
                rows.append((float(lon), float(lat), str(label or "")))
        base = os.path.join(out_dir, f"part-{pid:05d}")
        if rows:
            _write_shard(rows, base)
            yield pd.DataFrame({"partition": [pid], "path": [base],
                                "n_rows": [len(rows)]})

    manifest = src.mapInPandas(shard, schema=schema)
    spark = df.sparkSession
    return spark.createDataFrame(manifest.collect(), schema=schema)


def read_shapefile_points(base: str) -> list[tuple[float, float, str]]:
    """Verification reader for one shard: (lon, lat, label) rows.
    Validates the spec constants (file code 9994, version 1000, point
    type, record word counts) — malformed files raise ValueError."""
    with open(base + ".shp", "rb") as fh:
        shp = fh.read()
    if len(shp) < 100 or struct.unpack(">i", shp[:4])[0] != 9994:
        raise ValueError("not a shapefile (file code != 9994)")
    version, shape_type = struct.unpack_from("<ii", shp, 28)
    if version != 1000 or shape_type != _SHP_POINT:
        raise ValueError(f"unsupported shapefile (version={version}, "
                         f"type={shape_type})")
    (total_words,) = struct.unpack_from(">i", shp, 24)
    if total_words * 2 != len(shp):
        raise ValueError("shapefile length mismatch")
    pts = []
    pos = 100
    while pos + 28 <= len(shp):
        _rec_no, content_words = struct.unpack_from(">ii", shp, pos)
        if content_words != 10:
            raise ValueError("unexpected point record length")
        st, x, y = struct.unpack_from("<idd", shp, pos + 8)
        if st != _SHP_POINT:
            raise ValueError(f"record shape type {st} != point")
        pts.append((x, y))
        pos += 8 + content_words * 2
    labels = []
    with open(base + ".dbf", "rb") as fh:
        dbf = fh.read()
    n, hdr_size, rec_size = struct.unpack_from("<IHH", dbf, 4)
    for i in range(n):
        off = hdr_size + i * rec_size
        labels.append(dbf[off + 1:off + rec_size]
                      .decode("utf-8", "replace").rstrip())
    if len(labels) != len(pts):
        raise ValueError("dbf/shp record count mismatch")
    return [(x, y, lb) for (x, y), lb in zip(pts, labels)]
