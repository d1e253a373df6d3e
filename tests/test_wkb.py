"""X11 WKB serialization vs a struct.pack oracle."""

import math
import struct

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osmquadtree_rust_bindings_spark.functions import wkb as W


@pytest.fixture(scope="module")
def pts(spark):
    return spark.createDataFrame(pd.DataFrame({
        "id": [1, 2, 3],
        "lon": [100_000_000, -740_000_000, 0],
        "lat": [500_000_000, 404_000_000, -10_000_000],
    }))


def test_point_wkb_plain(pts):
    got = pts.select("id", W.point_wkb(F.col("lon"), F.col("lat"))
                     .alias("wkb")).toPandas().set_index("id")
    b = got.loc[1, "wkb"]
    assert b[:5] == b"\x01" + struct.pack("<I", 1)
    x, y = struct.unpack("<dd", b[5:21])
    assert (x, y) == (10.0, 50.0)
    assert len(b) == 21


def test_point_wkb_srid_and_mercator(pts):
    got = pts.select("id", W.point_wkb(F.col("lon"), F.col("lat"),
                                       transform=True, srid=3857)
                     .alias("wkb")).toPandas().set_index("id")
    b = got.loc[1, "wkb"]
    t, srid = struct.unpack("<xII", b[:9])
    assert t == 1 | 0x20000000
    assert srid == 3857
    x, y = struct.unpack("<dd", b[9:25])
    assert abs(x - math.radians(10.0) * W.EARTH_R) < 1e-6
    assert abs(y - math.log(math.tan(math.pi / 4
                                     + math.radians(50.0) / 2))
               * W.EARTH_R) < 1e-6


def test_linestring_and_polygon_wkb(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "id": [1],
        "lons": [[0, 10_000_000, 10_000_000]],
        "lats": [[0, 0, 10_000_000]],
    }))
    ls = df.select(W.linestring_wkb(F.col("lons"), F.col("lats"))
                   .alias("wkb")).toPandas().wkb.iloc[0]
    assert struct.unpack("<I", ls[1:5])[0] == 2
    assert struct.unpack("<I", ls[5:9])[0] == 3          # npts
    assert struct.unpack("<d", ls[9:17])[0] == 0.0
    assert len(ls) == 9 + 3 * 16

    pg = df.select(W.polygon_wkb(F.col("lons"), F.col("lats"))
                   .alias("wkb")).toPandas().wkb.iloc[0]
    assert struct.unpack("<I", pg[1:5])[0] == 3
    assert struct.unpack("<I", pg[5:9])[0] == 1          # nrings
    assert struct.unpack("<I", pg[9:13])[0] == 4         # auto-closed
    # last vertex == first vertex
    assert pg[13:29] == pg[13 + 3 * 16:13 + 4 * 16]


def test_empty_ring_no_crash(spark):
    # regression: close=True on an empty ring used to index lon[0]
    df = spark.createDataFrame(pd.DataFrame({
        "id": [1], "lons": [[]], "lats": [[]]}),
        "id long, lons array<long>, lats array<long>")
    pg = df.select(W.polygon_wkb(F.col("lons"), F.col("lats"))
                   .alias("wkb")).toPandas().wkb.iloc[0]
    assert struct.unpack("<I", pg[5:9])[0] == 1   # nrings
    assert struct.unpack("<I", pg[9:13])[0] == 0  # npts
    assert len(pg) == 13
    ls = df.select(W.linestring_wkb(F.col("lons"), F.col("lats"))
                   .alias("wkb")).toPandas().wkb.iloc[0]
    assert struct.unpack("<I", ls[5:9])[0] == 0
