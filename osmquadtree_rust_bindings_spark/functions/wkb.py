"""X11 WKB serialization (reference ``wkb(transform, srid)`` getters,
/root/reference/src/geometry.rs:255-257, 384-386, 507-509, 695-697).

Little-endian (E)WKB for Point / LineString / Polygon built by a
vectorized numpy kernel inside pandas UDFs: headers and coordinate
payloads are assembled as uint8 matrices and sliced per row — no
per-coordinate Python.  ``transform=True`` emits spherical-mercator
meters (reference ``LonLat::forward``, X8); ``srid`` adds the EWKB SRID
flag+value.  Coordinates in: int 1e-7 degrees (``scale=1e-7``), or any
other fixed-point scale — ``scale=1.0`` takes already-projected integer
coordinates verbatim, which keeps every emitted double integer-valued
and therefore bit-exactly reconstructible by the SQL oracle.

All multi-byte fields are serialized EXPLICITLY little-endian
(struct.pack('<I') / astype('<f8')) so the bytes are identical on any
host endianness, matching the leading 0x01 byte-order flag.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

EARTH_R = 6378137.0  # spherical-mercator radius (EPSG:3857)
_SRID_FLAG = 0x20000000


def _coords(lon_i: np.ndarray, lat_i: np.ndarray, transform: bool,
            scale: float):
    lon = lon_i.astype(np.float64) * scale
    lat = lat_i.astype(np.float64) * scale
    if not transform:
        return lon, lat
    x = np.deg2rad(lon) * EARTH_R
    y = np.log(np.tan(np.pi / 4 + np.deg2rad(lat) / 2)) * EARTH_R
    return x, y


def _header(geom_type: int, srid: int | None) -> bytes:
    t = geom_type | (_SRID_FLAG if srid is not None else 0)
    hdr = b"\x01" + struct.pack("<I", t)
    if srid is not None:
        hdr += struct.pack("<I", srid)
    return hdr


def point_wkb(lon_col: Column, lat_col: Column, transform: bool = False,
              srid: int | None = None, scale: float = 1e-7) -> Column:
    hdr = _header(1, srid)

    @pandas_udf("binary")
    def fn(lon: pd.Series, lat: pd.Series) -> pd.Series:
        x, y = _coords(lon.to_numpy(np.int64), lat.to_numpy(np.int64),
                       transform, scale)
        pay = np.empty((len(x), 2), dtype=np.float64)
        pay[:, 0], pay[:, 1] = x, y
        raw = pay.astype("<f8").view(np.uint8).reshape(len(x), 16)
        return pd.Series([hdr + r.tobytes() for r in raw])

    return fn(lon_col, lat_col)


def _ring_bytes(lons, lats, transform: bool, close: bool,
                scale: float) -> bytes:
    lon = np.asarray(lons, dtype=np.int64)
    lat = np.asarray(lats, dtype=np.int64)
    # empty ring: emit npts=0, nothing to close
    if close and len(lon) and (lon[0] != lon[-1] or lat[0] != lat[-1]):
        lon = np.append(lon, lon[0])
        lat = np.append(lat, lat[0])
    x, y = _coords(lon, lat, transform, scale)
    pay = np.empty((len(x), 2), dtype=np.float64)
    pay[:, 0], pay[:, 1] = x, y
    return struct.pack("<I", len(x)) + pay.astype("<f8").tobytes()


def linestring_wkb(lons_col: Column, lats_col: Column,
                   transform: bool = False,
                   srid: int | None = None, scale: float = 1e-7) -> Column:
    hdr = _header(2, srid)

    @pandas_udf("binary")
    def fn(lons: pd.Series, lats: pd.Series) -> pd.Series:
        return pd.Series([
            hdr + _ring_bytes(lo, la, transform, close=False, scale=scale)
            for lo, la in zip(lons, lats)])

    return fn(lons_col, lats_col)


def polygon_wkb(lons_col: Column, lats_col: Column,
                transform: bool = False,
                srid: int | None = None, scale: float = 1e-7) -> Column:
    """Single-ring polygon (reference SimplePolygon); ring auto-closed."""
    hdr = _header(3, srid)

    @pandas_udf("binary")
    def fn(lons: pd.Series, lats: pd.Series) -> pd.Series:
        return pd.Series([
            hdr + struct.pack("<I", 1)
            + _ring_bytes(lo, la, transform, close=True, scale=scale)
            for lo, la in zip(lons, lats)])

    return fn(lons_col, lats_col)
