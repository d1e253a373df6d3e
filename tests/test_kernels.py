"""T1 unit/property tests for the pure-numpy kernels (SURVEY.md section 5).

Includes an independent, literal-scalar reference implementation of the
section-8 spec so the vectorized integer kernels are cross-checked against a
second, float-based derivation.
"""

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from osmquadtree_rust_bindings_spark import kernels as K


# ------------------------------------------------------------------ scalar ref

def _scalar_norm(lon_i, lat_i):
    x = (lon_i / 1e7 + 180.0) / 360.0
    y = (math.log(math.tan(math.pi / 4 + math.radians(lat_i / 1e7) / 2)) / math.pi + 1.0) / 2.0
    return x, y


def _scalar_bbox_qt(minlon, minlat, maxlon, maxlat, buffer=0.05, max_depth=18):
    """Literal float implementation of section 8.4 (descend while buffered
    child cell of box midpoint contains the box), used only as a test oracle.
    Works in the same integer units as the kernel to avoid float-boundary
    disagreements that are not semantically interesting.
    """
    U = K.UNITS
    x0, _ = _scalar_norm(minlon, 0)
    x1, _ = _scalar_norm(maxlon, 0)
    _, y0 = _scalar_norm(0, minlat)
    _, y1 = _scalar_norm(0, maxlat)
    x0u = min(max(int(math.floor(x0 * U)), 0), U - 1)
    x1u = min(max(int(math.floor(x1 * U)), 0), U - 1)
    y0u = min(max(int(math.floor(y0 * U)), 0), U - 1)
    y1u = min(max(int(math.floor(y1 * U)), 0), U - 1)
    mx, my = (x0u + x1u) // 2, (y0u + y1u) // 2
    depth = 0
    for k in range(max_depth):
        s = U >> (k + 1)
        b = s // K.BUF_DEN
        ox = (mx // s) * s
        oy = (my // s) * s
        if x0u >= ox - b and x1u <= ox + s + b and y0u >= oy - b and y1u <= oy + s + b:
            depth = k + 1
        else:
            break
    s = U >> depth
    return int(K.qt_from_cell(np.array([mx // s]), np.array([my // s]),
                              np.array([depth]))[0])


# ------------------------------------------------------------------ goldens

def test_qt_layout_golden():
    # (ix=1, iy=1, depth=1) -> digit 3 at bits 61-62, depth 1
    assert int(K.qt_from_cell(1, 1, 1)) == (3 << 61) | 1
    assert int(K.qt_from_cell(0, 0, 1)) == 1
    assert int(K.qt_from_cell(1, 0, 1)) == (2 << 61) | 1
    assert int(K.qt_from_cell(0, 1, 1)) == (1 << 61) | 1
    # root
    assert int(K.qt_from_cell(0, 0, 0)) == 0
    # depth-2: digits (3, 0) -> value 3<<61 | 2
    assert int(K.qt_from_cell(2, 2, 2)) == (3 << 61) | 2


def test_qt_string_roundtrip_golden():
    qt = K.qt_from_cell(1, 1, 1)
    assert K.qt_to_string(qt)[0] == "D"
    assert int(K.qt_from_string("D")) == int(qt)
    qt2 = K.qt_from_string("ABCD")
    assert K.qt_to_string(np.array([qt2]))[0] == "ABCD"
    ix, iy, d = K.qt_to_cell(qt2)
    assert int(d) == 4


def test_point_qt_center_of_map():
    # lon=0,lat=0 -> x=y=0.5 exactly -> at every depth the cell index is 2^(d-1)
    qt = int(K.calcqts_point(np.array([0]), np.array([0]), 18)[0])
    ix, iy, d = K.qt_to_cell(qt)
    assert int(d) == 18
    assert int(ix) == 1 << 17
    assert int(iy) == 1 << 17


def test_round_is_parent():
    qt = K.calcqts_point(np.array([123456789]), np.array([456789012]), 18)
    for nd in (0, 5, 17, 18):
        r = K.qt_round(qt, nd)
        assert int(K.qt_depth(r)[0]) == nd
        assert bool(K.qt_is_parent(r, qt)[0])
    assert not bool(K.qt_is_parent(qt, K.qt_round(qt, 3))[0])


def test_qt_common_basic():
    a = K.qt_from_string("ABCD")
    b = K.qt_from_string("ABDA")
    c = K.qt_common(np.array([a]), np.array([b]))
    assert K.qt_to_string(c)[0] == "AB"
    # identical keys
    c2 = K.qt_common(np.array([a]), np.array([a]))
    assert int(c2[0]) == int(a)
    # empty propagates other side
    c3 = K.qt_common(np.array([K.EMPTY]), np.array([a]))
    assert int(c3[0]) == int(a)
    c4 = K.qt_common(np.array([K.EMPTY]), np.array([K.EMPTY]))
    assert int(c4[0]) == int(K.EMPTY)


def test_key_range_contains_descendants():
    p = K.qt_from_string("AB")
    lo, hi = K.qt_key_range(np.array([p]))
    kids = [K.qt_from_string("AB" + s) for s in ("A", "D", "CC", "DDDD")]
    for kqt in kids:
        assert lo[0] <= int(kqt) <= hi[0]
    outsider = K.qt_from_string("AC")
    assert not (lo[0] <= int(outsider) <= hi[0])


def test_as_bbox_buffer_nesting():
    qt = K.qt_from_string("DCBA")
    b0 = np.array(K.qt_as_bbox(np.array([qt]), 0.0)).ravel()
    b5 = np.array(K.qt_as_bbox(np.array([qt]), 0.05)).ravel()
    assert b5[0] <= b0[0] and b5[1] <= b0[1]
    assert b5[2] >= b0[2] and b5[3] >= b0[3]
    # cell center must be inside its own bbox
    mlon = (b0[0] + b0[2]) // 2
    mlat = (b0[1] + b0[3]) // 2
    qt2 = int(K.qt_round(K.calcqts_point(np.array([mlon]), np.array([mlat]), 4), 4)[0])
    assert qt2 == int(qt)


def test_bbox_straddling_box_stops_early():
    # A small box straddling the prime meridian: buffer lets it descend until
    # the overhang exceeds 5% of the cell size, then stops.
    qt = int(K.calcqts_bbox(np.array([-100000]), np.array([10]),
                            np.array([100000]), np.array([200010]))[0])
    d = int(K.qt_depth(np.array([qt]))[0])
    assert 0 < d < 18
    # a huge box -> root
    qt2 = int(K.calcqts_bbox(np.array([-1700000000]), np.array([-800000000]),
                             np.array([1700000000]), np.array([800000000]))[0])
    assert qt2 == 0


def test_bbox_vs_scalar_reference():
    rng = np.random.default_rng(42)
    n = 500
    lon = rng.integers(-1_790_000_000, 1_790_000_000, n)
    lat = rng.integers(-840_000_000, 840_000_000, n)
    w = rng.integers(0, 5_000_000, n)
    h = rng.integers(0, 5_000_000, n)
    got = K.calcqts_bbox(lon - w, lat - h, lon + w, lat + h)
    for i in range(n):
        exp = _scalar_bbox_qt(int(lon[i] - w[i]), int(lat[i] - h[i]),
                              int(lon[i] + w[i]), int(lat[i] + h[i]))
        assert int(got[i]) == exp, i


def test_point_equals_degenerate_bbox():
    rng = np.random.default_rng(7)
    n = 2000
    lon = rng.integers(-1_799_999_999, 1_799_999_999, n)
    lat = rng.integers(-849_999_999, 849_999_999, n)
    a = K.calcqts_point(lon, lat, 18)
    b = K.calcqts_bbox(lon, lat, lon, lat)
    assert (a == b).mean() > 0.999  # float-boundary ties allowed, but rare


def test_phash_lonlat_domain():
    rng = np.random.default_rng(1)
    ph = rng.integers(np.iinfo(np.int64).min, np.iinfo(np.int64).max, 1000,
                      dtype=np.int64)
    lon, lat = K.phash_lonlat(ph)
    assert lon.min() >= -1_800_000_000 and lon.max() < 1_800_000_000
    assert lat.min() >= -850_000_000 and lat.max() < 850_000_000


def test_haversine_known_value():
    # 1 degree of longitude at the equator ~= 111.19 km
    d = float(K.haversine_m(0, 0, 10_000_000, 0))
    assert abs(d - 111_195) < 50


def test_points_in_polygon_square():
    vx = np.array([0.0, 10.0, 10.0, 0.0])
    vy = np.array([0.0, 0.0, 10.0, 10.0])
    px = np.array([5.0, 15.0, -1.0, 5.0])
    py = np.array([5.0, 5.0, 5.0, 15.0])
    got = K.points_in_polygon(px, py, vx, vy)
    assert got.tolist() == [True, False, False, False]


def test_mercator_inverse_roundtrip():
    lats = np.linspace(-84.9, 84.9, 101)
    back = K.inv_merc_y(K.merc_y(lats))
    assert np.allclose(back, lats, atol=1e-9)


# ------------------------------------------------------------------ properties

@st.composite
def qt_keys(draw):
    d = draw(st.integers(0, 18))
    ix = draw(st.integers(0, (1 << d) - 1)) if d else 0
    iy = draw(st.integers(0, (1 << d) - 1)) if d else 0
    return int(K.qt_from_cell(ix, iy, d))


@settings(max_examples=200, deadline=None)
@given(qt_keys())
def test_prop_cell_roundtrip(qt):
    ix, iy, d = K.qt_to_cell(np.array([qt]))
    back = int(K.qt_from_cell(ix, iy, d)[0])
    assert back == qt


@settings(max_examples=200, deadline=None)
@given(qt_keys())
def test_prop_string_roundtrip(qt):
    s = K.qt_to_string(np.array([qt]))[0]
    assert int(K.qt_from_string(s)) == qt


@settings(max_examples=200, deadline=None)
@given(qt_keys(), st.integers(0, 18))
def test_prop_round_monotone_parent(qt, nd):
    r = int(K.qt_round(np.array([qt]), nd)[0])
    assert int(K.qt_depth(np.array([r]))[0]) == min(nd, qt & 31)
    assert bool(K.qt_is_parent(np.array([r]), np.array([qt]))[0])
    assert r <= qt  # parent sorts first (layout property)


@settings(max_examples=200, deadline=None)
@given(qt_keys(), qt_keys())
def test_prop_common_is_ancestor_of_both(a, b):
    c = int(K.qt_common(np.array([a]), np.array([b]))[0])
    assert bool(K.qt_is_parent(np.array([c]), np.array([a]))[0])
    assert bool(K.qt_is_parent(np.array([c]), np.array([b]))[0])
    # maximality: one level deeper is not a common ancestor (unless c==a==b)
    dc = c & 31
    if dc < min(a & 31, b & 31):
        deeper_a = int(K.qt_round(np.array([a]), dc + 1)[0])
        deeper_b = int(K.qt_round(np.array([b]), dc + 1)[0])
        assert deeper_a != deeper_b


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-x", "-q"]))
