"""J8 multipolygon ring stitching (reference src/geometry.rs:513-591)."""

import pandas as pd
import pytest

from osmquadtree_rust_bindings_spark.operators import geometry as G


@pytest.fixture(scope="module")
def assembled(spark):
    mem, ways, nodes = G.make_multipolygon_fixture(30)
    out = G.assemble_multipolygons(
        spark.createDataFrame(mem).repartition(7),
        spark.createDataFrame(ways).repartition(5),
        spark.createDataFrame(nodes).repartition(3))
    return out.toPandas().sort_values(
        ["rel_id", "role", "ring_idx"]).reset_index(drop=True)


def test_every_relation_closes_one_ring_per_role(assembled):
    assert assembled.closed.all()
    per = assembled.groupby(["rel_id", "role"]).size()
    assert (per == 1).all()
    assert set(assembled.rel_id) == set(range(30))


def test_ring_shapes_and_reversals(assembled):
    outer = assembled[assembled.role == "outer"]
    inner = assembled[assembled.role == "inner"]
    assert (outer.nways == 4).all()
    assert (outer.npts == 5).all()   # 4 corners + closing vertex
    assert (inner.nways == 2).all()
    assert (inner.npts == 5).all()
    # fixture stores some segments backwards; the stitcher must have
    # reversed at least one way somewhere
    assert assembled.nreversed.sum() > 0


def test_signed_areas_match_rectangles(assembled):
    for r in range(30):
        w = (2 + r % 5) * 10_000_000
        h = (1 + r % 3) * 10_000_000
        got = assembled[(assembled.rel_id == r)
                        & (assembled.role == "outer")].area2.iloc[0]
        assert abs(got) == 2 * w * h
        iw, ih = w // 2, h // 2
        gin = assembled[(assembled.rel_id == r)
                        & (assembled.role == "inner")].area2.iloc[0]
        assert abs(gin) == 2 * iw * ih


def test_deterministic_under_repartitioning(spark, assembled):
    mem, ways, nodes = G.make_multipolygon_fixture(30)
    out2 = G.assemble_multipolygons(
        spark.createDataFrame(mem).repartition(1),
        spark.createDataFrame(ways).repartition(13),
        spark.createDataFrame(nodes).repartition(2))
    pdf2 = out2.toPandas().sort_values(
        ["rel_id", "role", "ring_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(assembled, pdf2)


def test_open_ring_flagged(spark):
    mem = pd.DataFrame([(0, 0, "outer"), (0, 1, "outer")],
                       columns=["rel_id", "way_id", "role"])
    ways = pd.DataFrame([(0, [10, 11]), (1, [11, 12])],
                        columns=["way_id", "refs"])
    nodes = pd.DataFrame([(10, 0, 0), (11, 5, 0), (12, 5, 5)],
                         columns=["node_id", "lon", "lat"])
    out = G.assemble_multipolygons(
        spark.createDataFrame(mem), spark.createDataFrame(ways),
        spark.createDataFrame(nodes)).toPandas()
    assert len(out) == 1
    assert not out.closed.iloc[0]
    assert out.area2.iloc[0] == 0


# ---------------------------------------------------- property: ring walk

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_stitch_recovers_any_segmented_ring(data):
    """Any closed ring, cut at random points into segments with random
    per-segment reversal and random way-id order, stitches back into ONE
    closed ring with the same vertex count and |area|."""
    import numpy as np

    from osmquadtree_rust_bindings_spark.operators.geometry import (
        _area2,
        _stitch_role,
    )

    nv = data.draw(st.integers(4, 24))
    # star-shaped (hence simple) polygon around origin, integer coords
    radii = data.draw(st.lists(st.integers(10, 1000),
                               min_size=nv, max_size=nv))
    ang = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    xs = (np.array(radii) * np.cos(ang) * 100).astype(np.int64)
    ys = (np.array(radii) * np.sin(ang) * 100).astype(np.int64)
    node_ids = list(range(100, 100 + nv))
    ring = list(zip(node_ids, xs, ys))
    want_area = abs(_area2(np.array(
        [[x, y] for _, x, y in ring] + [[ring[0][1], ring[0][2]]],
        dtype=np.int64)))

    ncuts = data.draw(st.integers(2, min(nv, 6)))
    cuts = sorted(data.draw(st.lists(
        st.integers(0, nv - 1), min_size=ncuts, max_size=ncuts,
        unique=True)))
    segs = []
    for i, c in enumerate(cuts):
        nxt = cuts[(i + 1) % len(cuts)]
        idx = [(c + j) % nv for j in range(
            ((nxt - c) % nv or nv) + 1)]  # inclusive of both endpoints
        pts = [ring[j] for j in idx]
        if data.draw(st.booleans()):
            pts = pts[::-1]
        segs.append(pts)
    wids = data.draw(st.permutations(list(range(len(segs)))))
    seg_in = sorted(
        (wid, [p[0] for p in pts],
         np.array([[p[1], p[2]] for p in pts], dtype=np.int64))
        for wid, pts in zip(wids, segs))

    rings = _stitch_role(seg_in)
    assert len(rings) == 1
    ways, revs, xy, closed = rings[0]
    assert closed
    assert len(xy) == nv + 1
    assert abs(_area2(xy)) == want_area
