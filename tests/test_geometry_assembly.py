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
