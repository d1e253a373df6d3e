"""T2: Count aggregates, semi-join cascade, diff/CDC operators vs pandas oracles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osmquadtree_rust_bindings_spark.operators import count as CNT
from osmquadtree_rust_bindings_spark.operators import diff as DF


@pytest.fixture(scope="module")
def pts_pdf():
    rng = np.random.default_rng(5)
    n = 2000
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "lon": rng.integers(-180_0000000, 180_0000000, n),
        "lat": rng.integers(-85_0000000, 85_0000000, n),
        "changetype": rng.choice(
            ["normal", "delete", "create", "modify", "unchanged"], n),
        "version": rng.integers(1, 5, n),
    })


def test_count_fingerprint(spark, pts_pdf):
    sdf = spark.createDataFrame(pts_pdf)
    got = CNT.count_fingerprint(sdf, id_col="id").toPandas().iloc[0]
    assert got.num == len(pts_pdf)
    assert got.min_id == 0 and got.max_id == len(pts_pdf) - 1
    assert got.min_lon == pts_pdf.lon.min()
    assert got.max_lat == pts_pdf.lat.max()


def test_count_change_grouped(spark, pts_pdf):
    sdf = spark.createDataFrame(pts_pdf)
    got = CNT.count_fingerprint(sdf, group=["changetype"], id_col="id") \
        .toPandas().sort_values("changetype").reset_index(drop=True)
    exp = pts_pdf.groupby("changetype").agg(
        num=("id", "size"), min_id=("id", "min")).reset_index()
    assert (got.num.values == exp.num.values).all()
    assert (got.min_id.values == exp.min_id.values).all()


def test_count_refs_stats(spark):
    pdf = pd.DataFrame({
        "id": [1, 2, 3],
        "refs": [[10, 20, 30], [5], [40, 2, 99, 7]],
    })
    got = CNT.count_refs_stats(spark.createDataFrame(pdf)).toPandas().iloc[0]
    assert got.num == 3 and got.num_refs == 8
    assert got.max_refs_len == 4
    assert got.min_ref == 2 and got.max_ref == 99


def test_semi_join_cascade(spark, pts_pdf):
    rng = np.random.default_rng(6)
    conts = pd.DataFrame({
        "id": np.arange(300, dtype=np.int64),
        "refs": [rng.integers(0, 2000, rng.integers(2, 8)).tolist()
                 for _ in range(300)],
    })
    bbox = (-90_0000000, -40_0000000, 90_0000000, 40_0000000)
    res = CNT.semi_join_cascade(
        spark.createDataFrame(pts_pdf),
        spark.createDataFrame(conts), bbox)
    got_p = set(res["point_ids"].toPandas().pid)
    got_c = set(res["container_ids"].toPandas().cid)
    got_x = set(res["exnodes"].toPandas().pid)
    x0, y0, x1, y1 = bbox
    in_m = ((pts_pdf.lon >= x0) & (pts_pdf.lon <= x1)
            & (pts_pdf.lat >= y0) & (pts_pdf.lat <= y1))
    exp_p = set(pts_pdf.id[in_m])
    exp_c = {r.id for r in conts.itertuples(index=False)
             if any(x in exp_p for x in r.refs)}
    exp_x = {x for r in conts.itertuples(index=False) if r.id in exp_c
             for x in r.refs} - exp_p
    assert got_p == exp_p and got_c == exp_c and got_x == exp_x


def test_compare_datasets_classes(spark):
    left = spark.createDataFrame(pd.DataFrame({
        "id": [1, 2, 3, 4], "v": [10, 20, 30, 40], "t": list("aabb")}))
    right = spark.createDataFrame(pd.DataFrame({
        "id": [2, 3, 4, 5], "v": [20, 31, 40, 50], "t": list("xbbc")}))
    got = DF.compare_datasets(left, right, ["id"], ["v", "t"]) \
        .toPandas().set_index("id").diff_class
    assert got[1] == "only_left"
    assert got[5] == "only_right"
    assert got[3] == "different_v"
    assert got[2] == "different_t"  # v same, t differs (a vs x)
    assert got[4] == "same"


def test_diff_summary_and_cap(spark):
    left = spark.range(100).withColumn("v", F.col("id") * 2)
    right = spark.range(50, 150).withColumn(
        "v", F.when(F.col("id") < 60, F.col("id") * 2 + 1)
        .otherwise(F.col("id") * 2))
    summ = DF.diff_summary(left, right, ["id"], ["v"]).toPandas() \
        .set_index("diff_class")["count"]
    assert summ["only_left"] == 50
    assert summ["only_right"] == 50
    assert summ["different_v"] == 10
    assert summ["same"] == 40
    capped = DF.compare_datasets(left, right, ["id"], ["v"],
                                 max_result_len=25).toPandas()
    assert len(capped) == 25
    assert (capped.diff_class != "same").all()


def test_merge_latest(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "id": [1, 1, 1, 2, 2],
        "version": [1, 3, 2, 5, 4],
        "payload": ["a", "b", "c", "d", "e"],
    }))
    got = DF.merge_latest(df, ["id"]).toPandas().sort_values("id")
    assert got.payload.tolist() == ["b", "d"]


def test_apply_changes(spark):
    base = spark.createDataFrame(pd.DataFrame({
        "id": [1, 2, 3, 4], "val": ["a", "b", "c", "d"],
        "changetype": ["normal"] * 4}))
    changes = spark.createDataFrame(pd.DataFrame({
        "id": [2, 3, 5, 6],
        "val": ["B", "x", "E", "f"],
        "changetype": ["modify", "delete", "create", "remove"]}))
    got = DF.apply_changes(base, changes, ["id"]).toPandas() \
        .sort_values("id").reset_index(drop=True)
    # 1 kept, 2 modified, 3 deleted, 4 kept, 5 created, 6 remove-noop
    assert got.id.tolist() == [1, 2, 4, 5]
    assert got.val.tolist() == ["a", "B", "d", "E"]


def test_compare_datasets_json(spark):
    import pandas as pd

    from osmquadtree_rust_bindings_spark.operators import diff as DIFF

    l = spark.createDataFrame(pd.DataFrame({"id": [1, 2, 3], "v": [1, 1, 1]}))
    r = spark.createDataFrame(pd.DataFrame({"id": [2, 3, 4], "v": [1, 9, 1]}))
    got = DIFF.compare_datasets_json(l, r, ["id"], ["v"]).toPandas()
    by = dict(zip(got.diff_class, got.doc))
    assert set(got.diff_class) == {"only_left", "only_right", "different_v"}
    assert by["only_left"] == '{"id":1,"diff_class":"only_left"}'
    assert by["different_v"] == '{"id":3,"diff_class":"different_v"}'


def test_run_count_convenience(spark):
    from osmquadtree_rust_bindings_spark.operators import count as CNT
    from osmquadtree_rust_bindings_spark.sources import images as I
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        I.make_images_pdf(0, 300, with_bytes=False))
    from osmquadtree_rust_bindings_spark.operators import calcqts as CQ
    keyed = CQ.run_calcqts(df)
    out = CNT.run_count(keyed).collect()[0]
    assert out.num == 300
    filt = CNT.run_count(keyed, filter_in=F.col("lon") > 0).collect()[0]
    assert 0 < filt.num < 300


def test_run_sortblocks_convenience(spark, tmp_path):
    from osmquadtree_rust_bindings_spark.operators import calcqts as CQ
    from osmquadtree_rust_bindings_spark.operators import tiling as T
    from osmquadtree_rust_bindings_spark.sources import images as I
    df = CQ.run_calcqts(spark.createDataFrame(
        I.make_images_pdf(0, 2000, with_bytes=False)))
    out = str(tmp_path / "tiled")
    groups = T.run_sortblocks(df, out, target=400)
    assert groups.weight.sum() == 2000
    back = spark.read.parquet(out)
    assert back.count() == 2000
    assert "tile" in back.columns


def test_logtimes_and_time_op():
    from osmquadtree_rust_bindings_spark.functions.format import (
        LogTimes, time_op)
    lt = LogTimes()
    lt("stage one")
    s = str(lt)
    assert "stage one" in s and "TOTAL" in s
    sec, res = time_op(lambda x: x + 1, 41)
    assert res == 42 and sec >= 0
