"""T2: three-way bit-exact agreement — numpy kernel vs Spark Column algebra
vs the shared SQL fragments run on DuckDB (SURVEY.md §5)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osmquadtree_rust_bindings_spark import kernels as K
from osmquadtree_rust_bindings_spark.functions import quadtree as Q
from osmquadtree_rust_bindings_spark.functions import sqlgen


@pytest.fixture(scope="module")
def points_pdf():
    rng = np.random.default_rng(42)
    n = 5000
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "lon": rng.integers(-1_799_999_999, 1_799_999_999, n),
        "lat": rng.integers(-849_999_999, 849_999_999, n),
        "w": rng.choice([16, 32, 64, 128], n).astype(np.int64),
        "h": rng.choice([16, 32, 64, 128], n).astype(np.int64),
    })


def test_point_qt_three_way(spark, points_pdf):
    expected = K.calcqts_point(points_pdf.lon.values, points_pdf.lat.values, 18)

    sdf = spark.createDataFrame(points_pdf)
    got_spark = (
        Q.with_point_qt(sdf, "lon", "lat", 18)
        .select("id", "qt").toPandas().sort_values("id").qt.values
    )
    assert (got_spark == expected).all()

    con = duckdb.connect()
    con.register("pts", points_pdf)
    sql = sqlgen.point_qt_sql("pts", "id", "lon", "lat", 18)
    got_duck = con.sql(f"select * from ({sql}) order by id").df().qt.values
    assert (got_duck == expected).all()

    # the same fragment text must also parse/run as Spark SQL
    sdf.createOrReplaceTempView("pts_sv")
    got_sparksql = (
        spark.sql(sqlgen.point_qt_sql("pts_sv", "id", "lon", "lat", 18))
        .toPandas().sort_values("id").qt.values
    )
    assert (got_sparksql == expected).all()


def test_bbox_qt_three_way(spark, points_pdf):
    R = 10_000
    pdf = points_pdf.assign(
        minlon=points_pdf.lon - points_pdf.w * R // 2,
        maxlon=points_pdf.lon + points_pdf.w * R // 2,
        minlat=points_pdf.lat - points_pdf.h * R // 2,
        maxlat=points_pdf.lat + points_pdf.h * R // 2,
    )
    expected = K.calcqts_bbox(pdf.minlon.values, pdf.minlat.values,
                              pdf.maxlon.values, pdf.maxlat.values)

    sdf = spark.createDataFrame(pdf)
    got_spark = (
        Q.with_bbox_qt(sdf, "minlon", "minlat", "maxlon", "maxlat")
        .select("id", "qt").toPandas().sort_values("id").qt.values
    )
    assert (got_spark == expected).all()

    con = duckdb.connect()
    con.register("boxes", pdf)
    sql = sqlgen.bbox_qt_sql("boxes", "id", "minlon", "minlat",
                             "maxlon", "maxlat")
    got_duck = con.sql(f"select * from ({sql}) order by id").df().qt.values
    assert (got_duck == expected).all()


def test_qt_round_column(spark, points_pdf):
    sdf = Q.with_point_qt(spark.createDataFrame(points_pdf), "lon", "lat", 18)
    out = (
        sdf.select(
            "id", "qt",
            Q.qt_round(F.col("qt"), 17).alias("r17"),
            Q.qt_round_dyn(F.col("qt"), F.lit(11)).alias("r11"),
            Q.qt_depth(F.col("qt")).alias("d"),
        ).toPandas().sort_values("id")
    )
    assert (out.r17.values == K.qt_round(out.qt.values, 17)).all()
    assert (out.r11.values == K.qt_round(out.qt.values, 11)).all()
    assert (out.d.values == 18).all()


def test_qt_is_parent_and_range_pred(spark, points_pdf):
    sdf = Q.with_point_qt(spark.createDataFrame(points_pdf), "lon", "lat", 18)
    sdf = sdf.withColumn("r9", Q.qt_round(F.col("qt"), 9))
    out = sdf.select(
        "id",
        Q.qt_is_parent(F.col("r9"), F.col("qt")).alias("isp"),
        Q.qt_is_parent(F.col("qt"), F.col("r9")).alias("rev"),
    ).toPandas()
    assert out.isp.all()
    assert not out.rev.any()

    # range predicate selects exactly the subtree members
    some_prefix = int(
        K.qt_round(K.calcqts_point(
            points_pdf.lon.values[:1], points_pdf.lat.values[:1]), 3)[0]
    )
    got = sdf.filter(Q.qt_key_range_pred(F.col("qt"), some_prefix)).count()
    exp = int(K.qt_is_parent(
        np.int64(some_prefix),
        K.calcqts_point(points_pdf.lon.values, points_pdf.lat.values),
    ).sum())
    assert got == exp


def test_haversine_column_matches_kernel(spark, points_pdf):
    pdf = points_pdf.head(500)
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.select(
            "id",
            Q.haversine_m(F.col("lon"), F.col("lat"),
                          F.lit(0), F.lit(0)).alias("d"),
        ).toPandas().sort_values("id").d.values
    )
    exp = K.haversine_m(pdf.lon.values, pdf.lat.values, 0, 0)
    assert np.allclose(got, exp, rtol=1e-12)


def test_point_qt_plan_is_codegen_only(spark, points_pdf, tmp_path):
    """Scale guard: the point calc_qts plan must be a single
    whole-stage-codegen project over the parquet scan — no exchange, no
    Python, and column pruning must reach the scan."""
    path = str(tmp_path / "pts.parquet")
    spark.createDataFrame(points_pdf).write.parquet(path)
    sdf = Q.with_point_qt(spark.read.parquet(path), "lon", "lat")
    plan = sdf.select("id", "qt")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
    assert "*(1) Project" in plan  # '*' = whole-stage codegen marker
    # column pruning: w/h must not be read from parquet
    assert "ReadSchema: struct<id:bigint,lon:bigint,lat:bigint>" in plan
