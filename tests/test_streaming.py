"""T3: streaming ingest — incremental processing + restart-resume semantics."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmquadtree_rust_bindings_spark import kernels as K
from osmquadtree_rust_bindings_spark.sources import images as I
from osmquadtree_rust_bindings_spark.sources.catalog import Catalog
from osmquadtree_rust_bindings_spark.streaming import ingest as ING

SCHEMA = I.IMAGES_SCHEMA


def test_stream_calcqts_incremental(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckp = str(tmp_path / "ckp")
    # batch 1
    spark.createDataFrame(I.make_images_pdf(0, 500, with_bytes=False)) \
        .write.mode("append").parquet(src)
    q = ING.stream_calcqts(spark, src, SCHEMA, out, ckp)
    q.awaitTermination(120)
    got1 = spark.read.parquet(out)
    assert got1.count() == 500

    # append batch 2; a RESTARTED stream must process only the new files
    spark.createDataFrame(I.make_images_pdf(500, 800, with_bytes=False)) \
        .write.mode("append").parquet(src)
    q2 = ING.stream_calcqts(spark, src, SCHEMA, out, ckp)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out).toPandas()
    assert len(got2) == 800
    assert got2.image_id.nunique() == 800  # no reprocessing duplicates

    # qt keys identical to the batch kernel
    ph = np.sort(got2.phash.to_numpy(np.int64))
    exp_pdf = I.make_images_pdf(0, 800, with_bytes=False)
    got2 = got2.sort_values("image_id").reset_index(drop=True)
    lon, lat = K.phash_lonlat(exp_pdf.phash.to_numpy(np.int64))
    exp_qt = K.calcqts_point_bbox(lon, lat, exp_pdf.w.to_numpy(np.int64),
                                  exp_pdf.h.to_numpy(np.int64))
    assert (got2.qt.to_numpy(np.int64) == exp_qt).all()


def test_stream_cdc_apply(spark, tmp_path):
    changes = str(tmp_path / "changes")
    ckp = str(tmp_path / "ckp2")
    cat = Catalog(str(tmp_path / "cat"))
    import pandas as pd
    spark.createDataFrame(pd.DataFrame({
        "id": [1, 2, 3], "val": ["a", "b", "c"],
        "changetype": ["create", "create", "create"],
    })).write.mode("append").parquet(changes)
    q = ING.stream_cdc_apply(spark, changes, "id long, val string, "
                             "changetype string", cat, "t", ["id"], ckp)
    q.awaitTermination(120)
    assert sorted(cat.read(spark, "t").toPandas().id) == [1, 2, 3]

    spark.createDataFrame(pd.DataFrame({
        "id": [2, 3, 4], "val": ["B", "x", "d"],
        "changetype": ["modify", "delete", "create"],
    })).write.mode("append").parquet(changes)
    q2 = ING.stream_cdc_apply(spark, changes, "id long, val string, "
                              "changetype string", cat, "t", ["id"], ckp)
    q2.awaitTermination(120)
    got = cat.read(spark, "t").toPandas().sort_values("id")
    assert got.id.tolist() == [1, 2, 4]
    assert got.val.tolist() == ["a", "B", "d"]


def test_stream_first_seen_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "fs_src")
    out = str(tmp_path / "fs_out")
    ckp = str(tmp_path / "fs_ckp")

    def drain(lo, hi):
        pdf = I.make_images_pdf(lo, hi, with_bytes=False)[["image_id",
                                                           "phash"]]
        pdf["tile"] = pdf.phash.to_numpy(np.int64) % 4
        spark.createDataFrame(pdf[["image_id", "tile"]]) \
            .write.mode("append").parquet(src)
        stream = spark.readStream.schema("image_id string, tile long") \
            .format("parquet").load(src)
        q = (ING.stream_first_seen(stream, timeout_ms=None)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckp)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain(0, 300)
    got1 = spark.read.parquet(out).toPandas()
    assert sorted(got1.image_id) == sorted(
        I.make_images_pdf(0, 300, with_bytes=False).image_id)

    # second batch overlaps [100, 300) — only [300, 500) may come out
    drain(100, 500)
    got2 = spark.read.parquet(out).toPandas()
    assert len(got2) == 500
    assert got2.image_id.nunique() == 500


def test_stream_first_seen_bloom_bounded_state(spark, tmp_path):
    # bloom mode: constant-size state regardless of key volume; exact
    # output on this fixture (fp rate ~1e-5 at n=500, m=2^17)
    src = str(tmp_path / "bl_src")
    out = str(tmp_path / "bl_out")
    ckp = str(tmp_path / "bl_ckp")

    def drain(lo, hi):
        pdf = I.make_images_pdf(lo, hi, with_bytes=False)[["image_id",
                                                           "phash"]]
        pdf["tile"] = pdf.phash.to_numpy(np.int64) % 4
        spark.createDataFrame(pdf[["image_id", "tile"]]) \
            .write.mode("append").parquet(src)
        stream = spark.readStream.schema("image_id string, tile long") \
            .format("parquet").load(src)
        q = (ING.stream_first_seen(stream, timeout_ms=None,
                                   state_mode="bloom",
                                   bloom_bits=1 << 17)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckp)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain(0, 300)
    # re-deliver everything + 200 new: only the new may emerge, and the
    # persisted state stays one fixed-size bloom per tile group
    drain(0, 500)
    got = spark.read.parquet(out).toPandas()
    assert got.image_id.nunique() == len(got)
    assert len(got) == 500
    # state store on disk: each group's state is the 16 KiB bloom, not a
    # growing id list — assert the checkpoint state files stay small
    import pathlib
    state_bytes = sum(f.stat().st_size for f in
                      pathlib.Path(ckp).rglob("*") if f.is_file())
    assert state_bytes < 4 * (1 << 17)  # ~4 tiles x 16KiB + metadata


def test_stream_first_seen_bloom_fp_rate_at_capacity(spark, tmp_path):
    # false-positive-rate assertion at a deliberately undersized capacity:
    # ONE group's bloom (m=2^14 bits, k=7) holds 5000 keys -> fill kn/m
    # ~2.1, so a NEVER-seen key is falsely suppressed with theory
    # p = (1 - e^{-kn/m})^k ~ 0.41.  Round 2 delivers 5000 new keys;
    # the measured suppression rate must sit in a generous band around
    # theory, and — because the pandas hash is fixed-key — the emitted
    # set must be bit-identical on a full rerun (determinism).
    import pandas as pd

    def run(tag):
        src = str(tmp_path / f"fp_src_{tag}")
        out = str(tmp_path / f"fp_out_{tag}")
        ckp = str(tmp_path / f"fp_ckp_{tag}")

        def drain(lo, hi):
            pdf = pd.DataFrame({"image_id": [f"k{i:06d}"
                                             for i in range(lo, hi)],
                                "tile": 0})
            spark.createDataFrame(pdf).write.mode("append").parquet(src)
            stream = spark.readStream \
                .schema("image_id string, tile long") \
                .format("parquet").load(src)
            q = (ING.stream_first_seen(stream, timeout_ms=None,
                                       state_mode="bloom",
                                       bloom_bits=1 << 14)
                 .writeStream.format("parquet").option("path", out)
                 .option("checkpointLocation", ckp)
                 .trigger(availableNow=True).start())
            assert q.awaitTermination(120)

        drain(0, 5000)
        n1 = spark.read.parquet(out).count()
        drain(5000, 10000)
        got = spark.read.parquet(out).toPandas()
        return n1, sorted(got.image_id)

    n1_a, ids_a = run("a")
    emitted_new = len(ids_a) - n1_a
    fp_rate = 1.0 - emitted_new / 5000.0
    # round 1 itself sees fp (later keys tested against a filling bloom),
    # so n1 < 5000 too; the round-2 band is the capacity assertion
    assert 0.15 < fp_rate < 0.65, fp_rate
    n1_b, ids_b = run("b")
    assert (n1_a, ids_a) == (n1_b, ids_b)  # deterministic given the seed
