"""T2: synthetic image source + codec + payload invariants (FIXTURES.md §1/§5)."""

import numpy as np
import pytest

from osmquadtree_rust_bindings_spark.operators import images as OPI
from osmquadtree_rust_bindings_spark.sources import images as I


def test_codec_roundtrip_lossless():
    pix = I.gen_pixels(7, 32, 16)
    assert pix.shape == (16, 32, 3)
    back = I.decode_image(I.encode_image(pix, "png"))
    assert np.array_equal(pix, back)


def test_codec_lossy_psnr():
    pix = I.gen_pixels(11, 64, 64)
    back = I.decode_image(I.encode_image(pix, "jpeg"))
    p = I.psnr(pix, back)
    assert p >= 40.0, p
    assert not np.array_equal(pix, back)  # actually lossy


def test_pdf_generator_deterministic():
    a = I.make_images_pdf(10, 20)
    b = I.make_images_pdf(10, 20)
    assert a.equals(b)
    assert a.image_id.tolist()[0] == "img000000000010"
    assert set(a.fmt) <= {"png", "jpeg"}
    assert I.phash_of("img000000000010") == a.phash.iloc[0]


def test_generator_batch_boundary_invariance():
    whole = I.make_images_pdf(0, 50)
    parts = I.make_images_pdf(0, 17), I.make_images_pdf(17, 50)
    import pandas as pd
    joined = pd.concat(parts, ignore_index=True)
    assert whole.equals(joined)


def test_spark_generation_and_payload_invariant(spark):
    df = I.generate_images(spark, 200, num_partitions=4)
    assert df.count() == 200
    res = OPI.verify_payload(df).toPandas()
    assert res.pixels_ok.all()
    assert res.caption_ok.all()
    assert (res.psnr[res.psnr < 1e9] >= 40).all()


def test_decode_features(spark):
    df = I.generate_images(spark, 50, num_partitions=2)
    feats = OPI.decode_features(df).toPandas()
    assert len(feats) == 50
    # mean color matches a local decode for one row
    row = feats[feats.image_id == "img000000000003"].iloc[0]
    pix = I.gen_pixels(3, int(row.w), int(row.h))
    src = I.make_images_pdf(3, 4)
    got = I.decode_image(src.bytes.iloc[0])
    assert abs(got.reshape(-1, 3).mean(axis=0)[0] - row.mean_r) < 3.0


def test_resize(spark):
    df = I.generate_images(spark, 10, num_partitions=1)
    out = OPI.resize_nearest(df, 8, 8).toPandas()
    assert (out.w == 8).all()
    for b in out.bytes:
        assert I.decode_image(b).shape == (8, 8, 3)


def test_video_decode_rejects_foreign_payload():
    from osmquadtree_rust_bindings_spark.sources import video as V
    with pytest.raises(ValueError, match="unknown video magic"):
        V.decode_video(b"NOPE" + b"\x00" * 16)


def test_skewed_lonlat_hotspots():
    ph = I.make_images_pdf(0, 5000, with_bytes=False).phash.to_numpy(np.int64)
    lon, lat = I.skewed_lonlat(ph)
    from osmquadtree_rust_bindings_spark import kernels as K
    hot = np.abs(lon - I.HOTSPOTS[0][0]) < 2_000_000
    assert hot.sum() > 100  # a real cluster forms
    assert lon.min() >= -1_800_000_000 and lat.max() < 850_000_000


def test_audio_codec_roundtrip():
    from osmquadtree_rust_bindings_spark.sources import audio as A

    s = A.gen_samples(7, 999)
    dec, sr = A.decode_audio(A.encode_audio(s))
    assert sr == A.SAMPLE_RATE
    assert np.array_equal(s, dec)


def test_audio_features_match_local_oracle(spark):
    from osmquadtree_rust_bindings_spark.operators import images as OPI2
    from osmquadtree_rust_bindings_spark.sources import audio as A

    pdf = A.make_audio_pdf(0, 40)
    feats = OPI2.audio_features(
        spark.createDataFrame(pdf).repartition(4)).toPandas()
    assert len(feats) == 40
    row = feats[feats.clip_id == "clip00000005"].iloc[0]
    x = A.gen_samples(5, int(pdf[pdf.clip_id == "clip00000005"]
                             .n_samples.iloc[0])).astype(np.int64)
    assert row.n_samples == len(x)
    assert row.rms == int(np.sqrt(np.sum(x * x) // len(x)))
    assert row.peak == int(np.abs(x).max())
    assert row.zero_crossings == int(np.count_nonzero(
        np.signbit(x[1:]) != np.signbit(x[:-1])))


def test_video_codec_roundtrip():
    from osmquadtree_rust_bindings_spark.sources import video as V
    frames = V.gen_frames(7, 12, 16, 32)
    back, fps = V.decode_video(V.encode_video(frames, 24))
    assert fps == 24 and back.shape == (12, 32, 16, 3)
    assert (back == frames).all()


def test_video_frame_sampling_and_features(spark):
    from osmquadtree_rust_bindings_spark.operators import images as IMG
    from osmquadtree_rust_bindings_spark.sources import video as V
    df = spark.createDataFrame(V.make_videos_pdf(0, 20))
    feats = IMG.video_features(df).toPandas().set_index("video_id")
    src = V.make_videos_pdf(0, 20).set_index("video_id")
    assert (feats.n_frames == src.n_frames).all()
    assert (feats.duration_ms == src.n_frames * 1000 // src.fps).all()
    sampled = IMG.sample_video_frames(df, every_n=8).toPandas()
    # every 8th frame incl. frame 0: ceil(n/8) per clip
    per = sampled.groupby("video_id").size()
    assert (per == (-(-src.n_frames // 8))).all()
    # each sampled frame decodes back to the source frame, bit-exact
    row = sampled[sampled.frame_no == 8].iloc[0]
    cid = int(row.video_id[3:])
    got = I.decode_image(row.bytes)
    exp = V.gen_frames(cid, 9, int(src.loc[row.video_id].w),
                       int(src.loc[row.video_id].h))[8]
    assert (got == exp).all()
