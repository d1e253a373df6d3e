"""Image-payload operators: decode / verify / resize / feature-extract.

The multimodal plumbing pattern: the ``bytes`` column is an opaque binary
payload with typed metadata (w, h, fmt); all pixel work happens in
Arrow-batched ``mapInPandas`` kernels — never per-row Python at the driver.
Mirrors the reference's per-blob decode operator S11
(/root/reference/src/elements.rs:695-711) where the 'block' payload is
decoded lazily and in worker threads.

Real PNG/JPEG codecs (PIL) are absent in this container; the package codec
in ``sources.images`` is used.  Audio and video payloads decode through the
package's own deterministic codecs (``sources.audio`` PCM,
``sources.video`` FVI1) — a real mp3/av library would replace only the
decode call, never the Spark plumbing.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from osmquadtree_rust_bindings_spark.sources import images as I

DECODED_SCHEMA = ("image_id string, w int, h int, pixels binary, "
                  "mean_r double, mean_g double, mean_b double")


def decode_features(df: DataFrame) -> DataFrame:
    """Decode bytes -> raw pixels + per-image mean color (vectorized batch)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            pix = [I.decode_image(d) for d in b["bytes"]]
            means = np.array([p.reshape(-1, 3).mean(axis=0) for p in pix])
            yield pd.DataFrame({
                "image_id": b["image_id"],
                "w": b["w"],
                "h": b["h"],
                "pixels": [p.tobytes() for p in pix],
                "mean_r": means[:, 0] if len(pix) else [],
                "mean_g": means[:, 1] if len(pix) else [],
                "mean_b": means[:, 2] if len(pix) else [],
            })

    return df.select("image_id", "bytes", "w", "h").mapInPandas(
        fn, schema=DECODED_SCHEMA)


def verify_payload(df: DataFrame, min_psnr: float = 40.0) -> DataFrame:
    """Per-row payload invariant (input_hint): decoded pixels match the
    generator's (exact for lossless, PSNR >= min_psnr for lossy) and the
    caption matches.  Returns (image_id, pixels_ok, caption_ok, psnr)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                i = int(r.image_id[3:])
                exp = I.gen_pixels(i, int(r.w), int(r.h))
                got = I.decode_image(r.bytes)
                p = I.psnr(exp, got)
                ok = (np.array_equal(exp, got) if r.fmt == "png"
                      else p >= min_psnr)
                cap_ok = r.caption == (
                    f"synthetic image {i} tile test "
                    f"{I.ADJ[i % 7]} {I.NOUN[i % 11]}")
                rows.append((r.image_id, bool(ok), bool(cap_ok),
                             min(p, 1e9)))
            yield pd.DataFrame(rows, columns=["image_id", "pixels_ok",
                                              "caption_ok", "psnr"])

    return df.select("image_id", "bytes", "w", "h", "fmt", "caption") \
        .mapInPandas(fn, schema="image_id string, pixels_ok boolean, "
                                "caption_ok boolean, psnr double")


def resize_nearest(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize to (out_w, out_h); re-encodes lossless."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for r in b.itertuples(index=False):
                pix = I.decode_image(r.bytes)
                h, w, _ = pix.shape
                ys = (np.arange(out_h) * h // out_h)
                xs = (np.arange(out_w) * w // out_w)
                small = pix[ys][:, xs]
                out.append(I.encode_image(small, "png"))
            yield pd.DataFrame({"image_id": b["image_id"], "bytes": out,
                                "w": out_w, "h": out_h})

    return df.select("image_id", "bytes").mapInPandas(
        fn, schema="image_id string, bytes binary, w int, h int")


AUDIO_FEATURES_SCHEMA = ("clip_id string, n_samples long, duration_ms long, "
                         "rms long, peak long, zero_crossings long")


def audio_features(df: DataFrame) -> DataFrame:
    """Audio feature extraction: decode PCM payload -> integer features
    (duration, RMS, peak, zero-crossings) in one Arrow-batched pass.
    All-integer outputs so downstream aggregations are engine-exact.
    Decode uses the package PCM codec (sources.audio); a real mp3/flac
    library would replace only the decode call."""
    from osmquadtree_rust_bindings_spark.sources import audio as A

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                s, sr = A.decode_audio(r.bytes)
                x = s.astype(np.int64)
                rows.append((
                    r.clip_id, len(x), len(x) * 1000 // sr,
                    int(np.sqrt(np.sum(x * x) // max(len(x), 1))),
                    int(np.abs(x).max(initial=0)),
                    int(np.count_nonzero(np.signbit(x[1:]) !=
                                         np.signbit(x[:-1]))),
                ))
            yield pd.DataFrame(rows, columns=[
                "clip_id", "n_samples", "duration_ms", "rms", "peak",
                "zero_crossings"])

    return df.select("clip_id", "bytes").mapInPandas(
        fn, schema=AUDIO_FEATURES_SCHEMA)


def sample_video_frames(df: DataFrame, every_n: int = 30,
                        id_col: str = "video_id") -> DataFrame:
    """Video frame sampling: decode the clip payload, keep every
    ``every_n``-th frame (plus frame 0), re-encode each kept frame as a
    standalone image payload.  Arrow-batched; one output row per sampled
    frame.  Decode/encode use the package codecs (sources.video /
    sources.images) — a real av library would replace only those calls."""
    from osmquadtree_rust_bindings_spark.sources import video as V
    from osmquadtree_rust_bindings_spark.sources.images import (
        encode_image_builtin,
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                frames, _ = V.decode_video(r.bytes)
                for f in range(0, len(frames), every_n):
                    rows.append((getattr(r, id_col), f,
                                 encode_image_builtin(frames[f], "png")))
            yield pd.DataFrame(rows, columns=[id_col, "frame_no", "bytes"])

    return df.select(id_col, "bytes").mapInPandas(
        fn, schema=f"{id_col} string, frame_no int, bytes binary")


def video_features(df: DataFrame, id_col: str = "video_id") -> DataFrame:
    """Per-clip integer features in one Arrow pass: frame count, duration,
    total/max luma (integer 2R+5G+B per pixel, summed), and mean frame
    difference (sum |frame[i] - frame[i-1]|) — the scene-cut signal."""
    from osmquadtree_rust_bindings_spark.sources import video as V

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                frames, fps = V.decode_video(r.bytes)
                x = frames.astype(np.int64)
                luma = 2 * x[..., 0] + 5 * x[..., 1] + x[..., 2]
                per_frame = luma.sum(axis=(1, 2))
                diff = (np.abs(x[1:] - x[:-1]).sum()
                        if len(x) > 1 else 0)
                rows.append((getattr(r, id_col), len(frames),
                             len(frames) * 1000 // fps,
                             int(per_frame.sum()), int(per_frame.max()),
                             int(diff)))
            yield pd.DataFrame(rows, columns=[
                id_col, "n_frames", "duration_ms", "sum_luma", "max_luma",
                "frame_diff"])

    return df.select(id_col, "bytes").mapInPandas(
        fn, schema=(f"{id_col} string, n_frames long, duration_ms long, "
                    "sum_luma long, max_luma long, frame_diff long"))
