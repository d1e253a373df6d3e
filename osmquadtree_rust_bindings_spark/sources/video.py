"""Deterministic synthetic video source + codec (multimodal plumbing).

Same contract as the image/audio tables: video clips are opaque ``bytes``
payloads with typed metadata, decoded lazily inside Arrow-batched kernels
(the reference's lazily-decoded block payloads,
/root/reference/src/elements.rs:695-711).  Real mp4/av1 codec libraries
are absent in this container, so the wire format is the package's own
frame-stacked container ("FVI1" magic): each frame is the deterministic
image pixel pattern, the whole frame stack zlib-compressed.  The
Spark-side plumbing (schema, batching, frame sampling, per-frame
features) is real and tested; swapping in a real codec touches only
encode/decode below.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd

from osmquadtree_rust_bindings_spark.sources.images import gen_pixels

_MAGIC = b"FVI1"


def gen_frames(i: int, n_frames: int, w: int, h: int) -> np.ndarray:
    """(n_frames, h, w, 3) uint8 — frame f of clip i is the deterministic
    image pattern seeded by i * 1009 + f (pure function, vectorized)."""
    return np.stack([gen_pixels(i * 1009 + f, w, h)
                     for f in range(n_frames)])


def encode_video(frames: np.ndarray, fps: int = 30) -> bytes:
    n, h, w, _ = frames.shape
    return (_MAGIC + struct.pack("<IHHH", n, w, h, fps)
            + zlib.compress(np.ascontiguousarray(frames).tobytes(), 6))


def decode_video(data: bytes) -> tuple[np.ndarray, int]:
    """-> ((n, h, w, 3) uint8 frames, fps)."""
    if data[:4] != _MAGIC:
        raise ValueError(f"unknown video magic {data[:4]!r}")
    n, w, h, fps = struct.unpack("<IHHH", data[4:14])
    raw = zlib.decompress(data[14:])
    return (np.frombuffer(raw, dtype=np.uint8).reshape(n, h, w, 3).copy(),
            fps)


def make_videos_pdf(lo: int, hi: int) -> pd.DataFrame:
    """Rows [lo, hi) of the synthetic video table: (video_id, bytes,
    n_frames, w, h, fps, caption)."""
    rows = []
    for i in range(lo, hi):
        n = 8 + (i * 131) % 56              # 8..63 frames
        w = 16 << (i % 2)                   # 16 or 32
        h = 16 << ((i >> 1) % 2)
        fps = (24, 30)[i % 2]
        rows.append((f"vid{i:08d}", encode_video(gen_frames(i, n, w, h),
                                                 fps),
                     n, w, h, fps, f"synthetic clip {i}"))
    return pd.DataFrame(rows, columns=["video_id", "bytes", "n_frames",
                                       "w", "h", "fps", "caption"])
