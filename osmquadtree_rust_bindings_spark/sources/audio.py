"""Deterministic synthetic audio source + codec (multimodal plumbing).

Audio clips are opaque ``bytes`` payloads with typed metadata — the same
contract as the image table's ``bytes`` column (BASELINE input_hint) and
the reference's lazily-decoded block payloads
(/root/reference/src/elements.rs:695-711).  Real mp3/flac codec libraries
are not present in this container, so the container format here is the
package's own PCM16 framing ("FAU1" magic): the Spark-side plumbing
(schema, Arrow batching, partitioning, feature kernels) is real and
tested; swapping in a real codec touches only encode/decode below.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from osmquadtree_rust_bindings_spark.sources.images import _splitmix64

_MAGIC = b"FAU1"
SAMPLE_RATE = 16_000


def gen_samples(i: int, n: int) -> np.ndarray:
    """Deterministic int16 PCM: two integer-frequency tones + hash dither.
    Pure function of (i, n), fully vectorized."""
    t = np.arange(n, dtype=np.int64)
    f1, f2 = 3 + i % 13, 29 + i % 37
    tone = (8000 * np.sin(2 * np.pi * f1 * t / SAMPLE_RATE)
            + 4000 * np.sin(2 * np.pi * f2 * t / SAMPLE_RATE))
    dither = (_splitmix64((t + np.int64(i) * np.int64(1_000_003))
                          .astype(np.uint64))
              % np.uint64(256)).astype(np.int64) - 128
    return np.clip(tone.astype(np.int64) + dither,
                   -32768, 32767).astype(np.int16)


def encode_audio(samples: np.ndarray, sample_rate: int = SAMPLE_RATE) -> bytes:
    return (_MAGIC + struct.pack("<IH", len(samples), sample_rate)
            + samples.astype("<i2").tobytes())


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """-> (int16 samples, sample_rate)."""
    if data[:4] != _MAGIC:
        raise ValueError(f"unknown audio magic {data[:4]!r}")
    n, sr = struct.unpack("<IH", data[4:10])
    return np.frombuffer(data[10:], dtype="<i2", count=n).copy(), sr


def make_audio_pdf(lo: int, hi: int) -> pd.DataFrame:
    """Rows [lo, hi) of the synthetic audio table: (clip_id, bytes,
    n_samples, sample_rate, caption)."""
    rows = []
    for i in range(lo, hi):
        n = 512 + (i * 277) % 2048
        rows.append((f"clip{i:08d}", encode_audio(gen_samples(i, n)),
                     n, SAMPLE_RATE, f"synthetic clip {i}"))
    return pd.DataFrame(rows, columns=["clip_id", "bytes", "n_samples",
                                       "sample_rate", "caption"])
