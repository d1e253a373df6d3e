"""Query-workload fixtures: polygon sets, bbox queries, kNN queries
(FIXTURES.md §2/§3).  All deterministic (seeded), driver-side pandas —
these are the SMALL sides of the spatial joins (broadcast).

Polygon mirror of the reference ``Poly`` filter
(/root/reference/src/readpbf.rs:718-771): named polygon, vertex arrays,
precomputed bounds, point-in-polygon / bbox-overlap tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42


def make_polygons_pdf(m: int, seed: int = SEED) -> pd.DataFrame:
    """Convex polygons: 6-12 vertices on a circle, radius [0.05, 2] deg,
    centers inside the (lon, lat) domain.  Coordinates int 1e-7 deg."""
    rng = np.random.default_rng(seed)
    rows = []
    for j in range(m):
        nv = int(rng.integers(6, 13))
        radius = float(rng.uniform(0.05, 2.0))
        cx = float(rng.uniform(-175, 175))
        cy = float(rng.uniform(-80, 80))
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        vx = np.round((cx + radius * np.cos(ang)) * 1e7).astype(np.int64)
        vy = np.round((cy + radius * np.sin(ang)) * 1e7).astype(np.int64)
        rows.append({
            "poly_id": f"poly{j:06d}",
            "verts_lon": vx.tolist(),
            "verts_lat": vy.tolist(),
            "minlon": int(vx.min()), "minlat": int(vy.min()),
            "maxlon": int(vx.max()), "maxlat": int(vy.max()),
        })
    return pd.DataFrame(rows)


def make_bbox_queries_pdf(n: int = 100, seed: int = SEED) -> pd.DataFrame:
    """Seeded boxes, mix of cell-aligned and cell-straddling (FIXTURES §3)."""
    rng = np.random.default_rng(seed + 1)
    rows = []
    for q in range(n):
        w = float(rng.uniform(0.1, 8.0))
        h = float(rng.uniform(0.1, 8.0))
        cx = float(rng.uniform(-170, 170))
        cy = float(rng.uniform(-75, 75))
        rows.append({
            "qid": q,
            "minlon": int((cx - w / 2) * 1e7), "minlat": int((cy - h / 2) * 1e7),
            "maxlon": int((cx + w / 2) * 1e7), "maxlat": int((cy + h / 2) * 1e7),
        })
    return pd.DataFrame(rows)


def make_knn_queries_pdf(n: int = 100, seed: int = SEED) -> pd.DataFrame:
    """Seeded query points with k in {1,5,20}, including empty regions."""
    rng = np.random.default_rng(seed + 2)
    return pd.DataFrame({
        "qid": np.arange(n),
        "lon": rng.integers(-1_750_000_000, 1_750_000_000, n),
        "lat": rng.integers(-800_000_000, 800_000_000, n),
        "k": rng.choice([1, 5, 20], n).astype(np.int64),
    })
