"""Measure the bbox/PIP small-vs-batch crossover over query-set size.

Same design as jobs/run_knn_crossover.py (README perf rule 18 context):
both forms of J11 (bbox_join vs bbox_join_batch) and J9 (pip_join vs
pip_join_batch) over the sf0.1 point set at growing box/polygon counts,
alternating A/B within one session, best of ``reps``.  Row counts are
asserted equal between forms at every rung so a timing run can never
silently compare different answers (full-value equality is pinned by
tests/test_spatial_join.py).

The small forms expand cover cells driver-side and force a broadcast
(bbox) / driver-built vertex dict (PIP) — the right contract for tens
of queries; the batch forms emit the cover executor-side and, for PIP,
run the refine as a poly_id cogroup.  This job measures WHERE each form
wins, which is what the auto-dispatch thresholds encode.

The small form is skipped above ``SMALL_MAX`` boxes / ``PIP_SMALL_MAX``
polygons (driver-side expansion is the known-slow path; the point is
the crossover, not waiting on it).

Writes BENCH/spatial_crossover.json:
  {"points": N, "bbox": {"100": {"small_sec": ..., "batch_sec": ...,
                                  "rows": ...}, ...},
                "pip":  {...}}
"""

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BBOX_COUNTS = [100, 1_000, 10_000, 100_000, 1_000_000]
PIP_COUNTS = [100, 1_000, 10_000, 100_000, 1_000_000]
SMALL_MAX = 100_000      # bbox small form: driver expansion beyond is pointless
PIP_SMALL_MAX = 100_000
REPS = 2
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH", "spatial_crossover.json")


def make_boxes(n: int) -> pd.DataFrame:
    rng = np.random.default_rng(431)
    w = rng.integers(500_000, 50_000_000, n)
    h = rng.integers(500_000, 50_000_000, n)
    cx = rng.integers(-1_600_000_000, 1_600_000_000, n)
    cy = rng.integers(-700_000_000, 700_000_000, n)
    return pd.DataFrame({"qid": np.arange(n),
                         "minlon": cx - w, "minlat": cy - h,
                         "maxlon": cx + w, "maxlat": cy + h})


def make_polys(n: int) -> pd.DataFrame:
    # vectorized variant of sources.fixtures.make_polygons_pdf (that one
    # is a per-polygon python loop — fine at 80, slow at 10^5)
    rng = np.random.default_rng(433)
    nv = 8
    radius = rng.uniform(0.02, 0.8, n)
    cx = rng.uniform(-175, 175, n)
    cy = rng.uniform(-80, 80, n)
    ang = np.sort(rng.uniform(0, 2 * np.pi, (n, nv)), axis=1)
    vx = np.round((cx[:, None] + radius[:, None] * np.cos(ang)) * 1e7) \
        .astype(np.int64)
    vy = np.round((cy[:, None] + radius[:, None] * np.sin(ang)) * 1e7) \
        .astype(np.int64)
    return pd.DataFrame({
        "poly_id": [f"p{i:07d}" for i in range(n)],
        "verts_lon": list(vx), "verts_lat": list(vy),
        "minlon": vx.min(1), "minlat": vy.min(1),
        "maxlon": vx.max(1), "maxlat": vy.max(1),
    })


def time_forms(spark, pts, op: str, count: int, small_max: int) -> dict:
    from osmquadtree_rust_bindings_spark.operators import spatial_join as SJ

    if op == "bbox":
        qpdf = make_boxes(count)
        sdf = spark.createDataFrame(
            qpdf[["qid", "minlon", "minlat", "maxlon", "maxlat"]])
        forms = {
            "small": lambda: SJ.bbox_join(pts, qpdf, point_id="rowkey",
                                          batch_threshold=count + 1),
            "batch": lambda: SJ.bbox_join_batch(pts, sdf, point_id="rowkey"),
        }
    else:
        qpdf = make_polys(count)
        qpdf_lists = qpdf.assign(verts_lon=[v.tolist() for v in qpdf.verts_lon],
                                 verts_lat=[v.tolist() for v in qpdf.verts_lat])
        sdf = spark.createDataFrame(qpdf_lists[
            ["poly_id", "verts_lon", "verts_lat",
             "minlon", "minlat", "maxlon", "maxlat"]])
        forms = {
            "small": lambda: SJ.pip_join(pts, qpdf, point_id="rowkey",
                                         batch_threshold=count + 1),
            "batch": lambda: SJ.pip_join_batch(pts, sdf, point_id="rowkey"),
        }
    row: dict = {}
    rows_by_form: dict = {}
    for rep in range(REPS):
        order = ("batch", "small") if rep % 2 == 0 else ("small", "batch")
        for form in order:
            if form == "small" and count > small_max:
                continue
            t0 = time.time()
            n_rows = forms[form]().count()
            dt = time.time() - t0
            key = f"{form}_sec"
            row[key] = min(row.get(key, 1e9), round(dt, 2))
            rows_by_form[form] = n_rows
    if len(rows_by_form) == 2 and \
            rows_by_form["small"] != rows_by_form["batch"]:
        raise AssertionError(
            f"{op} row-count mismatch at {count}: {rows_by_form}")
    row["rows"] = rows_by_form["batch"]
    return row


def main() -> None:
    from osmquadtree_rust_bindings_spark import driver_queries as DQ
    from osmquadtree_rust_bindings_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("local[32]", app_name="osmqt-spatial-crossover")
    spark.sparkContext.setLogLevel("ERROR")
    pts = DQ._pts_with_qt(spark, sf_dir)
    n_points = pts.count()

    out = {"points": n_points, "sf_dir": sf_dir, "reps": REPS,
           "bbox_small_max": SMALL_MAX, "pip_small_max": PIP_SMALL_MAX,
           "bbox": {}, "pip": {}}
    for count in BBOX_COUNTS:
        r = time_forms(spark, pts, "bbox", count, SMALL_MAX)
        out["bbox"][str(count)] = r
        print(f"bbox {count:>8}: {r}", flush=True)
    for count in PIP_COUNTS:
        r = time_forms(spark, pts, "pip", count, PIP_SMALL_MAX)
        out["pip"][str(count)] = r
        print(f"pip  {count:>8}: {r}", flush=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
