"""Spatial joins: bbox/range (J11), point-in-polygon (J9), kNN (J10),
raster-tile <-> vector-cell assignment (J12).

All four follow the same Spark-first shape (SURVEY.md §2.3): a coarse
"cover" equi-join on grid cells (broadcast when the query side is small,
shuffle otherwise) followed by an exact refine — the standard cover+refine
spatial join.  The cover side pushes down as an equi-join Catalyst can plan
(broadcast hash join / AQE skew join); the refine is either pure Column
predicates (bbox) or a vectorized numpy kernel (PIP).

Reference parity anchors:
- bbox contains point (closed intervals)   src/elements.rs:855-860
- Poly.contains_point / check_box          src/readpbf.rs:757-763
- idset spatial semi-join cascade          src/elements.rs:855-894 (J1)
- qt prefix algebra for cell assignment    src/elements.rs:38-40
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmquadtree_rust_bindings_spark import kernels as K
from osmquadtree_rust_bindings_spark.functions import quadtree as Q

COVER_DEPTH = 8  # coarse cover-grid depth for polygon/bbox joins


# --------------------------------------------------------------- cell cover

def bbox_cover_cells(minlon, minlat, maxlon, maxlat,
                     depth: int = COVER_DEPTH) -> list[tuple[int, int]]:
    """All depth-``depth`` qt cells intersecting each bbox.

    Returns [(row_idx, cell_qt), ...].  Driver-side numpy — the query/polygon
    side of a cover join is small by design (broadcast side).
    """
    minlon = np.atleast_1d(np.asarray(minlon, np.int64))
    maxlon = np.atleast_1d(np.asarray(maxlon, np.int64))
    minlat = np.atleast_1d(np.asarray(minlat, np.int64))
    maxlat = np.atleast_1d(np.asarray(maxlat, np.int64))
    n = np.int64(1) << np.int64(depth)
    x0, y0 = K.norm_xy(minlon, minlat)
    x1, y1 = K.norm_xy(maxlon, maxlat)
    ix0 = np.clip(np.floor(x0 * n).astype(np.int64), 0, n - 1)
    ix1 = np.clip(np.floor(x1 * n).astype(np.int64), 0, n - 1)
    iy0 = np.clip(np.floor(y0 * n).astype(np.int64), 0, n - 1)
    iy1 = np.clip(np.floor(y1 * n).astype(np.int64), 0, n - 1)
    out = []
    for i in range(len(ix0)):
        xs = np.arange(ix0[i], ix1[i] + 1)
        ys = np.arange(iy0[i], iy1[i] + 1)
        gx, gy = np.meshgrid(xs, ys)
        cells = K.qt_from_cell(gx.ravel(), gy.ravel(),
                               np.full(gx.size, depth))
        out.extend((i, int(c)) for c in cells)
    return out


# --------------------------------------------------------------- J11 bbox

def bbox_join(points: DataFrame, boxes_pdf: pd.DataFrame,
              point_id: str = "image_id", depth: int = COVER_DEPTH,
              qt_point: str = "qt_point",
              batch_threshold: int = 1_000) -> DataFrame:
    """(qid, point_id) pairs where the point lies in the query box
    (closed intervals, reference bbox.contains_point semantics).

    Cover: broadcast (cell, qid[, box]) expansion joined on the point's
    depth-``depth`` ancestor cell; refine: pure Column interval predicate.

    The driver-side cover expansion + forced broadcast is the
    small-box-set contract; at ``batch_threshold`` boxes and above it
    auto-dispatches to :func:`bbox_join_batch` (identical output), which
    emits cover cells executor-side and lets AQE pick the join strategy.
    """
    spark = points.sparkSession
    if len(boxes_pdf) >= batch_threshold:
        return bbox_join_batch(
            points, spark.createDataFrame(
                boxes_pdf[["qid", "minlon", "minlat", "maxlon", "maxlat"]]),
            point_id=point_id, depth=depth, qt_point=qt_point)
    cov = bbox_cover_cells(boxes_pdf.minlon.values, boxes_pdf.minlat.values,
                           boxes_pdf.maxlon.values, boxes_pdf.maxlat.values,
                           depth)
    # join on the COMPACT cell index (morton bits only — cover cells are at
    # fixed depth): raw qt keys near 2^62 defeat LongToUnsafeRowMap's dense
    # mode and slow the broadcast probe ~10x
    sh = 63 - 2 * depth
    cov_pdf = pd.DataFrame(
        [(int(boxes_pdf.qid.iloc[i]), c >> sh) for i, c in cov],
        columns=["qid", "cell_cov"],
    ).merge(boxes_pdf, on="qid")
    cov_df = spark.createDataFrame(cov_pdf)
    pts = points.withColumn(
        "cell_cov", F.shiftrightunsigned(F.col(qt_point), sh))
    return (
        pts.join(F.broadcast(cov_df), "cell_cov")
        .filter(
            (F.col("lon") >= F.col("minlon")) & (F.col("lon") <= F.col("maxlon"))
            & (F.col("lat") >= F.col("minlat")) & (F.col("lat") <= F.col("maxlat"))
        )
        .select("qid", point_id)
    )


def _cover_stream(frame: DataFrame, id_col: str, depth: int) -> DataFrame:
    """Executor-side cover expansion shared by the J11/J9 batch forms:
    (id, cell_cov, bbox bounds) rows, one per (query, covering cell),
    emitted from a mapInPandas over the query-side partitions.

    The id and bounds columns KEEP their input Spark types in the output
    schema — hardcoding ``long`` would silently truncate float bounds,
    making the batch refine diverge from the small form's comparison on
    the same input (e.g. ``minlon = 55.5`` excludes ``lon = 55`` in the
    small form but would include it after truncation)."""
    sh = 63 - 2 * depth  # compact cell index — see bbox_join
    dt = dict(frame.dtypes)
    bounds = ["minlon", "minlat", "maxlon", "maxlat"]
    schema = ", ".join([f"{id_col} {dt[id_col]}", "cell_cov long"]
                       + [f"{c} {dt[c]}" for c in bounds])

    def covers(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            cov = bbox_cover_cells(b.minlon.values, b.minlat.values,
                                   b.maxlon.values, b.maxlat.values, depth)
            idx = np.fromiter((i for i, _ in cov), np.int64, len(cov))
            cells = np.fromiter((c for _, c in cov), np.int64, len(cov))
            out = {id_col: b[id_col].values[idx],
                   "cell_cov": cells >> np.int64(sh)}
            for c in bounds:
                out[c] = b[c].values[idx]
            yield pd.DataFrame(out)

    return frame.select(id_col, *bounds).mapInPandas(covers, schema=schema)


def bbox_join_batch(points: DataFrame, boxes: DataFrame,
                    point_id: str = "image_id", depth: int = COVER_DEPTH,
                    qt_point: str = "qt_point") -> DataFrame:
    """J11 at batch scale: identical results to :func:`bbox_join`, but the
    box set is a DataFrame and the cover expansion runs executor-side
    (mapInPandas over box partitions — the same shape as
    :func:`knn_join_batch`'s ring stage), so 10^6+ boxes never touch the
    driver and nothing forces a broadcast: AQE picks broadcast vs
    shuffle from the cover stream's true size, and its skew-join split
    handles a hot cover cell (many boxes stacked over one cell).

    The box bounds ride along in the cover stream (a few extra fixed-width
    columns on ~4 rows/box), which keeps the plan a single equi-join +
    Column refine — no second join back to the box table.
    """
    sh = 63 - 2 * depth  # compact cell index — see bbox_join
    cov_df = _cover_stream(boxes, "qid", depth)
    pts = points.withColumn(
        "cell_cov", F.shiftrightunsigned(F.col(qt_point), sh))
    return (
        pts.join(cov_df, "cell_cov")
        .filter(
            (F.col("lon") >= F.col("minlon")) & (F.col("lon") <= F.col("maxlon"))
            & (F.col("lat") >= F.col("minlat")) & (F.col("lat") <= F.col("maxlat"))
        )
        .select("qid", point_id)
    )


# --------------------------------------------------------------- J9 PIP

def pip_join(points: DataFrame, polygons_pdf: pd.DataFrame,
             point_id: str = "image_id", depth: int = COVER_DEPTH,
             qt_point: str = "qt_point",
             batch_threshold: int = 1_000) -> DataFrame:
    """(poly_id, point_id) pairs with the point strictly inside the polygon
    (shapely-``contains``-style boundary exclusion; reference
    Poly.contains_point, src/readpbf.rs:761-763).

    Cover: polygon-bbox cells broadcast-joined on the point's cell, plus the
    bbox prefilter (reference check_box, F5).  Refine: vectorized
    ray-crossing kernel over candidates, grouped per polygon inside each
    Arrow batch; polygon vertices travel via broadcast, built once per
    executor.

    The driver-side cover expansion + whole-vertex-table broadcast is
    the small-region contract (a handful of admin polygons); at
    ``batch_threshold`` polygons and above it auto-dispatches to
    :func:`pip_join_batch` (identical output), which keeps both the
    cover stream and the vertex data distributed.  Threshold set at the
    measured crossover (BENCH/spatial_crossover.json: small/batch =
    1.22/1.25s at 10^3, 3.46/1.77s at 10^4).
    """
    spark = points.sparkSession
    if len(polygons_pdf) >= batch_threshold:
        return pip_join_batch(
            points, spark.createDataFrame(polygons_pdf[
                ["poly_id", "verts_lon", "verts_lat",
                 "minlon", "minlat", "maxlon", "maxlat"]]),
            point_id=point_id, depth=depth, qt_point=qt_point)
    polys = polygons_pdf.reset_index(drop=True)
    cov = bbox_cover_cells(polys.minlon.values, polys.minlat.values,
                           polys.maxlon.values, polys.maxlat.values, depth)
    sh = 63 - 2 * depth  # compact cell index — see bbox_join
    cov_pdf = pd.DataFrame(
        [(polys.poly_id.iloc[i], c >> sh,
          int(polys.minlon.iloc[i]), int(polys.minlat.iloc[i]),
          int(polys.maxlon.iloc[i]), int(polys.maxlat.iloc[i]))
         for i, c in cov],
        columns=["poly_id", "cell_cov", "minlon", "minlat",
                 "maxlon", "maxlat"],
    )
    cov_df = spark.createDataFrame(cov_pdf)
    verts = {
        r.poly_id: (np.asarray(r.verts_lon, np.float64),
                    np.asarray(r.verts_lat, np.float64))
        for r in polys.itertuples(index=False)
    }
    bc = spark.sparkContext.broadcast(verts)

    pts = points.withColumn(
        "cell_cov", F.shiftrightunsigned(F.col(qt_point), sh))
    cand = (
        pts.join(F.broadcast(cov_df), "cell_cov")
        .filter(
            (F.col("lon") >= F.col("minlon")) & (F.col("lon") <= F.col("maxlon"))
            & (F.col("lat") >= F.col("minlat")) & (F.col("lat") <= F.col("maxlat"))
        )
        .select("poly_id", point_id, "lon", "lat")
    )

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vmap = bc.value
        for b in batches:
            keep = np.zeros(len(b), dtype=bool)
            for pid, idx in b.groupby("poly_id").indices.items():
                vx, vy = vmap[pid]
                keep[idx] = K.points_in_polygon(
                    b["lon"].to_numpy(np.float64)[idx],
                    b["lat"].to_numpy(np.float64)[idx], vx, vy)
            yield b.loc[keep, ["poly_id", point_id]]

    id_type = dict(points.dtypes)[point_id]
    return cand.mapInPandas(
        refine, schema=f"poly_id string, {point_id} {id_type}")


def pip_join_batch(points: DataFrame, polygons: DataFrame,
                   point_id: str = "image_id", depth: int = COVER_DEPTH,
                   qt_point: str = "qt_point") -> DataFrame:
    """J9 at batch scale: identical results to :func:`pip_join`, but the
    polygon set is a DataFrame — 10^6 geofences never touch the driver.

    Shape: (1) cover cells + bbox bounds emitted executor-side from the
    polygon partitions (the :func:`bbox_join_batch` cover stage — verts
    are NOT carried, so the cover stream stays narrow); (2) one
    equi-join + bbox Column prefilter produces candidates; (3) the
    exact ray-crossing refine joins the vertex arrays onto the
    candidates (poly_id equi-join — AQE broadcasts the vertex table
    when it fits, else shuffles) and runs ONE mapInPandas over the
    joined stream, grouping by poly_id inside each Arrow batch — the
    small form's refine with verts read from columns instead of a
    driver-built broadcast dict.

    Measured alternative (BENCH/spatial_crossover.json history): a
    cogroup-applyInPandas refine (verts travel once per group, no
    duplication) invokes Python once PER POLYGON — per-group overhead
    made 10^4 small polygons 17.6s vs 3.1s for the driver-broadcast
    small form.  The join form duplicates each polygon's vertex arrays
    per candidate row inside the refine exchange, which is the right
    trade until polygons carry very large rings; vertex-heavy work
    belongs in the small form (broadcast dict, verts shipped once per
    executor).

    Contract note: the ``polygons`` plan is scanned twice (cover
    emission + verts join).  For polygons read straight from storage
    that is two cheap narrow scans; if the polygon set is derived from
    an expensive upstream computation, the CALLER should persist or
    checkpoint it first — this function does not cache its input.
    """
    sh = 63 - 2 * depth  # compact cell index — see bbox_join
    cov_df = _cover_stream(polygons, "poly_id", depth)
    pts = points.withColumn(
        "cell_cov", F.shiftrightunsigned(F.col(qt_point), sh))
    cand = (
        pts.join(cov_df, "cell_cov")
        .filter(
            (F.col("lon") >= F.col("minlon")) & (F.col("lon") <= F.col("maxlon"))
            & (F.col("lat") >= F.col("minlat")) & (F.col("lat") <= F.col("maxlat"))
        )
        .select("poly_id", point_id, "lon", "lat")
    )
    id_type = dict(points.dtypes)[point_id]
    withverts = cand.join(
        polygons.select("poly_id", "verts_lon", "verts_lat"), "poly_id")

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            keep = np.zeros(len(b), dtype=bool)
            lon = b["lon"].to_numpy(np.float64)
            lat = b["lat"].to_numpy(np.float64)
            for _pid, idx in b.groupby("poly_id").indices.items():
                vx = np.asarray(b["verts_lon"].iloc[idx[0]], np.float64)
                vy = np.asarray(b["verts_lat"].iloc[idx[0]], np.float64)
                keep[idx] = K.points_in_polygon(lon[idx], lat[idx], vx, vy)
            yield b.loc[keep, ["poly_id", point_id]]

    pid_type = dict(polygons.dtypes)["poly_id"]
    return withverts.mapInPandas(
        refine, schema=f"poly_id {pid_type}, {point_id} {id_type}")


# --------------------------------------------------------------- J10 kNN

def knn_join(points: DataFrame, queries_pdf: pd.DataFrame,
             point_id: str = "image_id", level: int | None = None,
             qt_point: str = "qt_point", max_rounds: int = 8,
             batch_threshold: int = 1000) -> DataFrame:
    """k nearest points per query: ring-expansion cover join + exact
    haversine re-rank (window), iterated until the k-th distance is within
    the ring guarantee radius.  Ties broken by ascending ``point_id``.

    Mercator cells are locally square, so a point outside the Chebyshev-r
    ring around the query's level-L cell is at least
    min(r * (2*pi*R / 2^L) * min(cos(lat)), R * asin(cos(lat_q) *
    sin(r * 2*pi / 2^L))) meters away — the per-round guarantee
    (meridional band term + exact zonal cross-track term; see
    :func:`knn_join_batch` for the derivation).
    Each round only re-runs unsatisfied queries with doubled r; the points
    side is probed via a broadcast (cell -> qid) expansion, so every round
    is one broadcast join + window over candidates, no cross join ever.

    The driver convergence loop materializes each round's top-k to decide
    which queries are satisfied — the right contract for a handful of
    queries (few rounds, tiny collects).  At ``batch_threshold`` queries
    and above it auto-dispatches to :func:`knn_join_batch`, the single-plan
    form with no driver materialization at all (identical output — pinned
    by tests and the shared driver gate).

    ``level=None`` picks the form's own default: 6 for the loop (coarse
    cells keep the doubling-ring convergence within ``max_rounds`` even
    for empty regions), 8 for the batch form (finer cells bound the
    candidate fan-out — the exact result is level-independent)."""
    from pyspark.sql.window import Window

    spark = points.sparkSession
    if len(queries_pdf) >= batch_threshold:
        kwargs = {} if level is None else {"level": level}
        return knn_join_batch(
            points, spark.createDataFrame(
                queries_pdf[["qid", "lon", "lat", "k"]]),
            point_id=point_id, qt_point=qt_point, **kwargs)
    if level is None:
        level = 6
    sh = 63 - 2 * level  # compact cell index — see bbox_join
    pts = points.withColumn(
        "cell_knn", F.shiftrightunsigned(F.col(qt_point), sh)).select(
        "cell_knn", point_id, "lon", "lat")

    remaining = queries_pdf.copy()
    results = []
    r = 1
    for _ in range(max_rounds):
        if len(remaining) == 0:
            break
        # ring cells for each remaining query (driver-side, queries small)
        qlon = remaining.lon.to_numpy(np.int64)
        qlat = remaining.lat.to_numpy(np.int64)
        n = np.int64(1) << np.int64(level)
        x, y = K.norm_xy(qlon, qlat)
        cx = np.clip(np.floor(x * n).astype(np.int64), 0, n - 1)
        cy = np.clip(np.floor(y * n).astype(np.int64), 0, n - 1)
        rows = []
        for i, q in enumerate(remaining.qid.tolist()):
            # x wraps at the antimeridian (haversine distance wraps too);
            # y is clipped (mercator domain is cut at +-85 deg, no data beyond)
            xs = np.unique(np.arange(cx[i] - r, cx[i] + r + 1) % int(n))
            ys = np.arange(max(0, cy[i] - r), min(int(n) - 1, cy[i] + r) + 1)
            gx, gy = np.meshgrid(xs, ys)
            cells = K.qt_from_cell(gx.ravel(), gy.ravel(),
                                   np.full(gx.size, level))
            rows.extend((int(q), int(c) >> sh) for c in cells)
        ring_df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["qid", "cell_knn"]))
        qdf = spark.createDataFrame(
            remaining.rename(columns={"lon": "qlon", "lat": "qlat"}))
        cand = (
            pts.join(F.broadcast(ring_df), "cell_knn")
            .join(F.broadcast(qdf), "qid")
            .withColumn("dist_m", Q.haversine_m(
                F.col("lon"), F.col("lat"), F.col("qlon"), F.col("qlat")))
        )
        w = Window.partitionBy("qid").orderBy(F.col("dist_m").asc(),
                                              F.col(point_id).asc())
        topk = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= F.col("k"))
            .select("qid", "rank", point_id, "dist_m", "k")
        )
        got = topk.toPandas()
        # guarantee: ring covers everything within r cells in every direction
        counts = got.groupby("qid").agg(found=("rank", "max"),
                                        kth=("dist_m", "max"))
        sat_ids = []
        for row in remaining.itertuples(index=False):
            g = counts.loc[row.qid] if row.qid in counts.index else None
            # widest |lat| the ring box reaches, for the min-cos bound
            iy = int(np.clip(np.floor(
                K.norm_xy(row.lon, row.lat)[1] * n), 0, int(n) - 1))
            y_edge = max(abs(2.0 * ((iy - r) / float(n)) - 1.0),
                         abs(2.0 * ((iy + r + 1) / float(n)) - 1.0))
            lat_edge = K.inv_merc_y(min(y_edge, 1.0))
            cos_e = np.cos(np.radians(min(abs(float(lat_edge)), 89.9)))
            # exclusion lower bound, exact in both axes (see
            # knn_join_batch): meridional r*C*cos_e plus the zonal
            # cross-track term R*asin(cos(lat_q)*sin(dlam)) — the
            # linear r*C*cos_e alone overestimates the zonal minimum
            # once the ring spans a sizable longitude arc
            r_earth = 6_371_000.0
            cos_q = np.cos(np.radians(row.lat / float(K.COORD_SCALE)))
            mer = r * (2 * np.pi * r_earth / float(n)) * cos_e
            zon = r_earth * np.arcsin(cos_q * np.sin(
                min(r * 2 * np.pi / float(n), np.pi / 2)))
            guarantee = min(mer, zon)
            if r >= int(n):  # ring covers the whole grid: take what exists
                sat_ids.append(row.qid)
            elif g is not None and g.found >= row.k and g.kth <= guarantee:
                sat_ids.append(row.qid)
        sat = got[got.qid.isin(sat_ids)]
        results.append(sat[["qid", "rank", point_id, "dist_m"]])
        remaining = remaining[~remaining.qid.isin(sat_ids)]
        r *= 2
    if len(remaining):
        raise RuntimeError(
            f"kNN did not converge for {len(remaining)} queries "
            f"within {max_rounds} rounds")
    out = pd.concat(results, ignore_index=True)
    return spark.createDataFrame(out)


def knn_join_batch(points: DataFrame, queries: DataFrame,
                   point_id: str = "image_id", level: int = 8,
                   qt_point: str = "qt_point") -> DataFrame:
    """J10 at batch scale: identical results to :func:`knn_join`, but ALL
    queries resolve in ONE plan — no driver convergence loop, no
    per-round materialization, queries as a DataFrame (10^5+ fine).

    Shape:
    1. one narrow aggregation builds the level-``level`` cell histogram
       (<= 4^level rows — plan-sized, driver-bounded by construction);
    2. a mapInPandas over the QUERY side (histogram shipped via a Spark
       broadcast variable) derives each query's ring radius from the
       density — the smallest Chebyshev radius whose cumulative ring
       count covers k (integral-image lookup, O(1) per probe), enlarged
       until the ring guarantee radius exceeds the candidate-distance
       bound (sqrt2 * (r_k+1) cells at equator scale >= any haversine
       distance inside the covering box) — and emits the ring cells
       executor-side;
    3. one equi-join points -> ring cells -> queries plus one window
       re-rank, exactly knn_join's refine.

    The guarantee that makes the single pass exact: the k points inside
    the radius-``r_k`` box are at most ``(r_k+1) * sqrt2 * C * cos_box``
    ground meters away (C = 2piR/2^level) — the ground length of the
    straight mercator segment is its planar length times ``C *
    cos(lat)`` integrated along it, and cos is maximized at the box edge
    nearest the equator (``cos_box``).  Every point OUTSIDE the
    Chebyshev-``r`` ring is at least ``min(r * C * cos(ring-edge lat),
    R * asin(cos(lat_q) * sin(r * 2pi/2^level)))`` away — the meridional
    term integrates cos over the ring's own latitude band; the zonal
    term is the exact cross-track distance from the query to the
    bounding meridian (the linear ``r * C * cos`` form overestimates it
    once the ring spans a sizable longitude arc, since ``asin(c sin x)
    <= c x``).  Any ``r`` whose exclusion bound reaches the candidate
    bound closes the search — per query, in one shot instead of
    knn_join's doubling rounds.  Scaling the candidate bound by
    ``cos_box`` (instead of the equatorial worst case ``cos_box = 1``)
    matters enormously at latitude: without it ``r`` inflates by
    ~1/cos(lat) — measured rf p99 of 17 vs 3 at |lat| <= 75 deg on the
    sf0.1 fixture, a ~30x candidate-volume difference
    (BENCH/knn_crossover.json).
    """
    from pyspark.sql.window import Window

    spark = points.sparkSession
    sh = 63 - 2 * level
    n = 1 << level
    pts = points.withColumn(
        "cell_knn", F.shiftrightunsigned(F.col(qt_point), sh)).select(
        "cell_knn", point_id, "lon", "lat")

    hist = (pts.groupBy("cell_knn").count().toPandas())
    grid = np.zeros((n, n), dtype=np.int64)
    # cell_knn is qt >>> sh; rebuild a valid level-`level` key (depth in
    # the low 5 bits) before decoding to grid coordinates
    hx, hy, _hd = K.qt_to_cell(
        (hist["cell_knn"].to_numpy(np.int64) << np.int64(sh))
        | np.int64(level))
    grid[hx, hy] = hist["count"].to_numpy(np.int64)
    # integral image over y per x-column + x prefix: ring sums in O(1),
    # with x wrapped modulo n (antimeridian) as <=2 interval lookups
    integ = np.zeros((n + 1, n + 1), dtype=np.int64)
    integ[1:, 1:] = grid.cumsum(0).cumsum(1)
    total = int(grid.sum())
    b_int = spark.sparkContext.broadcast(integ)

    def box_count(ig, cx, cy, r):
        y0, y1 = max(0, cy - r), min(n - 1, cy + r)
        x0, x1 = cx - r, cx + r
        if x1 - x0 + 1 >= n:
            xa = [(0, n - 1)]
        else:
            x0m, x1m = x0 % n, x1 % n
            xa = [(x0m, x1m)] if x0m <= x1m else [(x0m, n - 1), (0, x1m)]
        s = 0
        for a, b in xa:
            s += (ig[b + 1, y1 + 1] - ig[a, y1 + 1]
                  - ig[b + 1, y0] + ig[a, y0])
        return s

    def rings(batches):
        ig = b_int.value
        for qb in batches:
            qlon = qb["lon"].to_numpy(np.int64)
            qlat = qb["lat"].to_numpy(np.int64)
            ks = qb["k"].to_numpy(np.int64)
            x, y = K.norm_xy(qlon, qlat)
            cxs = np.clip(np.floor(x * n).astype(np.int64), 0, n - 1)
            cys = np.clip(np.floor(y * n).astype(np.int64), 0, n - 1)
            out_q, out_c = [], []
            for qid, cx, cy, k, qlat_deg in zip(
                    qb["qid"].tolist(), cxs, cys, ks,
                    qlat / float(K.COORD_SCALE)):
                cx, cy = int(cx), int(cy)
                if total < k:
                    rf = n  # take what exists: whole grid
                else:
                    rk = 0
                    while box_count(ig, cx, cy, rk) < k:
                        rk += 1
                    # candidate-distance bound, latitude-tight: cos is
                    # maximized at the rk-box edge nearest the equator
                    # (cos_box = 1 when the box straddles it)
                    e0 = 2.0 * (cy - rk) / n - 1.0
                    e1 = 2.0 * (cy + rk + 1) / n - 1.0
                    if e0 <= 0.0 <= e1:
                        cos_box = 1.0
                    else:
                        lat_box = K.inv_merc_y(min(abs(e0), abs(e1)))
                        cos_box = np.cos(np.radians(abs(float(lat_box))))
                    need = (rk + 1) * np.sqrt(2.0) * cos_box
                    cos_q = np.cos(np.radians(qlat_deg))
                    rf = max(1, int(np.ceil(need)))
                    while rf < n:
                        y_edge = max(abs(2.0 * ((cy - rf) / n) - 1.0),
                                     abs(2.0 * ((cy + rf + 1) / n) - 1.0))
                        lat_edge = K.inv_merc_y(min(y_edge, 1.0))
                        cos_e = np.cos(np.radians(
                            min(abs(float(lat_edge)), 89.9)))
                        # exclusion lower bound, exact in both axes:
                        # meridional rf*cos_e cells; zonal via the
                        # cross-track formula R*asin(cos(lat_q)*sin(dlam))
                        # — the linear rf*cos form OVERestimates the
                        # zonal minimum for rings spanning a sizable
                        # longitude arc (asin(c*sin x) <= c*x)
                        mer = rf * cos_e
                        zon = (n / (2.0 * np.pi)) * np.arcsin(
                            cos_q * np.sin(min(rf * 2.0 * np.pi / n,
                                               np.pi / 2.0)))
                        if min(mer, zon) >= need:
                            break
                        rf += 1
                rf = min(rf, n)
                xs = np.unique(np.arange(cx - rf, cx + rf + 1) % n)
                ys = np.arange(max(0, cy - rf), min(n - 1, cy + rf) + 1)
                gx, gy = np.meshgrid(xs, ys)
                cells = K.qt_from_cell(gx.ravel(), gy.ravel(),
                                       np.full(gx.size, level))
                out_q.extend([qid] * len(cells))
                out_c.extend((int(c) >> sh) for c in cells)
                if len(out_q) >= 200_000:
                    yield pd.DataFrame({"qid": out_q, "cell_knn": out_c})
                    out_q, out_c = [], []
            if out_q:
                yield pd.DataFrame({"qid": out_q, "cell_knn": out_c})

    # qid keeps its input type (hardcoding long would break string ids
    # and mismatch the join with qdf — same rationale as _cover_stream)
    ring_df = queries.select("qid", "lon", "lat", "k").mapInPandas(
        rings, schema=f"qid {dict(queries.dtypes)['qid']}, cell_knn long")
    qdf = queries.select("qid", F.col("lon").alias("qlon"),
                         F.col("lat").alias("qlat"), "k")
    cand = (
        pts.join(ring_df, "cell_knn")
        .join(qdf, "qid")
        .withColumn("dist_m", Q.haversine_m(
            F.col("lon"), F.col("lat"), F.col("qlon"), F.col("qlat")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("dist_m").asc(),
                                          F.col(point_id).asc())
    # Measured negative result (README perf rule 19): adding max(k) as a
    # LITERAL rank conjunct to trigger InferWindowGroupLimit made the
    # 10^5-query case ~1.4x WORSE (19.6-25.8s vs 14.3-14.8s, alternating
    # same-session A/B).  On this plan the window piggybacks on the
    # qid-join's existing hash partitioning, so there is no window
    # shuffle to shrink — WindowGroupLimitExec runs Final-mode only and
    # just inserts a non-codegen truncation pass between Sort and Window.
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select("qid", "rank", point_id, "dist_m")
    )


# --------------------------------------------------------------- J12 raster

def raster_vector_assign(df: DataFrame, raster_depth: int = 10,
                         cell_level: int = 7,
                         qt_col: str = "qt_point") -> DataFrame:
    """(qt_raster, cell) cover pairs present in the data: every raster tile
    at ``raster_depth`` mapped to its covering coarse cell at ``cell_level``
    (qt prefix algebra, reference round/is_parent src/elements.rs:38-40).
    Distinct over data — one narrow aggregation.
    """
    return (
        df.select(
            Q.qt_round(F.col(qt_col), raster_depth).alias("qt_raster"),
            Q.qt_round(F.col(qt_col), cell_level).alias("cell"),
        ).distinct()
    )


def raster_vector_hilbert(df: DataFrame, raster_depth: int = 10,
                          cell_level: int = 7,
                          qt_col: str = "qt_point") -> DataFrame:
    """Same pairs but with the vector cell as a Hilbert id (the physical
    coarse index): adds a vectorized kernel pass to re-encode."""
    from osmquadtree_rust_bindings_spark import cells as C

    pairs = raster_vector_assign(df, raster_depth, cell_level, qt_col)

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ix, iy, _d = K.qt_to_cell(b["cell"].to_numpy(np.int64))
            hil = (np.int64(cell_level) << np.int64(58)) | C.hilbert_d(
                ix, iy, cell_level)
            yield pd.DataFrame({"qt_raster": b["qt_raster"],
                                "cell_hilbert": hil})

    return pairs.mapInPandas(
        enc, schema="qt_raster long, cell_hilbert long")
