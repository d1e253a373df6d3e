"""J8 relation-geometry assembly: multipolygon ring stitching.

Reference: ComplicatedPolygon assembly (/root/reference/src/geometry.rs:
513-591) — a relation's member ways are stitched end-to-end into closed
rings, recording per-segment (orig_id, is_reversed); each ring carries a
signed area (src/geometry.rs:588,672).

Spark shape (SURVEY.md §2.3 J8): everything up to the per-relation walk is
declarative — explode members, join way refs, posexplode + join node
coords, re-collect ordered — so Catalyst owns the joins and their
parallelism; only the ring walk itself (a graph traversal, not expressible
in SQL) runs in a grouped applyInPandas kernel.  The group key is rel_id,
so the kernel sees one relation at a time: state is O(one relation), never
O(partition), and skewed giant relations are bounded by their own member
count.  The walk is deterministic (always extend with the smallest unused
way id, reverse when its far endpoint matches) so output is identical for
any partitioning, which the tests assert.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RING_SCHEMA = ("rel_id long, role string, ring_idx int, nways int, "
               "npts int, closed boolean, area2 long, min_way long, "
               "nreversed int")


def _stitch_role(segs: list[tuple[int, list[int], np.ndarray]]):
    """Greedy deterministic ring walk over one (relation, role) group.

    segs: [(way_id, node_ids, coords[n,2])] sorted by way_id.
    Returns [(way_ids, reversed_flags, ring_coords, closed)].
    """
    unused = {w: (ids, xy) for w, ids, xy in segs}
    rings = []
    while unused:
        w0 = min(unused)
        ids, xy = unused.pop(w0)
        ring_ids = list(ids)
        coords = [xy]
        ways, revs = [w0], [False]
        while ring_ids[0] != ring_ids[-1]:
            ext = None
            for w in sorted(unused):
                nids, nxy = unused[w]
                if nids[0] == ring_ids[-1]:
                    ext = (w, nids[1:], nxy[1:], False)
                elif nids[-1] == ring_ids[-1]:
                    ext = (w, nids[-2::-1], nxy[-2::-1], True)
                if ext is not None:
                    break
            if ext is None:
                break  # open ring: emit with closed=False
            w, nids, nxy, rev = ext
            unused.pop(w)
            ring_ids.extend(nids)
            coords.append(nxy)
            ways.append(w)
            revs.append(rev)
        rings.append((ways, revs, np.concatenate(coords),
                      ring_ids[0] == ring_ids[-1]))
    return rings


def _area2(xy: np.ndarray) -> int:
    """Twice the signed shoelace area, exact integer math.  Coordinates are
    shifted to the first vertex first so products stay well inside int64
    even at planet-scale 1e-7-degree units."""
    if len(xy) < 3:
        return 0
    x = (xy[:, 0] - xy[0, 0]).astype(object)
    y = (xy[:, 1] - xy[0, 1]).astype(object)
    return int(sum(x[i] * y[i + 1] - x[i + 1] * y[i]
                   for i in range(len(xy) - 1)))


def assemble_multipolygons(members: DataFrame, ways: DataFrame,
                           nodes: DataFrame) -> DataFrame:
    """members: (rel_id, way_id, role); ways: (way_id, refs array<long>);
    nodes: (node_id, lon, lat).  Output one row per stitched ring."""
    seg = (
        members.join(ways, "way_id")
        .select("rel_id", "role", "way_id",
                F.posexplode("refs").alias("pos", "node_id"))
        .join(nodes, "node_id")
        .groupBy("rel_id", "role", "way_id")
        .agg(F.sort_array(F.collect_list(
            F.struct("pos", "node_id", "lon", "lat"))).alias("pts"))
    )

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        rel_id = int(key[0])
        out = []
        for role in sorted(pdf.role.unique()):
            grp = pdf[pdf.role == role].sort_values("way_id")
            segs = []
            for r in grp.itertuples(index=False):
                ids = [int(p["node_id"]) for p in r.pts]
                xy = np.array([[int(p["lon"]), int(p["lat"])]
                               for p in r.pts], dtype=np.int64)
                segs.append((int(r.way_id), ids, xy))
            for ri, (ws, revs, xy, closed) in enumerate(_stitch_role(segs)):
                out.append((rel_id, role, ri, len(ws), len(xy), closed,
                            _area2(xy) if closed else 0, min(ws),
                            int(sum(revs))))
        return pd.DataFrame(out, columns=[
            "rel_id", "role", "ring_idx", "nways", "npts", "closed",
            "area2", "min_way", "nreversed"])

    return seg.groupBy("rel_id").applyInPandas(fn, schema=RING_SCHEMA)


# ------------------------------------------------------- synthetic fixture

def feature_bounds(nodes: DataFrame, feature_id: str = "way_id",
                   lon: str = "lon", lat: str = "lat") -> DataFrame:
    """X9 ``prep_bounds(transform)`` (reference src/geometry.rs:185-193):
    per-feature bbox over the positioned node stream — one partial-agg
    groupBy (min/max per coordinate), no arrays materialized.
    Output: (feature_id, minlon, minlat, maxlon, maxlat)."""
    return nodes.groupBy(feature_id).agg(
        F.min(lon).alias("minlon"), F.min(lat).alias("minlat"),
        F.max(lon).alias("maxlon"), F.max(lat).alias("maxlat"))


def make_multipolygon_fixture(num_rels: int):
    """Deterministic multipolygon corpus: per relation, one outer rectangle
    split into 4 boundary ways (some stored reversed) + one inner rectangle
    of 2 ways.  Returns (members, ways, nodes) pandas frames."""
    mem, ways, nodes = [], [], []
    nid = wid = 0

    def add_node(lon, lat):
        nonlocal nid
        nodes.append((nid, int(lon), int(lat)))
        nid += 1
        return nid - 1

    for r in range(num_rels):
        x0 = (r * 37 % 300 - 150) * 10_000_000
        y0 = (r * 53 % 140 - 70) * 10_000_000
        w = (2 + r % 5) * 10_000_000
        h = (1 + r % 3) * 10_000_000
        c = [add_node(x0, y0), add_node(x0 + w, y0),
             add_node(x0 + w, y0 + h), add_node(x0, y0 + h)]
        for s in range(4):
            a, b = c[s], c[(s + 1) % 4]
            seq = [a, b] if (r + s) % 3 != 0 else [b, a]  # some reversed
            ways.append((wid, list(seq)))
            mem.append((r, wid, "outer"))
            wid += 1
        # inner rectangle: two 3-point ways sharing both endpoints
        ix0, iy0 = x0 + w // 4, y0 + h // 4
        iw, ih = w // 2, h // 2
        i0 = add_node(ix0, iy0)
        i1 = add_node(ix0 + iw, iy0)
        i2 = add_node(ix0 + iw, iy0 + ih)
        i3 = add_node(ix0, iy0 + ih)
        ways.append((wid, [i0, i1, i2]))
        mem.append((r, wid, "inner"))
        wid += 1
        ways.append((wid, [i2, i3, i0] if r % 2 else [i0, i3, i2]))
        mem.append((r, wid, "inner"))
        wid += 1
    return (
        pd.DataFrame(mem, columns=["rel_id", "way_id", "role"]),
        pd.DataFrame(ways, columns=["way_id", "refs"]),
        pd.DataFrame(nodes, columns=["node_id", "lon", "lat"]),
    )
