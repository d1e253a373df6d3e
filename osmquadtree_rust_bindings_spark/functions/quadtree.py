"""JVM-side Column implementations of the quadtree kernels.

Everything here is pure Column algebra (whole-stage-codegen friendly, zero
Python in the hot path).  Semantics are pinned by the numpy oracle in
``kernels.py`` and the shared SQL fragments in ``sqlgen.py``; tests assert
bit-exact agreement between all three.

Reference semantics: Quadtree ops src/elements.rs:29-65; calc_qts
src/sortblocks.rs:7-21 (see SURVEY.md §2.7/§8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osmquadtree_rust_bindings_spark.functions import sqlgen
from osmquadtree_rust_bindings_spark.functions.sqlgen import (
    BUF_DEN,
    MAX_DEPTH,
    UNITS,
    _SPREAD_STEPS,
)


def _spread_col(c: Column) -> Column:
    """Bit spread as ONE Column expression.  Each step references its child
    twice, so the tree holds 2^5 copies of ``c`` — only pass an attribute
    reference; for computed inputs use :func:`_with_spread_steps` (chained
    projections) or whole-stage codegen emits 32 copies of the input code
    and the fused method blows janino's 64 KB limit (silent interpreted
    fallback, measured ~20x slower)."""
    for shift, mask in _SPREAD_STEPS:
        c = (c.bitwiseOR(F.shiftleft(c, shift))).bitwiseAND(F.lit(mask))
    return c


def _with_spread_steps(df: DataFrame, cols: list[str]) -> DataFrame:
    """Apply the 5 spread steps to ``cols`` in place as 5 chained
    projections.  Each step's expression references its input twice and is
    non-cheap, so CollapseProject keeps the projections separate and every
    step is code-generated exactly once per column."""
    for shift, mask in _SPREAD_STEPS:
        df = df.withColumns({
            c: (F.col(c).bitwiseOR(F.shiftleft(F.col(c), shift)))
            .bitwiseAND(F.lit(mask))
            for c in cols
        })
    return df


def x_norm(lon: Column) -> Column:
    return (lon / 10000000.0 + 180.0) / 360.0


def y_norm(lat: Column) -> Column:
    pi = 3.141592653589793
    return (
        F.log(F.tan(F.lit(pi / 4) + (lat / 10000000.0) * (pi / 180) / 2)) / pi
        + 1.0
    ) / 2.0


def grid_index(norm: Column, depth: int) -> Column:
    n = 1 << depth
    return F.least(
        F.greatest(F.floor(norm * float(n)).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )


def qt_from_cells(ix: Column, iy: Column, depth: int) -> Column:
    morton = F.shiftleft(_spread_col(ix), 1).bitwiseOR(_spread_col(iy))
    return F.shiftleft(morton, 63 - 2 * depth).bitwiseOR(F.lit(depth))


def qt_depth(qt: Column) -> Column:
    return qt.bitwiseAND(F.lit(31))


def qt_round(qt: Column, nd: int) -> Column:
    """Truncate to depth nd; assumes depth(qt) >= nd (true for calc_qts
    outputs at fixed depth; general case uses the expr in sqlgen)."""
    mask = -(1 << (63 - 2 * nd)) if nd > 0 else 0
    return qt.bitwiseAND(F.lit(mask)).bitwiseOR(F.lit(nd))


def qt_round_dyn(qt: Column, nd: Column) -> Column:
    """round() with per-row depth via a dynamic shift:
    ``(qt & (-1L << (63 - 2*eff))) | eff`` — matches kernels.qt_round for
    every depth incl. the EMPTY sentinel (-1 has depth bits 31; the shift-1
    mask OR 31 reproduces -1).  A literal-mask CASE chain here would inline
    the ``qt`` argument once per branch — catastrophic when ``qt`` is itself
    the unrolled calc_qts expression (measured 20x slowdown uncached)."""
    eff = F.least(nd, qt.bitwiseAND(F.lit(31)))
    mask = F.call_function(
        "shiftleft", F.lit(-1).cast("long"),
        (F.lit(63) - F.lit(2) * eff).cast("int"))
    return qt.bitwiseAND(mask).bitwiseOR(eff.cast("long"))


def qt_is_parent(parent: Column, child: Column) -> Column:
    pd = parent.bitwiseAND(F.lit(31))
    return (child.bitwiseAND(F.lit(31)) >= pd) & (
        qt_round_dyn(child, pd) == parent
    )


def qt_key_range_pred(qt_col: Column, prefix_qt: int) -> Column:
    """Pruning predicate: qt_col is prefix_qt or a descendant — a contiguous
    i64 range, so it pushes down to parquet/Iceberg min-max stats."""
    lo, hi = sqlgen.qt_key_range(prefix_qt)
    return qt_col.between(lo, hi)


def with_point_qt(df: DataFrame, lon: str, lat: str,
                  depth: int = MAX_DEPTH, out: str = "qt") -> DataFrame:
    """Append the point calc_qts key — pure Column math, no UDF."""
    df = df.withColumns({
        "__sx": grid_index(x_norm(F.col(lon)), depth),
        "__sy": grid_index(y_norm(F.col(lat)), depth),
    })
    df = _with_spread_steps(df, ["__sx", "__sy"])
    morton = F.shiftleft(F.col("__sx"), 1).bitwiseOR(F.col("__sy"))
    return df.withColumn(
        out, F.shiftleft(morton, 63 - 2 * depth).bitwiseOR(F.lit(depth))
    ).drop("__sx", "__sy")


def units(norm: Column) -> Column:
    return F.least(
        F.greatest(F.floor(norm * float(UNITS)).cast("long"), F.lit(0)),
        F.lit(UNITS - 1),
    )


def with_bbox_qt(df: DataFrame, minlon: str, minlat: str, maxlon: str,
                 maxlat: str, max_depth: int = MAX_DEPTH,
                 out: str = "qt") -> DataFrame:
    """Buffered-bbox calc_qts, unrolled integer descent as Column algebra.

    Same integer semantics as kernels.calcqts_bbox: descend from the root
    while the 0.05-buffer-expanded child cell of the box midpoint still
    contains the whole box.  18 unrolled levels of bit math stay inside
    whole-stage codegen — no shuffle, no Python worker.
    """
    df = df.withColumns({
        "__x0": units(x_norm(F.col(minlon))),
        "__x1": units(x_norm(F.col(maxlon))),
        "__y0": units(y_norm(F.col(minlat))),
        "__y1": units(y_norm(F.col(maxlat))),
    }).withColumns({
        "__mx": F.shiftright(F.col("__x0") + F.col("__x1"), 1),
        "__my": F.shiftright(F.col("__y0") + F.col("__y1"), 1),
    })
    mx, my = F.col("__mx"), F.col("__my")
    x0, x1, y0, y1 = (F.col(c) for c in ("__x0", "__x1", "__y0", "__y1"))
    # The buffered cells containing the (fixed) midpoint are nested across
    # depths, so the per-level containment test is monotone: cond_{k+1}
    # implies cond_k.  The descent therefore collapses to a SUM of
    # independent per-level predicates — linear-size expression, stays in
    # whole-stage codegen (a chained when/otherwise recurrence blows the
    # janino 64KB method limit and silently falls back to interpreted mode).
    depth = F.lit(0)
    for k in range(max_depth):
        s = UNITS >> (k + 1)
        b = s // BUF_DEN
        ox = F.floor(mx / s).cast("long") * s
        oy = F.floor(my / s).cast("long") * s
        ok = (
            (x0 >= ox - b) & (x1 <= ox + (s + b))
            & (y0 >= oy - b) & (y1 <= oy + (s + b))
        )
        depth = depth + ok.cast("int")
    # The midpoint's depth-d cell is an ancestor of its max-depth cell, so
    # the final key is round(qt_maxdepth(midpoint), depth): the morton
    # spread runs ONCE on the max-depth cell index (as chained projections)
    # instead of on a dynamic floor(mx / (UNITS >> depth)).
    s18 = UNITS >> max_depth
    df = df.withColumns({
        "__sbx": F.floor(mx / s18).cast("long"),
        "__sby": F.floor(my / s18).cast("long"),
        "__fd": depth,
    })
    df = _with_spread_steps(df, ["__sbx", "__sby"])
    qt_full = F.shiftleft(
        F.shiftleft(F.col("__sbx"), 1).bitwiseOR(F.col("__sby")),
        63 - 2 * max_depth).bitwiseOR(F.lit(max_depth))
    df = df.withColumn("__qtf", qt_full)
    # round(__qtf, __fd) with a dynamic shift (SQL shiftleft takes a column
    # count) — __fd is referenced 2x, still linear overall.
    qt = F.expr(
        f"(__qtf & (-1L << (63 - 2 * __fd))) | __fd"
        if max_depth > 0 else "__fd")
    return df.withColumn(out, qt).drop(
        "__x0", "__x1", "__y0", "__y1", "__mx", "__my", "__fd", "__qtf",
        "__sbx", "__sby",
    )


def haversine_m(lon1: Column, lat1: Column, lon2: Column, lat2: Column,
                radius: float = 6_371_000.0) -> Column:
    """Great-circle meters between int 1e-7 deg points — Column math."""
    k = 3.141592653589793 / 180 / 10000000.0
    la1, la2 = lat1 * k, lat2 * k
    dlat = (lat2 - lat1) * k / 2
    dlon = (lon2 - lon1) * k / 2
    a = F.sin(dlat) ** 2 + F.cos(la1) * F.cos(la2) * F.sin(dlon) ** 2
    return F.lit(2 * radius) * F.asin(F.sqrt(F.least(a, F.lit(1.0))))
