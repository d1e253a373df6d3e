"""Count / CountChange aggregates and the idset semi-join cascade.

Reference: typed aggregate states Count/CountChange
(/root/reference/src/count.rs:18-52, 293-364, 372-477) — per-type counts,
min/max ids, timestamps, coordinate extents; ``call_count`` end-to-end scan
(src/count.rs:494-522).  In Spark these are one ``groupBy().agg()`` — the
reference's per-worker partial Count + merge IS Spark's partial/final agg.

Also J1 (``IdSetSet.add_block_box``, src/elements.rs:855-894): the 3-pass
spatial semi-join cascade (points in bbox -> containers referencing them ->
second-order containers), generalized here over any parent/child tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_fingerprint(df: DataFrame, group: list[str] | None = None,
                      id_col: str = "image_id", lon: str = "lon",
                      lat: str = "lat") -> DataFrame:
    """Count-style dataset fingerprint (A1): cheap pipeline checksum.

    Mirrors reference Count fields: num, min/max id, min/max lon/lat
    (src/count.rs:18-52); grouped variant = CountChange (A5,
    src/count.rs:372-477) when ``group`` is e.g. ['changetype'].
    """
    aggs = [
        F.count(F.lit(1)).alias("num"),
        F.min(id_col).alias("min_id"),
        F.max(id_col).alias("max_id"),
        F.min(lon).alias("min_lon"),
        F.max(lon).alias("max_lon"),
        F.min(lat).alias("min_lat"),
        F.max(lat).alias("max_lat"),
    ]
    if group:
        return df.groupBy(*group).agg(*aggs)
    return df.agg(*aggs)


def run_count(source, *, spark=None, filter_in=None,
              id_col: str = "image_id",
              lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Reference ``run_count`` convenience (__init__.py:97-98): one-call
    Count over a table.  ``source`` is a DataFrame or a parquet path
    (pass ``spark`` for paths); ``filter_in`` is an optional Column
    predicate (the reference's bbox/poly filter seam, F2/F3).  Returns
    the Count fingerprint DataFrame (print it to match the reference's
    stdout behavior)."""
    df = source
    if isinstance(source, str):
        if spark is None:
            raise ValueError("pass spark= when source is a path")
        df = spark.read.parquet(source)
    if filter_in is not None:
        df = df.filter(filter_in)
    return count_fingerprint(df, id_col=id_col, lon=lon, lat=lat)


def count_refs_stats(df: DataFrame, refs: str = "refs") -> DataFrame:
    """Way-style ref-array stats (A2, src/count.rs:125-161): total refs,
    longest array, global min/max ref."""
    return df.agg(
        F.count(F.lit(1)).alias("num"),
        F.sum(F.size(refs)).alias("num_refs"),
        F.max(F.size(refs)).alias("max_refs_len"),
        F.min(F.array_min(refs)).alias("min_ref"),
        F.max(F.array_max(refs)).alias("max_ref"),
    )


def count_members_stats(df: DataFrame, members: str = "members") -> DataFrame:
    """Relation-style member-array stats (A3, reference Count relation arm
    src/count.rs:217-250): total relations, total members, longest member
    list, and the number of empty relations — the third leg of the
    node/way/relation Count triple (A1/A2/A3)."""
    sz = F.size(members)
    return df.agg(
        F.count(F.lit(1)).alias("num"),
        F.sum(sz).alias("num_mems"),
        F.max(sz).alias("max_mems_len"),
        F.sum((sz == 0).cast("long")).alias("num_empties"),
    )


def num_blocks(df: DataFrame) -> DataFrame:
    """A4 num_blocks (reference header index block count,
    src/readpbf.rs:222-243): the number of physical scan partitions feeding
    this plan — Spark's analogue of the file's block count.  One narrow
    distinct over spark_partition_id, no data movement beyond the agg."""
    return (df.select(F.spark_partition_id().alias("pid")).distinct()
            .agg(F.count(F.lit(1)).alias("num_blocks")))


def semi_join_cascade(points: DataFrame, containers: DataFrame,
                      bbox: tuple[int, int, int, int],
                      point_id: str = "id", refs: str = "refs",
                      container_id: str = "id") -> dict[str, DataFrame]:
    """J1: the reference's bbox idset build as three DataFrame passes.

    1. point ids inside bbox (closed intervals, src/elements.rs:855-860)
    2. container ids referencing any selected point (left-semi on exploded
       refs) PLUS ``exnodes``: refs of selected containers that lie outside
       the bbox (completeness drag-in, src/elements.rs:873-876)
    3. caller can recurse for higher-order containers.

    Returns {'point_ids', 'container_ids', 'exnodes'} DataFrames.
    """
    x0, y0, x1, y1 = bbox
    pts_in = points.filter(
        (F.col("lon") >= x0) & (F.col("lon") <= x1)
        & (F.col("lat") >= y0) & (F.col("lat") <= y1)
    ).select(F.col(point_id).alias("pid"))

    exploded = containers.select(
        F.col(container_id).alias("cid"),
        F.explode(F.col(refs)).alias("pid"))
    cont_ids = (
        exploded.join(pts_in, "pid", "left_semi")
        .select("cid").distinct()
    )
    exnodes = (
        exploded.join(cont_ids, "cid", "left_semi")
        .select("pid").distinct()
        .join(pts_in, "pid", "left_anti")
    )
    return {"point_ids": pts_in.distinct(),
            "container_ids": cont_ids,
            "exnodes": exnodes}
