"""Staged, checkpoint-resumable pipeline orchestrator.

The full reference lifecycle (SURVEY.md §3) as named, independently
resumable stages:

  calcqts   run_calcqts: lon/lat + bbox/point qt + coarse cell
  tileplan  prepare_quadtree_tree + find_tree_groups (driver-side plan,
            persisted as a tiny parquet so resume reuses the exact plan)
  tiled     assign_tiles + repartition-by-tile write (sort_blocks S14)
  counts    per-tile Count fingerprint (the pipeline checksum, §5.2)

Each stage goes through Lineage.run_stage: skipped when already complete
for the run_id, per-partition rows/bytes recorded, half-written outputs
re-run.  A killed job resumes mid-pipeline by re-invoking with the same
run_id and workdir.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osmquadtree_rust_bindings_spark.checkpoint import Lineage
from osmquadtree_rust_bindings_spark.operators import calcqts as CQ
from osmquadtree_rust_bindings_spark.operators import count as CNT
from osmquadtree_rust_bindings_spark.operators import tiling as T


class TilingPipeline:
    def __init__(self, spark: SparkSession, workdir: str,
                 run_id: str | None = None, group_target: int = T.GROUP_TARGET,
                 group_depth: int = 17, salt_over: int | None = None,
                 use_broadcast: bool = True):
        self.spark = spark
        self.lineage = Lineage(workdir, run_id)
        self.group_target = group_target
        self.group_depth = group_depth
        self.salt_over = salt_over
        # broadcast-join assignment (zero Python in the hot path — the
        # measured scale path); the pandas longest-prefix kernel remains
        # as the fallback for qt domains with no cell histogram
        self.use_broadcast = use_broadcast

    def run(self, images: DataFrame) -> dict[str, DataFrame]:
        spark = self.spark
        lin = self.lineage

        calc = lin.run_stage(
            spark, "calcqts",
            lambda: CQ.run_calcqts(
                images.drop("bytes") if "bytes" in images.columns
                else images))

        def plan() -> DataFrame:
            depth = min(self.group_depth,
                        T.choose_plan_depth(calc, "qt"))
            cells = T.prepare_quadtree_tree(calc, "qt", depth)
            groups = T.find_tree_groups(cells, target=self.group_target)
            # persist the planning depth with the plan so a resumed run
            # reuses the exact same assignment domain
            groups["plan_depth"] = depth
            return spark.createDataFrame(
                groups.astype({"tile": np.int64, "weight": np.int64,
                               "plan_depth": np.int64}))

        plan_df = lin.run_stage(spark, "tileplan", plan)
        plan_pdf = plan_df.toPandas().astype(
            {"tile": np.int64, "weight": np.int64})
        groups_pdf = plan_pdf[["tile", "weight"]]
        if "plan_depth" in plan_pdf.columns and len(plan_pdf):
            plan_depth = int(plan_pdf["plan_depth"].astype(np.int64).iloc[0])
        else:
            # resumed plan written by an older version (no persisted
            # depth), or an empty corpus: re-derive deterministically
            plan_depth = min(self.group_depth,
                             T.choose_plan_depth(calc, "qt"))

        def assign() -> DataFrame:
            if not self.use_broadcast:
                return T.assign_tiles(calc, groups_pdf,
                                      salt_over=self.salt_over)
            # the cell domain is bounded (choose_plan_depth keeps it under
            # max_cells), so rebuilding it is one narrow agg; assignment
            # is then a broadcast equi-join on the compacted cell key
            cells = T.prepare_quadtree_tree(calc, "qt", plan_depth)
            return T.assign_tiles_broadcast(calc, cells, groups_pdf,
                                            plan_depth,
                                            salt_over=self.salt_over)

        tiled = lin.run_stage(spark, "tiled", assign)

        counts = lin.run_stage(
            spark, "counts",
            lambda: CNT.count_fingerprint(
                tiled, group=["tile"], id_col="image_id")
            .orderBy("tile"))

        return {"calcqts": calc, "tileplan": plan_df,
                "tiled": tiled, "counts": counts}
