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
                 group_depth: int = 17, salt_over: int | None = None):
        self.spark = spark
        self.lineage = Lineage(workdir, run_id)
        self.group_target = group_target
        self.group_depth = group_depth
        self.salt_over = salt_over

    def run(self, images: DataFrame) -> dict[str, DataFrame]:
        spark = self.spark
        lin = self.lineage

        calc = lin.run_stage(
            spark, "calcqts",
            lambda: CQ.run_calcqts(images.drop("bytes")))

        def plan() -> DataFrame:
            depth = min(self.group_depth,
                        T.choose_plan_depth(calc, "qt"))
            cells = T.prepare_quadtree_tree(calc, "qt", depth)
            groups = T.find_tree_groups(cells, target=self.group_target)
            return spark.createDataFrame(
                groups.astype({"tile": np.int64, "weight": np.int64}))

        plan_df = lin.run_stage(spark, "tileplan", plan)
        groups_pdf = plan_df.toPandas().astype(
            {"tile": np.int64, "weight": np.int64})

        tiled = lin.run_stage(
            spark, "tiled",
            lambda: T.assign_tiles(calc, groups_pdf,
                                   salt_over=self.salt_over))

        counts = lin.run_stage(
            spark, "counts",
            lambda: CNT.count_fingerprint(
                tiled, group=["tile"], id_col="image_id")
            .orderBy("tile"))

        return {"calcqts": calc, "tileplan": plan_df,
                "tiled": tiled, "counts": counts}
