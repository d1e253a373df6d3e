"""Incremental ingest via Structured Streaming.

The reference is batch-only but incremental: base file + ordered change
files <= timestamp, with an osmosis replication cursor
(/root/reference/src/readpbf.rs:234-242) — i.e. stream offsets.  SURVEY.md
§2.8 maps that to snapshots + MERGE for parity; this module adds the
streaming-native form on top:

- ``stream_calcqts``: file-source stream -> qt/cell assignment (pure Column
  kernels are stateless, so they run unchanged in streaming) -> parquet
  sink.  Spark's streaming checkpoint IS the replication cursor: a
  restarted stream resumes exactly after the last committed file batch.
- ``stream_cdc_apply``: foreachBatch CDC merge of changetype rows into a
  catalog table (apply_change semantics, src/elements.rs:1022-1027).
- ``windowed_tile_counts``: event-time windowed per-tile counts with a
  watermark for late data (beyond-parity streaming aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osmquadtree_rust_bindings_spark.operators import calcqts as CQ


def stream_calcqts(spark: SparkSession, input_path: str, schema: str,
                   out_path: str, checkpoint: str):
    """Incremental calc_qts over a growing parquet directory.  Returns the
    StreamingQuery (availableNow: drains pending files then stops)."""
    src = (
        spark.readStream.schema(schema).format("parquet").load(input_path)
    )
    keyed = CQ.run_calcqts(src.drop("bytes"))
    return (
        keyed.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def windowed_tile_counts(stream_df: DataFrame, ts_col: str = "ts",
                         tile_depth: int = 10,
                         window: str = "10 minutes",
                         watermark: str = "30 minutes") -> DataFrame:
    """Event-time windowed counts per tile with late-data watermark."""
    from osmquadtree_rust_bindings_spark.functions import quadtree as Q

    return (
        stream_df.withWatermark(ts_col, watermark)
        .withColumn("tile", Q.qt_round(F.col("qt"), tile_depth))
        .groupBy(F.window(F.col(ts_col), window), F.col("tile"))
        .count()
    )


def stream_cdc_apply(spark: SparkSession, changes_path: str, schema: str,
                     catalog, table: str, key: list[str],
                     checkpoint: str):
    """foreachBatch CDC: each micro-batch of change rows is merged into the
    catalog table with apply_change semantics (delete/remove drop,
    create/modify replace)."""
    from osmquadtree_rust_bindings_spark.operators.diff import apply_changes

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if catalog.exists(table):
            base = catalog.read(batch_df.sparkSession, table)
        else:
            base = batch_df.limit(0)
        merged = apply_changes(base, batch_df, key)
        catalog.write(merged, table, mode="overwrite")

    src = spark.readStream.schema(schema).format("parquet").load(changes_path)
    return (
        src.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_first_seen(stream_df: DataFrame, key_col: str = "image_id",
                      group_col: str = "tile",
                      timeout_ms: int | None = None) -> DataFrame:
    """Cross-micro-batch first-seen dedup, stateful per tile group
    (applyInPandasWithState).  Emits each (group, key) the first time it is
    ever seen across the life of the stream; re-deliveries in later batches
    are suppressed by the per-group state.

    Scale shape: state is partitioned BY TILE (the same key the batch
    engine shuffles on), so each state partition holds one tile's id set —
    bounded by tile weight, which the A10 planner already caps at the group
    target.  Production would age state with a timeout (pass timeout_ms)
    or swap the exact id set for a Bloom filter; the operator contract is
    unchanged.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        seen = set(state.get[0]) if state.exists else set()
        out = []
        for pdf in pdfs:
            fresh = pdf.loc[~pdf[key_col].isin(seen), key_col]
            if len(fresh):
                uniq = fresh.drop_duplicates()
                seen.update(uniq)
                out.append(uniq)
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        state.update((sorted(seen),))
        ids = pd.concat(out) if out else pd.Series([], dtype=object)
        yield pd.DataFrame({group_col: key[0], key_col: ids})

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if timeout_ms is not None else GroupStateTimeout.NoTimeout)
    return stream_df.groupBy(group_col).applyInPandasWithState(
        fn,
        outputStructType=f"{group_col} long, {key_col} string",
        stateStructType="seen array<string>",
        outputMode="append",
        timeoutConf=timeout,
    )
