"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship: calc_qts point-key assignment + depth-10 tile
               counts over derived points at sf0.001 (the reference's
               run_calcqts → sort_blocks chain, SURVEY.md §2.7/§3.3).
queries()    — one entry per implemented SURVEY.md §2 operator.
oracle_sql() — DuckDB twins (driver_oracles.py) for ALL 50 gates.  The
               one formerly engine-only op (a4_num_blocks) now emits
               layout-independent invariant booleans so its twin can
               hash-pin it (see driver_queries.q_a4_num_blocks).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    """Ship the package zip to executors before running (the harness's
    SparkSession may be built elsewhere with an arbitrary cwd, so python
    workers can't import our kernels without addPyFile)."""

    def g(spark: SparkSession, sf_dir: str) -> DataFrame:
        from osmquadtree_rust_bindings_spark.session import ensure_shipped

        ensure_shipped(spark)
        return fn(spark, sf_dir)

    g.__name__ = getattr(fn, "__name__", "query")
    return g


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from osmquadtree_rust_bindings_spark import driver_queries as DQ

    return _wrap(DQ.q_s14_tile_counts)(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from osmquadtree_rust_bindings_spark import driver_queries as DQ

    # EXACTLY 50 entries (the driver's correctness harness checks the
    # first 50 in dict order), ordered so the least-recently-verified
    # gates come first: the three that were rewritten/new in round 2 and
    # missed the round-2 window, then the round-1-only nine, then gates
    # new or merged this round, then the round-2-green remainder.
    # Related operators share merged gates (see driver_queries.py
    # "merged gates"): x10 cell+point+line, x11 point+line+poly, text
    # quality+langid+fingerprint, ann l2+cosine, x1+x8, x5+x1b, x7+x7b,
    # x14+x13, s11 image+audio+video.
    return {k: _wrap(v) for k, v in {
        # -- never driver-verified in current form (round-2 rewrites) --
        "dedup_embedding_cosine": DQ.q_dedup_embedding_cosine,
        "dedup_embedding_cosine_lsh": DQ.q_dedup_embedding_cosine_lsh,
        "ann_ivf_prebuilt": DQ.q_ann_ivf_prebuilt,
        # -- hash-exact in round 1 only (unchanged, outside r02 window) --
        "dedup_simhash": DQ.q_dedup_simhash,
        "ann_ivf_topk": DQ.q_ann_ivf_topk,
        "ann_lsh_bucket_hist": DQ.q_ann_lsh_bucket_hist,
        "ann_lsh_multiprobe": DQ.q_ann_lsh_multiprobe,
        # -- new or merged this round --
        "text_analysis": DQ.q_text_analysis,
        "ann_brute_topk": DQ.q_ann_brute_topk,
        "s2_header": DQ.q_s2_header,
        "j6b_rename_classes": DQ.q_j6b_rename_classes,
        "x10_geojson": DQ.q_x10_geojson_all,
        "x11_wkb": DQ.q_x11_wkb_all,
        "x1_point_qt": DQ.q_x1_point_qt_merc,
        "x5_tile_views": DQ.q_x5_tile_views,
        "x7_time_rollup": DQ.q_x7_time_rollup,
        "x14_enum_codecs": DQ.q_x14_enum_codecs,
        "s11_modalities": DQ.q_s11_modalities,
        # -- round-2-green, unchanged --
        "a1_count_fingerprint": DQ.q_a1_count_fingerprint,
        "a5_count_by_group": DQ.q_a5_count_by_group,
        "a2_refs_stats": DQ.q_a2_refs_stats,
        "a3_members_stats": DQ.q_a3_members_stats,
        "a4_num_blocks": DQ.q_a4_num_blocks,
        "x_qt_common_rollup": DQ.q_x_qt_common_rollup,
        "x9_feature_bounds": DQ.q_x9_feature_bounds,
        "j3_merge_latest": DQ.q_j3_merge_latest,
        "j5_apply_changes": DQ.q_j5_apply_changes,
        "j6_diff_summary": DQ.q_j6_diff_summary,
        "j1_semi_join_cascade": DQ.q_j1_semi_join_cascade,
        "j1b_exnodes": DQ.q_j1b_exnodes,
        "x2_bbox_qt_depth_hist": DQ.q_x2_bbox_qt_depth_hist,
        "x4_prefix_range_count": DQ.q_x4_prefix_range_count,
        "x16_style_attrs": DQ.q_x16_style_attrs,
        "j7_line_assembly": DQ.q_j7_line_assembly,
        "s12_filtered_merge": DQ.q_s12_filtered_merge,
        "f7_asof_read": DQ.q_f7_asof_read,
        "s28_stream_window": DQ.q_s28_stream_window,
        "s13_ordered_rank": DQ.q_s13_ordered_rank,
        "s14_tile_counts": DQ.q_s14_tile_counts,
        "a10_plan_invariants": DQ.q_a10_plan_invariants,
        "a11_assign_invariants": DQ.q_a11_assign_invariants,
        "j11_bbox_join": DQ.q_j11_bbox_join,
        "j9_pip_join": DQ.q_j9_pip_join,
        "j10_knn_join": DQ.q_j10_knn_join,
        "j12_raster_vector": DQ.q_j12_raster_vector,
        "j8_multipolygon_assembly": DQ.q_j8_multipolygon_assembly,
        "f8_idset_semi_join": DQ.q_f8_idset_semi_join,
        "dedup_exact": DQ.q_dedup_exact,
        "dedup_ngram_jaccard": DQ.q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": DQ.q_dedup_minhash_lsh,
    }.items()}


def oracle_sql() -> dict[str, str]:
    from osmquadtree_rust_bindings_spark import driver_oracles as DO

    return DO.oracle_sql()
