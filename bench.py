"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "rows_per_sec": ...}

Each query is forced end-to-end with a noop sink (count() alone would let
Catalyst prune the computed columns).  rows_per_sec is the BASELINE.md
metric numerator: tile assignments + join output rows per second.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# per-operator names kept stable across rounds for comparability — some
# are merged gates in queries() now, so bench resolves them from
# driver_queries directly (q_<name>), falling back to the gate registry.
# Two names therefore differ from their CORRECTNESS gate keys on purpose:
#   ann_l2_topk  -> gate ann_brute_topk (gate merged L2+cosine; bench
#                   times the per-operator q_ann_l2_topk)
#   text_quality -> gate text_analysis (gate merged quality+langid+
#                   fingerprint+tokens; bench times q_text_quality)
HEADLINE = [
    "x1_point_qt",          # tile assignments (calc_qts point keys)
    "x2_bbox_qt_depth_hist",  # bbox calc_qts
    "s14_tile_counts",      # tiling aggregation
    "j11_bbox_join",        # spatial joins (join rows)
    "j9_pip_join",
    "j10_knn_join",         # r04+: times the BATCH form (gate switched per
                            # round-3 review) — pays the density-histogram
                            # scan at 10 queries by design (README perf
                            # rules 17-18; crossover ~10^3 queries, 10^6
                            # rung in BENCH/knn_crossover.json)
    "j12_raster_vector",
    "j1_semi_join_cascade",
    "j6_diff_summary",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "ann_l2_topk",
    "ann_ivf_topk",
    "text_quality",
]
# queries whose output rows count toward the assignments+join-rows metric
METRIC_ROWS = {"x1_point_qt", "j11_bbox_join", "j9_pip_join",
               "j10_knn_join", "j12_raster_vector", "j1_semi_join_cascade"}


def force(df, need_rows: bool) -> int:
    """Force one full evaluation; row count only where the metric needs it
    (count() via a cheap agg on the already-executing plan, not a re-run)."""
    if need_rows:
        return df.count()
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from osmquadtree_rust_bindings_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(f"local[{cpus}]", app_name="osmquadtree-bench",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    from osmquadtree_rust_bindings_spark import driver_queries as DQ
    from osmquadtree_rust_bindings_spark.session import ensure_shipped

    ensure_shipped(spark)
    gate_qs = entrymod.queries()
    # r04: the j11/j9 gates merged in their batch twins (small+batch
    # union, both driver-verified) — bench keeps timing the SMALL form
    # alone so these series stay comparable across rounds
    overrides = {"j11_bbox_join": DQ.q_j11_bbox_small,
                 "j9_pip_join": DQ.q_j9_pip_small}
    qs = {name: overrides.get(name) or getattr(DQ, f"q_{name}", None)
          or gate_qs[name] for name in HEADLINE}

    # warmup at the smallest sf: JIT, python workers, broadcast machinery.
    # Every headline query runs once at sf0.001 so the measured pass below
    # reflects steady-state throughput (the number that extrapolates to a
    # long-running cluster job), not one-time plan/codegen/worker costs.
    for name in HEADLINE:
        qs[name](spark, "/root/testdata/sf0.001").write \
            .format("noop").mode("overwrite").save()

    per_query: dict[str, float] = {}
    metric_rows = 0
    t_all = time.time()
    for name in HEADLINE:
        t0 = time.time()
        n = force(qs[name](spark, sf_dir), name in METRIC_ROWS)
        per_query[name] = round(time.time() - t0, 3)
        metric_rows += n
    total = round(time.time() - t_all, 3)

    # Second measured pass: single-shot numbers on this box vary +-25%
    # with ambient load and first-at-this-sf plan/broadcast costs (the
    # sf0.001 warmup warms code paths, not sf-specific state).  `value`
    # stays the FIRST pass so the series is methodology-comparable with
    # earlier rounds; `steady_*` report the repeat, the number that
    # extrapolates to a long-running cluster job.
    spark.catalog.clearCache()  # no first-pass cache reuse: the repeat
    # must pay the same materializations the first pass did
    steady: dict[str, float] = {}
    t_all2 = time.time()
    for name in HEADLINE:
        t0 = time.time()
        force(qs[name](spark, sf_dir), name in METRIC_ROWS)
        steady[name] = round(time.time() - t0, 3)
    steady_total = round(time.time() - t_all2, 3)

    # Third measured pass + per-query minima: this round's box shows
    # intermittent multi-second kernel-side stalls (vmstat sys ~90% with
    # 3-7% steal, threads piled in futex_do_wait — host lock-holder
    # preemption amplified through the 32-thread JVM; GC log exonerated:
    # max pause 32ms during a 27s stall) on identical code and outputs.
    # `best_*` = per-query min across the three measured passes — the
    # noise floor that tracks CODE, not ambient, and the right series to
    # read when first/steady disagree by >2x (see BENCH/BASELINE.md
    # "Ambient noise characterization").
    spark.catalog.clearCache()
    third: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        force(qs[name](spark, sf_dir), name in METRIC_ROWS)
        third[name] = round(time.time() - t0, 3)
    best = {name: min(per_query[name], steady[name], third[name])
            for name in HEADLINE}
    best_total = round(sum(best.values()), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline suite wall time (tile assignment + spatial "
                  "joins + dedup + ann) at sf",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "rows_per_sec": round(metric_rows / total, 1),
        "metric_rows": metric_rows,
        "cpus": int(cpus),
        "steady_value": steady_total,
        "steady_queries": steady,
        "steady_rows_per_sec": round(metric_rows / steady_total, 1),
        "best_value": best_total,
        "best_queries": best,
        "best_rows_per_sec": round(metric_rows / best_total, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
