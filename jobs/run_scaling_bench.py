"""Two-parallelism scaling evidence (BASELINE.md measurement plan).

A real multi-executor cluster is unavailable in this sandbox; per the
driver's instruction the N -> 4N criterion is evidenced by running the SAME
job on the SAME input at local[8] and local[32].

Job = the metric pipeline: calc_qts tile assignment -> tile grouping +
repartition -> bbox join + PIP join; counts emitted tile assignments +
join output rows.  Reports rows/sec at both levels, efficiency =
(throughput_4N / throughput_N) / 4, and a determinism checksum that must
be identical at both levels.

Writes BENCH/scaling.json and BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_IMAGES = int(os.environ.get("SCALING_N", "400000"))
CORPUS = "/tmp/osmqt_bench/images"
LEVELS = (8, 32)


def run_job(spark) -> dict:
    from pyspark.sql import functions as F

    from osmquadtree_rust_bindings_spark.operators import calcqts as CQ
    from osmquadtree_rust_bindings_spark.operators import spatial_join as SJ
    from osmquadtree_rust_bindings_spark.operators import tiling as T
    from osmquadtree_rust_bindings_spark.sources import fixtures as FX

    images = spark.read.parquet(CORPUS)
    t0 = time.time()

    calc = CQ.run_calcqts(images).cache()
    n_assign = calc.count()

    cells = T.prepare_quadtree_tree(calc, "qt", 17)
    groups = T.find_tree_groups(cells, target=40_000)
    tiled = T.assign_tiles(calc, groups, salt_over=100_000)
    tile_checksum = tiled.agg(
        F.sum(F.col("tile") % 1_000_003).alias("s"),
        F.count(F.lit(1)).alias("n")).collect()[0]

    boxes = FX.make_bbox_queries_pdf(60)
    bbox_rows = SJ.bbox_join(calc, boxes).count()
    polys = FX.make_polygons_pdf(100)
    pip_rows = SJ.pip_join(calc, polys).count()

    wall = time.time() - t0
    calc.unpersist()
    metric_rows = n_assign + bbox_rows + pip_rows
    return {
        "wall_sec": round(wall, 2),
        "assignments": n_assign,
        "bbox_join_rows": bbox_rows,
        "pip_join_rows": pip_rows,
        "metric_rows": metric_rows,
        "rows_per_sec": round(metric_rows / wall, 1),
        "checksum": [int(tile_checksum["s"]), int(tile_checksum["n"])],
        "groups": len(groups),
    }


def main() -> None:
    from osmquadtree_rust_bindings_spark.session import get_spark
    from osmquadtree_rust_bindings_spark.sources import images as I

    results = {}
    # generate the corpus once (at the highest parallelism), reused by both
    spark = get_spark(f"local[{max(LEVELS)}]", app_name="osmqt-scaling-gen")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(CORPUS):
        I.write_images_table(spark, N_IMAGES, CORPUS)
    # warmup JIT/python workers so level-1 isn't penalized
    run_job(spark)
    spark.stop()

    for level in LEVELS:
        spark = get_spark(f"local[{level}]", shuffle_partitions=level,
                          app_name=f"osmqt-scaling-{level}")
        spark.sparkContext.setLogLevel("ERROR")
        results[level] = run_job(spark)
        spark.stop()

    n, n4 = LEVELS
    thr_n = results[n]["rows_per_sec"]
    thr_4n = results[n4]["rows_per_sec"]
    eff = (thr_4n / thr_n) / (n4 / n)
    same = results[n]["checksum"] == results[n4]["checksum"]

    os.makedirs("BENCH", exist_ok=True)
    payload = {
        "n_images": N_IMAGES,
        "levels": {str(k): v for k, v in results.items()},
        "throughput_n": thr_n,
        "throughput_4n": thr_4n,
        "scaling_efficiency": round(eff, 3),
        "deterministic": same,
    }
    with open("BENCH/scaling.json", "w") as f:
        json.dump(payload, f, indent=2)

    with open("BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — measured performance + scaling evidence

Job: calc_qts tile assignment -> tile grouping (target 40k, salted) ->
bbox join (60 boxes) + PIP join (100 polygons) over a {N_IMAGES:,}-row
synthetic image corpus (FIXTURES.md schema).  Metric = tile assignments +
join output rows per second, BASELINE.json north rule.

| parallelism | wall (s) | metric rows | rows/sec |
|---|---|---|---|
| local[{n}] (N) | {results[n]['wall_sec']} | {results[n]['metric_rows']:,} | {thr_n:,.0f} |
| local[{n4}] (4N) | {results[n4]['wall_sec']} | {results[n4]['metric_rows']:,} | {thr_4n:,.0f} |

**Scaling efficiency (N -> 4N): {eff:.3f}** (criterion: >= 0.8)

Determinism guard: tile-assignment checksum identical at both levels:
{same} ({results[n]['checksum']}).

Notes: single-machine substitute for two cluster sizes per the driver's
instruction; the job is shuffle-bound on repartition(tile) and
embarrassingly parallel in the kernels, so multi-executor scaling tracks
core scaling.
""")
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
