"""Static guard (SURVEY.md §7 risk 6): no per-row Python, no RDDs, and
driver-side materialization only where the data is plan-sized by design.
"""

import os
import re

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "osmquadtree_rust_bindings_spark")

# file -> allowed count of driver-side materializations (each is a
# plan/metrics-sized dataset, documented at the call site)
DRIVER_SIDE_ALLOWED = {
    "plans/pipeline.py": 1,      # tile-group plan (O(groups))
    "operators/spatial_join.py": 2,  # kNN remaining-query set (O(queries))
                                     # + batch-kNN cell hist (O(4^level))
    "operators/similarity.py": 1,    # near-dup broadcast matrix (bounded side)
    "operators/tiling.py": 2,    # depth-choice agg row + cell histogram
    "checkpoint.py": 1,          # lineage rows (O(partitions))
    "driver_queries.py": 1,      # s2_header bbox agg (one metadata row)
}


def _sources():
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                yield os.path.relpath(full, PKG), open(full).read()


def test_no_rdd_api():
    for rel, src in _sources():
        assert ".rdd" not in src, f"{rel} uses the RDD API"


def test_no_row_at_a_time_udf():
    # pandas_udf / mapInPandas / applyInPandas are the only UDF surfaces
    pat = re.compile(r"(?<!pandas_)\budf\(")
    for rel, src in _sources():
        assert not pat.search(src), f"{rel} declares a row-at-a-time udf"


def test_driver_side_materialization_is_bounded():
    pat = re.compile(r"\.collect\(\)|\.toPandas\(\)")
    for rel, src in _sources():
        n = len(pat.findall(src))
        allowed = DRIVER_SIDE_ALLOWED.get(rel, 0)
        assert n <= allowed, (
            f"{rel}: {n} driver-side materializations (allowed {allowed}) — "
            "big-path operators must stay distributed")
