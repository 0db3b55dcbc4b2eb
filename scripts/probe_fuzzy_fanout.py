#!/usr/bin/env python
"""Engine-side sf10 verification for fuzzy_name_pairs: the DuckDB
oracle (125-block quadratic levenshtein, ~9e9 pairs at sf10) is
infeasible, so the check is decomposition-independence — the C=1
single-task-per-block branch and a forced C=5 chunk-pair fan-out must
produce the identical final aggregate. Also times both."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from forex_data_pipeline_spark import catalog
from forex_data_pipeline_spark.queries import relational
from forex_data_pipeline_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/spark-warehouse/sf10"

spark = get_spark("fuzzy-fanout-sf10")
catalog._ensure_loaded()
fn = catalog.REGISTRY["fuzzy_name_pairs"].fn

t0 = time.perf_counter()
single = {tuple(r) for r in fn(spark, SF).collect()}
t_single = time.perf_counter() - t0

relational._FZ_CHUNK_ROWS = 300_000  # 1.5M cust -> C=5 -> 15 groups/block
t0 = time.perf_counter()
fanned = {tuple(r) for r in fn(spark, SF).collect()}
t_fanout = time.perf_counter() - t0

assert fanned == single, f"DIVERGED: {len(single ^ fanned)} rows differ"
print(json.dumps({
    "probe": "fuzzy_name_pairs sf10 fan-out equality",
    "rows": len(single),
    "t_single_C1_sec": round(t_single, 1),
    "t_fanout_C5_sec": round(t_fanout, 1),
    "equal": True,
}))
