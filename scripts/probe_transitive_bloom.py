#!/usr/bin/env python
"""sf10 verification for bloom_pruned_contamination's core columns,
transitively through cross_corpus_contamination (which is DuckDB
sharded-checksum green at sf10): Bloom filters have no false
negatives, so (doc_id, n_shingles, n_contaminated, contamination_rate)
must be IDENTICAL between the pruned and unpruned queries; the two
audit columns (n_bloom_candidates, n_bloom_fp) additionally obey
n_contaminated <= n_bloom_candidates (soundness: every true hit
passes the filter). Engine-side anti-join — nothing corpus-sized
reaches the driver."""
import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from forex_data_pipeline_spark import catalog
from forex_data_pipeline_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/spark-warehouse/sf10"
spark = get_spark("bloom-sf10-transitive")
catalog._ensure_loaded()

bloom = catalog.REGISTRY["bloom_pruned_contamination"].fn(spark, SF)
cross = catalog.REGISTRY["cross_corpus_contamination"].fn(spark, SF)

core = ["doc_id", "n_shingles", "n_contaminated", "contamination_rate"]
b = bloom.select(*core, "n_bloom_candidates", "n_bloom_fp")
c = cross.select(*core)

n_b = b.count()
n_c = c.count()
# keyed per-column comparison (doc_id is unique in both outputs; a
# multiset exceptAll over a DOUBLE column proved unreliable here)
j = b.alias("b").join(c.alias("c"), "doc_id", "full")
mismatch = j.filter(
    F.col("b.n_shingles").isNull() | F.col("c.n_shingles").isNull()
    | (F.col("b.n_shingles") != F.col("c.n_shingles"))
    | (F.col("b.n_contaminated") != F.col("c.n_contaminated"))
    | (F.col("b.contamination_rate") != F.col("c.contamination_rate"))
).count()
unsound = b.filter(
    (F.col("n_contaminated") > F.col("n_bloom_candidates"))
    | (F.col("n_bloom_fp") < 0)
).count()
res = {
    "probe": "bloom sf10 transitive verification",
    "rows_bloom": n_b,
    "rows_cross": n_c,
    "core_col_mismatches": mismatch,
    "soundness_violations": unsound,
    "ok": n_b == n_c and mismatch == 0 and unsound == 0,
}
print(json.dumps(res))
assert res["ok"], res
