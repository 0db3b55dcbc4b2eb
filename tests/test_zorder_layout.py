"""Z-order layout: writing sortWithinPartitions(morton) must yield
parquet row groups whose min/max column statistics are tight on BOTH
interleaved dimensions — the physical property that lets any engine
skip row groups for 2-D predicates (the claim behind
q:`zorder_clustering_key`)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from forex_data_pipeline_spark.queries.relational import _morton16
from forex_data_pipeline_spark.tables import load


def _avg_rowgroup_span(path_glob: str, col: str) -> float:
    """Mean (max-min) range of `col` across all row groups (smaller =
    tighter stats = more skippable)."""
    spans, total = [], 0
    for f in glob.glob(path_glob):
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    spans.append(c.statistics.max - c.statistics.min)
                    total += 1
    assert spans, f"no stats found for {col} in {path_glob}"
    return sum(spans) / len(spans)


def test_zorder_sort_tightens_rowgroup_stats_on_both_dims(spark, sf_dir, tmp_path):
    li = (
        load(spark, sf_dir, "lineitem")
        .select(
            (F.col("l_partkey") % 256).alias("x"),
            (F.col("l_orderkey") % 256).alias("y"),
        )
    )
    morton = F.expr(_morton16("x", "y").replace("//", "div"))

    unsorted_dir = str(tmp_path / "plain")
    zorder_dir = str(tmp_path / "zorder")
    # tiny row groups so one file holds many groups to compare
    block = str(8 * 1024)
    (
        li.repartition(1)
        .write.mode("overwrite")
        .option("parquet.block.size", block)
        .parquet(unsorted_dir)
    )
    (
        li.repartition(1)
        .sortWithinPartitions(morton)
        .write.mode("overwrite")
        .option("parquet.block.size", block)
        .parquet(zorder_dir)
    )

    for col in ("x", "y"):
        plain = _avg_rowgroup_span(f"{unsorted_dir}/*.parquet", col)
        z = _avg_rowgroup_span(f"{zorder_dir}/*.parquet", col)
        # a z-ordered file must have materially tighter stats on BOTH
        # dimensions; an unsorted write spans ~the full 0..255 domain
        assert z < plain * 0.6, (col, z, plain)
