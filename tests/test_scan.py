"""operators/scan.py distributed_ema: the two-level affine scan must
match the sequential recurrence to accumulation-order ulps, while no
single task ever holds a whole series."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from forex_data_pipeline_spark.operators.scan import distributed_ema
from forex_data_pipeline_spark.tables import load

ALPHA = 2.0 / 13.0


def _sequential_ema(values: list[float]) -> list[float]:
    out = []
    s = 0.0
    for i, x in enumerate(values):
        s = x if i == 0 else ALPHA * x + (1.0 - ALPHA) * s
        out.append(s)
    return out


@pytest.mark.parametrize("partitions", [2, 8])
def test_distributed_ema_matches_sequential(spark, sf_dir, partitions):
    ev = load(spark, sf_dir, "events").select("event_type", "ts", "value")
    got = (
        distributed_ema(
            ev, "event_type", "ts", "value", ALPHA, partitions=partitions
        )
        .orderBy("event_type", "ts")
        .toPandas()
    )
    ref = (
        ev.orderBy("event_type", "ts")
        .toPandas()
        .rename(columns={"event_type": "series"})
    )
    for series, grp in ref.groupby("series"):
        expected = _sequential_ema(grp["value"].tolist())
        actual = got[got["event_type"] == series]["ema"].tolist()
        assert len(actual) == len(expected)
        for a, e in zip(actual, expected):
            assert a == pytest.approx(e, rel=1e-9, abs=1e-12)


def test_distributed_ema_splits_series_across_tasks(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("event_type", "ts", "value")
    one_series = ev.filter(
        F.col("event_type")
        == ev.select("event_type").first()["event_type"]
    )
    # 8 chunks over ONE series: prove the operator parallelizes within
    # a single series — the exact case where the sequential kernel
    # collapses to one task.
    ranged = (
        one_series.select(
            F.col("event_type").alias("series"), "ts",
            F.col("value").cast("double").alias("x"),
        )
        .repartitionByRange(8, "series", "ts")
        .withColumn("pid", F.spark_partition_id())
    )
    n_chunks = ranged.select("pid").distinct().count()
    assert n_chunks > 1, "series not split across tasks"

    got = distributed_ema(
        one_series, "event_type", "ts", "value", ALPHA, partitions=8
    ).orderBy("ts").toPandas()
    expected = _sequential_ema(
        one_series.orderBy("ts").toPandas()["value"].tolist()
    )
    for a, e in zip(got["ema"].tolist(), expected):
        assert a == pytest.approx(e, rel=1e-9, abs=1e-12)
