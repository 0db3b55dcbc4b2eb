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


# ---------------------------------------------------------------------------
# Round-6 distributed variants of the remaining sequential kernels
# ---------------------------------------------------------------------------


def _run_query(name, spark, sf_dir):
    from forex_data_pipeline_spark.catalog import REGISTRY

    return REGISTRY[name].fn(spark, sf_dir)


@pytest.mark.parametrize("partitions", [2, 8])
def test_distributed_heikin_ashi_matches_sequential(
    spark, sf_dir, partitions
):
    from forex_data_pipeline_spark.operators.scan import (
        distributed_heikin_ashi,
    )
    from forex_data_pipeline_spark.queries.indicators_q import _heikin_base

    seq = (
        _run_query("heikin_ashi", spark, sf_dir)
        .orderBy("event_type", "candle_start")
        .toPandas()
    )
    got = (
        distributed_heikin_ashi(
            _heikin_base(spark, sf_dir), partitions=partitions
        )
        .orderBy("event_type", "candle_start")
        .toPandas()
    )
    assert len(got) == len(seq)
    for col in ("ha_open", "ha_close", "ha_high", "ha_low"):
        for a, e in zip(got[col], seq[col]):
            assert a == pytest.approx(e, rel=1e-9, abs=1e-12), col


@pytest.mark.parametrize("partitions", [2, 8])
def test_distributed_clamped_balance_bit_identical(
    spark, sf_dir, partitions
):
    """Integer tropical scan: EXACT equality, not tolerance — the
    max-plus composition reassociates integer ops only."""
    from forex_data_pipeline_spark.operators.scan import (
        distributed_clamped_balance,
    )
    from forex_data_pipeline_spark.queries.indicators_q import (
        _balance_flows,
    )

    seq = (
        _run_query("clamped_running_balance", spark, sf_dir)
        .orderBy("user_id", "ts", "event_id")
        .toPandas()
    )
    got = (
        distributed_clamped_balance(
            _balance_flows(spark, sf_dir), partitions=partitions
        )
        .orderBy("user_id", "ts", "event_id")
        .toPandas()
    )
    assert len(got) == len(seq)
    assert got["balance"].tolist() == seq["balance"].tolist()
    assert got["event_id"].tolist() == seq["event_id"].tolist()


@pytest.mark.parametrize("partitions", [2, 8])
def test_distributed_supertrend_bit_identical(spark, sf_dir, partitions):
    """Chunk-chain iteration fixpoint == sequential kernel, bit for
    bit (same IEEE ops in the same order; only task placement moves).
    Sweeps must not exceed the theoretical max (n_chunks)."""
    from forex_data_pipeline_spark.operators.scan import (
        distributed_supertrend,
    )
    from forex_data_pipeline_spark.queries.indicators_q import (
        _supertrend_base,
    )

    seq = (
        _run_query("supertrend", spark, sf_dir)
        .orderBy("event_type", "candle_start")
        .toPandas()
    )
    got_df, sweeps = distributed_supertrend(
        _supertrend_base(spark, sf_dir), partitions=partitions
    )
    got = got_df.orderBy("event_type", "candle_start").toPandas()
    assert len(got) == len(seq)
    assert got["upper_band"].tolist() == seq["upper_band"].tolist()
    assert got["lower_band"].tolist() == seq["lower_band"].tolist()
    assert got["trend"].tolist() == seq["trend"].tolist()
    assert 1 <= sweeps <= partitions + 2


@pytest.mark.parametrize("partitions", [2, 8])
def test_distributed_parabolic_sar_bit_identical(
    spark, sf_dir, partitions
):
    from forex_data_pipeline_spark.operators.scan import (
        distributed_parabolic_sar,
    )
    from forex_data_pipeline_spark.queries.indicators_q import (
        _hourly_micro,
    )

    seq = (
        _run_query("parabolic_sar", spark, sf_dir)
        .orderBy("event_type", "candle_start")
        .toPandas()
    )
    got_df, sweeps = distributed_parabolic_sar(
        _hourly_micro(spark, sf_dir), partitions=partitions
    )
    got = got_df.orderBy("event_type", "candle_start").toPandas()
    assert len(got) == len(seq)
    assert got["psar"].tolist() == seq["psar"].tolist()
    assert got["trend"].tolist() == seq["trend"].tolist()
    assert 1 <= sweeps <= partitions + 2


def test_chain_scan_couples_fast_on_flippy_series(spark):
    """A synthetic series that flips trend every few bars must
    converge in a handful of sweeps even at aggressive chunking —
    the state-forgetting argument, measured."""
    from forex_data_pipeline_spark.operators.scan import (
        distributed_supertrend,
    )

    n = 400
    rows = []
    for i in range(n):
        # sawtooth close around 1.0 with wide bands crossing often
        c = 1000000 + (60000 if (i // 5) % 2 == 0 else -60000) + i % 5
        rows.append(
            (
                "s",
                pd.Timestamp("2024-01-01") + pd.Timedelta(hours=i),
                c,
                float(c + 20000),
                float(c - 20000),
            )
        )
    pdf = pd.DataFrame(
        rows, columns=["event_type", "candle_start", "c", "bu", "bl"]
    )
    base = spark.createDataFrame(pdf)
    got, sweeps = distributed_supertrend(base, partitions=16)
    assert got.count() == n
    assert sweeps <= 4, sweeps
