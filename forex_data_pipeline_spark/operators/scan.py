"""Distributed prefix scan for linear recurrences — the scale path past
the sequential-kernel ceiling.

The per-series ``applyInPandas`` kernels (queries/indicators_q.py: EMA,
MACD, …) are bit-exact but serialize each series into ONE task — with
few, long series the longest history bounds wall-clock (the measured
ceiling documented in PLANS.md). A first-order linear recurrence

    s_t = m_t · s_{t-1} + b_t          (EMA: m = 1-α, b = α·x_t)

is a composition of affine maps, and affine composition is associative:
(m₂,b₂)∘(m₁,b₁) = (m₂m₁, m₂b₁+b₂). That makes the classic two-level
scan (Blelloch) legal:

1. range-repartition rows by (series, time) → each chunk holds a
   contiguous slice of a series (a partition may hold many series;
   a series may span many partitions — nothing sequential anywhere);
2. local pass per (series, chunk): left-to-right compose, emitting for
   every row the local affine (Aᵗ, Cᵗ) with s_t = Aᵗ·s_in + Cᵗ, plus
   the chunk summary (its last row's affine);
3. carry pass per series over chunk SUMMARIES only (n_chunks rows,
   ~n/chunk_size — a tiny sequential scan);
4. broadcast-join carries back: s_t = Aᵗ·carry + Cᵗ.

Numerics: the composed floating-point result differs from the strictly
sequential evaluation by accumulation-order ulps (that is WHY the
oracle-checked queries keep the sequential kernel — hash oracles need
bit-identity). This operator is for the cluster regime where a series
no longer fits one task; tests bound the relative error vs the
sequential result (≤1e-9 for EMA's contraction maps).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PID = "__scan_pid"


def distributed_ema(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    x_col: str,
    alpha: float,
    partitions: int | None = None,
) -> DataFrame:
    """EMA per series (s_1 = x_1, s_t = α·x_t + (1-α)·s_{t-1}) with no
    single task ever holding a whole series. Returns
    (series, ts, x, ema)."""
    sc = df.sparkSession.sparkContext
    p = partitions or sc.defaultParallelism
    m = 1.0 - alpha

    ranged = (
        df.select(
            F.col(series_col).alias("series"),
            F.col(ts_col).alias("ts"),
            F.col(x_col).cast("double").alias("x"),
        )
        .repartitionByRange(p, "series", "ts")
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin chunk assignment across jobs
    )

    def local_scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        a_acc, c_acc = 1.0, 0.0
        A, C = [], []
        for x in pdf["x"]:
            # compose (m, alpha*x) after (a_acc, c_acc)
            a_acc, c_acc = m * a_acc, m * c_acc + alpha * x
            A.append(a_acc)
            C.append(c_acc)
        pdf["A"] = A
        pdf["C"] = C
        return pdf

    local = ranged.groupBy("series", _PID).applyInPandas(
        local_scan,
        f"series string, ts timestamp_ntz, x double, {_PID} int, "
        "A double, C double",
    ).localCheckpoint(eager=True)

    # chunk summaries: the LAST row's affine per (series, chunk), plus
    # the chunk's first x (the series' first chunk seeds s_0 = x_1, the
    # same init convention as the sequential kernels: s_1 = x_1 up to
    # one-ulp in α·x+(1-α)·x)
    summaries = local.groupBy("series", _PID).agg(
        F.max_by("A", "ts").alias("M"),
        F.max_by("C", "ts").alias("B"),
        F.min_by("x", "ts").alias("x0"),
    )

    def carry_scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(_PID).reset_index(drop=True)
        carries = []
        s_in = float(pdf["x0"].iloc[0])
        for _, row in pdf.iterrows():
            carries.append(s_in)
            s_in = row["M"] * s_in + row["B"]
        pdf["carry"] = carries
        return pdf

    carries = summaries.groupBy("series").applyInPandas(
        carry_scan,
        f"series string, {_PID} int, M double, B double, x0 double, "
        "carry double",
    ).select("series", _PID, "carry")

    out = local.join(F.broadcast(carries), ["series", _PID]).select(
        F.col("series").alias(series_col),
        F.col("ts").alias(ts_col),
        F.col("x").alias(x_col),
        (F.col("A") * F.col("carry") + F.col("C")).alias("ema"),
    )
    return out
