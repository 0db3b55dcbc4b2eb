#!/usr/bin/env python
"""Single-fat-series rehearsal for the distributed sequential-kernel
twins (SCALING.md companion): the regime the `operators/scan.py`
variants exist for is ONE dominant series that would serialize into a
single applyInPandas task. This script builds a deterministic N-row
series (default 5M minute bars — a decade of minutes), runs the
sequential whole-series kernel and the distributed twin, and reports
wall times plus the result agreement (ulp-tolerance for the float EMA
scan, EXACT equality for the integer tropical clamped-balance scan,
checked via the same order-independent checksum driver_sim uses).

Usage: python scripts/kernel_scale_bench.py [N]
Prints one JSON line. Foreground only (background shells are throttled).
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from forex_data_pipeline_spark.operators.scan import (  # noqa: E402
    distributed_clamped_balance,
    distributed_ema,
)
from forex_data_pipeline_spark.session import get_spark  # noqa: E402

ALPHA = 2.0 / 13.0  # EMA-12, the ewma_macd fast line


def _series(spark, n: int) -> DataFrame:
    # deterministic pseudo-price walk: x in [0, 1), minute timestamps.
    # xxhash64 is seed-stable across sessions; no RNG, no Date.now.
    return spark.range(n).select(
        F.lit("EURUSD").alias("series"),
        (
            F.lit("2016-01-01 00:00:00").cast("timestamp_ntz")
            + F.make_interval(mins=F.col("id"))
        ).alias("ts"),
        (
            F.pmod(F.xxhash64(F.col("id")), F.lit(100003)).cast("double")
            / F.lit(100003.0)
        ).alias("x"),
        F.col("id").alias("event_id"),
        # signed micro-unit flow for the clamped balance: mean-negative
        # so the floor clamp actually engages (balances hit 0 often)
        (F.pmod(F.xxhash64(F.col("id"), F.lit(7)), F.lit(2001)) - 1050)
        .cast("long")
        .alias("d"),
    )


def _seq_ema(df: DataFrame) -> DataFrame:
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        out, s = [], None
        for x in pdf["x"]:
            s = x if s is None else ALPHA * x + (1.0 - ALPHA) * s
            out.append(s)
        pdf["ema"] = out
        return pdf[["series", "ts", "x", "ema"]]

    return df.groupBy("series").applyInPandas(
        kernel, "series string, ts timestamp_ntz, x double, ema double"
    )


def _seq_clamped(df: DataFrame) -> DataFrame:
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        out, s = [], 0
        for d in pdf["d"].tolist():
            s = max(0, s + int(d))
            out.append(s)
        pdf["balance"] = [v / 1000000.0 for v in out]
        return pdf[["user_id", "ts", "event_id", "balance"]]

    return (
        df.withColumnRenamed("series", "user_id")
        .groupBy("user_id")
        .applyInPandas(
            kernel,
            "user_id string, ts timestamp_ntz, event_id long, "
            "balance double",
        )
    )


def _checksum(df: DataFrame, cols: list[str], decimals: int | None = None):
    """Order-independent (count, hash-sum); float cols are rounded to
    `decimals` first when a tolerance (not bit-identity) is asserted."""
    exprs = []
    for c in cols:
        e = F.col(c)
        if decimals is not None and dict(df.dtypes)[c] == "double":
            e = F.round(e, decimals)
        exprs.append(e.cast("string"))
    key = F.concat_ws("|", *exprs)
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.conv(F.substring(F.md5(key), 1, 13), 16, 10)
            .cast("decimal(38,0)")
        ).alias("hs"),
    ).collect()[0]
    return int(row["n"]), int(row["hs"])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    spark = get_spark("kernel-scale-bench")
    base = _series(spark, n).localCheckpoint(eager=True)  # exclude gen cost

    results: dict[str, dict] = {}

    # --- EMA: float affine scan, ulp-tolerance contract ---------------
    t0 = time.perf_counter()
    seq_n, _ = _checksum(_seq_ema(base), ["ts"])  # force full compute
    t_seq = time.perf_counter() - t0
    t0 = time.perf_counter()
    dist = distributed_ema(base, "series", "ts", "x", ALPHA)
    dist_n, _ = _checksum(dist, ["ts"])
    t_dist = time.perf_counter() - t0
    # agreement: max |Δ| via a 6-decimal rounded checksum on both —
    # cheap, order-independent, and far coarser than the proven ulp
    # bound, so a real divergence cannot hide
    cs_seq = _checksum(_seq_ema(base), ["ts", "ema"], decimals=6)
    cs_dist = _checksum(dist, ["ts", "ema"], decimals=6)
    results["ema"] = {
        "rows": n,
        "seq_sec": round(t_seq, 2),
        "dist_sec": round(t_dist, 2),
        "speedup": round(t_seq / t_dist, 2),
        "agree_1e-6": cs_seq == cs_dist and seq_n == dist_n == n,
    }

    # --- clamped balance: integer tropical scan, BIT-identical --------
    flows = base.select(
        F.col("series").alias("user_id"), "ts", "event_id", "d"
    )
    t0 = time.perf_counter()
    cs1 = _checksum(
        _seq_clamped(base.select("series", "ts", "event_id", "d")),
        ["ts", "event_id", "balance"],
    )
    t_seq = time.perf_counter() - t0
    t0 = time.perf_counter()
    cs2 = _checksum(
        distributed_clamped_balance(flows),
        ["ts", "event_id", "balance"],
    )
    t_dist = time.perf_counter() - t0
    results["clamped_balance"] = {
        "rows": n,
        "seq_sec": round(t_seq, 2),
        "dist_sec": round(t_dist, 2),
        "speedup": round(t_seq / t_dist, 2),
        "bit_identical": cs1 == cs2,
    }

    print(json.dumps({"metric": "fat-series kernel scale", "n": n,
                      "kernels": results}))


if __name__ == "__main__":
    main()
