"""EP1-parity CLI: argument surface, exit codes, and the end-to-end
medallion run with the injected synthetic transport."""

from __future__ import annotations

import glob

from forex_data_pipeline_spark.cli import main, synthetic_transport


def test_cli_runs_pipeline_end_to_end(spark, tmp_path):
    wh = str(tmp_path / "wh")
    rc = main(
        [
            "--date", "2026-01-02",
            "--lookback-days", "2",
            "--warehouse", wh,
        ]
    )
    assert rc == 0
    # bronze is hive-partitioned per the reference layout
    assert glob.glob(f"{wh}/bronze/eur_usd/year=2026/month=1/*.parquet")
    gold = spark.read.parquet(f"{wh}/gold")
    assert gold.count() > 0
    assert "unique_id" in gold.columns


def test_cli_unknown_transport_fails_fast(tmp_path):
    rc = main(
        ["--warehouse", str(tmp_path), "--transport", "nope"]
    )
    assert rc == 1


def test_synthetic_transport_is_deterministic():
    a = synthetic_transport("EUR/USD", "5min", "2026-01-02 00:00:00",
                            "2026-01-02 23:59:59", 800)
    b = synthetic_transport("EUR/USD", "5min", "2026-01-02 00:00:00",
                            "2026-01-02 23:59:59", 800)
    assert a.equals(b)
    assert (a["high"] >= a[["open", "close", "low"]].max(axis=1)).all()


def test_cli_multi_symbol_concurrent(spark, tmp_path):
    """Round 6: the multi-symbol form runs each symbol's medallion DAG
    through the threaded model runner under <warehouse>/<symbol>/ and
    produces the same gold a single-symbol run would."""
    wh = str(tmp_path / "wh_multi")
    rc = main(
        [
            "--symbol", "EUR/USD,GBP/USD",
            "--date", "2026-01-02",
            "--lookback-days", "1",
            "--warehouse", wh,
            "--threads", "4",
        ]
    )
    assert rc == 0
    solo = str(tmp_path / "wh_solo")
    assert main(
        [
            "--symbol", "GBP/USD",
            "--date", "2026-01-02",
            "--lookback-days", "1",
            "--warehouse", solo,
        ]
    ) == 0
    multi_gold = (
        spark.read.parquet(f"{wh}/gbp_usd/gold")
        .select("symbol", "timeframe", "candle_start", "close_value")
        .orderBy("timeframe", "candle_start")
        .toPandas()
    )
    solo_gold = (
        spark.read.parquet(f"{solo}/gold")
        .select("symbol", "timeframe", "candle_start", "close_value")
        .orderBy("timeframe", "candle_start")
        .toPandas()
    )
    assert multi_gold.equals(solo_gold)
    # both symbols materialized under their own roots
    assert glob.glob(f"{wh}/eur_usd/bronze/eur_usd/year=2026/month=1/*.parquet")
