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
