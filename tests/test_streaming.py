"""Streaming-specific tests beyond the oracle parity check (which lives
in test_correctness via the registered streaming_candles_5m query)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from forex_data_pipeline_spark.streaming.candles_stream import (
    streaming_dedup,
)


def test_streaming_dedup_drops_in_stream_duplicates(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ticks = pd.DataFrame(
        {
            "k": [1, 1, 2, 3, 3, 3],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00"] * 2
                + ["2024-01-01 00:01:00"]
                + ["2024-01-01 00:02:00"] * 3
            ),
            "v": [10, 10, 20, 30, 30, 30],
        }
    )
    sdf = spark.createDataFrame(ticks).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    sdf.write.parquet(str(src / "batch"))

    stream = spark.readStream.schema(sdf.schema).parquet(str(src / "batch"))
    deduped = streaming_dedup(stream, ["k"], "ts")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("dedup_t").toPandas().sort_values("k").reset_index(drop=True)
    assert got.k.tolist() == [1, 2, 3]
    assert got.v.tolist() == [10, 20, 30]
