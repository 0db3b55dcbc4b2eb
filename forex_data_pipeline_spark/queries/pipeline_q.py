"""Driver-visible pipeline queries: the full silver→gold medallion
transform and the incremental MERGE writer, each hash-checked against a
DuckDB re-implementation (SURVEY §5 'pipeline-level golden test').

``events`` stands in for the tick stream: event_type ≙ symbol,
value ≙ close price.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..operators.candles import REFERENCE_TIMEFRAMES, multi_timeframe_ohlc
from ..operators.dedup import keyed_latest
from ..operators.indicators import sma_sql, with_indicators
from ..sources.writers import merge_upsert
from ..tables import load
from .timeseries import _bucket_sql


def _gold_branches() -> str:
    branches = []
    for tf in REFERENCE_TIMEFRAMES:
        branches.append(
            f"""
        SELECT symbol, '{tf.name}' AS timeframe,
               {_bucket_sql('observed_at', tf.seconds, tf.shift_seconds)}
                   AS candle_start,
               arg_min(close_price, observed_at) AS open_value,
               max(close_price) AS high_value,
               min(close_price) AS low_value,
               arg_max(close_price, observed_at) AS close_value,
               count(*) AS n_ticks
        FROM silver GROUP BY 1, 2, 3"""
        )
    return "\nUNION ALL\n".join(branches)


@register(
    "medallion_gold",
    oracle=f"""
    WITH silver AS (
        SELECT event_type AS symbol, ts AS observed_at, value AS close_price
        FROM events
        QUALIFY row_number() OVER (
            PARTITION BY event_type, ts ORDER BY event_id DESC) = 1
    ),
    candles AS ({_gold_branches()}),
    ind AS (
        SELECT *,
               close_value - lag(close_value) OVER w AS price_diff,
               {sma_sql('close_value', 20, 'w')} AS sma_20,
               {sma_sql('close_value', 50, 'w')} AS sma_50
        FROM candles
        WINDOW w AS (PARTITION BY symbol, timeframe ORDER BY candle_start)
    )
    SELECT md5(concat_ws('|', symbol, timeframe,
                         CAST(candle_start AS VARCHAR))) AS unique_id,
           symbol, timeframe, candle_start, open_value, high_value,
           low_value, close_value, n_ticks, price_diff, sma_20, sma_50
    FROM ind
    """,
    doc="The reference's whole silver→gold pipeline in one plan "
    "(stg_eurusd.sql:14-42 + fct_eurusd_timeframes.sql:15-86): typed "
    "dedup, 7-timeframe candles, indicators, md5 surrogate key — vs a "
    "full DuckDB re-implementation. Audit timestamps excluded "
    "(volatile, SURVEY §7 hard-part 6).",
    tags=("pipeline", "timeseries", "flagship"),
)
def medallion_gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    silver = keyed_latest(
        ev.select(
            F.col("event_type").alias("symbol"),
            F.col("ts").alias("observed_at"),
            F.col("value").alias("close_price"),
            "event_id",
        ),
        ["symbol", "observed_at"],
        [F.col("event_id").desc()],
    ).drop("event_id")
    candles = multi_timeframe_ohlc(
        silver, "observed_at", "close_price", ["symbol"]
    )
    ind = with_indicators(
        candles, ["symbol", "timeframe"], "candle_start", "close_value"
    )
    return ind.select(
        F.md5(
            F.concat_ws(
                "|", "symbol", "timeframe",
                F.col("candle_start").cast("string"),
            )
        ).alias("unique_id"),
        "symbol", "timeframe", "candle_start", "open_value", "high_value",
        "low_value", "close_value", "n_ticks", "price_diff", "sma_20",
        "sma_50",
    )


@register(
    "incremental_merge",
    oracle="SELECT event_id, ts, event_type, value FROM events",
    doc="S9 MERGE upsert driven end-to-end: three overlapping batches "
    "upserted into a parquet table must reconstruct exactly the full "
    "keyed table — no duplicates, no losses (stg_eurusd.sql:2-11 "
    "semantics without BigQuery).",
    tags=("pipeline", "incremental"),
)
def incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    path = f"{tempfile.mkdtemp(prefix='fx_merge_')}/t"
    batches = [
        ev.filter(F.col("ts") < F.lit("2024-01-15")),
        # deliberate overlaps: re-delivered rows must upsert, not dup
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-12")) & (F.col("ts") < F.lit("2024-01-24"))
        ),
        ev.filter(F.col("ts") >= F.lit("2024-01-22")),
    ]
    for b in batches:
        merge_upsert(spark, path, b, ["event_id"])
    return spark.read.parquet(path)
