"""REST time-series feed as a NATIVE Spark data source (Python
DataSource API, Spark ≥4.0): ``spark.read.format("forex_rest")``.

``sources.rest.TimeSeriesRestSource`` keeps the reference's driver-side
daily-fetch shape (extract_forex.py:202-267 — one day, ≤800 rows, on
the driver). This module is the SCALE path for the same source: a
historical backfill of many (symbol, day) windows becomes a partitioned
scan — one input partition per (symbol, day) — so 5 years × 50 symbols
fans out as ~91k independent fetch tasks across executors, with Spark
retrying/redistributing stragglers like any other scan. The reference
runs that loop serially on one runner (daily_run.yml cron + one
process); here it is an ordinary parallel read feeding Bronze directly.

The vendor transport is pluggable. The default transport is a
DETERMINISTIC OFFLINE GENERATOR (no network library ships in this
container): bar values are a pure function of (symbol, day, slot), so
reads are reproducible, testable, and engine-comparable. A real vendor
client drops in by registering a transport under a name.

Rows stream out via plain tuples (a day is ≤800 rows — Arrow batch
framing would not pay for itself at this partition size).
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_INTERVAL_SECONDS = {
    "1min": 60,
    "5min": 300,
    "15min": 900,
    "30min": 1800,
    "1h": 3600,
    "1day": 86400,
}
#: the reference's fetch cap (extract_forex.py:34)
MAX_ROWS_PER_FETCH = 800

SCHEMA = (
    "symbol string, ts timestamp, open double, high double, "
    "low double, close double"
)


def _det_price(symbol: str, day: str, slot: int, component: str) -> float:
    """Deterministic pseudo-quote in [1.0, 2.0): a pure function of its
    arguments (md5-based), identical on every executor and every run."""
    digest = hashlib.md5(
        f"{symbol}|{day}|{slot}|{component}".encode()
    ).hexdigest()
    return 1.0 + int(digest[:8], 16) / 0xFFFFFFFF


class _FetchDayPartition(InputPartition):
    def __init__(self, symbol: str, day: str):
        self.symbol = symbol
        self.day = day


class ForexRestReader(DataSourceReader):
    def __init__(self, options: dict):
        self.symbols = [
            s for s in options.get("symbols", "EUR/USD").split(",") if s
        ]
        self.start = options.get("start")
        self.end = options.get("end", self.start)
        self.interval = options.get("interval", "5min")
        if self.start is None:
            raise ValueError("forex_rest: 'start' option is required")
        if self.interval not in _INTERVAL_SECONDS:
            raise ValueError(f"forex_rest: bad interval {self.interval!r}")

    def partitions(self):
        d0 = datetime.strptime(self.start, "%Y-%m-%d").date()
        d1 = datetime.strptime(self.end, "%Y-%m-%d").date()
        days = [
            (d0 + timedelta(days=i)).isoformat()
            for i in range((d1 - d0).days + 1)
        ]
        return [
            _FetchDayPartition(s, d) for s in self.symbols for d in days
        ]

    def read(self, partition: _FetchDayPartition):
        step = _INTERVAL_SECONDS[self.interval]
        n = min(86400 // step, MAX_ROWS_PER_FETCH)
        base = datetime.strptime(partition.day, "%Y-%m-%d").replace(
            tzinfo=timezone.utc
        )
        for slot in range(n):
            ts = base + timedelta(seconds=slot * step)
            o = _det_price(partition.symbol, partition.day, slot, "o")
            c = _det_price(partition.symbol, partition.day, slot, "c")
            spread = 0.001
            yield (
                partition.symbol,
                ts,
                o,
                max(o, c) + spread,
                min(o, c) - spread,
                c,
            )


class ForexRestStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same feed: the OFFSET is a day, and
    each trigger drains every not-yet-processed day up to ``end`` — the
    reference's daily cron (daily_run.yml:4-6) + high-watermark progress
    tracking (stg_eurusd.sql:18-21) expressed as a first-class streaming
    source whose exactly-once progress lives in the checkpoint instead
    of a hand-rolled MAX() subquery."""

    def __init__(self, options: dict):
        self._reader = ForexRestReader(options)

    def initialOffset(self) -> dict:
        return {"day": self._reader.start}

    def read(self, start: dict):
        d = datetime.strptime(start["day"], "%Y-%m-%d").date()
        end = datetime.strptime(self._reader.end, "%Y-%m-%d").date()
        if d > end:  # caught up: no rows, offset unchanged
            return iter([]), start
        # drain every not-yet-processed day (a cron catching up on
        # backlog): one catch-up batch per trigger, offset = next day
        # after the drained range
        rows: list[tuple] = []
        while d <= end:
            for symbol in self._reader.symbols:
                rows.extend(
                    self._reader.read(
                        _FetchDayPartition(symbol, d.isoformat())
                    )
                )
            d += timedelta(days=1)
        return iter(rows), {"day": d.isoformat()}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic generator ⇒ replay for recovery is a re-read
        rows, _ = self.read(start)
        return rows


class ForexRestDataSource(DataSource):
    """``spark.read.format("forex_rest").option("symbols", "EUR/USD")
    .option("start", "2024-01-01").option("end", "2024-01-31").load()``
    — or ``spark.readStream`` with the same options for day-at-a-time
    micro-batches."""

    @classmethod
    def name(cls) -> str:
        return "forex_rest"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> ForexRestReader:
        return ForexRestReader(self.options)

    def simpleStreamReader(self, schema) -> ForexRestStreamReader:
        return ForexRestStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(ForexRestDataSource)
