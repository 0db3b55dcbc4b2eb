"""Custom stateful streaming operator via ``transformWithStateInPandas``
— the Spark 4.x arbitrary-state API (successor to
``applyInPandasWithState``, SURVEY §2.10 "stateful op").

Same engine role as ``stateful.running_ema`` (O(1) state per series,
carried across micro-batches, checkpointed exactly-once) but on the new
StatefulProcessor surface, which adds typed state handles (value/list/
map), timers, and TTL — the API Spark is converging on for custom
operators. Implemented here: per-series running count/sum/mean, the
mergeable-moment pattern (same algebra as the batch
``stat_moments_corr`` query) so the state is a constant-size tuple no
matter how much history has streamed past.

Scale: state = one (n, total) pair per key in the state store; shuffle
is the groupBy key partitioning only; Python sees Arrow record batches
per key per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

try:  # pyspark >= 4.0
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
except ImportError:  # pragma: no cover - older pyspark
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = None  # type: ignore[assignment,misc]

OUTPUT_SCHEMA = (
    "event_type string, n_events bigint, total_value double, "
    "mean_value double"
)


def fold_stats(
    state: tuple[int, float], batches: Iterator[pd.DataFrame]
) -> tuple[int, float]:
    """Pure per-key state transition: fold one micro-batch's Arrow
    batches into the running (n, total) moment state. Factored out of
    the processor so the recurrence is unit-testable without a
    streaming query (the integration test needs protobuf, absent in
    this container — see tests/test_streaming.py's documented skip)."""
    n, total = state
    for pdf in batches:
        n += int(len(pdf))
        total += float(pdf["value"].sum())
    return n, total


def stats_output_row(key, n: int, total: float) -> pd.DataFrame:
    """Pure emit step: the one-row Update-mode output for a key."""
    return pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "mean_value": [total / n if n else None],
        }
    )


class RunningStatsProcessor(StatefulProcessor):
    """Per-key running (count, sum) → mean, folded across micro-batches."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._stats = handle.getValueState(
            "stats", "n bigint, total double"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        prev = self._stats.get() if self._stats.exists() else (0, 0.0)
        n, total = fold_stats((int(prev[0]), float(prev[1])), rows)
        self._stats.update((n, total))
        yield stats_output_row(key, n, total)

    def close(self) -> None:
        pass


def running_stats(ticks: DataFrame) -> DataFrame:
    """Attach the stateful processor to a (streaming) tick frame."""
    return ticks.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=RunningStatsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
