"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.10 "stateful op"): a per-series running EMA that survives
micro-batch boundaries.

The reference recomputes indicators over a 60-day tail each run
(/root/reference/models/marts/fct_eurusd_timeframes.sql:25-29,73-80)
because BigQuery has no cross-run state. A true streaming engine can
instead carry O(1) state per series: EMA (unlike SMA-50) folds into a
single (count, ema, last_ts) triple, so it IS watermark-free streamable
— this operator is the streaming-native indicator the batch post-pass
can't express incrementally.

Scale: state is one tiny tuple per key — size ∝ number of series,
independent of history length or event rate; Spark checkpoints it with
the query, giving exactly-once across restarts.

Ordering contract: rows are folded in (ts) order WITHIN each
micro-batch, and batches arrive in source order (file stream +
availableNow processes files in sequence) — same contract as any
event-time fold; out-of-order arrivals across batches should be handled
upstream (dedup/watermark), exactly like the reference's watermark
filter drops out-of-order ticks (stg_eurusd.sql:18-21).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "event_type string, n_events bigint, ema double, last_value double"
)
STATE_SCHEMA = "n bigint, ema double"


def _fold_ema(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    *,
    alpha: float,
) -> Iterator[pd.DataFrame]:
    n, ema = state.get if state.exists else (0, None)
    last = None
    for pdf in batches:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        for v in pdf["value"].to_numpy():
            ema = float(v) if ema is None else alpha * float(v) + (1 - alpha) * ema
            last = float(v)
            n += 1
    state.update((n, ema))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_events": [n],
            "ema": [ema],
            "last_value": [last],
        }
    )


def running_ema(stream: DataFrame, *, alpha: float = 0.1) -> DataFrame:
    """Attach the stateful EMA fold to a streaming DataFrame with
    columns (event_id, ts, event_type, value). Emits, per micro-batch
    and key, the updated running aggregate (output mode: update)."""

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        return _fold_ema(key, pdfs, state, alpha=alpha)

    return stream.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_ema(pdf: pd.DataFrame, *, alpha: float = 0.1) -> dict[str, Any]:
    """Reference fold for tests: same EMA over a fully-ordered pandas
    frame, keyed by event_type."""
    out: dict[str, Any] = {}
    for key, grp in pdf.sort_values(["ts", "event_id"]).groupby("event_type"):
        ema = None
        for v in grp["value"]:
            ema = float(v) if ema is None else alpha * float(v) + (1 - alpha) * ema
        out[key] = {"n_events": len(grp), "ema": ema}
    return out
