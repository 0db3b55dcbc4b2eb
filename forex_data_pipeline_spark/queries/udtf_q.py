"""Python UDTF surface (Spark ≥3.5 user-defined table functions):
one row in → many rows out as a LATERAL-joinable table function.

The engine's declarative chunker (``sequence_chunking``) is the scale
path — pure Catalyst, no Python in the loop. This module exercises the
UDTF API itself (the reference has no UDFs at all — SURVEY §2.11 — so
this is north-star surface): a context-window chunker as a table
function, lateral-joined against ``documents`` with correlated
arguments. Each eval call is one document; chunk arithmetic is pure
Python but deterministic, so the query still carries a full DuckDB
oracle.

Scale note: a UDTF runs row-at-a-time Python — fine for control-plane
fan-outs (this one emits ≤ a few dozen rows per doc), wrong for bulk
math; the Pandas-UDF / mapInPandas kernels and Catalyst expressions in
the rest of the engine own the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from ..catalog import register
from ..functions.text import tokens_sql
from ..tables import register_views

CHUNK = 16

_TOK_CTE = f"SELECT doc_id, {tokens_sql('text')} AS toks FROM documents"


@udtf(returnType="chunk_idx bigint, chunk_text string")
class ChunkDocUdtf:
    """Split a whitespace-tokenized document into CHUNK-token windows
    (same tokenizer as functions.text.tokens: trim + split on \\s+)."""

    def eval(self, text: str):  # noqa: A002 - UDTF signature
        toks = text.strip().split() if text is not None else []
        for i in range(0, len(toks), CHUNK):
            yield i // CHUNK, " ".join(toks[i : i + CHUNK])


@register(
    "udtf_chunk_documents",
    oracle=f"""
    WITH t AS (SELECT doc_id, toks FROM ({_TOK_CTE}) WHERE doc_id < 40)
    SELECT doc_id, CAST(g - 1 AS BIGINT) AS chunk_idx,
           array_to_string(toks[(g - 1) * {CHUNK} + 1
                                : (g - 1) * {CHUNK} + {CHUNK}], ' ')
               AS chunk_text
    FROM t, unnest(generate_series(
        1, CAST(ceil(len(toks) / {CHUNK}.0) AS BIGINT))) AS s(g)
    """,
    doc="Python UDTF as a LATERAL table function with correlated "
    "arguments: per-document context-window chunking (16-token "
    "windows), hash-matched against a pure-SQL oracle — proving the "
    "UDTF is a drop-in for the declarative chunker on identical "
    "semantics. API-surface demo: the declarative twin "
    "(sequence_chunking) is the 100 TB path.",
    tags=("llm", "text", "udtf"),
)
def udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    spark.udtf.register("chunk_doc", ChunkDocUdtf)
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_text
        FROM documents d, LATERAL chunk_doc(d.text) c
        WHERE d.doc_id < 40
        """
    )


# ------------------------------- table-argument UDTF (Spark 4 surface)

_GAP_US = 1800 * 1_000_000  # 30-minute session gap


@udtf(returnType=(
    "user_id bigint, n_sessions bigint, longest_session_events bigint, "
    "active_us bigint, max_gap_us bigint"
))
class UserSessionStatsUdtf:
    """Stateful per-partition scan: consumes one user's events in
    timestamp order (the engine enforces PARTITION BY user_id
    ORDER BY ts) and emits ONE summary row from terminate() — the
    TABLE-argument UDTF API (SPJ-style polymorphic input), which the
    LATERAL form in ChunkDocUdtf cannot express. All arithmetic is
    integer microseconds, so the full DuckDB oracle hash-matches."""

    def __init__(self):
        self._user = None
        self._prev_us = None
        self._n_sessions = 0
        self._cur_events = 0
        self._longest = 0
        self._cur_start_us = None
        self._active_us = 0
        self._max_gap_us = 0

    def _close_session(self):
        if self._cur_events:
            self._longest = max(self._longest, self._cur_events)
            self._active_us += self._prev_us - self._cur_start_us

    def eval(self, row):
        from datetime import datetime, timedelta

        us = (row["ts"] - datetime(1970, 1, 1)) // timedelta(microseconds=1)
        self._user = row["user_id"]
        if self._prev_us is None or us - self._prev_us > _GAP_US:
            self._close_session()
            self._n_sessions += 1
            self._cur_events = 0
            self._cur_start_us = us
        if self._prev_us is not None:
            gap = us - self._prev_us
            if gap > self._max_gap_us:
                self._max_gap_us = gap
        self._prev_us = us
        self._cur_events += 1
        return iter(())  # rows only from terminate()

    def terminate(self):
        if self._user is None:
            return
        self._close_session()
        yield (
            self._user,
            self._n_sessions,
            self._longest,
            self._active_us,
            self._max_gap_us,
        )


@register(
    "udtf_user_session_stats",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_type, epoch_us(ts) AS us,
               lag(epoch_us(ts)) OVER w AS prev_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)
    ), flagged AS (
        SELECT user_id, ts, event_type, us, prev_us,
               CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM ordered
    ), sess AS (
        SELECT user_id, us, prev_us, new_s,
               sum(new_s) OVER (
                   PARTITION BY user_id ORDER BY ts, event_type
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS sid
        FROM flagged
    ), per_session AS (
        SELECT user_id, sid,
               CAST(count(*) AS BIGINT) AS n_ev,
               CAST(max(us) - min(us) AS BIGINT) AS dur_us
        FROM sess GROUP BY 1, 2
    ), gaps AS (
        SELECT user_id,
               CAST(coalesce(max(us - prev_us), 0) AS BIGINT) AS max_gap_us
        FROM sess WHERE prev_us IS NOT NULL GROUP BY 1
    )
    SELECT p.user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(max(p.n_ev) AS BIGINT) AS longest_session_events,
           CAST(sum(p.dur_us) AS BIGINT) AS active_us,
           CAST(coalesce(any_value(g.max_gap_us), 0) AS BIGINT)
               AS max_gap_us
    FROM per_session p LEFT JOIN gaps g USING (user_id)
    GROUP BY p.user_id
    """,
    doc="TABLE-argument Python UDTF (Spark 4: "
    "udtf(TABLE(...) PARTITION BY user_id ORDER BY ts) — the "
    "polymorphic-input API with engine-enforced per-partition "
    "ordering and terminate()-time emission): per-user session "
    "summary (session count, longest session, active time, max gap) "
    "from ONE stateful ordered scan. The DuckDB oracle replays the "
    "identical sessionization declaratively (lag-gap flag -> running "
    "sum -> two rollups), proving the stateful kernel equals the "
    "window-function form — the same twin discipline as "
    "q:`batch_sessionization`, which remains the 100 TB path (pure "
    "Catalyst; the UDTF is API-surface demo, row-at-a-time Python). "
    "Partitioning story: the UDTF's input shuffle is exactly the "
    "window shuffle (hash by user_id, sort within), so the plan shape "
    "survives scale even though the kernel itself should not be the "
    "hot path.",
    tags=("timeseries", "udf", "udtf", "window"),
)
def udtf_user_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    spark.udtf.register("user_session_stats", UserSessionStatsUdtf)
    return spark.sql(
        """
        SELECT * FROM user_session_stats(
            TABLE(SELECT user_id, ts, event_type FROM events)
            PARTITION BY user_id ORDER BY (ts, event_type)
        )
        """
    )
