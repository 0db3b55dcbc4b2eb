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

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PID = "__scan_pid"


def _ranged_chunks(
    df: DataFrame,
    order_cols: list[str],
    partitions: int | None,
) -> DataFrame:
    """Range-repartition by (series, *order_cols) so each task holds a
    CONTIGUOUS slice of a series, tag rows with their chunk id, and pin
    the assignment across the scan's multiple jobs. ``df`` must already
    carry a ``series`` column; ``order_cols`` must totally order rows
    within a series (pass the tie-break column too when the time axis
    has duplicates — a range boundary may split equal-ts rows)."""
    p = partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartitionByRange(p, "series", *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )


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


# ---------------------------------------------------------------------------
# Generic affine scan: s_t = m_t * s_{t-1} + b_t
# ---------------------------------------------------------------------------


def distributed_affine_scan(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    m_col: Column,
    b_col: Column,
    *,
    s0_col: Column | None = None,
    out_col: str = "s",
    carry_cols: dict[str, Column] | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """First-order linear recurrence s_t = m_t * s_{t-1} + b_t per
    series, with no task ever holding a whole series (same two-level
    Blelloch scan as the EMA docstring at the top of this module, but
    with per-ROW coefficients, so it serves every affine kernel:
    EMA (m=1-a, b=a*x), Heikin-Ashi open (m=.5, b=.5*prev_ha_close),
    decaying counters, discounted returns, ...).

    ``s0_col``: per-series seed taken from the series' FIRST row
    (defaults to 0.0). To pin an exact first value V, emit the first
    row's coefficients as (m=0, b=V) instead.

    Returns (series_col, ts_col, *carry_cols, out_col). Numerics:
    composed result differs from strict sequential evaluation by
    accumulation-order ulps — callers needing bit-identity keep the
    sequential kernel; this is the cluster-regime path.
    """
    carry_cols = carry_cols or {}
    sel = df.select(
        F.col(series_col).alias("series"),
        F.col(ts_col).alias("ts"),
        *[c.cast("double").alias(n) for n, c in carry_cols.items()],
        m_col.cast("double").alias("_m"),
        b_col.cast("double").alias("_b"),
        (s0_col if s0_col is not None else F.lit(0.0))
        .cast("double")
        .alias("_s0"),
    )
    ranged = _ranged_chunks(sel, ["ts"], partitions)

    local_schema = T.StructType(
        list(ranged.schema)
        + [
            T.StructField("A", T.DoubleType()),
            T.StructField("C", T.DoubleType()),
        ]
    )

    def local_scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        a_acc, c_acc = 1.0, 0.0
        A, C = [], []
        for m, b in zip(pdf["_m"], pdf["_b"]):
            a_acc, c_acc = m * a_acc, m * c_acc + b
            A.append(a_acc)
            C.append(c_acc)
        pdf["A"] = A
        pdf["C"] = C
        return pdf

    local = (
        ranged.groupBy("series", _PID)
        .applyInPandas(local_scan, local_schema)
        .localCheckpoint(eager=True)
    )

    summaries = local.groupBy("series", _PID).agg(
        F.max_by("A", "ts").alias("M"),
        F.max_by("C", "ts").alias("B"),
        F.min_by("_s0", "ts").alias("x0"),
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

    carry_schema = T.StructType(
        list(summaries.schema) + [T.StructField("carry", T.DoubleType())]
    )
    carries = (
        summaries.groupBy("series")
        .applyInPandas(carry_scan, carry_schema)
        .select("series", _PID, "carry")
    )

    return local.join(F.broadcast(carries), ["series", _PID]).select(
        F.col("series").alias(series_col),
        F.col("ts").alias(ts_col),
        *carry_cols.keys(),
        (F.col("A") * F.col("carry") + F.col("C")).alias(out_col),
    )


# ---------------------------------------------------------------------------
# Tropical (max, +) scan: s_t = max(s_{t-1} + a_t, floor) — EXACT on ints
# ---------------------------------------------------------------------------


def distributed_clamped_scan(
    df: DataFrame,
    series_col: str,
    order_cols: list[str],
    delta_col: Column,
    *,
    out_col: str = "s",
    partitions: int | None = None,
) -> DataFrame:
    """Floor-clamped running sum s_t = max(0, s_{t-1} + d_t) per
    series, distributed. max-plus maps f(s) = max(s + a, b) are closed
    under composition — (a1,b1) then (a2,b2) = (a1+a2, max(b1+a2, b2))
    — so the same two-level scan applies; deltas are INTEGERS here, and
    integer max/add reassociate exactly, so unlike the float affine
    scan this is BIT-IDENTICAL to the sequential kernel at any chunking
    (asserted, not tolerance-tested). Each step is (a=d_t, b=0).

    ``order_cols`` must totally order rows in a series (include the
    unique tie-break — the clamp is order-sensitive at equal
    timestamps). Returns (series_col, *order_cols, out_col(bigint)).
    """
    sel = df.select(
        F.col(series_col).alias("series"),
        *order_cols,
        delta_col.cast("long").alias("_d"),
    )
    ranged = _ranged_chunks(sel, order_cols, partitions)

    local_schema = T.StructType(
        list(ranged.schema)
        + [
            T.StructField("A", T.LongType()),
            T.StructField("B", T.LongType()),
        ]
    )

    def local_scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols).reset_index(drop=True)
        a_acc, b_acc = 0, None  # identity: f(s) = s
        A, B = [], []
        for d in pdf["_d"].tolist():
            d = int(d)
            # compose step (d, 0) after accumulator (a_acc, b_acc)
            if b_acc is None:
                a_acc, b_acc = d, 0
            else:
                a_acc, b_acc = a_acc + d, max(b_acc + d, 0)
            A.append(a_acc)
            B.append(b_acc)
        pdf["A"] = A
        pdf["B"] = B
        return pdf

    local = (
        ranged.groupBy("series", _PID)
        .applyInPandas(local_scan, local_schema)
        .localCheckpoint(eager=True)
    )

    summaries = local.groupBy("series", _PID).agg(
        F.max_by("A", F.struct(*order_cols)).alias("MA"),
        F.max_by("B", F.struct(*order_cols)).alias("MB"),
    )

    def carry_scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(_PID).reset_index(drop=True)
        carries = []
        s_in = 0
        for _, row in pdf.iterrows():
            carries.append(s_in)
            s_in = max(s_in + int(row["MA"]), int(row["MB"]))
        pdf["carry"] = carries
        return pdf

    carry_schema = T.StructType(
        list(summaries.schema) + [T.StructField("carry", T.LongType())]
    )
    carries = (
        summaries.groupBy("series")
        .applyInPandas(carry_scan, carry_schema)
        .select("series", _PID, "carry")
    )

    return local.join(F.broadcast(carries), ["series", _PID]).select(
        F.col("series").alias(series_col),
        *order_cols,
        F.greatest(
            F.col("carry") + F.col("A"), F.col("B")
        ).alias(out_col),
    )


# ---------------------------------------------------------------------------
# Chunk-chain iteration for NON-algebraic recurrences (Supertrend, SAR)
# ---------------------------------------------------------------------------
#
# Supertrend's band latch and Parabolic SAR's (sar, ep, af, trend)
# machine have data-dependent resets — no monoid/affine composition
# exists, so the two-level scan above does not apply. What DOES hold is
# that the chunk chain
#
#     inbound[0] = None (series start); inbound[k] = exit_{k-1}(inbound[k-1])
#
# has a unique solution reachable by JACOBI ITERATION: guess every
# chunk's inbound state (self-init), recompute all chunk EXIT states in
# parallel, shift exits right to get the next inbound guess, repeat
# until no inbound changes. Any fixpoint with the true series-start
# inbound IS the unique forward-substitution solution (induction on k),
# so the convergence test is exact, not heuristic.
#
# Cost envelope: each sweep is one fully-parallel pass over the
# still-dirty chunks (the frontier). Worst case — state never couples —
# is n_chunks sweeps, i.e. the sequential cost but shuffled; in
# practice these indicators FORGET their inbound state at every band
# reset / trend flip (both state variables reassigned from current-row
# inputs), so a guessed trajectory coalesces with the true one within
# a chunk and exits stop changing after a few sweeps. The sweep count
# is observable (returned alongside the result) and measured in tests
# on real data. Lag inputs (prev close/high/low) are computed as
# window lag columns BEFORE chunking, so they cross chunk boundaries
# for free and the carried state stays minimal.


def _chain_scan(
    sel: DataFrame,
    order_cols: list[str],
    state_fields: list[tuple[str, T.DataType]],
    chunk_kernel: Callable,
    out_schema: T.StructType,
    partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Run ``chunk_kernel`` over contiguous (series, chunk) slices with
    Jacobi-iterated inbound states. ``sel`` must carry ``series`` +
    ``order_cols`` + kernel inputs. ``chunk_kernel(pdf, state, emit)``
    returns ``(out_pdf_or_None, exit_state_or_None)``; ``state`` is
    None for a fresh (self-init) chunk. Returns (result_df, n_sweeps).
    """
    spark = sel.sparkSession
    ranged = _ranged_chunks(sel, order_cols, partitions)
    series_field = ranged.schema["series"]

    st_names = [n for n, _ in state_fields]
    exit_schema = T.StructType(
        [
            series_field,
            T.StructField(_PID, T.IntegerType()),
            T.StructField("_fresh", T.BooleanType()),
        ]
        + [T.StructField(f"_st_{n}", t) for n, t in state_fields]
    )
    inbound_schema = exit_schema

    def wrap(emit: bool):
        def w(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(order_cols).reset_index(drop=True)
            fresh = bool(pdf["_fresh"].iloc[0])
            state = (
                None
                if fresh
                else tuple(pdf[f"_st_{n}"].iloc[0] for n in st_names)
            )
            out, exit_state = chunk_kernel(pdf, state, emit)
            if emit:
                return out
            row = {
                "series": pdf["series"].iloc[0],
                _PID: int(pdf[_PID].iloc[0]),
                "_fresh": exit_state is None,
            }
            for i, n in enumerate(st_names):
                row[f"_st_{n}"] = (
                    0 if exit_state is None else exit_state[i]
                )
            return pd.DataFrame([row])

        return w

    # chunk inventory (tiny: one row per (series, chunk))
    chunk_pdf = (
        ranged.groupBy("series", _PID).count().toPandas()
    )
    order: dict = {}
    for s, grp in chunk_pdf.groupby("series"):
        order[s] = sorted(int(p) for p in grp[_PID])

    def inbound_rows(states: dict) -> pd.DataFrame:
        rows = []
        for (s, pid), st in states.items():
            row = {"series": s, _PID: pid, "_fresh": st is None}
            for i, n in enumerate(st_names):
                row[f"_st_{n}"] = 0 if st is None else st[i]
            rows.append(row)
        return pd.DataFrame(rows)

    inbound = {
        (s, pid): None for s, pids in order.items() for pid in pids
    }
    exits: dict = {}
    frontier = set(inbound)
    sweeps = 0
    max_sweeps = len(inbound) + 2
    while frontier:
        sweeps += 1
        if sweeps > max_sweeps:  # unreachable: unique-fixpoint guard
            raise RuntimeError("chain scan failed to converge")
        fr_df = spark.createDataFrame(
            inbound_rows({k: inbound[k] for k in frontier}),
            schema=inbound_schema,
        )
        got = (
            ranged.join(F.broadcast(fr_df), ["series", _PID])
            .groupBy("series", _PID)
            .applyInPandas(wrap(emit=False), exit_schema)
            .toPandas()
        )
        for _, r in got.iterrows():
            exits[(r["series"], int(r[_PID]))] = (
                None
                if bool(r["_fresh"])
                else tuple(r[f"_st_{n}"] for n in st_names)
            )
        nxt = {}
        for s, pids in order.items():
            for j, pid in enumerate(pids):
                nxt[(s, pid)] = (
                    None if j == 0 else exits[(s, pids[j - 1])]
                )
        frontier = {k for k in nxt if nxt[k] != inbound[k]}
        inbound = nxt

    final_df = spark.createDataFrame(
        inbound_rows(inbound), schema=inbound_schema
    )
    out = (
        ranged.join(F.broadcast(final_df), ["series", _PID])
        .groupBy("series", _PID)
        .applyInPandas(wrap(emit=True), out_schema)
    )
    return out, sweeps


# ---------------------------------------------------------------------------
# Distributed variants of the sequential indicator kernels
# ---------------------------------------------------------------------------


def distributed_heikin_ashi(
    candles: DataFrame, partitions: int | None = None
) -> DataFrame:
    """Heikin-Ashi candles without serializing a series into one task.

    ha_close is pointwise; ha_open is the affine recurrence
    s_t = 0.5*s_{t-1} + 0.5*ha_close_{t-1} (seeded (o_1+c_1)/2), so it
    rides :func:`distributed_affine_scan` with per-row coefficients —
    the first row pins its exact seed via (m=0, b=seed). Mirrors the
    sequential kernel in queries/indicators_q.py::heikin_ashi to
    accumulation-order ulps (0.5x+0.5y == (x+y)/2 in IEEE; only the
    cross-chunk composition reassociates).

    ``candles``: (event_type, candle_start, o, h, l, c) doubles.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type").orderBy("candle_start")
    ha_close = (
        F.col("o") + F.col("h") + F.col("l") + F.col("c")
    ) / F.lit(4.0)
    prev_hc = F.lag(ha_close).over(w)
    base = candles.select(
        "event_type",
        "candle_start",
        F.col("h").alias("_h"),
        F.col("l").alias("_l"),
        ha_close.alias("_hc"),
        F.when(prev_hc.isNull(), F.lit(0.0))
        .otherwise(F.lit(0.5))
        .alias("_m"),
        F.when(
            prev_hc.isNull(), (F.col("o") + F.col("c")) / F.lit(2.0)
        )
        .otherwise(F.lit(0.5) * prev_hc)
        .alias("_b"),
    )
    scanned = distributed_affine_scan(
        base,
        "event_type",
        "candle_start",
        F.col("_m"),
        F.col("_b"),
        out_col="ha_open",
        carry_cols={
            "_h": F.col("_h"),
            "_l": F.col("_l"),
            "_hc": F.col("_hc"),
        },
        partitions=partitions,
    )
    return scanned.select(
        "event_type",
        "candle_start",
        "ha_open",
        F.col("_hc").alias("ha_close"),
        F.greatest("_h", "ha_open", "_hc").alias("ha_high"),
        F.least("_l", "ha_open", "_hc").alias("ha_low"),
    )


def distributed_clamped_balance(
    flows: DataFrame, partitions: int | None = None
) -> DataFrame:
    """Floor-clamped running balance per user, distributed and
    BIT-IDENTICAL to the sequential kernel (integer micro-unit
    tropical scan — see :func:`distributed_clamped_scan`).

    ``flows``: (user_id, ts, event_id, d) with d = signed micro-unit
    delta (long). Returns (user_id, ts, event_id, balance double).
    """
    scanned = distributed_clamped_scan(
        flows,
        "user_id",
        ["ts", "event_id"],
        F.col("d"),
        out_col="_bal_micro",
        partitions=partitions,
    )
    return scanned.select(
        "user_id",
        "ts",
        "event_id",
        (F.col("_bal_micro").cast("double") / F.lit(1000000.0)).alias(
            "balance"
        ),
    )


def distributed_supertrend(
    base: DataFrame, partitions: int | None = None
) -> tuple[DataFrame, int]:
    """Supertrend band latch via chunk-chain iteration (see the
    _chain_scan block comment). State = (fu, fl, trend); the previous
    close crosses chunk boundaries as a window-lag INPUT column, not
    state. Exact replay of queries/indicators_q.py::supertrend's
    branch/op order, so the fixpoint equals the sequential result
    bit-for-bit (floats flow through identical IEEE ops in the same
    order — only which TASK executes them changes).

    ``base``: (event_type, candle_start, c long, bu double, bl double).
    Returns (result, n_sweeps).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type").orderBy("candle_start")
    sel = base.select(
        F.col("event_type").alias("series"),
        F.col("candle_start").alias("ts"),
        "c",
        "bu",
        "bl",
        F.lag("c").over(w).alias("pc"),
    )

    out_schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("candle_start", T.TimestampNTZType()),
            T.StructField("upper_band", T.DoubleType()),
            T.StructField("lower_band", T.DoubleType()),
            T.StructField("trend", T.LongType()),
        ]
    )

    def kernel(pdf: pd.DataFrame, state, emit: bool):
        cs = pdf["c"].tolist()
        bus = pdf["bu"].tolist()
        bls = pdf["bl"].tolist()
        pcs = pdf["pc"].tolist()
        fu = fl = 0.0
        trend = 1
        ub, lb, trends = [], [], []
        for i in range(len(cs)):
            bu, bl = bus[i], bls[i]
            if i == 0 and state is None:
                fu, fl, trend = bu, bl, 1
            else:
                if i == 0:
                    fu, fl, trend = (
                        float(state[0]),
                        float(state[1]),
                        int(state[2]),
                    )
                prev_c = pcs[i]
                fu = bu if (bu < fu or prev_c > fu) else fu
                fl = bl if (bl > fl or prev_c < fl) else fl
                if float(cs[i]) > fu:
                    trend = 1
                elif float(cs[i]) < fl:
                    trend = -1
            if emit:
                ub.append(fu / 1000000.0)
                lb.append(fl / 1000000.0)
                trends.append(trend)
        if not emit:
            return None, (fu, fl, trend)
        return (
            pd.DataFrame(
                {
                    "event_type": pdf["series"],
                    "candle_start": pdf["ts"],
                    "upper_band": ub,
                    "lower_band": lb,
                    "trend": trends,
                }
            ),
            (fu, fl, trend),
        )

    return _chain_scan(
        sel,
        ["ts"],
        [
            ("fu", T.DoubleType()),
            ("fl", T.DoubleType()),
            ("trend", T.LongType()),
        ],
        kernel,
        out_schema,
        partitions=partitions,
    )


def distributed_parabolic_sar(
    base: DataFrame, partitions: int | None = None
) -> tuple[DataFrame, int]:
    """Parabolic SAR via chunk-chain iteration. State =
    (sar, ep, af, trend); the two-bar clamp's lagged highs/lows and
    the init pair's previous close cross chunk boundaries as
    window-lag INPUT columns. Exact replay of
    queries/indicators_q.py::parabolic_sar (same branch order, same
    float ops), so the fixpoint is bit-identical to the sequential
    kernel. A fresh chunk inits at the series' true second bar when it
    holds it (rn==2), else guesses from its own second row — the
    guess only seeds the Jacobi iteration, never the final output.

    ``base``: _hourly_micro shape (event_type, candle_start, h, l, c
    longs). Returns (result, n_sweeps).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type").orderBy("candle_start")
    sel = base.select(
        F.col("event_type").alias("series"),
        F.col("candle_start").alias("ts"),
        "h",
        "l",
        "c",
        F.lag("c").over(w).alias("pc"),
        F.lag("h").over(w).alias("ph"),
        F.lag("l").over(w).alias("pl"),
        F.lag("h", 2).over(w).alias("pph"),
        F.lag("l", 2).over(w).alias("ppl"),
        F.row_number().over(w).alias("rn"),
    )

    out_schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("candle_start", T.TimestampNTZType()),
            T.StructField("psar", T.DoubleType()),
            T.StructField("trend", T.LongType()),
        ]
    )

    def kernel(pdf: pd.DataFrame, state, emit: bool):
        n = len(pdf)
        hs, ls, cs = pdf["h"].tolist(), pdf["l"].tolist(), pdf["c"].tolist()
        pcs, phs, pls = pdf["pc"].tolist(), pdf["ph"].tolist(), pdf["pl"].tolist()
        pphs, ppls = pdf["pph"].tolist(), pdf["ppl"].tolist()
        rns = pdf["rn"].tolist()
        ts = pdf["ts"].tolist()
        out_rows = []
        if state is None:
            # init at the series' true second bar if this chunk holds
            # it, else at the chunk's own second row (iteration seed)
            try:
                init_i = rns.index(2)
            except ValueError:
                init_i = 1
            if init_i >= n:
                return (
                    pd.DataFrame(
                        {
                            "event_type": pd.Series([], dtype=object),
                            "candle_start": pd.Series(
                                [], dtype="datetime64[us]"
                            ),
                            "psar": pd.Series([], dtype=float),
                            "trend": pd.Series([], dtype="int64"),
                        }
                    )
                    if emit
                    else None,
                    None,
                )
            up = cs[init_i] > pcs[init_i]
            trend = 1 if up else -1
            sar = float(pls[init_i]) if up else float(phs[init_i])
            ep = float(hs[init_i]) if up else float(ls[init_i])
            af = 0.02
            out_rows.append((ts[init_i], sar, trend))
            start = init_i + 1
        else:
            sar, ep, af, trend = (
                float(state[0]),
                float(state[1]),
                float(state[2]),
                int(state[3]),
            )
            start = 0
        for i in range(start, n):
            sar_pred = sar + af * (ep - sar)
            if trend == 1:
                sar_c = min(sar_pred, float(pls[i]), float(ppls[i]))
                if float(ls[i]) < sar_c:  # flip to downtrend
                    trend, sar = -1, ep
                    ep, af = float(ls[i]), 0.02
                else:
                    sar = sar_c
                    if float(hs[i]) > ep:
                        af = min(af + 0.02, 0.2)
                    ep = max(ep, float(hs[i]))
            else:
                sar_c = max(sar_pred, float(phs[i]), float(pphs[i]))
                if float(hs[i]) > sar_c:  # flip to uptrend
                    trend, sar = 1, ep
                    ep, af = float(hs[i]), 0.02
                else:
                    sar = sar_c
                    if float(ls[i]) < ep:
                        af = min(af + 0.02, 0.2)
                    ep = min(ep, float(ls[i]))
            out_rows.append((ts[i], sar, trend))
        exit_state = (sar, ep, af, trend)
        if not emit:
            return None, exit_state
        return (
            pd.DataFrame(
                {
                    "event_type": pdf["series"].iloc[0],
                    "candle_start": [r[0] for r in out_rows],
                    "psar": [r[1] / 1000000.0 for r in out_rows],
                    "trend": [r[2] for r in out_rows],
                }
            ),
            exit_state,
        )

    return _chain_scan(
        sel,
        ["ts"],
        [
            ("sar", T.DoubleType()),
            ("ep", T.DoubleType()),
            ("af", T.DoubleType()),
            ("trend", T.LongType()),
        ],
        kernel,
        out_schema,
        partitions=partitions,
    )
