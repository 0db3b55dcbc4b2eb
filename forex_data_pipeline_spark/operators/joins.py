"""Join operators beyond the built-in equi family (SURVEY §2.3).

The reference executes zero explicit joins (single-table pipeline), but
the engine needs the full family for general query capability. Broadcast
/ shuffle-hash / sort-merge / semi / anti are built-in ``df.join``
variants; this module adds the two time-series joins Spark lacks:

- ``asof_join`` — "most recent right row at or before each left row".
  Implemented as union + tagged window (one shuffle on the key, one
  sort) instead of an inequality join: an inequality theta-join would be
  a broadcast-nested-loop (O(n·m) — dead at 100 TB), while the union
  trick is O((n+m) log) with perfect key-partition parallelism. This is
  the standard scalable formulation (same shape Flink/Kafka-Streams use
  for temporal joins).
- ``range_join`` — band/interval join against a small dimension:
  broadcast the bands so the range predicate is evaluated map-side
  (BroadcastNestedLoopJoin over a tiny build side — no shuffle at all).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    *,
    suffix: str = "_asof",
    strict: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right ``value_cols`` with
    ``right_ts <= left_ts`` (or ``<`` when ``strict``), matching on
    ``on`` keys — or, with ``direction="forward"``, the EARLIEST right
    row with ``right_ts >= left_ts`` (``>`` when strict): the
    next-event lookup (e.g. view → next purchase). Right value columns
    come back as ``<col><suffix>``, NULL when no prior (resp. later)
    right row exists. Either direction is the same single union +
    key-partitioned window — one shuffle, no row explosion.
    """
    on = list(on)
    forward = direction == "forward"
    # Tag order decides ties at equal timestamps. Backward: right first
    # (0) makes the join inclusive (<=). Forward (frame looks ahead):
    # right AFTER left (1) keeps equal-ts rows visible, so inclusive
    # and strict swap relative to backward.
    if forward:
        right_tag, left_tag = (0, 1) if strict else (1, 0)
    else:
        right_tag, left_tag = (1, 0) if strict else (0, 1)

    lcols = [c for c in left.columns]
    l = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(left_tag).alias("_src"),
        *[F.col(c) for c in lcols if c not in on and c != left_ts],
        F.col(left_ts),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in value_cols],
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(right_tag).alias("_src"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on and c != left_ts],
        F.lit(None).cast(left.schema[left_ts].dataType).alias(left_ts),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    unioned = l.unionByName(r)
    if forward:
        w = (
            Window.partitionBy(*on)
            .orderBy("_ts", "_src")
            .rowsBetween(0, Window.unboundedFollowing)
        )
        fill = [
            F.first(f"{c}{suffix}", ignorenulls=True).over(w).alias(
                f"_f_{c}"
            )
            for c in value_cols
        ]
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy("_ts", "_src")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        fill = [
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(
                f"_f_{c}"
            )
            for c in value_cols
        ]
    filled = unioned.select(*unioned.columns, *fill)
    out = filled.filter(F.col("_src") == left_tag)
    for c in value_cols:
        out = out.drop(f"{c}{suffix}").withColumnRenamed(f"_f_{c}", f"{c}{suffix}")
    return out.drop("_ts", "_src")


def range_join(
    facts: DataFrame,
    bands: DataFrame,
    value: Column,
    lo: Column,
    hi: Column,
) -> DataFrame:
    """Band join: fact rows matched to [lo, hi) intervals of a small
    broadcast dimension — evaluated map-side, zero shuffle."""
    return facts.join(F.broadcast(bands), (value >= lo) & (value < hi))


def range_join_bucketed(
    facts: DataFrame,
    bands: DataFrame,
    value: Column,
    lo_col: str,
    hi_col: str,
    *,
    bucket_width: float,
) -> DataFrame:
    """Interval-bucketed range join — the SHUFFLE-SCALABLE form of
    ``range_join`` for when the band table is too big to broadcast.

    Every interval [lo, hi) is exploded into the fixed-width buckets it
    overlaps; every fact row computes its single bucket; the join
    becomes an EQUI-join on bucket (hash-shuffleable, AQE-skew-splittable)
    plus a residual range predicate. Cost ∝ facts + Σ interval_width /
    bucket_width — never facts × bands. The same trick handles temporal
    interval joins (IP-range lookup, time-validity joins); pick
    ``bucket_width`` ≈ median interval width so most intervals explode
    into O(1) buckets.
    """
    bucket = F.floor(value / bucket_width).cast("long")
    lo, hi = F.col(lo_col), F.col(hi_col)
    band_buckets = bands.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(lo / bucket_width).cast("long"),
                # hi is exclusive: a hi exactly on a bucket edge does not
                # reach into that bucket
                F.floor(
                    (hi - F.lit(1e-9)) / bucket_width
                ).cast("long"),
            )
        ),
    )
    return (
        facts.withColumn("_bucket", bucket)
        .join(band_buckets, "_bucket")
        .filter((value >= lo) & (value < hi))
        .drop("_bucket")
    )
