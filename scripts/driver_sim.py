#!/usr/bin/env python
"""Driver simulation: runs the __spark_entry__ contract exactly like the
round driver — plain un-tuned SparkSession, sf0.01 tables, STRICT
order-insensitive value-hash comparison against the DuckDB oracles
(repr-equality on floats, no tolerance).

Usage: python scripts/driver_sim.py [sf_dir]
Exit code 0 iff every oracle-backed query hash-matches.
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _empty_ok(name: str) -> bool:
    """A 0-row oracle is vacuous unless the registry marks the query as
    a violation detector whose pass state IS the empty set."""
    from forex_data_pipeline_spark import catalog

    catalog._ensure_loaded()
    spec = catalog.REGISTRY.get(name)
    return bool(spec and spec.empty_ok)


def value_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = pd.to_datetime(df[c])
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].map(repr)
    df = df.astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


#: Column types safe for the cross-engine CAST-to-string checksum
#: (float/timestamp formatting differs between engines; the normal
#: value_hash path repr()s floats in pandas on BOTH sides instead).
#: Exact names, NOT prefixes: a bare prefix "int" would also match
#: Spark "interval ..." dtypes, whose string rendering differs between
#: engines and would turn into a spurious MISMATCH.
_AGG_SAFE_EXACT = {"tinyint", "smallint", "int", "bigint", "string",
                   "boolean", "date"}


def _agg_safe_type(t: str) -> bool:
    return t in _AGG_SAFE_EXACT or t.startswith("decimal")


def _agg_checksum(df, con, oracle_sql: str):
    """Order-independent (count, sum-of-52-bit-md5) comparison for
    results too large to ship to the driver: each row is keyed by the
    '|'-join of its name-sorted columns CAST to string, hashed to a
    52-bit integer via md5 (portable: Spark conv(substr(md5)) ==
    DuckDB ('0x'||substr(md5))::BIGINT), and summed in DECIMAL(38,0)
    (a BIGINT sum overflows past ~2k rows of 52-bit values). Strictly
    weaker than the full value-hash only in that engine differences
    would need to cancel exactly in the sum — 2^-52-scale likelihood.
    Returns (spark_tuple, duck_tuple)."""
    from pyspark.sql import functions as F

    cols = sorted(df.columns)
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.conv(F.substring(F.md5(key), 1, 13), 16, 10)
            .cast("decimal(38,0)")
        ).alias("hs"),
    ).collect()[0]
    key_sql = "concat_ws('|', " + ", ".join(
        f"CAST({c} AS VARCHAR)" for c in cols
    ) + ")"
    n2, h2 = con.execute(
        f"SELECT count(*), sum(CAST(CAST(('0x'||substr(md5({key_sql}),1,13))"
        f" AS BIGINT) AS DECIMAL(38,0))) FROM ({oracle_sql})"
    ).fetchone()
    return (
        (int(row["n"]), None if row["hs"] is None else int(row["hs"])),
        (int(n2), None if h2 is None else int(h2)),
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
    )
    # The driver-faithful session keeps Spark's 1g default heap — right
    # for the driver's sf0.01 runs. Full-catalog runs at sf0.1 need
    # more (1g across 16 threads is ~64 MB/task; triangle counting
    # OOMs): SPARK_SIM_MEM=4g lifts it without touching anything else.
    mem = os.environ.get("SPARK_SIM_MEM")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    spark = builder.getOrCreate()
    import __spark_entry__ as ent

    n = len(ent.entry(spark).collect())
    print(f"entry: {n} rows")
    assert n > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = ent.queries(), ent.oracle_sql()
    # optional filter: scripts/driver_sim.py [sf_dir] [name1,name2,...]
    if len(sys.argv) > 2:
        wanted = set(sys.argv[2].split(","))
        qs = {n: f for n, f in qs.items() if n in wanted}
    fails = []
    for name, fn in qs.items():
        df = None
        try:
            df = fn(spark, sf_dir)
            got = df.toPandas()
        except Exception as exc:  # noqa: BLE001
            # Result set too big for the driver (e.g. quadratic pair
            # outputs at scale-rehearsal SFs): fall back to the
            # order-independent aggregate checksum, computed engine-side
            # on BOTH engines — nothing corpus-sized crosses the driver.
            # df is None if fn() itself raised; dtypes triggers plan
            # analysis and can throw — guard both so a weird failure is
            # RECORDED per-query instead of crashing the sweep.
            try:
                agg_ok = (
                    df is not None
                    and "maxResultSize" in str(exc)
                    and name in oracles
                    and all(_agg_safe_type(t) for _, t in df.dtypes)
                )
            except Exception:  # noqa: BLE001
                agg_ok = False
            if agg_ok:
                try:
                    s, d = _agg_checksum(df, con, oracles[name])
                except Exception as exc2:  # noqa: BLE001
                    fails.append(name)
                    print(f"{name}: ERROR {type(exc2).__name__}: {exc2}")
                    continue
                ok = s == d and s[0] > 0
                if not ok:
                    fails.append(name)
                print(
                    f"{name}: {'OK' if ok else 'MISMATCH'} "
                    f"(agg-checksum) rows={s[0]}/{d[0]}"
                )
                continue
            fails.append(name)
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            continue
        if name not in oracles:
            print(f"{name}: rows-only {len(got)}")
            continue
        exp = con.execute(oracles[name]).df()
        ok = len(got) == len(exp) and value_hash(got) == value_hash(exp)
        if ok and len(exp) == 0 and not _empty_ok(name):
            ok = False
            print(f"{name}: VACUOUS (oracle returned 0 rows)")
        if not ok:
            fails.append(name)
        print(f"{name}: {'OK' if ok else 'MISMATCH'} rows={len(got)}/{len(exp)}")
    print(f"{len(qs) - len(fails)}/{len(qs)} ok; FAILS: {fails or 'none'}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
