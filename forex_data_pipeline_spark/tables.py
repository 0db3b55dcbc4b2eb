"""Loaders for the synthetic test tables (see /root/repo/TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under a scale-factor dir.

At 100 TB these would be partitioned/bucketed tables behind a metastore;
``spark.read.parquet`` on a directory glob is the same code path (Spark's
FileSourceScanExec does partition discovery + pruning either way).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table. Column pruning / predicate pushdown happen at
    the parquet scan automatically once the caller selects/filters.

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark's reader
    rejects by default (the reference hit the mirror problem: BigQuery
    rejects TIMESTAMP_NANOS, so it downcasts ns→µs before writing —
    /root/reference/scripts/extract_forex.py:173-179). We read nanos as
    long and truncate to µs exactly like DuckDB's TIMESTAMP_NS→TIMESTAMP
    cast, keeping the oracle bit-identical.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so spark.sql() queries work."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
