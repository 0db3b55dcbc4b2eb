"""Source/sink format coverage (SURVEY §2.1): the engine must ingest
more than parquet — the reference's Bronze layer is "whatever files the
extractor wrote" behind an external table
(/root/reference/.github/workflows/daily_run.yml:55-59), and a real
lake has CSV/JSON landing zones.

Each query is a write→read round trip: a projection of a test table is
written in the format under test (to scratch), read back with an
explicit schema (never inferSchema on the hot path — it double-reads
the data), and aggregated. The oracle aggregates the original parquet
directly, so a hash match proves the round trip is lossless.

Doubles survive both formats bit-exactly: Spark writes them with
Java's shortest round-trippable representation (Double.toString /
Jackson), so parse(write(x)) == x.

Scale notes: CSV/JSON scans are splittable (uncompressed / bzip2), so
the read side parallelizes like parquet minus the columnar features —
no pushdown, no pruning, no row-group skipping. The engine treats them
as landing formats: one pass to typed parquet/Delta, then query that
(exactly the reference's extract→Bronze design).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import register
from ..tables import load

_AGG_ORACLE = """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS total_price,
           CAST(min(CAST(o_orderdate AS DATE)) AS DATE) AS first_order
    FROM orders
    GROUP BY o_orderstatus
"""

_ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
    ]
)


def _roundtrip_agg(df: DataFrame) -> DataFrame:
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum(cents).cast("double") / 100.0).alias("total_price"),
        F.min(F.col("o_orderdate").cast("date")).alias("first_order"),
    )


def _orders_proj(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )


@register(
    "csv_source_agg",
    oracle=_AGG_ORACLE,
    doc="CSV sink+source round trip: write orders projection as "
    "headered CSV, read back with an explicit schema (no "
    "inferSchema double-scan), aggregate. Hash match vs the "
    "parquet oracle proves losslessness incl. double round-trip.",
    tags=("source", "sink"),
)
def csv_source_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = f"{tempfile.mkdtemp(prefix='fx_csv_')}/orders"
    _orders_proj(spark, sf_dir).write.mode("overwrite").option(
        "header", True
    ).option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").csv(path)
    back = (
        spark.read.schema(_ORDERS_SCHEMA)
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .csv(path)
    )
    return _roundtrip_agg(back)


@register(
    "json_source_agg",
    oracle=_AGG_ORACLE,
    doc="JSON-lines sink+source round trip with explicit schema; same "
    "lossless-round-trip proof as csv_source_agg for the second "
    "landing format.",
    tags=("source", "sink"),
)
def json_source_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = f"{tempfile.mkdtemp(prefix='fx_json_')}/orders"
    _orders_proj(spark, sf_dir).write.mode("overwrite").option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    ).json(path)
    back = (
        spark.read.schema(_ORDERS_SCHEMA)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .json(path)
    )
    return _roundtrip_agg(back)
