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
