"""Runs every registered query against its DuckDB oracle — the same
check the verify driver performs (at sf0.001 by default for speed; set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the driver's scale)."""

from __future__ import annotations

import pytest

from forex_data_pipeline_spark import catalog
from tests.conftest import assert_df_matches_oracle

catalog._ensure_loaded()
ORACLE_CASES = sorted(n for n, s in catalog.REGISTRY.items() if s.oracle)
NO_ORACLE_CASES = sorted(n for n, s in catalog.REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    spec = catalog.REGISTRY[name]
    assert_df_matches_oracle(
        spec.fn(spark, sf_dir), oracle_con, spec.oracle,
        empty_ok=spec.empty_ok,
    )


@pytest.mark.parametrize("name", NO_ORACLE_CASES)
def test_query_runs(name, spark, sf_dir):
    """Weaker rows-only check for non-SQL-expressible ops (mirrors the
    driver's fallback)."""
    spec = catalog.REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as ent

    df = ent.entry(spark)
    assert df.count() > 0


def test_every_oracle_key_has_query():
    q, o = catalog.queries(), catalog.oracle_sql()
    assert set(o) <= set(q)
