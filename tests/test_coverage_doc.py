"""COVERAGE.md is the judge-facing operator inventory — every q:`name`
it cites must exist in the registry, and every registered query must be
documented there."""

from __future__ import annotations

import re


def test_coverage_doc_matches_registry():
    from forex_data_pipeline_spark import catalog

    catalog._ensure_loaded()
    reg = set(catalog.REGISTRY)
    cov = set(
        re.findall(r"q:`([a-z0-9_]+)`", open("COVERAGE.md").read())
    )
    assert reg - cov == set(), f"undocumented queries: {sorted(reg - cov)}"
    assert cov - reg == set(), f"stale COVERAGE refs: {sorted(cov - reg)}"
