"""General relational queries over the TPC-H-ish tables: aggregations,
joins (broadcast/shuffle/semi/anti/as-of/range), set ops, windows,
scalar functions. Populated in build-plan Phase 1 (SURVEY §7)."""

from __future__ import annotations
