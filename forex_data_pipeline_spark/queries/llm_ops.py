"""Training-data pipeline operators: dedup (exact/MinHash/SimHash/
n-gram Jaccard/embedding), similarity search, text analysis, multimodal
plumbing. Populated in build-plan Phase 4 (SURVEY §7)."""

from __future__ import annotations
