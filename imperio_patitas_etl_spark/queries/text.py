"""Text-analysis + dedup queries over the ``documents`` table (placeholder —
filled in with tokenization, lang-ID, quality scoring, fingerprints,
exact + MinHash/SimHash/Jaccard dedup)."""

from __future__ import annotations

QUERIES: dict = {}
ORACLE: dict = {}
