"""Similarity-search queries over the ``embeddings`` table (placeholder —
filled in with brute-force cosine top-k and LSH/IVF-bucketed ANN)."""

from __future__ import annotations

QUERIES: dict = {}
ORACLE: dict = {}
