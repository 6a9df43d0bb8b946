"""LLM-data-pipeline queries: dedup, similarity search, text analysis,
multimodal (see operators/)."""

from __future__ import annotations
