"""Structured Streaming facades.

The reference engine is strictly batch+interactive (SURVEY.md §2.9 —
no streaming anywhere), so nothing here is required for parity; these
exist because a 100 TB ingestion pipeline built on this engine needs the
streaming twins of its batch aggregations (late data via watermarks,
idempotent sinks via foreachBatch + the lineage manifests).
"""
