"""Structured Streaming ingest (beyond-reference: the batch reference's
per-cadence incremental appends expressed as micro-batch streams)."""
