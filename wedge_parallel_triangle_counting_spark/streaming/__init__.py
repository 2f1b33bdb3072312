"""Structured-Streaming surface. The reference is strictly batch
(SURVEY §2.9); this package exists for the engine's event-ingest side:
a windowed aggregation defined once and runnable both as a batch query
and as an incremental stream (availableNow) with watermarked state."""
