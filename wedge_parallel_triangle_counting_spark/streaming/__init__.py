"""Structured-Streaming surface. The reference is strictly batch
(SURVEY §2.9); this package holds the engine's incremental side: the
windowed event aggregation (batch/stream twins, watermarked state) and
the incremental exact triangle count (per-micro-batch delta
maintenance over the edge stream)."""
