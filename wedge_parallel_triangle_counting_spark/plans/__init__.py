"""Logical plans / pipelines: testdata-derived graphs, the pages→edges
ingest pipeline, and oracle SQL builders."""
