"""Structured Streaming surface: pages-stream ingest -> point extraction ->
tile assignment -> watermarked windowed aggregation."""
