"""Structured Streaming surface: incremental load processing and windowed
event aggregation."""
