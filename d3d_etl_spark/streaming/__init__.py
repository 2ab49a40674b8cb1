"""Structured Streaming surface.

The reference has no streaming (SURVEY.md §2.11) — its daily-cron batch with
resume-by-watermark is re-expressed in io.py. This package provides the
engine's streaming-native equivalents for live ingest: the same event
operators (sessionization, windowed aggregation) over `readStream` sources
with event-time watermarks for late data.
"""
