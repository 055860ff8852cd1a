"""Structured Streaming surface: watermarked windows + custom stateful ops.

The reference has no streaming (SURVEY §2.13) — these extend the engine so
recurring ingestion and event feeds run as streams with the SAME window
semantics as the batch queries in plans/events.py.
"""
