"""Structured Streaming extension (the reference has no streaming, SURVEY §2.10)."""
