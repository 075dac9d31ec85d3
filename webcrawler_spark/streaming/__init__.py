"""Structured Streaming surfaces (incremental corpus processing)."""
