"""Structured Streaming surface (see events.py)."""
