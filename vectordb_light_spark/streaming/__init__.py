"""Structured Streaming surfaces: watch-folder ingest, event windows."""
