"""Structured Streaming front-end for the incremental curation mode."""
