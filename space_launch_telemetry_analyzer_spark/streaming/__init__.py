"""Structured Streaming variants of the extraction pipeline."""
