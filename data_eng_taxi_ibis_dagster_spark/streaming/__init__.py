"""Structured Streaming over the events table (EXT E14)."""
