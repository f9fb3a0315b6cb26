"""E14 — event-time windowed aggregations in their batch rendering.

Structured Streaming queries (streaming/events.py) and these batch
plans share the same transformation builders, so the driver's oracle
checks the windowing semantics and the streaming tests check
batch-equivalence of the runtime.
"""
