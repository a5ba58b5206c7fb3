"""Structured Streaming extensions (beyond-reference; the reference's
incremental story is checkpointed delta batch sync, SURVEY.md §2.7)."""
