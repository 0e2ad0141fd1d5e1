"""Structured Streaming facades (SURVEY §2.10: beyond-reference scope; the
reference's training loop is a bounded batch loop, java:408)."""
