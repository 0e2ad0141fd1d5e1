"""Relational / aggregate / weights / dedup / similarity operators (SURVEY §2)."""
