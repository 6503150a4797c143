"""Structured Streaming drivers (SURVEY.md §2.10)."""
