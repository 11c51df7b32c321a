"""Placeholder — populated by milestone build-out (SURVEY.md §7.2)."""
